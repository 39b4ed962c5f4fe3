#!/usr/bin/env bash
# Build the native host library (native/igloo_host.cpp → libigloo_host.so).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p build
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    native/igloo_host.cpp -o build/libigloo_host.so
echo "built build/libigloo_host.so"
