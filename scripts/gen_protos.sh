#!/usr/bin/env bash
# Regenerate protobuf message classes (≙ the reference's tonic-build step,
# /root/reference/crates/api/build.rs). Requires protoc.
set -euo pipefail
cd "$(dirname "$0")/../igloo_tpu/api"
protoc --python_out=. --proto_path=protos protos/cluster.proto
echo "generated igloo_tpu/api/cluster_pb2.py"
