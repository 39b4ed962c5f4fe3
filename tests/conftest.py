"""Test configuration: run on a virtual 8-device CPU mesh.

SURVEY §4: multi-node testing without a cluster —
`xla_force_host_platform_device_count=N` on the CPU backend exercises the
same SPMD programs that run on a real multi-host TPU slice.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402
import pyarrow as pa  # noqa: E402
import jax  # noqa: E402

# Force the CPU backend: the env-var route (JAX_PLATFORMS) is overridden
# by site customization in some environments, but the config knob wins.
jax.config.update("jax_platforms", "cpu")

# persistent compile cache makes repeated test runs fast
jax.config.update("jax_compilation_cache_dir", "/tmp/igloo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


@pytest.fixture()
def engine():
    import igloo_tpu
    return igloo_tpu.QueryEngine()


@pytest.fixture()
def users_engine(engine):
    """The reference CLI's in-memory `users` table
    (/root/reference/crates/igloo/src/main.rs:64-77 — 5 rows)."""
    engine.register_table("users", pa.table({
        "id": pa.array([1, 2, 3, 4, 5], type=pa.int32()),
        "name": ["Alice", "Bob", "Charlie", "Diana", "Eve"],
        "age": pa.array([25, 30, 35, 28, 32], type=pa.int32()),
    }))
    return engine
