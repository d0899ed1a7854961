"""Test configuration: force CPU with 8 virtual devices for mesh tests.

The container boots every interpreter with a sitecustomize that registers a
remote-TPU PJRT backend and imports jax before this conftest runs, which
would send every test compile through a network tunnel at reduced MXU
precision. JAX backends initialize lazily, so reconfiguring here — before
any computation — redirects everything to the local CPU with 8 virtual
devices (the standard JAX trick for exercising pjit/Mesh code without TPU
hardware).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# Persistent compilation cache: the suite compiles many XLA programs; caching
# makes re-runs (and CI re-invocations) start warm.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/msig_jax_test_cache")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
# Cache even small/fast-compiling programs (default threshold skips them).
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
