"""Test configuration: run every test on a virtual 8-device CPU mesh.

Must set the env BEFORE jax is imported anywhere — this file is imported
by pytest before test modules, so keep jax imports out of module scope in
tests' import chains only AFTER this runs (pytest guarantees conftest
executes first).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
  os.environ["XLA_FLAGS"] = (
      _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Hosted-TPU images inject a sitecustomize that imports jax at interpreter
# start, so the env var above can be read too late — force the platform at
# the config level as well. Without this the ENTIRE suite silently runs on
# the remote TPU through the tunnel (~10x slower per test, serializes with
# benchmarks) instead of the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: XLA CPU compiles dominate test wall-clock on
# small hosts; cache them across pytest runs
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
