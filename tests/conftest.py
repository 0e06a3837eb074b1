import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware. NOTE: this image's jaxlib registers the 'axon' TPU
# platform regardless of JAX_PLATFORMS, so force CPU via jax.config.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# No persistent compilation cache under pytest: with 60+ tests (hundreds of
# compiled programs) in one process, the cache's native serialize/deserialize
# path segfaults nondeterministically (observed 2026-08-17 in both
# get_executable_and_time and put_executable_and_time on this jaxlib). The
# cache only pays off for the TPU CLIs, which compile a handful of programs
# per process; bench.py additionally supervises/retries around a crash.
# NOTE: gating gsjax/__init__.py via GSJAX_NO_COMPILE_CACHE is NOT enough —
# jax reads JAX_COMPILATION_CACHE_DIR directly as the cache-dir default, so
# the env var must go away AND the cache must be disabled in jax.config.
os.environ["GSJAX_NO_COMPILE_CACHE"] = "1"
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)
