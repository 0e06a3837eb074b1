import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware. NOTE: this image's jaxlib registers the 'axon' TPU
# platform regardless of JAX_PLATFORMS, so force CPU via jax.config.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
