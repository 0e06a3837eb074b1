"""gsjax — TPU-native geometry-grounded Gaussian splatting.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the CUDA
reference `XiShuFan/Geometry-Grounded-Gaussian-Splatting` (RaDe-GS rasterizer
with median depth/normal rendering, Mip-Splatting filters, spherical-Gaussian
appearance, GOF densification, PGSR multi-view losses, TSDF / marching
tetrahedra mesh extraction, DTU / TnT / Mip-360 evaluation), re-designed for
TPUs: tile-vectorised rasterisation over 32x32 pixel tiles (one 8x128 f32
vector register tile per pixel block), sort-based binning in XLA, and
`shard_map` data-parallel tiles across a device mesh.
"""

__version__ = "0.1.0"

import os as _os

# Platform override for the CLIs. The axon jaxlib ignores the JAX_PLATFORMS
# environment variable, so honour our own: GSJAX_PLATFORM=cpu forces CPU
# (e.g. metric runs, or driving train/render while the TPU relay is down).
if _os.environ.get("GSJAX_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["GSJAX_PLATFORM"])

# Persistent compilation cache: the fused raster/bisection programs take
# minutes to compile; caching makes every process after the first start in
# seconds. Opt out with GSJAX_NO_COMPILE_CACHE=1.
#
# The directory is keyed by the HOST's machine features: XLA:CPU AOT
# artifacts embed the compile machine's ISA extensions, and loading an entry
# produced on a different machine is a SIGILL hazard ("Compile machine
# features ... vs host machine features" warnings observed in round-1/2
# multichip dryruns when ~/.cache was carried across hosts). A per-feature
# directory makes stale cross-machine entries unreachable instead of fatal.


def _host_feature_tag() -> str:
    import hashlib
    import platform

    probe = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    probe += line
                    break
    except OSError:
        pass
    return hashlib.sha256(probe.encode()).hexdigest()[:10]


if not _os.environ.get("GSJAX_NO_COMPILE_CACHE"):
    import jax as _jax

    _cache_dir = _os.environ.get("GSJAX_COMPILE_CACHE_DIR") or _os.path.join(
        _os.path.expanduser("~/.cache"), f"gsjax-xla-{_host_feature_tag()}")
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
