"""nbodyhpc_tpu — TPU-native N-body post-processing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of wendazhou/nbodyhpc:

- :mod:`nbodyhpc_tpu.kdtree` — periodic 3D k-NN engine (cell-list + batched
  expanding-cube queries) with the reference's ``KDTree``/``query`` API.
- :mod:`nbodyhpc_tpu.rasterizer` — mass-conserving anti-aliased sphere-splat
  rasterization of point clouds into 2D/3D density fields with periodic wrap,
  with the reference's ``render_points``/``render_points_volume`` API.
- :mod:`nbodyhpc_tpu.parallel` — mesh/shard_map layer: slab-sharded grids,
  halo exchange over ICI, sharded query fan-out.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("NBODYHPC_TPU_CACHE", "1") != "0":
    # persistent XLA compilation cache: kernel compiles through the remote
    # TPU compiler take minutes; cache them across processes. CPU-forced
    # processes (JAX_PLATFORMS=cpu in the env OR jax_platforms set to cpu
    # programmatically before this import: the multichip dry run, CPU
    # smoke scripts, the test suite) must NOT touch it: XLA:CPU serializes
    # AOT executables with compile-machine feature flags that don't match
    # this host (cpu_aot_loader warns "could lead to execution errors such
    # as SIGILL") and both the serialize and the reload path have
    # segfaulted here (jax 0.9.0) — the cache is for the (remote-compiled)
    # TPU programs only.
    import jax as _jax

    _platforms = (
        getattr(_jax.config, "jax_platforms", None)
        or _os.environ.get("JAX_PLATFORMS", "")
    )
    if _platforms.lower() != "cpu":
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("NBODYHPC_TPU_CACHE_DIR",
                            _os.path.expanduser("~/.jax_cache")),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from . import core, ops, utils  # noqa: F401
