from . import mesh, sharded, stats  # noqa: F401
