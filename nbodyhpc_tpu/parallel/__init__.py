from . import mesh, sharded, stats, tree_sharded  # noqa: F401
