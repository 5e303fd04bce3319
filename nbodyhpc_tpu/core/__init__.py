from . import cells, morton, points  # noqa: F401
