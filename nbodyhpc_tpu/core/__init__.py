from . import cells, points  # noqa: F401
