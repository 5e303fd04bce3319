from . import philox, png, stats  # noqa: F401
