from . import std  # noqa: F401
