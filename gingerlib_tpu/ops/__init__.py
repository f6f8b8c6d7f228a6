from . import limbs  # noqa: F401
