from .sw import SWCurveOps  # noqa: F401
