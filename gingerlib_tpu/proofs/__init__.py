from . import groth16  # noqa: F401
