from .poseidon import PoseidonParams, PoseidonHash  # noqa: F401
