from .poseidon import PoseidonGadget  # noqa: F401
from .merkle import MerklePathGadget  # noqa: F401
