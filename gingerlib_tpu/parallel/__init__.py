from .sharded import sharded_msm, sharded_msm_scan, make_mesh, \
    sharded_poseidon_2_1  # noqa: F401
from . import distributed  # noqa: F401
