from .sharded import sharded_msm, make_mesh, sharded_poseidon_2_1  # noqa: F401
