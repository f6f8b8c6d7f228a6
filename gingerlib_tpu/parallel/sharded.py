"""Multi-chip sharding for the proving pipeline.

The reference's only parallelism is single-node rayon (SURVEY.md §2.8);
the TPU design shards the *batch* dimension of every hot op over a device
mesh:

* MSM: points+scalars sharded over the ``data`` axis; each device runs the
  full Pippenger window pipeline on its shard and the per-device partial
  sums (one projective point each) are combined with an all-gather + local
  fold — EC points have no psum, but the partials are tiny.
* batched Poseidon / Merkle levels: embarrassingly data-parallel.
* FFT: stages whose butterfly span is intra-shard are local; the driver
  reshapes so only log2(ndev) stages need cross-device exchange (v1 keeps
  the element axis replicated under jit-sharding; the dedicated all-to-all
  kernel lands with the Pallas pass).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import msm as msm_mod


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sharded_msm(curve, mesh: Mesh, xs, ys, scalar_digits, c: int | None = None,
                inf_mask=None, axis: str = "data"):
    """MSM with points sharded across the mesh's axis.

    N must be divisible by the mesh size.  Output: replicated projective
    point (each device folds the all-gathered partials).
    """
    n = xs.shape[0]
    ndev = mesh.shape[axis]
    assert n % ndev == 0, "point count must divide evenly across devices"
    if inf_mask is None:
        inf_mask = jnp.zeros((n,), bool)

    def local(xs_l, ys_l, sd_l, inf_l):
        part = msm_mod.msm(curve, xs_l, ys_l, sd_l, c=c, inf_mask=inf_l)
        # gather the per-device partials and fold locally (replicated out)
        stacked = tuple(
            jax.lax.all_gather(coord, axis) for coord in part)  # [ndev,...]
        return msm_mod._tree_reduce(curve, stacked)

    spec_pts = P(axis)
    out = shard_map(
        local, mesh=mesh,
        in_specs=(spec_pts, spec_pts, spec_pts, spec_pts),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )(xs, ys, scalar_digits, inf_mask)
    return tuple(coord[0] for coord in out)


def sharded_poseidon_2_1(hasher, mesh: Mesh, left, right, axis: str = "data"):
    """Batched 2->1 Poseidon with the batch axis sharded over the mesh."""
    def local(l, r):
        return hasher.hash_2_1(l, r)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
        check_rep=False,
    )(left, right)
