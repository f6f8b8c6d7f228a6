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
                inf_mask=None, axis: str = "data", nbits: int | None = None):
    """MSM with points sharded across the mesh's axis.

    N must be divisible by the mesh size.  Output: replicated projective
    point (each device folds the all-gathered partials).  ``nbits`` bounds
    the scalar bit-width (fewer Pippenger windows for short scalars).
    """
    n = xs.shape[0]
    ndev = mesh.shape[axis]
    assert n % ndev == 0, "point count must divide evenly across devices"
    if inf_mask is None:
        inf_mask = jnp.zeros((n,), bool)

    def local(xs_l, ys_l, sd_l, inf_l):
        part = msm_mod.msm(curve, xs_l, ys_l, sd_l, c=c, inf_mask=inf_l,
                           nbits=nbits)
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


def sharded_msm_scan(curve, mesh: Mesh, xs, ys, bits, axis: str = "data"):
    """Data-parallel MSM via per-device double-and-add scans + all-gather
    + a scan fold of the per-device partials.

    Compile-lean alternative to :func:`sharded_msm`: the whole graph
    contains O(1) EC-add bodies (every add lives inside a ``lax.scan``),
    where Pippenger's sort/tree/Fenwick structure unrolls hundreds —
    XLA:CPU compiles this in seconds instead of minutes.  Used by the
    driver's multi-chip dryrun and CI smoke tests; the production path
    for large N is still ``sharded_msm``.

    bits: [N, nbits] per-point scalar bits, MSB first.
    """
    def local(xs_l, ys_l, bits_l):
        one = jnp.broadcast_to(jnp.asarray(curve.F.one()), xs_l.shape)
        acc = curve.mul_bits((xs_l, ys_l, one), bits_l)
        part = msm_mod._tree_reduce(curve, acc)
        gathered = tuple(jax.lax.all_gather(c, axis) for c in part)
        flat = tuple(c.reshape((-1,) + c.shape[2:]) for c in gathered)

        def step(carry, pt):
            return curve.add(carry, pt), None

        out, _ = jax.lax.scan(step, curve.zero(()), flat)
        return out

    spec = P(axis)
    return shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )(xs, ys, bits)


def sharded_fft(domain, mesh: Mesh, x_cyclic, inverse: bool = False,
                axis: str = "data"):
    """Distributed single FFT over the mesh (Cooley-Tukey two-step).

    Decomposition m = D·L with D = mesh size (the TPU translation of
    parallel_fft's 2^log_cpus sub-FFT split + interleave,
    fft/domain.rs:360-416):

        X[t + L·u] = Σ_i ω^{L·i·u} · ω^{i·t} · FFT_L(x[i::D])[t]

    * input  layout: CYCLIC — device i holds the strided subsequence
      x[i::D] (shape [L, nd]); pass `cyclic_layout(x, D)` to convert.
    * output layout: BLOCKED — device u holds X[u·L:(u+1)·L].
    * comm: one all-gather of the twiddled local transforms over ICI.

    Compose fft→ifft by re-permuting the blocked (= natural-order) output
    with `cyclic_layout` — under jit on a sharded array XLA lowers that
    permutation to one all_to_all over ICI.
    """
    P6 = domain.params
    m = domain.size
    D = mesh.shape[axis]
    assert m % D == 0, "domain size must divide across devices"
    L = m // D
    p = P6.modulus

    gen = domain.gen_inv if inverse else domain.gen
    # host tables: full powers of gen [m, nd]; sub-domain twiddles of gen^D
    from ..ops.fft import _build_powers
    powers = _build_powers(P6, gen, m)
    sub_tw = _build_powers(P6, pow(gen, D, p), max(L // 2, 1))

    from ..ops.fft import _fft_core
    from ..fields import fp as fpmod

    def local(x_l):
        # x_l: [1?, L, nd] local shard (shard_map strips the device axis
        # when the spec consumes it; here we shard axis 0 of [m, nd], so
        # the local block is [L, nd])
        i = jax.lax.axis_index(axis)
        sub = _fft_core(P6, x_l, jnp.asarray(sub_tw))          # FFT_L
        t_idx = jnp.arange(L, dtype=jnp.uint32)
        tw = jnp.take(jnp.asarray(powers),
                      (i.astype(jnp.uint32) * t_idx) % m, axis=0)
        T = fpmod.mont_mul(P6, sub, tw)                        # [L, nd]
        allT = jax.lax.all_gather(T, axis)                     # [D, L, nd]
        u = jax.lax.axis_index(axis)
        i_idx = jnp.arange(D, dtype=jnp.uint32)
        w = jnp.take(jnp.asarray(powers),
                     (jnp.uint32(L) * i_idx * u.astype(jnp.uint32)) % m,
                     axis=0)                                   # [D, nd]
        prods = fpmod.mont_mul(P6, allT, w[:, None, :])        # [D, L, nd]
        acc = prods[0]
        for ii in range(1, D):
            acc = fpmod.add_mod(P6, acc, prods[ii])
        if inverse:
            acc = fpmod.mont_mul(
                P6, acc,
                jnp.asarray(fpmod.fp_from_int(P6, domain.size_inv)))
        return acc

    return shard_map(
        local, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis),
        check_rep=False,
    )(x_cyclic)


def cyclic_layout(x, D: int):
    """[m, nd] natural order -> concatenated strided subsequences
    [x[0::D] ‖ x[1::D] ‖ …] so contiguous shards are cyclic."""
    m = x.shape[0]
    return x.reshape(m // D, D, -1).transpose(1, 0, 2).reshape(m, -1)


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
