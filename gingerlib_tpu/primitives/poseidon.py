"""Poseidon hash (x^-1 S-box, T=3, rate 2) — batched VPU-first.

Reimplements the reference PoseidonHash / PoseidonBatchHash
(primitives/src/crh/poseidon/mod.rs:380-670) with the round schedule taken
from the code (NOT doc/Poseidon.md — see SURVEY.md divergence #2):

    R_F full rounds | R_P partial rounds | (R_F−1) full rounds | 1 final
    full round without matrix mix.

Everything is batch-first: a "hash" is a batch of sponges [B, T, nd].  The
reference's single-shared-inversion trick (mod.rs:178-217) becomes a
log-depth product-tree batch inversion across all B·T (full) or B (partial)
S-box lanes — one Fermat inversion per round total, ~3 muls per lane.
The MDS multiply uses plain Montgomery multiplication by the true MDS
constants (bit-identical results; the reference's `mul_short` partial
reduction is a CPU-latency trick with no TPU analogue).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import fp as fpmod
from ..fields.fp import FpParams
from ..ops import limbs


class PoseidonParams:
    def __init__(self, field: FpParams, t: int, r_f: int, r_p: int,
                 rate: int, c2: int, round_cst, mds, after_zero_perm):
        self.field = field
        self.t = t
        self.r_f = r_f
        self.r_p = r_p
        self.rate = rate
        self.c2 = jnp.asarray(fpmod.fp_from_int(field, c2))
        rc = fpmod.fp_from_ints(field, round_cst).reshape(-1, t,
                                                          field.n_digits)
        n_full1, n_part = r_f, r_p
        self.rc_full1 = jnp.asarray(rc[:n_full1])
        self.rc_partial = jnp.asarray(rc[n_full1:n_full1 + n_part])
        self.rc_full2 = jnp.asarray(rc[n_full1 + n_part:
                                       n_full1 + n_part + r_f - 1])
        self.rc_last = jnp.asarray(rc[n_full1 + n_part + r_f - 1])
        self.mds = jnp.asarray(
            fpmod.fp_from_ints(field, mds).reshape(t, t, field.n_digits))
        self.after_zero_perm = jnp.asarray(
            fpmod.fp_from_ints(field, after_zero_perm))  # [t, nd]

    @staticmethod
    @functools.lru_cache()
    def mnt4753():
        from ..params._gen.poseidon_gen import POSEIDON_MNT4753 as d
        from .. import params as PP
        return PoseidonParams(PP.MNT4753_FR, d["t"], d["r_f"], d["r_p"],
                              d["rate"], d["c2"], d["round_cst"], d["mds"],
                              d["after_zero_perm"])

    @staticmethod
    @functools.lru_cache()
    def mnt6753():
        from ..params._gen.poseidon_gen import POSEIDON_MNT6753 as d
        from .. import params as PP
        return PoseidonParams(PP.MNT6753_FR, d["t"], d["r_f"], d["r_p"],
                              d["rate"], d["c2"], d["round_cst"], d["mds"],
                              d["after_zero_perm"])


class PoseidonHash:
    """Batched sponge; mirrors FieldBasedHash::evaluate (mod.rs:580-616)."""

    def __init__(self, params: PoseidonParams):
        self.p = params
        self.F = params.field

    # -- internals --

    def _sbox_full(self, state):
        B, t, nd = state.shape
        flat = state.reshape(B * t, nd)
        return fpmod.batch_inverse_tree(self.F, flat).reshape(B, t, nd)

    def _sbox_partial(self, state):
        s0 = fpmod.batch_inverse_tree(self.F, state[:, 0, :])
        return jnp.concatenate([s0[:, None, :], state[:, 1:, :]], axis=1)

    def _mix(self, state):
        # new_i = Σ_j MDS[i,j] · s_j  (matrix_mix_short, mod.rs:374-425)
        prods = fpmod.mont_mul(self.F, self.p.mds[None, :, :, :],
                               state[:, None, :, :])   # [B, t, t, nd]
        acc = prods[:, :, 0, :]
        for j in range(1, self.p.t):
            acc = fpmod.add_mod(self.F, acc, prods[:, :, j, :])
        return acc

    def permute(self, state):
        """state [B, t, nd] -> permuted state.

        On TPU the whole permutation runs as fused RNS Pallas round
        kernels (ops/pallas_poseidon.py) — same bit-exact results."""
        from ..ops import pallas_poseidon
        from ..ops.pallas_mont import use_pallas
        if use_pallas() and pallas_poseidon.supports(self.p):
            return pallas_poseidon.permute_fused(self.p, state)
        P = self.p

        def full_round(state, rc):
            state = fpmod.add_mod(self.F, state, rc)
            state = self._sbox_full(state)
            return self._mix(state), None

        def partial_round(state, rc):
            state = fpmod.add_mod(self.F, state, rc)
            state = self._sbox_partial(state)
            return self._mix(state), None

        state, _ = jax.lax.scan(full_round, state, P.rc_full1)
        state, _ = jax.lax.scan(partial_round, state, P.rc_partial)
        if P.r_f > 1:
            state, _ = jax.lax.scan(full_round, state, P.rc_full2)
        # last full round: no matrix mix
        state = fpmod.add_mod(self.F, state, P.rc_last)
        state = self._sbox_full(state)
        return state

    # -- public API --

    def init_state(self, batch: int):
        return jnp.broadcast_to(self.p.after_zero_perm[None],
                                (batch,) + self.p.after_zero_perm.shape)

    def evaluate(self, inputs):
        """inputs: [B, L, nd] Montgomery field elements; returns [B, nd].

        Absorbs rate-sized chunks, adding C2 to the capacity each chunk;
        trailing partial chunk handled like the reference (mod.rs:603-612).
        """
        B, L, nd = inputs.shape
        P = self.p
        state = self.init_state(B)
        full, rem = divmod(L, P.rate)
        for i in range(full):
            chunk = inputs[:, i * P.rate:(i + 1) * P.rate, :]
            absorbed = fpmod.add_mod(self.F, state[:, :P.rate, :], chunk)
            cap = fpmod.add_mod(self.F, state[:, P.rate:, :],
                                jnp.broadcast_to(self.p.c2,
                                                 state[:, P.rate:, :].shape))
            state = jnp.concatenate([absorbed, cap], axis=1)
            state = self.permute(state)
        if rem:
            a0 = fpmod.add_mod(self.F, state[:, 0:rem, :],
                               inputs[:, full * P.rate:, :])
            mid = state[:, rem:P.rate, :]
            cap = fpmod.add_mod(self.F, state[:, P.rate:, :],
                                jnp.broadcast_to(self.p.c2,
                                                 state[:, P.rate:, :].shape))
            state = jnp.concatenate([a0, mid, cap], axis=1)
            state = self.permute(state)
        return state[:, 0, :]

    def hash_2_1(self, left, right):
        """Batched 2->1 compression (batch_evaluate_2_1, mod.rs:623-669)."""
        return self.evaluate(jnp.stack([left, right], axis=1))

    # host helpers
    def evaluate_ints(self, rows):
        """rows: list of lists of python ints -> list of ints (host test)."""
        L = len(rows[0])
        arr = np.stack([fpmod.fp_from_ints(self.F, row) for row in rows])
        out = jax.jit(self.evaluate)(jnp.asarray(arr))
        return fpmod.fp_to_ints(self.F, np.asarray(out))
