"""Fused RNS Poseidon permutation (ops/pallas_poseidon.py) vs the XLA
batched path, interpret mode on CPU — random states, zero lanes (S-box
0 -> 0 in both full and partial rounds), all-zero sponge, and a chained
double-permute (outputs are canonical valid inputs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gingerlib_tpu.fields import fp as fpmod
from gingerlib_tpu.ops import pallas_poseidon
from gingerlib_tpu.primitives.poseidon import PoseidonHash, PoseidonParams

# slow: >420 s (not-slow subset) on this 1-core box, round-5 measurement
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    P = PoseidonParams.mnt4753()
    return P, PoseidonHash(P)


def _state(F, rows):
    return jnp.asarray(np.stack(
        [np.stack([fpmod.fp_from_int(F, v) for v in row]) for row in rows]))


def test_fused_permute_matches_xla(setup):
    P, h = setup
    F = P.field
    rng = np.random.RandomState(11)
    rows = [[int.from_bytes(rng.bytes(94), "little") % F.modulus
             for _ in range(3)] for _ in range(4)]
    rows[1][0] = 0          # zero hits the partial-round S-box
    rows[2][1] = 0          # zero hits a full-round S-box lane
    rows[3] = [0, 0, 0]     # fully-zero sponge
    state = _state(F, rows)

    want = np.asarray(h.permute(state))
    got = np.asarray(pallas_poseidon.permute_fused(P, state,
                                                   interpret=True, tile=8))
    np.testing.assert_array_equal(got, want)

    # outputs must be canonical valid inputs: permute once more
    want2 = np.asarray(h.permute(jnp.asarray(want)))
    got2 = np.asarray(pallas_poseidon.permute_fused(
        P, jnp.asarray(got), interpret=True, tile=8))
    np.testing.assert_array_equal(got2, want2)
