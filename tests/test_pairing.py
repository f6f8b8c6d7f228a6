"""Pairing bilinearity / non-degeneracy (curves/models/mnt{4,6}).

MNT6-298 (320-bit) is the cheap smoke curve; the 753-bit cycle curves are
marked slow.
"""

import numpy as np
import jax
import pytest

from gingerlib_tpu.curves import instances as CI
from gingerlib_tpu.fields import towers as T
from gingerlib_tpu.ops import limbs


def _bilinearity(engine, a=12345, b=67891):
    g1, g2 = engine.g1, engine.g2
    r = g1.scalar_field.modulus
    G = g1.generator((1,))
    H = g2.generator((1,))
    aG = jax.jit(lambda P: g1.mul_const(P, a))(G)
    bH = jax.jit(lambda P: g2.mul_const(P, b))(H)
    pts = {
        "aG": jax.jit(g1.to_affine)(aG), "G": jax.jit(g1.to_affine)(G),
        "bH": jax.jit(g2.to_affine)(bH), "H": jax.jit(g2.to_affine)(H),
    }
    pair = jax.jit(engine.pairing)
    e_ab = pair(pts["aG"], pts["bH"])
    e_gh = pair(pts["G"], pts["H"])
    ab = a * b % r
    e_gh_ab = jax.jit(lambda x: T.ext_pow_const(
        engine.fqk, x, limbs.bits_msb_first(ab, ab.bit_length())))(e_gh)
    assert np.array_equal(np.asarray(e_ab), np.asarray(e_gh_ab)), \
        "bilinearity failed"
    one = np.broadcast_to(engine.fqk.one(), np.asarray(e_gh).shape)
    assert not np.array_equal(np.asarray(e_gh), one), "degenerate pairing"
    # GT has order r
    e_r = jax.jit(lambda x: T.ext_pow_const(
        engine.fqk, x, limbs.bits_msb_first(r, r.bit_length())))(e_gh)
    assert np.array_equal(np.asarray(e_r), one), "GT order != r"


def test_mnt6298_bilinearity():
    _bilinearity(CI.mnt6298_pairing())


@pytest.mark.slow
def test_mnt4753_bilinearity():
    _bilinearity(CI.mnt4753_pairing())


@pytest.mark.slow
def test_mnt6753_bilinearity():
    _bilinearity(CI.mnt6753_pairing())


def test_product_of_pairings_cancellation():
    """e(aG, H) · e(-aG, H) == 1 via the batched 2-pair loop."""
    import jax.numpy as jnp
    E = CI.mnt6298_pairing()
    g1, g2 = E.g1, E.g2
    G = g1.generator((1,))
    aG = jax.jit(lambda P: g1.mul_const(P, 7))(G)
    ax, ay = jax.jit(g1.to_affine)(aG)
    hx, hy = jax.jit(g2.to_affine)(g2.generator((1,)))
    p = (jnp.concatenate([ax, ax]), jnp.concatenate([ay, g1.F.neg(ay)]))
    q = (jnp.concatenate([hx, hx]), jnp.concatenate([hy, hy]))
    gt = jax.jit(E.product_of_pairings)(p, q)
    one = np.broadcast_to(E.fqk.one(), np.asarray(gt).shape)
    assert np.array_equal(np.asarray(gt), one)


def test_sw6_host_bilinearity():
    """SW6 (CP6-782) hand-rolled engine (curves/sw6/mod.rs:64-170): host
    oracle bilinearity, non-degeneracy and GT order r."""
    from gingerlib_tpu import params as PP
    from gingerlib_tpu.params._gen import curves_gen as CG
    from gingerlib_tpu.curves.pairing_host import host_sw6_pairing
    from gingerlib_tpu.proofs.groth16_host import ec_mul, _FqWrap
    from gingerlib_tpu.gadgets.std.ext_fields import FpGOps

    E = host_sw6_pairing()
    c = CG.SW6
    base = FpGOps(_FqWrap(E.p))
    G1 = ([c["g1_x"]], [c["g1_y"]])
    G2 = (list(c["g2_x"]), list(c["g2_y"]))
    e = E.pairing(G1, G2)
    P3 = ec_mul(base, [c["a"]], G1, 3)
    Q5 = ec_mul(E.S, c["g2_a"], G2, 5)
    assert E.pairing(P3, Q5) == E._fpow(e, 15)
    assert e != E._fone()
    assert E._fpow(e, PP.SW6_FR.modulus) == E._fone()
