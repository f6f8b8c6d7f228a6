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


@pytest.mark.slow
def test_mnt6298_bilinearity():
    _bilinearity(CI.mnt6298_pairing())


@pytest.mark.slow
def test_mnt4753_bilinearity():
    _bilinearity(CI.mnt4753_pairing())


@pytest.mark.slow
def test_mnt6753_bilinearity():
    _bilinearity(CI.mnt6753_pairing())


@pytest.mark.slow
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


@pytest.mark.slow
def test_mnt6298_device_vs_host_oracle():
    """Device engine reproduces the host-int oracle's GT bit-for-bit on
    [3]G1 x [5]G2 (ROADMAP item: legacy-curve parity at value level, not
    just bilinearity)."""
    from gingerlib_tpu.curves.pairing_host import host_mnt6298_pairing
    from gingerlib_tpu.fields.towers import ext_to_ints

    E = CI.mnt6298_pairing()
    H = host_mnt6298_pairing()
    # device points
    g1, g2 = E.g1, E.g2
    aG = jax.jit(lambda P: g1.mul_const(P, 3))(g1.generator((1,)))
    bH = jax.jit(lambda P: g2.mul_const(P, 5))(g2.generator((1,)))
    pa = jax.jit(g1.to_affine)(aG)
    qa = jax.jit(g2.to_affine)(bH)
    gt_dev = ext_to_ints(E.fqk, np.asarray(E.pairing(pa, qa))[0])
    # host points (from the device affine coords — already validated)
    from gingerlib_tpu.fields import fp as fpmod
    px = [fpmod.fp_to_int(E.fp, np.asarray(pa[0])[0, i]) for i in range(1)]
    py = [fpmod.fp_to_int(E.fp, np.asarray(pa[1])[0, i]) for i in range(1)]
    qx = [fpmod.fp_to_int(E.fp, np.asarray(qa[0])[0, i]) for i in range(3)]
    qy = [fpmod.fp_to_int(E.fp, np.asarray(qa[1])[0, i]) for i in range(3)]
    gt_host = H.pairing((px, py), (qx, qy))
    assert gt_dev == [v % H.p for v in gt_host]


@pytest.mark.slow
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


# e(G1, G2) for the SW6 generators, computed with the reference-shaped
# plain-binary ladder over the reference's actual ATE_LOOP_COUNT limb array
# (curves/sw6/mod.rs:185-199; the doc comment's 388-bit value at :183-184
# disagrees with the compiled limbs — the code wins, see
# pairing_host.host_sw6_pairing docstring).  Anchors the oracle's GT values.
_SW6_GT_G1G2 = [
    21513276534743943104596713219355341358586713169859452486127897976599692735060616914556926178706235507317114713031047417109370830075346515923127188102759328733824890991490185326609454475610828618953340885995411028181432145405960888527071,  # noqa: E501
    3331045930537674940609774936387680192316337121936809450114623293876120286877388404447522199633789741945191865317116369422187070663596622775894893002601805076413995680304431019833374251106695693944386480657543171546768467566748674192911,  # noqa: E501
    11447758708454340853313015968641938667166651209217552267064442654250258407084793146756921421255595255556019892491543143366685295176148323137283855161937599871310027107080200095589785395929182290749367795317736865548332342310137473351749,  # noqa: E501
    18305928254593090350663007269621686111157160904682660775442009363678857433703535737285194697123029267744208069423075727037464825973232817539531779064628249581537180351629100080334131870318979946350459432200927722187777135789172908399986,  # noqa: E501
    13510455650459054066626257897326294736324739865748725149120746804895181966826925043874560288157091482204127755322255295201024511891724356951129961637286053651716706929447854879952641313768535054413995315128456599734218739177820601741005,  # noqa: E501
    1528013370049677800502710434937465820797994475938748217555709054687026461470730447934146372982198870493604138298507557692798681057320569912053772326445890407748418760317541865916830267009409988714017415552882338015098719034089622248902,  # noqa: E501
]


@pytest.mark.slow
def test_sw6_device_pairing_vs_vector():
    """Device SW6 engine (generic MNT ladder instantiation) reproduces the
    pinned reference-shaped GT vector on the generators."""
    from gingerlib_tpu.fields.towers import ext_to_ints

    E = CI.sw6_pairing()
    g1, g2 = E.g1, E.g2
    px, py = g1.generator_affine
    qx, qy = g2.generator_affine
    gt = E.pairing((px[None], py[None]), (qx[None], qy[None]))
    got = ext_to_ints(E.fqk, np.asarray(gt)[0])
    assert got == _SW6_GT_G1G2


@pytest.mark.slow
def test_sw6_gt_vector():
    """Pin e(G1, G2) on SW6: the NAF oracle must keep reproducing the
    reference engine's plain-binary ladder bit-for-bit."""
    from gingerlib_tpu.params._gen import curves_gen as CG
    from gingerlib_tpu.curves.pairing_host import host_sw6_pairing

    E = host_sw6_pairing()
    c = CG.SW6
    gt = E.pairing(([c["g1_x"]], [c["g1_y"]]),
                   (list(c["g2_x"]), list(c["g2_y"])))
    assert gt == _SW6_GT_G1G2


# ---------------------------------------------------------------------------
# Reference bit-exact anchors for the 753 cycle (mnt4753/tests.rs:265-490,
# mnt6753/tests.rs:319-614): explicit projective points and the full
# pairing value, extracted by tools/extract_anchors.py.
# ---------------------------------------------------------------------------

def _anchor_case(name):
    from gingerlib_tpu.params._gen import anchors_gen as A
    from gingerlib_tpu.curves.pairing_host import (
        host_mnt4753_pairing, host_mnt6753_pairing)
    from gingerlib_tpu.gadgets.std.groups import _host_ext_inv, _host_ext_mul
    host_fn = {"mnt4753": host_mnt4753_pairing,
               "mnt6753": host_mnt6753_pairing}[name]
    anchor = {"mnt4753": A.MNT4753_PAIRING_ANCHOR,
              "mnt6753": A.MNT6753_PAIRING_ANCHOR}[name]
    E = host_fn()
    p = E.p
    aX, aY, aZ = anchor["a"]
    zi = pow(aZ, p - 2, p)
    pa = ([aX * zi % p], [aY * zi % p])
    bX, bY, bZ = anchor["b"]
    zinv = _host_ext_inv(E.S, list(bZ))
    qb = (_host_ext_mul(E.S, list(bX), zinv),
          _host_ext_mul(E.S, list(bY), zinv))
    return E, p, pa, qb, [v % p for v in anchor["gt"]]


@pytest.mark.parametrize("name", ["mnt4753", "mnt6753"])
def test_host_pairing_matches_reference_anchor(name):
    E, p, pa, qb, gt = _anchor_case(name)
    assert [v % p for v in E.pairing(pa, qb)] == gt


@pytest.mark.slow
@pytest.mark.parametrize("name", ["mnt4753", "mnt6753"])
def test_device_pairing_matches_reference_anchor(name):
    from gingerlib_tpu.fields import fp as fpmod
    eng = {"mnt4753": CI.mnt4753_pairing, "mnt6753": CI.mnt6753_pairing}[name]()
    _, p, pa, qb, gt = _anchor_case(name)
    import jax.numpy as jnp
    px = jnp.asarray(fpmod.fp_from_ints(eng.fp, pa[0]))[None, :, :]
    py = jnp.asarray(fpmod.fp_from_ints(eng.fp, pa[1]))[None, :, :]
    qx = jnp.asarray(fpmod.fp_from_ints(eng.fp, qb[0]))[None, :, :]
    qy = jnp.asarray(fpmod.fp_from_ints(eng.fp, qb[1]))[None, :, :]
    out = eng.pairing((px, py), (qx, qy))
    got = T.ext_to_ints(eng.fqk, np.asarray(out).reshape(
        eng.fqk.K, eng.fp.n_digits))
    assert got == gt


@pytest.mark.slow
def test_line_c0_matches_dense_form():
    """_line_c0(M, y, y·nr) must equal the dense T²·y_P·M it replaced
    (sparse-c0 construction, fp4.rs:112 / fp6_2over3.rs:110 analogue) —
    for the quad (MNT4-753), cubic (MNT6-753) and legacy (MNT6-298)
    subfields."""
    import random
    import jax.numpy as jnp
    from gingerlib_tpu.fields import fp as fpmod
    from helpers import ext_rand

    for eng_fn in (CI.mnt4753_pairing, CI.mnt6753_pairing,
                   CI.mnt6298_pairing):
        eng = eng_fn()
        S = eng.sub
        assert eng._tw2_sparse, eng.name
        rng = random.Random(41)
        _, M = ext_rand(S, 3, seed=42)
        ys = [rng.randrange(eng.fp.modulus) for _ in range(3)]
        y = jnp.asarray(np.stack([fpmod.fp_from_int(eng.fp, v)
                                  for v in ys]))
        def run(M, y):
            ynr = fpmod.mont_mul(eng.fp, y, S.nr[0])
            sparse = eng._line_c0(M, y, ynr)
            dense = S.mul(S.scale_fp(jnp.broadcast_to(
                eng.twist_sq, M.shape[:-2] + eng.twist_sq.shape[-2:]), y),
                M)
            return sparse, dense
        sp, de = jax.jit(run)(M, y)
        assert np.array_equal(np.asarray(sp), np.asarray(de)), eng.name


@pytest.mark.slow
def test_prepared_pairing_matches_projective_mnt6298():
    """Fixed-G2 prepared path (host affine ladder, mnt4/mod.rs:100-154 +
    sparse device lines) must reproduce the projective device loop
    bit-for-bit — single pairing and a batched 2-pair product."""
    import jax.numpy as jnp

    E = CI.mnt6298_pairing()
    g1, g2 = E.g1, E.g2
    G = g1.generator((1,))
    H = g2.generator((1,))
    aG = jax.jit(lambda P: g1.mul_const(P, 12345))(G)
    bH = jax.jit(lambda P: g2.mul_const(P, 67891))(H)
    aGa = jax.jit(g1.to_affine)(aG)
    bHa = jax.jit(g2.to_affine)(bH)

    ref = np.asarray(E.pairing(aGa, bHa))
    prep = E.prepare_g2((np.asarray(bHa[0])[0], np.asarray(bHa[1])[0]))
    got = np.asarray(E.pairing_prepared((aGa[0][0], aGa[1][0]), prep))
    assert np.array_equal(ref[0], got)

    # e(aG, bH) · e(−aG, bH) == 1 through the prepared product path
    negaG = jax.jit(g1.to_affine)(jax.jit(g1.neg)(aG))
    p_b = (jnp.concatenate([aGa[0], negaG[0]]),
           jnp.concatenate([aGa[1], negaG[1]]))
    gt = np.asarray(E.product_of_pairings_prepared(p_b, [prep, prep]))
    assert np.array_equal(gt, np.asarray(E.fqk.one()))


@pytest.mark.slow
@pytest.mark.parametrize("name", ["mnt4753", "mnt6753"])
def test_prepared_pairing_matches_reference_anchor(name):
    """G2Prepared consumption on the 753 cycle pinned to the reference
    anchors (mnt4753/tests.rs:265-490) — same GT as the projective loop."""
    from gingerlib_tpu.fields import fp as fpmod
    eng = {"mnt4753": CI.mnt4753_pairing,
           "mnt6753": CI.mnt6753_pairing}[name]()
    _, p, pa, qb, gt = _anchor_case(name)
    import jax.numpy as jnp
    px = jnp.asarray(fpmod.fp_from_ints(eng.fp, pa[0]))
    py = jnp.asarray(fpmod.fp_from_ints(eng.fp, pa[1]))
    qx = fpmod.fp_from_ints(eng.fp, qb[0])
    qy = fpmod.fp_from_ints(eng.fp, qb[1])
    prep = eng.prepare_g2((qx, qy))
    out = eng.pairing_prepared((px, py), prep)
    got = T.ext_to_ints(eng.fqk, np.asarray(out).reshape(
        eng.fqk.K, eng.fp.n_digits))
    assert got == gt
