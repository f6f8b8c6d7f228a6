"""Concrete curve instantiations (the reference's curves/{mnt4753,...}).

Each accessor builds (lazily, cached) the tower ops and SWCurveOps for a
curve family.  Constants come from params/_gen/curves_gen.py (standard form,
extracted from the reference), Frobenius tables are derived on the fly.
"""

from __future__ import annotations

import functools

from .. import params as PP
from ..params._gen import curves_gen as CG, towers_gen as TG
from ..fields import towers as T
from .sw import SWCurveOps


@functools.lru_cache()
def mnt4753_towers():
    return T.build_mnt4_towers(PP.MNT4753_FQ, TG.MNT4753_FQ2["nonresidue"])


@functools.lru_cache()
def mnt6753_towers():
    return T.build_mnt6_towers(PP.MNT6753_FQ, TG.MNT6753_FQ3["nonresidue"])


@functools.lru_cache()
def bls12_377_towers():
    return T.build_bls12_towers(
        PP.BLS12_377_FQ, TG.BLS12_377_FQ2["nonresidue"],
        TG.BLS12_377_FQ6["nonresidue"])


@functools.lru_cache()
def bls12_381_towers():
    return T.build_bls12_towers(
        PP.BLS12_381_FQ, TG.BLS12_381_FQ2["nonresidue"],
        TG.BLS12_381_FQ6["nonresidue"])


@functools.lru_cache()
def sw6_towers():
    return T.build_mnt6_towers(PP.SW6_FQ, TG.SW6_FQ3["nonresidue"])


@functools.lru_cache()
def mnt6298_towers():
    return T.build_mnt6_towers(PP.MNT6298_FQ, TG.MNT6298_FQ3["nonresidue"])


@functools.lru_cache()
def mnt4753_g1() -> SWCurveOps:
    base, _, _ = mnt4753_towers()
    c = CG.MNT4753
    return SWCurveOps("mnt4753_g1", base, c["a"], c["b"],
                      generator_host=(c["g1_x"], c["g1_y"]),
                      cofactor=c["cofactor"],
                      cofactor_inv=c["cofactor_inv"],
                      scalar_field=PP.MNT4753_FR)


@functools.lru_cache()
def mnt4753_g2() -> SWCurveOps:
    _, fq2, _ = mnt4753_towers()
    c = CG.MNT4753
    return SWCurveOps("mnt4753_g2", fq2, c["g2_a"], c["g2_b"],
                      generator_host=(c["g2_x"], c["g2_y"]),
                      cofactor=c["g2_cofactor"],
                      cofactor_inv=c["g2_cofactor_inv"],
                      scalar_field=PP.MNT4753_FR)


@functools.lru_cache()
def mnt6753_g1() -> SWCurveOps:
    base, _, _ = mnt6753_towers()
    c = CG.MNT6753
    return SWCurveOps("mnt6753_g1", base, c["a"], c["b"],
                      generator_host=(c["g1_x"], c["g1_y"]),
                      cofactor=c["cofactor"],
                      cofactor_inv=c["cofactor_inv"],
                      scalar_field=PP.MNT6753_FR)


@functools.lru_cache()
def mnt6753_g2() -> SWCurveOps:
    _, fq3, _ = mnt6753_towers()
    c = CG.MNT6753
    return SWCurveOps("mnt6753_g2", fq3, c["g2_a"], c["g2_b"],
                      generator_host=(c["g2_x"], c["g2_y"]),
                      cofactor=c["g2_cofactor"],
                      cofactor_inv=c["g2_cofactor_inv"],
                      scalar_field=PP.MNT6753_FR)


@functools.lru_cache()
def bls12_377_g1() -> SWCurveOps:
    t = bls12_377_towers()
    c = CG.BLS12_377
    return SWCurveOps("bls12_377_g1", t[0], c["a"], c["b"],
                      generator_host=(c["g1_x"], c["g1_y"]),
                      cofactor=c["cofactor"],
                      cofactor_inv=c["cofactor_inv"],
                      scalar_field=PP.BLS12_377_FR)


@functools.lru_cache()
def bls12_377_g2() -> SWCurveOps:
    t = bls12_377_towers()
    c = CG.BLS12_377
    return SWCurveOps("bls12_377_g2", t[1], c["g2_a"], c["g2_b"],
                      generator_host=(c["g2_x"], c["g2_y"]),
                      cofactor=c["g2_cofactor"],
                      cofactor_inv=c["g2_cofactor_inv"],
                      scalar_field=PP.BLS12_377_FR)


@functools.lru_cache()
def bls12_381_g1() -> SWCurveOps:
    t = bls12_381_towers()
    c = CG.BLS12_381
    return SWCurveOps("bls12_381_g1", t[0], c["a"], c["b"],
                      generator_host=(c["g1_x"], c["g1_y"]),
                      cofactor=c["cofactor"],
                      cofactor_inv=c["cofactor_inv"],
                      scalar_field=PP.BLS12_381_FR)


@functools.lru_cache()
def bls12_381_g2() -> SWCurveOps:
    t = bls12_381_towers()
    c = CG.BLS12_381
    return SWCurveOps("bls12_381_g2", t[1], c["g2_a"], c["g2_b"],
                      generator_host=(c["g2_x"], c["g2_y"]),
                      cofactor=c["g2_cofactor"],
                      cofactor_inv=c["g2_cofactor_inv"],
                      scalar_field=PP.BLS12_381_FR)


@functools.lru_cache()
def sw6_g1() -> SWCurveOps:
    t = sw6_towers()
    c = CG.SW6
    return SWCurveOps("sw6_g1", t[0], c["a"], c["b"],
                      generator_host=(c["g1_x"], c["g1_y"]),
                      cofactor=c["cofactor"],
                      cofactor_inv=c["cofactor_inv"],
                      scalar_field=PP.SW6_FR)


@functools.lru_cache()
def sw6_g2() -> SWCurveOps:
    t = sw6_towers()
    c = CG.SW6
    return SWCurveOps("sw6_g2", t[1], c["g2_a"], c["g2_b"],
                      generator_host=(c["g2_x"], c["g2_y"]),
                      cofactor=c["g2_cofactor"],
                      cofactor_inv=c["g2_cofactor_inv"],
                      scalar_field=PP.SW6_FR)


@functools.lru_cache()
def mnt4753_pairing():
    from .pairing_mnt import MNTPairing
    _, _, fq4 = mnt4753_towers()
    c = CG.MNT4753
    return MNTPairing(
        "mnt4753", mnt4753_g1(), mnt4753_g2(), fq4,
        wnaf=c["wnaf"], ate_is_neg=c["ate_is_loop_count_neg"],
        w1=c["final_exponent_last_chunk_1"],
        w0_abs=c["final_exponent_last_chunk_abs_of_w0"],
        w0_is_neg=c["final_exponent_last_chunk_w0_is_neg"],
        easy_frob=2, easy_mul_q_plus_1=False)


@functools.lru_cache()
def mnt6753_pairing():
    from .pairing_mnt import MNTPairing
    _, _, fq6 = mnt6753_towers()
    c = CG.MNT6753
    return MNTPairing(
        "mnt6753", mnt6753_g1(), mnt6753_g2(), fq6,
        wnaf=c["wnaf"], ate_is_neg=c["ate_is_loop_count_neg"],
        w1=c["final_exponent_last_chunk_1"],
        w0_abs=c["final_exponent_last_chunk_abs_of_w0"],
        w0_is_neg=c["final_exponent_last_chunk_w0_is_neg"],
        easy_frob=3, easy_mul_q_plus_1=True)


def find_wnaf(n: int):
    """NAF of n, LSB first, MSB trimmed (biginteger/mod.rs find_wnaf +
    the trimming convention of mnt4753/mod.rs:42)."""
    out = []
    while n > 0:
        if n & 1:
            z = 2 - (n % 4)
            n -= z
        else:
            z = 0
        out.append(z)
        n >>= 1
    assert out[-1] == 1
    return out[:-1]


@functools.lru_cache()
def sw6_pairing():
    """SW6 (CP6-782) device ate pairing (curves/sw6/mod.rs:64-269): the
    hand-rolled engine is MNT6-shaped (Fq3 twist (0,1,0), Fq6 lines, easy
    part (q³−1)(q+1), hard part elt^(w1·q)·elt^(±w0)), so it instantiates
    the generic MNT ladder.  ATE_LOOP_COUNT is the decoded [u64;13] limb
    array — 782 bits; the 388-bit doc comment at sw6/mod.rs:183 disagrees
    with the code (see pairing_host.host_sw6_pairing)."""
    from .pairing_mnt import MNTPairing
    from .pairing_host import _SW6_W1
    _, _, fq6 = sw6_towers()
    c = CG.SW6
    return MNTPairing(
        "sw6", sw6_g1(), sw6_g2(), fq6,
        wnaf=find_wnaf(c["ate_loop_count"]),
        ate_is_neg=c["ate_is_loop_count_neg"],
        w1=_SW6_W1,
        w0_abs=c["final_exponent_last_chunk_abs_of_w0"],
        w0_is_neg=c["final_exponent_last_chunk_w0_is_neg"],
        easy_frob=3, easy_mul_q_plus_1=True)


@functools.lru_cache()
def mnt6298_pairing():
    from .pairing_mnt import MNTPairing
    _, _, fq6 = mnt6298_towers()
    c = CG.MNT6298
    return MNTPairing(
        "mnt6298", mnt6298_g1(), mnt6298_g2(), fq6,
        wnaf=find_wnaf(c["ate_loop_count"]),
        ate_is_neg=c["ate_is_loop_count_neg"],
        w1=c["final_exponent_last_chunk_1"],
        w0_abs=c["final_exponent_last_chunk_abs_of_w0"],
        w0_is_neg=c["final_exponent_last_chunk_w0_is_neg"],
        easy_frob=3, easy_mul_q_plus_1=True)


@functools.lru_cache()
def mnt6298_g1() -> SWCurveOps:
    t = mnt6298_towers()
    c = CG.MNT6298
    return SWCurveOps("mnt6298_g1", t[0], c["a"], c["b"],
                      generator_host=(c["g1_x"], c["g1_y"]),
                      cofactor=c["cofactor"],
                      cofactor_inv=c["cofactor_inv"],
                      scalar_field=PP.MNT6298_FR)


@functools.lru_cache()
def mnt6298_g2() -> SWCurveOps:
    t = mnt6298_towers()
    c = CG.MNT6298
    return SWCurveOps("mnt6298_g2", t[1], c["g2_a"], c["g2_b"],
                      generator_host=(c["g2_x"], c["g2_y"]),
                      cofactor=c["g2_cofactor"],
                      cofactor_inv=c["g2_cofactor_inv"],
                      scalar_field=PP.MNT6298_FR)


# ---------------------------------------------------------------------------
# Twisted Edwards instantiations (curves/{jubjub,edwards_bls12,edwards_sw6})
# ---------------------------------------------------------------------------

from .twisted_edwards import TECurveOps  # noqa: E402


def _te(name, fq_params, fr_params, c) -> TECurveOps:
    return TECurveOps(
        name, T.FpOps(fq_params), c["a"], c["d"],
        generator_host=(c["g_x"], c["g_y"]),
        cofactor=c["cofactor"], cofactor_inv=c["cofactor_inv"],
        scalar_field=fr_params,
        mont_a=c["mont_a"], mont_b=c["mont_b"])


@functools.lru_cache()
def jubjub() -> TECurveOps:
    """Jubjub over BLS12-381 Fr (algebra/src/curves/jubjub/mod.rs)."""
    return _te("jubjub", PP.JUBJUB_FQ, PP.JUBJUB_FR, CG.JUBJUB)


@functools.lru_cache()
def edwards_bls12() -> TECurveOps:
    """Edwards curve over BLS12-377 Fr (curves/edwards_bls12/mod.rs)."""
    return _te("edwards_bls12", PP.EDWARDS_BLS12_FQ, PP.EDWARDS_BLS12_FR,
               CG.EDWARDS_BLS12)


@functools.lru_cache()
def edwards_sw6() -> TECurveOps:
    """Edwards curve over SW6 Fr = BLS12-377 Fq (curves/edwards_sw6/mod.rs)."""
    return _te("edwards_sw6", PP.EDWARDS_SW6_FQ, PP.EDWARDS_SW6_FR,
               CG.EDWARDS_SW6)


# ---------------------------------------------------------------------------
# BLS12 pairing engines (curves/models/bls12)
# ---------------------------------------------------------------------------

from .pairing_bls12 import Bls12Pairing  # noqa: E402


@functools.lru_cache()
def bls12_377_pairing() -> Bls12Pairing:
    _, _, fq6, fq12 = bls12_377_towers()
    c = CG.BLS12_377
    return Bls12Pairing("bls12_377", bls12_377_g1(), bls12_377_g2(),
                        fq6, fq12, c["x"], c["x_is_negative"], "D")


@functools.lru_cache()
def bls12_381_pairing() -> Bls12Pairing:
    _, _, fq6, fq12 = bls12_381_towers()
    c = CG.BLS12_381
    return Bls12Pairing("bls12_381", bls12_381_g1(), bls12_381_g2(),
                        fq6, fq12, c["x"], c["x_is_negative"], "M")
