"""In-circuit pairing gadget: bilinearity check, all host-side python.

e([a]G, [b]H) == e([ab]G, H) synthesized and checked for satisfiability;
values also cross-checked for non-degeneracy.
"""

import pytest

from gingerlib_tpu import params as PP
from gingerlib_tpu.params._gen import curves_gen as CG
from gingerlib_tpu.relations.r1cs import ConstraintSystem
from gingerlib_tpu.gadgets.std.pairing import mnt4753_pairing_gadget, \
    mnt6753_pairing_gadget
from gingerlib_tpu.gadgets.std.groups import SWGroupGadget, \
    _host_ext_mul, _host_ext_inv


def _host_ec_add(F, a_coeff, xy1, xy2):
    p = F.field.modulus
    x1, y1 = xy1
    x2, y2 = xy2
    num = [(u - v) % p for u, v in zip(y2, y1)]
    den = [(u - v) % p for u, v in zip(x2, x1)]
    lam = _host_ext_mul(F, num, _host_ext_inv(F, den))
    x3 = [(u - v - w) % p for u, v, w in zip(
        _host_ext_mul(F, lam, lam), x1, x2)]
    y3 = [(u - v) % p for u, v in zip(
        _host_ext_mul(F, lam, [(i - j) % p for i, j in zip(x1, x3)]), y1)]
    return (x3, y3)


def _host_ec_double(F, a_coeff, xy):
    p = F.field.modulus
    x, y = xy
    xx = _host_ext_mul(F, x, x)
    num = [(3 * u + v) % p for u, v in zip(xx, a_coeff)]
    den = [(2 * u) % p for u in y]
    lam = _host_ext_mul(F, num, _host_ext_inv(F, den))
    x3 = [(u - 2 * v) % p for u, v in zip(_host_ext_mul(F, lam, lam), x)]
    y3 = [(u - v) % p for u, v in zip(
        _host_ext_mul(F, lam, [(i - j) % p for i, j in zip(x, x3)]), y)]
    return (x3, y3)


def _host_ec_mul(F, a_coeff, xy, k):
    acc = None
    for bit in bin(k)[2:]:
        if acc is not None:
            acc = _host_ec_double(F, a_coeff, acc)
        if bit == "1":
            acc = xy if acc is None else _host_ec_add(F, a_coeff, acc, xy)
    return acc


@pytest.mark.parametrize("builder,ckey", [
    (mnt4753_pairing_gadget, "MNT4753"),
    (mnt6753_pairing_gadget, "MNT6753"),
])
def test_pairing_gadget_bilinearity(builder, ckey):
    pg, base, sub, fqk = builder()
    c = getattr(CG, ckey)
    p = pg.fq.modulus
    cs = ConstraintSystem(pg.fq)

    g1xy = ([c["g1_x"]], [c["g1_y"]])
    g2xy = (list(c["g2_x"]), list(c["g2_y"]))
    a_g1 = [c["a"] % p]
    a_g2 = [v % p for v in c["g2_a"]]

    a, b = 5, 7
    aG = _host_ec_mul(base, a_g1, g1xy, a)
    abG = _host_ec_mul(base, a_g1, g1xy, a * b)
    bH = _host_ec_mul(sub, a_g2, g2xy, b)

    g1g = SWGroupGadget(base, [c["a"]], [c["b"]])
    g2g = pg.g2
    P1 = g1g.alloc_checked(cs, aG, "aG")
    Q1 = g2g.alloc_checked(cs, bH, "bH")
    P2 = g1g.alloc_checked(cs, abG, "abG")
    Q2 = g2g.alloc_checked(cs, g2xy, "H")

    gt1 = pg.pairing_product(cs, [P1], [Q1], "e1")
    gt2 = pg.pairing_product(cs, [P2], [Q2], "e2")
    fqk.enforce_equal(cs, gt1, gt2, "bilinearity")

    # non-degenerate: value != 1
    one_vals = [w.value for w in fqk.one(cs)]
    assert fqk.value(gt1) != one_vals
    assert fqk.value(gt1) == fqk.value(gt2)
    bad = cs.which_is_unsatisfied()
    assert bad is None, f"unsatisfied at: {bad}"


def test_pairing_gadget_cancellation():
    """e(aG, H) · e(−aG, H) == 1 through the product loop."""
    pg, base, sub, fqk = mnt4753_pairing_gadget()
    c = CG.MNT4753
    p = pg.fq.modulus
    cs = ConstraintSystem(pg.fq)
    g1xy = ([c["g1_x"]], [c["g1_y"]])
    g2xy = (list(c["g2_x"]), list(c["g2_y"]))
    aG = _host_ec_mul(base, [c["a"] % p], g1xy, 11)
    negaG = (aG[0], [(-v) % p for v in aG[1]])
    g1g = SWGroupGadget(base, [c["a"]], [c["b"]])
    P1 = g1g.alloc_checked(cs, aG, "aG")
    P2 = g1g.alloc_checked(cs, negaG, "negaG")
    Q = pg.g2.alloc_checked(cs, g2xy, "H")
    Q2 = pg.g2.alloc_checked(cs, g2xy, "H2")
    gt = pg.pairing_product(cs, [P1, P2], [Q, Q2], "prod")
    fqk.enforce_equal(cs, gt, fqk.one(cs), "is_one")
    assert cs.which_is_unsatisfied() is None
    assert fqk.value(gt) == [w.value for w in fqk.one(cs)]
