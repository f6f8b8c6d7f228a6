"""RNS Montgomery arithmetic (ops/rns.py) vs python-int oracle.

Validates the double-base Kawamura scheme end-to-end before the Pallas
kernel lands: context invariants, CRT round-trip, base-extension
exactness/boundedness, and chained Montgomery multiplies staying inside
the value-bound budget for both the golden model and the vectorized jnp
model — on MNT4-753 Fq (753-bit) and a small 64-bit prime."""

import numpy as np
import jax.numpy as jnp
import pytest

from gingerlib_tpu.ops import rns

def _p753():
    from gingerlib_tpu.params._gen import fields_gen as FG
    return int(FG.MNT4753_FQ["modulus"])


PRIMES = [0xFFFFFFFFFFFFFFC5, None]  # 64-bit prime; None -> mnt4 753-bit


def _ctx(pid):
    p = PRIMES[0] if pid == 0 else _p753()
    return rns.make_context(p)


@pytest.mark.parametrize("pid", [0, 1], ids=["p64", "mnt4_753"])
def test_context_invariants(pid):
    ctx = _ctx(pid)
    assert ctx.MA >> rns.GUARD_BITS > ctx.p
    assert ctx.MB >> rns.GUARD_BITS > ctx.p
    assert len(set(ctx.mA) | set(ctx.mB)) == 2 * ctx.k
    # weights error bound used by _alpha_est
    assert ctx.k * (1 << rns.CH_BITS) <= rns.ALPHA_OFF


@pytest.mark.parametrize("pid", [0, 1], ids=["p64", "mnt4_753"])
def test_crt_roundtrip(pid):
    ctx = _ctx(pid)
    rng = np.random.RandomState(5)
    xs = [int.from_bytes(rng.bytes((ctx.p.bit_length() + 7) // 8),
                         "little") % ctx.p for _ in range(10)]
    xs += [0, 1, ctx.p - 1]
    for x in xs:
        xa, xb = rns.to_rns_int(ctx, x)
        assert rns.from_rns_int(ctx, xa) == x


@pytest.mark.parametrize("pid", [0, 1], ids=["p64", "mnt4_753"])
def test_base_extension(pid):
    ctx = _ctx(pid)
    rng = np.random.RandomState(7)
    # exact mode: values far below M (the t-extension regime)
    for _ in range(20):
        t = int.from_bytes(rng.bytes((ctx.p.bit_length() + 7) // 8),
                           "little") % (3 * ctx.p)
        tb = tuple(t % m for m in ctx.mB)
        ta = rns.base_extend_int(ctx, tb, "B", exact=True)
        assert ta == tuple(t % m for m in ctx.mA)
    # no-offset mode: est never overestimates — result is q or q + M_A
    for _ in range(20):
        q = int.from_bytes(rng.bytes((ctx.MA.bit_length() + 7) // 8),
                           "little") % ctx.MA
        qa = tuple(q % m for m in ctx.mA)
        qb = rns.base_extend_int(ctx, qa, "A", exact=False)
        ok = (qb == tuple(q % m for m in ctx.mB) or
              qb == tuple((q + ctx.MA) % m for m in ctx.mB))
        assert ok


@pytest.mark.parametrize("pid", [0, 1], ids=["p64", "mnt4_753"])
def test_mont_mul_golden(pid):
    ctx = _ctx(pid)
    p = ctx.p
    rng = np.random.RandomState(11)
    xs = [int.from_bytes(rng.bytes((p.bit_length() + 7) // 8),
                         "little") % p for _ in range(8)] + [0, 1, p - 1]
    ys = [int.from_bytes(rng.bytes((p.bit_length() + 7) // 8),
                         "little") % p for _ in range(8)] + [p - 1, 0, 1]
    for x, y in zip(xs, ys):
        t = rns.mont_mul_rns_int(ctx, rns.to_rns_int(ctx, x),
                                 rns.to_rns_int(ctx, y))
        got = rns.from_rns_int(ctx, t[0])
        assert got < 3 * p
        assert got % p == x * y * pow(ctx.MA, -1, p) % p


@pytest.mark.parametrize("pid", [0, 1], ids=["p64", "mnt4_753"])
def test_mont_mul_chained_stays_bounded(pid):
    """Repeated squaring through the golden model keeps values < 3p
    (the invariant the kernel depends on) and matches pow()."""
    ctx = _ctx(pid)
    p = ctx.p
    x = 0xDEADBEEF % p
    # to Montgomery form: x * M_A mod p = mont_mul(x, M_A^2 mod p)
    r2 = ctx.MA * ctx.MA % p
    cur = rns.mont_mul_rns_int(ctx, rns.to_rns_int(ctx, x),
                               rns.to_rns_int(ctx, r2))
    expect = x
    for _ in range(12):
        cur = rns.mont_mul_rns_int(ctx, cur, cur)
        expect = expect * expect % p
        val = rns.from_rns_int(ctx, cur[0])
        assert val < 3 * p
        assert val % p == expect * ctx.MA % p


@pytest.mark.parametrize("pid", [0, 1], ids=["p64", "mnt4_753"])
def test_mont_mul_vectorized_matches_golden(pid):
    ctx = _ctx(pid)
    p = ctx.p
    rng = np.random.RandomState(13)
    xs = [int.from_bytes(rng.bytes((p.bit_length() + 7) // 8),
                         "little") % p for _ in range(6)] + [0, 1, p - 1]
    ys = [int.from_bytes(rng.bytes((p.bit_length() + 7) // 8),
                         "little") % p for _ in range(6)] + [p - 1, 1, 0]
    x = rns.to_rns(ctx, xs)
    y = rns.to_rns(ctx, ys)
    ta, tb = rns.mont_mul_rns(ctx, x, y)
    for i, (xi, yi) in enumerate(zip(xs, ys)):
        g_a, g_b = rns.mont_mul_rns_int(ctx, rns.to_rns_int(ctx, xi),
                                        rns.to_rns_int(ctx, yi))
        assert tuple(int(v) for v in np.asarray(ta)[i]) == g_a
        assert tuple(int(v) for v in np.asarray(tb)[i]) == g_b


@pytest.mark.parametrize("pid", [0, 1], ids=["p64", "mnt4_753"])
def test_mont_mul_rns_pallas_interpret(pid):
    """Packed-tile RNS Pallas kernel vs the golden model, interpret mode
    (Barrett channel reduction + bf16-split base-extension matmuls)."""
    from gingerlib_tpu.ops import pallas_rns

    ctx = _ctx(pid)
    p = ctx.p
    rng = np.random.RandomState(17)
    xs = [int.from_bytes(rng.bytes((p.bit_length() + 7) // 8),
                         "little") % p for _ in range(5)] + [0, 1, p - 1]
    ys = [int.from_bytes(rng.bytes((p.bit_length() + 7) // 8),
                         "little") % p for _ in range(5)] + [p - 1, 1, 0]
    x = pallas_rns.pack_rns(ctx, *rns.to_rns(ctx, xs))
    y = pallas_rns.pack_rns(ctx, *rns.to_rns(ctx, ys))
    out = pallas_rns.mont_mul_rns_pallas(p, x, y, interpret=True)
    ta, tb = pallas_rns.unpack_rns(ctx, out)
    for i, (xi, yi) in enumerate(zip(xs, ys)):
        got = rns.from_rns_int(ctx, [int(v) for v in np.asarray(ta)[i]])
        assert got < 3 * p
        assert got % p == xi * yi * pow(ctx.MA, -1, p) % p
        # base-B residues must agree with the base-A value
        assert tuple(int(v) for v in np.asarray(tb)[i]) == \
            tuple(got % m for m in ctx.mB)


@pytest.mark.parametrize("pid", [0, 1], ids=["p64", "mnt4_753"])
def test_mont_mul_rns_pallas_chained(pid):
    """Kernel outputs (values < 3p) must be valid kernel inputs: chain
    squarings through the kernel and compare against pow()."""
    from gingerlib_tpu.ops import pallas_rns

    ctx = _ctx(pid)
    p = ctx.p
    xs = [0xDEADBEEF % p, 12345, p - 2]
    r2 = ctx.MA * ctx.MA % p
    x = pallas_rns.pack_rns(ctx, *rns.to_rns(ctx, xs))
    r2p = pallas_rns.pack_rns(ctx, *rns.to_rns(ctx, [r2] * len(xs)))
    cur = pallas_rns.mont_mul_rns_pallas(p, x, r2p, interpret=True)
    expect = list(xs)
    for _ in range(6):
        cur = pallas_rns.mont_mul_rns_pallas(p, cur, cur, interpret=True)
        expect = [e * e % p for e in expect]
    ta, _ = pallas_rns.unpack_rns(ctx, cur)
    for i, e in enumerate(expect):
        got = rns.from_rns_int(ctx, [int(v) for v in np.asarray(ta)[i]])
        assert got % p == e * ctx.MA % p


@pytest.mark.parametrize("pid", [0, 1], ids=["p64", "mnt4_753"])
def test_positional_rns_conversions(pid):
    """to_rns_digits / from_rns_digits (the positional<->RNS boundary the
    hybrid EC path uses) vs python ints, including the <4p input range of
    from_rns_digits."""
    from gingerlib_tpu.ops import limbs

    ctx = _ctx(pid)
    p = ctx.p
    nd = -(-p.bit_length() // 16)
    rng = np.random.RandomState(23)
    xs = [int.from_bytes(rng.bytes((p.bit_length() + 7) // 8),
                         "little") % p for _ in range(6)] + [0, 1, p - 1]
    d = jnp.asarray(limbs.to_digits_batch(xs, nd))
    ra, rb = rns.to_rns_digits(ctx, d)
    for i, x in enumerate(xs):
        assert tuple(int(v) for v in np.asarray(ra)[i]) == \
            tuple(x % m for m in ctx.mA)
        assert tuple(int(v) for v in np.asarray(rb)[i]) == \
            tuple(x % m for m in ctx.mB)

    # from: values up to just under 4p must canonicalize mod p
    vals = xs + [p + 3, 2 * p + 5, 4 * p - 1]
    va = jnp.asarray(np.asarray(
        [[v % m for m in ctx.mA] for v in vals], np.uint32))
    pd = limbs.to_digits(p, nd)
    out = rns.from_rns_digits(ctx, va, pd, nd)
    got = [limbs.from_digits(np.asarray(out)[i])
           for i in range(len(vals))]
    assert got == [v % p for v in vals]
