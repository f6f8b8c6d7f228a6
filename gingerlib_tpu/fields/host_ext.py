"""Host-side exact extension-field arithmetic (python ints).

Used to derive Frobenius coefficient tables and other tower constants at
parameter-build time instead of transcribing the reference's large constant
tables (algebra/src/fields/*/fq{2,3,4,6,12}.rs).  Elements are tuples of
ints; only the small set of operations needed for constant derivation is
implemented.  Everything is validated against the reference's extracted
Frobenius tables in tests/test_towers.py.
"""

from __future__ import annotations


def quad_mul(p, nr, a, b):
    """(a0 + a1 X)(b0 + b1 X) with X^2 = nr; nr may be an int or a tuple
    (in which case components are elements of a sub-tower and ``submul``
    handles them — here we only need int nonresidues)."""
    a0, a1 = a
    b0, b1 = b
    return ((a0 * b0 + nr * a1 * b1) % p, (a0 * b1 + a1 * b0) % p)


def quad_pow(p, nr, a, e):
    r = (1, 0)
    while e > 0:
        if e & 1:
            r = quad_mul(p, nr, r, a)
        a = quad_mul(p, nr, a, a)
        e >>= 1
    return r


def cubic_mul(p, nr, a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    return (
        (a0 * b0 + nr * (a1 * b2 + a2 * b1)) % p,
        (a0 * b1 + a1 * b0 + nr * a2 * b2) % p,
        (a0 * b2 + a1 * b1 + a2 * b0) % p,
    )


def cubic_pow(p, nr, a, e):
    r = (1, 0, 0)
    while e > 0:
        if e & 1:
            r = cubic_mul(p, nr, r, a)
        a = cubic_mul(p, nr, a, a)
        e >>= 1
    return r


# ---------------------------------------------------------------------------
# Frobenius coefficient derivations
# ---------------------------------------------------------------------------

def frob_table_fp2(p, nr):
    """c1[i] = nr^((p^i-1)/2) for i in 0..1."""
    return [pow(nr, (pow(p, i) - 1) // 2, p) for i in range(2)]


def frob_table_fp3(p, nr):
    c1 = [pow(nr, (pow(p, i) - 1) // 3, p) for i in range(3)]
    c2 = [pow(nr, 2 * (pow(p, i) - 1) // 3, p) for i in range(3)]
    return c1, c2


def frob_table_fp4(p, nr2):
    """Fp4 = Fp2[Y]/(Y^2 - X), X^2 = nr2.  c1[i] = X^((p^i-1)/2) which lands
    in Fp for these parameter sets; returns list of ints."""
    out = []
    for i in range(4):
        e = (pow(p, i) - 1) // 2
        v = quad_pow(p, nr2, (0, 1), e)
        assert v[1] == 0, "Fp4 frobenius coeff not in Fp"
        out.append(v[0])
    return out


def frob_table_fp6_2over3(p, nr3):
    """Fp6 = Fp3[Y]/(Y^2 - X), X^3 = nr3.  c1[i] = X^((p^i-1)/2) ∈ Fp."""
    out = []
    for i in range(6):
        e = (pow(p, i) - 1) // 2
        v = cubic_pow(p, nr3, (0, 1, 0), e)
        assert v[1] == 0 and v[2] == 0, "Fp6(2/3) frobenius coeff not in Fp"
        out.append(v[0])
    return out


def frob_table_fp6_3over2(p, nr2, xi):
    """Fp6 = Fp2[V]/(V^3 - xi), xi ∈ Fp2, X^2 = nr2.
    c1[i] = xi^((p^i-1)/3), c2[i] = xi^(2(p^i-1)/3) — Fp2 elements."""
    c1, c2 = [], []
    for i in range(6):
        e = (pow(p, i) - 1) // 3
        c1.append(quad_pow(p, nr2, tuple(xi), e))
        c2.append(quad_pow(p, nr2, tuple(xi), 2 * e))
    return c1, c2


def frob_table_fp12(p, nr2, xi):
    """Fp12 = Fp6[W]/(W^2 - V), V^3 = xi ∈ Fp2.
    c1[i] = xi^((p^i-1)/6) — Fp2 elements."""
    return [quad_pow(p, nr2, tuple(xi), (pow(p, i) - 1) // 6)
            for i in range(12)]
