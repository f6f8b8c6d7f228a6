"""Byte serialization, bit-compatible with the reference's ToBytes/FromBytes.

Formats (must be byte-identical for cross-validation against Rust):
* Fp element: little-endian bytes of the *standard-form* integer
  (fp_768.rs:784-787 writes into_repr()), width = 8·ceil(bits/64) bytes
  (the reference's u64 limb count — note this differs from our 16-bit digit
  count for 298/782-bit fields).
* extension elements: components in order (low first).
* SW affine point: x ‖ y ‖ infinity u8 (short_weierstrass_*.rs:185-200);
  the affine zero is (0, 1, infinity=true).
* Proof: a ‖ b ‖ c (groth16/mod.rs:35-54).
* VerifyingKey: alpha_g1_beta_g2 ‖ gamma_g2 ‖ delta_g2 ‖ u32-BE count ‖
  gamma_abc points (groth16/mod.rs:104-132).

All host-side (numpy/python ints): serialization is not a hot path.
"""

from __future__ import annotations

import struct

import numpy as np

from ..fields import fp as fpmod
from ..fields.fp import FpParams


def _ref_width(params: FpParams) -> int:
    return 8 * (-(-params.modulus_bits // 64))


def fp_to_bytes(params: FpParams, mont_digits) -> bytes:
    v = fpmod.fp_to_int(params, np.asarray(mont_digits))
    return v.to_bytes(_ref_width(params), "little")


def fp_from_bytes(params: FpParams, data: bytes, offset: int = 0):
    w = _ref_width(params)
    v = int.from_bytes(data[offset:offset + w], "little")
    if v >= params.modulus:
        raise ValueError("field element not in range")
    return fpmod.fp_from_int(params, v), offset + w


def ext_to_bytes(ops, elem) -> bytes:
    elem = np.asarray(elem)
    return b"".join(fp_to_bytes(ops.fp, elem[i]) for i in range(ops.K))


def ext_from_bytes(ops, data: bytes, offset: int = 0):
    comps = []
    for _ in range(ops.K):
        c, offset = fp_from_bytes(ops.fp, data, offset)
        comps.append(c)
    return np.stack(comps), offset


def affine_to_bytes(curve, xy, infinity: bool = False) -> bytes:
    x, y = xy
    if infinity:
        # reference affine zero: x = 0, y = 1 (GroupAffine::zero)
        zero = np.zeros((curve.F.K, curve.fp.n_digits), np.uint32)
        return (ext_to_bytes(curve.F, zero) +
                ext_to_bytes(curve.F, curve.F.one()) + b"\x01")
    return (ext_to_bytes(curve.F, np.asarray(x)) +
            ext_to_bytes(curve.F, np.asarray(y)) + b"\x00")


def affine_from_bytes(curve, data: bytes, offset: int = 0):
    x, offset = ext_from_bytes(curve.F, data, offset)
    y, offset = ext_from_bytes(curve.F, data, offset)
    inf = data[offset] == 1
    offset += 1
    return (x, y, inf), offset


# ---------------------------------------------------------------------------
# compressed bit serialization (ToCompressedBits / FromCompressedBits,
# short_weierstrass_projective.rs:205-268; write_bits fields/mod.rs:264-285)
# ---------------------------------------------------------------------------

def fp_write_bits(params: FpParams, v: int):
    """big-endian bits of a standard-form element, MODULUS_BITS long."""
    n = params.modulus_bits
    return [bool((v >> (n - 1 - i)) & 1) for i in range(n)]


def fp_read_bits(params: FpParams, bits) -> int:
    if len(bits) > params.modulus_bits:
        raise ValueError("bit vec longer than modulus bits")
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    if v >= params.modulus:
        raise ValueError("element over the field modulus")
    return v


def point_compress(params: FpParams, xy_host, infinity: bool = False):
    """G1 point (host ints) -> bit vec: x bits ‖ infinity ‖ y-parity."""
    x = 0 if infinity else xy_host[0]
    bits = fp_write_bits(params, x)
    bits.append(bool(infinity))
    bits.append((not infinity) and bool(xy_host[1] & 1))
    return bits


def point_decompress(params: FpParams, a: int, b: int, r: int, bits):
    """bit vec -> affine host point or None (infinity); validates curve
    membership and prime-order subgroup ([r]P == 0 via host EC)."""
    parity = bool(bits[-1])
    infinity = bool(bits[-2])
    x = fp_read_bits(params, bits[:-2])
    if infinity:
        if parity or x != 0:
            raise ValueError("invalid flags")
        return None
    p = params.modulus
    rhs = (x * x % p * x + a * x + b) % p
    y = _sqrt_mod(rhs, p)
    if y is None:
        raise ValueError("not on curve")
    if bool(y & 1) != parity:
        y = p - y
    # subgroup check
    from ..proofs.groth16_host import ec_mul, _FqWrap
    from ..gadgets.std.ext_fields import FpGOps
    F = FpGOps(_FqWrap(p))
    if ec_mul(F, [a % p], ([x], [y]), r) is not None:
        raise ValueError("not prime order")
    return (x, y)


def _sqrt_mod(v: int, p: int):
    """Tonelli-Shanks on host ints."""
    if v == 0:
        return 0
    if pow(v, (p - 1) // 2, p) != 1:
        return None
    if p % 4 == 3:
        return pow(v, (p + 1) // 4, p)
    # general T-S
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, rr = s, pow(z, q, p), pow(v, q, p), pow(v, (q + 1) // 2, p)
    while t != 1:
        i, tt = 0, t
        while tt != 1:
            tt = tt * tt % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        t, rr = t * c % p, rr * b % p
    return rr


def proof_to_bytes(engine, proof) -> bytes:
    g1, g2 = engine.g1, engine.g2
    return (affine_to_bytes(g1, proof.a) + affine_to_bytes(g2, proof.b) +
            affine_to_bytes(g1, proof.c))


def proof_from_bytes(engine, data: bytes):
    from ..proofs.groth16 import Proof
    import jax.numpy as jnp
    (ax, ay, _), off = affine_from_bytes(engine.g1, data, 0)
    (bx, by, _), off = affine_from_bytes(engine.g2, data, off)
    (cx, cy, _), off = affine_from_bytes(engine.g1, data, off)
    j = jnp.asarray
    return Proof(a=(j(ax), j(ay)), b=(j(bx), j(by)), c=(j(cx), j(cy))), off


def vk_to_bytes(engine, vk) -> bytes:
    g1, g2 = engine.g1, engine.g2
    out = [ext_to_bytes(engine.fqk, np.asarray(vk.alpha_g1_beta_g2))]
    out.append(affine_to_bytes(g2, vk.gamma_g2))
    out.append(affine_to_bytes(g2, vk.delta_g2))
    xs, ys = vk.gamma_abc_g1
    n = np.asarray(xs).shape[0]
    out.append(struct.pack(">I", n))
    for i in range(n):
        out.append(affine_to_bytes(g1, (np.asarray(xs)[i],
                                        np.asarray(ys)[i])))
    return b"".join(out)


def vk_from_bytes(engine, data: bytes):
    from ..proofs.groth16 import VerifyingKey
    import jax.numpy as jnp
    gt, off = ext_from_bytes(engine.fqk, data, 0)
    (gx, gy, _), off = affine_from_bytes(engine.g2, data, off)
    (dx, dy, _), off = affine_from_bytes(engine.g2, data, off)
    (n,) = struct.unpack(">I", data[off:off + 4])
    off += 4
    xs, ys = [], []
    for _ in range(n):
        (x, y, inf), off = affine_from_bytes(engine.g1, data, off)
        if inf:
            raise ValueError("point at infinity in gamma_abc")
        xs.append(x)
        ys.append(y)
    return VerifyingKey(
        alpha_g1_beta_g2=jnp.asarray(gt),
        gamma_g2=(jnp.asarray(gx), jnp.asarray(gy)),
        delta_g2=(jnp.asarray(dx), jnp.asarray(dy)),
        gamma_abc_g1=(jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(ys))),
    ), off


def _query_to_bytes(curve, query) -> bytes:
    """length-prefixed affine vector with per-point infinity flags
    (Parameters ToBytes, groth16/mod.rs:188-209)."""
    xs, ys, inf = query
    xs, ys, inf = np.asarray(xs), np.asarray(ys), np.asarray(inf)
    n = xs.shape[0]
    out = [struct.pack(">I", n)]
    for i in range(n):
        out.append(affine_to_bytes(curve, (xs[i], ys[i]),
                                   infinity=bool(inf[i])))
    return b"".join(out)


def _query_from_bytes(curve, data: bytes, offset: int):
    import jax.numpy as jnp
    (n,) = struct.unpack(">I", data[offset:offset + 4])
    offset += 4
    xs, ys, inf = [], [], []
    for _ in range(n):
        (x, y, isinf), offset = affine_from_bytes(curve, data, offset)
        xs.append(x)
        ys.append(y)
        inf.append(isinf)
    return (jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(ys)),
            jnp.asarray(np.asarray(inf, bool))), offset


def params_to_bytes(engine, params) -> bytes:
    """Full Parameters serialization (groth16/mod.rs:188-209): vk, then
    alpha/beta/delta points, then 5 length-prefixed query vectors."""
    g1, g2 = engine.g1, engine.g2
    out = [vk_to_bytes(engine, params.vk)]
    out.append(affine_to_bytes(g1, params.alpha_g1))
    out.append(affine_to_bytes(g1, params.beta_g1))
    out.append(affine_to_bytes(g2, params.beta_g2))
    out.append(affine_to_bytes(g1, params.delta_g1))
    out.append(affine_to_bytes(g2, params.delta_g2))
    out.append(_query_to_bytes(g1, params.a_query))
    out.append(_query_to_bytes(g1, params.b_g1_query))
    out.append(_query_to_bytes(g2, params.b_g2_query))
    out.append(_query_to_bytes(g1, params.h_query))
    out.append(_query_to_bytes(g1, params.l_query))
    return b"".join(out)


def params_from_bytes(engine, data: bytes):
    from ..proofs.groth16 import Parameters
    import jax.numpy as jnp
    g1, g2 = engine.g1, engine.g2
    vk, off = vk_from_bytes(engine, data)
    j = jnp.asarray

    def aff(curve, off):
        (x, y, _), off = affine_from_bytes(curve, data, off)
        return (j(x), j(y)), off

    alpha_g1, off = aff(g1, off)
    beta_g1, off = aff(g1, off)
    beta_g2, off = aff(g2, off)
    delta_g1, off = aff(g1, off)
    delta_g2, off = aff(g2, off)
    a_query, off = _query_from_bytes(g1, data, off)
    b_g1_query, off = _query_from_bytes(g1, data, off)
    b_g2_query, off = _query_from_bytes(g2, data, off)
    h_query, off = _query_from_bytes(g1, data, off)
    l_query, off = _query_from_bytes(g1, data, off)
    num_inputs = int(np.asarray(vk.gamma_abc_g1[0]).shape[0])
    domain_size = int(np.asarray(h_query[0]).shape[0]) + 1
    return Parameters(
        vk=vk, alpha_g1=alpha_g1, beta_g1=beta_g1, beta_g2=beta_g2,
        delta_g1=delta_g1, delta_g2=delta_g2, a_query=a_query,
        b_g1_query=b_g1_query, b_g2_query=b_g2_query, h_query=h_query,
        l_query=l_query, num_inputs=num_inputs, domain_size=domain_size,
    ), off


# ---------------------------------------------------------------------------
# GT (Fqk) compressed serialization (ToCompressedBits/FromCompressedBits for
# Fp4/Fp6, fields/models/fp4.rs:331-376, fp6_2over3.rs:450-495): store c1's
# bits plus c0's parity; decompress solves the unitary relation
# c0² − NR·c1² = 1 with a sub-field square root.
# ---------------------------------------------------------------------------

def _ext_is_odd(F, comps):
    """Reference Field::is_odd for Fp2/Fp3 (fp2.rs:101, fp3.rs:135):
    highest nonzero component's parity, priority c_{k-1} .. c_0."""
    from ..gadgets.std.ext_fields import FpGOps
    if isinstance(F, FpGOps):
        return bool(comps[0] & 1)
    k = F.sf.K
    deg = F.degree if hasattr(F, "degree") else F.K // k
    parts = [comps[i * k:(i + 1) * k] for i in range(deg)]
    for part in reversed(parts):
        if any(v % F.field.modulus != 0 for v in part):
            return _ext_is_odd(F.sf, part)
    return False


def _ext_pow_host(F, a, e):
    r = [1] + [0] * (F.K - 1)
    from ..gadgets.std.groups import _host_ext_mul
    base = list(a)
    while e:
        if e & 1:
            r = _host_ext_mul(F, r, base)
        base = _host_ext_mul(F, base, base)
        e >>= 1
    return r


def _ext_sqrt_host(F, a):
    """Tonelli-Shanks over F_{p^k} with host ints; returns None if no
    root (fields/mod.rs:339 SquareRootField semantics for towers)."""
    from ..gadgets.std.groups import _host_ext_mul
    p = F.field.modulus
    k = F.K
    q = p ** k
    one = [1] + [0] * (k - 1)
    zero = [0] * k
    a = [v % p for v in a]
    if a == zero:
        return zero
    if _ext_pow_host(F, a, (q - 1) // 2) != one:
        return None
    # factor q - 1 = t · 2^s
    t, s = q - 1, 0
    while t % 2 == 0:
        t //= 2
        s += 1
    # find a quadratic non-residue deterministically
    z = None
    for trial in range(2, 50):
        for cand in ([trial] + [0] * (k - 1),
                     [0] * (k - 1) + [trial] if k > 1 else None,
                     [trial, 1] + [0] * (k - 2) if k > 1 else None):
            if cand is None:
                continue
            if _ext_pow_host(F, cand, (q - 1) // 2) != one and \
                    _ext_pow_host(F, cand, q - 1) == one:
                z = cand
                break
        if z:
            break
    assert z is not None, "no non-residue found"
    m, c = s, _ext_pow_host(F, z, t)
    x = _ext_pow_host(F, a, (t + 1) // 2)
    b = _ext_pow_host(F, a, t)
    while b != one:
        i, bb = 0, list(b)
        while bb != one:
            bb = _host_ext_mul(F, bb, bb)
            i += 1
        e = _ext_pow_host(F, c, 1 << (m - i - 1))
        m, c = i, _host_ext_mul(F, e, e)
        b = _host_ext_mul(F, b, c)
        x = _host_ext_mul(F, x, e)
    return x


def gt_compress(F, comps):
    """F: host tower descriptor of Fqk (QuadExtG over Fq2/Fq3); comps:
    flat list of K standard-form ints.  Returns the reference's compressed
    bit vec: c1.write_bits() ‖ parity(c0)."""
    fq = F.field
    k = F.sf.K
    c0, c1 = comps[:k], comps[k:]
    bits = []
    for v in c1:
        bits.extend(fp_write_bits(fq, v % fq.modulus))
    bits.append(_ext_is_odd(F.sf, c0))
    return bits


def gt_decompress(F, bits):
    """Inverse of gt_compress; raises ValueError when sqrt(1 + NR·c1²)
    does not exist (BitSerializationError::UndefinedSqrt)."""
    from ..gadgets.std.groups import _host_ext_mul, _host_ext_mul_const
    from ..gadgets.std.ext_fields import _flatten
    fq = F.field
    p = fq.modulus
    k = F.sf.K
    parity = bool(bits[-1])
    body = bits[:-1]
    per = fq.modulus_bits
    if len(body) != k * per:
        raise ValueError("wrong compressed length")
    c1 = [fp_read_bits(fq, body[i * per:(i + 1) * per]) for i in range(k)]
    c1_sq = _host_ext_mul(F.sf, c1, c1)
    nr_c1_sq = _host_ext_mul_const(F.sf, c1_sq, _flatten(F.nr))
    t = [(a + b) % p for a, b in zip([1] + [0] * (k - 1), nr_c1_sq)]
    c0 = _ext_sqrt_host(F.sf, t)
    if c0 is None:
        raise ValueError("undefined sqrt")
    if _ext_is_odd(F.sf, c0) != parity:
        c0 = [(-v) % p for v in c0]
    return c0 + c1
