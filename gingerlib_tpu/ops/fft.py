"""Radix-2 evaluation domains over prime scalar fields.

Replaces the reference's EvaluationDomain (algebra/src/fft/domain.rs:20-416)
with a TPU-native design:

* reshape-based radix-2 FFT: ``log2(m)`` decimation steps (pure strided
  slicing — no bit-reverse scatter) followed by ``log2(m)`` combine stages,
  each ONE batched Montgomery multiply of m/2 elements plus add/sub.  This
  is the Stockham-flavoured replacement for serial_fft's butterfly loop
  (domain.rs:315-358); the per-stage full-array op is exactly what the VPU
  wants, and sharded along the element axis the combine becomes a psum-free
  local op with an all-to-all every few stages (see parallel/).
* twiddle tables are built on device in log(m) doubling steps (only log(m)
  host exponentiations), cached per (field, m),
* coset FFTs via distribute_powers (domain.rs:140-179); vanishing-poly
  division on a coset is a single constant multiply since Z(g·ω^j) = g^m - 1
  (domain.rs:222-256).

Elements: Montgomery digit arrays [..., m, n_digits]; the element axis is
axis -2.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import fp as fpmod
from ..fields.fp import FpParams
from ..ops import limbs


class Domain:
    """Radix-2 multiplicative subgroup domain of size m = 2^lg (<= 2-adicity).

    cf. EvaluationDomain::new (domain.rs:65-94).
    """

    def __init__(self, params: FpParams, size: int):
        m = 1
        lg = 0
        while m < size:
            m <<= 1
            lg += 1
        if lg > params.two_adicity:
            raise ValueError(
                f"domain size 2^{lg} exceeds two-adicity "
                f"{params.two_adicity} of {params.name}")
        self.params = params
        self.size = m
        self.lg = lg
        p = params.modulus
        # group generator: root_of_unity^(2^(two_adicity - lg))
        self.gen = pow(params.root_of_unity, 1 << (params.two_adicity - lg), p)
        self.gen_inv = pow(self.gen, -1, p) if m > 1 else 1
        self.size_inv = pow(m, -1, p)
        # coset shift = field multiplicative generator (domain.rs:154 uses
        # F::multiplicative_generator())
        self.coset_shift = params.generator
        self.coset_shift_inv = pow(self.coset_shift, -1, p)
        # Z(coset) = g^m - 1, constant across the coset
        self.z_coset = (pow(self.coset_shift, m, p) - 1) % p
        self.z_coset_inv = pow(self.z_coset, -1, p)

    # ------------------------------------------------------------------
    # twiddle construction (device, cached per domain)
    # ------------------------------------------------------------------

    @functools.cached_property
    def _twiddles(self):
        return _build_powers(self.params, self.gen, self.size // 2)

    @functools.cached_property
    def _inv_twiddles(self):
        return _build_powers(self.params, self.gen_inv, self.size // 2)

    # ------------------------------------------------------------------
    # transforms
    # ------------------------------------------------------------------

    def fft(self, coeffs):
        """coeffs [..., m, nd] (Montgomery) -> evaluations at ω^j."""
        tw = _powers_table(self.params, self.gen, self.size // 2,
                           lambda: self._twiddles)
        return _fft_large_core(self.size)(self.params, coeffs, tw)

    def ifft(self, evals):
        tw = _powers_table(self.params, self.gen_inv, self.size // 2,
                           lambda: self._inv_twiddles)
        out = _fft_large_core(self.size)(self.params, evals, tw)
        scale = fpmod.fp_from_int(self.params, self.size_inv)
        return fpmod.mont_mul(self.params, out, jnp.asarray(scale))

    def distribute_powers(self, x, base: int):
        """x_i *= base^i (domain.rs:140). base is a host int."""
        powers = _powers_table(self.params, base, self.size)
        return fpmod.mont_mul(self.params, x, powers)

    def coset_fft(self, coeffs):
        return self.fft(self.distribute_powers(coeffs, self.coset_shift))

    def coset_ifft(self, evals):
        return self.distribute_powers(self.ifft(evals),
                                      self.coset_shift_inv)

    def divide_by_vanishing_poly_on_coset(self, evals):
        """evals on coset / Z(x) — constant multiply (domain.rs:245-256)."""
        c = fpmod.fp_from_int(self.params, self.z_coset_inv)
        return fpmod.mont_mul(self.params, evals, jnp.asarray(c))

    def mul_in_evaluation_domain(self, a, b):
        """pointwise product (domain.rs:289)."""
        return fpmod.mont_mul(self.params, a, b)

    # ------------------------------------------------------------------
    # lagrange / vanishing evaluation at an arbitrary point
    # ------------------------------------------------------------------

    def evaluate_vanishing_polynomial(self, tau: int) -> int:
        return (pow(tau, self.size, self.params.modulus) - 1) \
            % self.params.modulus

    def evaluate_all_lagrange_coefficients(self, tau: int):
        """l_i(tau) for all i, as Montgomery digit array [m, nd].

        l_i(tau) = Z(tau) * ω^i / (m * (tau - ω^i))  (domain.rs:183-219).
        Fully batched: one Fermat inversion chain on device.
        """
        P = self.params
        p = P.modulus
        m = self.size
        z = self.evaluate_vanishing_polynomial(tau)
        if z == 0:
            # tau in the domain: l_i = 1 at the matching i else 0
            out = np.zeros((m, P.n_digits), np.uint32)
            w = 1
            for i in range(m):
                if w == tau % p:
                    out[i] = fpmod.fp_from_int(P, 1)
                w = w * self.gen % p
            return jnp.asarray(out)
        omega_pows = _powers_table(P, self.gen, m)
        tau_d = jnp.asarray(fpmod.fp_from_int(P, tau))
        denom = fpmod.sub_mod(P, jnp.broadcast_to(tau_d, omega_pows.shape),
                              omega_pows)
        denom_inv = fpmod.inv_mod(P, denom)
        zi = z * pow(m, -1, p) % p
        num = fpmod.mont_mul(
            P, omega_pows, jnp.asarray(fpmod.fp_from_int(P, zi)))
        return fpmod.mont_mul(P, num, denom_inv)


def _build_powers_device(params: FpParams, base: int, n: int):
    """[1, base, ..., base^(n-1)] built IN-GRAPH by log2(n) doubling muls.

    Used when tracing for the TPU: a closed-over host table becomes an
    HLO *constant*, and at 2^20 x 48 digits that is a ~200 MB program the
    remote-compile tunnel rejects (HTTP 413).  The in-graph build adds
    only ~n total mults (~10% of one FFT) and keeps the program small.
    """
    if n == 0:
        return jnp.zeros((0, params.n_digits), jnp.uint32)
    pw = jnp.asarray(fpmod.fp_from_ints(params, [1]))
    step = base % params.modulus
    while pw.shape[0] < n:
        hi = fpmod.mont_mul(
            params, pw, jnp.asarray(fpmod.fp_from_int(params, step)))
        pw = jnp.concatenate([pw, hi], axis=0)
        step = step * step % params.modulus
    return pw[:n]


def _powers_table(params: FpParams, base: int, n: int, host_thunk=None):
    """Dispatch: in-graph build on the TPU backend (tunnel program-size
    limit), cached host table elsewhere.  host_thunk: lazy provider of the
    cached host table (so the TPU path never materializes it)."""
    import jax as _jax
    if _jax.default_backend() == "tpu":
        return _build_powers_device(params, base, n)
    return jnp.asarray(host_thunk() if host_thunk is not None
                       else _build_powers(params, base, n))


def _build_powers(params: FpParams, base: int, n: int):
    """[1, base, base^2, ..., base^(n-1)] as Montgomery digits [n, nd].

    Host-side sequential modmul (≈1µs/element with bulk byte conversion) —
    domain setup cost, off the hot path, and avoids per-shape device
    compiles.
    """
    if n == 0:
        return np.zeros((0, params.n_digits), np.uint32)
    # host numpy (NOT jnp): cached tables must never capture a jit trace
    from .. import native
    hf = native.host_field(params.modulus)
    if hf is not None:
        return np.ascontiguousarray(hf.powers_mont_digits(
            base % params.modulus, n, params.n_digits))
    p = params.modulus
    out = []
    w = 1
    for _ in range(n):
        out.append(w)
        w = w * base % p
    return fpmod.fp_from_ints(params, out)


class MixedRadixDomain:
    """Mixed-radix domain of size m = 2^k · q^s (q a small prime with
    q^s | (p-1)).

    The reference snapshot only ships the radix-2 EvaluationDomain (README
    advertises mixed-domain FFT, SURVEY.md divergence #1); this extends the
    same reshape-style Cooley-Tukey to radix-q stages so MNT6-753 Fr
    (two-adicity 15, but 5² | p-1) supports domains beyond 2^15 constraints.
    Verified against the radix-2 domain on pow-2 sizes and against a naive
    DFT on mixed sizes.
    """

    def __init__(self, params: FpParams, size: int, q: int = 5,
                 q_adicity: int | None = None):
        p = params.modulus
        if q_adicity is None:
            q_adicity = 0
            t = p - 1
            while t % q == 0:
                t //= q
                q_adicity += 1
        best = None
        for s in range(q_adicity + 1):
            qs = q ** s
            rest = -(-size // qs)
            k = max(0, (rest - 1).bit_length())
            if k > params.two_adicity:
                continue
            m = (1 << k) * qs
            if m >= size and (best is None or m < best[0]):
                best = (m, k, s)
        if best is None:
            raise ValueError(
                f"no 2^k·{q}^s domain of size >= {size} in {params.name}")
        m, k, s = best
        self.params = params
        self.size = m
        self.factors = [2] * k + [q] * s  # decimation order
        self.gen = pow(params.generator, (p - 1) // m, p)
        self.gen_inv = pow(self.gen, -1, p) if m > 1 else 1
        self.size_inv = pow(m, -1, p)
        self.coset_shift = params.generator
        self.coset_shift_inv = pow(self.coset_shift, -1, p)
        self.z_coset = (pow(self.coset_shift, m, p) - 1) % p
        self.z_coset_inv = pow(self.z_coset, -1, p)

    @functools.cached_property
    def _powers(self):
        return _build_powers(self.params, self.gen, self.size)

    @functools.cached_property
    def _inv_powers(self):
        return _build_powers(self.params, self.gen_inv, self.size)

    def fft(self, coeffs):
        pw = _powers_table(self.params, self.gen, self.size,
                           lambda: self._powers)
        return _fft_mixed(self.params, coeffs, pw, self.factors)

    def ifft(self, evals):
        pw = _powers_table(self.params, self.gen_inv, self.size,
                           lambda: self._inv_powers)
        out = _fft_mixed(self.params, evals, pw, self.factors)
        scale = fpmod.fp_from_int(self.params, self.size_inv)
        return fpmod.mont_mul(self.params, out, jnp.asarray(scale))

    # the coset / vanishing / lagrange machinery is radix-independent
    distribute_powers = Domain.distribute_powers
    coset_fft = Domain.coset_fft
    coset_ifft = Domain.coset_ifft
    divide_by_vanishing_poly_on_coset = \
        Domain.divide_by_vanishing_poly_on_coset
    mul_in_evaluation_domain = Domain.mul_in_evaluation_domain
    evaluate_vanishing_polynomial = Domain.evaluate_vanishing_polynomial
    evaluate_all_lagrange_coefficients = \
        Domain.evaluate_all_lagrange_coefficients


def best_domain(params: FpParams, size: int, q: int = 5):
    """Radix-2 domain when it fits the field's two-adicity, else the
    mixed-radix extension."""
    lg = max(0, (size - 1).bit_length())
    if lg <= params.two_adicity:
        return Domain(params, size)
    return MixedRadixDomain(params, size, q=q)


def _fft_mixed(params: FpParams, x, powers, factors):
    """Mixed-radix DIT FFT.

    x: [..., m, nd]; powers: [m, nd] table of gen^j; factors: decimation
    radices (product = m).  Two phases mirroring _fft_core: decimation into
    parent-major subsequence groups, then per-factor combines (generalized
    butterflies: X[t + h·u] = Σ_i ω^{it} · w_r^{ui} · sub_i[t]).
    """
    m = x.shape[-2]
    if m == 1:
        return x
    batch = x.shape[:-2]
    nd = x.shape[-1]
    p = params.modulus

    # decimation
    y = x.reshape(*batch, 1, m, nd)
    for r in factors:
        g, n = y.shape[-3], y.shape[-2]
        y = y.reshape(*batch, g, n // r, r, nd)
        y = jnp.moveaxis(y, -2, -3)  # [g, r, n/r, nd], parent-major
        y = y.reshape(*batch, g * r, n // r, nd)

    # combine, reverse order
    for r in reversed(factors):
        g, h = y.shape[-3], y.shape[-2]
        y = y.reshape(*batch, g // r, r, h, nd)
        n = r * h
        stride = m // n
        if r == 2:
            E = y[..., 0, :, :]
            O = y[..., 1, :, :]
            w = powers[0:m // 2:stride]
            t = fpmod.mont_mul(params, O, w)
            y = jnp.concatenate([fpmod.add_mod(params, E, t),
                                 fpmod.sub_mod(params, E, t)], axis=-2)
        else:
            # T[i][t] = sub_i[t] · ω^{i·t·stride}
            it = (np.arange(r)[:, None] * np.arange(h)[None, :] *
                  stride) % m
            tw = jnp.take(powers, jnp.asarray(it), axis=0)  # [r, h, nd]
            T = fpmod.mont_mul(params, y, tw)
            # r-point DFT across i with w_r = gen^(m/r):
            # X[u][t] = Σ_i w_r^{(u·i) mod r} · T[i][t]
            wr = [powers[(u * (m // r)) % m] for u in range(r)]
            outs = []
            for u in range(r):
                acc = T[..., 0, :, :]
                for i in range(1, r):
                    c = (u * i) % r
                    term = T[..., i, :, :] if c == 0 else \
                        fpmod.mont_mul(params, T[..., i, :, :], wr[c])
                    acc = fpmod.add_mod(params, acc, term)
                outs.append(acc)
            y = jnp.concatenate(outs, axis=-2)
        y = y.reshape(*batch, g // r, n, nd)
    return y.reshape(*batch, m, nd)


def _fft_core_scan(params: FpParams, x, twiddles):
    """Radix-2 DIT FFT as ONE lax.scan over the lg(m) combine stages.

    Bit-identical to :func:`_fft_core` (same butterflies, same twiddle
    selection — pinned by tests/test_fft.py::test_fft_scan_matches_unrolled)
    but the program contains a single stage body with in-graph index math
    instead of 2·lg(m) unrolled full-size stages: at 2^20 the unrolled
    form OOM-kills the AOT compile helper (SIGKILL, round-5 measurement),
    while this form compiles like any other scan.  Dispatch:
    ``GINGERLIB_FFT_SCAN`` env gate in :meth:`Domain.fft`/``ifft``
    (auto: on for m >= 2^17 on the TPU backend).
    """
    m = x.shape[-2]
    if m == 1:
        return x
    lg = m.bit_length() - 1
    # bit-reversal permutation, built from iota (no host index tables —
    # a [m] int32 constant would be fine, but in-graph keeps the program
    # free of large constants for the remote-compile path)
    idx = jnp.arange(m, dtype=jnp.int32)
    rev = jnp.zeros_like(idx)
    for b in range(lg):
        rev = rev | (((idx >> b) & 1) << (lg - 1 - b))
    y = jnp.take(x, rev, axis=-2)

    k = jnp.arange(m // 2, dtype=jnp.int32)
    i_full = idx
    hs = jnp.asarray([1 << s for s in range(lg)], jnp.int32)

    def stage(y, h):
        # butterfly pairs (lo, lo + h) inside blocks of 2h
        blk = k // h
        j = k - blk * h
        lo = blk * (2 * h) + j
        E = jnp.take(y, lo, axis=-2)
        O = jnp.take(y, lo + h, axis=-2)
        stride = (m // 2) // h          # == m/(2h), exact for pow-2
        w = jnp.take(twiddles, j * stride, axis=0)
        t = fpmod.mont_mul(params, O, w)
        top = fpmod.add_mod(params, E, t)
        bot = fpmod.sub_mod(params, E, t)
        # re-interleave [top | bot] back to natural block layout
        b2 = i_full // (2 * h)
        o = i_full - b2 * (2 * h)
        sel = o < h
        src = b2 * h + jnp.where(sel, o, o - h)
        yn = jnp.where(sel[..., None],
                       jnp.take(top, src, axis=-2),
                       jnp.take(bot, src, axis=-2))
        return yn, None

    y, _ = jax.lax.scan(stage, y, hs)
    return y


def _fft_core_4step(params: FpParams, x, twiddles):
    """Radix-2 DIT FFT via the four-step (two-step Cooley-Tukey) split
    m = L·M: M-point row FFTs, an in-graph twiddle matrix multiply, then
    L-point row FFTs — both sub-FFTs through the compile-small unrolled
    core at ~sqrt(m).

    Identical field elements to :func:`_fft_core` (exact modular
    arithmetic is order-independent and Montgomery form is canonical;
    pinned by tests/test_fft.py::test_fft_4step_matches_unrolled).  This
    is the large-size TPU path: the fully unrolled core's MLIR OOM-kills
    the AOT compile helper at 2^20, and the scan core compiles but is
    gather-bound at runtime (~25 s per 2^20 roundtrip vs ~1 s here).

    twiddles: [m/2, nd] powers of ω — sub-FFT twiddles and the twiddle
    matrix are strided gathers/products of this one table.
    """
    m = x.shape[-2]
    lg = m.bit_length() - 1
    L = 1 << ((lg + 1) // 2)
    M = m // L
    batch = x.shape[:-2]
    nd = x.shape[-1]

    # A[n1, n2] = x[n1 + L*n2]
    A = jnp.swapaxes(x.reshape(*batch, M, L, nd), -3, -2)   # [.., L, M, nd]
    # row FFTs of length M over ω_M = ω^L: its twiddles are tw[::L]
    Y = _fft_core(params, A, twiddles[::L])
    # twiddle matrix T[n1, k2] = ω^(n1·k2) for n1<L, k2<M, built by
    # log2(M) doubling products off the main table:
    #   T[:, 2^j + k2] = T[:, k2] · ω^(n1·2^j),
    # every gather index n1·2^j <= (L-1)·M/2 = (m-M)/2 < m/2 stays
    # inside the table.
    one = jnp.asarray(fpmod.fp_from_int(params, 1))
    T = jnp.broadcast_to(one, (L, 1, nd))
    n1 = jnp.arange(L, dtype=jnp.int32)
    j = 1
    while j < M:
        s = jnp.take(twiddles, n1 * j, axis=0)          # [L, nd]
        T = jnp.concatenate(
            [T, fpmod.mont_mul(params, T, s[:, None, :])], axis=-2)
        j <<= 1
    Y = fpmod.mont_mul(params, Y, T)
    # column FFTs of length L over ω_L = ω^M: twiddles tw[::M]
    Z = _fft_core(params, jnp.swapaxes(Y, -3, -2), twiddles[::M])
    # X[M·k1 + k2] = Z[k2, k1]
    return jnp.swapaxes(Z, -3, -2).reshape(*batch, m, nd)


def _fft_large_core(m: int):
    """Pick the FFT core: the fully unrolled form below the large-size
    threshold, else the four-step split (compile-small AND fast); the
    scan form stays available via GINGERLIB_FFT_LARGE=scan (it is the
    most compile-lean of the three)."""
    import os
    v = os.environ.get("GINGERLIB_FFT_LARGE", "auto")
    if v == "scan":
        return _fft_core_scan
    if v == "4step":
        return _fft_core_4step
    if v == "unrolled":
        return _fft_core
    import jax as _jax
    if m >= (1 << 17) and _jax.default_backend() == "tpu":
        return _fft_core_4step
    return _fft_core


def _fft_core(params: FpParams, x, twiddles):
    """Radix-2 DIT FFT. x: [..., m, nd]; twiddles: [m/2, nd] powers of ω."""
    m = x.shape[-2]
    if m == 1:
        return x
    lg = m.bit_length() - 1
    batch = x.shape[:-2]
    nd = x.shape[-1]

    # decimation: after d steps shape [..., 2^d, m/2^d, nd]; the group axis
    # indexes subsequences by bit-reversed low bits of the original index.
    y = x.reshape(*batch, 1, m, nd)
    for _ in range(lg):
        g, h = y.shape[-3], y.shape[-2]
        even = y[..., 0::2, :]
        odd = y[..., 1::2, :]
        # parent-major ordering: [g0e, g0o, g1e, g1o, ...] so that the
        # combine stages pair adjacent groups per recursion-tree parent
        y = jnp.stack([even, odd], axis=-3) \
            .reshape(*batch, 2 * g, h // 2, nd)

    # combine: at stage with half-length h, twiddle_j = ω^(j * m/(2h))
    for s in range(lg):
        g, h = y.shape[-3], y.shape[-2]
        y = y.reshape(*batch, g // 2, 2, h, nd)
        E = y[..., 0, :, :]
        O = y[..., 1, :, :]
        stride = m // (2 * h)
        w = twiddles[0:m // 2:stride]  # [h, nd]
        t = fpmod.mont_mul(params, O, w)
        top = fpmod.add_mod(params, E, t)
        bot = fpmod.sub_mod(params, E, t)
        y = jnp.concatenate([top, bot], axis=-2) \
            .reshape(*batch, g // 2, 2 * h, nd)
    return y.reshape(*batch, m, nd)
