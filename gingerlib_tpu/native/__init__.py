"""ctypes bindings for the native host runtime (native/gl_host.cpp).

The device compute path is Pallas/XLA; this is the C++ host layer that
replaces the reference's Rust limb core for *host-side* work: power tables,
Lagrange coefficients at the toxic point, batch inversion, witness-row
evaluation.  Auto-builds with g++ on first import; every entry point has a
pure-python fallback so the library works without a toolchain.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "gl_host.cpp")
_SO = os.path.join(_REPO, "native", "build", "libgl_host.so")


def _build() -> str | None:
    if os.path.exists(_SO) and \
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


@functools.lru_cache()
def _lib():
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.gl_field_size.restype = ctypes.c_int
    lib.gl_field_init.argtypes = [ctypes.c_void_p, ctypes.c_int, u64p,
                                  u64p, u64p, ctypes.c_uint64]
    for name in ("gl_mont_mul_batch", "gl_add_mod_batch",
                 "gl_sub_mod_batch"):
        getattr(lib, name).argtypes = [ctypes.c_void_p, u64p, u64p, u64p,
                                       ctypes.c_long]
    for name in ("gl_to_mont_batch", "gl_from_mont_batch"):
        getattr(lib, name).argtypes = [ctypes.c_void_p, u64p, u64p,
                                       ctypes.c_long]
    lib.gl_powers.argtypes = [ctypes.c_void_p, u64p, u64p, ctypes.c_long]
    lib.gl_powers_scaled.argtypes = [ctypes.c_void_p, u64p, u64p, u64p,
                                     ctypes.c_long]
    lib.gl_batch_inverse.argtypes = [ctypes.c_void_p, u64p, u64p,
                                     ctypes.c_long, u64p, ctypes.c_int]
    lib.gl_lagrange_at.argtypes = [ctypes.c_void_p, u64p, u64p, u64p,
                                   ctypes.c_long, u64p, ctypes.c_int, u64p]
    lib.gl_lagrange_at.restype = ctypes.c_int
    lib.gl_eval_rows.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_long),
                                 ctypes.POINTER(ctypes.c_int),
                                 u64p, u64p, u64p, ctypes.c_long]
    return lib


def available() -> bool:
    return _lib() is not None


def _u64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _ints_to_limbs(xs, n: int) -> np.ndarray:
    nbytes = 8 * n
    buf = b"".join(int(x).to_bytes(nbytes, "little") for x in xs)
    return np.frombuffer(buf, dtype="<u8").reshape(len(xs), n).copy()


def _limbs_to_ints(a: np.ndarray) -> list:
    a = np.ascontiguousarray(a, dtype="<u8")
    nbytes = 8 * a.shape[-1]
    raw = a.tobytes()
    return [int.from_bytes(raw[i * nbytes:(i + 1) * nbytes], "little")
            for i in range(a.shape[0])]


class HostField:
    """Native Montgomery field over u64 limbs; None-safe (use
    `native.host_field(p)` which returns None without a toolchain)."""

    def __init__(self, p: int):
        lib = _lib()
        assert lib is not None
        self.lib = lib
        self.p = p
        self.n = -(-p.bit_length() // 64)
        n = self.n
        R = 1 << (64 * n)
        self.ctx = ctypes.create_string_buffer(lib.gl_field_size())
        mod = _ints_to_limbs([p], n)
        r2 = _ints_to_limbs([R * R % p], n)
        one = _ints_to_limbs([R % p], n)
        inv = (-pow(p, -1, 1 << 64)) % (1 << 64)
        lib.gl_field_init(self.ctx, n, _u64p(mod), _u64p(r2), _u64p(one),
                          ctypes.c_uint64(inv))
        e = p - 2
        self.exp = _ints_to_limbs([e], n)
        self.ebits = e.bit_length()

    # ---- int-list conveniences (host oracles) ----

    def powers(self, base: int, count: int) -> list:
        out = np.empty((max(count, 1), self.n), dtype="<u8")
        b = _ints_to_limbs([base % self.p], self.n)
        self.lib.gl_powers(self.ctx, _u64p(b), _u64p(out), count)
        return _limbs_to_ints(out[:count])

    def powers_mont_digits(self, base: int, count: int,
                           n_digits: int) -> np.ndarray:
        """Powers table in the device digit representation's Montgomery
        form (base-2^16 digits, R = 2^(16·n_digits)) as uint32 arrays."""
        out = np.empty((max(count, 1), self.n), dtype="<u8")
        b = _ints_to_limbs([base % self.p], self.n)
        scale = _ints_to_limbs([(1 << (16 * n_digits)) % self.p], self.n)
        self.lib.gl_powers_scaled(self.ctx, _u64p(b), _u64p(scale),
                                  _u64p(out), count)
        u16 = out[:count].view("<u2").reshape(count, self.n * 4)
        return u16[:, :n_digits].astype(np.uint32)

    def lagrange_at(self, gen: int, tau: int, m: int):
        """u_i = Z(tau)/m · gen^i/(tau − gen^i); returns (list, zt) or
        raises if tau is in the domain."""
        out = np.empty((m, self.n), dtype="<u8")
        g = _ints_to_limbs([gen % self.p], self.n)
        t = _ints_to_limbs([tau % self.p], self.n)
        mi = _ints_to_limbs([pow(m, -1, self.p)], self.n)
        rc = self.lib.gl_lagrange_at(self.ctx, _u64p(g), _u64p(t),
                                     _u64p(mi), m, _u64p(self.exp),
                                     self.ebits, _u64p(out))
        if rc != 0:
            raise ValueError("tau lies in the evaluation domain")
        zt = (pow(tau, m, self.p) - 1) % self.p
        return _limbs_to_ints(out), zt

    def mulmod_batch(self, a: list, b: list) -> list:
        n = self.n
        am = np.empty((len(a), n), dtype="<u8")
        bm = np.empty((len(b), n), dtype="<u8")
        self.lib.gl_to_mont_batch(self.ctx, _u64p(_ints_to_limbs(a, n)),
                                  _u64p(am), len(a))
        self.lib.gl_to_mont_batch(self.ctx, _u64p(_ints_to_limbs(b, n)),
                                  _u64p(bm), len(b))
        out = np.empty_like(am)
        self.lib.gl_mont_mul_batch(self.ctx, _u64p(am), _u64p(bm),
                                   _u64p(out), len(a))
        std = np.empty_like(out)
        self.lib.gl_from_mont_batch(self.ctx, _u64p(out), _u64p(std),
                                    len(a))
        return _limbs_to_ints(std)

    def batch_inverse(self, xs: list) -> list:
        n = self.n
        xm = np.empty((len(xs), n), dtype="<u8")
        self.lib.gl_to_mont_batch(self.ctx, _u64p(_ints_to_limbs(xs, n)),
                                  _u64p(xm), len(xs))
        out = np.empty_like(xm)
        self.lib.gl_batch_inverse(self.ctx, _u64p(xm), _u64p(out), len(xs),
                                  _u64p(self.exp), self.ebits)
        std = np.empty_like(out)
        self.lib.gl_from_mont_batch(self.ctx, _u64p(out), _u64p(std),
                                    len(xs))
        return _limbs_to_ints(std)


@functools.lru_cache(maxsize=32)
def host_field(p: int) -> HostField | None:
    if _lib() is None:
        return None
    return HostField(p)
