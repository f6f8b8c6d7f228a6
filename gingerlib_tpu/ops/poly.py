"""Dense / sparse polynomials over prime fields
(algebra/src/fft/polynomial/{dense,sparse,mod}.rs).

Two layers:
* host: python-int coefficient lists (exact; construction/degree logic),
* device: batched evaluation and FFT-based multiplication via ops/fft.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields import fp as fpmod
from ..fields.fp import FpParams
from .fft import Domain


class DensePolynomial:
    """coeffs[i] is the x^i coefficient (python ints, trimmed)."""

    def __init__(self, field: FpParams, coeffs):
        self.field = field
        c = [x % field.modulus for x in coeffs]
        while c and c[-1] == 0:
            c.pop()
        self.coeffs = c

    @property
    def degree(self) -> int:
        return len(self.coeffs) - 1 if self.coeffs else -1

    def is_zero(self) -> bool:
        return not self.coeffs

    def __add__(self, other):
        p = self.field.modulus
        n = max(len(self.coeffs), len(other.coeffs))
        a = self.coeffs + [0] * (n - len(self.coeffs))
        b = other.coeffs + [0] * (n - len(other.coeffs))
        return DensePolynomial(self.field,
                               [(x + y) % p for x, y in zip(a, b)])

    def __sub__(self, other):
        p = self.field.modulus
        n = max(len(self.coeffs), len(other.coeffs))
        a = self.coeffs + [0] * (n - len(self.coeffs))
        b = other.coeffs + [0] * (n - len(other.coeffs))
        return DensePolynomial(self.field,
                               [(x - y) % p for x, y in zip(a, b)])

    def __mul__(self, other):
        """naive for tiny, FFT in an evaluation domain otherwise
        (dense.rs mul; fft/test.rs:72 equivalence)."""
        if self.is_zero() or other.is_zero():
            return DensePolynomial(self.field, [])
        p = self.field.modulus
        dn = self.degree + other.degree + 1
        if dn <= 64:
            out = [0] * dn
            for i, a in enumerate(self.coeffs):
                if a:
                    for j, b in enumerate(other.coeffs):
                        out[i + j] = (out[i + j] + a * b) % p
            return DensePolynomial(self.field, out)
        dom = Domain(self.field, dn)
        m = dom.size
        ad = jnp.asarray(fpmod.fp_from_ints(
            self.field, self.coeffs + [0] * (m - len(self.coeffs))))
        bd = jnp.asarray(fpmod.fp_from_ints(
            self.field, other.coeffs + [0] * (m - len(other.coeffs))))
        prod = dom.ifft(dom.mul_in_evaluation_domain(dom.fft(ad),
                                                     dom.fft(bd)))
        import numpy as np
        return DensePolynomial(self.field,
                               fpmod.fp_to_ints(self.field, np.asarray(prod)))

    def evaluate(self, x: int) -> int:
        p = self.field.modulus
        acc = 0
        for c in reversed(self.coeffs):
            acc = (acc * x + c) % p
        return acc

    def divide_by_vanishing_poly(self, domain_size: int):
        """(quotient, remainder) by x^m − 1 (dense.rs divide)."""
        p = self.field.modulus
        m = domain_size
        rem = list(self.coeffs)
        quo = [0] * max(0, len(rem) - m)
        for i in range(len(rem) - 1, m - 1, -1):
            q = rem[i]
            quo[i - m] = q
            rem[i - m] = (rem[i - m] + q) % p
            rem[i] = 0
        return (DensePolynomial(self.field, quo),
                DensePolynomial(self.field, rem[:m]))


class SparsePolynomial:
    """list of (degree, coeff) pairs (sparse.rs)."""

    def __init__(self, field: FpParams, terms):
        self.field = field
        self.terms = sorted((d, c % field.modulus) for d, c in terms
                            if c % field.modulus)

    def evaluate(self, x: int) -> int:
        p = self.field.modulus
        return sum(c * pow(x, d, p) for d, c in self.terms) % p

    def to_dense(self) -> DensePolynomial:
        n = (max(d for d, _ in self.terms) + 1) if self.terms else 0
        out = [0] * n
        for d, c in self.terms:
            out[d] = c
        return DensePolynomial(self.field, out)


class Evaluations:
    """evaluations over a domain + interpolate (fft/evaluations.rs)."""

    def __init__(self, field: FpParams, evals, domain: Domain):
        self.field = field
        self.evals = [e % field.modulus for e in evals]
        self.domain = domain

    def interpolate(self) -> DensePolynomial:
        import numpy as np
        ev = jnp.asarray(fpmod.fp_from_ints(self.field, self.evals))
        coeffs = self.domain.ifft(ev)
        return DensePolynomial(
            self.field, fpmod.fp_to_ints(self.field, np.asarray(coeffs)))
