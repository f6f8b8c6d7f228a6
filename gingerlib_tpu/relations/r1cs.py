"""R1CS constraint system: host-side builder + device compilation.

Replaces r1cs/core (constraint_system.rs, impl_lc.rs) with a two-phase
design suited to JAX:

* **trace time** (host): circuits are plain Python that allocates variables
  and enforces a·b = c over ``LinearCombination``s with python-int
  coefficients/values — exact arithmetic, no device work.  Variable
  convention matches the reference: index 0 is the constant ONE input
  (constraint_system.rs:14-16), inputs before aux (r1cs_to_qap.rs:36-38) —
  this ordering is load-bearing for QAP compatibility.
* **compile time**: the constraint matrices become COO device arrays
  (rows, cols, Montgomery coefficient digits); witness evaluation is then
  gather → mont_mul → segment-sum with lazy modular reduction — the batched
  replacement for the reference's per-constraint eval loops
  (r1cs_to_qap.rs:77-115).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import fp as fpmod
from ..fields.fp import FpParams
from ..ops import limbs


class SynthesisError(Exception):
    pass


ONE = 0  # variable index of the constant one input


class LinearCombination:
    """Sparse Σ coeff_i · var_i with python-int coefficients."""

    __slots__ = ("terms",)

    def __init__(self, terms=None):
        self.terms = dict(terms or {})  # var -> coeff (int)

    @staticmethod
    def of(var: int, coeff: int = 1) -> "LinearCombination":
        return LinearCombination({var: coeff})

    def __add__(self, other):
        t = dict(self.terms)
        for v, c in other.terms.items():
            t[v] = t.get(v, 0) + c
        return LinearCombination(t)

    def __sub__(self, other):
        t = dict(self.terms)
        for v, c in other.terms.items():
            t[v] = t.get(v, 0) - c
        return LinearCombination(t)

    def __mul__(self, k: int):
        return LinearCombination({v: c * k for v, c in self.terms.items()})

    __rmul__ = __mul__

    def __neg__(self):
        return self * -1


def lc(*terms) -> LinearCombination:
    """lc((var, coeff), ...) or lc(var) for coeff 1."""
    out = LinearCombination()
    for t in terms:
        if isinstance(t, tuple):
            v, c = t
        else:
            v, c = t, 1
        out.terms[v] = out.terms.get(v, 0) + c
    return out


class ConstraintSystem:
    """Records constraints and (optionally) the witness assignment.

    Plays both reference roles: KeypairAssembly (generator.rs:36) when no
    values are supplied and ProvingAssignment (prover.rs:25) when they are.
    """

    def __init__(self, field: FpParams):
        self.field = field
        self.num_inputs = 0
        self.num_aux = 0
        self.at: list[list[tuple[int, int]]] = []  # per-constraint (var, coeff)
        self.bt: list[list[tuple[int, int]]] = []
        self.ct: list[list[tuple[int, int]]] = []
        self.input_values: list[int] = []
        self.aux_values: list[int] = []
        self.names: list[str] = []
        self.alloc_input("ONE", 1)

    # -- allocation (inputs first, then aux; ids are global) --
    def alloc_input(self, name: str = "", value: int | None = None) -> int:
        if self.num_aux:
            raise SynthesisError("allocate all inputs before aux variables")
        idx = self.num_inputs
        self.num_inputs += 1
        self.input_values.append(
            None if value is None else value % self.field.modulus)
        return idx

    def alloc(self, name: str = "", value: int | None = None) -> int:
        idx = self.num_inputs + self.num_aux
        self.num_aux += 1
        self.aux_values.append(
            None if value is None else value % self.field.modulus)
        return idx

    @property
    def num_constraints(self) -> int:
        return len(self.at)

    @property
    def num_variables(self) -> int:
        return self.num_inputs + self.num_aux

    def enforce(self, a: LinearCombination, b: LinearCombination,
                c: LinearCombination, name: str = ""):
        p = self.field.modulus
        self.at.append([(v, k % p) for v, k in a.terms.items() if k % p])
        self.bt.append([(v, k % p) for v, k in b.terms.items() if k % p])
        self.ct.append([(v, k % p) for v, k in c.terms.items() if k % p])
        self.names.append(name)

    # -- host-side evaluation (exact oracle; TestConstraintSystem role) --
    def assignment(self) -> list[int]:
        vals = list(self.input_values) + list(self.aux_values)
        if any(v is None for v in vals):
            raise SynthesisError("missing assignment values")
        return vals

    def eval_lc(self, terms, vals) -> int:
        p = self.field.modulus
        return sum(vals[v] * c for v, c in terms) % p

    def is_satisfied(self) -> bool:
        return self.which_is_unsatisfied() is None

    def which_is_unsatisfied(self) -> str | None:
        """First failing constraint name (test_constraint_system.rs:72).

        Uses the native C++ host runtime (gl_eval_rows) when available —
        ~100x faster on recursion-scale circuits; python fallback below."""
        idx = self._first_unsatisfied_native()
        if idx is not ...:
            if idx is None:
                return None
            return self.names[idx] or f"constraint {idx}"
        vals = self.assignment()
        p = self.field.modulus
        for i in range(self.num_constraints):
            a = self.eval_lc(self.at[i], vals)
            b = self.eval_lc(self.bt[i], vals)
            c = self.eval_lc(self.ct[i], vals)
            if (a * b - c) % p != 0:
                return self.names[i] or f"constraint {i}"
        return None

    def _first_unsatisfied_native(self):
        """Index of the first failing constraint, None if satisfied, or
        Ellipsis when the native library is unavailable."""
        from .. import native
        hf = native.host_field(self.field.modulus)
        if hf is None:
            return ...
        import ctypes
        lib, ctx, n = hf.lib, hf.ctx, hf.n
        vals_m = np.empty((self.num_variables, n), dtype="<u8")
        lib.gl_to_mont_batch(
            ctx, native._u64p(native._ints_to_limbs(self.assignment(), n)),
            native._u64p(vals_m), self.num_variables)
        nc = self.num_constraints
        evs = []
        for mat in (self.at, self.bt, self.ct):
            indptr = np.zeros(nc + 1, dtype=np.int64)
            cols, coeffs = [], []
            for i, terms in enumerate(mat):
                indptr[i + 1] = indptr[i] + len(terms)
                for v, k in terms:
                    cols.append(v)
                    coeffs.append(k)
            cols_a = np.asarray(cols or [0], dtype=np.int32)
            cf_m = np.empty((max(len(coeffs), 1), n), dtype="<u8")
            lib.gl_to_mont_batch(
                ctx, native._u64p(native._ints_to_limbs(coeffs or [0], n)),
                native._u64p(cf_m), max(len(coeffs), 1))
            out = np.empty((nc, n), dtype="<u8")
            lib.gl_eval_rows(
                ctx, indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
                cols_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                native._u64p(cf_m), native._u64p(vals_m),
                native._u64p(out), nc)
            evs.append(out)
        prod = np.empty_like(evs[0])
        lib.gl_mont_mul_batch(ctx, native._u64p(evs[0]),
                              native._u64p(evs[1]), native._u64p(prod), nc)
        bad = (prod != evs[2]).any(axis=1)
        idxs = np.nonzero(bad)[0]
        return None if idxs.size == 0 else int(idxs[0])


# ---------------------------------------------------------------------------
# device compilation
# ---------------------------------------------------------------------------

@dataclass
class CooMatrix:
    rows: np.ndarray     # [nnz] int32
    cols: np.ndarray     # [nnz] int32 (variable index)
    coeffs: np.ndarray   # [nnz, nd] uint32 Montgomery digits
    num_rows: int
    max_row_nnz: int


@dataclass
class CompiledR1CS:
    field: FpParams
    num_inputs: int
    num_aux: int
    num_constraints: int
    domain_size: int
    a: CooMatrix
    b: CooMatrix
    c: CooMatrix


def _compile_matrix(params: FpParams, mat, num_rows: int) -> CooMatrix:
    rows, cols, coeffs = [], [], []
    max_nnz = 0
    for i, terms in enumerate(mat):
        max_nnz = max(max_nnz, len(terms))
        for v, k in terms:
            rows.append(i)
            cols.append(v)
            coeffs.append(k)
    if max_nnz >= (1 << 15):
        raise SynthesisError("row too dense for lazy segment-sum reduction")
    if not rows:
        rows, cols, coeffs = [0], [0], [0]
    return CooMatrix(
        rows=np.asarray(rows, np.int32),
        cols=np.asarray(cols, np.int32),
        coeffs=fpmod.fp_from_ints(params, coeffs),
        num_rows=num_rows,
        max_row_nnz=max_nnz,
    )


def compile_r1cs(cs: ConstraintSystem, domain_size: int | None = None
                 ) -> CompiledR1CS:
    """domain_size defaults to next pow2 >= constraints + inputs
    (generator.rs:179)."""
    from ..ops.fft import Domain
    raw = cs.num_constraints + cs.num_inputs
    if domain_size is None:
        domain_size = Domain(cs.field, raw).size
    return CompiledR1CS(
        field=cs.field,
        num_inputs=cs.num_inputs,
        num_aux=cs.num_aux,
        num_constraints=cs.num_constraints,
        domain_size=domain_size,
        a=_compile_matrix(cs.field, cs.at, domain_size),
        b=_compile_matrix(cs.field, cs.bt, domain_size),
        c=_compile_matrix(cs.field, cs.ct, domain_size),
    )


def eval_matrix(params: FpParams, coo: CooMatrix, z):
    """Batched A_i(z) for all constraints: [num_rows, nd] (Montgomery).

    z: full assignment [num_vars, nd] Montgomery.  gather -> mont_mul ->
    segment_sum (lazy u32 digit sums, < 2^31 by the max_row_nnz bound) ->
    one Montgomery-style reduction per row.
    """
    vals = jnp.take(z, jnp.asarray(coo.cols), axis=0)          # [nnz, nd]
    prods = fpmod.mont_mul(params, vals, jnp.asarray(coo.coeffs))
    sums = jax.ops.segment_sum(prods, jnp.asarray(coo.rows),
                               num_segments=coo.num_rows)      # lazy digits
    return fpmod.lazy_reduce(params, sums)
