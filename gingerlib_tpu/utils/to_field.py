"""ToConstraintField — mapping curve points, extension elements, and byte
strings to base-field element vectors (algebra/src/to_field_vec.rs:17-100).

This is the glue that feeds curve coordinates into Poseidon and circuits:
* an Fp element maps to [itself],
* an extension element maps to its base-field components in tower order
  (Fp2 impl to_field_vec.rs:43-52),
* an SW/TE affine point maps to x-components ‖ y-components (:54+),
* bytes pack little-endian into CAPACITY-bit chunks (one bit below the
  modulus bit length), matching ToConstraintField<ConstraintF> for [u8].

Host-side (python ints) — these run at circuit-construction / transcript
time, not in kernels.
"""

from __future__ import annotations

from ..fields.fp import FpParams


def fp_to_field_elements(v: int) -> list:
    return [v]


def ext_to_field_elements(comps) -> list:
    """flat component list (already base-field ints) -> copy."""
    return list(comps)


def affine_to_field_elements(x_comps, y_comps) -> list:
    """SW/TE affine point -> x ‖ y component vector (to_field_vec.rs:54+)."""
    xs = x_comps if isinstance(x_comps, (list, tuple)) else [x_comps]
    ys = y_comps if isinstance(y_comps, (list, tuple)) else [y_comps]
    return list(xs) + list(ys)


def bytes_to_field_elements(params: FpParams, data: bytes) -> list:
    """Pack bytes into field elements of CAPACITY = modulus_bits − 1 bits
    (ToConstraintField<F> for [u8], to_field_vec.rs byte impl)."""
    capacity = params.modulus_bits - 1
    bits = []
    for byte in data:
        for i in range(8):
            bits.append((byte >> i) & 1)
    out = []
    for start in range(0, len(bits), capacity):
        chunk = bits[start:start + capacity]
        v = 0
        for i, b in enumerate(chunk):
            v |= b << i
        out.append(v)
    return out


def bits_to_field_elements(params: FpParams, bits) -> list:
    """Pack little-endian bits into CAPACITY-bit field elements."""
    capacity = params.modulus_bits - 1
    out = []
    bits = [int(b) for b in bits]
    for start in range(0, len(bits), capacity):
        chunk = bits[start:start + capacity]
        v = 0
        for i, b in enumerate(chunk):
            v |= b << i
        out.append(v)
    return out
