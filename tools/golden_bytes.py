#!/usr/bin/env python3
"""Derive, by hand, the exact byte strings the REFERENCE would write for a
tiny fixed Groth16 Proof and VerifyingKey over MNT6-298 — without going
through gingerlib_tpu's serializer.  The pinned constants land in
tests/test_serialize.py::test_golden_rust_byte_vectors.

Write-order derivation (all from the reference sources, no code reused):
* Fp element      -> into_repr() (canonical integer, NOT the Montgomery
                     form) as 8*ceil(bits/64) little-endian bytes
                     (fields/models/fp_320.rs ToBytes writes
                     self.into_repr(); biginteger/macros.rs:203 writes the
                     u64 limbs; bytes.rs:72-77 each limb little-endian).
                     MNT6-298: 298 bits -> 5 u64 limbs -> 40 bytes.
* Fq3 element     -> c0 ‖ c1 ‖ c2 (each 40 bytes).
* G1/G2 affine    -> x ‖ y ‖ infinity-u8 (0|1)
                     (short_weierstrass_projective.rs:185-192).
* Proof           -> a ‖ b ‖ c (groth16/mod.rs:35-41).
* VerifyingKey    -> alpha_g1_beta_g2 (Fq6 = 6 Fp comps) ‖ gamma_g2 ‖
                     delta_g2 ‖ u32 BIG-endian count ‖ gamma_abc points
                     (groth16/mod.rs:104-115; byteorder::BigEndian).

Fixed inputs (public curve constants only):
  A = [2]G1 (affine doubling, lambda = (3x²+a)/(2y) mod p — independent
      int math, no gingerlib code), B = G2, C = G1,
  alpha_g1_beta_g2 = GT one = (1,0,0,0,0,0),
  gamma_g2 = G2, delta_g2 = -G2 (y -> p-y), gamma_abc = [G1, [2]G1].
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from gingerlib_tpu.params._gen import curves_gen as CG
from gingerlib_tpu.params._gen import fields_gen as FG

C = CG.MNT6298


def main():
    p = FG.MNT6298_FQ["modulus"]
    w = 8 * (-(-p.bit_length() // 64))          # 40 bytes
    a = C["a"]
    g1x, g1y = C["g1_x"], C["g1_y"]

    # [2]G1 by the affine doubling formula (independent of gingerlib)
    lam = (3 * g1x * g1x + a) * pow(2 * g1y, -1, p) % p
    x2 = (lam * lam - 2 * g1x) % p
    y2 = (lam * (g1x - x2) - g1y) % p

    def fp(v):
        return (v % p).to_bytes(w, "little")

    def g1(x, y, inf=0):
        return fp(x) + fp(y) + bytes([inf])

    def g2(xs, ys, inf=0):
        return b"".join(fp(v) for v in xs) + \
            b"".join(fp(v) for v in ys) + bytes([inf])

    g2x, g2y = C["g2_x"], C["g2_y"]
    proof = g1(x2, y2) + g2(g2x, g2y) + g1(g1x, g1y)

    gt_one = fp(1) + b"".join(fp(0) for _ in range(5))
    neg_g2y = [(p - v) % p for v in g2y]
    vk = (gt_one + g2(g2x, g2y) + g2(g2x, neg_g2y) +
          (2).to_bytes(4, "big") + g1(g1x, g1y) + g1(x2, y2))

    print("A = [2]G1 =", (x2, y2))
    print("PROOF_HEX =", repr(proof.hex()))
    print("VK_HEX =", repr(vk.hex()))


if __name__ == "__main__":
    main()
