"""Pedersen CRH / commitment / injective-map gadgets over TE curves.

Mirrors r1cs/gadgets/crypto/src/crh/pedersen/mod.rs (FixedLengthCRHGadget),
commitment/pedersen.rs and crh/injective_map/mod.rs: the hash is
Σ_w Σ_i bit_{w,i}·(2^i·g_w) computed with the fixed-base 2-bit-lookup scalar
mul of the TE group gadget (constant doubling chains live host-side), the
commitment adds [randomness]·G with the same machinery, and the injective
map outputs the x-coordinate (TECompressor).
"""

from __future__ import annotations

from ..std.boolean import Boolean
from ..std.te_groups import TEGroupGadget, TEPointG


def bytes_to_bit_gadgets(cs, data: bytes, name="msg"):
    """Allocate input bytes as Boolean wires, LSB-first per byte (matching
    primitives _bytes_to_bits / primitives/src/lib.rs:97-106)."""
    bits = []
    for bi, byte in enumerate(data):
        for i in range(8):
            bits.append(Boolean.alloc(cs, bool((byte >> i) & 1),
                                      f"{name}/b{bi}_{i}"))
    return bits


class PedersenCRHGadget:
    def __init__(self, group_gadget: TEGroupGadget, window,
                 generators_host):
        """generators_host: per-window affine host int pairs — from
        PedersenCRH.setup (primitives/pedersen.py)."""
        self.gg = group_gadget
        self.w = window
        self.gens = generators_host

    def check_evaluation(self, cs, input_bits, name="pedersen") -> TEPointG:
        total = self.w.window_size * self.w.num_windows
        assert len(input_bits) <= total, "input too long for window params"
        bits = list(input_bits) + \
            [Boolean.const(False)] * (total - len(input_bits))
        result = self.gg.zero(cs)
        ws = self.w.window_size
        for w in range(self.w.num_windows):
            result = self.gg.mul_bits_fixed_base(
                cs, self.gens[w], bits[w * ws:(w + 1) * ws],
                f"{name}/w{w}", acc=result)
        return result


class PedersenCommitmentGadget:
    def __init__(self, group_gadget: TEGroupGadget, window,
                 generators_host, rand_base_host):
        self.crh = PedersenCRHGadget(group_gadget, window, generators_host)
        self.gg = group_gadget
        self.rand_base = rand_base_host

    def check_commitment(self, cs, input_bits, randomness_bits,
                         name="pedcomm") -> TEPointG:
        """commit = CRH(input) + [randomness]·G_r; randomness_bits LSB-first
        Boolean wires (commitment/pedersen.rs)."""
        base = self.crh.check_evaluation(cs, input_bits, f"{name}/crh")
        return self.gg.mul_bits_fixed_base(
            cs, self.rand_base, randomness_bits, f"{name}/rand", acc=base)


class PedersenCRHCompressorGadget:
    """Pedersen CRH then injective TE->x map (crh/injective_map gadget)."""

    def __init__(self, group_gadget: TEGroupGadget, window, generators_host):
        self.crh = PedersenCRHGadget(group_gadget, window, generators_host)

    def check_evaluation(self, cs, input_bits, name="pedcomp"):
        pt = self.crh.check_evaluation(cs, input_bits, name)
        return pt.x
