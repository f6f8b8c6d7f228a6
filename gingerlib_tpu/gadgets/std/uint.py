"""UInt8 / UInt32 gadgets (r1cs/gadgets/std/src/bits/{uint8,uint32}.rs).

A UInt is a list of Booleans in little-endian bit order plus the known
value.  xor is bitwise (1 constraint/bit on variables), rotr is free,
addmany packs the k-ary sum into 32+log2(k) allocated bits with ONE
packing constraint (uint32.rs:162).
"""

from __future__ import annotations

from ...relations.r1cs import ConstraintSystem, LinearCombination, ONE
from .boolean import Boolean


class UInt32:
    BITS = 32

    def __init__(self, bits, value):
        assert len(bits) == self.BITS
        self.bits = bits  # LSB first
        self.value = value

    @staticmethod
    def constant(v: int) -> "UInt32":
        v &= 0xFFFFFFFF
        return UInt32([Boolean.const((v >> i) & 1) for i in range(32)], v)

    @staticmethod
    def alloc(cs, value=None, name="u32") -> "UInt32":
        bits = [Boolean.alloc(cs, None if value is None else (value >> i) & 1,
                              f"{name}/b{i}") for i in range(32)]
        return UInt32(bits, None if value is None else value & 0xFFFFFFFF)

    @staticmethod
    def from_bits_le(bits, value=None) -> "UInt32":
        if value is None:
            vals = [b.get_value() for b in bits]
            if all(v is not None for v in vals):
                value = sum(v << i for i, v in enumerate(vals))
        return UInt32(list(bits), value)

    def xor(self, cs, other: "UInt32") -> "UInt32":
        bits = [a.xor(cs, b) for a, b in zip(self.bits, other.bits)]
        val = None if self.value is None or other.value is None \
            else self.value ^ other.value
        return UInt32(bits, val)

    def rotr(self, n: int) -> "UInt32":
        n %= 32
        bits = self.bits[n:] + self.bits[:n]
        val = None if self.value is None else \
            ((self.value >> n) | (self.value << (32 - n))) & 0xFFFFFFFF
        return UInt32(bits, val)

    def shr(self, n: int) -> "UInt32":
        bits = self.bits[n:] + [Boolean.const(False)] * n
        val = None if self.value is None else self.value >> n
        return UInt32(bits, val)

    @staticmethod
    def addmany(cs, terms, name="addmany") -> "UInt32":
        """Σ terms mod 2^32 (uint32.rs addmany)."""
        k = len(terms)
        assert k >= 2
        nbits = 32 + (k - 1).bit_length()
        val = None
        if all(t.value is not None for t in terms):
            val = sum(t.value for t in terms)
        out_bits = [Boolean.alloc(cs, None if val is None else (val >> i) & 1,
                                  f"{name}/r{i}") for i in range(nbits)]
        lhs = LinearCombination()
        for t in terms:
            for i, b in enumerate(t.bits):
                lhs = lhs + b.lc() * (1 << i)
        rhs = LinearCombination()
        for i, b in enumerate(out_bits):
            rhs = rhs + b.lc() * (1 << i)
        cs.enforce(lhs - rhs, LinearCombination.of(ONE),
                   LinearCombination(), name)
        return UInt32(out_bits[:32],
                      None if val is None else val & 0xFFFFFFFF)

    def to_bytes_le(self):
        """4 UInt8s."""
        return [UInt8(self.bits[8 * i:8 * i + 8],
                      None if self.value is None
                      else (self.value >> (8 * i)) & 0xFF)
                for i in range(4)]


class UInt8:
    BITS = 8

    def __init__(self, bits, value):
        assert len(bits) == 8
        self.bits = bits  # LSB first
        self.value = value

    @staticmethod
    def constant(v: int) -> "UInt8":
        v &= 0xFF
        return UInt8([Boolean.const((v >> i) & 1) for i in range(8)], v)

    @staticmethod
    def alloc(cs, value=None, name="u8") -> "UInt8":
        bits = [Boolean.alloc(cs, None if value is None else (value >> i) & 1,
                              f"{name}/b{i}") for i in range(8)]
        return UInt8(bits, None if value is None else value & 0xFF)

    def xor(self, cs, other: "UInt8") -> "UInt8":
        bits = [a.xor(cs, b) for a, b in zip(self.bits, other.bits)]
        val = None if self.value is None or other.value is None \
            else self.value ^ other.value
        return UInt8(bits, val)

    def into_bits_le(self):
        return list(self.bits)

    @staticmethod
    def alloc_bytes(cs, data: bytes | None, n: int, name="bytes"):
        return [UInt8.alloc(cs, None if data is None else data[i],
                            f"{name}/{i}") for i in range(n)]
