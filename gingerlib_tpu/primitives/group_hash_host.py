"""Host Bowe-Hopwood group hash — shared parameter source for the device
primitive, the host oracle, and the in-circuit gadget (so all three hash to
the same curve points)."""

from __future__ import annotations

from ..gadgets.std.ext_fields import FpGOps
from ..proofs.groth16_host import ec_mul, ec_add_general, _ec_double, _FqWrap

CHUNK_SIZE = 3


class BoweHopwoodHost:
    """window_size counts 3-bit chunks per segment (bowe_hopwood/mod.rs)."""

    def __init__(self, modulus: int, a_coeff: int, gen_xy, fr_modulus: int,
                 window_size: int, num_windows: int):
        self.F = FpGOps(_FqWrap(modulus))
        self.a = [a_coeff % modulus]
        self.gen = ([gen_xy[0]], [gen_xy[1]])
        self.fr_modulus = fr_modulus
        self.window_size = window_size
        self.num_windows = num_windows
        self.generators = None  # [num_windows][window_size] host points

    def setup(self, rng):
        gens = []
        for _ in range(self.num_windows):
            k = rng.randrange(1, self.fr_modulus)
            base = ec_mul(self.F, self.a, self.gen, k)
            row = []
            cur = base
            for _ in range(self.window_size):
                row.append(cur)
                for _ in range(4):  # ×16 between chunks
                    cur = _ec_double(self.F, self.a, cur)
            gens.append(row)
        self.generators = gens
        return self

    def evaluate_bits(self, bits_le):
        """bits: LSB-first stream; chunked into 3-bit signed digits."""
        n = len(bits_le)
        if n % CHUNK_SIZE:
            bits_le = list(bits_le) + [0] * (CHUNK_SIZE - n % CHUNK_SIZE)
        chunks = [bits_le[i:i + 3] for i in range(0, len(bits_le), 3)]
        assert len(chunks) <= self.window_size * self.num_windows
        acc = None
        p = self.F.field.modulus
        for i, (b0, b1, b2) in enumerate(chunks):
            w, j = divmod(i, self.window_size)
            base = self.generators[w][j]
            mult = 1 + b0 + 2 * b1
            pt = ec_mul(self.F, self.a, base, mult)
            if b2:
                pt = (pt[0], [(-v) % p for v in pt[1]])
            acc = ec_add_general(self.F, self.a, acc, pt)
        return acc

    def evaluate(self, data: bytes):
        bits = []
        for byte in data:
            for i in range(8):
                bits.append((byte >> i) & 1)
        return self.evaluate_bits(bits)


def mnt6753_g1_group_hash(window_size=2, num_windows=2) -> BoweHopwoodHost:
    from ..params._gen import curves_gen as CG
    from .. import params as PP
    c = CG.MNT6753
    return BoweHopwoodHost(PP.MNT6753_FQ.modulus, c["a"],
                           (c["g1_x"], c["g1_y"]), PP.MNT6753_FR.modulus,
                           window_size, num_windows)
