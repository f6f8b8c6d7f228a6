"""Blake2s (RFC 7693) gadget over UInt32 wires
(r1cs/gadgets/crypto/src/prf/blake2s/mod.rs, ~659 LoC in the reference).

Unkeyed Blake2s-256: matches hashlib.blake2s(digest_size=32) and the Rust
`blake2` crate.  The commitment/PRF gadgets compose it the same way as the
primitives (seed ‖ input).
"""

from __future__ import annotations

from ..std.boolean import Boolean
from ..std.uint import UInt32, UInt8

IV = [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
      0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19]

SIGMA = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
]


def _g(cs, v, a, b, c, d, x, y, name):
    v[a] = UInt32.addmany(cs, [v[a], v[b], x], f"{name}/a1")
    v[d] = v[d].xor(cs, v[a]).rotr(16)
    v[c] = UInt32.addmany(cs, [v[c], v[d]], f"{name}/c1")
    v[b] = v[b].xor(cs, v[c]).rotr(12)
    v[a] = UInt32.addmany(cs, [v[a], v[b], y], f"{name}/a2")
    v[d] = v[d].xor(cs, v[a]).rotr(8)
    v[c] = UInt32.addmany(cs, [v[c], v[d]], f"{name}/c2")
    v[b] = v[b].xor(cs, v[c]).rotr(7)


def _compress(cs, h, block_words, t: int, last: bool, name):
    v = [h[i] for i in range(8)] + [UInt32.constant(IV[i]) for i in range(8)]
    v[12] = v[12].xor(cs, UInt32.constant(t & 0xFFFFFFFF))
    v[13] = v[13].xor(cs, UInt32.constant((t >> 32) & 0xFFFFFFFF))
    if last:
        v[14] = v[14].xor(cs, UInt32.constant(0xFFFFFFFF))
    for r in range(10):
        s = SIGMA[r]
        _g(cs, v, 0, 4, 8, 12, block_words[s[0]], block_words[s[1]],
           f"{name}/r{r}g0")
        _g(cs, v, 1, 5, 9, 13, block_words[s[2]], block_words[s[3]],
           f"{name}/r{r}g1")
        _g(cs, v, 2, 6, 10, 14, block_words[s[4]], block_words[s[5]],
           f"{name}/r{r}g2")
        _g(cs, v, 3, 7, 11, 15, block_words[s[6]], block_words[s[7]],
           f"{name}/r{r}g3")
        _g(cs, v, 0, 5, 10, 15, block_words[s[8]], block_words[s[9]],
           f"{name}/r{r}g4")
        _g(cs, v, 1, 6, 11, 12, block_words[s[10]], block_words[s[11]],
           f"{name}/r{r}g5")
        _g(cs, v, 2, 7, 8, 13, block_words[s[12]], block_words[s[13]],
           f"{name}/r{r}g6")
        _g(cs, v, 3, 4, 9, 14, block_words[s[14]], block_words[s[15]],
           f"{name}/r{r}g7")
    return [h[i].xor(cs, v[i]).xor(cs, v[i + 8]) for i in range(8)]


def blake2s_gadget(cs, input_bytes, name="blake2s"):
    """input_bytes: list of UInt8 gadgets; returns 32 UInt8 digest gadgets.

    Unkeyed, digest 32: h0 = IV0 ^ 0x01010020 (fanout/depth/digest_len).
    """
    h = [UInt32.constant(IV[i] ^ (0x01010020 if i == 0 else 0))
         for i in range(8)]
    data = list(input_bytes)
    n = len(data)
    if n == 0:
        data = [UInt8.constant(0)] * 64
        blocks = [data]
        lens = [0]
    else:
        blocks = []
        for off in range(0, n, 64):
            chunk = data[off:off + 64]
            blocks.append(chunk)
        # pad the last block with zero bytes
        last = blocks[-1]
        if len(last) < 64:
            blocks[-1] = last + [UInt8.constant(0)] * (64 - len(last))
        lens = [min(n, (i + 1) * 64) for i in range(len(blocks))]
        lens[-1] = n

    for bi, block in enumerate(blocks):
        words = []
        for w in range(16):
            bits = []
            val = 0
            known = True
            for j in range(4):
                byte = block[4 * w + j]
                bits.extend(byte.into_bits_le())
                if byte.value is None:
                    known = False
                else:
                    val |= byte.value << (8 * j)
            words.append(UInt32.from_bits_le(bits, val if known else None))
        is_last = bi == len(blocks) - 1
        h = _compress(cs, h, words, lens[bi], is_last, f"{name}/blk{bi}")

    out = []
    for word in h:
        out.extend(word.to_bytes_le())
    return out


class Blake2sPRFGadget:
    """PRF(seed, input) = blake2s(seed ‖ input) in-circuit."""

    @staticmethod
    def check_evaluation(cs, seed_bytes, input_bytes, name="b2s_prf"):
        return blake2s_gadget(cs, list(seed_bytes) + list(input_bytes), name)


class Blake2sCommitmentGadget:
    """commit(input, randomness) = blake2s(input ‖ randomness) in-circuit."""

    @staticmethod
    def check_commitment(cs, input_bytes, randomness_bytes, name="b2s_comm"):
        return blake2s_gadget(cs, list(input_bytes) + list(randomness_bytes),
                              name)
