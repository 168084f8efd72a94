"""Regenerate the Poseidon round constants and verify the baked tables
(twin of reference plonky2/src/bin/generate_constants.rs).

The reference samples 12*30 Goldilocks elements from ChaCha8 seeded with
0 (via rand's PCG32 seed expansion and Lemire rejection sampling).
This reimplements that exact pipeline in Python and asserts the output
matches hash/poseidon_constants.ALL_ROUND_CONSTANTS — a from-scratch
cross-check that our constants are the reference's.

Run: python tools/generate_constants.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

MASK64 = (1 << 64) - 1
MASK32 = (1 << 32) - 1


def pcg32_seed(seed: int, nbytes: int = 32) -> bytes:
    """rand_core SeedableRng::seed_from_u64: PCG32 stream, 4 bytes per
    step (xorshift-high output with random rotation)."""
    mul, inc = 6364136223846793005, 11634580027462260723
    out = bytearray()
    state = seed
    while len(out) < nbytes:
        state = (state * mul + inc) & MASK64
        xorshifted = (((state >> 18) ^ state) >> 27) & MASK32
        rot = state >> 59
        x = ((xorshifted >> rot) | (xorshifted << (32 - rot))) & MASK32 \
            if rot else xorshifted
        out += x.to_bytes(4, "little")
    return bytes(out[:nbytes])


def _rotl32(v: int, n: int) -> int:
    return ((v << n) | (v >> (32 - n))) & MASK32


def _quarter(s, a, b, c, d):
    s[a] = (s[a] + s[b]) & MASK32
    s[d] = _rotl32(s[d] ^ s[a], 16)
    s[c] = (s[c] + s[d]) & MASK32
    s[b] = _rotl32(s[b] ^ s[c], 12)
    s[a] = (s[a] + s[b]) & MASK32
    s[d] = _rotl32(s[d] ^ s[a], 8)
    s[c] = (s[c] + s[d]) & MASK32
    s[b] = _rotl32(s[b] ^ s[c], 7)


class ChaCha8:
    """The keystream as rand_chacha::ChaCha8Rng exposes it: 64-byte
    blocks, 64-bit block counter in words 12-13, zero nonce."""

    def __init__(self, seed: bytes):
        k = [int.from_bytes(seed[4 * i:4 * i + 4], "little")
             for i in range(8)]
        self.key = k
        self.counter = 0
        self.buf = []

    def _block(self) -> list:
        c = [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574]
        init = c + self.key + [self.counter & MASK32,
                               (self.counter >> 32) & MASK32, 0, 0]
        s = list(init)
        for _ in range(4):  # 8 rounds = 4 double rounds
            _quarter(s, 0, 4, 8, 12)
            _quarter(s, 1, 5, 9, 13)
            _quarter(s, 2, 6, 10, 14)
            _quarter(s, 3, 7, 11, 15)
            _quarter(s, 0, 5, 10, 15)
            _quarter(s, 1, 6, 11, 12)
            _quarter(s, 2, 7, 8, 13)
            _quarter(s, 3, 4, 9, 14)
        out = [(x + y) & MASK32 for x, y in zip(s, init)]
        self.counter += 1
        return out

    def next_u32(self) -> int:
        if not self.buf:
            self.buf = self._block()
        return self.buf.pop(0)

    def next_u64(self) -> int:
        lo = self.next_u32()
        hi = self.next_u32()
        return lo | (hi << 32)


def gen_range_u64(rng: ChaCha8, end: int) -> int:
    """rand 0.8 UniformInt::<u64>::sample_single(0, end): Lemire
    widening-multiply rejection."""
    range_ = end
    lz = 64 - range_.bit_length()
    zone = ((range_ << lz) - 1) & MASK64
    while True:
        v = rng.next_u64()
        m = v * range_
        hi, lo = m >> 64, m & MASK64
        if lo <= zone:
            return hi


def generate(n: int = 12 * 30, seed: int = 0) -> list:
    from plonky2_tpu.field import gl64
    rng = ChaCha8(pcg32_seed(seed))
    return [gen_range_u64(rng, gl64.ORDER_INT) for _ in range(n)]


def main() -> int:
    from plonky2_tpu.hash.poseidon_constants import ALL_ROUND_CONSTANTS
    got = generate()
    expect = [int(c) for c in ALL_ROUND_CONSTANTS]
    if got == expect:
        print(f"OK: all {len(got)} Poseidon round constants reproduce the "
              "reference's ChaCha8(seed=0) generation")
        return 0
    bad = [i for i, (g, e) in enumerate(zip(got, expect)) if g != e]
    print(f"MISMATCH at indices {bad[:8]} (of {len(bad)})")
    print(f"  got[{bad[0]}]    = {got[bad[0]]:#018x}")
    print(f"  expect[{bad[0]}] = {expect[bad[0]]:#018x}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
