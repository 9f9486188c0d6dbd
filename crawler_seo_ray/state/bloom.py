"""Numpy-backed Bloom filter — the scale path of the URL-seen index.

At a 10^10-URL frontier, exact per-shard string sets don't fit one
node; the north_rule asks for a Bloom/cuckoo membership structure
(the learned-cuckoo-filter line of work — SIGMOD'23, see PAPERS.md —
is the drop-in upgrade path behind this same prefilter interface:
lower fp rate at equal memory, still verification-backed here so the
final seen set stays exact).
Design (SURVEY.md §2.5/§7.5): the Bloom filter is a *prefilter* —
"definitely new" admits immediately; "maybe seen" is verified against
the shard's exact set so the final seen-set stays exact while the
exact set can be tiered to cold storage. At test scale the exact set
is fully resident and the Bloom is exercised for correctness only.

k hash functions are derived from two independent 64-bit halves of the
URL's md5 (Kirsch–Mitzenmacher double hashing: h_i = h1 + i*h2).
"""

from __future__ import annotations

import numpy as np


class BloomFilter:
    def __init__(self, capacity: int, fp_rate: float = 0.01):
        n = max(capacity, 1)
        m = int(np.ceil(-n * np.log(fp_rate) / (np.log(2) ** 2)))
        self.m = max(m, 64)
        self.k = max(int(round(self.m / n * np.log(2))), 1)
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    def _positions(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        # (n, k) bit positions via double hashing
        i = np.arange(self.k, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.m)

    def add_many(self, h1: np.ndarray, h2: np.ndarray) -> None:
        pos = self._positions(h1, h2).ravel()
        np.bitwise_or.at(self.bits, pos >> np.uint64(6), np.uint64(1) << (pos & np.uint64(63)))

    def contains_many(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        pos = self._positions(h1, h2)
        word = self.bits[(pos >> np.uint64(6)).ravel()].reshape(pos.shape)
        hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=1).astype(bool)


def digest_halves(digests: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Split 16-byte md5 digests into two uint64 hash streams."""
    arr = np.frombuffer(b"".join(digests), dtype=np.uint64).reshape(-1, 2)
    h2 = arr[:, 1] | np.uint64(1)  # odd → full-period stride
    return arr[:, 0].copy(), h2.copy()
