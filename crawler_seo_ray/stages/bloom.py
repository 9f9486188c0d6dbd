"""Broadcast Bloom-filter join pruning.

The standard big-join reduction at 100 TB scale: the small side's join
keys are folded into a Bloom filter (a few BITS per key instead of the
8+ bytes a broadcast hash set costs), the filter is `ray.put` once and
read by every scan task, and the big side is pruned AT THE READ before
any exchange. Because a Bloom filter admits false positives, an exact
semi-join over the (already tiny) survivor set finishes the job — the
all-to-all exchange ships only survivors, never the raw fact table.

Reference parity: the reference has no distributed joins at all (its
URL-seen set — core/url_manager.py — is the closest analog of a
membership prune); this stage generalizes that membership-prune idea to
relational pruning, which SURVEY §2.4 lists as the engine-level gap.

Hashing: double hashing h_i(x) = h1(x) + i·h2(x) (mod m) over
splitmix64 finalizers — the standard Kirsch–Mitzenmacher construction,
fully numpy-vectorized (no per-row Python anywhere).
"""

from __future__ import annotations

import numpy as np

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array."""
    with np.errstate(over="ignore"):
        z = x + _GOLDEN
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def bloom_params(n_keys: int, bits_per_key: int = 16) -> tuple[int, int]:
    """(m_bits, k) for a target density: 16 bits/key with the optimal
    k = m/n·ln2 ≈ 11 gives ~4e-4 false-positive rate; the verify stage
    makes any FPR correct, this only tunes how much survives to it."""
    m_bits = max(64, n_keys * bits_per_key)
    m_bits = (m_bits + 63) & ~63  # whole uint64 words
    k = max(1, int(round(bits_per_key * 0.6931)))
    return m_bits, k


def build_bloom(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Fold uint64 keys into a packed uint64 bitset (len m_bits/64).
    Partials built per block OR together (bitwise union is the
    combiner), so construction distributes when the small side is only
    relatively small."""
    bits = np.zeros(m_bits // 64, dtype=np.uint64)
    or_bloom_inplace(bits, keys, m_bits, k)
    return bits


def or_bloom_inplace(bits: np.ndarray, keys: np.ndarray, m_bits: int, k: int) -> None:
    keys = keys.astype(np.uint64, copy=False)
    h1 = _splitmix64(keys)
    h2 = _splitmix64(keys ^ _GOLDEN) | np.uint64(1)
    m = np.uint64(m_bits)
    with np.errstate(over="ignore"):
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) % m
            np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))


def bloom_contains(bits: np.ndarray, keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Vectorized membership probe: bool mask, True = maybe-member."""
    keys = keys.astype(np.uint64, copy=False)
    h1 = _splitmix64(keys)
    h2 = _splitmix64(keys ^ _GOLDEN) | np.uint64(1)
    m = np.uint64(m_bits)
    out = np.ones(len(keys), dtype=bool)
    with np.errstate(over="ignore"):
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) % m
            word = bits[(pos >> np.uint64(6)).astype(np.int64)]
            out &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
    return out
