"""Numpy-backed cuckoo filter — the deletion-capable URL-seen prefilter.

The north_rule asks for a "Bloom/cuckoo URL-seen filter"; state.bloom
is the default, this is the cuckoo alternative (Fan, Andersen,
Kaminsky, Mitzenmacher, "Cuckoo Filter: Practically Better Than
Bloom", CoNEXT'14 — see PAPERS.md). Same prefilter contract as
BloomFilter (``add_many(h1, h2)`` / ``contains_many(h1, h2)`` over the
two md5 uint64 halves from ``bloom.digest_halves``), plus what Bloom
cannot do: ``delete_many`` — at a 10^10-URL frontier with recrawl
TTLs, evicting expired URLs from the prefilter keeps its load factor
(and fp rate) flat instead of monotonically degrading.

Layout: ``m`` power-of-two buckets × 4 slots of 16-bit fingerprints
(0 = empty). Partial-key cuckoo hashing: an entry's two candidate
buckets are ``i1 = h1 & (m-1)`` and ``i2 = i1 ^ H(fp)``, so relocation
during an eviction kick needs only (bucket, fp) — never the original
key. The probe path (the hot one: every candidate URL in every wave is
probed, only the fresh minority is inserted) is fully vectorized: two
gathers of (n, 4) fingerprint rows and one broadcast compare. Inserts
walk a bounded per-item kick loop (inserts are rare and exact-set
guarded in SeenShard; ~10^5/s in CPython is ample for per-wave
admission batches).

Deletion contract (standard cuckoo-filter semantics): only delete keys
that were actually inserted and not yet deleted — deleting a
never-inserted key can strip another key's colliding fingerprint and
create a false negative. SeenShard's exact set enforces this by
construction.
"""

from __future__ import annotations

import numpy as np

_FP_MULT = np.uint64(0x9E3779B97F4A7C15)  # Fibonacci hashing for H(fp)


class CuckooFilter:
    def __init__(self, capacity: int, bucket_size: int = 4, max_kicks: int = 500):
        n = max(capacity, 1)
        # 0.95 is the practical load-factor ceiling for b=4 (CoNEXT'14 §5)
        m = 1
        while m * bucket_size * 0.95 < n:
            m <<= 1
        self.m = m
        self.mask = np.uint64(m - 1)
        self.bucket_size = bucket_size
        self.max_kicks = max_kicks
        self.table = np.zeros((m, bucket_size), dtype=np.uint16)
        self.size = 0
        # deterministic kick-victim rotation (no RNG: resume-stable)
        self._kick_seq = 0

    # -- key → (bucket, fingerprint) ---------------------------------------
    def _derive(self, h1: np.ndarray, h2: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        i1 = (h1 & self.mask).astype(np.uint64)
        fp = ((h2 >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1  # 0 is the empty-slot sentinel
        return i1, fp

    def _alt(self, bucket: np.ndarray, fp: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):  # uint64 wraparound is the hash
            h = (fp.astype(np.uint64) * _FP_MULT) & self.mask
        return (bucket ^ h).astype(np.uint64)

    # -- prefilter contract -------------------------------------------------
    def contains_many(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        i1, fp = self._derive(np.asarray(h1, np.uint64), np.asarray(h2, np.uint64))
        i2 = self._alt(i1, fp)
        want = fp[:, None]
        return (
            (self.table[i1] == want).any(axis=1)
            | (self.table[i2] == want).any(axis=1)
        )

    def add_many(self, h1: np.ndarray, h2: np.ndarray) -> None:
        i1, fp = self._derive(np.asarray(h1, np.uint64), np.asarray(h2, np.uint64))
        # headroom gate BEFORE any slot is written: a mid-batch raise
        # would leave earlier keys inserted and later ones not, and a
        # caller that registered the batch elsewhere first (exact set,
        # audit row) would hold a prefilter missing keys — a permanent
        # false-negative, the one thing the prefilter contract forbids.
        # 0.95·m·b is the b=4 load-factor ceiling (CoNEXT'14 §5); the
        # constructor sizes m so `capacity` inserts never trip this.
        if self.size + len(fp) > int(0.95 * self.m * self.bucket_size):
            raise RuntimeError(
                f"cuckoo filter over capacity before batch insert "
                f"(size={self.size} + batch={len(fp)} > "
                f"{int(0.95 * self.m * self.bucket_size)}, m={self.m}); "
                "size the shard's prefilter capacity to its key range"
            )
        i2 = self._alt(i1, fp)
        table = self.table
        for j in range(len(fp)):
            f = fp[j]
            placed = False
            for b in (int(i1[j]), int(i2[j])):
                row = table[b]
                empt = np.flatnonzero(row == 0)
                if empt.size:
                    row[empt[0]] = f
                    placed = True
                    break
            if placed:
                self.size += 1
                continue
            # cuckoo kick: evict a resident fingerprint, move it to its
            # alternate bucket, repeat up to max_kicks
            b = int(i1[j]) if self._kick_seq & 1 else int(i2[j])
            cur = f
            ok = False
            for k in range(self.max_kicks):
                slot = (self._kick_seq + k) % self.bucket_size
                victim = table[b, slot]
                table[b, slot] = cur
                cur = victim
                b = int(self._alt(np.uint64(b), np.uint16(cur)))
                row = table[b]
                empt = np.flatnonzero(row == 0)
                if empt.size:
                    row[empt[0]] = cur
                    ok = True
                    break
            self._kick_seq += 1
            if not ok:
                raise RuntimeError(
                    f"cuckoo filter over capacity (size={self.size}, m={self.m}); "
                    "size the shard's prefilter capacity to its key range"
                )
            self.size += 1

    def delete_many(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Remove one matching fingerprint per key; returns a bool mask of
        keys actually found (False = was never inserted / already deleted)."""
        i1, fp = self._derive(np.asarray(h1, np.uint64), np.asarray(h2, np.uint64))
        i2 = self._alt(i1, fp)
        out = np.zeros(len(fp), dtype=bool)
        table = self.table
        for j in range(len(fp)):
            f = fp[j]
            for b in (int(i1[j]), int(i2[j])):
                hit = np.flatnonzero(table[b] == f)
                if hit.size:
                    table[b, hit[0]] = 0
                    self.size -= 1
                    out[j] = True
                    break
        return out

    # -- checkpoint ----------------------------------------------------------
    def snapshot(self) -> dict:
        return {
            "m": self.m,
            "bucket_size": self.bucket_size,
            "size": self.size,
            "kick_seq": self._kick_seq,
            "table": self.table.tobytes(),
        }

    def restore(self, snap: dict) -> None:
        self.m = snap["m"]
        self.mask = np.uint64(self.m - 1)
        self.bucket_size = snap["bucket_size"]
        self.size = snap["size"]
        self._kick_seq = snap["kick_seq"]
        self.table = (
            np.frombuffer(snap["table"], dtype=np.uint16)
            .reshape(self.m, self.bucket_size)
            .copy()
        )
