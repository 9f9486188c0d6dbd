"""Sharded URL-seen membership index (SURVEY.md A1).

The reference keeps three redundant driver-local sets registered at
enqueue time (core/url_manager.py:14-17,240-246). Here the index is a
pool of Ray actors sharded by ``md5(canonical_url)``; each shard owns
its key range exclusively, so register-if-absent is exactly-once even
under task retries (re-probing an already-registered URL is a no-op
duplicate, never a double admit).

Admission is order-aware: candidates arrive with a global order key
(parent visit_seq, link position) and the first occurrence by that key
wins — making the frontier insertion order a *data* property, not an
execution property (SURVEY.md §7.5).

Scale path: a Bloom prefilter (state.bloom) in front of the exact set;
"definitely new" skips the exact probe, "maybe seen" verifies exactly,
keeping the final seen set exact while the hot path stays O(k) bit
lookups. Both structures snapshot/restore for checkpointed resume.
"""

from __future__ import annotations

import ray

from ..canon import url_digest
from .bloom import BloomFilter, digest_halves


# num_cpus=0: membership bookkeeping is tiny per call; reserving CPU
# slots here would starve the PageWorker pool on small machines.
@ray.remote(num_cpus=0)
class SeenShard:
    def __init__(self, shard_id: int, bloom_capacity: int = 1_000_000):
        self.shard_id = shard_id
        # url → issued flag (issued = popped from the frontier;
        # distinguishes the reference's silent intake skip from the
        # counted duplicate, core/crawler.py:207 vs url_manager.py:209)
        self.seen: dict[str, bool] = {}
        self.pending: dict[str, int] = {}  # in-wave buffered url → min order key
        self.bloom = BloomFilter(bloom_capacity)
        self.dup_count = 0

    def admit_arrow(self, tbl) -> list[int]:
        """Arrow-table variant of admit: columns ``url`` + ``order_key``.
        The driver ships a zero-copy slice; the (parallel) shard pays the
        to_pylist conversion."""
        return self.admit(tbl.column("url").to_pylist(), tbl.column("order_key").to_pylist())

    def buffer_candidates(self, tbl) -> None:
        """Wave-overlapped admission, phase 1: candidates stream in per
        completed worker chunk WHILE the wave is still running; the
        shard tracks, per unseen URL, the smallest order key seen so
        far (the deterministic winner — identical to admit()'s
        first-occurrence-by-order rule, since min(key) is order-free).
        Duplicate counting matches admit(): every occurrence of a
        registered-but-unissued URL, and every repeat occurrence within
        the wave buffer."""
        urls = tbl.column("url").to_pylist()
        keys = tbl.column("order_key").to_pylist()
        pend = self.pending
        for u, k in zip(urls, keys):
            if u in self.seen:
                if not self.seen[u]:
                    self.dup_count += 1
                continue
            cur = pend.get(u)
            if cur is None:
                pend[u] = k
            else:
                self.dup_count += 1
                if k < cur:
                    pend[u] = k

    def finalize_wave(self) -> list[int]:
        """Wave-overlapped admission, phase 2 (at the wave barrier):
        register the buffered winners and return their order keys —
        order keys are globally unique, so the driver selects the
        admitted candidate rows by key membership."""
        pend = self.pending
        if not pend:
            return []
        for u in pend:
            self.seen[u] = False
        fresh = [url_digest(u) for u in pend]
        self.bloom.add_many(*digest_halves(fresh))
        keys = list(pend.values())
        self.pending = {}
        return keys

    def admit(self, urls: list[str], order_keys: list) -> list[int]:
        """Register-if-absent, first occurrence by order key wins.

        Returns input positions admitted (new, now registered).
        """
        order = sorted(range(len(urls)), key=lambda k: order_keys[k])
        admitted: list[int] = []
        fresh: list[bytes] = []
        for k in order:
            u = urls[k]
            if u in self.seen:
                if not self.seen[u]:
                    self.dup_count += 1
                continue
            self.seen[u] = False
            fresh.append(url_digest(u))
            admitted.append(k)
        if fresh:
            self.bloom.add_many(*digest_halves(fresh))
        return admitted

    def probe_bloom(self, urls: list[str]) -> list[bool]:
        """Scale-path prefilter check (exercised by tests; admission above
        stays exact either way)."""
        if not urls:
            return []
        h1, h2 = digest_halves([url_digest(u) for u in urls])
        return self.bloom.contains_many(h1, h2).tolist()

    def mark_issued(self, urls: list[str]) -> None:
        for u in urls:
            self.seen[u] = True

    def count(self) -> int:
        return len(self.seen)

    def stats(self) -> dict:
        return {"shard": self.shard_id, "seen": len(self.seen), "duplicates": self.dup_count}

    def snapshot(self) -> tuple[list[str], list[bool]]:
        return list(self.seen.keys()), list(self.seen.values())

    def restore(self, urls: list[str], issued: list[bool], dup_count: int = 0) -> None:
        self.seen = dict(zip(urls, issued))
        # duplicate counter travels via the wave state.json (stats());
        # without it a resumed run undercounts total_duplicates vs an
        # uninterrupted one (ADVICE r01)
        self.dup_count = dup_count
        fresh = [url_digest(u) for u in urls]
        if fresh:
            self.bloom.add_many(*digest_halves(fresh))
