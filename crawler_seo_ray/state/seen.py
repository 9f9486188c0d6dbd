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

Scale path: an approximate-membership prefilter in front of the exact
set — Bloom (state.bloom, default) or cuckoo (state.cuckoo, deletion-
capable for recrawl-TTL eviction), selected by ``EngineConfig.
seen_prefilter``. "Definitely new" skips the exact probe, "maybe seen"
verifies exactly, keeping the final seen set exact while the hot path
stays O(1) vectorized lookups. Both structures snapshot/restore for
checkpointed resume.
"""

from __future__ import annotations

import ray

from ..canon import url_digest
from .bloom import BloomFilter, digest_halves
from .cuckoo import CuckooFilter


# num_cpus=0: membership bookkeeping is tiny per call; reserving CPU
# slots here would starve the PageWorker pool on small machines.
@ray.remote(num_cpus=0)
class SeenShard:
    def __init__(
        self,
        shard_id: int,
        bloom_capacity: int = 1_000_000,
        prefilter: str = "bloom",
    ):
        self.shard_id = shard_id
        # url → issued flag (issued = popped from the frontier;
        # distinguishes the reference's silent intake skip from the
        # counted duplicate, core/crawler.py:207 vs url_manager.py:209)
        self.seen: dict[str, bool] = {}
        # in-wave candidate slices pushed straight from the workers
        # (P2P shuffle): [(chunk_key, CANDIDATE-schema table)]
        self._wave_buf: list[tuple[int, object]] = []
        if prefilter == "cuckoo":
            self.bloom = CuckooFilter(bloom_capacity)
        elif prefilter == "bloom":
            self.bloom = BloomFilter(bloom_capacity)
        else:
            raise ValueError(f"unknown seen prefilter: {prefilter!r}")
        self.dup_count = 0

    def warm(self, tbl) -> int:
        """Setup-time no-op that exercises the actor's Arrow-IPC
        deserialization path (lazily initialized per process, ~0.7s
        cold) so the first real admit_arrow doesn't pay it mid-loop."""
        return tbl.num_rows

    def admit_arrow(self, tbl) -> list[int]:
        """Arrow-table variant of admit: columns ``url`` + ``order_key``.
        The driver ships a zero-copy slice; the (parallel) shard pays the
        to_pylist conversion."""
        return self.admit(tbl.column("url").to_pylist(), tbl.column("order_key").to_pylist())

    def buffer_full(self, chunk_key: int, tbl) -> None:
        """P2P candidate intake, phase 1: a worker pushes its chunk's
        candidate slice for this shard's key range DIRECTLY here while
        the wave is still running — candidates never transit the driver
        (at 32 cores the driver's per-chunk deserialize+re-ship was the
        scaling bottleneck). Append-only: all probing is deferred to the
        wave barrier (finalize_wave_full), so the push steals no worker
        cycles. ``chunk_key`` identifies the dispatch attempt so a
        straggler-killed chunk's partial pushes can be dropped."""
        self._wave_buf.append((chunk_key, tbl))

    def drop_chunks(self, chunk_keys: list[int]) -> None:
        """Discard buffered slices of straggler-killed chunk attempts:
        their entries became ERROR rows (or were requeued under a fresh
        key), so admitting their candidates would diverge from the
        oracle."""
        dead = set(chunk_keys)
        self._wave_buf = [(k, t) for k, t in self._wave_buf if k not in dead]

    def finalize_wave_full(self):
        """P2P candidate intake, phase 2 (at the wave barrier): probe
        and register the buffered candidates, first-occurrence-by-order
        wins (identical to admit()'s rule — min(order_key) is arrival-
        order-free, so the result is bit-identical no matter how worker
        pushes interleaved). Duplicate counting matches admit(): every
        occurrence of a registered-but-unissued URL, and every repeat
        occurrence within the wave. Returns the WINNING candidate rows
        (full CANDIDATE columns) — output-sized; the driver only ever
        sees admitted rows."""
        import numpy as np
        import pyarrow as pa

        bufs = [t for _, t in self._wave_buf]
        self._wave_buf = []
        bufs = [t for t in bufs if t.num_rows]
        if not bufs:
            return None
        tbl = bufs[0] if len(bufs) == 1 else pa.concat_tables(bufs)
        urls = tbl.column("url").to_pylist()
        keys = tbl.column("order_key").to_numpy()
        order = np.argsort(keys, kind="stable")
        seen = self.seen
        best: dict[str, int] = {}
        dup = 0
        for i in order:
            u = urls[i]
            if u in seen:
                if not seen[u]:
                    dup += 1
                continue
            if u in best:
                dup += 1
            else:
                best[u] = int(i)
        self.dup_count += dup
        if not best:
            return None
        # prefilter BEFORE the exact set: if the prefilter raises
        # (cuckoo over capacity) nothing was committed to self.seen, so
        # the no-false-negative contract (every exact-set member is in
        # the prefilter) survives the failure (ADVICE r03)
        self.bloom.add_many(*digest_halves([url_digest(u) for u in best]))
        for u in best:
            seen[u] = False
        return tbl.take(pa.array(sorted(best.values()), pa.int64()))

    def admit(self, urls: list[str], order_keys: list) -> list[int]:
        """Register-if-absent, first occurrence by order key wins.

        Returns input positions admitted (new, now registered).
        """
        order = sorted(range(len(urls)), key=lambda k: order_keys[k])
        admitted: list[int] = []
        fresh: list[bytes] = []
        fresh_urls: list[str] = []
        batch_new: set[str] = set()
        dup = 0
        for k in order:
            u = urls[k]
            if u in self.seen:
                if not self.seen[u]:
                    dup += 1
                continue
            if u in batch_new:
                dup += 1
                continue
            batch_new.add(u)
            fresh.append(url_digest(u))
            fresh_urls.append(u)
            admitted.append(k)
        # prefilter BEFORE the exact set — a cuckoo over-capacity raise
        # must not leave URLs registered exactly but absent from the
        # prefilter (permanent false negative, ADVICE r03)
        if fresh:
            self.bloom.add_many(*digest_halves(fresh))
        for u in fresh_urls:
            self.seen[u] = False
        self.dup_count += dup
        return admitted

    def probe_bloom(self, urls: list[str]) -> list[bool]:
        """Scale-path prefilter check (exercised by tests; admission above
        stays exact either way)."""
        if not urls:
            return []
        h1, h2 = digest_halves([url_digest(u) for u in urls])
        return self.bloom.contains_many(h1, h2).tolist()

    def evict(self, urls: list[str]) -> int:
        """Recrawl-TTL eviction: forget URLs so a later admit re-crawls
        them. Removes from the exact set AND the prefilter — which only
        the cuckoo variant supports (a Bloom filter cannot delete, so
        evicting under it would leave the prefilter permanently stale
        and its load factor monotonically degrading; raise loudly
        instead of silently diverging). Returns how many were present.

        At a 10^10-URL frontier this is the freshness loop: a TTL sweep
        streams expired URLs from the audit checkpoint, hash-routes them
        to their owning shard, and the next discovery of each URL is
        admitted again as if new."""
        if not isinstance(self.bloom, CuckooFilter):
            raise RuntimeError(
                "evict requires the deletion-capable prefilter: "
                "EngineConfig(seen_prefilter='cuckoo')"
            )
        present = [u for u in urls if u in self.seen]
        for u in present:
            del self.seen[u]
        if present:
            self.bloom.delete_many(*digest_halves([url_digest(u) for u in present]))
        return len(present)

    def mark_issued(self, urls) -> None:
        """urls: list[str] or a pyarrow string Array — the driver ships
        its Arrow wave column slice directly (pickling 32k Python
        strings on the wave's serial path cost ~0.1 s/wave at 32 CPUs);
        the conversion happens here, on the shard."""
        if not isinstance(urls, list):
            urls = urls.to_pylist()
        for u in urls:
            self.seen[u] = True

    def count(self) -> int:
        return len(self.seen)

    def prefilter_stats(self) -> dict:
        """Occupancy evidence for the approximate-membership prefilter
        (bench/ops surface): cuckoo load factor directly bounds its fp
        rate (CoNEXT'14 §5), bloom fill fraction likewise."""
        b = self.bloom
        if isinstance(b, CuckooFilter):
            slots = b.m * b.bucket_size
            return {
                "kind": "cuckoo",
                "size": int(b.size),
                "slots": int(slots),
                "occupancy": b.size / slots,
            }
        import numpy as _np

        set_bits = int(_np.bitwise_count(b.bits).sum()) if hasattr(
            _np, "bitwise_count"
        ) else int(sum(bin(int(w)).count("1") for w in b.bits))
        return {
            "kind": "bloom",
            "set_bits": set_bits,
            "m_bits": int(b.m),
            "fill": set_bits / max(1, int(b.m)),
        }

    def stats(self) -> dict:
        return {"shard": self.shard_id, "seen": len(self.seen), "duplicates": self.dup_count}

    def snapshot(self) -> tuple[list[str], list[bool]]:
        return list(self.seen.keys()), list(self.seen.values())

    def restore(self, urls: list[str], issued: list[bool], dup_count: int = 0) -> None:
        # prefilter first (same raise-consistency order as admit)
        fresh = [url_digest(u) for u in urls]
        if fresh:
            self.bloom.add_many(*digest_halves(fresh))
        self.seen = dict(zip(urls, issued))
        # duplicate counter travels via the wave state.json (stats());
        # without it a resumed run undercounts total_duplicates vs an
        # uninterrupted one (ADVICE r01)
        self.dup_count = dup_count
