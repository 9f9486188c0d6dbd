"""Host-sharded frontier scheduler (SURVEY.md A2/K3 + politeness S3/S4).

The reference holds one or two driver-local FIFO deques
(core/url_manager.py:18,346-431) and pops ≤ max_threads per wave. Here
the frontier is a pool of actors sharded by ``hash(host)`` (optionally
salted by URL hash for Zipf-hot hosts); each shard keeps entries
ordered by ``(rank, discovered_seq)`` where rank is computed at
admission (``web.link_rank`` — 0/1 for reference two-queue parity, a
depth/link-score float in weighted mode). A wave take is a two-phase
distributed k-way merge:

  1. every shard ``peek``s its smallest (rank, seq) entries, pre-capped
     at the per-host politeness quota Q per LOCAL host;
  2. the driver merges the shard heads, applies the GLOBAL per-host
     quota greedily in (rank, seq) order — provably the oracle's
     single-queue pop order — keeps the smallest B, and ``commit``s the
     taken seqs back to the owning shards.

With salting a host spans k sub-shards, each still returning its first
≤Q entries, so the host's global first-Q entries are always present in
the union while its queue storage and peek work fan out; the
politeness budget stays logically per-host at the driver merge (the
weighted-load-balancing-over-skewed-streams pattern, EDBT'21 — see
PAPERS.md).
"""

from __future__ import annotations

from collections import defaultdict

import ray


# num_cpus=0: queue bookkeeping is tiny per call; see SeenShard note.
@ray.remote(num_cpus=0)
class FrontierShard:
    """Indexed priority queue: SORTED RUNS + TOMBSTONES (r3 rework of
    the r2 flat list whose per-wave full-list sort/rebuild was O(queue)
    per commit — VERDICT r02 #6).

    - each ``add`` appends one sorted run (admissions arrive in
      discovery order, already (rank, seq)-sorted in parity mode);
    - ``peek`` lazily k-way-merges the runs (heapq.merge) and stops at
      the limit — O(peeked · log runs), not O(queue);
    - ``commit`` marks taken seqs as tombstones — O(taken);
    - compaction (merge runs, drop tombstones) is amortized: it runs
      when the run count or tombstone share crosses a threshold, so a
      10^6-entry shard pays O(queue) only every ~queue/wave waves.

    entries: (rank, seq, url, host, depth, sshard) — rank computed at
    admission (web.link_rank); parity mode uses rank 0/1 = the
    reference's two-queue drain, weighted mode any float."""

    MAX_RUNS = 16

    def __init__(self, shard_id: int):
        self.shard_id = shard_id
        self.runs: list[list[tuple]] = []
        self.dead: set[int] = set()  # committed (taken) seqs, lazily purged
        self.live = 0
        self.added = 0
        self.taken = 0

    def add(self, entries: list[tuple]) -> int:
        if entries:
            run = sorted(entries)
            self.runs.append(run)
            self.live += len(run)
            self.added += len(run)
            if len(self.runs) > self.MAX_RUNS:
                self._compact()
        return len(entries)

    # -- internal ------------------------------------------------------
    def _merged(self):
        """Lazy (rank, seq)-ordered iterator over live entries."""
        import heapq

        dead = self.dead
        for e in heapq.merge(*self.runs):
            if e[1] not in dead:
                yield e

    def _compact(self) -> None:
        merged = list(self._merged())
        self.runs = [merged] if merged else []
        self.dead.clear()

    def _maybe_compact(self) -> None:
        if len(self.dead) > max(1024, self.live // 2) or len(self.runs) > self.MAX_RUNS:
            self._compact()

    def warm(self, tbl) -> int:
        """Setup-time no-op exercising the Arrow-IPC deserialization
        path (see SeenShard.warm)."""
        return tbl.num_rows

    def add_arrow(self, tbl) -> int:
        """Arrow-table variant: columns rank/seq/url/host/depth/sshard —
        the driver ships a column slice, the shard builds its tuples.
        ``sshard`` (the URL's seen-shard id) rides along so the wave
        take returns it and mark_issued needs no driver-side re-hash."""
        return self.add(
            list(
                zip(
                    tbl.column("rank").to_pylist(),
                    tbl.column("seq").to_pylist(),
                    tbl.column("url").to_pylist(),
                    tbl.column("host").to_pylist(),
                    tbl.column("depth").to_pylist(),
                    tbl.column("sshard").to_pylist(),
                )
            )
        )

    def peek(
        self, limit: int, host_quota: int | None, host_offsets: dict | None = None
    ) -> list[tuple]:
        """Up to ``limit`` entries in (rank, seq) order with at most
        ``host_quota`` per LOCAL host; does not remove them.

        Fast path (no quota, no offsets — the headline crawl): take the
        first ``limit`` live entries straight off the lazy run merge.
        With a quota the merge is scanned with per-host counters; the
        scan may traverse the whole shard only when most hosts are
        capped. ``host_offsets`` (adaptive per-host priority, recomputed
        between waves from aggregated per-host stats) are added to each
        entry's rank; that mode re-sorts the adjusted view (adaptive
        crawls are politeness-shaped anyway)."""
        import itertools

        if host_offsets:
            adjusted = sorted(
                (e[0] + host_offsets.get(e[3], 0.0),) + e[1:] for e in self._merged()
            )
            src = iter(adjusted)
        else:
            src = self._merged()
        if host_quota is None and not host_offsets:
            return list(itertools.islice(src, limit))
        out: list[tuple] = []
        per_host: dict[str, int] = defaultdict(int)
        for e in src:
            if len(out) >= limit:
                break
            host = e[3]
            if host_quota is not None and per_host[host] >= host_quota:
                continue
            per_host[host] += 1
            out.append(e)
        return out

    def peek_arrow(
        self, limit: int, host_quota: int | None, host_offsets: dict | None = None
    ):
        """Arrow-table variant of peek — the wave take ships columns,
        not 10^4 pickled tuples, and the driver merge stays numpy."""
        import pyarrow as pa

        out = self.peek(limit, host_quota, host_offsets)
        if not out:
            return pa.table(
                {
                    "rank": pa.array([], pa.float64()),
                    "seq": pa.array([], pa.int64()),
                    "url": pa.array([], pa.string()),
                    "host": pa.array([], pa.string()),
                    "depth": pa.array([], pa.int32()),
                    "sshard": pa.array([], pa.int32()),
                }
            )
        rank, seq, url, host, depth, sshard = zip(*out)
        return pa.table(
            {
                "rank": pa.array(rank, pa.float64()),
                "seq": pa.array(seq, pa.int64()),
                "url": pa.array(url, pa.string()),
                "host": pa.array(host, pa.string()),
                "depth": pa.array(depth, pa.int32()),
                "sshard": pa.array(sshard, pa.int32()),
            }
        )

    def commit(self, seqs: list[int]) -> None:
        s = set(seqs)
        self.dead.update(s)
        self.taken += len(s)
        self.live -= len(s)
        self._maybe_compact()

    def size(self) -> int:
        return self.live

    def stats(self) -> dict:
        return {
            "shard": self.shard_id,
            "queued": self.live,
            "added": self.added,
            "taken": self.taken,
        }

    def snapshot(self) -> list[tuple]:
        return list(self._merged())

    def restore(self, entries: list[tuple]) -> None:
        self.runs = [sorted(entries)] if entries else []
        self.dead = set()
        self.live = len(entries)


def take_wave(
    frontier_shards,
    budget: int,
    host_quota: int | None,
    salt: int = 1,
    host_offsets: dict | None = None,
) -> list[tuple]:
    """Distributed wave take: peek all shards, merge with GLOBAL per-host
    politeness, commit.

    The per-host quota is enforced at the driver merge (the greedy
    "take each host's first ≤Q entries in global order" — provably the
    oracle's single-queue pop order). Shards additionally pre-cap their
    peek at Q per LOCAL host to bound transfer; with salting a host
    spans ``salt`` sub-shards, each still returning its first ≤Q, so the
    host's global first-Q entries are always present in the union.

    Returns the taken entries as (seq, url, host, depth), in the
    deterministic global order (priority first, then discovered_seq).

    ADAPTIVE PEEK (FIFO/priority mode, no politeness/offsets): shipping
    ``budget`` rows from EVERY shard merges S·B rows at the driver per
    wave when only B are taken. At steady state each shard contributes
    ~B/S, so the take starts with a 2·B/S + slack per-shard limit and
    provably falls back: the merged selection equals the true global
    smallest-B iff every shard either had rows left over (its cut
    wasn't reached) or returned fewer than its limit (exhausted). Any
    violating shard triggers a re-peek at 4× the limit (capped at
    ``budget``, which restores the exhaustive r2 behavior). Politeness
    and adaptive-offset modes always peek exhaustively — a local-quota-
    capped shard's omissions are provably ineligible, but a limit-
    truncated one's are not.
    """
    import numpy as np
    import pyarrow as pa

    adaptive = host_quota is None and not host_offsets
    S = len(frontier_shards)
    # 4× the mean per-shard share: host-hash sharding under Zipf-skewed
    # hosts routinely gives the hottest shard 2-3× the mean (the h0
    # bench corpus shard holds ~29% of the queue), and a first peek that
    # truncates exactly there forces the 4× re-peek on EVERY wave —
    # headroom is cheaper than a second round trip, and still O(B/S)
    limit = (
        min(budget, max(1024, 4 * (budget // max(1, S)) + 64)) if adaptive else budget
    )
    while True:
        tbls = ray.get(
            [f.peek_arrow.remote(limit, host_quota, host_offsets) for f in frontier_shards]
        )
        merged = pa.concat_tables(tbls)
        if merged.num_rows == 0:
            return []
        # commit routing by PROVENANCE (which shard answered), not by
        # re-hashing hosts on the driver
        shard_ids = np.concatenate(
            [np.full(t.num_rows, i, dtype=np.int32) for i, t in enumerate(tbls)]
        )
        rank = merged.column("rank").to_numpy()
        seq = merged.column("seq").to_numpy()
        order = np.lexsort((seq, rank))  # (rank, seq) — seq unique ⇒ total order
        if host_quota is None:
            sel = order[:budget]
        else:  # politeness: greedy global per-host quota in (rank, seq) order
            hosts = merged.column("host").to_pylist()
            per_host: dict[str, int] = defaultdict(int)
            sel_list: list[int] = []
            for k in order:
                if len(sel_list) >= budget:
                    break
                h = hosts[k]
                if per_host[h] >= host_quota:
                    continue
                per_host[h] += 1
                sel_list.append(int(k))
            sel = np.asarray(sel_list, dtype=np.int64)
        if not adaptive or limit >= budget:
            break
        peeked = np.asarray([t.num_rows for t in tbls], dtype=np.int64)
        taken_per = np.bincount(shard_ids[sel], minlength=S).astype(np.int64)
        # a shard whose peek was limit-truncated AND fully consumed may
        # be hiding globally-selectable entries — re-peek larger
        if not np.any((peeked == limit) & (taken_per == peeked)):
            break
        limit = min(budget, limit * 4)
    taken = merged.take(pa.array(sel))
    taken_seq = seq[sel]
    taken_shard = shard_ids[sel]
    futs = []
    for s in np.unique(taken_shard):
        futs.append(
            frontier_shards[int(s)].commit.remote(taken_seq[taken_shard == s].tolist())
        )
    ray.get(futs)
    return list(
        zip(
            taken_seq.tolist(),
            taken.column("url").to_pylist(),
            taken.column("host").to_pylist(),
            taken.column("depth").to_pylist(),
            taken.column("sshard").to_pylist(),
        )
    )


def owner_shard(host: str, num_shards: int, url: str = "", salt: int = 1) -> int:
    """Frontier shard owning a URL. ``salt > 1`` spreads each host's
    queue over ``salt`` sub-shards keyed by the URL hash — the
    salted-key split for Zipf-hot hosts (north_rule): storage and peek
    work fan out while the politeness budget stays logically per-host
    (enforced globally at the driver merge)."""
    import hashlib

    h = int.from_bytes(hashlib.md5(host.encode()).digest()[:4], "big")
    if salt > 1:
        s = int.from_bytes(hashlib.md5(url.encode()).digest()[4:8], "big") % salt
        return (h + s) % num_shards
    return h % num_shards
