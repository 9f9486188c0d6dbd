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

import pyarrow as _pa

# wave-take result layout (matches FrontierShard.commit_fetch)
_WAVE_SCHEMA = _pa.schema(
    [
        ("seq", _pa.int64()),
        ("url", _pa.string()),
        ("host", _pa.string()),
        ("depth", _pa.int32()),
        ("sshard", _pa.int32()),
    ]
)


# num_cpus=0: queue bookkeeping is tiny per call; see SeenShard note.
@ray.remote(num_cpus=0)
class FrontierShard:
    """Indexed priority queue: COLUMNAR SORTED RUNS + TOMBSTONE MASKS
    (r3 rework #2 — the r2 flat list was O(queue) per commit, the first
    r3 rework's tuple runs + heapq.merge still paid ~1 µs/entry of
    Python per peeked row and rebuilt tuples on every add).

    - each ``add``/``add_arrow`` appends one (rank, seq)-lexsorted RUN
      stored as numpy columns (numeric) + object arrays (url/host); the
      sort and all slicing are vectorized;
    - a per-shard ``seq → (run, pos)`` index makes ``commit`` and
      ``commit_fetch`` O(taken) dict/array operations;
    - tombstones are per-run bool masks with a first-alive pointer, so
      the no-quota ``peek`` is per-run alive-prefix slices + one lexsort
      over O(runs · limit) rows — never a queue scan;
    - compaction (concat alive rows, one lexsort, index rebuild) is
      amortized over run-count / tombstone-share thresholds, so a
      10^6-entry shard pays O(queue) only every ~queue/wave waves.

    entries: (rank, seq, url, host, depth, sshard) — rank computed at
    admission (web.link_rank); parity mode uses rank 0/1 = the
    reference's two-queue drain, weighted mode any float."""

    MAX_RUNS = 16
    _COLS = ("rank", "seq", "url", "host", "depth", "sshard")

    def __init__(self, shard_id: int):
        self.shard_id = shard_id
        self.runs: list[dict] = []  # {col: np.ndarray} + "mask","fa","alive"
        self.index: dict[int, tuple] = {}  # live seq -> (run_idx, pos)
        self.dead_total = 0
        self.live = 0
        self.added = 0
        self.taken = 0

    # -- internal ------------------------------------------------------
    def _add_run(self, cols: dict) -> int:
        import numpy as np

        n = len(cols["seq"])
        if n == 0:
            return 0
        order = np.lexsort((cols["seq"], cols["rank"]))
        run = {c: np.asarray(cols[c], dtype=object if c in ("url", "host") else None)[order]
               for c in self._COLS}
        run["rank"] = run["rank"].astype(np.float64, copy=False)
        run["seq"] = run["seq"].astype(np.int64, copy=False)
        run["mask"] = np.zeros(n, dtype=bool)  # True = tombstone
        run["fa"] = 0  # first possibly-alive position
        run["alive"] = n
        rid = len(self.runs)
        self.runs.append(run)
        for pos, s in enumerate(run["seq"].tolist()):
            self.index[s] = (rid, pos)
        self.live += n
        self.added += n
        if len(self.runs) > self.MAX_RUNS:
            self._compact()
        return n

    def _alive_prefix(self, run: dict, limit: int):
        """Indices of the first ≤limit live rows of one run (vectorized;
        advances the first-alive pointer past any consumed prefix)."""
        import numpy as np

        mask, fa = run["mask"], run["fa"]
        while fa < len(mask) and mask[fa]:
            fa += 1
        run["fa"] = fa
        if run["alive"] == len(mask) - fa:  # no interior tombstones
            return np.arange(fa, min(fa + limit, len(mask)), dtype=np.int64)
        return np.flatnonzero(~mask[fa:])[:limit] + fa

    def _candidates(self, limit: int):
        """(rank, seq, run_id, pos) numpy columns of the ≤limit smallest
        live rows per run, merged+lexsorted — the vectorized k-way merge
        head. O(runs·limit·log) regardless of queue size."""
        import numpy as np

        rk, sq, ri, po = [], [], [], []
        for rid, run in enumerate(self.runs):
            idx = self._alive_prefix(run, limit)
            if len(idx) == 0:
                continue
            rk.append(run["rank"][idx])
            sq.append(run["seq"][idx])
            ri.append(np.full(len(idx), rid, dtype=np.int32))
            po.append(idx)
        if not rk:
            z = np.empty(0)
            return z, z.astype(np.int64), z.astype(np.int32), z.astype(np.int64)
        rank = np.concatenate(rk)
        seq = np.concatenate(sq)
        rids = np.concatenate(ri)
        pos = np.concatenate(po)
        order = np.lexsort((seq, rank))
        return rank[order], seq[order], rids[order], pos[order]

    def _peek_quota_columns(
        self, limit: int, quota: int | None, offsets: dict | None = None
    ):
        """Vectorized quota/offset peek: (rank, seq, host) numpy columns
        of the first ≤limit live rows in global (rank, seq) order whose
        within-host occurrence index is < quota — exactly the greedy
        _iter_live scan's selection (each host's first ≤quota rows in
        order, truncated at limit), computed as a grouped running count
        over ALL live rows instead of a per-row Python merge. With
        ``offsets`` (adaptive per-host priority) the rank column is the
        ADJUSTED rank, matching peek()'s offset mode, and the order is
        (adjusted rank, seq)."""
        import numpy as np

        rk, sq, hs = [], [], []
        for run in self.runs:
            keep = ~run["mask"]
            if not keep.any():
                continue
            rk.append(run["rank"][keep])
            sq.append(run["seq"][keep])
            hs.append(run["host"][keep])
        if not rk:
            e = np.empty(0)
            return e, e.astype(np.int64), np.empty(0, dtype=object)
        rank = np.concatenate(rk)
        seq = np.concatenate(sq)
        host = np.concatenate(hs)
        if offsets:
            rank = rank + np.fromiter(
                (offsets.get(h, 0.0) for h in host), np.float64, len(host)
            )
        order = np.lexsort((seq, rank))
        if quota is None:
            sel = order[:limit]
            return rank[sel], seq[sel], host[sel]
        _, codes = np.unique(host[order], return_inverse=True)
        idx = np.argsort(codes, kind="stable")
        c_sorted = codes[idx]
        n = len(c_sorted)
        starts = np.r_[0, np.flatnonzero(np.diff(c_sorted)) + 1]
        lens = np.diff(np.r_[starts, n])
        occ = np.arange(n) - np.repeat(starts, lens)
        eligible = np.empty(n, dtype=bool)
        eligible[idx] = occ < quota
        sel = order[np.flatnonzero(eligible)[:limit]]
        return rank[sel], seq[sel], host[sel]

    def _iter_live(self):
        """Lazy (rank, seq)-ordered scan over ALL live rows (quota /
        offset paths and snapshots; the no-quota peek never calls it)."""
        import heapq

        def run_iter(run):
            mask = run["mask"]
            for pos in range(run["fa"], len(mask)):
                if not mask[pos]:
                    yield (run["rank"][pos], run["seq"][pos], run, pos)

        return heapq.merge(*(run_iter(r) for r in self.runs), key=lambda t: (t[0], t[1]))

    @staticmethod
    def _row(run: dict, pos: int) -> tuple:
        return (
            float(run["rank"][pos]),
            int(run["seq"][pos]),
            run["url"][pos],
            run["host"][pos],
            int(run["depth"][pos]),
            int(run["sshard"][pos]),
        )

    def _compact(self) -> None:
        import numpy as np

        if not self.runs:
            return
        alive_cols = {c: [] for c in self._COLS}
        for run in self.runs:
            keep = ~run["mask"]
            for c in self._COLS:
                alive_cols[c].append(run[c][keep])
        cols = {c: np.concatenate(v) if v else np.empty(0) for c, v in alive_cols.items()}
        self.runs = []
        self.index = {}
        self.live = 0
        n = len(cols["seq"])
        self.added -= n  # _add_run re-counts
        self.dead_total = 0
        self._add_run(cols)

    def _maybe_compact(self) -> None:
        if self.dead_total > max(1024, self.live // 2) or len(self.runs) > self.MAX_RUNS:
            self._compact()

    # -- public --------------------------------------------------------
    def add(self, entries: list[tuple]) -> int:
        import numpy as np

        if not entries:
            return 0
        cols = {c: np.asarray([e[i] for e in entries],
                              dtype=object if c in ("url", "host") else None)
                for i, c in enumerate(self._COLS)}
        return self._add_run(cols)

    def warm(self, tbl) -> int:
        """Setup-time no-op exercising the Arrow-IPC deserialization
        path (see SeenShard.warm)."""
        return tbl.num_rows

    def add_arrow(self, tbl) -> int:
        """Arrow-table variant: columns rank/seq/url/host/depth/sshard —
        the driver ships a column slice, the shard keeps numpy columns
        (numeric ones zero-copy). ``sshard`` (the URL's seen-shard id)
        rides along so the wave take returns it and mark_issued needs no
        driver-side re-hash."""
        cols = {
            "rank": tbl.column("rank").to_numpy(zero_copy_only=False),
            "seq": tbl.column("seq").to_numpy(zero_copy_only=False),
            "url": tbl.column("url").to_numpy(zero_copy_only=False),
            "host": tbl.column("host").to_numpy(zero_copy_only=False),
            "depth": tbl.column("depth").to_numpy(zero_copy_only=False),
            "sshard": tbl.column("sshard").to_numpy(zero_copy_only=False),
        }
        return self._add_run(cols)

    def peek(
        self, limit: int, host_quota: int | None, host_offsets: dict | None = None
    ) -> list[tuple]:
        """Up to ``limit`` entries in (rank, seq) order with at most
        ``host_quota`` per LOCAL host; does not remove them.

        Fast path (no quota, no offsets — the headline crawl): the
        vectorized run-head merge (_candidates). With a quota the lazy
        merge is scanned with per-host counters; the scan may traverse
        the whole shard only when most hosts are capped. ``host_offsets``
        (adaptive per-host priority, recomputed between waves from
        aggregated per-host stats) are added to each entry's rank; that
        mode re-sorts the adjusted view (adaptive crawls are
        politeness-shaped anyway)."""
        if host_offsets:
            adjusted = sorted(
                (t[0] + host_offsets.get(t[2]["host"][t[3]], 0.0), t[1], t[2], t[3])
                for t in self._iter_live()
            )
            src = iter(adjusted)
        elif host_quota is None:
            _, _, rids, pos = self._candidates(limit)
            return [self._row(self.runs[r], p) for r, p in
                    zip(rids[:limit].tolist(), pos[:limit].tolist())]
        else:
            src = self._iter_live()
        out: list[tuple] = []
        per_host: dict[str, int] = defaultdict(int)
        for t in src:
            if len(out) >= limit:
                break
            run, pos = t[2], t[3]
            host = run["host"][pos]
            if host_quota is not None and per_host[host] >= host_quota:
                continue
            per_host[host] += 1
            if host_offsets:
                out.append((t[0],) + self._row(run, pos)[1:])
            else:
                out.append(self._row(run, pos))
        return out

    def peek_arrow(
        self, limit: int, host_quota: int | None, host_offsets: dict | None = None
    ):
        """Arrow-table variant of peek — ships columns, not pickled
        tuples (kept for API compatibility; the wave take now uses the
        narrower peek_heads + commit_fetch protocol)."""
        import pyarrow as pa

        out = self.peek(limit, host_quota, host_offsets)
        rank, seq, url, host, depth, sshard = (
            zip(*out) if out else ((),) * 6
        )
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

    def peek_heads(
        self,
        limit: int,
        host_quota: int | None,
        host_offsets: dict | None = None,
        with_host: bool = False,
    ):
        """NARROW peek for the wave take's selection round: only the
        merge keys (rank, seq) — plus host when the driver-side greedy
        politeness/offset merge needs it — cross the wire (~16 B/row vs
        ~100 B/row of URL strings); the full rows travel once, for the
        TAKEN seqs only, in commit_fetch. The no-quota fast path is
        all-numpy end to end."""
        import pyarrow as pa

        if host_quota is None and not host_offsets:
            rank, seq, _, _ = self._candidates(limit)
            cols = {
                "rank": pa.array(rank[:limit], pa.float64()),
                "seq": pa.array(seq[:limit], pa.int64()),
            }
            if with_host:  # not needed by callers today, kept total
                out = self.peek(limit, None, None)
                cols["host"] = pa.array([e[3] for e in out], pa.string())
            return pa.table(cols)
        # quota and/or adaptive-offset path, vectorized: the Python
        # _iter_live scan paid ~1 µs/row and traverses deep into the
        # shard exactly when hosts are hot (the skew crawl's defining
        # case); the offset mode re-sorted the WHOLE live queue in
        # Python per wave before this
        rank, seq, host = self._peek_quota_columns(limit, host_quota, host_offsets)
        cols = {
            "rank": pa.array(rank, pa.float64()),
            "seq": pa.array(seq, pa.int64()),
        }
        if with_host:
            cols["host"] = pa.array(host.tolist(), pa.string())
        return pa.table(cols)

    def commit_fetch(self, seqs: list[int]):
        """Commit the taken seqs AND return their full rows (url, host,
        depth, sshard keyed by seq) in one round trip — O(taken) via the
        seq index."""
        import pyarrow as pa

        urls, hosts, depths, sshards = [], [], [], []
        for s in seqs:
            loc = self.index.get(s)
            if loc is None:
                raise KeyError(
                    f"frontier shard {self.shard_id}: commit_fetch seq {s} not live"
                )
            run, pos = self.runs[loc[0]], loc[1]
            urls.append(run["url"][pos])
            hosts.append(run["host"][pos])
            depths.append(int(run["depth"][pos]))
            sshards.append(int(run["sshard"][pos]))
        tbl = pa.table(
            {
                "seq": pa.array(seqs, pa.int64()),
                "url": pa.array(urls, pa.string()),
                "host": pa.array(hosts, pa.string()),
                "depth": pa.array(depths, pa.int32()),
                "sshard": pa.array(sshards, pa.int32()),
            }
        )
        self.commit(seqs)
        return tbl

    def commit(self, seqs: list[int]) -> None:
        n = 0
        for s in seqs:
            loc = self.index.pop(s, None)
            if loc is None:
                continue  # idempotent under retries
            run = self.runs[loc[0]]
            run["mask"][loc[1]] = True
            run["alive"] -= 1
            n += 1
        self.taken += len(seqs)
        self.live -= n
        self.dead_total += n
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
        return [self._row(t[2], t[3]) for t in self._iter_live()]

    def restore(self, entries: list[tuple]) -> None:
        self.runs = []
        self.index = {}
        self.live = 0
        self.added = 0
        self.dead_total = 0
        self.add(entries)
        self.added = len(entries)


def take_wave_table(
    frontier_shards,
    budget: int,
    host_quota: int | None,
    salt: int = 1,
    host_offsets: dict | None = None,
):
    """Distributed wave take: peek all shards, merge with GLOBAL per-host
    politeness, commit. Returns an Arrow table (seq, url, host, depth,
    sshard) in the deterministic global take order — columnar end to
    end, so the driver never builds per-row Python tuples on the wave
    critical path (the r2/r3 dict-of-tuples reorder cost ~50 ms of
    driver time per 16k-row wave while every worker idled at the
    barrier).

    The per-host quota is enforced at the driver merge (the greedy
    "take each host's first ≤Q entries in global order" — provably the
    oracle's single-queue pop order). Shards additionally pre-cap their
    peek at Q per LOCAL host to bound transfer; with salting a host
    spans ``salt`` sub-shards, each still returning its first ≤Q, so the
    host's global first-Q entries are always present in the union.

    The global order is priority-first, then discovered_seq.

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
    with_host = not adaptive  # driver merge needs hosts only for quota/offsets
    S = len(frontier_shards)
    # 4× the mean per-shard share: host-hash sharding under Zipf-skewed
    # hosts routinely gives the hottest shard 2-3× the mean (the h0
    # bench corpus shard holds ~29% of the queue), and a first peek that
    # truncates exactly there forces the 4× re-peek on EVERY wave —
    # headroom is cheaper than a second round trip, and still O(B/S).
    # The peek is NARROW (rank+seq, ~16 B/row): overshipping 4× costs
    # ~1 MB, not the ~6 MB the r2 full-row peek paid in URL strings.
    limit = (
        min(budget, max(1024, 4 * (budget // max(1, S)) + 64)) if adaptive else budget
    )
    while True:
        tbls = ray.get(
            [
                f.peek_heads.remote(limit, host_quota, host_offsets, with_host)
                for f in frontier_shards
            ]
        )
        merged = pa.concat_tables(tbls)
        if merged.num_rows == 0:
            return _WAVE_SCHEMA.empty_table()
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
        else:
            # politeness: greedy global per-host quota in (rank, seq)
            # order — vectorized. The greedy "take each host's first
            # ≤Q entries in global order, stop at budget" selects
            # exactly the first `budget` rows (in global order) whose
            # within-host occurrence index is < Q, so it reduces to a
            # grouped running count: dictionary-encode hosts (no
            # Python strings), stable-sort the global order by host
            # code, subtract each group's start offset.
            codes = (
                merged.column("host")
                .combine_chunks()
                .dictionary_encode()
                .indices.to_numpy(zero_copy_only=False)
            )
            h_ord = codes[order]
            idx = np.argsort(h_ord, kind="stable")
            h_sorted = h_ord[idx]
            n_rows = len(h_sorted)
            starts = np.r_[0, np.flatnonzero(np.diff(h_sorted)) + 1]
            lens = np.diff(np.r_[starts, n_rows])
            occ = np.arange(n_rows) - np.repeat(starts, lens)
            eligible = np.empty(n_rows, dtype=bool)
            eligible[idx] = occ < host_quota
            sel = order[np.flatnonzero(eligible)[:budget]]
        if not adaptive or limit >= budget:
            break
        peeked = np.asarray([t.num_rows for t in tbls], dtype=np.int64)
        taken_per = np.bincount(shard_ids[sel], minlength=S).astype(np.int64)
        # a shard whose peek was limit-truncated AND fully consumed may
        # be hiding globally-selectable entries — re-peek larger
        if not np.any((peeked == limit) & (taken_per == peeked)):
            break
        limit = min(budget, limit * 4)
    taken_seq = seq[sel]
    taken_shard = shard_ids[sel]
    if taken_seq.size == 0:
        return _WAVE_SCHEMA.empty_table()
    # second round: commit + fetch the full rows for the TAKEN seqs only
    # (the only time URL strings cross the wire, output-sized)
    fetch_shards = np.unique(taken_shard)
    fetched = ray.get(
        [
            frontier_shards[int(s)].commit_fetch.remote(
                taken_seq[taken_shard == s].tolist()
            )
            for s in fetch_shards
        ]
    )
    cat = pa.concat_tables(fetched)
    # vectorized reorder into the global take order: position of each
    # taken seq inside the fetched concat (seqs are unique)
    seq_f = cat.column("seq").to_numpy()
    sorter = np.argsort(seq_f)
    pos = sorter[np.searchsorted(seq_f, taken_seq, sorter=sorter)]
    return cat.take(pa.array(pos))


def take_wave(
    frontier_shards,
    budget: int,
    host_quota: int | None,
    salt: int = 1,
    host_offsets: dict | None = None,
) -> list[tuple]:
    """Tuple-view wrapper over :func:`take_wave_table` — returns the
    taken entries as (seq, url, host, depth, sshard) in the
    deterministic global order (kept for tests/oracle-parity callers;
    the engine's wave loop consumes the Arrow table directly)."""
    t = take_wave_table(frontier_shards, budget, host_quota, salt, host_offsets)
    return list(
        zip(
            t.column("seq").to_pylist(),
            t.column("url").to_pylist(),
            t.column("host").to_pylist(),
            t.column("depth").to_pylist(),
            t.column("sshard").to_pylist(),
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
