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
    def __init__(self, shard_id: int):
        self.shard_id = shard_id
        # entries: (rank, seq, url, host, depth) — rank computed at
        # admission (web.link_rank); parity mode uses rank 0/1 = the
        # reference's two-queue drain, weighted mode any float
        self.entries: list[tuple] = []
        self.dirty = False
        self.added = 0
        self.taken = 0

    def add(self, entries: list[tuple]) -> int:
        self.entries.extend(entries)
        self.dirty = True
        self.added += len(entries)
        return len(entries)

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

        ``host_offsets`` (adaptive per-host priority, recomputed between
        waves from aggregated per-host stats) are added to each entry's
        rank; returned tuples carry the ADJUSTED rank so the driver
        merge orders globally by it."""
        if self.dirty:
            self.entries.sort()  # timsort; appends keep it nearly sorted
            self.dirty = False
        entries = self.entries
        if host_offsets:
            entries = sorted(
                ((e[0] + host_offsets.get(e[3], 0.0),) + e[1:] for e in entries)
            )
        out: list[tuple] = []
        per_host: dict[str, int] = defaultdict(int)
        for e in entries:
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
        self.entries = [e for e in self.entries if e[1] not in s]
        self.taken += len(s)

    def size(self) -> int:
        return len(self.entries)

    def stats(self) -> dict:
        return {
            "shard": self.shard_id,
            "queued": len(self.entries),
            "added": self.added,
            "taken": self.taken,
        }

    def snapshot(self) -> list[tuple]:
        return list(self.entries)

    def restore(self, entries: list[tuple]) -> None:
        self.entries = sorted(entries)
        self.dirty = False


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
    """
    import numpy as np
    import pyarrow as pa

    tbls = ray.get(
        [f.peek_arrow.remote(budget, host_quota, host_offsets) for f in frontier_shards]
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
