"""The distributed wave-crawl driver (SURVEY.md §3.4).

Reproduces the reference's iterative wave dataflow (core/crawler.py:71-93)
on Ray: the driver owns only the loop and O(batch) merges; all heavy
state lives in actor pools —

  frontier shards (hash(host))  → deterministic wave take + politeness
  seen shards (md5(url))        → order-aware register-if-absent
  page workers                  → fetch (corpus point-take) + decode +
                                  analyze + link extraction

Determinism under parallelism: ordering is a *data* property.
``visit_seq`` is assigned at wave take in the global (priority, seq)
order; candidate links carry ``order_key = parent_seq × 4096 + link
position``; admission picks first-occurrence-by-order inside the owning
seen shard; ``discovered_seq`` is then assigned over the merged,
order_key-sorted admissions. The result is bit-identical to the
single-thread oracle regardless of actor scheduling.

Checkpoint/resume (north_rule): every wave commits
``{ckpt}/waves/wave=NNNNN/{audit,admitted,rejects}.parquet`` plus a
``state.json`` (written last, atomically) carrying visited count, next
discovered_seq, and per-shard stats — the per-partition lineage. Resume
rebuilds actor state from the committed waves and continues
mid-frontier; an interrupted+resumed crawl equals an uninterrupted one.

Why raw actors and not Dataset ops for the loop: the frontier/seen are
shared mutable indexes (the documented exception); per-wave Datasets
would also rebuild actor pools every wave. The audit *analytics* — dup
flags, scores, rankings, summaries — are Ray Data pipelines over the
audit table (pipelines.report).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import pyarrow as pa
import ray

from ..canon import normalize_url, relevance, shard_of
from ..oracle import CrawlSpec
from ..stages.page_worker import (
    AUDIT_SCHEMA,
    CANDIDATE_SCHEMA,
    REJECT_SCHEMA,
    PageWorker,
    rows_to_table,
)
from ..state.frontier import FrontierShard, owner_shard, take_wave
from ..state.seen import SeenShard
from ..storage import read_table, write_table
from ..web import robots_allows

ADMITTED_SCHEMA = pa.schema(
    [
        ("discovered_seq", pa.int64()),
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.bool_()),
        ("wave", pa.int32()),
    ]
)


@dataclass
class EngineConfig:
    num_seen_shards: int = 4
    num_frontier_shards: int = 4
    num_workers: int = 4
    worker_num_cpus: float = 1.0
    checkpoint_dir: str | None = None
    verify_images: bool = True
    psnr_every: int = 1  # full-PSNR sample stride (1 = every page)
    max_chunk: int = 512  # max entries per worker call


@dataclass
class CrawlResult:
    audit: pa.Table
    rejected: pa.Table
    admitted: pa.Table
    seen: set
    stats: dict
    wave_metrics: list


class _Engine:
    def __init__(self, spec: CrawlSpec, corpus_dir: str | None, cfg: EngineConfig):
        self.spec = spec
        self.cfg = cfg
        self.corpus_dir = corpus_dir
        spec_dict = {
            "n_pages": spec.n_pages,
            "max_depth": spec.max_depth,
            "scope": (spec.scope.kind, spec.scope.value),
            "priority_patterns": spec.priority_patterns,
            "detect_invisible_colors": spec.detect_invisible_colors,
            "verify_images": cfg.verify_images,
            "psnr_every": cfg.psnr_every,
            "robots": spec.robots_deny_prefixes,
        }
        self.seen = [SeenShard.remote(i) for i in range(cfg.num_seen_shards)]
        self.frontier = [FrontierShard.remote(i) for i in range(cfg.num_frontier_shards)]
        self.workers = [
            PageWorker.options(num_cpus=cfg.worker_num_cpus).remote(corpus_dir, spec_dict)
            for _ in range(cfg.num_workers)
        ]
        self.visited = 0
        self.wave = 0
        self.next_seq = 0
        self.audit_tables: list[pa.Table] = []
        self.reject_tables: list[pa.Table] = []
        self.admitted_tables: list[pa.Table] = []
        self.wave_metrics: list[dict] = []
        self.seed_rejects: list[dict] = []

    # ------------------------------------------------------------------
    def _admit(self, urls, hosts, depths, priorities, order_keys, wave: int) -> pa.Table:
        """Order-aware admission via seen shards → frontier adds.

        Returns the admitted entries (ADMITTED_SCHEMA) in discovery order.
        """
        S = len(self.seen)
        by_shard: dict[int, list[int]] = {}
        for k, u in enumerate(urls):
            by_shard.setdefault(shard_of(u, S), []).append(k)
        futures = {}
        for s, ks in by_shard.items():
            futures[s] = self.seen[s].admit.remote(
                [urls[k] for k in ks], [order_keys[k] for k in ks]
            )
        admitted_positions: list[int] = []
        for s, ks in by_shard.items():
            for local in ray.get(futures[s]):
                admitted_positions.append(ks[local])
        admitted_positions.sort(key=lambda k: order_keys[k])

        rows = []
        adds: dict[int, tuple[list, list]] = {}
        for k in admitted_positions:
            seq = self.next_seq
            self.next_seq += 1
            rows.append(
                {
                    "discovered_seq": seq,
                    "url": urls[k],
                    "host": hosts[k],
                    "depth": depths[k],
                    "priority": bool(priorities[k]),
                    "wave": wave,
                }
            )
            fs = owner_shard(hosts[k], len(self.frontier))
            ent, pri = adds.setdefault(fs, ([], []))
            ent.append((seq, urls[k], hosts[k], depths[k]))
            pri.append(bool(priorities[k]))
        ray.get(
            [self.frontier[s].add.remote(ent, pri) for s, (ent, pri) in adds.items()]
        )
        return rows_to_table(rows, ADMITTED_SCHEMA)

    def seed(self) -> None:
        """Seed admission — the reference add_url path for the start URL
        (core/crawler.py:55, priority=True in smart mode)."""
        smart = self.spec.priority_patterns is not None
        urls, hosts, depths, pris, keys = [], [], [], [], []
        for k, s in enumerate(self.spec.seeds):
            c, reason = normalize_url(s, None, self.spec.scope)
            if c is None:
                if reason == "INVALID_URL":
                    self.seed_rejects.append(
                        {"url": s, "reason": reason, "details": "", "wave": -1}
                    )
                continue
            ok, rreason, pat = relevance(c)
            if not ok:
                self.seed_rejects.append(
                    {"url": c, "reason": rreason, "details": pat or "", "wave": -1}
                )
                continue
            if not robots_allows(c, self.spec.robots_deny_prefixes):
                self.seed_rejects.append(
                    {"url": c, "reason": "ROBOTS", "details": "", "wave": -1}
                )
                continue
            urls.append(c)
            hosts.append(c.partition("://")[2].partition("/")[0])
            depths.append(0)
            pris.append(smart)
            keys.append(k)
        t = self._admit(urls, hosts, depths, pris, keys, wave=-1)
        self.admitted_tables.append(t)
        if self.cfg.checkpoint_dir:
            d = os.path.join(self.cfg.checkpoint_dir, "seeds")
            write_table(t, os.path.join(d, "admitted.parquet"))
            write_table(
                rows_to_table(self.seed_rejects, REJECT_SCHEMA),
                os.path.join(d, "rejects.parquet"),
            )
            self._write_state(os.path.join(d, "state.json"), {"kind": "seeds"})

    # ------------------------------------------------------------------
    def run_wave(self) -> bool:
        budget = min(self.spec.batch_size, self.spec.max_urls - self.visited)
        if budget <= 0:
            return False
        batch = take_wave(self.frontier, budget, self.spec.politeness_per_wave)
        if not batch:
            return False
        wave = self.wave

        # mark issued before link intake (core/crawler.py:207 semantics)
        by_shard: dict[int, list[str]] = {}
        for _, url, _, _ in batch:
            by_shard.setdefault(shard_of(url, len(self.seen)), []).append(url)
        ray.get([self.seen[s].mark_issued.remote(us) for s, us in by_shard.items()])

        # dispatch chunks to the worker pool. visit_seq is assigned in the
        # deterministic batch order FIRST; the dispatch order is then
        # locality-sorted by corpus page index so each worker's point-take
        # touches contiguous row groups (ordering is a data property —
        # the audit table is re-sorted by visit_seq after the gather).
        entries = [
            (self.visited + k, url, host, depth)
            for k, (seq, url, host, depth) in enumerate(batch)
        ]
        entries.sort(key=lambda e: e[1].rpartition("/")[2])
        W = len(self.workers)
        chunk = min(self.cfg.max_chunk, max(1, -(-len(entries) // W)))
        futures = []
        for c, start in enumerate(range(0, len(entries), chunk)):
            futures.append(
                self.workers[c % W].process.remote(entries[start : start + chunk], wave)
            )
        parts = ray.get(futures)
        audit = pa.concat_tables([p[0] for p in parts]) if parts else AUDIT_SCHEMA.empty_table()
        if audit.num_rows:
            import pyarrow.compute as pc

            audit = audit.take(pc.sort_indices(audit.column("visit_seq")))
        cands = pa.concat_tables([p[1] for p in parts]) if parts else CANDIDATE_SCHEMA.empty_table()
        rejects = pa.concat_tables([p[2] for p in parts]) if parts else REJECT_SCHEMA.empty_table()

        admitted = self._admit(
            cands.column("url").to_pylist(),
            cands.column("host").to_pylist(),
            cands.column("depth").to_pylist(),
            cands.column("priority").to_pylist(),
            cands.column("order_key").to_pylist(),
            wave,
        )

        self.visited += len(batch)
        self.audit_tables.append(audit)
        self.reject_tables.append(rejects)
        self.admitted_tables.append(admitted)
        metrics = {
            "wave": wave,
            "issued": len(batch),
            "candidates": cands.num_rows,
            "admitted": admitted.num_rows,
            "rejected": rejects.num_rows,
            "visited_total": self.visited,
        }
        self.wave_metrics.append(metrics)

        if self.cfg.checkpoint_dir:
            d = os.path.join(self.cfg.checkpoint_dir, "waves", f"wave={wave:05d}")
            write_table(audit, os.path.join(d, "audit.parquet"))
            write_table(admitted, os.path.join(d, "admitted.parquet"))
            write_table(rejects, os.path.join(d, "rejects.parquet"))
            self._write_state(os.path.join(d, "state.json"), metrics)
        self.wave += 1
        return True

    def _write_state(self, path: str, extra: dict) -> None:
        seen_stats = ray.get([s.stats.remote() for s in self.seen])
        frontier_stats = ray.get([f.stats.remote() for f in self.frontier])
        state = {
            "visited": self.visited,
            "wave": self.wave,
            "next_seq": self.next_seq,
            "seen_shards": seen_stats,
            "frontier_shards": frontier_stats,
            **extra,
        }
        tmp = path + ".tmp"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, path)

    # ------------------------------------------------------------------
    def resume(self) -> bool:
        """Rebuild actor + driver state from committed waves. Returns True
        if a checkpoint was found."""
        ck = self.cfg.checkpoint_dir
        seeds_state = os.path.join(ck, "seeds", "state.json")
        if not os.path.exists(seeds_state):
            return False
        admitted_tables = [read_table(os.path.join(ck, "seeds", "admitted.parquet"))]
        seed_rej = os.path.join(ck, "seeds", "rejects.parquet")
        if os.path.exists(seed_rej):
            self.seed_rejects = read_table(seed_rej).to_pylist()
        waves_dir = os.path.join(ck, "waves")
        waves = []
        if os.path.isdir(waves_dir):
            for name in sorted(os.listdir(waves_dir)):
                d = os.path.join(waves_dir, name)
                if os.path.exists(os.path.join(d, "state.json")):  # committed
                    waves.append(d)
        issued: set[str] = set()
        for d in waves:
            audit = read_table(os.path.join(d, "audit.parquet"))
            self.audit_tables.append(audit)
            self.reject_tables.append(read_table(os.path.join(d, "rejects.parquet")))
            admitted_tables.append(read_table(os.path.join(d, "admitted.parquet")))
            issued.update(audit.column("url").to_pylist())
            with open(os.path.join(d, "state.json")) as f:
                self.wave_metrics.append(json.load(f))
        self.admitted_tables = admitted_tables
        all_admitted = pa.concat_tables(admitted_tables)
        self.visited = sum(t.num_rows for t in self.audit_tables)
        self.wave = len(waves)
        self.next_seq = (
            max(all_admitted.column("discovered_seq").to_pylist()) + 1
            if all_admitted.num_rows
            else 0
        )
        # restore seen shards (url → issued flag)
        S = len(self.seen)
        per_shard: dict[int, tuple[list, list]] = {}
        for u in all_admitted.column("url").to_pylist():
            us, fl = per_shard.setdefault(shard_of(u, S), ([], []))
            us.append(u)
            fl.append(u in issued)
        ray.get(
            [self.seen[s].restore.remote(us, fl) for s, (us, fl) in per_shard.items()]
        )
        # restore frontier: admitted entries not yet issued
        F = len(self.frontier)
        adds: dict[int, tuple[list, list]] = {}
        for row in all_admitted.to_pylist():
            if row["url"] in issued:
                continue
            fs = owner_shard(row["host"], F)
            ent, pri = adds.setdefault(fs, ([], []))
            ent.append((row["discovered_seq"], row["url"], row["host"], row["depth"]))
            pri.append(row["priority"])
        ray.get([self.frontier[s].add.remote(ent, pri) for s, (ent, pri) in adds.items()])
        return True

    def result(self) -> CrawlResult:
        audit = (
            pa.concat_tables(self.audit_tables)
            if self.audit_tables
            else AUDIT_SCHEMA.empty_table()
        )
        rejects = [rows_to_table(self.seed_rejects, REJECT_SCHEMA)] + self.reject_tables
        nonempty = [t for t in rejects if t.num_rows > 0]
        rejected = pa.concat_tables(nonempty) if nonempty else REJECT_SCHEMA.empty_table()
        admitted = (
            pa.concat_tables(self.admitted_tables)
            if self.admitted_tables
            else ADMITTED_SCHEMA.empty_table()
        )
        seen_snap = ray.get([s.snapshot.remote() for s in self.seen])
        seen = set()
        for urls, _flags in seen_snap:
            seen.update(urls)
        seen_stats = ray.get([s.stats.remote() for s in self.seen])
        frontier_stats = ray.get([f.stats.remote() for f in self.frontier])
        stats = {
            "visited": self.visited,
            "waves": self.wave,
            "total_found": admitted.num_rows,
            "total_duplicates": sum(s["duplicates"] for s in seen_stats),
            "seen": sum(s["seen"] for s in seen_stats),
            "frontier_remaining": sum(
                s["priority_queue"] + s["normal_queue"] for s in frontier_stats
            ),
        }
        return CrawlResult(audit, rejected, admitted, seen, stats, self.wave_metrics)

    def shutdown(self) -> None:
        for a in self.seen + self.frontier + self.workers:
            ray.kill(a)


def audit_dataset_from_checkpoint(checkpoint_dir: str):
    """Streaming Dataset over the checkpointed audit (one parquet per
    wave) — the scale path for post-crawl analytics: at 10^10 URLs the
    audit never lives as a driver table; finalize/report read it from
    the wave partitions with normal Ray Data streaming."""
    import glob

    import ray.data as rd

    paths = sorted(glob.glob(os.path.join(checkpoint_dir, "waves", "wave=*", "audit.parquet")))
    return rd.read_parquet(paths)


def run_crawl(
    spec: CrawlSpec,
    corpus_dir: str | None = None,
    cfg: EngineConfig | None = None,
    resume: bool = False,
    stop_after_wave: int | None = None,
) -> CrawlResult:
    """Run (or resume) the crawl; Ray must already be initialized by the
    caller (driver contract). ``stop_after_wave`` simulates interruption
    for resume tests."""
    cfg = cfg or EngineConfig()
    eng = _Engine(spec, corpus_dir, cfg)
    try:
        resumed = False
        if resume and cfg.checkpoint_dir:
            resumed = eng.resume()
        if not resumed:
            eng.seed()
        while eng.visited < spec.max_urls:
            if stop_after_wave is not None and eng.wave >= stop_after_wave:
                break
            if not eng.run_wave():
                break
        return eng.result()
    finally:
        eng.shutdown()
