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
    entry_rows,
    rows_to_table,
)
from ..state.frontier import FrontierShard, owner_shard, take_wave_table
from ..state.seen import SeenShard
from ..storage import read_table, write_table
from ..web import link_rank, robots_allows

ADMITTED_SCHEMA = pa.schema(
    [
        ("discovered_seq", pa.int64()),
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.bool_()),
        ("rank", pa.float64()),
        ("wave", pa.int32()),
    ]
)


@dataclass
class EngineConfig:
    num_seen_shards: int = 4
    # URL-seen prefilter variant (north_rule "Bloom/cuckoo"): "bloom"
    # (default) or "cuckoo" (state/cuckoo.py — supports deletion for
    # recrawl-TTL eviction; admission semantics identical either way)
    seen_prefilter: str = "bloom"
    num_frontier_shards: int = 4
    num_workers: int = 4
    worker_num_cpus: float = 1.0
    frontier_salt: int = 1  # >1 spreads each host's queue over k sub-shards (hot-host split)
    checkpoint_dir: str | None = None
    verify_images: bool = True
    psnr_every: int = 1  # full-PSNR sample stride (1 = every page)
    max_chunk: int = 512  # max entries per worker call
    # straggler containment (reference core/crawler.py:120 future.result
    # timeout=30): a worker chunk exceeding this wall-clock bound is
    # killed, its worker replaced, and its entries become ERROR rows —
    # a hung node can no longer stall the wave barrier. None = off.
    chunk_timeout_sec: float | None = 300.0


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
        # deferred frontier add_arrow futures (fired without a barrier;
        # harvested at the next wave's start so failures surface loudly)
        self._frontier_pending: list = []
        spec_dict = {
            "n_pages": spec.n_pages,
            "max_depth": spec.max_depth,
            "scope": (spec.scope.kind, spec.scope.value),
            "priority_patterns": spec.priority_patterns,
            "detect_invisible_colors": spec.detect_invisible_colors,
            "verify_images": cfg.verify_images,
            "psnr_every": cfg.psnr_every,
            "robots": spec.robots_deny_prefixes,
            "synthetic_robots": spec.synthetic_robots,
            "link_score": spec.link_score,
            "num_seen_shards": cfg.num_seen_shards,
            "num_frontier_shards": cfg.num_frontier_shards,
            "frontier_salt": cfg.frontier_salt,
            "max_retries": spec.max_retries,
            "fault_rate": spec.fault_rate,
            "synthetic_hang": spec.synthetic_hang,
        }
        self._spec_dict = spec_dict  # kept for straggler worker replacement
        self.seen = [
            SeenShard.remote(i, prefilter=cfg.seen_prefilter)
            for i in range(cfg.num_seen_shards)
        ]
        self.frontier = [FrontierShard.remote(i) for i in range(cfg.num_frontier_shards)]
        self.workers = [
            PageWorker.options(num_cpus=cfg.worker_num_cpus).remote(
                corpus_dir, spec_dict, self.seen
            )
            for _ in range(cfg.num_workers)
        ]
        self._chunk_key = 0  # unique id per chunk DISPATCH ATTEMPT
        self.visited = 0
        self.wave = 0
        self.next_seq = 0
        self.audit_tables: list[pa.Table] = []
        self.reject_tables: list[pa.Table] = []
        self.admitted_tables: list[pa.Table] = []
        self.wave_metrics: list[dict] = []
        self.seed_rejects: list[dict] = []
        self.host_stats: dict[str, list] = {}  # host -> [visits, errors]
        self._committer = None
        self._commit_error: BaseException | None = None
        from ..web import RobotsCache

        self._robots = (
            RobotsCache(spec.robots_deny_prefixes, spec.synthetic_robots)
            if (spec.robots_deny_prefixes or spec.synthetic_robots)
            else None
        )

    # ------------------------------------------------------------------
    def _admit(self, cands: pa.Table, wave: int) -> pa.Table:
        """Order-aware admission via seen shards → frontier adds.

        ``cands`` follows CANDIDATE_SCHEMA (shard routing precomputed by
        the workers, so this merge does no hashing). Returns the
        admitted entries (ADMITTED_SCHEMA) in discovery order.
        """
        import numpy as np

        if cands.num_rows == 0:
            return ADMITTED_SCHEMA.empty_table()
        sh = cands.column("seen_shard").to_numpy()
        keys = cands.column("order_key").to_numpy()
        futures = {}
        idx_by_shard: dict[int, np.ndarray] = {}
        narrow = cands.select(["url", "order_key"])
        for s in np.unique(sh):
            ks = np.flatnonzero(sh == s)
            idx_by_shard[int(s)] = ks
            # ship an Arrow slice; the shard pays the python conversion
            futures[int(s)] = self.seen[int(s)].admit_arrow.remote(
                narrow.take(pa.array(ks))
            )
        positions: list[int] = []
        for s, ks in idx_by_shard.items():
            got = ray.get(futures[s])
            positions.extend(ks[got].tolist() if len(got) else [])
        pos = np.asarray(positions, dtype=np.int64)
        pos = pos[np.argsort(keys[pos], kind="stable")]
        return self._register_admitted(cands, pos, wave)

    def _register_admitted(self, cands: pa.Table, pos, wave: int) -> pa.Table:
        """Shared admission tail for _admit/_admit_buffered: take the
        winning rows (already in global order-key order), assign
        discovery seqs, build the ADMITTED table, feed the frontier
        shards (Arrow slices out, tuple building in the shard)."""
        import numpy as np

        adm = cands.take(pa.array(pos))
        n = adm.num_rows
        seqs = np.arange(self.next_seq, self.next_seq + n, dtype=np.int64)
        self.next_seq += n
        admitted = pa.table(
            {
                "discovered_seq": pa.array(seqs),
                "url": adm.column("url"),
                "host": adm.column("host"),
                "depth": adm.column("depth"),
                "priority": adm.column("priority"),
                "rank": adm.column("rank"),
                "wave": pa.array(np.full(n, wave, dtype=np.int32)),
            },
            schema=ADMITTED_SCHEMA,
        )
        fsh = adm.column("frontier_shard").to_numpy()
        ftbl = pa.table(
            {
                "rank": adm.column("rank"),
                "seq": pa.array(seqs),
                "url": adm.column("url"),
                "host": adm.column("host"),
                "depth": adm.column("depth"),
                "sshard": adm.column("seen_shard"),
            }
        )
        # fire-and-forget: the driver is the sole caller of these actors,
        # and Ray orders calls per (caller, actor) — the next wave's
        # peek_arrow on each shard is guaranteed to execute after this
        # add_arrow, so no barrier is needed here (the refs are retained
        # so a shard failure still surfaces at the next synchronous call)
        self._frontier_pending = [
            self.frontier[int(s)].add_arrow.remote(
                ftbl.take(pa.array(np.flatnonzero(fsh == s)))
            )
            for s in np.unique(fsh)
        ]
        return admitted

    def _admit_pushed(self, wave: int) -> pa.Table:
        """Wave-barrier admission over the worker-pushed candidate
        buffers (P2P shuffle): every shard probes+registers its buffered
        slices and returns only its WINNING rows (finalize_wave_full),
        so the driver's work here is O(admitted), not O(candidates).
        Result is bit-identical to the driver-routed _admit() —
        min-order-key-wins is commutative."""
        import numpy as np

        wins = [
            w
            for w in ray.get([s.finalize_wave_full.remote() for s in self.seen])
            if w is not None and w.num_rows
        ]
        if not wins:
            return ADMITTED_SCHEMA.empty_table()
        cands = wins[0] if len(wins) == 1 else pa.concat_tables(wins)
        pos = np.argsort(cands.column("order_key").to_numpy(), kind="stable")
        return self._register_admitted(cands, pos, wave)

    def seed(self) -> None:
        """Seed admission — the reference add_url path for the start URL
        (core/crawler.py:55, priority=True in smart mode)."""
        smart = (
            self.spec.priority_patterns is not None or self.spec.link_score is not None
        )
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
            if not robots_allows(c, self._robots):
                self.seed_rejects.append(
                    {"url": c, "reason": "ROBOTS", "details": "", "wave": -1}
                )
                continue
            urls.append(c)
            hosts.append(c.partition("://")[2].partition("/")[0])
            depths.append(0)
            pris.append(smart)
            keys.append(k)
        cands = rows_to_table(
            [
                {
                    "url": urls[i],
                    "host": hosts[i],
                    "depth": depths[i],
                    "order_key": keys[i],
                    "priority": pris[i],
                    "rank": link_rank(depths[i], pris[i], self.spec.link_score),
                    "seen_shard": shard_of(urls[i], len(self.seen)),
                    "frontier_shard": owner_shard(
                        hosts[i], len(self.frontier), urls[i], self.cfg.frontier_salt
                    ),
                }
                for i in range(len(urls))
            ],
            CANDIDATE_SCHEMA,
        )
        t = self._admit(cands, wave=-1)
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
        import time as _time

        t_phase = _time.perf_counter
        t0 = t_phase()
        if self._frontier_pending:
            # surface any failed add_arrow from the previous wave before
            # taking from the shards (the calls themselves are already
            # ordered ahead of this wave's peeks by Ray's per-caller
            # actor-call ordering; this get is normally instantaneous)
            ray.get(self._frontier_pending)
            self._frontier_pending = []
        budget = min(self.spec.batch_size, self.spec.max_urls - self.visited)
        if budget <= 0:
            return False
        offsets = None
        ahp = self.spec.adaptive_host_priority
        if ahp:
            pen = ahp.get("error_penalty", 0.0)
            offsets = {
                h: pen * st[1] / st[0] for h, st in self.host_stats.items() if st[1]
            }
        import numpy as np
        import pyarrow.compute as pc

        batch_tbl = take_wave_table(
            self.frontier,
            budget,
            self.spec.politeness_per_wave,
            self.cfg.frontier_salt,
            offsets,
        )
        t_take = t_phase() - t0
        n_batch = batch_tbl.num_rows
        if not n_batch:
            return False
        wave = self.wave

        # mark issued before link intake (core/crawler.py:207 semantics);
        # the seen-shard id rode through the frontier — no re-hashing,
        # and the grouping is a numpy mask, not a Python row loop
        sshard_np = batch_tbl.column("sshard").to_numpy()
        url_col = batch_tbl.column("url")
        # no barrier needed: Ray orders actor calls per caller, so each
        # shard sees mark_issued before this wave's admit
        for s in np.unique(sshard_np):
            self.seen[int(s)].mark_issued.remote(
                url_col.take(pa.array(np.flatnonzero(sshard_np == s))).combine_chunks()
            )
        t_issue = t_phase() - t0 - t_take

        # dispatch chunks to the worker pool. visit_seq is assigned in the
        # deterministic batch order FIRST; the dispatch order is then
        # locality-sorted by corpus page filename so each worker's
        # point-take touches contiguous row groups (ordering is a data
        # property — the audit table is re-sorted by visit_seq after the
        # gather). The wave stays COLUMNAR end to end on the driver:
        # chunks are Arrow takes, and the per-row tuple materialization
        # happens inside the (parallel) workers — the r3 tuple-building
        # + list.sort here cost ~70 ms of serial driver time per
        # 16k-row wave while every worker idled at the barrier.
        etbl = pa.table(
            {
                "visit_seq": pa.array(
                    np.arange(self.visited, self.visited + n_batch, dtype=np.int64)
                ),
                "url": url_col,
                "host": batch_tbl.column("host"),
                "depth": batch_tbl.column("depth"),
            }
        )
        fname = pc.replace_substring_regex(url_col, pattern="^.*/", replacement="")
        loc_order = pc.sort_indices(fname).to_numpy()
        W = len(self.workers)
        # ~3 chunks per worker, dispatched 2-deep (one running + one
        # queued per actor): a completion never idles the worker while
        # the driver deserializes its result and re-feeds — at 32 CPUs
        # chunks complete every ~10 ms and the 1-deep r2 loop put a
        # driver-latency bubble after every one. The undispatched third
        # keeps dynamic balance: stragglers get fed less instead of
        # stalling the wave barrier.
        DEPTH = 2
        ckpt = self.cfg.checkpoint_dir
        wave_dir = os.path.join(ckpt, "waves", f"wave={wave:05d}") if ckpt else None
        # guided self-scheduling: chunk sizes DECAY (each ≈ remaining/3W,
        # floored at 64, capped at max_chunk) so the wave tail is bounded
        # by one SMALL chunk instead of one ~n/3W chunk — at 30 workers a
        # flat n/3W split left the barrier waiting ~178 heavy PSNR rows
        # on the slowest worker (~17% of the wave) while the rest idled;
        # the decaying tail cuts that to ≤64 rows at ~25% more dispatches
        chunks = []
        start = 0
        while start < n_batch:
            size = min(
                self.cfg.max_chunk,
                max(64, -(-(n_batch - start) // (W * 3))),
            )
            # take (not slice): a slice pickles the WHOLE backing buffer
            # (~800 KB per 178-row chunk); take materializes compact
            # chunk-sized buffers (~9 KB)
            chunks.append(
                (len(chunks), etbl.take(pa.array(loc_order[start : start + size])))
            )
            start += size
        parts: list = [None] * len(chunks)
        pending: dict = {}  # future -> (chunk_idx, worker_idx, chunk_key)
        deadline: dict = {}  # future -> monotonic deadline
        inflight = [0] * W
        queue = list(chunks)
        tmo = self.cfg.chunk_timeout_sec
        dead_keys: list[int] = []  # killed dispatch attempts → shard-buffer drop

        def dispatch(widx):
            c, ent = queue.pop(0)
            audit_out = (
                os.path.join(wave_dir, f"audit-{c:03d}.parquet") if wave_dir else None
            )
            self._chunk_key += 1
            fut = self.workers[widx].process.remote(ent, wave, audit_out, self._chunk_key)
            pending[fut] = (c, widx, self._chunk_key)
            inflight[widx] += 1
            if tmo is not None:
                deadline[fut] = _time.monotonic() + tmo

        # breadth-first initial fill: every worker gets its first chunk
        # before any worker gets a second
        for _ in range(DEPTH):
            for widx in range(W):
                if queue and inflight[widx] < DEPTH:
                    dispatch(widx)
        while pending or queue:
            if not pending:  # all inflight recovered/requeued — refill
                for widx in range(W):
                    while queue and inflight[widx] < DEPTH:
                        dispatch(widx)
                continue
            # one completion per wait: an A/B probe of a "block then
            # drain the rest at timeout=0" variant measured SLOWER —
            # completions arrive ~12 ms apart, so the drain's second
            # O(pending) registration pass runs per completion, not per
            # burst, doubling the wait overhead for nothing
            if tmo is None:
                done, _ = ray.wait(list(pending), num_returns=1)
            else:
                wait_t = max(
                    0.05, min(deadline[f] for f in pending) - _time.monotonic()
                )
                done, _ = ray.wait(list(pending), num_returns=1, timeout=wait_t)
            if done:
                c, widx, _key = pending.pop(done[0])
                deadline.pop(done[0], None)
                inflight[widx] -= 1
                if queue:  # re-feed the freed slot BEFORE the gets —
                    dispatch(widx)  # driver-side work must not idle it
                parts[c] = ray.get(done[0])
                continue
            # straggler containment: kill the hung worker FIRST (so it
            # can't race our error-chunk write), replace it, convert the
            # chunk's entries to ERROR rows (reference core/crawler.py:
            # 120,129-134 — a timeout burns budget, never stalls the wave)
            now = _time.monotonic()
            for f in [f for f in list(pending) if deadline.get(f, now + 1) <= now]:
                if f not in pending:  # recovered below as a same-worker sibling
                    continue
                c, widx, key = pending.pop(f)
                deadline.pop(f, None)
                ray.kill(self.workers[widx], no_restart=True)
                # ray.kill is async — fetch the future AFTER the kill to
                # close the race with a worker finishing right at the
                # deadline: a normal return means the chunk completed
                # (its audit write landed, its candidate pushes are
                # acked) and is used as-is; an actor error confirms the
                # worker is DEAD, so the ERROR-chunk write below can no
                # longer be overwritten by it and any PARTIAL candidate
                # pushes it made must be dropped (dead_keys)
                try:
                    parts[c] = ray.get(f)
                except (ray.exceptions.RayActorError, ray.exceptions.RayTaskError):
                    parts[c] = self._timeout_chunk(chunks[c][1], wave, wave_dir, c)
                    dead_keys.append(key)
                # the killed worker's OTHER inflight chunk (2-deep) was
                # queued behind the hung one: if it finished before the
                # kill landed its result is used as-is, otherwise it
                # never ran — requeue it for a healthy worker under a
                # FRESH chunk key (only the hung chunk itself becomes
                # ERROR rows; the old attempt's key joins the drop list
                # in case any partial pushes landed)
                for f2 in [x for x in list(pending) if pending[x][1] == widx]:
                    c2, _, key2 = pending.pop(f2)
                    deadline.pop(f2, None)
                    try:
                        parts[c2] = ray.get(f2)
                    except (ray.exceptions.RayActorError, ray.exceptions.RayTaskError):
                        dead_keys.append(key2)
                        queue.append(chunks[c2])
                self.workers[widx] = PageWorker.options(
                    num_cpus=self.cfg.worker_num_cpus
                ).remote(self.corpus_dir, self._spec_dict, self.seen)
                inflight[widx] = 0
                while queue and inflight[widx] < DEPTH:
                    dispatch(widx)
        if wave_dir is None:
            audit = (
                pa.concat_tables([p[0] for p in parts])
                if parts
                else AUDIT_SCHEMA.empty_table()
            )
            if audit.num_rows:
                import pyarrow.compute as pc

                audit = audit.take(pc.sort_indices(audit.column("visit_seq")))
        else:
            audit = None  # workers wrote their chunks directly (parallel sink)
        t_workers = t_phase() - t0 - t_take - t_issue
        rejects = pa.concat_tables([p[2] for p in parts]) if parts else REJECT_SCHEMA.empty_table()
        n_candidates = sum(p[4] for p in parts)
        if self.spec.adaptive_host_priority:
            # fold per-chunk host partials (combiner merge between waves)
            for ptbl in parts:
                hstats = ptbl[3]
                for h, v, er in zip(
                    hstats.column("host").to_pylist(),
                    hstats.column("visits").to_pylist(),
                    hstats.column("errors").to_pylist(),
                ):
                    st = self.host_stats.setdefault(h, [0, 0])
                    st[0] += v
                    st[1] += er

        if dead_keys:
            ray.get([s.drop_chunks.remote(dead_keys) for s in self.seen])
        admitted = self._admit_pushed(wave)

        t_admit = t_phase() - t0 - t_take - t_issue - t_workers
        self.visited += n_batch
        if audit is not None:
            self.audit_tables.append(audit)
        self.reject_tables.append(rejects)
        self.admitted_tables.append(admitted)
        metrics = {
            "wave": wave,
            "issued": n_batch,
            "candidates": n_candidates,
            "admitted": admitted.num_rows,
            "rejected": rejects.num_rows,
            "visited_total": self.visited,
            "t_take": round(t_take, 4),
            "t_issue": round(t_issue, 4),
            "t_workers": round(t_workers, 4),
            "t_admit": round(t_admit, 4),
        }
        self.wave_metrics.append(metrics)

        if wave_dir is not None:
            # commit the wave OFF the critical path: the admitted/rejects
            # writes + the state.json commit marker (which gathers shard
            # stats) don't gate the next wave's frontier take — actor
            # state is already updated. A crash before the background
            # commit lands just re-runs this wave on resume (the commit
            # marker is still written last, atomically). Commits flow
            # through a single consumer thread (ordered markers) with a
            # small bounded backlog, so a commit that outlasts one wave
            # no longer stalls the loop (round 2 serialized commits at
            # each wave boundary — 1.5-2 s/wave of barrier at 32 CPUs on
            # 16k waves); memory stays bounded because the audit chunks
            # are already on disk and a queued job holds only the small
            # admitted/rejects tables.
            # stats futures are SUBMITTED here, at the wave boundary —
            # Ray orders calls per caller per actor, so the shards
            # evaluate them before the next wave's mark_issued/admit and
            # the committed counters are exact even though the ray.get
            # happens in the background thread
            stats_futs = (
                [s.stats.remote() for s in self.seen],
                [f.stats.remote() for f in self.frontier],
            )
            snapshot = {
                "visited": self.visited,
                "wave": self.wave,
                "next_seq": self.next_seq,
            }
            self._submit_commit(
                wave_dir, admitted, rejects, dict(metrics), snapshot, stats_futs
            )
        t_commit = t_phase() - t0 - t_take - t_issue - t_workers - t_admit
        metrics["t_commit_dispatch"] = round(t_commit, 4)
        self.wave += 1
        return True

    def _commit_wave(
        self, wave_dir: str, admitted, rejects, metrics: dict, snapshot: dict, stats_futs
    ) -> None:
        write_table(admitted, os.path.join(wave_dir, "admitted.parquet"))
        write_table(rejects, os.path.join(wave_dir, "rejects.parquet"))
        # compact this wave's per-chunk audit files into one before the
        # commit marker: the straggler-sized chunks (2×workers/wave) are
        # the right SCHEDULING unit but a terrible FILE unit — hundreds
        # of ~50-row parquet files per run made every downstream read
        # (result(), resume, report) metadata-bound. Runs on the
        # background commit thread (barrier-idle driver cycles); a crash
        # mid-merge leaves an uncommitted wave that resume() re-runs.
        _merge_wave_audit(wave_dir)
        # state.json is the commit marker — written last, atomically
        self._write_state(
            os.path.join(wave_dir, "state.json"), metrics, snapshot, stats_futs
        )

    def _submit_commit(self, *job) -> None:
        """Enqueue a wave commit on the single committer thread.

        A failed commit (disk full, I/O error) must surface at the next
        wave or at result(), not vanish with the daemon thread —
        otherwise the wave's audit rows silently drop out of
        committed_audit_paths() while stats still count them. After an
        error the consumer skips all later jobs: committing wave N+1's
        marker with wave N's missing would leave a gap a resume cannot
        interpret. Backlog is capped at 3 pending commits (the disk sink
        is the true bound; queued jobs hold only the small
        admitted/rejects tables — the audit chunks are already on disk)."""
        import queue as _queue
        import threading

        self._raise_commit_error()
        if getattr(self, "_committer", None) is None:
            self._commit_q: "_queue.Queue" = _queue.Queue()
            self._committer = threading.Thread(target=self._committer_loop, daemon=True)
            self._committer.start()
        self._commit_q.put(job)
        import time as _time

        while self._commit_q.qsize() > 3 and self._commit_error is None:
            _time.sleep(0.005)
        self._raise_commit_error()

    def _committer_loop(self) -> None:
        while True:
            job = self._commit_q.get()
            try:
                if job is None:
                    return
                if self._commit_error is None:
                    try:
                        self._commit_wave(*job)
                    except BaseException as ex:  # surfaced by _raise_commit_error
                        self._commit_error = ex
            finally:
                self._commit_q.task_done()

    def _raise_commit_error(self) -> None:
        err = getattr(self, "_commit_error", None)
        if err is not None:
            self._commit_error = None
            raise RuntimeError("wave checkpoint commit failed") from err

    def _join_commit(self) -> None:
        t = getattr(self, "_committer", None)
        if t is not None and t.is_alive():
            self._commit_q.put(None)
            t.join()
        self._committer = None
        self._raise_commit_error()

    def _timeout_chunk(self, entries: list, wave: int, wave_dir: str | None, c: int):
        """Synthesize the (audit, candidates, rejects, host_stats,
        n_candidates) result for a chunk whose worker blew the straggler
        deadline: every entry becomes an ERROR row (no links), exactly
        the reference's _create_error_result shape for a timed-out
        future."""
        from ..web import build_audit_row

        rows = []
        hs: dict[str, list] = {}
        for seq, url, host, depth in entry_rows(entries):
            row = build_audit_row(
                url,
                depth,
                {
                    "page_index": -1,
                    "status_code": "ERROR",
                    "error_details": f"chunk timeout after {self.cfg.chunk_timeout_sec}s",
                    "content_type": "",
                    "final_url": url,
                    "response_time_ms": 0.0,
                    "content_length": 0,
                    "links": [],
                },
            )
            row.update(visit_seq=seq, wave=wave, host=host, links_count=0)
            rows.append(row)
            st = hs.setdefault(host, [0, 0])
            st[0] += 1
            st[1] += 1
        audit = rows_to_table(rows, AUDIT_SCHEMA)
        host_stats = pa.table(
            {
                "host": pa.array(list(hs.keys()), pa.string()),
                "visits": pa.array([v[0] for v in hs.values()], pa.int64()),
                "errors": pa.array([v[1] for v in hs.values()], pa.int64()),
            }
        )
        if wave_dir is not None:
            write_table(audit, os.path.join(wave_dir, f"audit-{c:03d}.parquet"))
            audit = None
        return (
            audit,
            CANDIDATE_SCHEMA.empty_table(),
            REJECT_SCHEMA.empty_table(),
            host_stats,
            0,
        )

    def _write_state(
        self, path: str, extra: dict, snapshot: dict | None = None, stats_futs=None
    ) -> None:
        if stats_futs is None:
            stats_futs = (
                [s.stats.remote() for s in self.seen],
                [f.stats.remote() for f in self.frontier],
            )
        seen_stats = ray.get(stats_futs[0])
        frontier_stats = ray.get(stats_futs[1])
        state = {
            **(snapshot or {
                "visited": self.visited,
                "wave": self.wave,
                "next_seq": self.next_seq,
            }),
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
            import shutil as _shutil

            for name in sorted(os.listdir(waves_dir)):
                d = os.path.join(waves_dir, name)
                if os.path.exists(os.path.join(d, "state.json")):  # committed
                    waves.append(d)
                else:
                    # interrupted wave: its dir may hold stale worker
                    # audit chunks that would survive a re-run with a
                    # different chunking — drop it before re-running the
                    # wave under the same number (ADVICE r01)
                    _shutil.rmtree(d, ignore_errors=True)
        import glob as _glob

        issued: set[str] = set()
        self.visited = 0
        for d in waves:
            for ap in sorted(_glob.glob(os.path.join(d, "audit*.parquet"))):
                t = read_table(ap, columns=["url", "host", "status_code"])
                urls = t.column("url").to_pylist()
                issued.update(urls)
                self.visited += len(urls)
                if self.spec.adaptive_host_priority:
                    for h, sc in zip(
                        t.column("host").to_pylist(), t.column("status_code").to_pylist()
                    ):
                        st = self.host_stats.setdefault(h, [0, 0])
                        st[0] += 1
                        if sc != "200":
                            st[1] += 1
            self.reject_tables.append(read_table(os.path.join(d, "rejects.parquet")))
            admitted_tables.append(read_table(os.path.join(d, "admitted.parquet")))
            with open(os.path.join(d, "state.json")) as f:
                self.wave_metrics.append(json.load(f))
        self.admitted_tables = admitted_tables
        all_admitted = pa.concat_tables(admitted_tables)
        self.wave = len(waves)
        self.next_seq = (
            max(all_admitted.column("discovered_seq").to_pylist()) + 1
            if all_admitted.num_rows
            else 0
        )
        # restore seen shards (url → issued flag) + per-shard duplicate
        # counters from the last committed state.json, so stats of an
        # interrupted+resumed crawl equal an uninterrupted one (ADVICE r01)
        if self.wave_metrics:
            last_state = self.wave_metrics[-1]
        else:  # only the seed wave committed — its state.json has stats too
            with open(seeds_state) as f:
                last_state = json.load(f)
        dup_by_shard = {
            s.get("shard"): s.get("duplicates", 0)
            for s in last_state.get("seen_shards", [])
        }
        S = len(self.seen)
        per_shard: dict[int, tuple[list, list]] = {}
        for u in all_admitted.column("url").to_pylist():
            us, fl = per_shard.setdefault(shard_of(u, S), ([], []))
            us.append(u)
            fl.append(u in issued)
        ray.get(
            [
                self.seen[s].restore.remote(us, fl, dup_by_shard.get(s, 0))
                for s, (us, fl) in per_shard.items()
            ]
        )
        # restore frontier: admitted entries not yet issued
        F = len(self.frontier)
        adds: dict[int, list] = {}
        for row in all_admitted.to_pylist():
            if row["url"] in issued:
                continue
            fs = owner_shard(row["host"], F, row["url"], self.cfg.frontier_salt)
            adds.setdefault(fs, []).append(
                (row["rank"], row["discovered_seq"], row["url"], row["host"],
                 row["depth"], shard_of(row["url"], len(self.seen)))
            )
        ray.get([self.frontier[s].add.remote(ent) for s, ent in adds.items()])
        return True

    def result(self) -> CrawlResult:
        self._join_commit()  # the last wave's background commit must land
        if self._frontier_pending:
            ray.get(self._frontier_pending)  # surface any last-wave add failure
            self._frontier_pending = []
        # launch the shard snapshots FIRST so the actors serialize their
        # state while the driver reads audit chunks (overlapped, not
        # sequential — result() was ~40% of the skew-bench wall)
        snap_futs = [s.snapshot.remote() for s in self.seen]
        if self.cfg.checkpoint_dir:
            # workers wrote audit chunks straight to the checkpoint;
            # read back (test/bench scale — at cluster scale consumers
            # use audit_dataset_from_checkpoint and never materialize)
            paths = committed_audit_paths(self.cfg.checkpoint_dir)
            if paths:
                from concurrent.futures import ThreadPoolExecutor

                import pyarrow.compute as pc
                import pyarrow.parquet as pq

                # pq.read_table releases the GIL — threads turn ~200
                # serial chunk reads into a parallel scan
                with ThreadPoolExecutor(max_workers=16) as pool:
                    tables = list(pool.map(pq.read_table, paths))
                audit = pa.concat_tables(tables)
                audit = audit.take(pc.sort_indices(audit.column("visit_seq")))
            else:
                audit = AUDIT_SCHEMA.empty_table()
        else:
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
        seen_snap = ray.get(snap_futs)
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
            "frontier_remaining": sum(s["queued"] for s in frontier_stats),
        }
        return CrawlResult(audit, rejected, admitted, seen, stats, self.wave_metrics)

    def shutdown(self) -> None:
        self._join_commit()  # don't kill actors under a pending stats gather
        for a in self.seen + self.frontier + self.workers:
            ray.kill(a)


def committed_audit_paths(checkpoint_dir: str) -> list[str]:
    """Audit chunk paths from COMMITTED waves only. ``state.json`` is the
    commit marker (written last, atomically); a wave dir without it may
    hold stale worker-written chunks from an interrupted wave — readers
    that glob blindly would double-count those rows after a resume with
    a different chunking (ADVICE r01)."""
    import glob

    paths: list[str] = []
    for d in sorted(glob.glob(os.path.join(checkpoint_dir, "waves", "wave=*"))):
        if os.path.exists(os.path.join(d, "state.json")):
            paths.extend(sorted(glob.glob(os.path.join(d, "audit*.parquet"))))
    return paths


def _merge_wave_audit(wave_dir: str) -> int:
    """Merge one wave's audit-NNN.parquet chunks into audit-merged
    (sorted by visit_seq), then remove the chunks. The merged file is
    published atomically (write_table tmp+rename) before any chunk is
    removed, and readers glob ``audit*.parquet`` either way. Returns
    the number of chunk files removed."""
    import glob

    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    chunks = sorted(glob.glob(os.path.join(wave_dir, "audit-[0-9]*.parquet")))
    if len(chunks) <= 1:
        return 0
    with ThreadPoolExecutor(max_workers=8) as pool:
        merged = pa.concat_tables(pool.map(pq.read_table, chunks))
    merged = merged.take(pc.sort_indices(merged.column("visit_seq")))
    write_table(merged, os.path.join(wave_dir, "audit-merged.parquet"))
    for p in chunks:
        os.remove(p)
    return len(chunks)


def compact_checkpoint(checkpoint_dir: str) -> int:
    """Merge each committed wave's per-worker audit chunk files into one
    consolidated file (small-file compaction — at cluster scale a
    periodic background task over old waves; the engine also compacts
    each wave inline on the background commit thread). Returns the
    number of files removed."""
    import glob

    removed = 0
    for wave_dir in sorted(glob.glob(os.path.join(checkpoint_dir, "waves", "wave=*"))):
        if not os.path.exists(os.path.join(wave_dir, "state.json")):
            continue  # uncommitted wave: leave untouched
        removed += _merge_wave_audit(wave_dir)
    return removed


def audit_dataset_from_checkpoint(checkpoint_dir: str):
    """Streaming Dataset over the checkpointed audit (one parquet per
    wave) — the scale path for post-crawl analytics: at 10^10 URLs the
    audit never lives as a driver table; finalize/report read it from
    the wave partitions with normal Ray Data streaming."""
    from .report import _compacting_read

    return _compacting_read(committed_audit_paths(checkpoint_dir), 16)


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
    import time as _time

    cfg = cfg or EngineConfig()
    t0 = _time.perf_counter()
    eng = _Engine(spec, corpus_dir, cfg)
    try:
        # actor pool startup is a one-time cost (a real cluster keeps the
        # pool for the whole 10^10-URL job) — surface it separately so
        # steady-state throughput is measurable. Warm the seen/frontier
        # shards too: their first method call otherwise lands ~1s of
        # process cold-start inside the first wave, and their first
        # ARROW-carrying call pays ~0.7s of lazy pyarrow-IPC setup per
        # actor process — exercise that path now (warm() deserializes a
        # table and mutates nothing).
        warm_tbl = pa.table(
            {"url": pa.array(["x"]), "order_key": pa.array([0], pa.int64())}
        )
        ray.get(
            [w.process.remote([], 0) for w in eng.workers]
            + [a.warm.remote(warm_tbl) for a in eng.seen + eng.frontier]
            + [a.stats.remote() for a in eng.seen + eng.frontier]
        )
        setup_sec = _time.perf_counter() - t0
        t1 = _time.perf_counter()
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
        loop_sec = _time.perf_counter() - t1
        result = eng.result()
        result.stats["setup_sec"] = round(setup_sec, 3)
        result.stats["loop_sec"] = round(loop_sec, 3)
        return result
    finally:
        eng.shutdown()
