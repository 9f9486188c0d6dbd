"""Deterministic single-process reference crawl (the golden oracle).

Reproduces the reference's crawl orchestration semantics exactly, at
``max_threads``-equivalent single-thread order (the reference itself is
nondeterministic under threads — SURVEY.md §2.9 — so the deterministic
single-thread order IS the specification the Ray engine must match):

- wave loop with budget gating       core/crawler.py:71-106
- FIFO / smart two-queue frontier    core/url_manager.py:248-260,386-404
- register-at-enqueue seen set       core/url_manager.py:200-246
- link extract → filter → intake     core/crawler.py:185-213
- visit-time duplicate flags         analyzers/metatags_analyzer.py:196-228
- error rows count toward budget     core/crawler.py:129-134

Engine extensions modeled identically here so golden tests cover them:
per-host politeness quota per wave, and robots-style path rules
(both OFF by default = exact reference parity).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import datagen
from .canon import (
    LOGGED_REASONS,
    Scope,
    is_priority,
    normalize_url,
    relevance,
)
from .stages.scoring import finalize_page
from .web import build_audit_row, extract_links, fetch_page, link_rank, robots_allows


@dataclass
class CrawlSpec:
    """Shared crawl configuration (oracle + Ray engine)."""

    n_pages: int
    seeds: list[str] = field(default_factory=list)
    max_urls: int = 100
    max_depth: int = 10
    batch_size: int = 25  # the reference's max_threads wave size
    scope: Scope = field(default_factory=lambda: Scope("suffix", datagen.HOST_SUFFIX))
    priority_patterns: list[str] | None = None  # None = plain FIFO manager
    # weighted frontier (north_star): {"depth_weight": w, "pattern_boost": b}
    # — rank = w·depth − b·pattern_match; None = reference two-queue parity
    link_score: dict | None = None
    politeness_per_wave: int | None = None  # max URLs per host per wave (None = off)
    # adaptive per-host priority (north_star: per-host priority recomputed
    # between waves): rank offset = error_penalty * cumulative_error_rate
    # of the host, from per-host (visits, errors) aggregated each wave
    adaptive_host_priority: dict | None = None
    robots_deny_prefixes: dict[str, list[str]] | None = None  # host → path prefixes
    synthetic_robots: bool = False  # consult datagen.robots_rules per host (lazy cache)
    detect_invisible_colors: bool = True
    # connection-level retry budget (reference session_manager.py:33-38
    # max_retries=3); transient faults injected deterministically via
    # fault_rate (web.transient_failures) for tests/bench
    max_retries: int = 3
    fault_rate: float = 0.0
    # test hook: (url_substring, seconds) — workers sleep on matching
    # URLs to exercise the engine's straggler-chunk timeout
    synthetic_hang: tuple | None = None


def _err_rate(st) -> float:
    if not st or not st[0]:
        return 0.0
    return st[1] / st[0]


class OracleCrawl:
    def __init__(self, spec: CrawlSpec):
        self.spec = spec
        self.seen: set[str] = set()  # registered canonicals (enqueue-time)
        self.issued: set[str] = set()  # popped canonicals
        # unified rank-ordered frontier: (rank, enq_seq, url, depth);
        # parity mode gives rank 0/1 = the reference's two-queue drain
        self.frontier: list[tuple] = []
        self.enq_seq = 0
        self.host_stats: dict[str, list] = {}  # host -> [visits, errors]
        from .web import RobotsCache

        self.robots = (
            RobotsCache(spec.robots_deny_prefixes, spec.synthetic_robots)
            if (spec.robots_deny_prefixes or spec.synthetic_robots)
            else None
        )
        self.results: list[dict] = []
        self.rejected: list[dict] = []
        self.titles: dict[str, int] = {}  # text → occurrences so far
        self.descs: dict[str, int] = {}
        self.stats = {
            "total_found": 0,
            "total_duplicates": 0,
            "total_filtered": 0,
            "filtered_by_reason": {},
            "waves": 0,
        }

    # -- url intake (reference add_url path) --------------------------------
    def _log_reject(self, url: str, reason: str, detail: str | None):
        if reason in LOGGED_REASONS:
            self.stats["total_filtered"] += 1
            self.stats["filtered_by_reason"][reason] = (
                self.stats["filtered_by_reason"].get(reason, 0) + 1
            )
            self.rejected.append({"url": url, "reason": reason, "details": detail or ""})

    def add_url(self, raw: str, depth: int, base_url: str | None, priority: bool = False) -> bool:
        c, reason = normalize_url(raw, base_url, self.spec.scope)
        if c is None:
            self._log_reject(raw, reason, None)
            return False
        if c in self.seen:
            if c not in self.issued:
                self.stats["total_duplicates"] += 1
            else:
                # reference: is_processed() intake check skips silently
                pass
            return False
        ok, rreason, pat = relevance(c)
        if not ok:
            self._log_reject(c, rreason, pat)
            return False
        if not robots_allows(c, self.robots):
            self._log_reject(c, "ROBOTS", None)  # engine extension (not in LOGGED_REASONS set)
            self.stats["filtered_by_reason"]["ROBOTS"] = (
                self.stats["filtered_by_reason"].get("ROBOTS", 0) + 1
            )
            self.rejected.append({"url": c, "reason": "ROBOTS", "details": ""})
            return False
        patterns = self.spec.priority_patterns or (
            (self.spec.link_score or {}).get("patterns")
        )
        if not priority and patterns:
            priority = is_priority(c, patterns)
        if self.spec.priority_patterns is None and self.spec.link_score is None:
            priority = False  # plain FIFO manager has no priority lane
        self.seen.add(c)
        rank = link_rank(depth, priority, self.spec.link_score)
        self.frontier.append((rank, self.enq_seq, c, depth))
        self.enq_seq += 1
        self.stats["total_found"] += 1
        return True

    # -- frontier pop (reference get_next_url, smart variant first) ---------
    def _pop_batch(self) -> list[tuple[str, int]]:
        budget = min(self.spec.batch_size, self.spec.max_urls - len(self.results))
        batch: list[tuple[str, int]] = []
        taken_idx: set[int] = set()
        per_host: dict[str, int] = {}
        quota = self.spec.politeness_per_wave
        self.frontier.sort()  # (rank, enq_seq) — timsort, nearly sorted
        ahp = self.spec.adaptive_host_priority
        if ahp:
            pen = ahp.get("error_penalty", 0.0)
            order = sorted(
                range(len(self.frontier)),
                key=lambda k: (
                    self.frontier[k][0]
                    + pen * _err_rate(self.host_stats.get(
                        self.frontier[k][2].partition("://")[2].partition("/")[0]
                    )),
                    self.frontier[k][1],
                ),
            )
            entries = [self.frontier[k] for k in order]
        else:
            entries = self.frontier
        for k, (rank, eseq, url, depth) in enumerate(entries):
            if len(batch) >= budget:
                break
            if quota is not None:
                h = url.partition("://")[2].partition("/")[0]
                if per_host.get(h, 0) >= quota:
                    continue  # holdback: stays in the frontier, order kept
                per_host[h] = per_host.get(h, 0) + 1
            self.issued.add(url)
            batch.append((url, depth))
            taken_idx.add(k)
        if taken_idx:
            self.frontier = [e for k, e in enumerate(entries) if k not in taken_idx]
        return batch

    # -- page processing (reference _process_single_url, single-fetch) ------
    def _process(self, url: str, depth: int, visit_seq: int) -> dict:
        attrs = fetch_page(
            url, self.spec.n_pages, self.spec.max_retries, self.spec.fault_rate
        )
        row = build_audit_row(url, depth, attrs, self.spec.detect_invisible_colors)
        row["visit_seq"] = visit_seq
        if row["processed"]:
            # visit-time duplicate flags (metatags_analyzer.py:196-228)
            t = row["title"]
            tdup = False
            if t:
                self.titles[t] = self.titles.get(t, 0) + 1
                tdup = self.titles[t] > 1
            d = row["meta_description"]
            ddup = False
            if d:
                self.descs[d] = self.descs.get(d, 0) + 1
                ddup = self.descs[d] > 1
            row.update(finalize_page(row, tdup, ddup))
            if depth < self.spec.max_depth:
                kept, rejects = extract_links(attrs, url, self.spec.scope, self.robots)
                for r in rejects:
                    self.stats["total_filtered"] += 1
                    self.stats["filtered_by_reason"][r["reason"]] = (
                        self.stats["filtered_by_reason"].get(r["reason"], 0) + 1
                    )
                    self.rejected.append(r)
                row["links_encontrados"] = kept
        return row

    def run(self) -> dict:
        smart = self.spec.priority_patterns is not None or self.spec.link_score is not None
        for s in self.spec.seeds:
            self.add_url(s, 0, None, priority=smart)
        while self.frontier and len(self.results) < self.spec.max_urls:
            batch = self._pop_batch()
            if not batch:
                break
            wave = self.stats["waves"]
            self.stats["waves"] += 1
            wave_rows = [
                self._process(u, d, len(self.results) + k) for k, (u, d) in enumerate(batch)
            ]
            for r in wave_rows:
                r["wave"] = wave
            if self.spec.adaptive_host_priority:
                for r in wave_rows:
                    h = r["url"].partition("://")[2].partition("/")[0]
                    st = self.host_stats.setdefault(h, [0, 0])
                    st[0] += 1
                    if r["status_code"] != "200":
                        st[1] += 1
            self.results.extend(wave_rows)
            for row in wave_rows:
                for link in row["links_encontrados"]:
                    if link in self.issued:
                        continue
                    self.add_url(link, row["depth"] + 1, row["url"])
        return {
            "audit": self.results,
            "visit_order": [(r["visit_seq"], r["url"], r["depth"]) for r in self.results],
            "seen": set(self.seen),
            "rejected": list(self.rejected),
            "stats": dict(self.stats),
        }


def run_oracle(spec: CrawlSpec) -> dict:
    return OracleCrawl(spec).run()
