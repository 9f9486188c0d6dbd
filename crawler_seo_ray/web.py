"""Shared per-page crawl kernel: fetch resolution, audit-row build,
link extraction. Used by both the pure-Python oracle and the Ray
PageWorker actors, so their equivalence test isolates *orchestration*
(ordering, sharding, admission) — the kernels themselves are pinned by
their own conformance tests.

Semantics mirrored from the reference:
- fetch → crawl fields            core/crawler.py:139-161
- error row shape                 core/crawler.py:215-227
- analyze only 200+text/html      core/crawler.py:163-164
- link extract = normalize+filter core/crawler.py:185-199
"""

from __future__ import annotations

from . import datagen
from .canon import LOGGED_REASONS, Scope, normalize_url, relevance
from .stages.analyzers import analyze_page


def transient_failures(url: str, fault_rate: float) -> int:
    """Deterministic synthetic transient-fault count for a URL — the
    no-network stand-in for flaky connections. A URL draws u ∈ [0,1)
    from md5(url); u < fault_rate ⇒ the first 1–3 fetch attempts fail
    (then the connection 'recovers'). Pure function of the URL, so the
    oracle and every Ray worker see identical behavior."""
    if fault_rate <= 0.0:
        return 0
    import hashlib

    h = int.from_bytes(hashlib.md5(("fault:" + url).encode()).digest()[:8], "big")
    if (h >> 16) / float(1 << 48) >= fault_rate:
        return 0
    return 1 + (h & 0xFFFF) % 3


def fetch_page(url: str, n: int, max_retries: int = 0, fault_rate: float = 0.0) -> dict:
    """Resolve a canonical URL against the synthetic web.

    ``https://{host(i)}/page/img{i:08d}`` → page i; anything else in
    scope is a 404 "page" (no links, not analyzable) — what a live
    crawler sees for a dead in-domain URL.

    Connection-level retry semantics (reference
    core/session_manager.py:33-38 ``max_retries=3``): a transient
    failure is retried up to ``max_retries`` times; exhaustion yields
    an ERROR row (the reference's requests.ConnectionError path).
    """
    fails = transient_failures(url, fault_rate)
    if fails > max_retries:
        return {
            "page_index": -1,
            "url": url,
            "status_code": "ERROR",
            "error_details": f"connection error after {max_retries} retries",
            "content_type": "",
            "final_url": url,
            "response_time_ms": 0.0,
            "content_length": 0,
            "links": [],
        }
    try:
        host, _, path = url.partition("://")[2].partition("/")
        parts = path.split("/")
        if len(parts) == 2 and parts[0] == "page":
            i = datagen.parse_image_id(parts[1])
            if 0 <= i < n and datagen.host(i) == host:
                return datagen.page_attrs(i, n)
    except (ValueError, IndexError):
        pass
    return {
        "page_index": -1,
        "url": url,
        "status_code": 404,
        "content_type": "text/html",
        "final_url": url,
        "response_time_ms": 10.0,
        "content_length": 0,
        "links": [],
    }


def build_audit_row(url: str, depth: int, attrs: dict, detect_invisible_colors: bool = True) -> dict:
    """Crawl fields + (for 200/html pages) analyzer fields.

    Duplicate-flag-dependent fields (score, issue lists) are NOT here —
    they need crawl-order state and are added post-crawl
    (pipelines.report / oracle inline).
    """
    code = attrs["status_code"]
    row: dict = {
        "url": url,
        "depth": depth,
        "page_index": attrs.get("page_index", -1),
        "status_code": str(code),
        "final_url": attrs.get("final_url", url),
        "redirected": attrs.get("final_url", url) != url,
        "content_type": attrs.get("content_type", ""),
        "response_time_ms": attrs.get("response_time_ms", 0.0),
        "content_length": attrs.get("content_length", 0),
        "links_encontrados": [],
        "processed": False,
        "error_details": "",
    }
    if code == "ERROR":
        row.update(
            {
                "error_details": attrs.get("error_details") or "simulated fetch error",
                "response_time_ms": 0.0,
                "content_type": "",
                "final_url": url,
                "redirected": False,
            }
        )
        return row
    if code == 200 and "text/html" in row["content_type"].lower():
        row.update(analyze_page(attrs, detect_invisible_colors))
        row["processed"] = True
    return row


def link_rank(
    depth: int, priority: bool, link_score: dict | None
) -> float:
    """Frontier ordering rank (lower = fetched earlier).

    Reference-parity mode (``link_score is None``): the smart manager's
    two-queue semantics — priority entries first (rank 0), normal after
    (rank 1), FIFO by discovery within each (core/url_manager.py:386-404).

    Weighted mode (north_star: "weighted priority queue keyed by
    depth/link-score"): rank = depth_weight·depth − pattern_boost·match,
    i.e. shallow + pattern-matching URLs first. Rank is computed at
    admission and stored with the entry, so ordering stays a data
    property (deterministic at any parallelism).
    """
    if link_score is None:
        return 0.0 if priority else 1.0
    return float(
        link_score.get("depth_weight", 1.0) * depth
        - link_score.get("pattern_boost", 0.0) * bool(priority)
    )


class RobotsCache:
    """Per-host robots rules with fetch-once-per-host caching semantics
    (north_rule: robots.txt cache in the fetch path). Static rules come
    from the crawl spec; ``synthetic=True`` additionally consults the
    deterministic synthetic-web robots (datagen.robots_rules) the first
    time a host is seen — the no-network stand-in for fetching and
    parsing /robots.txt once per host."""

    def __init__(self, static_rules: dict[str, list[str]] | None, synthetic: bool = False):
        self.static = static_rules or {}
        self.synthetic = synthetic
        self._cache: dict[str, list[str]] = {}

    def rules_for(self, host: str) -> list[str]:
        rules = self._cache.get(host)
        if rules is None:
            rules = list(self.static.get(host, []))
            if self.synthetic:
                from . import datagen

                rules += datagen.robots_rules(host)
            self._cache[host] = rules
        return rules

    def allows(self, url: str) -> bool:
        host, _, path = url.partition("://")[2].partition("/")
        for prefix in self.rules_for(host):
            if ("/" + path).startswith(prefix):
                return False
        return True


def robots_allows(url: str, rules) -> bool:
    """Robots check over a static dict or a RobotsCache."""
    if not rules:
        return True
    if isinstance(rules, RobotsCache):
        return rules.allows(url)
    host, _, path = url.partition("://")[2].partition("/")
    for prefix in rules.get(host, []):
        if ("/" + path).startswith(prefix):
            return False
    return True


def extract_links(
    attrs: dict,
    page_url: str,
    scope: Scope,
    robots_rules=None,
) -> tuple[list[str], list[dict]]:
    """Canonicalize + relevance-filter (+ robots-filter) a page's outlinks.

    Returns (kept canonical links in document order, reject log entries
    for the reasons the reference logs, plus ROBOTS)."""
    kept: list[str] = []
    rejects: list[dict] = []
    for raw in attrs.get("links") or []:
        c, reason = normalize_url(raw, page_url, scope)
        if c is None:
            if reason in LOGGED_REASONS:
                rejects.append({"url": raw, "reason": reason, "details": ""})
            continue
        ok, rreason, pat = relevance(c)
        if not ok:
            rejects.append({"url": c, "reason": rreason, "details": pat or ""})
            continue
        if not robots_allows(c, robots_rules):
            rejects.append({"url": c, "reason": "ROBOTS", "details": ""})
            continue
        kept.append(c)
    return kept, rejects
