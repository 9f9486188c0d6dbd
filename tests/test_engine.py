"""Ray engine ≡ deterministic oracle (orchestration equivalence), plus
checkpoint/resume and image-invariant checks."""

import collections

import pytest

from crawler_seo_ray import datagen
from crawler_seo_ray.oracle import CrawlSpec, run_oracle
from crawler_seo_ray.pipelines.crawl import EngineConfig, run_crawl
from crawler_seo_ray.pipelines.report import finalize_audit

N = 300

# fields compared row-by-row between oracle and engine (post-finalize)
COMPARE_FIELDS = [
    "url",
    "depth",
    "status_code",
    "final_url",
    "redirected",
    "content_type",
    "response_time_ms",
    "content_length",
    "processed",
    "title",
    "title_length",
    "title_status",
    "title_duplicado",
    "meta_description",
    "description_status",
    "description_duplicada",
    "h1_count",
    "h1_text",
    "h1_ausente",
    "h1_multiple",
    "hierarquia_correta",
    "heading_sequence",
    "heading_sequence_valida",
    "problemas_hierarquia",
    "headings_problematicos_count",
    "headings_vazios_count",
    "headings_ocultos_count",
    "headings_gravidade_critica",
    "total_problemas_headings",
    "has_open_graph",
    "meta_viewport",
    "canonical_url",
    "status_warnings",
    "has_mixed_content",
    "mixed_content_count",
    "critical_mixed_count",
    "passive_mixed_count",
    "risk_level",
    "risk_score",
    "metatags_score",
    "critical_issues",
    "warnings",
    "all_warnings",
    "links_encontrados",
]


def _spec(**kw):
    base = dict(n_pages=N, seeds=[datagen.url(1)], max_urls=60, batch_size=16)
    base.update(kw)
    return CrawlSpec(**base)


def _compare(engine_result, oracle_out, finalized_rows=None):
    audit = engine_result.audit
    eng_order = list(
        zip(
            audit.column("visit_seq").to_pylist(),
            audit.column("url").to_pylist(),
            audit.column("depth").to_pylist(),
        )
    )
    assert eng_order == oracle_out["visit_order"]
    assert engine_result.seen == oracle_out["seen"]
    eng_rej = collections.Counter(
        (r["url"], r["reason"]) for r in engine_result.rejected.to_pylist()
    )
    ora_rej = collections.Counter((r["url"], r["reason"]) for r in oracle_out["rejected"])
    assert eng_rej == ora_rej

    if finalized_rows is not None:
        by_seq = {r["visit_seq"]: r for r in finalized_rows}
        for orow in oracle_out["audit"]:
            erow = by_seq[orow["visit_seq"]]
            for f in COMPARE_FIELDS:
                ov = orow.get(f)
                ev = erow.get(f)
                if ov is None and f not in orow:
                    # oracle never set it (non-processed row) → engine null/None/default-false
                    assert ev in (None, False, [], 0) or ev != ev, (f, orow["visit_seq"], ev)
                    continue
                assert ev == ov, (f, orow["visit_seq"], ev, ov)


@pytest.mark.usefixtures("ray_session")
def test_engine_matches_oracle_fifo(small_corpus):
    corpus_dir, _ = small_corpus
    spec = _spec()
    ora = run_oracle(spec)
    res = run_crawl(spec, corpus_dir, EngineConfig(num_workers=3))
    finalized = finalize_audit(res.audit).take_all()
    _compare(res, ora, finalized)
    # image invariants on every fetched row
    for r in res.audit.to_pylist():
        if r["image_id"] is not None:
            assert r["caption_match"] is True
            assert r["phash_match"] is True
            assert r["psnr_db"] is not None and r["psnr_db"] >= 40.0


@pytest.mark.usefixtures("ray_session")
def test_engine_matches_oracle_many_small_chunks(small_corpus):
    """The P2P candidate shuffle (workers push per-chunk slices straight
    to the seen shards; probing at the wave barrier) must stay
    bit-identical to the oracle regardless of how many chunk pushes
    interleave — force many tiny chunks across several shards, and
    check duplicate-count stats parity against a coarse-chunk run."""
    corpus_dir, _ = small_corpus
    spec = _spec(max_urls=80, batch_size=16)
    ora = run_oracle(spec)
    res = run_crawl(
        spec,
        corpus_dir,
        EngineConfig(
            num_workers=3, max_chunk=2, num_seen_shards=3, num_frontier_shards=2
        ),
    )
    _compare(res, ora)
    base = run_crawl(spec, corpus_dir, EngineConfig(num_workers=3))
    assert res.stats["total_duplicates"] == base.stats["total_duplicates"]
    assert res.stats["total_found"] == base.stats["total_found"]


@pytest.mark.usefixtures("ray_session")
def test_engine_matches_oracle_priority(small_corpus):
    corpus_dir, _ = small_corpus
    target = datagen.image_id((1 * 11 + 3) % N)
    spec = _spec(priority_patterns=[target.lower()], max_urls=40, batch_size=8)
    ora = run_oracle(spec)
    res = run_crawl(spec, corpus_dir, EngineConfig(num_workers=2))
    _compare(res, ora)


@pytest.mark.usefixtures("ray_session")
def test_engine_matches_oracle_politeness_and_robots(small_corpus):
    corpus_dir, _ = small_corpus
    robots = {datagen.host(1): ["/page/img000000"]}  # deny low page ids on seed host
    spec = _spec(
        max_urls=50,
        batch_size=10,
        politeness_per_wave=2,
        robots_deny_prefixes=robots,
        seeds=[datagen.url(250)],
    )
    ora = run_oracle(spec)
    res = run_crawl(spec, corpus_dir, EngineConfig(num_workers=2))
    _compare(res, ora)


@pytest.mark.usefixtures("ray_session")
def test_engine_weighted_frontier_matches_oracle(small_corpus):
    """north_star: weighted priority queue keyed by depth/link-score.
    Shallow + pattern-matching URLs first; engine ≡ oracle; order differs
    from plain FIFO."""
    corpus_dir, _ = small_corpus
    target = datagen.image_id((1 * 13 + 7) % N)
    weighted = _spec(
        max_urls=40,
        batch_size=8,
        link_score={"depth_weight": 1.0, "pattern_boost": 10.0, "patterns": [target.lower()]},
    )
    ora = run_oracle(weighted)
    res = run_crawl(weighted, corpus_dir, EngineConfig(num_workers=2))
    _compare(res, ora)
    fifo = run_oracle(_spec(max_urls=40, batch_size=8))
    assert ora["visit_order"] != fifo["visit_order"]
    # depth ordering: within the crawl, shallow pages dominate early waves
    depths = [d for _, _, d in ora["visit_order"]]
    assert sorted(depths[:10]) == depths[:10] or max(depths[:10]) <= min(depths[-10:]) + 2


@pytest.mark.usefixtures("ray_session")
def test_engine_salted_frontier_matches_oracle(small_corpus):
    """Hot-host salting (north_rule skew split) must not change the
    deterministic order — politeness is enforced globally at the merge."""
    corpus_dir, _ = small_corpus
    spec = _spec(max_urls=50, batch_size=10, politeness_per_wave=2, seeds=[datagen.url(250)])
    ora = run_oracle(spec)
    res = run_crawl(
        spec, corpus_dir, EngineConfig(num_workers=2, num_frontier_shards=3, frontier_salt=3)
    )
    _compare(res, ora)


@pytest.mark.usefixtures("ray_session")
def test_engine_multi_seed_and_duplicate_seed(small_corpus):
    corpus_dir, _ = small_corpus
    spec = _spec(
        seeds=[datagen.url(1), datagen.url(2), datagen.url(1), "https://other.org/x"],
        max_urls=30,
    )
    ora = run_oracle(spec)
    res = run_crawl(spec, corpus_dir, EngineConfig(num_workers=2))
    _compare(res, ora)


@pytest.mark.usefixtures("ray_session")
def test_commit_failure_surfaces(small_corpus, tmp_path, monkeypatch):
    """A failed background wave commit must abort the run (visible
    error), not silently drop the wave from the checkpoint while stats
    still count it."""
    from crawler_seo_ray.pipelines import crawl as C

    corpus_dir, _ = small_corpus
    ck = str(tmp_path / "ck")
    calls = {"n": 0}
    orig = C._Engine._commit_wave

    def failing(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # fail the second wave's commit
            raise OSError("disk full (injected)")
        return orig(self, *a, **kw)

    monkeypatch.setattr(C._Engine, "_commit_wave", failing)
    with pytest.raises(RuntimeError, match="commit failed"):
        run_crawl(
            _spec(max_urls=60), corpus_dir,
            EngineConfig(num_workers=2, checkpoint_dir=ck),
        )


@pytest.mark.usefixtures("ray_session")
def test_resume_equals_uninterrupted(small_corpus, tmp_path):
    corpus_dir, _ = small_corpus
    spec = _spec(max_urls=50, batch_size=10)
    full = run_crawl(spec, corpus_dir, EngineConfig(num_workers=2))

    ck = str(tmp_path / "ckpt")
    cfg = EngineConfig(num_workers=2, checkpoint_dir=ck)
    part = run_crawl(spec, corpus_dir, cfg, stop_after_wave=2)
    assert part.audit.num_rows < full.audit.num_rows
    resumed = run_crawl(spec, corpus_dir, cfg, resume=True)

    assert resumed.audit.column("url").to_pylist() == full.audit.column("url").to_pylist()
    assert resumed.audit.column("visit_seq").to_pylist() == full.audit.column(
        "visit_seq"
    ).to_pylist()
    assert resumed.seen == full.seen
    assert collections.Counter(
        (r["url"], r["reason"]) for r in resumed.rejected.to_pylist()
    ) == collections.Counter((r["url"], r["reason"]) for r in full.rejected.to_pylist())


@pytest.mark.usefixtures("ray_session")
def test_bloom_prefilter_no_false_negatives(small_corpus):
    import ray

    from crawler_seo_ray.state.seen import SeenShard

    shard = SeenShard.remote(0, bloom_capacity=10_000)
    urls = [datagen.url(i) for i in range(400)]
    ray.get(shard.admit.remote(urls, list(range(400))))
    hits = ray.get(shard.probe_bloom.remote(urls))
    assert all(hits)  # a registered URL may never read as unseen
    fresh = [datagen.url(i) + "?x=1" for i in range(400, 500)]
    fp = sum(ray.get(shard.probe_bloom.remote(fresh)))
    assert fp <= 10  # ~1% fp target
    ray.kill(shard)


@pytest.mark.usefixtures("ray_session")
def test_compaction_preserves_resume_and_reads(small_corpus, tmp_path):
    from crawler_seo_ray.pipelines.crawl import (
        audit_dataset_from_checkpoint,
        compact_checkpoint,
    )

    corpus_dir, _ = small_corpus
    spec = _spec(max_urls=50, batch_size=10)
    full = run_crawl(spec, corpus_dir, EngineConfig(num_workers=3))

    ck = str(tmp_path / "ck")
    cfg = EngineConfig(num_workers=3, checkpoint_dir=ck)
    run_crawl(spec, corpus_dir, cfg, stop_after_wave=3)
    # the background commit thread compacts each wave inline now — the
    # explicit pass finds nothing left to merge, and every committed
    # wave holds exactly one audit file
    import glob
    import os

    removed = compact_checkpoint(ck)
    assert removed == 0
    for d in glob.glob(os.path.join(ck, "waves", "wave=*")):
        if os.path.exists(os.path.join(d, "state.json")):
            assert len(glob.glob(os.path.join(d, "audit*.parquet"))) <= 1
    resumed = run_crawl(spec, corpus_dir, cfg, resume=True)
    assert resumed.audit.column("url").to_pylist() == full.audit.column("url").to_pylist()
    # compacted + fresh chunks both readable
    compact_checkpoint(ck)
    ds = audit_dataset_from_checkpoint(ck)
    assert ds.count() == 50


@pytest.mark.usefixtures("ray_session")
def test_engine_adaptive_host_priority_matches_oracle(small_corpus, tmp_path):
    """north_star: per-host priority recomputed between waves from
    aggregated per-host stats (error-rate penalty)."""
    corpus_dir, _ = small_corpus
    spec = _spec(max_urls=150, batch_size=10,
                 adaptive_host_priority={"error_penalty": 10.0})
    ora = run_oracle(spec)
    res = run_crawl(spec, corpus_dir, EngineConfig(num_workers=3))
    _compare(res, ora)
    plain = run_oracle(_spec(max_urls=150, batch_size=10))
    assert ora["visit_order"] != plain["visit_order"]
    # resume path rebuilds host stats identically
    ck = str(tmp_path / "ck")
    cfg = EngineConfig(num_workers=3, checkpoint_dir=ck)
    run_crawl(spec, corpus_dir, cfg, stop_after_wave=5)
    resumed = run_crawl(spec, corpus_dir, cfg, resume=True)
    assert resumed.audit.column("url").to_pylist() == res.audit.column("url").to_pylist()


@pytest.mark.usefixtures("ray_session")
def test_engine_single_domain_scope_matches_oracle(small_corpus):
    """Reference-parity mode: scope = the seed's exact host (the
    reference is a single-domain crawler) — cross-host links are
    silently rejected and the crawl stays on one host."""
    from crawler_seo_ray.canon import Scope

    corpus_dir, _ = small_corpus
    seed_host = datagen.host(1)
    spec = _spec(
        max_urls=40,
        batch_size=8,
        scope=Scope("domain", seed_host),
        detect_invisible_colors=False,  # also exercise the analyzer flag
    )
    ora = run_oracle(spec)
    res = run_crawl(spec, corpus_dir, EngineConfig(num_workers=2))
    _compare(res, ora)
    hosts = set(res.audit.column("host").to_pylist())
    assert hosts == {seed_host}


import os


@pytest.mark.skipif(
    not os.environ.get("RAY_GRAFT_BIGTEST"),
    reason="bench-scale equivalence (set RAY_GRAFT_BIGTEST=1; ~2min)",
)
@pytest.mark.usefixtures("ray_session")
def test_engine_matches_oracle_at_bench_scale():
    """20k-URL crawl over the 50k-page bench corpus: engine visit order
    and seen set must equal the single-thread oracle at full scale."""
    corpus = "/tmp/crawler_seo_ray_cache/bench_corpus_n50000_d16_33"
    if not os.path.exists(os.path.join(corpus, "manifest.json")):
        datagen.write_corpus_parallel(corpus, 50000, rows_per_shard=2048,
                                      dim_base=16, dim_mod=33)
    spec = CrawlSpec(
        n_pages=50000,
        seeds=[datagen.url(i * 379 % 50000) for i in range(100)],
        max_urls=20000,
        batch_size=8000,
    )
    ora = run_oracle(spec)
    res = run_crawl(spec, corpus, EngineConfig(num_workers=3, psnr_every=97))
    assert res.audit.column("url").to_pylist() == [u for _, u, _ in ora["visit_order"]]
    assert res.seen == ora["seen"]


@pytest.mark.usefixtures("ray_session")
def test_engine_fuzzed_configs_match_oracle(small_corpus):
    """Seeded config fuzz: random combinations of seeds, wave size,
    politeness, salting, priority modes and budgets must all match the
    oracle exactly."""
    import numpy as np

    corpus_dir, _ = small_corpus
    rng = np.random.default_rng(2024)
    for trial in range(5):
        n_seeds = int(rng.integers(1, 4))
        seeds = [datagen.url(int(rng.integers(0, N))) for _ in range(n_seeds)]
        mode = ["fifo", "smart", "weighted", "adaptive"][int(rng.integers(0, 4))]
        kw = {}
        if mode == "smart":
            kw["priority_patterns"] = [datagen.image_id(int(rng.integers(0, N)))[:6].lower()]
        elif mode == "weighted":
            kw["link_score"] = {
                "depth_weight": float(rng.integers(0, 3)),
                "pattern_boost": float(rng.integers(0, 20)),
                "patterns": ["img0000"],
            }
        elif mode == "adaptive":
            kw["adaptive_host_priority"] = {"error_penalty": float(rng.integers(1, 20))}
        if rng.random() < 0.5:
            kw["politeness_per_wave"] = int(rng.integers(1, 4))
        spec = _spec(
            seeds=seeds,
            max_urls=int(rng.integers(20, 80)),
            batch_size=int(rng.integers(3, 30)),
            **kw,
        )
        cfg = EngineConfig(
            num_workers=int(rng.integers(1, 4)),
            num_seen_shards=int(rng.integers(1, 6)),
            num_frontier_shards=int(rng.integers(1, 6)),
            frontier_salt=int(rng.integers(1, 4)),
        )
        ora = run_oracle(spec)
        res = run_crawl(spec, corpus_dir, cfg)
        try:
            _compare(res, ora)
        except AssertionError as ex:
            raise AssertionError(f"trial {trial} mode={mode} spec={spec} cfg={cfg}") from ex


@pytest.mark.usefixtures("ray_session")
def test_kitchen_sink_resume_matches_oracle(small_corpus, tmp_path):
    """Everything at once: weighted rank + adaptive host priority +
    politeness + salted frontier + robots, interrupted mid-crawl,
    compacted, resumed — still bit-identical to the oracle."""
    from crawler_seo_ray.pipelines.crawl import compact_checkpoint

    corpus_dir, _ = small_corpus
    spec = _spec(
        seeds=[datagen.url(1), datagen.url(250)],
        max_urls=120,
        batch_size=12,
        politeness_per_wave=3,
        robots_deny_prefixes={datagen.host(250): ["/page/img000002"]},
        link_score={"depth_weight": 1.0, "pattern_boost": 8.0, "patterns": ["img00000"]},
        adaptive_host_priority={"error_penalty": 6.0},
    )
    ora = run_oracle(spec)
    ck = str(tmp_path / "ck")
    cfg = EngineConfig(
        num_workers=3, num_frontier_shards=5, num_seen_shards=3,
        frontier_salt=2, checkpoint_dir=ck,
    )
    run_crawl(spec, corpus_dir, cfg, stop_after_wave=4)
    compact_checkpoint(ck)
    res = run_crawl(spec, corpus_dir, cfg, resume=True)
    _compare(res, ora)


@pytest.mark.usefixtures("ray_session")
def test_synthetic_robots_cache_matches_oracle(small_corpus):
    """Per-host robots rules resolved lazily (the robots.txt fetch cache):
    engine == oracle, and the synthetic deny rules actually reject URLs."""
    corpus_dir, _ = small_corpus
    spec = _spec(max_urls=120, batch_size=15, synthetic_robots=True)
    ora = run_oracle(spec)
    res = run_crawl(spec, corpus_dir, EngineConfig(num_workers=3))
    _compare(res, ora)
    reasons = {r["reason"] for r in res.rejected.to_pylist()}
    assert "ROBOTS" in reasons  # synthetic rules fired
    plain = run_oracle(_spec(max_urls=120, batch_size=15))
    assert ora["visit_order"] != plain["visit_order"]
