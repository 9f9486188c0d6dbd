"""Nested-config deep-merge surface (reference settings.py:202-261) and
the consolidated final-stats tree (reference main.py:465-545)."""

import pytest

from crawler_seo_ray.config import (
    DEFAULT_CONFIG,
    default_config,
    materialize,
    update_config,
)


def test_deep_update_merges_nested_and_preserves_siblings():
    cfg = update_config({"crawler": {"max_urls": 500}})
    assert cfg["crawler"]["max_urls"] == 500
    # sibling keys in the same section survive a partial override
    assert cfg["crawler"]["max_depth"] == DEFAULT_CONFIG["crawler"]["max_depth"]
    assert cfg["engine"] == DEFAULT_CONFIG["engine"]
    # defaults themselves are never mutated
    assert DEFAULT_CONFIG["crawler"]["max_urls"] == 100


def test_deep_update_replaces_non_dict_leaves():
    cfg = update_config({"crawler": {"link_score": {"depth_weight": 2.0}}})
    assert cfg["crawler"]["link_score"] == {"depth_weight": 2.0}


def test_quick_mode_merge_order():
    """Quick mode applies first, the caller's override wins (the
    reference applies quick clamps before user args finalize)."""
    cfg = update_config(quick=True)
    assert cfg["crawler"]["max_depth"] == 3 and cfg["crawler"]["batch_size"] == 5
    cfg2 = update_config({"crawler": {"max_depth": 7}}, quick=True)
    assert cfg2["crawler"]["max_depth"] == 7
    assert cfg2["crawler"]["batch_size"] == 5


def test_materialize_round_trip():
    cfg = update_config(
        {
            "crawler": {"max_urls": 60, "politeness_per_wave": 4},
            "engine": {"num_workers": 2, "frontier_salt": 2},
        }
    )
    spec, engine = materialize(cfg, seeds=["https://h0.example.test/page/img00000001"], n_pages=300)
    assert spec.max_urls == 60 and spec.politeness_per_wave == 4
    assert spec.max_retries == 3
    assert engine.num_workers == 2 and engine.frontier_salt == 2
    assert default_config() == DEFAULT_CONFIG


@pytest.mark.usefixtures("ray_session")
def test_final_stats_report_tree(small_corpus):
    from crawler_seo_ray import datagen
    from crawler_seo_ray.oracle import CrawlSpec
    from crawler_seo_ray.pipelines.crawl import EngineConfig, run_crawl
    from crawler_seo_ray.pipelines.report import finalize_audit, final_stats_report

    corpus_dir, _ = small_corpus
    spec = CrawlSpec(n_pages=300, seeds=[datagen.url(0)], max_urls=80, batch_size=20)
    res = run_crawl(spec, corpus_dir, EngineConfig(num_workers=2))
    final = finalize_audit(res.audit).materialize()
    tree = final_stats_report(res, final)

    assert set(tree) == {"crawler", "integrated", "metatags", "status", "report", "filters"}
    c, i, st, rep = tree["crawler"], tree["integrated"], tree["status"], tree["report"]
    assert c["urls_processed"] == 80
    assert c["urls_successful"] + c["urls_failed"] == 80
    assert i["urls_processadas"] + i["urls_com_erro"] == 80
    assert i["urls_processadas"] == rep["pages"]
    assert st["status_errors"] == c["urls_failed"]
    assert 0 <= rep["avg_score"] <= 100
    assert sum(rep["risk_breakdown"].values()) == rep["pages"]
    # the corpus plants duplicate captions → duplicate titles exist
    assert tree["metatags"]["total_duplicate_titles"] >= 0
    assert isinstance(tree["filters"], dict) and tree["filters"]
