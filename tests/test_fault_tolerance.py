"""A corrupted corpus payload must degrade to a per-row failure record,
never kill the wave (reference error-row semantics, core/crawler.py:129-134)."""

import json
import os
import shutil

import pytest

from crawler_seo_ray import datagen
from crawler_seo_ray.oracle import CrawlSpec
from crawler_seo_ray.pipelines.crawl import EngineConfig, run_crawl


@pytest.mark.usefixtures("ray_session")
def test_corrupted_corpus_rows_yield_failure_records(small_corpus, tmp_path):
    corpus_dir, manifest = small_corpus
    bad_dir = str(tmp_path / "bad_corpus")
    shutil.copytree(corpus_dir, bad_dir)
    # corrupt the first shard's payloads: rewrite part-00000 with garbage bytes
    import pyarrow as pa
    import pyarrow.parquet as pq

    p0 = os.path.join(bad_dir, "part-00000.parquet")
    t = pq.read_table(p0)
    garbage = pa.array([b"\x00garbage" for _ in range(t.num_rows)], pa.binary())
    t = t.set_column(t.schema.get_field_index("bytes"), "bytes", garbage)
    pq.write_table(t, p0, row_group_size=64)

    spec = CrawlSpec(n_pages=300, seeds=[datagen.url(1)], max_urls=40, batch_size=10)
    res = run_crawl(spec, bad_dir, EngineConfig(num_workers=2))
    assert res.audit.num_rows == 40  # the crawl completed
    rows = res.audit.to_pylist()
    corrupted = [r for r in rows if r["page_index"] in range(64) and r["image_id"]]
    assert corrupted, "no corrupted-shard pages visited (adjust seed)"
    for r in corrupted:
        assert r["phash_match"] is False
        assert "decode error" in (r["error_details"] or "")
    # untouched shards still verify
    clean = [r for r in rows if r["page_index"] is not None and r["page_index"] >= 64 and r["image_id"]]
    assert clean and all(r["phash_match"] for r in clean)
