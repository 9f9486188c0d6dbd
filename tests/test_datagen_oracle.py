import numpy as np
import pyarrow.parquet as pq

from crawler_seo_ray import datagen
from crawler_seo_ray.functions import imagecodec as ic
from crawler_seo_ray.oracle import CrawlSpec, fetch_page, run_oracle
from crawler_seo_ray.storage import ShardedTakeReader


def test_corpus_row_invariants():
    for i in [0, 1, 2, 3, 13, 26, 59]:
        row = datagen.corpus_row(i, dim_base=16, dim_mod=33)
        px = datagen.pixels(i, 16, 33)
        dec = ic.decode_image(row["bytes"], row["fmt"])
        assert dec.shape == (row["h"], row["w"], 3)
        if row["fmt"] == "png":
            assert np.array_equal(dec, px)
        else:
            assert ic.psnr(px, dec) >= 40.0
        assert row["caption"] == datagen.caption(i)
        assert row["phash"] == ic.phash64(dec)


def test_caption_duplicates_at_residues():
    assert datagen.caption(13) == datagen.caption(0)
    assert datagen.caption(39) == datagen.caption(26)
    assert datagen.caption(1) != datagen.caption(14)
    assert datagen.description(51) == datagen.description(34)  # 51 % 34 == 17


def test_determinism_across_calls():
    a = datagen.page_attrs(7, 300)
    b = datagen.page_attrs(7, 300)
    assert a == b
    assert datagen.links(5, 300) == datagen.links(5, 300)


def test_sharded_corpus_take(small_corpus):
    path, manifest = small_corpus
    rd = ShardedTakeReader(path)
    idx = [5, 200, 63, 64, 0, 299]
    t = rd.take(idx)
    assert t.column("image_id").to_pylist() == [datagen.image_id(i) for i in idx]
    # column pruning
    rd2 = ShardedTakeReader(path, columns=["image_id", "caption"])
    t2 = rd2.take([10, 11])
    assert t2.column_names == ["image_id", "caption"]
    assert t2.column("caption").to_pylist() == [datagen.caption(10), datagen.caption(11)]


def test_fetch_page_resolution():
    a = fetch_page(datagen.url(5), 300)
    assert a["page_index"] == 5
    # wrong host → 404
    bad = datagen.url(5).replace(datagen.host(5), "h999.example.test")
    assert fetch_page(bad, 300)["status_code"] == 404
    assert fetch_page("https://h0.example.test/nope", 300)["status_code"] == 404


def test_oracle_smoke_and_budget():
    spec = CrawlSpec(n_pages=300, seeds=[datagen.url(1)], max_urls=40, max_depth=5, batch_size=8)
    out = run_oracle(spec)
    assert len(out["audit"]) == 40  # budget fully used (enough links)
    seqs = [r["visit_seq"] for r in out["audit"]]
    assert seqs == list(range(40))
    assert out["audit"][0]["url"] == datagen.url(1)
    # all visited are in seen
    for _, u, _ in out["visit_order"]:
        assert u in out["seen"]
    # depth never exceeds max_depth
    assert max(r["depth"] for r in out["audit"]) <= 5


def test_oracle_deterministic():
    spec = CrawlSpec(n_pages=300, seeds=[datagen.url(1)], max_urls=30, batch_size=7)
    a, b = run_oracle(spec), run_oracle(spec)
    assert a["visit_order"] == b["visit_order"]
    assert a["seen"] == b["seen"]
    assert a["rejected"] == b["rejected"]


def test_oracle_priority_mode_prefers_patterns():
    # in smart mode the priority queue drains first; use /page/ as a
    # pattern that matches everything → same order as FIFO; then a
    # pattern matching nothing → also FIFO. Distinct orders only when
    # some links match. Use a specific page id as "pattern".
    spec_fifo = CrawlSpec(n_pages=300, seeds=[datagen.url(1)], max_urls=20, batch_size=4)
    out_fifo = run_oracle(spec_fifo)
    target = datagen.image_id((1 * 11 + 3) % 300)  # an outlink of page 1
    spec_smart = CrawlSpec(
        n_pages=300,
        seeds=[datagen.url(1)],
        max_urls=20,
        batch_size=4,
        priority_patterns=[target.lower()],
    )
    out_smart = run_oracle(spec_smart)
    assert out_smart["visit_order"] != out_fifo["visit_order"]
    # the prioritized URL is visited earlier in smart mode
    def pos(out, frag):
        for s, u, _ in out["visit_order"]:
            if frag in u:
                return s
        return 10**9

    assert pos(out_smart, target) <= pos(out_fifo, target)


def test_oracle_politeness_quota():
    spec = CrawlSpec(
        n_pages=300,
        seeds=[datagen.url(1)],
        max_urls=30,
        batch_size=10,
        politeness_per_wave=1,
    )
    out = run_oracle(spec)
    # within each wave every host appears at most once (quota = 1)
    waves = {}
    for r in out["audit"]:
        waves.setdefault(r["wave"], []).append(
            r["url"].partition("://")[2].partition("/")[0]
        )
    assert len(waves) > 1
    for hosts in waves.values():
        assert len(hosts) == len(set(hosts))


def test_oracle_error_rows_count_toward_budget():
    # page 59 is an ERROR page; crawl seeded there yields one error row
    spec = CrawlSpec(n_pages=300, seeds=[datagen.url(59)], max_urls=5)
    out = run_oracle(spec)
    assert out["audit"][0]["status_code"] == "ERROR"
    assert out["audit"][0]["links_encontrados"] == []
    assert len(out["audit"]) == 1  # error page has no links → crawl ends


def test_oracle_duplicate_flags_visit_order():
    # find two pages with identical titles both reachable; instead run a
    # wide crawl and check: first occurrence of every duplicated title is
    # unflagged, later ones flagged
    spec = CrawlSpec(n_pages=300, seeds=[datagen.url(0)], max_urls=120, batch_size=16)
    out = run_oracle(spec)
    seen_titles = {}
    for r in out["audit"]:
        if not r.get("processed"):
            continue
        t = r["title"]
        if not t:
            assert r["title_duplicado"] is False
            continue
        if t in seen_titles:
            assert r["title_duplicado"] is True
        else:
            assert r["title_duplicado"] is False
            seen_titles[t] = r["visit_seq"]
