"""Cuckoo-filter prefilter (state/cuckoo.py): unit properties + engine
parity with EngineConfig(seen_prefilter="cuckoo").

north_rule: "partitioned Bloom/cuckoo URL-seen filter over canonicalized
URL hashes" — the cuckoo variant must behave identically at the
admission boundary (the exact set keeps semantics; the filter is a
prefilter) and additionally support deletion.
"""

import numpy as np
import pytest

from crawler_seo_ray import datagen
from crawler_seo_ray.canon import url_digest
from crawler_seo_ray.oracle import run_oracle
from crawler_seo_ray.pipelines.crawl import EngineConfig, run_crawl
from crawler_seo_ray.state.bloom import digest_halves
from crawler_seo_ray.state.cuckoo import CuckooFilter

from test_engine import _compare, _spec


def _hashes(keys):
    return digest_halves([url_digest(k) for k in keys])


def test_cuckoo_no_false_negatives_and_fp_bound():
    cf = CuckooFilter(20_000)
    ins = [f"https://h{i % 37}.example.test/p/{i}" for i in range(10_000)]
    h1, h2 = _hashes(ins)
    cf.add_many(h1, h2)
    assert cf.contains_many(h1, h2).all()  # inserted keys always hit
    fresh = [f"https://h{i % 37}.example.test/q/{i}" for i in range(10_000)]
    f1, f2 = _hashes(fresh)
    fp_rate = cf.contains_many(f1, f2).mean()
    # 16-bit fingerprints, b=4: theoretical fp ≈ 2*4/2^16 ≈ 0.012%
    assert fp_rate < 0.005, fp_rate


def test_cuckoo_delete_restores_absence():
    cf = CuckooFilter(5_000)
    keys = [f"https://d.example.test/{i}" for i in range(2_000)]
    h1, h2 = _hashes(keys)
    cf.add_many(h1, h2)
    # delete the even half; odd half must remain, even half must miss
    # (no other inserted key collides at 16-bit fp in both buckets here —
    # asserted by the exact membership checks below)
    found = cf.delete_many(h1[::2], h2[::2])
    assert found.all()
    assert cf.contains_many(h1[1::2], h2[1::2]).all()
    miss = cf.contains_many(h1[::2], h2[::2])
    # residual hits are only fp collisions with the surviving half
    assert miss.mean() < 0.005
    # re-inserting after delete works and size bookkeeping balances
    cf.add_many(h1[::2], h2[::2])
    assert cf.size == 2_000
    assert cf.contains_many(h1, h2).all()


def test_cuckoo_over_capacity_raises():
    cf = CuckooFilter(64)  # tiny: m buckets fixed at construction
    keys = [f"https://o.example.test/{i}" for i in range(100_000)]
    h1, h2 = _hashes(keys)
    with pytest.raises(RuntimeError, match="over capacity"):
        cf.add_many(h1, h2)


def test_cuckoo_snapshot_restore_roundtrip():
    cf = CuckooFilter(5_000)
    keys = [f"https://s.example.test/{i}" for i in range(3_000)]
    h1, h2 = _hashes(keys)
    cf.add_many(h1, h2)
    snap = cf.snapshot()
    cf2 = CuckooFilter(5_000)
    cf2.restore(snap)
    assert np.array_equal(cf.table, cf2.table)
    assert cf2.contains_many(h1, h2).all()


@pytest.mark.usefixtures("ray_session")
def test_engine_matches_oracle_with_cuckoo_prefilter(small_corpus):
    corpus_dir, _ = small_corpus
    spec = _spec(max_urls=60, batch_size=16)
    ora = run_oracle(spec)
    res = run_crawl(
        spec,
        corpus_dir,
        EngineConfig(num_workers=3, num_seen_shards=3, seen_prefilter="cuckoo"),
    )
    _compare(res, ora)


@pytest.mark.usefixtures("ray_session")
def test_cuckoo_shard_probe_no_false_negatives(small_corpus):
    import ray

    from crawler_seo_ray.state.seen import SeenShard

    shard = SeenShard.remote(0, bloom_capacity=10_000, prefilter="cuckoo")
    urls = [datagen.url(i) for i in range(400)]
    ray.get(shard.admit.remote(urls, list(range(400))))
    hits = ray.get(shard.probe_bloom.remote(urls))
    assert all(hits)
    fresh = [datagen.url(i) + "?x=1" for i in range(400, 500)]
    fp = sum(ray.get(shard.probe_bloom.remote(fresh)))
    assert fp <= 2  # 16-bit fingerprints: fp ≈ 0.01%
    ray.kill(shard)


@pytest.mark.usefixtures("ray_session")
def test_evict_enables_recrawl_and_bloom_refuses(small_corpus):
    import ray

    from crawler_seo_ray.state.seen import SeenShard

    shard = SeenShard.remote(0, bloom_capacity=10_000, prefilter="cuckoo")
    urls = [datagen.url(i) for i in range(50)]
    first = ray.get(shard.admit.remote(urls, list(range(50))))
    assert len(first) == 50
    # same URLs again: all duplicates
    assert ray.get(shard.admit.remote(urls, list(range(50)))) == []
    # TTL sweep evicts half; those (and only those) re-admit
    n = ray.get(shard.evict.remote(urls[:25]))
    assert n == 25
    assert ray.get(shard.count.remote()) == 25
    readmit = ray.get(shard.admit.remote(urls, list(range(50))))
    assert sorted(readmit) == list(range(25))
    # prefilter agrees after the round-trip: everything registered again
    assert all(ray.get(shard.probe_bloom.remote(urls)))
    ray.kill(shard)

    bloom_shard = SeenShard.remote(1, prefilter="bloom")
    ray.get(bloom_shard.admit.remote(urls[:5], list(range(5))))
    with pytest.raises(ray.exceptions.RayTaskError, match="deletion-capable"):
        ray.get(bloom_shard.evict.remote(urls[:5]))
    ray.kill(bloom_shard)


def test_cuckoo_overflow_leaves_no_state_mutated():
    """Over-capacity add_many must raise BEFORE inserting anything —
    a partial batch would leave a caller's exact set holding keys the
    prefilter lacks (permanent false negative, ADVICE r03)."""
    cf = CuckooFilter(64)
    ok = [f"https://c.example.test/{i}" for i in range(50)]
    h1, h2 = _hashes(ok)
    cf.add_many(h1, h2)
    before = cf.table.copy()
    size_before = cf.size
    big = [f"https://c.example.test/ov/{i}" for i in range(100_000)]
    b1, b2 = _hashes(big)
    with pytest.raises(RuntimeError, match="over capacity"):
        cf.add_many(b1, b2)
    assert cf.size == size_before
    assert np.array_equal(cf.table, before)
    assert cf.contains_many(h1, h2).all()


@pytest.mark.usefixtures("ray_session")
def test_shard_admit_overflow_keeps_prefilter_consistent():
    """If the cuckoo prefilter overflows during admit, the exact set
    must NOT have committed the batch: every exact-set member must
    still be present in the prefilter (no-false-negative contract the
    probe-skip scale path depends on)."""
    import ray

    from crawler_seo_ray.state.seen import SeenShard

    # tiny prefilter: ~67 slot ceiling at 0.95 load
    shard = SeenShard.remote(0, bloom_capacity=64, prefilter="cuckoo")
    first = [datagen.url(i) for i in range(40)]
    assert len(ray.get(shard.admit.remote(first, list(range(40))))) == 40
    big = [datagen.url(i) for i in range(1000, 1400)]
    with pytest.raises(ray.exceptions.RayTaskError, match="over capacity"):
        ray.get(shard.admit.remote(big, list(range(400))))
    # contract: exact set unchanged by the failed batch, and every
    # exact member still answers True from the prefilter
    assert ray.get(shard.count.remote()) == 40
    assert all(ray.get(shard.probe_bloom.remote(first)))
    ray.kill(shard)


def test_cuckoo_churn_at_ceiling_no_false_negatives():
    """Adversarial occupancy churn (VERDICT r4 #8, 10× prior scale):
    fill a 200k-capacity filter to its constructed ceiling, then run
    eviction/re-admission rounds — delete a third of the live set,
    admit the same count of never-seen keys — asserting after EVERY
    round that (a) every live key still hits (the no-false-negative
    invariant the SeenShard exact-set guard relies on), (b) every
    delete found its fingerprint, and (c) occupancy never exceeds the
    documented 0.95 b=4 ceiling."""
    cap = 200_000
    cf = CuckooFilter(cap)

    def hashes(lo, hi):
        return _hashes([f"https://c{i % 997}.example.test/churn/{i}" for i in range(lo, hi)])

    h1, h2 = hashes(0, cap)
    cf.add_many(h1, h2)
    assert cf.contains_many(h1, h2).all()
    live1, live2 = h1, h2
    nxt = cap
    for _ in range(4):
        third = live1.size // 3
        found = cf.delete_many(live1[:third], live2[:third])
        assert found.all(), "delete missed an inserted fingerprint"
        live1, live2 = live1[third:], live2[third:]
        assert cf.contains_many(live1, live2).all(), "false negative after evict"
        f1, f2 = hashes(nxt, nxt + third)
        nxt += third
        cf.add_many(f1, f2)
        live1 = np.concatenate([live1, f1])
        live2 = np.concatenate([live2, f2])
        assert cf.contains_many(live1, live2).all(), "false negative after re-admit"
        assert cf.size == live1.size
        assert cf.size <= cf.m * cf.bucket_size * 0.95 + 1
