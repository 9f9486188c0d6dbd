"""Unit semantics for the temporal/range join, streaming exact
quantile, and HLL sketch stages (the SQL-pair conformance at sf0.001
lives in test_queries.py; these pin edge cases and conventions)."""

import numpy as np
import pyarrow as pa
import pytest


def _tbl_to_rows(tbl):
    return sorted(map(tuple, zip(*[c.to_pylist() for c in tbl.columns])))


@pytest.mark.usefixtures("ray_session")
def test_asof_join_semantics():
    import ray.data as rd

    from crawler_seo_ray.stages.joins import asof_join
    from crawler_seo_ray.util import collect_arrow

    ts = pa.timestamp("us")
    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 2, 3], pa.int64()),
                "t": pa.array([100, 5, 50, 10], ts),
                "lid": pa.array([10, 11, 12, 13], pa.int64()),
            }
        )
    )
    # key 1: rows at ts 10 and two ties at ts 40 (rid 7 wins: max tiebreak)
    # key 2: only row AFTER the left ts (no match); key 9: right-only
    right = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 1, 2, 9], pa.int64()),
                "rt": pa.array([10, 40, 40, 60, 1], ts),
                "rid": pa.array([5, 6, 7, 8, 9], pa.int64()),
            }
        )
    )
    out = collect_arrow(
        asof_join(left, right, key="k", left_ts="t", right_ts="rt",
                  left_cols=["lid"], right_cols=["rid"])
    )
    got = {r[2]: r[3] for r in zip(*[c.to_pylist() for c in out.columns])}  # lid -> rid
    assert out.column_names == ["k", "t", "lid", "rid"]
    assert out.schema.field("t").type == ts
    assert got == {10: 7, 11: None, 12: None, 13: None}
    assert out.num_rows == 4  # every left row kept, right-only key dropped


@pytest.mark.usefixtures("ray_session")
def test_asof_join_property_vs_pandas():
    """Property check against pandas merge_asof (independent reference
    implementation) over randomized key/ts collisions — max-tiebreak on
    equal right timestamps is resolved identically because the right
    side is pre-sorted by (ts, rid) and merge_asof takes the last."""
    import pandas as pd
    import ray.data as rd

    from crawler_seo_ray.stages.joins import asof_join
    from crawler_seo_ray.util import collect_arrow

    rng = np.random.RandomState(42)
    for trial in range(3):
        nl, nr = 120, 80
        lk = rng.randint(0, 6, nl)
        lt = rng.randint(0, 50, nl)
        rk = rng.randint(0, 8, nr)  # some right-only keys
        rt = rng.randint(0, 50, nr)  # heavy ts collisions
        ts = pa.timestamp("us")
        left = pa.table(
            {
                "k": pa.array(lk, pa.int64()),
                "t": pa.array(lt, ts),
                "lid": pa.array(np.arange(nl), pa.int64()),
            }
        )
        right = pa.table(
            {
                "k": pa.array(rk, pa.int64()),
                "rt": pa.array(rt, ts),
                "rid": pa.array(np.arange(nr), pa.int64()),
            }
        )
        out = collect_arrow(
            asof_join(
                rd.from_arrow(left).repartition(4),
                rd.from_arrow(right).repartition(3),
                key="k", left_ts="t", right_ts="rt",
                left_cols=["lid"], right_cols=["rid"],
            )
        ).to_pandas().sort_values("lid", ignore_index=True)
        ldf = left.to_pandas().sort_values("t", kind="mergesort", ignore_index=True)
        rdf = (
            right.to_pandas()
            .sort_values(["rt", "rid"], kind="mergesort", ignore_index=True)
            .sort_values("rt", kind="mergesort", ignore_index=True)
        )
        want = (
            pd.merge_asof(ldf, rdf, left_on="t", right_on="rt", by="k", direction="backward")
            .sort_values("lid", ignore_index=True)
        )
        got_map = dict(
            zip(out["lid"], [None if pd.isna(v) else int(v) for v in out["rid"]])
        )
        want_map = dict(
            zip(want["lid"], [None if pd.isna(v) else int(v) for v in want["rid"]])
        )
        assert got_map == want_map, trial


@pytest.mark.usefixtures("ray_session")
def test_band_by_edges_bounds():
    import ray.data as rd

    from crawler_seo_ray.stages.joins import band_by_edges
    from crawler_seo_ray.util import collect_arrow

    ds = rd.from_arrow(pa.table({"v": pa.array([-1.0, 0.0, 9.9, 10.0, 25.0, 30.0], pa.float64())}))
    out = collect_arrow(band_by_edges(ds, "v", [0.0, 10.0, 30.0], ["lo", "hi"]))
    by_v = dict(zip(out.column("v").to_pylist(), out.column("band").to_pylist()))
    assert by_v == {-1.0: None, 0.0: "lo", 9.9: "lo", 10.0: "hi", 25.0: "hi", 30.0: None}


@pytest.mark.usefixtures("ray_session")
def test_grouped_quantile_matches_sorted_rank():
    """Histogram refinement must equal the direct sorted-rank pick
    (DuckDB quantile_disc convention: 1-based rank ceil(q*n)) — wide
    value range forces at least two refinement passes."""
    import ray.data as rd

    from crawler_seo_ray.stages.quantile import grouped_quantile_disc

    rng = np.random.RandomState(7)
    gs, vs = [], []
    for g, n in (("a", 1000), ("b", 37), ("c", 1)):
        gs += [g] * n
        vs += rng.randint(-(10**9), 10**9, size=n).tolist()
    ds = rd.from_arrow(
        pa.table({"g": pa.array(gs), "v": pa.array(vs, pa.int64())})
    ).repartition(5)
    qs = [0.25, 0.5, 0.75, 0.95]
    out = grouped_quantile_disc(ds, "g", "v", qs)
    arr = np.array(vs)
    garr = np.array(gs)
    for i, g in enumerate(out.column("g").to_pylist()):
        sv = np.sort(arr[garr == g])
        for q in qs:
            want = int(sv[int(np.ceil(q * len(sv))) - 1])
            gotv = out.column(f"q{int(round(q*100))}")[i].as_py()
            assert gotv == want, (g, q, gotv, want)


@pytest.mark.usefixtures("ray_session")
def test_grouped_quantile_cont_matches_numpy_interpolation():
    """Continuous quantiles must equal numpy's 'linear' interpolation
    (the quantile_cont convention) for every group — including n=1
    groups (degenerate brackets), frac=0 positions (exact order
    statistics), and duplicate-heavy values (rank dedup shares one
    refinement task between bracketing ranks)."""
    import ray.data as rd

    from crawler_seo_ray.stages.quantile import grouped_quantile_cont

    rng = np.random.RandomState(11)
    gs, vs = [], []
    for g, n in (("a", 1001), ("b", 40), ("c", 1), ("d", 5)):
        gs += [g] * n
        # group b: heavy duplicates so lo/hi brackets often coincide
        pool = rng.randint(-5, 5, size=n) if g == "b" else rng.randint(
            -(10**9), 10**9, size=n
        )
        vs += pool.tolist()
    ds = rd.from_arrow(
        pa.table({"g": pa.array(gs), "v": pa.array(vs, pa.int64())})
    ).repartition(5)
    qs = [0.25, 0.5, 0.75]
    out = grouped_quantile_cont(ds, "g", "v", qs)
    arr, garr = np.array(vs, dtype=np.float64), np.array(gs)
    for i, g in enumerate(out.column("g").to_pylist()):
        sv = arr[garr == g]
        for q in qs:
            want = float(np.quantile(sv, q, method="linear"))
            got = out.column(f"q{int(round(q*100))}")[i].as_py()
            assert got == pytest.approx(want, rel=0, abs=1e-9), (g, q, got, want)


@pytest.mark.usefixtures("ray_session")
def test_grouped_quantile_full_int64_range():
    """Regression: spans near 2^64 overflowed the old (v-lo)*NBINS
    binning — hash-valued columns exercise the full int64 range."""
    import ray.data as rd

    from crawler_seo_ray.stages.quantile import grouped_quantile_disc

    rng = np.random.RandomState(11)
    vs = np.concatenate(
        [
            np.array([np.iinfo(np.int64).min, np.iinfo(np.int64).max, 0]),
            rng.randint(np.iinfo(np.int64).min, np.iinfo(np.int64).max, size=997),
        ]
    )
    ds = rd.from_arrow(
        pa.table({"g": pa.array(["h"] * len(vs)), "v": pa.array(vs, pa.int64())})
    ).repartition(4)
    out = grouped_quantile_disc(ds, "g", "v", [0.25, 0.5, 0.95])
    sv = np.sort(vs)
    for q in (0.25, 0.5, 0.95):
        want = int(sv[int(np.ceil(q * len(sv))) - 1])
        assert out.column(f"q{int(round(q*100))}")[0].as_py() == want, q


@pytest.mark.usefixtures("ray_session")
def test_kmeans_deterministic_and_label_coherent():
    """Seeded k-means must be run-to-run identical, and embeddings
    sharing a synthetic label (the generator clusters vectors by label)
    should mostly land in the same k-means cluster."""
    from collections import Counter

    from crawler_seo_ray import queries as Q

    sf = "/root/testdata/sf0.001"
    a = Q.QUERIES["embeddings_kmeans"](sf).to_pandas().sort_values("vec_id", ignore_index=True)
    b = Q.QUERIES["embeddings_kmeans"](sf).to_pandas().sort_values("vec_id", ignore_index=True)
    assert a.equals(b)
    assert a["cluster"].nunique() > 1
    # quality: the assigned centroid must beat a rotated (shuffled)
    # assignment on mean cosine — k-means found real structure (the
    # synthetic labels themselves are only weakly geometric, so label
    # purity is NOT a valid invariant here)
    import pandas as pd

    from crawler_seo_ray.stages.similarity import _normalize, train_centroids
    import ray.data as rd

    emb = pd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    ds = rd.from_pandas(emb)
    cent = train_centroids(ds, "embedding", 8)
    X = _normalize(np.array(emb.sort_values("vec_id").embedding.tolist(), dtype=np.float64))
    cl = a["cluster"].to_numpy()
    assigned = (X * cent[cl]).sum(axis=1).mean()
    rotated = (X * cent[(cl + 3) % 8]).sum(axis=1).mean()
    assert assigned > rotated + 0.01, (assigned, rotated)
    _ = Counter(cl)  # all clusters reachable
    assert len(_) > 1


@pytest.mark.usefixtures("ray_session")
def test_hll_error_bound_and_determinism():
    import ray.data as rd

    from crawler_seo_ray.stages.sketch import grouped_hll

    rng = np.random.RandomState(3)
    rows_g, rows_v = [], []
    truth = {"big": 5000, "small": 100, "one": 1}
    for g, n in truth.items():
        ids = rng.randint(0, 10**12, size=n)
        for _ in range(2):  # duplicates must not inflate the estimate
            rows_g += [g] * n
            rows_v += ids.tolist()
    ds = rd.from_arrow(
        pa.table({"g": pa.array(rows_g), "v": pa.array(rows_v, pa.int64())})
    ).repartition(7)
    t1 = grouped_hll(ds, "g", "v", p=12)
    t2 = grouped_hll(ds, "g", "v", p=12)
    assert t1.equals(t2)  # deterministic hash + max-merge
    est = dict(zip(t1.column("g").to_pylist(), t1.column("approx_distinct").to_pylist()))
    for g, n in truth.items():
        assert abs(est[g] - n) <= max(2, 0.05 * n), (g, est[g], n)


def test_bloom_filter_no_false_negatives_and_low_fpr():
    """Inserted keys ALWAYS test positive (correctness contract the
    exact-verify stage relies on: it only ever removes rows); absent
    keys pass at ≈ the designed false-positive rate (~4e-4 at 16
    bits/key — assert a loose 1% ceiling)."""
    from crawler_seo_ray.stages.bloom import (
        bloom_contains,
        bloom_params,
        build_bloom,
    )

    rng = np.random.default_rng(7)
    members = rng.choice(2**62, size=5000, replace=False).astype(np.uint64)
    m_bits, k = bloom_params(len(members))
    bits = build_bloom(members, m_bits, k)
    assert bloom_contains(bits, members, m_bits, k).all()

    absent = (members + np.uint64(1)).astype(np.uint64)
    absent = np.setdiff1d(absent, members)
    fpr = bloom_contains(bits, absent, m_bits, k).mean()
    assert fpr < 0.01, fpr


def test_bloom_partial_or_merge_equals_single_build():
    """Bitwise-OR is the combiner: per-block partial filters OR'd
    together give the identical bitset a single build produces — the
    property that lets the small side's filter build distribute."""
    from crawler_seo_ray.stages.bloom import (
        bloom_params,
        build_bloom,
        or_bloom_inplace,
    )

    rng = np.random.default_rng(11)
    keys = rng.choice(2**62, size=2000, replace=False).astype(np.uint64)
    m_bits, k = bloom_params(len(keys))
    whole = build_bloom(keys, m_bits, k)
    merged = np.zeros(m_bits // 64, dtype=np.uint64)
    for chunk in np.array_split(keys, 7):
        or_bloom_inplace(merged, chunk, m_bits, k)
    assert (whole == merged).all()


@pytest.mark.usefixtures("ray_session")
def test_quantile_sketch_rank_error_bound_and_determinism():
    """The two-level compression guarantees rank error ≤ 2n/m; assert a
    3n/m cushion against the exact sorted ranks, and bit-identical
    output across runs (deterministic compression, no RNG)."""
    import ray.data as rd

    from crawler_seo_ray.stages.sketch import quantile_sketch

    rng = np.random.default_rng(13)
    vals = np.concatenate(
        [rng.lognormal(3, 1, 20_000), rng.uniform(0, 5, 5_000)]
    )
    ds = rd.from_arrow(pa.table({"x": pa.array(vals)})).repartition(8)
    qs = [0.25, 0.5, 0.9, 0.99]
    m = 512
    out = quantile_sketch(ds, "x", qs, m=m)
    out2 = quantile_sketch(ds, "x", qs, m=m)
    assert out.equals(out2)
    s = np.sort(vals)
    n = len(s)
    for q, v in zip(out.column("q").to_pylist(), out.column("value").to_pylist()):
        approx_rank = np.searchsorted(s, v, side="left")
        assert abs(approx_rank - q * n) <= 3 * n / m + 1, (q, v, approx_rank)


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_certifies_skew_and_refuses_uniform():
    """heavy_hitters must certify (and be exact) when the per-block
    capacity keeps every true heavy item, and must NOT certify when a
    uniform vocabulary makes block-local top-k unreliable."""
    import ray.data as rd

    from crawler_seo_ray.stages.sketch import heavy_hitters

    rng = np.random.default_rng(3)
    # skewed: 5 heavy items dominate a 200-item tail
    heavy = np.repeat([f"h{i}" for i in range(5)], [900, 700, 500, 300, 200])
    tail = rng.choice([f"t{i:03d}" for i in range(200)], size=2000)
    items = np.concatenate([heavy, tail])
    rng.shuffle(items)
    ds = rd.from_arrow(
        pa.table({"item": pa.array(items.tolist(), pa.string())})
    ).repartition(8)
    out = heavy_hitters(ds, "item", k=5, capacity=64)
    assert out["certified"]
    got = list(zip(out["table"].column("item").to_pylist(),
                   out["table"].column("n").to_pylist()))
    assert got == [("h0", 900), ("h1", 700), ("h2", 500), ("h3", 300), ("h4", 200)]
    # exact-bound invariant: certified counts equal brute counts
    from collections import Counter

    brute = Counter(items.tolist())
    assert all(brute[i] == n for i, n in got)

    # uniform vocabulary ≫ capacity: bounds overlap, must refuse
    uni = rng.choice([f"u{i:04d}" for i in range(3000)], size=6000)
    ds_u = rd.from_arrow(
        pa.table({"item": pa.array(uni.tolist(), pa.string())})
    ).repartition(8)
    out_u = heavy_hitters(ds_u, "item", k=5, capacity=16)
    assert not out_u["certified"]
    # bounds stay sound even when uncertified: lower ≤ true ≤ upper
    b = out_u["bounds"]
    bc = Counter(uni.tolist())
    for item, lo, up in zip(b.column("item").to_pylist(),
                            b.column("lower").to_pylist(),
                            b.column("upper").to_pylist()):
        assert lo <= bc[item] <= up


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_certified_implies_exact_property():
    """Property: over random distributions, capacities and k, whenever
    heavy_hitters certifies, its answer equals the brute-force exact
    top-k (set, counts AND order); and its bounds always contain the
    true counts. Hypothesis-style sweep with a fixed seed grid (a Ray
    Dataset per example keeps the example count modest)."""
    from collections import Counter

    import ray.data as rd

    from crawler_seo_ray.stages.sketch import heavy_hitters

    n_certified = 0
    for seed in range(12):
        rng = np.random.default_rng(seed)
        vocab = int(rng.integers(5, 120))
        n = int(rng.integers(100, 1500))
        # mixture: zipf-ish skew with random weights
        w = 1.0 / np.arange(1, vocab + 1) ** rng.uniform(0.3, 2.0)
        items = rng.choice(
            [f"i{j:03d}" for j in range(vocab)], size=n, p=w / w.sum()
        )
        k = int(rng.integers(1, 6))
        capacity = int(rng.integers(2, 40))
        ds = rd.from_arrow(
            pa.table({"item": pa.array(items.tolist(), pa.string())})
        ).repartition(int(rng.integers(1, 6)))
        out = heavy_hitters(ds, "item", k=k, capacity=capacity)
        brute = Counter(items.tolist())
        # bounds soundness, unconditionally
        for item, lo, up in zip(
            out["bounds"].column("item").to_pylist(),
            out["bounds"].column("lower").to_pylist(),
            out["bounds"].column("upper").to_pylist(),
        ):
            assert lo <= brute[item] <= up, (seed, item)
        if out["certified"]:
            n_certified += 1
            exact = sorted(brute.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
            got = list(
                zip(
                    out["table"].column("item").to_pylist(),
                    out["table"].column("n").to_pylist(),
                )
            )
            assert got == exact, (seed, k, capacity)
    assert n_certified >= 3  # the sweep must actually exercise the claim


@pytest.mark.usefixtures("ray_session")
def test_pagerank_matches_dense_power_iteration():
    """Distributed join+groupby PageRank equals the dense numpy power
    iteration (same damping, same round count, same dangling rule) on
    random digraphs with planted dangling nodes and duplicate edges."""
    import ray.data as rd

    from crawler_seo_ray.stages.graph import pagerank

    for seed in (7, 11):
        rng = np.random.default_rng(seed)
        n, m = 40, 160
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        keep = ~np.isin(src, [0, 1, 2, 3, 4])  # nodes 0-4 become dangling
        src, dst = src[keep], dst[keep]
        ids = np.array([f"n{i:03d}" for i in range(n)])
        edges = rd.from_arrow(
            pa.table({"src": pa.array(ids[src]), "dst": pa.array(ids[dst])})
        )
        # distributed rounds (driver_edge_limit=0 forces them) AND the
        # dense driver path must both match the reference
        out = pagerank(edges, damping=0.85, iterations=15, driver_edge_limit=0)
        got = dict(zip(out.column("id").to_pylist(), out.column("rank").to_pylist()))
        dense = pagerank(edges, damping=0.85, iterations=15)
        got_dense = dict(
            zip(dense.column("id").to_pylist(), dense.column("rank").to_pylist())
        )

        univ = sorted(set(ids[src]) | set(ids[dst]))
        idx = {u: i for i, u in enumerate(univ)}
        N = len(univ)
        deg = np.zeros(N)
        for s in ids[src]:
            deg[idx[s]] += 1
        r = np.full(N, 1.0 / N)
        for _ in range(15):
            dang = r[deg == 0].sum()
            nxt = np.zeros(N)
            for s, d in zip(ids[src], ids[dst]):
                nxt[idx[d]] += r[idx[s]] / deg[idx[s]]
            r = 0.15 / N + 0.85 * (nxt + dang / N)
        assert set(got) == set(univ) == set(got_dense)
        err = max(abs(got[u] - r[idx[u]]) for u in univ)
        assert err < 1e-12, (seed, err)
        err_d = max(abs(got_dense[u] - r[idx[u]]) for u in univ)
        assert err_d < 1e-12, (seed, err_d)
        assert abs(sum(got.values()) - 1.0) < 1e-9
        # output is sorted by rank desc, id asc
        ranks = out.column("rank").to_pylist()
        assert ranks == sorted(ranks, reverse=True)


@pytest.mark.usefixtures("ray_session")
def test_global_row_number_exact_across_blocks():
    """Range-sorted block stamping assigns exactly the lexsort ranks
    regardless of input block layout; cume_dist = rn/N."""
    import ray.data as rd

    from crawler_seo_ray.stages.window import global_row_number

    rng = np.random.default_rng(3)
    n = 2000
    vals = rng.integers(0, 50, n)  # heavy ties → tiebreak column matters
    keys = rng.permutation(n).astype(np.int64)
    for blocks in (1, 7, 32):
        ds = rd.from_arrow(
            pa.table({"k": pa.array(keys), "v": pa.array(vals)})
        ).repartition(blocks)
        out = global_row_number(ds, ["v", "k"], out_col="rn", cume_col="cume")
        df = out.to_pandas().sort_values("k").reset_index(drop=True)
        expect = np.empty(n, np.int64)
        expect[np.lexsort((keys, vals))] = np.arange(1, n + 1)
        by_key = df.set_index("k")
        got = by_key.loc[keys, "rn"].to_numpy()
        assert (got == expect).all(), blocks
        assert np.array_equal(
            by_key["cume"].to_numpy(), by_key["rn"].to_numpy() / float(n)
        )


@pytest.mark.usefixtures("ray_session")
def test_drop_empty_blocks_groupby_join():
    """The Ray 2.49 landmine: hash aggregates emit zero-column blocks
    for empty hash partitions, and a downstream Dataset.join aborts on
    them ("No match ... for key field reference"). drop_empty_blocks
    strips them at the block-ref level (no rows collected) and the join
    result is exactly the aggregate."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from crawler_seo_ray.util import drop_empty_blocks

    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1] * 50 + [2] * 50, pa.int64()),
                "v": pa.array(range(100), pa.int64()),
            }
        )
    ).repartition(5)
    agg = drop_empty_blocks(ds.groupby("k").aggregate(Sum("v", alias_name="s")))
    other = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "w": pa.array([10, 20, 30], pa.int64())})
    )
    out = agg.join(other, "inner", 4, on=("k",)).to_pandas().sort_values("k")
    assert out["k"].tolist() == [1, 2]
    assert out["s"].tolist() == [sum(range(50)), sum(range(50, 100))]
    assert out["w"].tolist() == [10, 20]


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_paths_agree_with_brute_force():
    """Distributed wedge-join path (driver_edge_limit=0), dense CSR
    path, and an O(n·m) brute force must count identically on random
    oriented graphs."""
    import ray.data as rd

    from crawler_seo_ray.stages.graph import _triangles_dense, triangle_count

    for seed in (5, 9):
        rng = np.random.default_rng(seed)
        n, m = 60, 500
        a = rng.integers(0, n, m)
        b = rng.integers(0, n, m)
        keep = a < b
        et = pa.table(
            {"p1": pa.array(a[keep], pa.int64()), "p2": pa.array(b[keep], pa.int64())}
        ).group_by(["p1", "p2"]).aggregate([])
        ds = rd.from_arrow(et).repartition(4)
        dist = triangle_count(ds, num_partitions=4, driver_edge_limit=0)
        dense = _triangles_dense(et)
        E = set(zip(et.column("p1").to_pylist(), et.column("p2").to_pylist()))
        brute = sum(
            1 for (x, y) in E for z in range(n) if (y, z) in E and (x, z) in E
        )
        assert dist == dense == brute, (seed, dist, dense, brute)


@pytest.mark.usefixtures("ray_session")
def test_asof_join_forward_and_nearest_property():
    """forward matches pandas merge_asof(direction='forward') (first of
    a tie run = min rid, same as the pre-sorted right side); nearest is
    checked against a brute-force of its documented rule ORDER BY
    (|Δts|, rt, rid) — heavy key/ts collisions included."""
    import pandas as pd
    import ray.data as rd

    from crawler_seo_ray.stages.joins import asof_join
    from crawler_seo_ray.util import collect_arrow

    rng = np.random.RandomState(7)
    for trial in range(3):
        nl, nr = 120, 80
        lk = rng.randint(0, 6, nl)
        lt = rng.randint(0, 50, nl)
        rk = rng.randint(0, 8, nr)
        rt = rng.randint(0, 50, nr)
        ts = pa.timestamp("us")
        left = pa.table(
            {"k": pa.array(lk, pa.int64()), "t": pa.array(lt, ts),
             "lid": pa.array(np.arange(nl), pa.int64())}
        )
        right = pa.table(
            {"k": pa.array(rk, pa.int64()), "rt": pa.array(rt, ts),
             "rid": pa.array(np.arange(nr), pa.int64())}
        )

        def run(direction):
            out = collect_arrow(
                asof_join(
                    rd.from_arrow(left).repartition(4),
                    rd.from_arrow(right).repartition(3),
                    key="k", left_ts="t", right_ts="rt",
                    left_cols=["lid"], right_cols=["rid"], direction=direction,
                )
            ).to_pandas()
            return dict(
                zip(out["lid"], [None if pd.isna(v) else int(v) for v in out["rid"]])
            )

        # forward vs pandas
        ldf = left.to_pandas().sort_values("t", kind="mergesort", ignore_index=True)
        rdf = right.to_pandas().sort_values(
            ["rt", "rid"], kind="mergesort", ignore_index=True
        )
        want = pd.merge_asof(
            ldf, rdf, left_on="t", right_on="rt", by="k", direction="forward"
        )
        want_map = dict(
            zip(want["lid"], [None if pd.isna(v) else int(v) for v in want["rid"]])
        )
        assert run("forward") == want_map, ("forward", trial)

        # nearest vs brute force of the documented rule
        brute = {}
        for i in range(nl):
            cand = [
                (abs(int(rt[j]) - int(lt[i])), int(rt[j]), j)
                for j in range(nr)
                if rk[j] == lk[i]
            ]
            brute[i] = min(cand)[2] if cand else None
        assert run("nearest") == brute, ("nearest", trial)


@pytest.mark.usefixtures("ray_session")
def test_hits_matches_dense_reference():
    """Distributed join+groupby HITS equals the dense numpy mutual
    recursion (same round count, same L1 normalization) on random
    digraphs, via both the dense and the forced-distributed path."""
    import ray.data as rd

    from crawler_seo_ray.stages.graph import hits

    for seed in (3,):
        rng = np.random.default_rng(seed)
        n, m = 30, 120
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        ids = np.array([f"n{i:03d}" for i in range(n)])
        edges = rd.from_arrow(
            pa.table({"src": pa.array(ids[src]), "dst": pa.array(ids[dst])})
        )
        # 6 rounds keeps the forced-distributed path (24 joins) cheap;
        # equality is per-round, not at convergence
        hub_d, auth_d = hits(edges, iterations=6, driver_edge_limit=0)
        hub, auth = hits(edges, iterations=6)

        univ = sorted(set(ids[src]) | set(ids[dst]))
        idx = {u: i for i, u in enumerate(univ)}
        N = len(univ)
        h = np.full(N, 1.0 / N)
        a = np.full(N, 1.0 / N)
        for _ in range(6):
            a_new = np.zeros(N)
            for s, d in zip(ids[src], ids[dst]):
                a_new[idx[d]] += h[idx[s]]
            a = a_new / a_new.sum()
            h_new = np.zeros(N)
            for s, d in zip(ids[src], ids[dst]):
                h_new[idx[s]] += a[idx[d]]
            h = h_new / h_new.sum()

        for table, ref in ((hub, h), (auth, a), (hub_d, h), (auth_d, a)):
            got = dict(
                zip(table.column("id").to_pylist(), table.column("score").to_pylist())
            )
            assert set(got) == set(univ)
            for u in univ:
                assert abs(got[u] - ref[idx[u]]) < 1e-9, (u, got[u], ref[idx[u]])
        assert abs(sum(hub.column("score").to_pylist()) - 1.0) < 1e-9
        assert abs(sum(auth.column("score").to_pylist()) - 1.0) < 1e-9


def test_count_min_bounds_and_block_invariance():
    """CMS never undercounts; a too-narrow grid provably collides; the
    merged grid is invariant to block layout (sum-merge associativity)."""
    import pyarrow as pa
    import ray.data as rd

    from crawler_seo_ray.queries import _fnv64_strings
    from crawler_seo_ray.stages.sketch import cms_estimate, count_min

    rng = np.random.RandomState(7)
    # Zipfy stream over a 500-term vocabulary
    vocab = np.array([f"tok{i}" for i in range(500)])
    freq = (2000 / np.arange(1, 501)).astype(np.int64) + 1
    items = np.repeat(vocab, freq)
    rng.shuffle(items)
    tbl = pa.table({"term": pa.array(items.tolist(), pa.string())})

    exact = {t: int(n) for t, n in zip(vocab, freq)}
    probes = pa.array(vocab.tolist(), pa.string())
    keys = _fnv64_strings(probes)

    grids = {}
    for blocks in (1, 7):
        ds = rd.from_arrow(tbl).repartition(blocks)
        grids[blocks] = count_min(ds, "term", _fnv64_strings, width=64, depth=4)
    assert np.array_equal(grids[1], grids[7])  # layout-invariant merge

    est = cms_estimate(grids[7], keys)
    truth = np.array([exact[t] for t in vocab], dtype=np.int64)
    assert (est >= truth).all()  # CMS never undercounts
    assert (est > truth).any()  # 500 terms into 64 buckets must collide
    # every row of the grid conserves total mass
    assert (grids[7].sum(axis=1) == len(items)).all()

    # a full-width grid resolves the heavy head exactly
    wide = count_min(
        rd.from_arrow(tbl).repartition(5), "term", _fnv64_strings,
        width=16_384, depth=4,
    )
    est_w = cms_estimate(wide, keys[:20])
    assert np.array_equal(est_w, truth[:20])
