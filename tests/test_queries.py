"""Driver-contract conformance: every SQL-paired query must match its
DuckDB oracle (row count + schema-names + sorted values), rows-only
queries must run and return sane rows. Mimics the driver's compare at
sf0.001."""

import math
import os

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _to_pandas(result):
    import pyarrow as pa
    from ray.data import Dataset

    if isinstance(result, Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.fixture(scope="module")
def registry(ray_session):
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


@pytest.mark.usefixtures("ray_session")
def test_sql_paired_queries_match(registry, con):
    queries, oracles = registry
    mismatches = []
    for name, sql in oracles.items():
        ray_df = _canon(_to_pandas(queries[name](SF)))
        duck_df = _canon(con.sql(sql).df())
        if list(ray_df.columns) != list(duck_df.columns):
            mismatches.append((name, "columns", list(ray_df.columns), list(duck_df.columns)))
            continue
        if len(ray_df) != len(duck_df):
            mismatches.append((name, "rows", len(ray_df), len(duck_df)))
            continue
        try:
            pd.testing.assert_frame_equal(
                ray_df, duck_df, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-9
            )
        except AssertionError as ex:
            mismatches.append((name, "values", str(ex)[:300]))
    assert not mismatches, mismatches


@pytest.mark.usefixtures("ray_session")
def test_rows_only_queries_run(registry):
    queries, oracles = registry
    n_docs = len(pd.read_parquet(os.path.join(SF, "documents.parquet"), columns=["doc_id"]))
    expectations = {
        "embeddings_knn_ivf": lambda df: set(df["query_idx"]) <= set(range(5)),
        "embeddings_knn_pq": lambda df: len(df) == 25
        and set(df["query_id"]) == set(range(5))
        and sorted(df[df["query_id"] == 0]["neighbor_rank"]) == [1, 2, 3, 4, 5],
        "crawl_visit_order": lambda df: len(df) == 120 and list(df["visit_seq"]) == list(range(120)),
        "crawl_visit_order_weighted": lambda df: len(df) == 120
        and list(df["visit_seq"]) == list(range(120)),
        "crawl_audit_scores": lambda df: len(df) == 120,
        "corpus_image_stats": lambda df: len(df) == 300 and df["decode_ok"].all(),
        "embeddings_kmeans": lambda df: df["cluster"].nunique() > 1
        and df["cluster"].between(0, 7).all(),
        "lineitem_price_quantile_sketch": lambda df: len(df) == 4
        and df["value"].is_monotonic_increasing,
        "crawl_pagerank": lambda df: len(df) == 120
        and abs(df["rank"].sum() - 1.0) < 1e-9
        and df["rank"].is_monotonic_decreasing,
        "docs_pack_sequences": lambda df: len(df) == n_docs
        and df["doc_id"].is_unique
        and all(
            g["n_tokens"].sum() <= 256 or len(g) == 1
            for _, g in df.groupby("bin_id")
        ),
        "embeddings_label_centroids": lambda df: df["label"].is_unique
        and (df["n"] > 0).all()
        and all(len(c) == 64 for c in df["centroid"]),
        "corpus_channel_norm": lambda df: list(df["channel"]) == ["r", "g", "b"]
        and df["n_px"].nunique() == 1
        and (df["std"] > 0).all()
        and df["mean"].between(0, 255).all(),
        "events_markov_stationary": lambda df: abs(df["stationary"].sum() - 1.0) < 1e-12
        and (df["stationary"] > 0).all()
        and df["event_type"].is_monotonic_increasing,
        "corpus_quality_flags": lambda df: len(df) == 300
        and df["image_id"].is_unique
        and (df["n_dark"] + df["n_bright"] <= df["n_px"]).all()
        and df["too_dark"].isin((0, 1)).all()
        and df["blurry"].isin((0, 1)).all(),
        "corpus_edge_density": lambda df: len(df) == 300
        and df["image_id"].is_unique
        and (df["n_edge"] <= df["n_interior"]).all()
        and (df["edge_energy"] >= 0).all(),
        "embeddings_pca_top": lambda df: len(df) == 64
        and abs((df["loading"] ** 2).sum() - 1.0) < 1e-9
        and df["eigenvalue"].nunique() == 1
        and df["eigenvalue"].iloc[0] > 0,
        "crawl_wave_phases": lambda df: len(df) >= 2
        and (df["issued"] > 0).all()
        and df["issued"].sum() == 120
        and (df[["t_take", "t_issue", "t_workers", "t_admit"]] >= 0).all().all()
        and (df["t_workers"] > 0).all(),
        "corpus_channel_covariance": lambda df: len(df) == 6
        and (df.set_index(["ch_a", "ch_b"])["cov"].loc[("r", "r")] > 0)
        and df["corr"].between(-1, 1).all(),
        "crawl_snapshot": lambda df: len(df) > 0
        and sorted(df["visit_seq"]) == list(range(len(df)))
        and df["wave"].max() <= 1
        and len(df) < 120,
        "crawl_hits": lambda df: len(df) == 120
        and abs(df["hub"].sum() - 1.0) < 1e-9
        and abs(df["authority"].sum() - 1.0) < 1e-9
        and df["authority"].is_monotonic_decreasing,
        "corpus_palette": lambda df: len(df) == 300
        and df["image_id"].is_unique
        and df["share1"].between(0, 1).all()
        and (df["share1"] >= df["share2"].fillna(0)).all()
        and (df["color_entropy"] >= 0).all(),
        "corpus_luma_histogram": lambda df: len(df) == 256
        and df["n"].sum() == df["cdf"].iloc[-1]
        and df["cdf"].is_monotonic_increasing
        and df["lut"].is_monotonic_increasing
        and df["lut"].between(0, 255).all(),
        "embeddings_ivf_recall": lambda df: len(df) == 5
        and df["recall"].between(0.0, 1.0).all()
        and (df["n_hit"] == (df["recall"] * df["k"]).round()).all(),
        # deep pin in test_mip_build_decode_back_equality
        "corpus_mip_build": lambda df: df["image_id"].nunique() == 300
        and df["level"].between(1, 3).all()
        and (df["w_l"] > 0).all()
        and df["mean_luma"].between(0.0, 255.0).all(),
        # deep pin in test_corpus_curate_invariants
        "corpus_curate": lambda df: 0 < len(df) < 300
        and df["image_id"].is_unique
        and (df["aspect_bucket"] == (df["w"] * 100) // df["h"]).all(),
        # deep pin in test_corpus_augment_decode_back_equality
        "corpus_augment": lambda df: len(df) > 250
        and df["image_id"].is_unique
        and (df["w"] == 16).all() and (df["h"] == 16).all()
        and (df["n_bytes"] > 0).all(),
        # deep pin in test_corpus_embed_knn_matches_numpy_replay
        "corpus_embed_knn": lambda df: len(df) == 900
        and (df["image_id"] != df["neighbor_id"]).all()
        and df["cosine"].between(-1.0, 1.0 + 1e-12).all()
        and sorted(df[df["image_id"] == df["image_id"].iloc[0]]["rank"]) == [1, 2, 3],
        # deep pin in test_grayworld_gains_match_whole_corpus_numpy
        "corpus_grayworld_gains": lambda df: len(df) == 300
        and df["image_id"].is_unique
        and (df[["gain_r", "gain_g", "gain_b"]] > 0).all().all(),
        # deep pin in test_tile_phash_dups_planted_quadrant
        "corpus_tile_phash_dups": lambda df: (df["id_a"] < df["id_b"]).all()
        and df["n_shared_tiles"].between(1, 4).all()
        and df.set_index(["id_a", "id_b"]).index.is_unique,
        # deep pin in test_pair_ssim_matches_numpy_replay
        "corpus_pair_ssim": lambda df: (df["id_a"] < df["id_b"]).all()
        and df.set_index(["id_a", "id_b"]).index.is_unique
        and df["ssim"].between(-1.0, 1.0 + 1e-12).all()
        and df["hamming"].between(0, 4).all(),
        # deep pin in test_kcenter_matches_numpy_replay
        "embeddings_kcenter": lambda df: len(df) == 12
        and df["vec_id"].is_unique
        and df["dist"].iloc[0] == 0.0
        and (df["dist"].iloc[1:].diff().dropna() <= 1e-12).all(),
        # deep pin in test_equalize_decode_back_equality
        "corpus_equalize": lambda df: len(df) == 300
        and df["image_id"].is_unique
        and df["mean_after"].between(0.0, 255.0).all(),
        # deep pin in test_minhash_index_evict_extend_lifecycle
        "docs_dedup_index_lifecycle": lambda df: (
            lambda s: s["evicted_still_pairing"] == 0
            and s["probe_after_evict_pairs"] <= s["probe_initial_pairs"]
            and s["evict_rows_removed"] == 16 * s["evicted_history_docs"]
            and s["evict_partitions_rewritten"] <= s["evict_partitions_total"]
        )(df.set_index("metric")["value"]),
    }
    for name, check in expectations.items():
        df = _to_pandas(queries[name](SF))
        assert check(df), (name, df.head())
    # every rows-only query is registered, every registered query callable
    assert set(expectations) == set(queries) - set(oracles)


@pytest.mark.usefixtures("ray_session")
def test_tfidf_join_path_equals_broadcast_path():
    """df_broadcast_limit=0 forces the distributed DF join on term —
    identical output to the broadcast DF map (VERDICT r02 #4)."""
    from crawler_seo_ray import queries as Q

    a = _canon(_to_pandas(Q.docs_tfidf_top_terms(SF)))
    b = _canon(_to_pandas(Q.docs_tfidf_top_terms(SF, df_broadcast_limit=0)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_dense_gate_queries_match_distributed_path(monkeypatch):
    """Zeroing the broadcast gate forces the distributed hash-join /
    shuffle plans in every size-gated query; output must equal the
    default dense-path result (BASELINE.md broadcast-plan deltas)."""
    from crawler_seo_ray import queries as Q

    names = [
        "events_anti_join",
        "events_semi_join",
        "revenue_by_part_type",
        "revenue_by_nation",
        "nation_trade_matrix",
        "orders_shipping_priority",
        "orders_returned_customers",
        "events_hourly",
        "events_max_concurrency",
        "customer_order_histogram",
        "orders_customer_full_join",
        "nation_year_profit",
        "orders_urgent_by_status",
        "supplier_excess_share",
    ]
    dense = {n: _canon(_to_pandas(getattr(Q, n)(SF))) for n in names}
    dense["supplier_blame"] = _canon(_to_pandas(Q.supplier_blame(SF)))
    monkeypatch.setattr(Q, "_BCAST_KEYS_GATE", 0)
    for n in names:
        dist = _canon(_to_pandas(getattr(Q, n)(SF)))
        pd.testing.assert_frame_equal(dense[n], dist, check_dtype=False), n
    dist = _canon(_to_pandas(Q.supplier_blame(SF, dense_row_limit=0)))
    pd.testing.assert_frame_equal(dense["supplier_blame"], dist, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_region_best_supplier_distributed_path_equals_dense():
    """dense_row_limit=0 forces the sorted_group_apply max-with-ties
    plan (r5) over the candidate exchange; must equal the driver-side
    dense fold the oracle pins."""
    from crawler_seo_ray import queries as Q

    a = _canon(_to_pandas(Q.region_best_supplier(SF)))
    b = _canon(_to_pandas(Q.region_best_supplier(SF, dense_row_limit=0)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_dedup_spans_distributed_path_equals_dense():
    """dense_gate=0 forces the gram-join + per-doc start co-location
    plan in docs_dedup_spans; its rewrite must equal the broadcast
    dup-set path byte for byte (the oracle pins the dense path)."""
    from crawler_seo_ray import queries as Q

    a = _canon(_to_pandas(Q.docs_dedup_spans(SF)))
    b = _canon(_to_pandas(Q.docs_dedup_spans(SF, dense_gate=0)))
    assert (a["n_removed"] > 0).any(), "fixture has no duplicated spans"
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_langid_on_natural_samples():
    """The testdata 'lang' column is a random label over English word-soup,
    so heuristic accuracy is only meaningful on real language samples."""
    from crawler_seo_ray.functions.text import detect_language

    samples = {
        "en": "the quick brown fox jumped over the lazy dog and it was fine",
        "es": "el perro corre por la calle y los niños juegan en el parque",
        "de": "der Hund läuft durch die Straße und das ist nicht so gut",
        "fr": "le chien court dans la rue et les enfants jouent dans le parc",
        "zh": "数据库系统的查询优化器负责生成高效的执行计划",
    }
    for lang, text in samples.items():
        assert detect_language(text) == lang, (lang, detect_language(text))
    assert detect_language("") == "unknown"
    assert detect_language("xyzzy plugh 12345") == "unknown"


@pytest.mark.usefixtures("ray_session")
def test_entry_smoke():
    import __ray_entry__ as e

    ds = e.entry()
    df = _to_pandas(ds)
    assert len(df) == 150
    assert {"visit_seq", "URL", "Metatags_Score", "Title_Duplicado"} <= set(df.columns)
    assert set(df["Title_Duplicado"].unique()) <= {"SIM", "NÃO"}
    assert (df["Caption_Match"] != "NÃO").all() and (df["Phash_Match"] != "NÃO").all()


@pytest.mark.usefixtures("ray_session")
def test_report_sheets_with_duplicates(tmp_path):
    """write_report emits the duplicate-text sheets when the crawl
    actually found duplicates (G2; they're absent on dup-free crawls)."""
    import os

    from crawler_seo_ray import datagen
    from crawler_seo_ray.oracle import CrawlSpec
    from crawler_seo_ray.pipelines.crawl import EngineConfig, run_crawl
    from crawler_seo_ray.pipelines.report import finalize_audit, write_report
    from crawler_seo_ray.queries import corpus_dir

    spec = CrawlSpec(n_pages=300, seeds=[datagen.url(0)], max_urls=150, batch_size=25)
    res = run_crawl(spec, corpus_dir(), EngineConfig(num_workers=2))
    final = finalize_audit(res.audit).materialize()
    dups = final.select_columns(["title_duplicado"]).to_pandas()
    assert dups["title_duplicado"].fillna(False).any(), "crawl should hit caption dups"
    out = str(tmp_path / "report")
    write_report(final, res.rejected, out)
    assert os.path.isdir(os.path.join(out, "title_duplicados"))
    import pandas as pd

    sheet = pd.read_parquet(os.path.join(out, "title_duplicados"))
    assert (sheet["count"] > 1).all() and len(sheet) > 0

    # round-2 sheets: full reference inventory (excel_generator.py
    # Headings_Vazios / Sequencia_Headings / Gravidade_Headings /
    # Mixed_Content) — the corpus plants empty headings (i%17==0) and
    # insecure subresources, so each sheet must be non-empty
    vaz = pd.read_parquet(os.path.join(out, "headings_vazios"))
    assert len(vaz) > 0 and set(vaz["Gravidade"]) <= {"CRÍTICO", "MÉDIO"}
    assert (vaz["Tag"].str.upper() == vaz["Tag"]).all()

    seq = pd.read_parquet(os.path.join(out, "sequencia_headings"))
    assert len(seq) > 0
    assert (seq["Total_Headings"] == seq["H1s"] + seq["Total_Problemas"]).all()
    assert (seq["Headings_Validos"] == seq["Total_Headings"] - seq["Problematicos"]).all()

    grav = pd.read_parquet(os.path.join(out, "gravidade_headings"))
    assert len(grav) > 0 and ((grav["Criticos"] > 0) | (grav["Total_Problematicos"] > 0)).all()

    mixed = pd.read_parquet(os.path.join(out, "mixed_content"))
    assert len(mixed) > 0 and (mixed["Tem_Mixed_Content"] == "SIM").all()
    assert (mixed["Quantidade"] > 0).all()

    bd = pd.read_parquet(os.path.join(out, "filtros"))
    assert {"values", "counts"} <= set(bd.columns)


@pytest.mark.usefixtures("ray_session")
def test_first_last_touch_timestamp_ties_break_by_event_id():
    """Planted ties: several events share a user's min/max timestamp —
    the (ts, event_id) tiebreak must pick the lowest/highest event_id's
    type, across block boundaries, exactly like the SQL windows."""
    import pyarrow as pa
    import ray.data as rd

    from crawler_seo_ray.queries import events_first_last_touch
    import crawler_seo_ray.queries as Q

    t0 = pd.Timestamp("2026-01-01").value // 1000
    tbl = pa.table(
        {
            "event_id": pa.array([5, 1, 9, 3, 7], pa.int64()),
            "ts": pa.array([t0, t0, t0 + 10, t0 + 10, t0 + 5], pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1, 1, 1], pa.int64()),
            "event_type": pa.array(["b", "a", "z", "y", "m"], pa.string()),
        }
    )
    import os, tempfile
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="flt_")
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    orig = Q._pq
    try:
        # force many tiny blocks so first/last cross block boundaries
        Q._pq = lambda sf, t, cols=None, blocks=None: rd.read_parquet(
            os.path.join(sf, f"{t}.parquet"), columns=cols, override_num_blocks=5
        )
        out = events_first_last_touch(d).to_pandas()
    finally:
        Q._pq = orig
    assert out.loc[0, "first_type"] == "a"   # ts tie t0: event_id 1 < 5
    assert out.loc[0, "last_type"] == "z"    # ts tie t0+10: event_id 9 > 3
    assert out.loc[0, "n_events"] == 5


@pytest.mark.usefixtures("ray_session")
def test_above_user_avg_excludes_exact_mean():
    """Boundary: a value exactly equal to its user's mean must be
    excluded (strict >), verified with values where the float mean
    would be representable — the integer cross-multiplication makes
    the comparison exact regardless."""
    import os, tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from crawler_seo_ray.queries import events_above_user_avg
    import crawler_seo_ray.queries as Q

    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "value": pa.array([1.00, 2.00, 3.00, 5.00, 5.00], pa.float64()),
        }
    )
    d = tempfile.mkdtemp(prefix="aua_")
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    orig = Q._pq
    try:
        Q._pq = lambda sf, t, cols=None, blocks=None: rd.read_parquet(
            os.path.join(sf, f"{t}.parquet"), columns=cols, override_num_blocks=3
        )
        out = events_above_user_avg(d).to_pandas().sort_values("event_id")
    finally:
        Q._pq = orig
    # user 1: mean 2.00 → only event 3 (value 3.00); event 2 == mean excluded
    # user 2: both values equal the mean → nothing
    assert out["event_id"].tolist() == [3]


def test_skyline2d_matches_brute_force():
    """Property: the vectorized 2-D skyline kernel equals the O(n²)
    dominance definition on random data with heavy ties."""
    import numpy as np

    from crawler_seo_ray.queries import _skyline2d

    for seed in range(5):
        rng = np.random.default_rng(seed)
        n = 200
        c = rng.integers(0, 20, n).astype(np.int64)  # heavy ties
        d = rng.integers(0, 20, n).astype(np.int64)
        keep = _skyline2d(c, d)
        for i in range(n):
            dominated = bool(
                np.any(
                    (c >= c[i]) & (d <= d[i]) & ((c > c[i]) | (d < d[i]))
                )
            )
            assert keep[i] == (not dominated), (seed, i, c[i], d[i])


@pytest.mark.usefixtures("ray_session")
def test_ntile_uneven_division_and_transitions():
    """NTILE semantics on an uneven split (N=10, k=8 → first two tiles
    get 2 rows) across forced block boundaries; transition counts on a
    planted per-user sequence with a timestamp tie broken by event_id."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    import crawler_seo_ray.queries as Q
    from crawler_seo_ray.queries import events_transitions, orders_ntile

    d = tempfile.mkdtemp(prefix="ntile_")
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(list(range(10)), pa.int64()),
                "o_totalprice": pa.array([float(9 - i) for i in range(10)]),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )
    t0 = pd.Timestamp("2026-01-01").value // 1000
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "user_id": pa.array([7, 7, 7, 7, 7], pa.int64()),
                # ids 3,4 share a ts: order must be ...,3,4 by event_id
                "ts": pa.array(
                    [t0, t0 + 1, t0 + 2, t0 + 2, t0 + 9], pa.timestamp("us")
                ),
                "event_type": pa.array(["a", "b", "c", "d", "a"], pa.string()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    orig = Q._pq
    try:
        Q._pq = lambda sf, t, cols=None, blocks=None: rd.read_parquet(
            os.path.join(sf, f"{t}.parquet"), columns=cols, override_num_blocks=4
        )
        nt = orders_ntile(d).to_pandas().sort_values("o_orderkey")
        tr = events_transitions(d).to_pandas()
    finally:
        Q._pq = orig
    # price descends with key, so rank order = key 9..0 reversed:
    # rank 1 = key 9. N=10, k=8: tiles sizes 2,2,1,1,1,1,1,1.
    by_key = dict(zip(nt["o_orderkey"], nt["tile"]))
    assert [by_key[9 - r] for r in range(10)] == [1, 1, 2, 2, 3, 4, 5, 6, 7, 8]
    got = {
        (r.prev_type, r.event_type): r.n for r in tr.itertuples()
    }
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("c", "d"): 1, ("d", "a"): 1}


@pytest.mark.usefixtures("ray_session")
def test_retention_cohort_day_boundary_and_distinct():
    """A user active twice in one offset day counts once; first events
    late in a day still cohort to that day's midnight; offsets measure
    calendar days, not 24h periods."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    import crawler_seo_ray.queries as Q
    from crawler_seo_ray.queries import events_retention

    day = 86_400_000_000
    d0 = pd.Timestamp("2026-02-01").value // 1000
    rows = [
        # user 1: first event 23:00 day0 → cohort day0; next event 01:00
        # day1 = offset 1 (calendar-day diff, only 2h later)
        (1, d0 + 23 * 3600 * 1_000_000),
        (1, d0 + day + 3600 * 1_000_000),
        # user 2: three events on its first day → one distinct in cell 0
        (2, d0), (2, d0 + 5), (2, d0 + 9),
        # user 3: same cohort day as user 2, active at offset 2
        (3, d0 + 10), (3, d0 + 2 * day),
    ]
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    d = tempfile.mkdtemp(prefix="ret_")
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    orig = Q._pq
    try:
        Q._pq = lambda sf, t, cols=None, blocks=None: rd.read_parquet(
            os.path.join(sf, f"{t}.parquet"), columns=cols, override_num_blocks=4
        )
        out = events_retention(d).to_pandas()
    finally:
        Q._pq = orig
    got = {
        (r.cohort_day.isoformat(), r.day_offset): r.n_users
        for r in out.itertuples()
    }
    assert got == {
        ("2026-02-01T00:00:00", 0): 3,  # users 1,2,3 on their first day
        ("2026-02-01T00:00:00", 1): 1,  # user 1
        ("2026-02-01T00:00:00", 2): 1,  # user 3
    }, got


@pytest.mark.usefixtures("ray_session")
def test_digest_order_invariance_and_debounce_boundary():
    """The per-source digest must be identical under any row order /
    block split (commutative mod-2^64 sum); debounce keeps an event at
    EXACTLY the threshold gap and drops one 1µs under it."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    import crawler_seo_ray.queries as Q
    from crawler_seo_ray.queries import docs_source_digest, events_debounce

    d = tempfile.mkdtemp(prefix="dig_")
    texts = [f"doc number {i} content alpha" for i in range(40)]
    pq.write_table(
        pa.table(
            {
                "source": pa.array(["s1" if i % 3 else "s2" for i in range(40)]),
                "text": pa.array(texts),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    d2 = tempfile.mkdtemp(prefix="dig_")
    perm = list(reversed(range(40)))
    pq.write_table(
        pa.table(
            {
                "source": pa.array(["s1" if i % 3 else "s2" for i in perm]),
                "text": pa.array([texts[i] for i in perm]),
            }
        ),
        os.path.join(d2, "documents.parquet"),
    )
    t0 = pd.Timestamp("2026-03-01").value // 1000
    gap = 600_000_000
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "user_id": pa.array([1, 1, 1, 1], pa.int64()),
                "ts": pa.array(
                    [t0, t0 + gap, t0 + 2 * gap - 1, t0 + 3 * gap], pa.timestamp("us")
                ),
                "event_type": pa.array(["x", "x", "x", "x"]),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    orig = Q._pq
    try:
        Q._pq = lambda sf, t, cols=None, blocks=None: rd.read_parquet(
            os.path.join(sf, f"{t}.parquet"), columns=cols, override_num_blocks=5
        )
        a = docs_source_digest(d).to_pandas().sort_values("source").reset_index(drop=True)
        b = docs_source_digest(d2).to_pandas().sort_values("source").reset_index(drop=True)
        deb = events_debounce(d).to_pandas()
    finally:
        Q._pq = orig
    assert a.equals(b), (a, b)
    assert a["n_docs"].tolist() == [26, 14]
    # event 2: gap exactly 600s → kept; event 3: 1µs short → dropped;
    # event 4: gap vs PREVIOUS RAW event 3 is gap+1 → kept
    assert sorted(deb["event_id"]) == [1, 2, 4]


@pytest.mark.usefixtures("ray_session")
def test_repetition_filter_planted_docs():
    """Planted repetition: a token-spam doc and a bigram-loop doc fail,
    an all-distinct doc passes; counts are exact."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    import crawler_seo_ray.queries as Q
    from crawler_seo_ray.queries import docs_repetition

    d = tempfile.mkdtemp(prefix="rep_")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    [
                        "spam spam spam spam other",      # top token 4/5
                        "a b a b a b",                     # top token 3/6
                        "one two three four five six",     # clean, short
                        " ".join(f"w{i}" for i in range(30)),  # clean, long
                    ]
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    orig = Q._pq
    try:
        Q._pq = lambda sf, t, cols=None, blocks=None: rd.read_parquet(
            os.path.join(sf, f"{t}.parquet"), columns=cols, override_num_blocks=2
        )
        out = docs_repetition(d).to_pandas().set_index("doc_id").sort_index()
    finally:
        Q._pq = orig
    assert out.loc[1, ["n_tokens", "n_distinct", "top_token_n"]].tolist() == [5, 2, 4]
    assert not out.loc[1, "rep_ok"]
    assert out.loc[2, ["n_bigrams", "top_bigram_n"]].tolist() == [5, 3]
    assert not out.loc[2, "rep_ok"]  # top token 3 of 6
    # short clean doc: bigram check vacuous below 20 bigrams
    assert out.loc[3, "rep_ok"]
    assert out.loc[3, ["n_tokens", "n_distinct", "top_token_n"]].tolist() == [6, 6, 1]
    # long clean doc: BOTH checks non-vacuous and passing
    assert out.loc[4, "rep_ok"]
    assert out.loc[4, ["n_tokens", "n_bigrams", "top_bigram_n"]].tolist() == [30, 29, 1]


@pytest.mark.usefixtures("ray_session")
def test_pack_sequences_invariants():
    """Packing invariants on the real table: every doc appears exactly
    once; every multi-doc bin respects the budget (singletons may be
    oversized docs); per-bin token sums are consistent; the bin count
    is within FFD's bound of the global lower bound × block count; and
    the assignment is deterministic across runs."""
    from crawler_seo_ray.queries import docs_pack_sequences

    budget = 256
    a = docs_pack_sequences(SF, budget=budget).to_pandas()
    b = docs_pack_sequences(SF, budget=budget).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id", ignore_index=True),
        b.sort_values("doc_id", ignore_index=True),
    )
    n_docs = len(pd.read_parquet(os.path.join(SF, "documents.parquet"), columns=["doc_id"]))
    assert len(a) == n_docs and a["doc_id"].is_unique
    for bin_id, g in a.groupby("bin_id"):
        assert (g["bin_tokens"] == g["n_tokens"].sum()).all()
        assert g["n_tokens"].sum() <= budget or len(g) == 1
        assert bin_id == g["doc_id"].min()
    # near-optimality: FFD ≤ 11/9·OPT + 1 per block; with 8 blocks the
    # global bin count must stay within that envelope of the global
    # lower bound
    lower = -(-a["n_tokens"].sum() // budget)
    n_bins = a["bin_id"].nunique()
    assert n_bins <= (11 * lower) // 9 + 8, (n_bins, lower)


@pytest.mark.usefixtures("ray_session")
def test_zscore_bit_reproducible_across_block_layouts():
    """The standardized doubles must be BITWISE identical under
    different block splits (exact integer moments ⇒ identical scalar
    doubles ⇒ identical per-row float ops), and z must have ~zero mean
    and unit variance."""
    import numpy as np
    import ray.data as rd

    import crawler_seo_ray.queries as Q
    from crawler_seo_ray.queries import lineitem_zscore

    orig = Q._pq
    outs = []
    try:
        for nb in (3, 16):
            Q._pq = lambda sf, t, cols=None, blocks=None, _nb=nb: rd.read_parquet(
                os.path.join(sf, f"{t}.parquet"), columns=cols, override_num_blocks=_nb
            )
            outs.append(
                lineitem_zscore(SF)
                .to_pandas()
                # (orderkey, linenumber) is NOT unique in the synthetic
                # table — include z so the sort is a total order
                .sort_values(["l_orderkey", "l_linenumber", "z"], ignore_index=True)
            )
    finally:
        Q._pq = orig
    a, b = outs
    assert (a["z"].values == b["z"].values).all()  # bitwise, not approx
    assert abs(a["z"].mean()) < 1e-9
    assert abs(a["z"].std(ddof=0) - 1.0) < 1e-9


@pytest.mark.usefixtures("ray_session")
def test_label_centroids_match_numpy_and_are_deterministic():
    """Per-label centroids must match a single-pass numpy reference to
    1e-12 and be IDENTICAL across two runs (the driver folds partials
    in (label, min_vec_id) order, so the reduction order is a function
    of the block layout only)."""
    import numpy as np

    from crawler_seo_ray.queries import embeddings_label_centroids

    a = embeddings_label_centroids(SF).to_pandas()
    b = embeddings_label_centroids(SF).to_pandas()
    pd.testing.assert_frame_equal(a, b)  # bitwise: same layout → same fold
    emb = pd.read_parquet(os.path.join(SF, "embeddings.parquet"))
    vecs = np.array(emb["embedding"].tolist(), dtype=np.float64)
    for _, row in a.iterrows():
        sel = emb["label"].values == row["label"]
        assert row["n"] == int(sel.sum())
        ref = vecs[sel].mean(axis=0)
        assert np.allclose(np.array(row["centroid"]), ref, atol=1e-12), row["label"]
    assert sorted(a["label"]) == sorted(emb["label"].unique())


@pytest.mark.usefixtures("ray_session")
def test_regression_matches_numpy_polyfit():
    """Grouped OLS slope/intercept vs numpy lstsq on the same integer
    units (cents on quantity), to 1e-9 relative."""
    import numpy as np

    from crawler_seo_ray.queries import lineitem_regression

    out = lineitem_regression(SF).to_pandas().set_index("l_returnflag")
    li = pd.read_parquet(
        os.path.join(SF, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    li["y"] = np.floor(li["l_extendedprice"] * 100.0 + 0.5).astype(np.int64)
    for f, g in li.groupby("l_returnflag"):
        A = np.vstack([g["l_quantity"].values, np.ones(len(g))]).T
        slope, icept = np.linalg.lstsq(A, g["y"].values.astype(float), rcond=None)[0]
        assert abs(out.loc[f, "slope_cents_per_qty"] - slope) < 1e-6 * max(1, abs(slope))
        assert abs(out.loc[f, "intercept_cents"] - icept) < 1e-6 * max(1, abs(icept))
        assert out.loc[f, "n"] == len(g)


def test_prefix_dups_planted_truncations(ray_session, tmp_path):
    """Proper prefixes (truncation artifacts), equal-text runs, and the
    empty-text doc must all be flagged; unique non-prefix docs must not."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_seo_ray.queries import docs_prefix_dups

    docs = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta"),            # proper prefix of 1 → flagged
        (3, "alpha beta gamma delta"),  # exact dup of 1 → both flagged
        (4, "zulu yankee"),            # unique → not flagged
        (5, ""),                       # empty → prefix of everything
        (6, "zulu"),                   # proper prefix of 4 → flagged
        (7, "mike november"),          # unique → not flagged
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = docs_prefix_dups(str(tmp_path))
    assert out.column("doc_id").to_pylist() == [1, 2, 3, 5, 6]


def test_corpus_embed_knn_matches_numpy_replay(ray_session):
    """End-to-end decode→embed→kNN: neighbors must equal a driver-side
    numpy replay of the identical feature + cosine + stable-tiebreak
    math, and satisfy the structural invariants."""
    import numpy as np

    from crawler_seo_ray import datagen
    from crawler_seo_ray.functions.imagecodec import decode_image
    from crawler_seo_ray.queries import corpus_embed_knn, corpus_dir, corpus_parquet
    from crawler_seo_ray.stages.multimodal import image_feature_vector

    out = corpus_embed_knn("unused")
    ids = out.column("image_id").to_pylist()
    nbrs = out.column("neighbor_id").to_pylist()
    ranks = out.column("rank").to_pylist()
    assert all(i != n for i, n in zip(ids, nbrs)), "self must be excluded"
    per = {}
    for i, r in zip(ids, ranks):
        per.setdefault(i, []).append(r)
    assert all(v == [1, 2, 3] for v in per.values())

    # numpy replay over the same cached corpus
    t = corpus_parquet(columns=["image_id", "bytes", "fmt"]).to_pandas()
    t = t.sort_values("image_id").reset_index(drop=True)
    M = np.stack(
        [
            image_feature_vector(decode_image(b, f))
            for b, f in zip(t["bytes"], t["fmt"])
        ]
    )
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0] = 1.0
    Mn = M / norms[:, None]
    sims = Mn @ Mn.T
    np.fill_diagonal(sims, -np.inf)
    id_arr = t["image_id"].to_numpy()
    expect = {}
    for i in range(len(id_arr)):
        cand = np.argsort(-sims[i], kind="stable")[:3]
        expect[id_arr[i]] = [id_arr[j] for j in cand]
    got = {}
    for i, n, r in zip(ids, nbrs, ranks):
        got.setdefault(i, [None] * 3)[r - 1] = n
    assert got == expect


def test_corpus_augment_decode_back_equality(ray_session):
    """Augmented bytes must decode to exactly the numpy replay of
    crop+flip on the original pixels (lossless PNG out), and the
    offsets must match corpus_crop_plan's geometry."""
    import numpy as np

    from crawler_seo_ray.functions.imagecodec import decode_image
    from crawler_seo_ray.queries import corpus_parquet, corpus_crop_plan
    from crawler_seo_ray.stages.multimodal import AugmentImages

    src = corpus_parquet(columns=["image_id", "bytes", "fmt"]).to_pandas()
    src = src.sort_values("image_id").reset_index(drop=True).head(20)
    import pyarrow as pa

    batch = pa.Table.from_pandas(src)
    out = AugmentImages(16)(batch).to_pandas().set_index("image_id")
    plan = corpus_crop_plan("unused").to_pandas().set_index("image_id")
    checked = 0
    for _, r in src.iterrows():
        if r["image_id"] not in out.index:
            continue
        o = out.loc[r["image_id"]]
        px = decode_image(r["bytes"], r["fmt"])
        p = plan.loc[r["image_id"]]
        cut = px[p["y0"] : p["y1"], p["x0"] : p["x1"]]
        if o["flipped"]:
            cut = cut[:, ::-1]
        back = decode_image(o["bytes"], "png")
        assert np.array_equal(back, cut), r["image_id"]
        checked += 1
    assert checked >= 10


def test_corpus_curate_invariants(ray_session):
    """corpus_curate composes phash near-dup clustering (keep the
    highest-resolution member), the exposure/blur quality gate, and
    aspect bucketing. Replay each rule driver-side and pin:
    (1) no quality-flagged image survives;
    (2) for every verified near-dup pair at most one side survives;
    (3) the survivor of each cluster is the max-pixels member
        (image_id asc tiebreak) — unless that member was itself
        quality-flagged, in which case the whole cluster may shrink;
    (4) every unclustered, unflagged image survives untouched."""
    import numpy as np

    from crawler_seo_ray.queries import (
        corpus_curate,
        corpus_parquet,
        corpus_quality_flags,
    )
    from crawler_seo_ray.stages.dedup import phash_pairs

    out = corpus_curate(SF).to_pandas()
    assert out["image_id"].is_unique
    survivors = set(out["image_id"])

    meta = corpus_parquet(columns=["image_id", "w", "h"]).to_pandas()
    meta = meta.set_index("image_id")
    flags = corpus_quality_flags(SF).to_pandas().set_index("image_id")
    bad = set(flags.index[(flags["too_dark"] == 1) | (flags["blurry"] == 1)])
    assert not (survivors & bad), "quality-flagged image survived"

    pairs = phash_pairs(
        corpus_parquet(columns=["image_id", "phash"]), hamming_threshold=4
    ).to_pandas()
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        assert not (a in survivors and b in survivors), (a, b)

    # union-find replay for keep-best and untouched-rows checks
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    clustered = set(parent) | set(parent.values()) | set(pairs["id_a"]) | set(
        pairs["id_b"]
    )
    clusters = {}
    for x in clustered:
        clusters.setdefault(find(x), []).append(x)
    for members in clusters.values():
        px = {m: int(meta.loc[m, "w"]) * int(meta.loc[m, "h"]) for m in members}
        keep = min(members, key=lambda m: (-px[m], m))
        expected = {keep} - bad
        assert set(members) & survivors == expected, (members, keep)

    untouched = set(meta.index) - clustered - bad
    assert untouched <= survivors
    # geometry passthrough + bucket math for a sample
    for _, r in out.head(25).iterrows():
        assert int(r["w"]) == int(meta.loc[r["image_id"], "w"])
        assert int(r["h"]) == int(meta.loc[r["image_id"], "h"])
        assert int(r["aspect_bucket"]) == (int(r["w"]) * 100) // int(r["h"])


def test_pair_ssim_matches_numpy_replay(ray_session):
    """corpus_pair_ssim scores must equal a driver-side numpy replay of
    the identical decode → (resize) → global-SSIM math on a sample of
    pairs, bit-for-bit (the stage and the replay share float64 kernels),
    and the pair set must equal corpus_phash_dups exactly."""
    import numpy as np

    from crawler_seo_ray.functions.imagecodec import decode_image, ssim_global
    from crawler_seo_ray.queries import (
        corpus_pair_ssim,
        corpus_parquet,
        corpus_phash_dups,
    )
    from crawler_seo_ray.stages.multimodal import resize_nearest

    out = corpus_pair_ssim("unused").to_pandas()
    pairs = corpus_phash_dups("unused").to_pandas()
    assert set(zip(out["id_a"], out["id_b"])) == set(
        zip(pairs["id_a"], pairs["id_b"])
    ), "SSIM stage must score exactly the phash candidate set"

    t = corpus_parquet(columns=["image_id", "bytes", "fmt"]).to_pandas()
    raw = {r.image_id: (r.bytes, r.fmt) for r in t.itertuples()}
    sample = out.sort_values(["id_a", "id_b"]).iloc[:: max(1, len(out) // 25)]
    for r in sample.itertuples():
        pxa = decode_image(*raw[r.id_a])
        pxb = decode_image(*raw[r.id_b])
        if pxa.shape[:2] != pxb.shape[:2]:
            h = min(pxa.shape[0], pxb.shape[0])
            w = min(pxa.shape[1], pxb.shape[1])
            pxa = resize_nearest(pxa, h, w)
            pxb = resize_nearest(pxb, h, w)
        assert r.ssim == ssim_global(pxa, pxb), (r.id_a, r.id_b)
        assert -1.0 <= r.ssim <= 1.0 + 1e-12


def test_kcenter_matches_numpy_replay(ray_session):
    """Greedy farthest-point picks must equal the single-process numpy
    replay bit-exactly (same ops, same tie-break), and the radius curve
    must be non-increasing — the k-center invariant."""
    import numpy as np
    import pyarrow.parquet as pq

    from crawler_seo_ray.queries import embeddings_kcenter

    t = embeddings_kcenter(SF, k=8).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = emb.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    X = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    picked, dist, C = [int(ids[0])], [0.0], X[[0]]
    for _ in range(1, 8):
        d2 = (
            (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
        ).min(axis=1)
        i = int(np.lexsort((ids, -d2))[0])
        picked.append(int(ids[i]))
        dist.append(float(d2[i]))
        C = np.vstack([C, X[i]])
    assert t["vec_id"].tolist() == picked
    assert np.array_equal(t["dist"].values, np.array(dist))
    radii = t["dist"].values[1:]
    assert (np.diff(radii) <= 1e-12).all(), "k-center radius curve must not increase"
    assert len(set(t["vec_id"])) == 8


def test_mip_build_decode_back_equality(ray_session):
    """Level-1 mip bytes must decode back to the exact integer 2x2 box
    filter of the decoded source pixels; level dims must halve with the
    floor convention; mean_luma must equal the integer-sum BT.601 mean."""
    import numpy as np

    from crawler_seo_ray.functions.imagecodec import decode_image
    from crawler_seo_ray.queries import corpus_parquet
    from crawler_seo_ray.stages.multimodal import MipPyramid

    src = corpus_parquet(columns=["image_id", "bytes", "fmt"]).to_pandas()
    raw = {r.image_id: (r.bytes, r.fmt) for r in src.itertuples()}

    ds = corpus_parquet(columns=["image_id", "bytes", "fmt"])
    out = ds.map_batches(
        MipPyramid, batch_format="pyarrow", batch_size=32, concurrency=2
    ).to_pandas()
    assert set(out["level"]) == {1, 2, 3}
    by_img = out[out["level"] == 1].set_index("image_id")
    sample = by_img.iloc[:: max(1, len(by_img) // 20)]
    for image_id, r in sample.iterrows():
        px = decode_image(*raw[image_id])
        h, w = px.shape[0] & ~1, px.shape[1] & ~1
        c = px[:h, :w].astype(np.uint16)
        exp = (
            (c[0::2, 0::2] + c[0::2, 1::2] + c[1::2, 0::2] + c[1::2, 1::2]) // 4
        ).astype(np.uint8)
        got = decode_image(r["bytes"], "png")
        assert np.array_equal(got, exp), image_id
        assert (r["h_l"], r["w_l"]) == exp.shape[:2]
        s = exp.reshape(-1, exp.shape[2]).sum(axis=0, dtype=np.int64)
        n_px = exp.shape[0] * exp.shape[1]
        assert r["mean_luma"] == float(299 * s[0] + 587 * s[1] + 114 * s[2]) / (
            1000.0 * n_px
        )
    # every level halves its parent (floor convention)
    for image_id, g in out.groupby("image_id"):
        g = g.sort_values("level")
        prev = None
        for _, row in g.iterrows():
            if prev is not None:
                assert row["w_l"] == (prev["w_l"] & ~1) // 2
                assert row["h_l"] == (prev["h_l"] & ~1) // 2
            prev = row


def test_equalize_decode_back_equality(ray_session):
    """Equalized bytes must decode to exactly LUT[source pixels]; the
    LUT is monotonic with lut[255-bin tail] hitting 255."""
    import numpy as np

    from crawler_seo_ray.functions.imagecodec import decode_image
    from crawler_seo_ray.queries import corpus_luma_histogram, corpus_parquet
    from crawler_seo_ray.stages.multimodal import EqualizeImages
    import ray as _ray

    hist = corpus_luma_histogram(SF).to_pandas()
    lut = hist["lut"].values
    assert (np.diff(lut) >= 0).all() and lut[-1] == 255

    src = corpus_parquet(columns=["image_id", "bytes", "fmt"]).to_pandas()
    raw = {r.image_id: (r.bytes, r.fmt) for r in src.itertuples()}
    out = (
        corpus_parquet(columns=["image_id", "bytes", "fmt"])
        .map_batches(
            EqualizeImages,
            batch_format="pyarrow",
            batch_size=32,
            concurrency=2,
            fn_constructor_kwargs={"lut_ref": _ray.put(lut)},
        )
        .to_pandas()
        .set_index("image_id")
    )
    assert len(out) == 300
    lut8 = lut.astype(np.uint8)
    sample = out.iloc[:: max(1, len(out) // 20)]
    for image_id, r in sample.iterrows():
        px = decode_image(*raw[image_id])
        exp = lut8[px]
        got = decode_image(r["bytes"], "png")
        assert np.array_equal(got, exp), image_id
        assert r["mean_before"] == float(px.mean())
        assert r["mean_after"] == float(exp.mean())


def test_edge_density_matches_numpy_replay(ray_session):
    """corpus_edge_density pins bit-exact to a driver-side numpy Sobel
    replay over the whole decoded corpus, and flat-fill images score 0
    interior energy while textured ones score > 0."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    from crawler_seo_ray.functions.imagecodec import decode_image
    from crawler_seo_ray.queries import corpus_dir, corpus_edge_density

    out = corpus_edge_density(SF).to_pandas().set_index("image_id")
    assert out.index.is_unique and len(out) == 300

    rows = []
    for f in sorted(glob.glob(os.path.join(corpus_dir(), "part-*.parquet"))):
        rows += pq.read_table(f, columns=["image_id", "bytes", "fmt"]).to_pylist()
    assert len(rows) == len(out)
    any_energy = False
    for r in rows:
        px = decode_image(r["bytes"], r["fmt"]).astype(np.int64)
        luma = (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]) // 1000
        gx = (luma[:-2, 2:] + 2 * luma[1:-1, 2:] + luma[2:, 2:]) - (
            luma[:-2, :-2] + 2 * luma[1:-1, :-2] + luma[2:, :-2]
        )
        gy = (luma[2:, :-2] + 2 * luma[2:, 1:-1] + luma[2:, 2:]) - (
            luma[:-2, :-2] + 2 * luma[:-2, 1:-1] + luma[:-2, 2:]
        )
        e = np.abs(gx) + np.abs(gy)
        got = out.loc[r["image_id"]]
        assert int(got["n_interior"]) == e.size
        assert int(got["edge_energy"]) == int(e.sum())
        assert int(got["n_edge"]) == int((e >= 128).sum())
        any_energy = any_energy or int(e.sum()) > 0
    assert any_energy


@pytest.mark.usefixtures("ray_session")
def test_zorder_wide_keys_beyond_20_bits(tmp_path):
    """Keys wider than ``bits`` (l_partkey > 2^20, i.e. TPC-H SF ≳ 5)
    must keep their TOP 20 bits — not wrap through a negative numpy
    shift and collapse every row into bucket 0 (ADVICE r03). Engine and
    SQL oracle must stay hash-equal in this regime, and the census must
    spread over many buckets."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_seo_ray import queries as Q

    rng = np.random.default_rng(7)
    n = 5000
    # 25-bit partkeys, 14-bit suppkeys — one wide, one narrow dimension
    part = rng.integers(1, 1 << 25, size=n, dtype=np.int64)
    part[0] = (1 << 25) - 1  # pin the max so bp = 25 deterministically
    supp = rng.integers(1, 1 << 14, size=n, dtype=np.int64)
    supp[0] = (1 << 14) - 1
    pq.write_table(
        pa.table({"l_partkey": part, "l_suppkey": supp}),
        str(tmp_path / "lineitem.parquet"),
    )

    got = _canon(Q.lineitem_zorder_layout(str(tmp_path)).to_pandas())
    assert got["n"].sum() == n
    assert len(got) > 8, "wide keys collapsed into few buckets"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{tmp_path}/lineitem.parquet')"
    )
    want = _canon(con.sql(Q.ORACLE_SQL["lineitem_zorder_layout"]).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_reciprocal_nn_ivf_path_equals_brute():
    """ivf_gate=0 forces the cell-partitioned knn_all_ivf scan (no
    O(N·d) query-matrix collect/broadcast — VERDICT r03 #1); in the
    exact multi-probe config (nprobe=None → every cell) the mutual
    pairs must equal the brute path's exactly."""
    from crawler_seo_ray import queries as Q

    a = _canon(_to_pandas(Q.embeddings_reciprocal_nn(SF)))
    b = _canon(_to_pandas(Q.embeddings_reciprocal_nn(SF, ivf_gate=0)))
    assert len(a) > 0, "fixture yields no mutual pairs"
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_zipf_census_distributed_path_equals_fold():
    """vocab_gate=0 forces the term-keyed groupby + count-histogram
    census (no vocabulary on the driver — VERDICT r03 #2); must equal
    the driver-fold path exactly (tie-order invariance makes the
    histogram derivation exact)."""
    from crawler_seo_ray import queries as Q

    a = _canon(_to_pandas(Q.docs_zipf_census(SF)))
    b = _canon(_to_pandas(Q.docs_zipf_census(SF, vocab_gate=0)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_dup_source_matrix_join_path_equals_map():
    """decorate_gate=0 forces the pair⋈(doc_id,source) join decorate
    (no corpus map on the driver — VERDICT r03 #2); census must equal
    the searchsorted-map path."""
    from crawler_seo_ray import queries as Q

    a = _canon(_to_pandas(Q.docs_dup_source_matrix(SF)))
    b = _canon(_to_pandas(Q.docs_dup_source_matrix(SF, decorate_gate=0)))
    assert len(a) > 0, "fixture yields no duplicate pairs"
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_pair_ssim_join_path_equals_lookup():
    """decorate_gate=0 forces the pair⋈corpus join decorate (pixels
    ride the pair shuffle, no O(candidates) driver bytes — VERDICT r03
    #3); SSIM scores must be byte-identical to the ray.put-lookup
    path."""
    from crawler_seo_ray import queries as Q

    a = _canon(_to_pandas(Q.corpus_pair_ssim(SF)))
    b = _canon(_to_pandas(Q.corpus_pair_ssim(SF, decorate_gate=0)))
    assert len(a) > 0, "fixture yields no phash candidate pairs"
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_corpus_embed_knn_ivf_path_equals_broadcast():
    """ivf_gate=0 forces the knn_all_ivf scan for the image-feature
    kNN (no corpus-sized matrix broadcast); exact multi-probe must
    reproduce the broadcast path's neighbors, ranks and cosines."""
    from crawler_seo_ray import queries as Q

    a = _canon(_to_pandas(Q.corpus_embed_knn(SF)))
    b = _canon(_to_pandas(Q.corpus_embed_knn(SF, ivf_gate=0)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
