"""Edge-case tests for the round-3 relational extensions: BFS
traversal, sliding distinct windows, inverted index, weighted median,
time-grid gap-fill, byte-pair counting, aspect bucketing. The oracle
equivalence itself is covered by test_queries.py; these pin the
semantics the oracles cannot see (early termination, boundary masks,
tie rules) on planted inputs."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _write_documents(tmp_path, texts):
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
def test_bpe_pairs_boundary_masking(tmp_path):
    """Pairs crossing row boundaries and pairs touching the space byte
    must be excluded; empty rows and 1-char tokens contribute nothing."""
    from crawler_seo_ray import queries as q

    sf = _write_documents(tmp_path, ["xy", "", "yz  zq", "a"])
    out = q.docs_bpe_pairs(sf).to_pandas()
    got = dict(zip(out["pair"], out["n"]))
    # NOT: the row-boundary pair "y"+"y", nor any pair containing " "
    assert got == {"xy": 1, "yz": 1, "zq": 1}
    # tie order: count desc then pair asc
    assert list(out["pair"]) == ["xy", "yz", "zq"]


@pytest.mark.usefixtures("ray_session")
def test_bfs_depths_early_exit_and_unreachable():
    import ray.data as rd

    from crawler_seo_ray.stages.graph import bfs_depths

    # component {1,2,5} (chain 1-2-5), separate component {3,4}
    src = [1, 2, 2, 5, 3, 4]
    dst = [2, 1, 5, 2, 4, 3]
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    out = bfs_depths(edges, [1], max_hops=10, num_partitions=2).to_pandas()
    got = dict(zip(out["id"], out["depth"]))
    # early exit: depth stops at the component diameter, 3/4 unreachable
    assert got == {1: 0, 2: 1, 5: 2}


@pytest.mark.usefixtures("ray_session")
def test_weighted_median_tie_rule(tmp_path):
    """Lower weighted median: first price where 2*cumw >= totw."""
    import pyarrow.parquet as pq

    from crawler_seo_ray import queries as q

    rows = [
        # flag A: prices 1.00(w2), 2.00(w1) -> cum 2 of 3 at 1.00 -> 1.00
        ("A", 1.00, 2.0),
        ("A", 2.00, 1.0),
        # flag B: 1.00(w1), 2.00(w1) -> 2*1 >= 2 at 1.00 -> 1.00 (lower)
        ("B", 1.00, 1.0),
        ("B", 2.00, 1.0),
        # flag C: 1.00(w1), 2.00(w3) -> 2*1 < 4 -> 2.00
        ("C", 1.00, 1.0),
        ("C", 2.00, 3.0),
    ]
    t = pa.table(
        {
            "l_orderkey": pa.array(range(len(rows)), pa.int64()),
            "l_partkey": pa.array([1] * len(rows), pa.int64()),
            "l_suppkey": pa.array([1] * len(rows), pa.int64()),
            "l_linenumber": pa.array([1] * len(rows), pa.int32()),
            "l_quantity": pa.array([r[2] for r in rows], pa.float64()),
            "l_extendedprice": pa.array([r[1] for r in rows], pa.float64()),
            "l_discount": pa.array([0.0] * len(rows), pa.float64()),
            "l_tax": pa.array([0.0] * len(rows), pa.float64()),
            "l_returnflag": pa.array([r[0] for r in rows]),
            "l_linestatus": pa.array(["O"] * len(rows)),
            "l_shipdate": pa.array([0] * len(rows), pa.timestamp("us")),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "lineitem.parquet"))
    out = q.lineitem_weighted_median(str(tmp_path)).to_pandas()
    got = dict(zip(out["l_returnflag"], out["weighted_median_price"]))
    assert got == {"A": 1.0, "B": 1.0, "C": 2.0}


@pytest.mark.usefixtures("ray_session")
def test_minute_gapfill_zero_rows(tmp_path):
    import pyarrow.parquet as pq

    from crawler_seo_ray import queries as q

    base = 1_700_000_040_000_000  # arbitrary, mid-minute
    ts = [base, base + 3 * 60_000_000]  # two events, 3 minutes apart
    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1, 1], pa.int64()),
            "event_type": pa.array(["view", "view"]),
            "value": pa.array([1.25, 2.50], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = q.events_minute_gapfill(str(tmp_path)).to_pandas()
    assert len(out) == 4  # minutes 0..3 inclusive
    assert list(out["n"]) == [1, 0, 0, 1]
    assert list(out["sum_value"]) == [1.25, 0.0, 0.0, 2.50]


@pytest.mark.usefixtures("ray_session")
def test_weekly_active_window_semantics(tmp_path):
    """A user active on day 0 counts toward window-end days 0..6 only;
    two active days inside one window still count the user once."""
    import pyarrow.parquet as pq

    from crawler_seo_ray import queries as q

    DAY = 86_400_000_000
    # user 1 on days 0 and 2; user 2 on day 9
    ts = [0, 2 * DAY, 9 * DAY]
    uid = [1, 1, 2]
    t = pa.table(
        {
            "event_id": pa.array(range(3), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(["view"] * 3),
            "value": pa.array([0.0] * 3, pa.float64()),
            "props": pa.array(["{}"] * 3),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = q.events_weekly_active(str(tmp_path)).to_pandas()
    got = {int(w.value // (DAY * 1000)): int(n) for w, n in zip(out["wday"], out["active_users"])}
    # note pandas Timestamp.value is ns
    expected = {d: 1 for d in range(0, 9)}  # days 0..8: user 1 covers 0..8? no:
    # user1 day0 -> wdays 0..6; day2 -> 2..8; union 0..8 counted ONCE
    expected.update({d: 1 for d in range(2, 7)})  # still 1 (dedup)
    for d in range(9, 16):
        expected[d] = 1  # user 2 day9 -> 9..15
    assert got == expected


@pytest.mark.usefixtures("ray_session")
def test_postings_sorted_and_distinct(tmp_path):
    from crawler_seo_ray import queries as q

    sf = _write_documents(tmp_path, ["b a b", "a c", "c"])
    out = q.docs_postings(sf).to_pandas().set_index("term")
    assert out.loc["a", "postings"] == "0,1" and out.loc["a", "df"] == 2
    assert out.loc["b", "postings"] == "0" and out.loc["b", "df"] == 1  # within-doc dup collapsed
    assert out.loc["c", "postings"] == "1,2"


@pytest.mark.usefixtures("ray_session")
def test_fuzzy_pairs_insert_delete_and_mixed_lengths(tmp_path):
    """The customer-table oracle pair only exercises equal-length
    substitutions (all c_name share one length); this plants tokens of
    mixed lengths so the identity-key candidate path (insert/delete
    pairs), the false-candidate rejection (shared deletion variant but
    ed=2, e.g. 'ab' vs 'ba'), and length-difference pruning are all
    hit. Expected set = brute-force python ed<=1 over all pairs."""
    import itertools
    import pyarrow.parquet as pq

    from crawler_seo_ray import queries as q

    toks = [
        "ab", "ba", "abc", "abcd", "axcd", "bcd", "x", "xy", "zzzz", "zzz",
        # two distinct 1-char tokens meet only at the EMPTY deletion
        # variant (the property-test regression), and "" itself is an
        # insertion-pair with every 1-char token
        "q", "r", "",
    ]

    def ed(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = sorted(
        (min(x, y), max(x, y))
        for x, y in itertools.combinations(toks, 2)
        if ed(x, y) <= 1
    )
    t = pa.table(
        {
            "c_custkey": pa.array(range(len(toks)), pa.int64()),
            "c_name": pa.array(toks),
            "c_nationkey": pa.array([0] * len(toks), pa.int32()),
            "c_acctbal": pa.array([0.0] * len(toks)),
            "c_mktsegment": pa.array(["BUILDING"] * len(toks)),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "customer.parquet"))
    out = q.customer_fuzzy_pairs(str(tmp_path)).to_pandas()
    got = sorted(zip(out["tok_a"], out["tok_b"]))
    assert got == want
    assert ("ab", "ba") not in got  # shared-variant false candidate rejected


@pytest.mark.usefixtures("ray_session")
def test_letterbox_geometry_invariants():
    """Every letterbox fits inside its canvas, fills at least one axis
    exactly, and preserves aspect within the floor-division bound."""
    from crawler_seo_ray import queries as q

    out = q.corpus_letterbox("unused").to_pandas()
    assert len(out) > 0
    assert (out["scaled_w"] <= out["target_w"]).all()
    assert (out["scaled_h"] <= out["target_h"]).all()
    fills = (out["scaled_w"] == out["target_w"]) | (out["scaled_h"] == out["target_h"])
    assert fills.all()
    assert (out["pad_x"] == (out["target_w"] - out["scaled_w"]) // 2).all()
    assert (out["pad_y"] == (out["target_h"] - out["scaled_h"]) // 2).all()


@pytest.mark.usefixtures("ray_session")
def test_chunk_text_boundaries(tmp_path):
    """Chunk fan-out edge rules: empty doc → no chunks; n ≤ window →
    one chunk [0, n); n = k·stride exactly → last chunk starts at
    (k−1)·stride; tok_end is clamped to n."""
    from crawler_seo_ray import queries as q

    texts = [
        "",                      # 0 tokens → no rows
        "a b c",                 # 3 → one chunk [0, 3)
        " ".join(["t"] * 64),    # exactly window → one chunk [0, 64)
        " ".join(["t"] * 65),    # window+1 → chunks at 0 and 48
        " ".join(["t"] * 96),    # 2·stride → chunks at 0 and 48
    ]
    sf = _write_documents(tmp_path, texts)
    out = q.docs_chunk_text(sf).to_pandas().sort_values(
        ["doc_id", "chunk_id"], ignore_index=True
    )
    got = [
        (r.doc_id, r.chunk_id, r.tok_start, r.tok_end) for r in out.itertuples()
    ]
    assert got == [
        (1, 0, 0, 3),
        (2, 0, 0, 64),
        (3, 0, 0, 64), (3, 1, 48, 65),
        (4, 0, 0, 64), (4, 1, 48, 96),
    ]


@pytest.mark.usefixtures("ray_session")
def test_session_paths_gap_and_tie_rules(tmp_path):
    """Strict >30-min gap splits sessions; same-timestamp events order
    by event_id inside the path."""
    import pyarrow.parquet as pq
    from crawler_seo_ray import queries as q

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        # user 1: a,b at t0 (tie → event_id order), c at exactly +30min
        # (NOT a new session: strict >), d at +61min (new session)
        (10, base, 1, "a"), (11, base, 1, "b"),
        (12, base + pd.Timedelta(minutes=30), 1, "c"),
        (13, base + pd.Timedelta(minutes=61), 1, "d"),
        # user 2: same single-event path 'd'
        (20, base, 2, "d"),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = q.events_session_paths(str(tmp_path)).to_pandas()
    got = {r.path: (r.n, r.rank) for r in out.itertuples()}
    assert got == {"d": (2, 1), "a>b>c": (1, 2)}


@pytest.mark.usefixtures("ray_session")
def test_max_concurrency_inclusive_boundary(tmp_path):
    """A session ending at instant t and another starting at t overlap
    (inclusive [start, end]); the reported instant is the EARLIEST one
    achieving the peak."""
    import pyarrow.parquet as pq
    from crawler_seo_ray import queries as q

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        # user 1: session [00:00, 00:10]
        (1, base), (2, base + pd.Timedelta(minutes=10)),
        # user 2: session starting exactly at user 1's end → overlap of 2
        (3, base + pd.Timedelta(minutes=10)),
        # user 3: much later lone session (still peak 1)
        (4, base + pd.Timedelta(hours=5)),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()).take(
                pa.array([0, 0, 1, 2], pa.int64())
            ),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = q.events_max_concurrency(str(tmp_path)).to_pylist()[0]
    assert out["max_concurrent"] == 2
    assert out["at_ts"] == base + pd.Timedelta(minutes=10)


@pytest.mark.usefixtures("ray_session")
def test_reciprocal_nn_rejects_one_directional(tmp_path):
    """A hub vector that everyone ranks first is only matched with the
    vectors IT ranks back within top-k; one-directional edges drop."""
    import pyarrow.parquet as pq
    from crawler_seo_ray import queries as q

    # 2-d layout: hub at origin-ish direction; a, b near hub; c, d, e
    # clustered far away — c/d/e rank hub low but each other high
    vecs = {
        0: [1.0, 0.0],        # hub
        1: [0.99, 0.14],      # near hub
        2: [0.99, -0.14],     # near hub
        3: [0.0, 1.0],
        4: [0.05, 1.0],
        5: [-0.05, 1.0],
    }
    t = pa.table(
        {
            "vec_id": pa.array(list(vecs), pa.int64()),
            "embedding": pa.array(list(vecs.values()), pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "embeddings.parquet"))
    out = q.embeddings_reciprocal_nn(str(tmp_path), k=2).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    # mutual: hub↔1, hub↔2, 1↔2 (all top-2 of each other);
    # 3/4/5 mutual among themselves
    assert (0, 1) in pairs and (0, 2) in pairs
    assert (3, 4) in pairs and (3, 5) in pairs and (4, 5) in pairs
    # no cross-cluster pair survives
    assert not any(a in (0, 1, 2) and b in (3, 4, 5) for a, b in pairs)


def test_fastss_key_completeness_property():
    """FastSS completeness theorem, as implemented: any two tokens
    within edit distance 1 share at least one deletion-neighborhood
    key under the engine's _fnv_rows hashing (identity ∪ single
    deletions). Hypothesis drives random short tokens and random
    ed≤1 edits."""
    from hypothesis import given, settings, strategies as st

    from crawler_seo_ray.queries import _fnv_rows

    def keys(tok: str) -> set[int]:
        out = set()
        b = np.frombuffer(tok.encode(), dtype=np.uint8).reshape(1, -1)
        out.add(int(_fnv_rows(b)[0]))
        for i in range(b.shape[1]):
            out.add(int(_fnv_rows(np.delete(b, i, axis=1))[0]))
        return out

    alphabet = "abc"

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(alphabet, min_size=1, max_size=6),
        st.integers(0, 5),
        st.sampled_from(["sub", "ins", "del"]),
        st.sampled_from(alphabet),
    )
    def check(tok, pos, op, ch):
        pos = pos % len(tok)
        if op == "sub":
            other = tok[:pos] + ch + tok[pos + 1 :]
        elif op == "ins":
            other = tok[:pos] + ch + tok[pos:]
        else:
            other = tok[:pos] + tok[pos + 1 :]
        if not other or other == tok:
            return
        assert keys(tok) & keys(other), (tok, other)

    check()


@pytest.mark.usefixtures("ray_session")
def test_kcore_planted_clique_and_full_peel():
    """A 4-clique with a pendant chain: k=3 must peel the chain
    (cascading — removing one chain vertex drops the next below k is
    not enough here, the chain never reaches degree 3) and keep exactly
    the clique at degree 3. k=10 must dissolve everything and still
    return the typed empty schema."""
    import ray.data as rd

    from crawler_seo_ray.stages.graph import kcore

    clique = [(a, b) for a in range(4) for b in range(4) if a != b]
    chain = [(3, 4), (4, 3), (4, 5), (5, 4)]
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in clique + chain], pa.int64()),
                "dst": pa.array([e[1] for e in clique + chain], pa.int64()),
            }
        )
    )
    # driver_edge_limit=0 forces the distributed rounds; the default
    # takes the dense path — both must peel identically
    for lim in (0, 4_000_000):
        core = (
            kcore(edges, k=3, max_rounds=8, num_partitions=2, driver_edge_limit=lim)
            .to_pandas()
            .sort_values("part", ignore_index=True)
        )
        assert list(core["part"]) == [0, 1, 2, 3], lim
        assert list(core["degree"]) == [3, 3, 3, 3], lim

    from crawler_seo_ray.util import collect_arrow

    for lim in (0, 4_000_000):
        gone = collect_arrow(
            kcore(edges, k=10, max_rounds=8, num_partitions=2, driver_edge_limit=lim),
            schema=pa.schema([("part", pa.int64()), ("degree", pa.int64())]),
        )
        assert gone.num_rows == 0, lim
        assert gone.schema.names == ["part", "degree"]


@pytest.mark.usefixtures("ray_session")
def test_token_offsets_boundaries(tmp_path):
    """Spans from the vectorized codepoint kernel must equal Python
    re.finditer on every delimiter edge case: leading/trailing/multiple
    whitespace, tabs/CR/LF, empty and all-whitespace docs, and
    single-char tokens at the ends."""
    import re

    from crawler_seo_ray import queries as q

    texts = [
        "  leading and trailing  ",
        "",
        " \t\r\n ",
        "a",
        "one\ttwo\rthree\nfour",
        "x  y   z",
    ]
    sf = _write_documents(tmp_path, texts)
    out = (
        q.docs_token_offsets(sf)
        .to_pandas()
        .sort_values(["doc_id", "token_idx"], ignore_index=True)
    )
    rows = []
    for doc_id, text in enumerate(texts):
        for i, m in enumerate(re.finditer(r"[^ \t\r\n]+", text)):
            rows.append((doc_id, i, m.group(), m.start(), m.end()))
    ref = pd.DataFrame(
        rows, columns=["doc_id", "token_idx", "token", "start_char", "end_char"]
    )
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_channel_norm_matches_whole_corpus_numpy():
    """The folded integer moments must equal a single-pass numpy
    reference over every decoded image, and the float finals must be
    bit-equal when computed in the documented op order."""
    import math

    import duckdb

    from crawler_seo_ray import queries as q
    from crawler_seo_ray.functions.imagecodec import decode_image

    out = q.corpus_channel_norm("unused").to_pandas()
    rows = duckdb.sql(
        f"SELECT bytes, fmt FROM read_parquet('{q._CORPUS_GLOB}')"
    ).fetchall()
    n = 0
    s = np.zeros(3, dtype=object)
    s2 = np.zeros(3, dtype=object)
    for data, fmt in rows:
        px = decode_image(bytes(data), fmt).astype(np.int64)
        n += px.shape[0] * px.shape[1]
        s = s + px.sum(axis=(0, 1))
        s2 = s2 + (px * px).sum(axis=(0, 1))
    assert out["n_px"].nunique() == 1 and int(out["n_px"][0]) == n
    for i, ch in enumerate(("r", "g", "b")):
        mean = int(s[i]) / n
        var = int(s2[i]) / n - mean * mean
        row = out[out["channel"] == ch].iloc[0]
        assert row["mean"] == mean, ch
        assert row["std"] == math.sqrt(var), ch


@pytest.mark.usefixtures("ray_session")
def test_user_entropy_degenerate_and_uniform(tmp_path):
    """A single-type user must get exactly H=0.0; a perfectly uniform
    k-type user must get exactly the ordered-accumulation value of
    ln(n) - k·(c·ln c)/n (floats compared bit-equal, not approx)."""
    import math

    import pyarrow.parquet as pq

    from crawler_seo_ray import queries as q

    ts = pa.array([1_000_000 * i for i in range(12)], pa.timestamp("us"))
    t = pa.table(
        {
            "event_id": pa.array(range(12), pa.int64()),
            "ts": ts,
            "user_id": pa.array([1] * 4 + [2] * 8, pa.int64()),
            "event_type": pa.array(
                ["view"] * 4 + ["view", "cart", "purchase", "click"] * 2
            ),
            "value": pa.array([1.0] * 12, pa.float64()),
            "props": pa.array(["{}"] * 12),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = (
        q.events_user_entropy(str(tmp_path))
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )
    assert out.loc[0, "entropy"] == 0.0 and out.loc[0, "n_types"] == 1
    # user 2: four types, 2 events each, accumulated in sorted-type order
    s = 0.0
    for _ in range(4):
        s += 2.0 * math.log(2.0)
    assert out.loc[1, "entropy"] == math.log(8.0) - s / 8.0
    assert out.loc[1, "n_types"] == 4


@pytest.mark.usefixtures("ray_session")
def test_luma_histogram_matches_whole_corpus_numpy():
    """The distributed 256-bin histogram, its cdf and the equalization
    LUT must be integer-identical to a single-pass numpy reference over
    every decoded image."""
    import duckdb

    from crawler_seo_ray import queries as q
    from crawler_seo_ray.functions.imagecodec import decode_image

    out = q.corpus_luma_histogram("unused").to_pandas()
    hist = np.zeros(256, dtype=np.int64)
    for data, fmt in duckdb.sql(
        f"SELECT bytes, fmt FROM read_parquet('{q._CORPUS_GLOB}')"
    ).fetchall():
        px = decode_image(bytes(data), fmt).astype(np.int64)
        luma = (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]) // 1000
        hist += np.bincount(luma.ravel(), minlength=256)
    cdf = np.cumsum(hist)
    assert (out["n"].to_numpy() == hist).all()
    assert (out["cdf"].to_numpy() == cdf).all()
    assert (out["lut"].to_numpy() == (255 * cdf) // int(cdf[-1])).all()


@pytest.mark.usefixtures("ray_session")
def test_crop_plan_windows_inside_frame_and_deterministic():
    """Every planned crop must lie fully inside its image, be exactly
    crop×crop, and be identical across two runs (the operator's whole
    point is stored-RNG-free reproducibility)."""
    import duckdb

    from crawler_seo_ray import queries as q

    a = q.corpus_crop_plan("unused").to_pandas().sort_values("image_id", ignore_index=True)
    b = q.corpus_crop_plan("unused").to_pandas().sort_values("image_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    dims = duckdb.sql(
        f"SELECT image_id, w, h FROM read_parquet('{q._CORPUS_GLOB}')"
    ).df()
    m = a.merge(dims, on="image_id")
    assert len(m) == len(a)
    assert ((m["x1"] - m["x0"]) == 16).all() and ((m["y1"] - m["y0"]) == 16).all()
    assert (m["x0"] >= 0).all() and (m["y0"] >= 0).all()
    assert (m["x1"] <= m["w"]).all() and (m["y1"] <= m["h"]).all()


def _write_events(tmp_path, rows):
    """rows: list of (event_id, user_id, ts_us, value)."""
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
def test_trailing_sum_peer_and_hour_boundary(tmp_path):
    """RANGE-frame semantics the ROWS frame doesn't have: peers at the
    SAME ts are all in each other's window (even the 'later' event_id),
    and an event exactly 1h earlier is still inside the frame."""
    from crawler_seo_ray import queries as q

    H = 3_600_000_000
    rows = [
        (1, 7, 0, 1.00),          # exactly 1h before the peers
        (2, 7, H, 2.00),          # peer pair at the same ts
        (3, 7, H, 4.00),
        (4, 7, 2 * H + 1, 8.00),  # first event now out of its window
    ]
    sf = _write_events(tmp_path, rows)
    out = (
        q.events_trailing_hour_sum(sf)
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    assert list(out["trailing_cents"]) == [100, 700, 700, 800]


@pytest.mark.usefixtures("ray_session")
def test_active_time_touching_intervals_merge(tmp_path):
    """Two events exactly 30 min apart produce ONE island (touching
    intervals merge: next start == running max end is not a break);
    31 min apart produce two. Overlaps must not double-count."""
    from crawler_seo_ray import queries as q

    M = 60_000_000
    rows = [
        (1, 1, 0, 1.0),
        (2, 1, 30 * M, 1.0),      # touching → merge, island spans 60 min
        (3, 2, 0, 1.0),
        (4, 2, 31 * M, 1.0),      # gap → two islands of 30 min each
        (5, 3, 0, 1.0),
        (6, 3, 10 * M, 1.0),      # overlap → one 40-min island
    ]
    sf = _write_events(tmp_path, rows)
    out = (
        q.events_active_time(sf)
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )
    assert list(out["n_islands"]) == [1, 2, 1]
    assert list(out["active_us"]) == [60 * M, 60 * M, 40 * M]


@pytest.mark.usefixtures("ray_session")
def test_gini_uniform_zero_and_dominant(tmp_path):
    """Equal per-user counts must give exactly gini = 0.0; a heavily
    dominant user must push it toward 1. Values are bit-checked against
    the closed-form integer formula, not approximated."""
    from crawler_seo_ray import queries as q

    rows = []
    eid = 0
    for u in (1, 2, 3):  # 4 events each → perfectly uniform
        for _ in range(4):
            rows.append((eid, u, eid * 1_000_000, 1.0))
            eid += 1
    sf = _write_events(tmp_path, rows)
    out = q.events_engagement_gini(sf).to_pandas()
    assert out.loc[0, "n_users"] == 3 and out.loc[0, "gini"] == 0.0

    import shutil

    shutil.rmtree(tmp_path, ignore_errors=True)
    os.makedirs(tmp_path, exist_ok=True)
    rows = [(i, 9, i * 1_000_000, 1.0) for i in range(97)]
    rows += [(97, 1, 97_000_000, 1.0), (98, 2, 98_000_000, 1.0), (99, 3, 99_000_000, 1.0)]
    sf = _write_events(tmp_path, rows)
    out = q.events_engagement_gini(sf).to_pandas()
    # sorted counts [1,1,1,97]: num = Σ(2i-nu-1)c = (-3-1-1+3*97)... closed form
    n = np.array([1, 1, 1, 97], dtype=np.int64)
    i = np.arange(1, 5)
    expect = float(((2 * i - 4 - 1) * n).sum()) / float(4 * n.sum())
    assert out.loc[0, "gini"] == expect and out.loc[0, "gini"] > 0.7


@pytest.mark.usefixtures("ray_session")
def test_pca_top_matches_eigh_and_deterministic():
    """The power-iteration component must align with numpy.linalg.eigh's
    top eigenvector of the same covariance (|cos| ≈ 1), its Rayleigh
    quotient must equal the top eigenvalue, and two runs must be
    bit-identical (layout-deterministic partial fold)."""
    from crawler_seo_ray import queries as q

    SF = "/root/testdata/sf0.001"
    a = q.embeddings_pca_top(SF).to_pandas()
    b = q.embeddings_pca_top(SF).to_pandas()
    pd.testing.assert_frame_equal(a, b)

    X = np.stack(pd.read_parquet(os.path.join(SF, "embeddings.parquet"))["embedding"].to_numpy())
    X = X.astype(np.float64)
    cov = np.cov(X, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    top = v[:, -1]
    got = a["loading"].to_numpy()
    assert abs(abs(top @ got) - 1.0) < 1e-6  # eigengap-limited convergence
    assert abs(a["eigenvalue"].iloc[0] - w[-1]) < 1e-8 * max(1.0, w[-1])


def test_emit_run_pairs_matches_itertools():
    """The vectorized within-basket pair emission must equal a brute
    itertools reference on dup-heavy, shuffled, single- and empty-run
    input."""
    import itertools

    from crawler_seo_ray.queries import _emit_run_pairs

    rng = np.random.default_rng(7)
    ok = rng.integers(0, 40, size=500)
    p = rng.integers(0, 25, size=500)
    ant, cons = _emit_run_pairs(ok.copy(), p.copy())
    got = sorted(zip(ant.tolist(), cons.tolist()))
    ref = []
    import collections

    baskets = collections.defaultdict(set)
    for o, q in zip(ok, p):
        baskets[o].add(q)
    for o, s in baskets.items():
        ref.extend(itertools.combinations(sorted(s), 2))
    assert got == sorted(ref)
    a, c = _emit_run_pairs(np.array([], dtype=np.int64), np.array([], dtype=np.int64))
    assert len(a) == 0 and len(c) == 0
    a, c = _emit_run_pairs(np.array([1, 1], dtype=np.int64), np.array([5, 5], dtype=np.int64))
    assert len(a) == 0  # single distinct part → no pairs


@pytest.mark.usefixtures("ray_session")
def test_quality_flags_match_whole_corpus_numpy():
    """Exposure counts, Laplacian variance and both flags must equal a
    per-image numpy reference in the documented op order (integer Σ/Σ²,
    two float divisions)."""
    import duckdb

    from crawler_seo_ray import queries as q
    from crawler_seo_ray.functions.imagecodec import decode_image

    out = (
        q.corpus_quality_flags("unused")
        .to_pandas()
        .set_index("image_id")
        .sort_index()
    )
    rows = duckdb.sql(
        f"SELECT image_id, bytes, fmt FROM read_parquet('{q._CORPUS_GLOB}')"
    ).fetchall()
    assert len(out) == len(rows)
    n_blurry = 0
    for iid, data, fmt in rows:
        px = decode_image(bytes(data), fmt).astype(np.int64)
        luma = (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]) // 1000
        r = out.loc[iid]
        assert r["n_px"] == luma.size
        assert r["n_dark"] == int((luma < 16).sum())
        assert r["n_bright"] == int((luma > 239).sum())
        c = luma[1:-1, 1:-1]
        lap = 4 * c - luma[:-2, 1:-1] - luma[2:, 1:-1] - luma[1:-1, :-2] - luma[1:-1, 2:]
        n = lap.size
        mean = int(lap.sum()) / n
        var = int((lap * lap).sum()) / n - mean * mean
        assert r["lap_var"] == var
        assert r["too_dark"] == int(100 * r["n_dark"] > 30 * r["n_px"])
        assert r["blurry"] == int(var < 100.0)
        n_blurry += int(var < 100.0)
    # the synthetic corpus has textured images — not everything is blurry
    assert 0 <= n_blurry < len(rows)


@pytest.mark.usefixtures("ray_session")
def test_markov_stationary_matches_eig():
    """The power-iterated stationary vector must satisfy v = vM to
    numerical tolerance and match the dominant left eigenvector of the
    same row-normalized matrix."""
    from crawler_seo_ray import queries as q

    SF = "/root/testdata/sf0.001"
    out = q.events_markov_stationary(SF).to_pandas()
    tr = q.events_transitions(SF).to_pandas()
    types = sorted(set(tr["prev_type"]) | set(tr["event_type"]))
    idx = {s: i for i, s in enumerate(types)}
    n = len(types)
    M = np.zeros((n, n))
    for _, r in tr.iterrows():
        M[idx[r["prev_type"]], idx[r["event_type"]]] = r["n"]
    rows = M.sum(axis=1)
    for i in range(n):
        M[i] = M[i] / rows[i] if rows[i] > 0 else 1.0 / n
    v = out["stationary"].to_numpy()
    assert list(out["event_type"]) == types
    assert np.abs(v @ M - v).max() < 1e-12
    w, vecs = np.linalg.eig(M.T)
    top = np.real(vecs[:, np.argmax(np.real(w))])
    top = top / top.sum()
    assert np.abs(top - v).max() < 1e-9


@pytest.mark.usefixtures("ray_session")
def test_global_exclusive_running_max_cross_block_carry():
    """The watermark primitive must carry the prefix max ACROSS sorted
    blocks (descending value at a block boundary must still see the
    earlier max) and emit NULL only on the globally first row."""
    import pyarrow as pa
    import ray.data as rd

    from crawler_seo_ray.stages.window import global_exclusive_running_max

    n = 1000
    rng = np.random.default_rng(7)
    order = np.arange(n, dtype=np.int64)
    vals = rng.integers(0, 10_000, size=n).astype(np.int64)
    t = pa.table({"k": pa.array(order), "v": pa.array(vals)})
    ds = rd.from_arrow(t).repartition(7)
    out = (
        global_exclusive_running_max(ds, ["k"], "v", out_col="pm")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    expect = np.maximum.accumulate(vals)[:-1]
    assert pd.isna(out["pm"].iloc[0])
    assert (out["pm"].iloc[1:].to_numpy().astype(np.int64) == expect).all()


@pytest.mark.usefixtures("ray_session")
def test_late_census_flags_planted_stragglers():
    """events_late_census on the real table: every flagged row must be
    behind its watermark, and the jittered arrival order must produce a
    non-degenerate split (some late, most on time)."""
    from crawler_seo_ray import queries as q

    out = q.events_late_census("/root/testdata/sf0.001").to_pandas()
    late = out[out["late"] == 1]
    ontime = out[out["late"] == 0]
    assert len(late) > 0 and len(ontime) > len(late)
    assert (late["ts"] < late["watermark"]).all()
    # on-time rows with a non-null watermark must NOT be behind it
    ok = ontime.dropna(subset=["watermark"])
    assert (ok["ts"] >= ok["watermark"]).all()
    assert out["watermark"].isna().sum() == 1


@pytest.mark.usefixtures("ray_session")
def test_ks_drift_matches_numpy_reference():
    """The distributed KS must equal a single-process exact reference
    (cumulative counts over the merged sorted sample)."""
    import duckdb

    from crawler_seo_ray import queries as q

    sf = "/root/testdata/sf0.001"
    out = q.orders_ks_drift(sf).to_pandas().iloc[0]
    t = duckdb.query(
        f"SELECT o_totalprice, o_orderstatus FROM read_parquet('{sf}/orders.parquet')"
    ).df()
    v = np.floor(t["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    s1 = (t["o_orderstatus"] == "O").to_numpy()
    n1, n2 = int(s1.sum()), int((~s1).sum())
    vals = np.unique(v)
    c1 = np.searchsorted(np.sort(v[s1]), vals, side="right")
    c2 = np.searchsorted(np.sort(v[~s1]), vals, side="right")
    d = np.abs(c1 / n1 - c2 / n2)
    i = int(np.argmax(d))
    assert out["n1"] == n1 and out["n2"] == n2
    assert out["d_stat"] == d[i]
    assert out["at_value"] == vals[i] / 100.0


@pytest.mark.usefixtures("ray_session")
def test_dup_span_census_matches_set_reference():
    """Span census vs an independent set-based reference over the same
    documents (distinct 8-gram sets, pairwise-shared counts)."""
    import duckdb

    from crawler_seo_ray import queries as q

    sf = "/root/testdata/sf0.001"
    out = (
        q.docs_dup_span_census(sf)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    t = duckdb.query(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).df()
    grams = {}
    totals = {}
    for did, text in zip(t["doc_id"], t["text"]):
        tok = text.split(" ")
        gs = [" ".join(tok[i : i + 8]) for i in range(max(len(tok) - 7, 0))]
        totals[did] = len(gs)
        grams[did] = set(gs)
    df = {}
    for did, gs in grams.items():
        for g in gs:
            df[g] = df.get(g, 0) + 1
    for did in totals:
        if totals[did] == 0:
            assert did not in out.index
            continue
        row = out.loc[did]
        assert row["n_kgrams"] == totals[did]
        assert row["n_distinct"] == len(grams[did])
        assert row["n_dup"] == sum(1 for g in grams[did] if df[g] >= 2)
    assert out["n_dup"].sum() > 0  # census is non-degenerate on this corpus


@pytest.mark.usefixtures("ray_session")
def test_scd2_intervals_tile_user_history():
    """SCD-2 runs must partition each user's events: valid_from strictly
    increasing, valid_to chains to the next valid_from (NULL last), and
    run lengths sum to the user's event count."""
    import duckdb

    from crawler_seo_ray import queries as q

    sf = "/root/testdata/sf0.001"
    out = q.events_scd2(sf).to_pandas()
    counts = duckdb.query(
        f"SELECT user_id, count(*) AS n FROM read_parquet('{sf}/events.parquet') GROUP BY 1"
    ).df().set_index("user_id")["n"]
    for uid, g in out.groupby("user_id"):
        g = g.sort_values("valid_from").reset_index(drop=True)
        assert g["n_events"].sum() == counts[uid]
        assert g["valid_to"].isna().sum() == 1 and pd.isna(g["valid_to"].iloc[-1])
        assert (g["valid_to"].iloc[:-1].to_numpy() == g["valid_from"].iloc[1:].to_numpy()).all()
        # adjacent runs must actually change type
        assert (g["event_type"].iloc[1:].to_numpy() != g["event_type"].iloc[:-1].to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
def test_palette_matches_whole_corpus_numpy():
    """Top-3 quantized bins, shares and color entropy must equal the
    per-image numpy reference bit-for-bit (stable (-count, bin)
    tie-break, ascending-bin entropy fold)."""
    import duckdb

    from crawler_seo_ray import queries as q
    from crawler_seo_ray.functions.imagecodec import decode_image

    out = (
        q.corpus_palette("unused").to_pandas().set_index("image_id").sort_index()
    )
    rows = duckdb.sql(
        f"SELECT image_id, bytes, fmt FROM read_parquet('{q._CORPUS_GLOB}')"
    ).fetchall()
    assert len(out) == len(rows)
    multi = 0
    for iid, data, fmt in rows:
        px = decode_image(bytes(data), fmt).astype(np.int64)
        qz = (((px[..., 0] >> 4) << 8) | ((px[..., 1] >> 4) << 4) | (px[..., 2] >> 4)).ravel()
        counts = np.bincount(qz, minlength=4096)
        nz = np.flatnonzero(counts)
        order = nz[np.lexsort((nz, -counts[nz]))]
        r = out.loc[iid]
        for k in range(3):
            if k < len(order):
                assert r[f"bin{k+1}"] == order[k]
                assert r[f"share{k+1}"] == counts[order[k]] / qz.size
            else:
                assert pd.isna(r[f"bin{k+1}"])
        p = counts[nz] / qz.size
        assert r["color_entropy"] == float(-(p * np.log2(p)).sum())
        multi += int(len(order) >= 3)
    assert multi > 0  # corpus images are not single-color


@pytest.mark.usefixtures("ray_session")
def test_bootstrap_replicates_give_sane_se():
    """Replicate means must vary (independent weight draws), and the
    point estimate must sit within a few bootstrap SEs of every
    replicate mean's center."""
    import duckdb

    from crawler_seo_ray import queries as q

    sf = "/root/testdata/sf0.001"
    out = q.lineitem_bootstrap_se(sf).to_pandas()
    assert len(out) == 32 and out["replicate"].is_unique
    means = out["mean_revenue"].to_numpy()
    se = means.std(ddof=1)
    assert se > 0
    point = duckdb.query(
        f"SELECT avg(l_extendedprice) FROM read_parquet('{sf}/lineitem.parquet')"
    ).fetchone()[0]
    assert abs(means.mean() - point) < 5 * se
    # Poisson(1) weights: effective n stays near the row count
    n_rows = duckdb.query(
        f"SELECT count(*) FROM read_parquet('{sf}/lineitem.parquet')"
    ).fetchone()[0]
    assert (abs(out["n_eff"] - n_rows) < 5 * np.sqrt(n_rows)).all()


@pytest.mark.usefixtures("ray_session")
def test_negative_samples_exclude_anchor():
    from crawler_seo_ray import queries as q

    out = q.corpus_negative_samples("unused").to_pandas()
    assert (out["image_id"] != out["neg_image_id"]).all()
    assert out.groupby("image_id")["slot"].count().eq(4).all()
    # shifted-draw uniformity smoke: negatives cover most of the corpus
    assert out["neg_image_id"].nunique() > 250


@pytest.mark.usefixtures("ray_session")
def test_channel_covariance_matches_numpy():
    """Cross-channel covariance/correlation must equal the whole-corpus
    numpy reference bit-for-bit (exact integer moments, documented
    float op order)."""
    import math

    import duckdb

    from crawler_seo_ray import queries as q
    from crawler_seo_ray.functions.imagecodec import decode_image

    out = q.corpus_channel_covariance("unused").to_pandas().set_index(["ch_a", "ch_b"])
    rows = duckdb.sql(
        f"SELECT bytes, fmt FROM read_parquet('{q._CORPUS_GLOB}')"
    ).fetchall()
    n = 0
    s = np.zeros(3, dtype=object)
    xx = np.zeros((3, 3), dtype=object)
    for data, fmt in rows:
        px = decode_image(bytes(data), fmt).astype(np.int64).reshape(-1, 3)
        n += px.shape[0]
        s = s + px.sum(axis=0)
        xx = xx + px.T @ px
    mean = [int(s[c]) / n for c in range(3)]
    var = [int(xx[c, c]) / n - mean[c] * mean[c] for c in range(3)]
    ix = {"r": 0, "g": 1, "b": 2}
    for (a, b), row in out.iterrows():
        ca, cb = ix[a], ix[b]
        cov = int(xx[min(ca, cb), max(ca, cb)]) / n - mean[ca] * mean[cb]
        assert row["cov"] == cov
        assert row["corr"] == cov / math.sqrt(var[ca] * var[cb])


@pytest.mark.usefixtures("ray_session")
def test_snapshot_is_prefix_of_full_audit():
    """audit_snapshot(k) must equal the final audit restricted to
    waves ≤ k, and be a contiguous visit_seq prefix."""
    import tempfile

    from crawler_seo_ray import datagen
    from crawler_seo_ray.canon import Scope
    from crawler_seo_ray.oracle import CrawlSpec
    from crawler_seo_ray.pipelines.crawl import EngineConfig, run_crawl
    from crawler_seo_ray.pipelines.report import audit_snapshot
    from crawler_seo_ray.queries import CORPUS_N, corpus_dir

    spec = CrawlSpec(
        n_pages=CORPUS_N, seeds=[datagen.url(1)], max_urls=100, batch_size=25,
        scope=Scope("suffix", datagen.HOST_SUFFIX),
    )
    ckpt = tempfile.mkdtemp(prefix="snaptest_")
    res = run_crawl(
        spec, corpus_dir(), EngineConfig(num_workers=2, checkpoint_dir=ckpt)
    )
    full = res.audit.to_pandas().sort_values("visit_seq").reset_index(drop=True)
    for k in (0, 1):
        snap = (
            audit_snapshot(ckpt, k, columns=["visit_seq", "url", "wave"])
            .to_pandas()
            .sort_values("visit_seq")
            .reset_index(drop=True)
        )
        want = full[full["wave"] <= k]
        assert list(snap["visit_seq"]) == list(range(len(snap)))
        assert list(snap["url"]) == list(want["url"])
    assert len(full) == 100


@pytest.mark.usefixtures("ray_session")
def test_hll_set_algebra_error_bound():
    """Union and intersection estimates must land within HLL error of
    the exact set sizes (p=12 → ~1.6 % standard error; assert 6 σ plus
    the inclusion-exclusion slack on the small intersection)."""
    import duckdb

    from crawler_seo_ray import queries as q

    sf = "/root/testdata/sf0.01"
    out = q.events_type_overlap(sf).to_pandas().iloc[0]
    ex = duckdb.query(f"""
        SELECT
          (SELECT count(DISTINCT user_id) FROM read_parquet('{sf}/events.parquet') WHERE event_type='click') AS a,
          (SELECT count(DISTINCT user_id) FROM read_parquet('{sf}/events.parquet') WHERE event_type='view') AS b,
          (SELECT count(DISTINCT user_id) FROM read_parquet('{sf}/events.parquet') WHERE event_type IN ('click','view')) AS u,
          (SELECT count(*) FROM (
             SELECT user_id FROM read_parquet('{sf}/events.parquet') WHERE event_type='click'
             INTERSECT
             SELECT user_id FROM read_parquet('{sf}/events.parquet') WHERE event_type='view')) AS i
    """).df().iloc[0]
    for est, true in ((out["approx_a"], ex["a"]), (out["approx_b"], ex["b"]),
                      (out["approx_union"], ex["u"])):
        assert abs(est - true) <= max(10, 0.10 * true), (est, true)
    # intersection inherits three sketches' errors — wider bound
    assert abs(out["approx_intersection"] - ex["i"]) <= max(
        20, 0.25 * max(ex["a"], ex["b"])
    )


@pytest.mark.usefixtures("ray_session")
def test_kmv_set_algebra_tight_small_intersection():
    """The theta/KMV estimator must match exact counts tightly — with
    k=1024 ≥ each group's distinct count the sketch is EXACT (θ=1),
    and on a planted small-intersection dataset (where HLL's
    inclusion–exclusion is loose) the direct-overlap estimate must
    recover the true intersection exactly."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from crawler_seo_ray import queries as q
    from crawler_seo_ray.stages.sketch import kmv_set_algebra

    sf = "/root/testdata/sf0.01"
    out = q.events_type_overlap_kmv(sf).to_pandas().iloc[0]
    ex = duckdb.query(f"""
        SELECT
          (SELECT count(DISTINCT user_id) FROM read_parquet('{sf}/events.parquet') WHERE event_type='click') AS a,
          (SELECT count(DISTINCT user_id) FROM read_parquet('{sf}/events.parquet') WHERE event_type='view') AS b,
          (SELECT count(DISTINCT user_id) FROM read_parquet('{sf}/events.parquet') WHERE event_type IN ('click','view')) AS u,
          (SELECT count(*) FROM (
             SELECT user_id FROM read_parquet('{sf}/events.parquet') WHERE event_type='click'
             INTERSECT
             SELECT user_id FROM read_parquet('{sf}/events.parquet') WHERE event_type='view')) AS i
    """).df().iloc[0]
    if out["theta"] == 1.0:  # unsaturated ⇒ exact by construction
        assert out["approx_a"] == ex["a"] and out["approx_b"] == ex["b"]
        assert out["approx_union"] == ex["u"]
        assert out["approx_intersection"] == ex["i"]
    else:  # saturated ⇒ theta bounds (std err ~1/sqrt(k) ≈ 3.1 %; 6σ)
        for est, true in ((out["approx_a"], ex["a"]), (out["approx_b"], ex["b"]),
                          (out["approx_union"], ex["u"])):
            assert abs(est - true) <= max(10, 0.20 * true), (est, true)
        assert abs(out["approx_intersection"] - ex["i"]) <= max(10, 0.20 * ex["u"])

    # planted small intersection over big disjoint sets: 3 shared users
    # among 6000 distinct per side — saturates k=64 sketches
    a_users = list(range(0, 6000))
    b_users = list(range(10_000, 16_000)) + [1, 2, 3]
    tbl = pa.table(
        {
            "grp": pa.array(["a"] * len(a_users) + ["b"] * len(b_users)),
            "uid": pa.array(a_users + b_users, pa.int64()),
        }
    )
    est = kmv_set_algebra(rd.from_arrow(tbl), "grp", "uid", "a", "b", k=4096).to_pandas().iloc[0]
    # k=4096 < 12003 distinct in the union but > each side: theta from
    # saturation or not — either way the tiny intersection must not be
    # wildly off (HLL incl-excl at this shape errs by hundreds)
    assert est["approx_intersection"] <= 50, est["approx_intersection"]
    assert abs(est["approx_a"] - 6000) <= 300
    assert abs(est["approx_b"] - 6003) <= 300


@pytest.mark.usefixtures("ray_session")
def test_grayworld_gains_match_whole_corpus_numpy():
    """Per-image gray-world gains must be bit-equal to a driver-side
    numpy reference over every decoded corpus image (exact int sums,
    one float division per channel in the documented order)."""
    import duckdb

    from crawler_seo_ray import queries as q
    from crawler_seo_ray.functions.imagecodec import decode_image

    out = (
        q.corpus_grayworld_gains("unused")
        .to_pandas()
        .set_index("image_id")
        .sort_index()
    )
    rows = duckdb.sql(
        f"SELECT image_id, bytes, fmt FROM read_parquet('{q._CORPUS_GLOB}')"
    ).fetchall()
    assert len(out) == len(rows)
    for image_id, data, fmt in rows:
        px = decode_image(bytes(data), fmt).astype(np.int64)
        s = px.sum(axis=(0, 1))
        tot = int(s[0]) + int(s[1]) + int(s[2])
        row = out.loc[image_id]
        assert int(row["n_px"]) == px.shape[0] * px.shape[1]
        for i, ch in enumerate(("r", "g", "b")):
            ref = tot / (3 * int(s[i])) if int(s[i]) else 1.0
            assert row[f"gain_{ch}"] == ref, (image_id, ch)


@pytest.mark.usefixtures("ray_session")
def test_tile_phash_dups_planted_quadrant():
    """An image that shares EXACTLY one quadrant with another (a crop
    re-post) must surface as a partial-dup pair with n_shared_tiles=1;
    an exact duplicate must score 4; unrelated noise images must not
    pair. Also pins the full corpus output against a brute-force
    driver-side reference."""
    import ray.data as rd

    from crawler_seo_ray import queries as q
    from crawler_seo_ray.functions.imagecodec import encode_image, phash64
    from crawler_seo_ray.stages.multimodal import TilePhashes

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    crop = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    crop[:16, :16] = base[:16, :16]  # shared top-left quadrant
    dup = base.copy()
    noise = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    imgs = {"img_base": base, "img_crop": crop, "img_dup": dup, "img_noise": noise}
    t = pa.table(
        {
            "image_id": pa.array(list(imgs), pa.string()),
            "bytes": pa.array([encode_image(v, "png") for v in imgs.values()], pa.binary()),
            "fmt": pa.array(["png"] * len(imgs), pa.string()),
        }
    )
    tiles = rd.from_arrow(t).map_batches(
        TilePhashes, concurrency=1, batch_format="pyarrow"
    )
    pairs = q._tile_pairs(tiles).to_pandas().set_index(["id_a", "id_b"])
    # dense_limit=0 forces the distributed sorted_group_apply pair
    # emission (r5 multi-bucket kernel) — must equal the dense fold
    dist = (
        q._tile_pairs(tiles, dense_limit=0)
        .to_pandas()
        .sort_values(["id_a", "id_b"], ignore_index=True)
        .set_index(["id_a", "id_b"])
    )
    pd.testing.assert_frame_equal(pairs.sort_index(), dist.sort_index(), check_dtype=False)
    assert pairs.loc[("img_base", "img_dup"), "n_shared_tiles"] == 4
    assert pairs.loc[("img_base", "img_crop"), "n_shared_tiles"] == 1
    assert pairs.loc[("img_crop", "img_dup"), "n_shared_tiles"] == 1
    assert ("img_base", "img_noise") not in pairs.index

    # full-corpus brute-force pin
    import duckdb
    from collections import defaultdict

    from crawler_seo_ray.functions.imagecodec import decode_image

    rows = duckdb.sql(
        f"SELECT image_id, bytes, fmt FROM read_parquet('{q._CORPUS_GLOB}')"
    ).fetchall()
    buckets = defaultdict(set)
    for image_id, data, fmt in rows:
        px = decode_image(bytes(data), fmt)
        h, w = px.shape[0], px.shape[1]
        if h < 16 or w < 16:
            continue
        hh, hw = h // 2, w // 2
        for quad in (px[:hh, :hw], px[:hh, hw:], px[hh:, :hw], px[hh:, hw:]):
            buckets[phash64(quad)].add(image_id)
    ref = defaultdict(int)
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                ref[(ids[i], ids[j])] += 1
    got = q.corpus_tile_phash_dups("unused").to_pandas()
    got_map = {
        (a, b): int(n)
        for a, b, n in zip(got["id_a"], got["id_b"], got["n_shared_tiles"])
    }
    assert got_map == dict(ref)


@pytest.mark.usefixtures("ray_session")
def test_sorted_agg_by_key_matches_pandas():
    """The sort-kernel aggregation operator (r4): multi-agg, multi-key,
    count, float min — must equal a pandas groupby bit-for-bit, emit
    each key exactly once (the edge/interior split never divides a
    key's rows: a key is first/last in EVERY block that holds it or in
    none), and preserve value dtypes."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from crawler_seo_ray.queries import _sorted_agg_by_key

    rng = np.random.default_rng(3)
    n = 60_000
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 2500, n)),
            "k2": pa.array(rng.integers(0, 3, n)),
            "v": pa.array(rng.integers(0, 100, n)),
            "f": pa.array(rng.random(n)),
        }
    )
    ds = rd.from_arrow(t).repartition(8)
    out = _sorted_agg_by_key(
        ds, "k", [("v", "sum", "sv"), ("v", "max", "mv"), ("f", "min", "mf"), (None, "count", "n")]
    ).to_pandas()
    assert out["k"].is_unique
    ref = (
        t.to_pandas()
        .groupby("k")
        .agg(sv=("v", "sum"), mv=("v", "max"), mf=("f", "min"), n=("v", "size"))
        .reset_index()
    )
    pd.testing.assert_frame_equal(
        out.sort_values("k", ignore_index=True),
        ref.sort_values("k", ignore_index=True),
        check_dtype=False,
    )

    out2 = _sorted_agg_by_key(ds, ["k", "k2"], [("v", "sum", "sv")]).to_pandas()
    assert out2.set_index(["k", "k2"]).index.is_unique
    ref2 = t.to_pandas().groupby(["k", "k2"]).agg(sv=("v", "sum")).reset_index()
    pd.testing.assert_frame_equal(
        out2.sort_values(["k", "k2"], ignore_index=True),
        ref2.sort_values(["k", "k2"], ignore_index=True),
        check_dtype=False,
    )


@pytest.mark.usefixtures("ray_session")
def test_sorted_agg_by_key_hot_key_edge_bound(monkeypatch):
    """Skew-proofing (r5): a key holding 50% of all rows spans many
    blocks after the global sort; every straddling run must reach the
    driver as ONE pre-folded (key, partial) row per block — not raw
    rows — so the driver edge is ≤2 rows/block under any skew. r4
    shipped straddling runs raw (Θ(hot-key rows) driver-side). Also
    covers the narrow-dtype path: int32 values must come back int32
    from both the interior fold and the driver patch."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    import crawler_seo_ray.util as U

    rng = np.random.default_rng(7)
    n = 200_000
    k = rng.integers(1, 4000, n)
    k[: n // 2] = 0  # one hot key = 50% of rows
    rng.shuffle(k)
    t = pa.table(
        {
            "k": pa.array(k),
            "v": pa.array(rng.integers(0, 100, n).astype(np.int32), pa.int32()),
            "f": pa.array(rng.random(n)),
        }
    )
    captured = {}
    real_collect = U.collect_arrow

    def spy(ds, schema=None):
        out = real_collect(ds, schema)
        captured["edge_rows"] = out.num_rows
        return out

    monkeypatch.setattr(U, "collect_arrow", spy)
    ds = rd.from_arrow(t).repartition(16)
    out = U.sorted_agg_by_key(
        ds,
        "k",
        [("v", "sum", "sv"), ("v", "max", "mv"), ("f", "min", "mf"), (None, "count", "n")],
    )
    out_t = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow") if b.num_rows]
    )
    # schema invariant (ADVICE r4): int32 values stay int32 everywhere,
    # so interior ∪ edge blocks concat without promotion
    assert out_t.schema.field("sv").type == pa.int32()
    assert out_t.schema.field("mv").type == pa.int32()
    out_df = out_t.to_pandas()
    # edge volume: ≤2 pre-folded rows per fold batch; map_batches folds
    # ≥1024-row batches, so the bound is far under the hot key's 100k
    # rows (the r4 behavior). Allow generous slack over 2×(n/1024).
    assert captured["edge_rows"] <= 2 * (n // 1024 + 16), captured
    assert out_df["k"].is_unique
    ref = (
        t.to_pandas()
        .groupby("k")
        .agg(sv=("v", "sum"), mv=("v", "max"), mf=("f", "min"), n=("v", "size"))
        .reset_index()
    )
    pd.testing.assert_frame_equal(
        out_df.sort_values("k", ignore_index=True),
        ref.sort_values("k", ignore_index=True),
        check_dtype=False,
    )


@pytest.mark.usefixtures("ray_session")
def test_events_funnel_purchase_only_interior_users(tmp_path):
    """Regression (ADVICE r4): a sorted block whose interior users are
    ALL purchase-only used to make _funnel_all index an empty view
    array (vu[starts] with starts=[0]). 48 purchase-only users between
    two view-only users forces that shape through the real pipeline."""
    import numpy as np
    import pandas as pd

    from crawler_seo_ray import queries as q

    rows = []
    base = pd.Timestamp("2024-01-01")
    for u in range(50):
        etype = "view" if u in (0, 49) else "purchase"
        for i in range(30):
            rows.append((u * 100 + i, base + pd.Timedelta(minutes=i), u, etype, 1.0, "{}"))
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(tmp_path / "events.parquet")
    out = q.events_funnel(str(tmp_path)).to_pandas().sort_values("user_id", ignore_index=True)
    assert list(out["user_id"]) == [0, 49]
    assert list(out["n_views"]) == [30, 30]
    assert list(out["n_converted"]) == [0, 0]


@pytest.mark.usefixtures("ray_session")
def test_sorted_group_apply_matches_pandas_groupby_apply():
    """Direct contract test for the r5 window sort-kernel: a per-group
    running sum + per-group top-2 (descending order path) computed
    through sorted_group_apply must equal a pandas groupby reference,
    with every group emitted exactly once even when hot keys straddle
    many blocks (one key = 30% of rows)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from crawler_seo_ray.util import sorted_group_apply

    rng = np.random.default_rng(11)
    n = 120_000
    k = rng.integers(1, 5000, n)
    k[: int(n * 0.3)] = 0  # hot key straddles blocks after the sort
    rng.shuffle(k)
    t = pa.table(
        {
            "k": pa.array(k),
            "o": pa.array(rng.permutation(n).astype(np.int64)),
            "v": pa.array(rng.integers(0, 1000, n)),
        }
    )
    ds = rd.from_arrow(t).repartition(16)

    def running(tt: pa.Table) -> pa.Table:
        if tt.num_rows == 0:
            return pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "o": pa.array([], pa.int64()),
                    "run": pa.array([], pa.int64()),
                }
            )
        kk = tt.column("k").to_numpy(zero_copy_only=False)
        vv = tt.column("v").to_numpy(zero_copy_only=False)
        cum = np.cumsum(vv)
        starts = np.flatnonzero(np.r_[True, kk[1:] != kk[:-1]])
        runlens = np.diff(np.r_[starts, kk.size])
        base = np.repeat((cum - vv)[starts], runlens)
        return pa.table(
            {
                "k": pc.cast(tt.column("k"), pa.int64()),
                "o": pc.cast(tt.column("o"), pa.int64()),
                "run": pa.array(cum - base),
            }
        )

    out = sorted_group_apply(ds, "k", ["o"], running).to_pandas()
    df = t.to_pandas().sort_values(["k", "o"])
    df["run"] = df.groupby("k")["v"].cumsum()
    ref = df[["k", "o", "run"]]
    pd.testing.assert_frame_equal(
        out.sort_values(["k", "o"], ignore_index=True),
        ref.sort_values(["k", "o"], ignore_index=True).reset_index(drop=True),
        check_dtype=False,
    )

    def top2(tt: pa.Table) -> pa.Table:
        if tt.num_rows == 0:
            return pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                    "rk": pa.array([], pa.int64()),
                }
            )
        kk = tt.column("k").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, kk[1:] != kk[:-1]])
        runlens = np.diff(np.r_[starts, kk.size])
        rk = np.arange(kk.size, dtype=np.int64) - np.repeat(starts, runlens)
        keep = rk < 2
        outt = tt.filter(pa.array(keep))
        return pa.table(
            {
                "k": pc.cast(outt.column("k"), pa.int64()),
                "v": pc.cast(outt.column("v"), pa.int64()),
                "rk": pa.array(rk[keep] + 1, pa.int64()),
            }
        )

    out2 = sorted_group_apply(
        ds, "k", ["v", "o"], top2, descending=[True, False]
    ).to_pandas()
    df2 = t.to_pandas().sort_values(
        ["k", "v", "o"], ascending=[True, False, True]
    )
    df2["rk"] = df2.groupby("k").cumcount() + 1
    ref2 = df2[df2["rk"] <= 2][["k", "v", "rk"]]
    pd.testing.assert_frame_equal(
        out2.sort_values(["k", "rk"], ignore_index=True),
        ref2.sort_values(["k", "rk"], ignore_index=True).reset_index(drop=True),
        check_dtype=False,
    )


@pytest.mark.usefixtures("ray_session")
def test_sort_kernels_property_vs_pandas():
    """Property test (hypothesis): sorted_agg_by_key and
    sorted_group_apply equal pandas references under randomized key
    cardinality (1 key → n keys, incl. degenerate single-key and
    all-unique), value signs, and partition counts — the shapes that
    stress the interior/edge split."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from crawler_seo_ray.util import sorted_agg_by_key, sorted_group_apply

    @settings(max_examples=15, deadline=None)
    @given(
        st.integers(min_value=1, max_value=400),   # rows
        st.integers(min_value=1, max_value=50),    # key cardinality
        st.integers(min_value=1, max_value=7),     # partitions
        st.integers(min_value=0, max_value=2**31), # seed
    )
    def check(n, kc, parts, seed):
        rng = np.random.default_rng(seed)
        k = rng.integers(0, kc, n)
        v = rng.integers(-1000, 1000, n)
        o = rng.permutation(n).astype(np.int64)
        t = pa.table({"k": pa.array(k), "o": pa.array(o), "v": pa.array(v)})
        ds = rd.from_arrow(t).repartition(parts)
        agg = sorted_agg_by_key(
            ds, "k", [("v", "sum", "s"), ("v", "min", "mn"), (None, "count", "c")]
        ).to_pandas()
        ref = (
            t.to_pandas().groupby("k")
            .agg(s=("v", "sum"), mn=("v", "min"), c=("v", "size"))
            .reset_index()
        )
        pd.testing.assert_frame_equal(
            agg.sort_values("k", ignore_index=True),
            ref.sort_values("k", ignore_index=True),
            check_dtype=False,
        )

        def lastval(tt: pa.Table) -> pa.Table:
            if tt.num_rows == 0:
                return pa.table(
                    {"k": pa.array([], pa.int64()), "lv": pa.array([], pa.int64())}
                )
            kk = tt.column("k").to_numpy(zero_copy_only=False)
            vv = tt.column("v").to_numpy(zero_copy_only=False)
            ends = np.r_[np.flatnonzero(kk[1:] != kk[:-1]), kk.size - 1]
            return pa.table(
                {
                    "k": pa.array(kk[ends], pa.int64()),
                    "lv": pa.array(vv[ends], pa.int64()),
                }
            )

        win = sorted_group_apply(ds, "k", ["o"], lastval).to_pandas()
        ref2 = (
            t.to_pandas().sort_values(["k", "o"]).groupby("k").last()
            .reset_index()[["k", "v"]].rename(columns={"v": "lv"})
        )
        pd.testing.assert_frame_equal(
            win.sort_values("k", ignore_index=True),
            ref2.sort_values("k", ignore_index=True),
            check_dtype=False,
        )

    check()
