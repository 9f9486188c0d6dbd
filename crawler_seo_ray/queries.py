"""Operator registry for the driver contract (``__ray_entry__``).

Each entry demonstrates one operator class from SURVEY.md §2 (or a
training-data extension) over the driver's parquet tables at ``sf_dir``,
paired — where ANSI SQL can express it — with a DuckDB oracle in
``ORACLE_SQL``. Column names and types are deliberately aligned between
the Ray pipeline and the SQL so the driver's sorted-by-name value-hash
comparison is meaningful.

Crawl-engine demonstrations (visit order, audit scores, image stats)
run over the deterministic synthetic corpus (BASELINE.json input_hint
shape) cached under /tmp. The iterative-crawl and pixel-decoding ones
are rows-only checks (no SQL oracle can express them); the corpus
queries whose outputs are derivable from the stored corpus columns
(phash near-dup pairs, resize geometry) carry read_parquet oracles
over the same cache.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from . import datagen
from .canon import Scope
from .functions.text import detect_language, fingerprint64, quality_features

# --- corpus cache for crawl-flagship queries (sf-independent) -----------
_CACHE_ROOT = "/tmp/crawler_seo_ray_cache"
CORPUS_N = 300
_CORPUS_DIMS = (16, 33)


def _safe_workers(cap: int = 4) -> int:
    """Worker-pool size that can actually schedule in the host's Ray
    session (a fixed count deadlocks when the driver inits fewer CPUs)."""
    try:
        cpus = int(ray.available_resources().get("CPU", cap))
    except Exception:
        cpus = cap
    return max(1, min(cap, cpus - 1 if cpus > 1 else 1))


def corpus_dir() -> str:
    d = os.path.join(
        _CACHE_ROOT,
        f"corpus_n{CORPUS_N}_d{_CORPUS_DIMS[0]}_{_CORPUS_DIMS[1]}_v{datagen.GEN_VERSION}",
    )
    if not os.path.exists(os.path.join(d, "manifest.json")):
        datagen.write_corpus(d, CORPUS_N, rows_per_shard=64,
                             dim_base=_CORPUS_DIMS[0], dim_mod=_CORPUS_DIMS[1])
    return d


def corpus_parquet(columns=None):
    import glob

    paths = sorted(glob.glob(os.path.join(corpus_dir(), "part-*.parquet")))
    return rd.read_parquet(paths, columns=columns)


def _pq(sf_dir: str, table: str, columns=None, blocks: int | None = None):
    """Read one driver table; ``blocks`` splits the single-file read so
    downstream map/aggregate stages actually parallelize (a one-file
    read is otherwise one block)."""
    return rd.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"),
        columns=columns,
        override_num_blocks=blocks,
    )


# ---------------------------------------------------------------------------
# SQL-checked relational operators
# ---------------------------------------------------------------------------


def _join_partitions() -> int:
    """Hash-join partition count proportional to cluster CPUs — each
    partition costs one aggregator actor (fixed startup), so a small
    node wants few and a 256-node cluster wants hundreds."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, cpus // 8)


def _fnv64(ids: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a over the 8 little-endian bytes of int64 ids
    (uint64 out). Partition-stable and exactly expressible in SQL via
    HUGEINT mod-2^64 arithmetic (see the docs_split oracle) — the shared
    deterministic-hash primitive for splits and sampling."""
    ids = ids.astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        h = np.full(len(ids), 14695981039346656037, dtype=np.uint64)
        for k in range(8):
            byte = (ids >> np.uint64(8 * k)) & np.uint64(0xFF)
            h = (h ^ byte) * np.uint64(1099511628211)
    return h


def _cents(col) -> pa.Array:
    """Exact integer cents via floor(x·100 + 0.5) — written identically
    in the paired DuckDB SQL, so the grouped SUM is order-independent
    int64 math. Float sums otherwise accumulate in nondeterministic
    block order and flip last-bit value hashes (CORRECTNESS r01)."""
    return pc.cast(pc.floor(pc.add(pc.multiply(col, 100.0), 0.5)), pa.int64())


def _cents_to_dollars(batch: pa.Table, cents_col: str, out_col: str) -> pa.Table:
    """cents::DOUBLE / 100.0 — the one deterministic division back to
    dollars, mirrored in SQL."""
    d = pc.divide(pc.cast(batch.column(cents_col), pa.float64()), 100.0)
    return batch.drop_columns([cents_col]).append_column(out_col, d)


def lineitem_agg(sf_dir: str):
    """G1/G4 analog — grouped aggregates with a FULL map-side combine:
    6 output groups means per-block Arrow hash-aggregate partials plus
    one tiny driver merge beat an all-to-all groupby shuffle outright
    (the "pre-aggregate inside map_batches" scale pattern). l_quantity
    is whole-valued (exact double sums); l_extendedprice rides int64
    cents (_cents), so all sums are order-independent."""
    from .util import collect_arrow

    ds = _pq(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"], blocks=16)

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "sum_qty": batch.column("l_quantity"),
                "price_cents": _cents(batch.column("l_extendedprice")),
            }
        )
        return (
            t.group_by(["l_returnflag", "l_linestatus"])
            .aggregate([("sum_qty", "sum"), ("price_cents", "sum"), ([], "count_all")])
            .rename_columns(
                ["l_returnflag", "l_linestatus", "sum_qty", "price_cents", "n"]
            )
        )

    parts = collect_arrow(
        ds.map_batches(partial, batch_format="pyarrow"),
        schema=pa.schema(
            [
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("sum_qty", pa.float64()),
                ("price_cents", pa.int64()),
                ("n", pa.int64()),
            ]
        ),
    )
    merged = (
        parts.group_by(["l_returnflag", "l_linestatus"])
        .aggregate([("sum_qty", "sum"), ("price_cents", "sum"), ("n", "sum")])
        .rename_columns(["l_returnflag", "l_linestatus", "sum_qty", "price_cents", "n"])
    )
    return pa.table(
        {
            "l_returnflag": merged.column("l_returnflag"),
            "l_linestatus": merged.column("l_linestatus"),
            "sum_qty": merged.column("sum_qty"),
            "sum_base_price": pc.divide(
                pc.cast(merged.column("price_cents"), pa.float64()), 100.0
            ),
            "avg_qty": pc.divide(
                merged.column("sum_qty"), pc.cast(merged.column("n"), pa.float64())
            ),
            "count_order": merged.column("n"),
        }
    )


def orders_topk(sf_dir: str):
    """K1 analog — global top-100 by price (deterministic tie-break) via
    the distributed top-k pattern: each block emits its local top-100
    (sorted Arrow take), the driver merges 16×100 candidate rows — no
    global sort shuffle. (The full Dataset.sort K1 shape remains
    demonstrated by report.score_ranking.)"""
    from .util import collect_arrow

    K = 100
    ds = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"], blocks=16)

    def local_topk(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            batch,
            sort_keys=[("o_totalprice", "descending"), ("o_orderkey", "ascending")],
        )
        return batch.take(idx[:K])

    parts = collect_arrow(ds.map_batches(local_topk, batch_format="pyarrow"))
    idx = pc.sort_indices(
        parts, sort_keys=[("o_totalprice", "descending"), ("o_orderkey", "ascending")]
    )
    return parts.take(idx[:K])


def docs_dedup_exact(sf_dir: str):
    """Exact dedup keep-first (SURVEY §2.7 → hash-partition + per-group first)."""
    from .stages.dedup import exact_dedup

    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)
    return exact_dedup(ds, "text", "doc_id").select_columns(["doc_id", "text"])


def docs_dup_texts(sf_dir: str):
    """G2 analog — duplicate-key report (group-by having count>1) on the
    first-two-tokens prefix key (exact texts are unique in this corpus;
    the prefix key has real collisions at every sf)."""
    ds = _pq(sf_dir, "documents", ["text"])

    def key(batch: pa.Table) -> pa.Table:
        # whitespace-RUN splitting (Python .split() semantics) — a '  '
        # double space must not yield an empty token (ADVICE r01)
        trimmed = pc.utf8_trim_whitespace(batch.column("text"))
        first2 = pc.list_slice(pc.split_pattern_regex(trimmed, r"\s+"), 0, 2)
        return pa.table({"text_key": pc.utf8_lower(pc.binary_join(first2, " "))})

    grouped = _sorted_agg_by_key(
        ds.map_batches(key, batch_format="pyarrow"),
        "text_key",
        [(None, "count", "n")],
    )
    return grouped.filter(expr="n > 1")


def events_hourly(sf_dir: str):
    """Streaming-table windowed aggregate: tumbling 1h count+sum per user.

    Size-gated dense plan (BASELINE.md): the result is (user, hour)
    cells — the query's own output grain — so below the gate each
    block emits cell partials (block-local Arrow hash aggregate) and
    the driver folds them with one group_by instead of paying the
    all-to-all exchange; above the gate the distributed groupby runs
    unchanged."""
    from .util import collect_arrow

    ds = _pq(sf_dir, "events", ["user_id", "ts", "value"], blocks=16)

    def add_hour(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "hour": pc.cast(
                    pc.floor_temporal(batch.column("ts"), unit="hour"), pa.timestamp("us")
                ),
                "value_cents": _cents(batch.column("value")),
            }
        )

    mapped = ds.map_batches(add_hour, batch_format="pyarrow")

    if ds.count() <= _BCAST_KEYS_GATE:
        parts = collect_arrow(
            mapped.map_batches(
                lambda b: b.group_by(["user_id", "hour"])
                .aggregate([("value_cents", "sum"), ([], "count_all")])
                .rename_columns(["user_id", "hour", "value_cents", "n"]),
                batch_format="pyarrow",
            ),
            schema=pa.schema(
                [
                    ("user_id", pa.int64()),
                    ("hour", pa.timestamp("us")),
                    ("value_cents", pa.int64()),
                    ("n", pa.int64()),
                ]
            ),
        )
        cells = (
            parts.group_by(["user_id", "hour"])
            .aggregate([("value_cents", "sum"), ("n", "sum")])
            .rename_columns(["user_id", "hour", "value_cents", "n"])
        )
        cells = cells.set_column(
            cells.schema.get_field_index("hour"), "hour",
            pc.cast(cells.column("hour"), pa.timestamp("us")),
        )
        return _cents_to_dollars(cells, "value_cents", "sum_value")

    agg = _sorted_agg_by_key(
        mapped,
        ["user_id", "hour"],
        [(None, "count", "n"), ("value_cents", "sum", "value_cents")],
    )

    def finish(b: pa.Table) -> pa.Table:
        # the groupby narrows the hour key to timestamp[s]; restore the
        # oracle's µs unit so pandas dtypes agree bit-for-bit
        b = b.set_column(
            b.schema.get_field_index("hour"), "hour",
            pc.cast(b.column("hour"), pa.timestamp("us")),
        )
        return _cents_to_dollars(b, "value_cents", "sum_value")

    return agg.map_batches(finish, batch_format="pyarrow")


def events_sessionize(sf_dir: str):
    """Streaming-shaped session windows (gap-and-island, 30-min timeout):
    partition by key, sort by time within the group, cumulative gap count
    — the groupby(key).map_groups window pattern for stream tables.

    Arrow-native kernel with explicit output types (session_id int64,
    timestamps timestamp[us]) so the value hash matches the DuckDB
    oracle bit-for-bit — the round-1 pandas path emitted ns timestamps
    (CORRECTNESS r01 hash mismatch)."""
    GAP_US = 30 * 60 * 1_000_000

    ds = _pq(sf_dir, "events", ["user_id", "ts"], blocks=16)

    def _sessions(uid: np.ndarray, t: np.ndarray) -> pa.Table:
        """(uid, t) sorted by (user, ts) → finished session rows, fully
        vectorized across MANY users at once (sort-kernel form of the
        per-user map_groups — no per-user Python call)."""
        if uid.size == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "session_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "session_start": pa.array([], pa.timestamp("us")),
                    "session_end": pa.array([], pa.timestamp("us")),
                }
            )
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        new_sess = new_user | np.r_[True, (t[1:] - t[:-1]) > GAP_US]
        s_glob = np.cumsum(new_sess)
        ustarts = np.flatnonzero(new_user)
        base = np.repeat(
            s_glob[ustarts] - 1, np.diff(np.r_[ustarts, uid.size])
        )
        sid = (s_glob - base).astype(np.int64)
        starts = np.flatnonzero(new_sess)
        ends = np.r_[starts[1:] - 1, uid.size - 1]
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "session_id": pa.array(sid[starts]),
                "n_events": pa.array((ends - starts + 1).astype(np.int64)),
                "session_start": pa.array(t[starts]).cast(pa.timestamp("us")),
                "session_end": pa.array(t[ends]).cast(pa.timestamp("us")),
            }
        )

    pre = ds.map_batches(
        lambda b: pa.table(
            {
                "user_id": pc.cast(b.column("user_id"), pa.int64()),
                "ts_us": pc.cast(
                    pc.cast(b.column("ts"), pa.timestamp("us")), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def runs(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "kind": pa.array([], pa.int8()),
                "user_id": pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                "session_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "session_start": pa.array([], pa.int64()),
                "session_end": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        uid = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        t = b.column("ts_us").to_numpy(zero_copy_only=False).astype(np.int64)
        em = (uid == uid[0]) | (uid == uid[-1])
        done = _sessions(uid[~em], t[~em])
        e_u, e_t = uid[em], t[em]
        n_d = done.num_rows
        return pa.table(
            {
                "kind": pa.array(np.r_[np.zeros(e_u.size, np.int8), np.ones(n_d, np.int8)]),
                "user_id": pa.array(
                    np.r_[e_u, done.column("user_id").to_numpy()], pa.int64()
                ),
                "ts_us": pa.array(np.r_[e_t, np.zeros(n_d, np.int64)], pa.int64()),
                "session_id": pa.array(
                    np.r_[np.zeros(e_u.size, np.int64), done.column("session_id").to_numpy()],
                    pa.int64(),
                ),
                "n_events": pa.array(
                    np.r_[np.zeros(e_u.size, np.int64), done.column("n_events").to_numpy()],
                    pa.int64(),
                ),
                "session_start": pa.array(
                    np.r_[
                        np.zeros(e_u.size, np.int64),
                        pc.cast(done.column("session_start"), pa.int64()).to_numpy(),
                    ],
                    pa.int64(),
                ),
                "session_end": pa.array(
                    np.r_[
                        np.zeros(e_u.size, np.int64),
                        pc.cast(done.column("session_end"), pa.int64()).to_numpy(),
                    ],
                    pa.int64(),
                ),
            }
        )

    parts = (
        pre.sort(["user_id", "ts_us"])
        .map_batches(runs, batch_format="pyarrow")
        .materialize()
    )
    interior = parts.filter(expr="kind == 1").map_batches(
        lambda b: pa.table(
            {
                "user_id": b.column("user_id"),
                "session_id": b.column("session_id"),
                "n_events": b.column("n_events"),
                "session_start": pc.cast(
                    b.column("session_start"), pa.timestamp("us")
                ),
                "session_end": pc.cast(b.column("session_end"), pa.timestamp("us")),
            }
        ),
        batch_format="pyarrow",
    )
    from .util import collect_arrow

    edge = collect_arrow(parts.filter(expr="kind == 0"))
    if edge.num_rows == 0:
        return interior
    eu = edge.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    et = edge.column("ts_us").to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.lexsort((et, eu))
    folded = _sessions(eu[o], et[o])
    if folded.num_rows == 0:
        return interior
    return interior.union(rd.from_arrow(folded))


def events_funnel(sf_dir: str):
    """Forward-window funnel conversion (the A→B-within-t pattern
    match): per user, how many 'view' events are followed by a
    'purchase' by the same user within one hour (inclusive bounds).
    The sessionize shape — groupby(user).map_groups — with a
    vectorized two-pointer searchsorted instead of a per-event scan;
    only (user, ts, type) ride the shuffle."""
    H_US = 3_600 * 1_000_000

    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_type"], blocks=16)

    def kernel(b: pa.Table) -> pa.Table:
        keep = pc.is_in(
            b.column("event_type"), value_set=pa.array(["view", "purchase"])
        )
        t = b.filter(keep)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts": pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()),
                "event_type": t.column("event_type"),
            }
        )

    def _funnel_all(uid: np.ndarray, ts: np.ndarray, is_p: np.ndarray) -> pa.Table:
        """(uid, ts, is_purchase) for COMPLETE users → per-user
        (n_views, n_converted), vectorized across all users at once:
        merge-sort views before purchases at equal (user, ts), so the
        running purchase count AT each view row IS the global index of
        that view's first same-or-later purchase in the (user, ts)-
        ordered purchase array — one lexsort + one cumsum replace the
        per-user searchsorted (sort-kernel form of the map_groups)."""
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_views": pa.array([], pa.int64()),
                "n_converted": pa.array([], pa.int64()),
            }
        )
        if uid.size == 0:
            return empty
        order = np.lexsort((is_p, ts, uid))  # view (0) before purchase at tie
        u_s, t_s, p_s = uid[order], ts[order], is_p[order].astype(np.int64)
        cum_p = np.cumsum(p_s) - p_s  # purchases strictly before this row
        vmask = p_s == 0
        vu, vt, idx_g = u_s[vmask], t_s[vmask], cum_p[vmask]
        if vu.size == 0:  # purchase-only slice: no view rows → no output
            return empty
        pt_all = t_s[~vmask]
        pu_all = u_s[~vmask]
        ok = idx_g < len(pt_all)
        ok[ok] = (pu_all[idx_g[ok]] == vu[ok]) & (
            pt_all[idx_g[ok]] <= vt[ok] + H_US
        )
        # per-user fold over the (user-sorted) view rows
        starts = np.flatnonzero(np.r_[True, vu[1:] != vu[:-1]])
        n_views = np.diff(np.r_[starts, vu.size])
        n_conv = np.add.reduceat(ok.astype(np.int64), starts) if vu.size else ok
        return pa.table(
            {
                "user_id": pa.array(vu[starts], pa.int64()),
                "n_views": pa.array(n_views.astype(np.int64), pa.int64()),
                "n_converted": pa.array(n_conv, pa.int64()),
            }
        )

    from .util import collect_arrow

    pre = ds.map_batches(kernel, batch_format="pyarrow").map_batches(
        lambda b: pa.table(
            {
                "user_id": pc.cast(b.column("user_id"), pa.int64()),
                "ts": b.column("ts"),
                "is_p": pc.cast(
                    pc.equal(b.column("event_type"), "purchase"), pa.int8()
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def runs(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "kind": pa.array([], pa.int8()),
                "user_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.int64()),
                "is_p": pa.array([], pa.int8()),
                "n_views": pa.array([], pa.int64()),
                "n_converted": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        uid = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = b.column("ts").to_numpy(zero_copy_only=False).astype(np.int64)
        is_p = b.column("is_p").to_numpy(zero_copy_only=False).astype(np.int8)
        em = (uid == uid[0]) | (uid == uid[-1])
        done = _funnel_all(uid[~em], ts[~em], is_p[~em])
        n_e, n_d = int(em.sum()), done.num_rows
        return pa.table(
            {
                "kind": pa.array(np.r_[np.zeros(n_e, np.int8), np.ones(n_d, np.int8)]),
                "user_id": pa.array(
                    np.r_[uid[em], done.column("user_id").to_numpy()], pa.int64()
                ),
                "ts": pa.array(np.r_[ts[em], np.zeros(n_d, np.int64)], pa.int64()),
                "is_p": pa.array(
                    np.r_[is_p[em], np.zeros(n_d, np.int8)], pa.int8()
                ),
                "n_views": pa.array(
                    np.r_[np.zeros(n_e, np.int64), done.column("n_views").to_numpy()],
                    pa.int64(),
                ),
                "n_converted": pa.array(
                    np.r_[
                        np.zeros(n_e, np.int64), done.column("n_converted").to_numpy()
                    ],
                    pa.int64(),
                ),
            }
        )

    parts = (
        pre.sort(["user_id", "ts"])
        .map_batches(runs, batch_format="pyarrow")
        .materialize()
    )
    interior = parts.filter(expr="kind == 1").map_batches(
        lambda b: b.select(["user_id", "n_views", "n_converted"]),
        batch_format="pyarrow",
    )
    edge = collect_arrow(parts.filter(expr="kind == 0"))
    if edge.num_rows == 0:
        return interior
    folded = _funnel_all(
        edge.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64),
        edge.column("ts").to_numpy(zero_copy_only=False).astype(np.int64),
        edge.column("is_p").to_numpy(zero_copy_only=False).astype(np.int8),
    )
    if folded.num_rows == 0:
        return interior
    return interior.union(rd.from_arrow(folded))


def events_props_extract(sf_dir: str):
    """Semi-structured column extraction: pull the integer `k` key out of
    the JSON props column with a vectorized Arrow regex kernel (no
    per-row json.loads) and aggregate by it."""
    ds = _pq(sf_dir, "events", ["event_id", "props", "value"], blocks=16)

    def extract(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch.column("props"), r'"k"\s*:\s*(?P<k>-?\d+)')
        return pa.table(
            {
                "k": pc.cast(pc.struct_field(m, "k"), pa.int64()),
                "value_cents": _cents(batch.column("value")),
            }
        )

    agg = _sorted_agg_by_key(
        ds.map_batches(extract, batch_format="pyarrow"),
        "k",
        [(None, "count", "n"), ("value_cents", "sum", "value_cents")],
    )
    return agg.map_batches(
        lambda b: _cents_to_dollars(b, "value_cents", "sum_value"),
        batch_format="pyarrow",
    )


def events_hopping(sf_dir: str):
    """Hopping-window aggregate (1h window, 30min hop): every event is
    flat-mapped into its two covering windows, then a window-keyed
    groupby — the standard stream hopping-window shape."""
    HOP_US = 30 * 60 * 1_000_000

    ds = _pq(sf_dir, "events", ["ts", "value"], blocks=16)

    def expand(batch: pa.Table) -> pa.Table:
        b0 = pc.cast(
            pc.floor_temporal(batch.column("ts"), multiple=30, unit="minute"),
            pa.timestamp("us"),
        )
        b1 = pc.subtract(
            pc.cast(b0, pa.int64()), pa.scalar(HOP_US, pa.int64())
        ).cast(pa.timestamp("us"))
        cents = _cents(batch.column("value"))
        return pa.table(
            {
                "w_start": pa.concat_arrays(
                    [b0.combine_chunks(), b1.combine_chunks()]
                ),
                "value_cents": pa.concat_arrays(
                    [cents, cents] if isinstance(cents, pa.Array)
                    else [cents.combine_chunks(), cents.combine_chunks()]
                ),
            }
        )

    agg = (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby("w_start")
        .aggregate(Count(alias_name="n"), Sum("value_cents", alias_name="value_cents"))
    )

    def finish(b: pa.Table) -> pa.Table:
        b = b.set_column(
            b.schema.get_field_index("w_start"), "w_start",
            pc.cast(b.column("w_start"), pa.timestamp("us")),
        )
        return _cents_to_dollars(b, "value_cents", "sum_value")

    return agg.map_batches(finish, batch_format="pyarrow")


def events_top3_per_user(sf_dir: str):
    """Per-group top-k (grouped window-rank): each user's three highest-
    value events with a deterministic (value desc, event_id asc)
    tie-break. r5: ONE global (user, value DESC, event_id) sort + an
    across-user segment-rank kernel via util.sorted_group_apply — the
    per-user map_groups dispatch paid ~20 µs/user, the wrong scaling
    term at 10^9 users."""
    from .util import sorted_group_apply

    ds = _pq(sf_dir, "events", ["user_id", "event_id", "value"], blocks=16)

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "value": pa.array([], pa.float64()),
                    "rk": pa.array([], pa.int64()),
                }
            )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        runlens = np.diff(np.r_[starts, uid.size])
        rk = np.arange(uid.size, dtype=np.int64) - np.repeat(starts, runlens)
        keep = rk < 3
        out = t.filter(pa.array(keep))
        return pa.table(
            {
                "user_id": pc.cast(out.column("user_id"), pa.int64()),
                "event_id": pc.cast(out.column("event_id"), pa.int64()),
                "value": pc.cast(out.column("value"), pa.float64()),
                "rk": pa.array(rk[keep] + 1, pa.int64()),
            }
        )

    return sorted_group_apply(
        ds, "user_id", ["value", "event_id"], kernel, descending=[True, False]
    )


def docs_split(sf_dir: str):
    """Deterministic train/val/test assignment by hash(doc_id) bucket —
    the reproducible hash-split every training-data pipeline needs
    (stable across any parallelism/partitioning). The hash is FNV-1a
    over the 8 little-endian bytes of the int64 id: fully numpy-
    vectorized (8 xor-multiply passes, uint64 wraparound — the r2 md5
    Python loop is gone) and exactly expressible in the SQL oracle via
    HUGEINT mod-2^64 arithmetic."""
    ds = _pq(sf_dir, "documents", ["doc_id"], blocks=8)

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        b = (_fnv64(ids) % np.uint64(10)).astype(np.int64)
        split = pc.if_else(
            pc.less(pa.array(b), 8),
            pa.scalar("train"),
            pc.if_else(pc.equal(pa.array(b), 8), pa.scalar("val"), pa.scalar("test")),
        )
        return pa.table({"doc_id": batch.column("doc_id"), "split": split})

    return ds.map_batches(assign, batch_format="pyarrow")


_BCAST_KEYS_GATE = 4_000_000

# above this many vectors an all-vectors kNN stops collecting/
# broadcasting the O(N·d) query matrix and routes through the
# cell-partitioned IVF index (stages/similarity.knn_all_ivf) — at
# d=64 float64 the gate is ~2 GB of matrix, the practical ceiling for
# a per-task broadcast
_ALLKNN_IVF_GATE = 4_000_000

# above this many (term, n) partial rows a vocabulary-sized driver
# fold switches to the term-keyed distributed groupby (the
# docs_tfidf_top_terms join-fallback pattern, VERDICT r03 #2)
_VOCAB_FOLD_GATE = 4_000_000

# above this many candidate IMAGES a pair-verify stage stops shipping
# a driver-collected {id: bytes} lookup via ray.put and joins the pair
# table against the corpus instead — image payloads are ~KBs-to-MBs
# each, so the byte gate is far lower than the key gates above
_PIXEL_BCAST_GATE = 65_536


from .util import sorted_agg_by_key as _sorted_agg_by_key  # noqa: E402


def _sorted_sum_by_key(ds, key_col: str, val_col: str, alias: str, op: str = "sum"):
    """Single-aggregate convenience wrapper over ``_sorted_agg_by_key``."""
    return _sorted_agg_by_key(ds, key_col, [(val_col, op, alias)])


def _building_keys(sf_dir: str):
    """Sorted BUILDING-segment custkeys as ONE int64 array when the
    customer dimension is below the broadcast gate (~32 MB of keys),
    else None — callers fall back to the distributed hash join. The
    gate reads the parquet row count only (no scan)."""
    from .util import collect_arrow

    if _pq(sf_dir, "customer", ["c_custkey"]).count() > _BCAST_KEYS_GATE:
        return None
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: b.filter(pc.equal(b.column("c_mktsegment"), "BUILDING")).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    )
    t = collect_arrow(cust, schema=pa.schema([("c_custkey", pa.int64())]))
    return np.sort(t.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64))


def _sorted_member_mask(keys: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``vals`` in the sorted ``keys`` array —
    the probe side of a broadcast semi/anti join (binary search beats a
    dense bool table at these cardinalities; see BASELINE.md)."""
    if keys.size == 0:
        return np.zeros(len(vals), dtype=bool)
    pos = np.minimum(np.searchsorted(keys, vals), keys.size - 1)
    return keys[pos] == vals


def events_anti_join(sf_dir: str):
    """Anti-join (SURVEY §2.4): events from users outside the BUILDING
    customer segment (non-trivial at every sf). Size-gated broadcast
    plan: below the gate the filtered dimension ships once as a sorted
    key array (`ray.put`) and the anti-join is a per-block searchsorted
    membership filter — the fact side never shuffles. Above the gate
    the Dataset.join left_anti exchange runs unchanged."""
    ev = _pq(sf_dir, "events", ["event_id", "user_id"])
    keys = _building_keys(sf_dir)
    if keys is not None:
        keys_ref = ray.put(keys)

        def keep_outside(b: pa.Table) -> pa.Table:
            kk = ray.get(keys_ref)
            u = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
            return b.filter(pa.array(~_sorted_member_mask(kk, u)))

        return ev.map_batches(keep_outside, batch_format="pyarrow").select_columns(
            ["event_id", "user_id"]
        )
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: b.filter(pc.equal(b.column("c_mktsegment"), "BUILDING")).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    )
    return ev.join(
        cust, "left_anti", _join_partitions(), on=("user_id",), right_on=("c_custkey",)
    ).select_columns(["event_id", "user_id"])


def events_semi_join(sf_dir: str):
    """Semi-join (left_semi — the anti-join's complement): events from
    users INSIDE the BUILDING customer segment; completes the Dataset
    join-type family (inner / anti / semi / broadcast / as-of / range).
    Same size-gated broadcast plan as the anti-join (membership mask
    un-negated); Dataset.join left_semi above the gate."""
    ev = _pq(sf_dir, "events", ["event_id", "user_id"])
    keys = _building_keys(sf_dir)
    if keys is not None:
        keys_ref = ray.put(keys)

        def keep_inside(b: pa.Table) -> pa.Table:
            kk = ray.get(keys_ref)
            u = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
            return b.filter(pa.array(_sorted_member_mask(kk, u)))

        return ev.map_batches(keep_inside, batch_format="pyarrow").select_columns(
            ["event_id", "user_id"]
        )
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: b.filter(pc.equal(b.column("c_mktsegment"), "BUILDING")).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    )
    return ev.join(
        cust, "left_semi", _join_partitions(), on=("user_id",), right_on=("c_custkey",)
    ).select_columns(["event_id", "user_id"])


def revenue_by_part_type(sf_dir: str):
    """Large-side hash join (Dataset.join inner, SURVEY §2.4): lineitem ⋈
    part on partkey, revenue = extendedprice·(1−discount), grouped by
    p_type. The fact table streams; only the join keys + needed measures
    ride the exchange. Size-gated broadcast plan: below the gate the
    part dimension ships once as (sorted partkey array, type-code
    array) and the join becomes a per-block searchsorted lookup feeding
    ≤|types| integer partials — the fact side never shuffles; above the
    gate the hash-join exchange below runs unchanged."""
    from .util import collect_arrow

    if _pq(sf_dir, "part", ["p_partkey"]).count() <= _BCAST_KEYS_GATE:
        pt = collect_arrow(_pq(sf_dir, "part", ["p_partkey", "p_type"]))
        keys = pt.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        types = np.asarray(pt.column("p_type").to_numpy(zero_copy_only=False), dtype=object)
        order = np.argsort(keys, kind="stable")
        keys, types = keys[order], types[order]
        uniq = np.unique(types)
        codes = np.searchsorted(uniq, types).astype(np.int64)
        n_types = len(uniq)
        dim_ref = ray.put((keys, codes))

        def type_partial_bcast(batch: pa.Table) -> pa.Table:
            kk, cc = ray.get(dim_ref)
            rev = pc.multiply(
                batch.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
            )
            cents = _cents(rev).to_numpy(zero_copy_only=False)
            pk = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
            m = _sorted_member_mask(kk, pk)  # inner-join semantics
            code = cc[np.minimum(np.searchsorted(kk, pk[m]), kk.size - 1)]
            sums = np.zeros(n_types, dtype=np.int64)
            np.add.at(sums, code, cents[m])
            counts = np.bincount(code, minlength=n_types)
            present = counts > 0
            return pa.table(
                {
                    "code": pa.array(np.flatnonzero(present), pa.int64()),
                    "rev_cents": pa.array(sums[present], pa.int64()),
                    "n": pa.array(counts[present], pa.int64()),
                }
            )

        parts = collect_arrow(
            _pq(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"], blocks=16)
            .map_batches(type_partial_bcast, batch_format="pyarrow"),
            schema=pa.schema(
                [("code", pa.int64()), ("rev_cents", pa.int64()), ("n", pa.int64())]
            ),
        )
        merged = (
            parts.group_by("code")
            .aggregate([("rev_cents", "sum"), ("n", "sum")])
            .rename_columns(["code", "rev_cents", "n"])
        )
        return pa.table(
            {
                "p_type": pa.array(
                    uniq[merged.column("code").to_numpy()].tolist(), pa.string()
                ),
                "revenue": pc.divide(
                    pc.cast(merged.column("rev_cents"), pa.float64()), 100.0
                ),
                "n_items": merged.column("n"),
            }
        )

    li = _pq(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"], blocks=16)

    def rev_partial(batch: pa.Table) -> pa.Table:
        # pre-aggregate by the JOIN KEY inside the block (~30× row
        # compression here) so the join exchange ships partials, not
        # the raw fact table — the pre-aggregate-before-shuffle pattern
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        t = pa.table({"l_partkey": batch.column("l_partkey"), "rev_cents": _cents(rev)})
        return (
            t.group_by("l_partkey")
            .aggregate([("rev_cents", "sum"), ([], "count_all")])
            .rename_columns(["l_partkey", "rev_cents", "n"])
        )

    li = li.map_batches(rev_partial, batch_format="pyarrow")
    part = _pq(sf_dir, "part", ["p_partkey", "p_type"])
    joined = li.join(
        part, "inner", _join_partitions(), on=("l_partkey",), right_on=("p_partkey",)
    )

    # p_type has ~6 values: finish with per-block partials + tiny merge
    def type_partial(batch: pa.Table) -> pa.Table:
        return (
            batch.select(["p_type", "rev_cents", "n"])
            .group_by("p_type")
            .aggregate([("rev_cents", "sum"), ("n", "sum")])
            .rename_columns(["p_type", "rev_cents", "n"])
        )

    from .util import collect_arrow

    parts = collect_arrow(
        joined.map_batches(type_partial, batch_format="pyarrow"),
        schema=pa.schema(
            [("p_type", pa.string()), ("rev_cents", pa.int64()), ("n", pa.int64())]
        ),
    )
    merged = (
        parts.group_by("p_type")
        .aggregate([("rev_cents", "sum"), ("n", "sum")])
        .rename_columns(["p_type", "rev_cents", "n"])
    )
    return pa.table(
        {
            "p_type": merged.column("p_type"),
            "revenue": pc.divide(pc.cast(merged.column("rev_cents"), pa.float64()), 100.0),
            "n_items": merged.column("n"),
        }
    )


def top_suppliers(sf_dir: str):
    """Join + grouped aggregate + deterministic top-k: the ten suppliers
    with the highest lineitem revenue."""
    from .util import collect_arrow

    li = _pq(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"], blocks=16)

    def rev_partial(batch: pa.Table) -> pa.Table:
        # ~600× compression by the join key before the exchange
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        t = pa.table({"l_suppkey": batch.column("l_suppkey"), "rev_cents": _cents(rev)})
        return (
            t.group_by("l_suppkey").aggregate([("rev_cents", "sum")])
            .rename_columns(["l_suppkey", "rev_cents"])
        )

    # supplier is a classic tiny dimension (100–1000 rows): broadcast it
    # (ray.put once, probe per batch) instead of an all-to-all shuffle
    # join — the small-side-broadcast pattern
    sup = {
        r["s_suppkey"]: r["s_name"]
        for r in _pq(sf_dir, "supplier", ["s_suppkey", "s_name"]).take_all()
    }
    sup_ref = ray.put(sup)

    def name_partial(batch: pa.Table) -> pa.Table:
        lut = ray.get(sup_ref)
        names = pa.array(
            [lut.get(k) for k in batch.column("l_suppkey").to_pylist()], pa.string()
        )
        t = pa.table({"s_name": names, "rev_cents": batch.column("rev_cents")})
        t = t.filter(pc.is_valid(t.column("s_name")))
        return (
            t.group_by("s_name").aggregate([("rev_cents", "sum")])
            .rename_columns(["s_name", "rev_cents"])
        )

    parts = collect_arrow(
        li.map_batches(rev_partial, batch_format="pyarrow").map_batches(
            name_partial, batch_format="pyarrow"
        ),
        schema=pa.schema([("s_name", pa.string()), ("rev_cents", pa.int64())]),
    )
    merged = (
        parts.group_by("s_name").aggregate([("rev_cents", "sum")])
        .rename_columns(["s_name", "rev_cents"])
    )
    out = pa.table(
        {
            "s_name": merged.column("s_name"),
            "revenue": pc.divide(pc.cast(merged.column("rev_cents"), pa.float64()), 100.0),
        }
    )
    order = pc.sort_indices(
        out, sort_keys=[("revenue", "descending"), ("s_name", "ascending")]
    )
    return out.take(order[:10])


def customer_per_region(sf_dir: str):
    """Broadcast join of small dimension tables (ray.put once, probe per
    batch) + grouped count — the broadcast-small-side join pattern."""
    nation = {
        r["n_nationkey"]: r["n_regionkey"]
        for r in _pq(sf_dir, "nation").take_all()
    }
    region = {r["r_regionkey"]: r["r_name"] for r in _pq(sf_dir, "region").take_all()}
    lookup_ref = ray.put({k: region[v] for k, v in nation.items()})

    def add_region(batch: pa.Table) -> pa.Table:
        lut = ray.get(lookup_ref)
        names = [lut.get(k) for k in batch.column("c_nationkey").to_pylist()]
        return pa.table({"region": pa.array(names, pa.string())})

    return (
        _pq(sf_dir, "customer", ["c_nationkey"])
        .map_batches(add_region, batch_format="pyarrow")
        .groupby("region")
        .aggregate(Count(alias_name="customers"))
    )


def docs_token_stats(sf_dir: str):
    """Vectorized text metrics aligned with SQL string functions."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)

    def stats(batch: pa.Table) -> pa.Table:
        txt = batch.column("text")
        trimmed = pc.utf8_trim_whitespace(txt)
        n_tokens = pc.if_else(
            pc.equal(trimmed, ""),
            pa.scalar(0, pa.int64()),
            pc.cast(pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+")), pa.int64()),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": n_tokens,
                # BPE-ish sub-word segmentation count (letter runs /
                # digit runs / punctuation runs), vectorized
                "n_tokens_bpe": pc.cast(
                    pc.count_substring_regex(txt, r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"),
                    pa.int64(),
                ),
                "n_chars_calc": pc.cast(pc.utf8_length(txt), pa.int64()),
                "n_periods": pc.cast(pc.count_substring(txt, "."), pa.int64()),
                "n_digits": pc.cast(
                    pc.utf8_length(pc.replace_substring_regex(txt, "[^0-9]", "")),
                    pa.int64(),
                ),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def lineitem_conditional(sf_dir: str):
    """G3 analog — sum-of-indicator conditional counts, partials per
    batch then one tiny reduce."""
    ds = _pq(sf_dir, "lineitem", ["l_returnflag", "l_discount", "l_quantity"], blocks=16)

    def indicators(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_rows": pa.array([batch.num_rows], pa.int64()),
                "n_returned": pa.array(
                    [pc.sum(pc.cast(pc.equal(batch.column("l_returnflag"), "R"), pa.int64())).as_py() or 0],
                    pa.int64(),
                ),
                "n_discounted": pa.array(
                    [pc.sum(pc.cast(pc.greater(batch.column("l_discount"), 0.05), pa.int64())).as_py() or 0],
                    pa.int64(),
                ),
                "n_heavy": pa.array(
                    [pc.sum(pc.cast(pc.greater(batch.column("l_quantity"), 45.0), pa.int64())).as_py() or 0],
                    pa.int64(),
                ),
            }
        )

    parts = ds.map_batches(indicators, batch_format="pyarrow").to_pandas()
    out = parts.sum().to_frame().T.astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def embeddings_knn(sf_dir: str):
    """ANN baseline: exact cosine top-5 for the first 5 vectors
    (streamed matmul partials, broadcast query matrix)."""
    from .stages.similarity import knn_brute

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    # expression filter (vectorized predicate pushdown), not a row lambda
    qrows = sorted(
        ds.filter(expr="vec_id < 5").take_all(), key=lambda r: r["vec_id"]
    )
    queries = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    out = knn_brute(ds, "embedding", "vec_id", queries, k=5)
    return pa.table(
        {
            "query_id": out.column("query_idx"),
            "neighbor_id": out.column("neighbor_id"),
            "neighbor_rank": out.column("rank"),
        }
    )


def embeddings_knn_classify(sf_dir: str, n_queries: int = 50, k: int = 5):
    """kNN majority-vote labeling — the semi-supervised labeler a
    training pipeline runs to propagate labels onto unlabeled items:
    each query vector takes the modal label of its k nearest
    (cosine) neighbors, SELF EXCLUDED (leave-one-out), ties broken by
    the smaller label. The distributed part is the exact streamed
    top-(k+1) scan (knn_brute: broadcast query matrix, block-local
    top-k partials); self-removal, the label lookup (candidate-sized
    is_in filter) and the vote happen on the output-sized result. The
    oracle mirrors the vote with a count-desc/label-asc window."""
    from .stages.similarity import knn_brute
    from .util import collect_arrow

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    qrows = sorted(
        ds.filter(expr=f"vec_id < {n_queries}").take_all(), key=lambda r: r["vec_id"]
    )
    queries = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    # k+1: the query's own row rides along at (or near) rank 1
    out = knn_brute(ds, "embedding", "vec_id", queries, k=k + 1)

    qi = out.column("query_idx").to_numpy(zero_copy_only=False)
    nid = out.column("neighbor_id").to_numpy(zero_copy_only=False)
    rnk = out.column("rank").to_numpy(zero_copy_only=False)
    qid = np.array([r["vec_id"] for r in qrows], dtype=np.int64)[qi]
    keep = nid != qid  # leave-one-out; relative order is preserved
    qid, nid, rnk = qid[keep], nid[keep], rnk[keep]

    # label lookup for the candidate set only (≤ n_queries·(k+1) ids)
    cand = pa.array(np.unique(nid))
    lbl_t = collect_arrow(
        ds.map_batches(
            lambda b: pa.table(
                {"vec_id": b.column("vec_id"), "label": b.column("label")}
            ).filter(pc.is_in(b.column("vec_id"), value_set=cand)),
            batch_format="pyarrow",
        ),
        schema=pa.schema([("vec_id", pa.int64()), ("label", pa.int32())]),
    )
    label_of = dict(
        zip(
            lbl_t.column("vec_id").to_pylist(),
            lbl_t.column("label").to_pylist(),
        )
    )

    out_q, out_l = [], []
    for u in np.unique(qid):
        m = qid == u
        top = np.argsort(rnk[m], kind="stable")[:k]
        votes: dict[int, int] = {}
        for v in nid[m][top]:
            lv = int(label_of[int(v)])
            votes[lv] = votes.get(lv, 0) + 1
        best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        out_q.append(int(u))
        out_l.append(best)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "label": pa.array(out_l, pa.int64()),
        }
    )


def embeddings_knn_pq(sf_dir: str):
    """ANN via product quantization + exact re-rank: per-subspace
    codebooks trained on a bounded sample, corpus encoded to 16-byte
    codes in one streamed pass (16× memory — the compressed 10⁹-vector
    corpus fits node RAM), LUT-gather scan for a 10·k shortlist, then
    one exact cosine pass restricted to the candidates. Rows-only: the
    quantization is not SQL-expressible; shortlist recall (measured
    1.0 here) vs exact knn_brute is asserted in
    tests/test_dedup_similarity.py."""
    from .stages.similarity import knn_pq_rerank

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrows = sorted(
        ds.filter(expr="vec_id < 5").take_all(), key=lambda r: r["vec_id"]
    )
    queries = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    out = knn_pq_rerank(ds, "embedding", "vec_id", queries, k=5, m=16, ksub=256)
    return pa.table(
        {
            "query_id": out.column("query_idx"),
            "neighbor_id": out.column("neighbor_id"),
            "neighbor_rank": out.column("rank"),
        }
    )


def revenue_by_nation(sf_dir: str):
    """TPC-H Q5-shaped FIVE-table join — the canonical multi-join plan:
    customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation ⋈ region with the
    same-nation predicate, region filter and a one-year date slice.
    Distributed plan: the tiny region⋈nation dimension resolves
    driver-side into a nation-id set + name map (25 rows, broadcast by
    closure); customer and supplier prune to those nations INSIDE their
    scans; orders prunes the date slice at its scan; one hash join
    chains orders⋈customer (both fact-sized at scale), lineitem joins
    that on orderkey, and a map-side partial sum by (suppkey,
    c_nationkey) compresses the exchange to ≤ |supp|×|nations| rows
    before the supplier join; the same-nation filter and a tiny final
    groupby finish. Exact int64 cents per row, mirrored in SQL."""
    from .util import collect_arrow, drop_empty_blocks

    nparts = _join_partitions()
    nat = collect_arrow(_pq(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]))
    reg = collect_arrow(_pq(sf_dir, "region", ["r_regionkey", "r_name"]))
    asia = {
        rk.as_py()
        for rk, rn in zip(reg.column("r_regionkey"), reg.column("r_name"))
        if rn.as_py() == "ASIA"
    }
    nat_ids = [
        nk.as_py()
        for nk, nr in zip(nat.column("n_nationkey"), nat.column("n_regionkey"))
        if nr.as_py() in asia
    ]
    nat_names = dict(
        zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    )
    nat_set = pa.array(nat_ids, pa.int64())

    # Size-gated broadcast plan: supplier and customer resolve to
    # (sorted key → nation) arrays, the date-sliced orders resolve to a
    # (sorted orderkey → cust-nation) array (slice-sized), and the whole
    # five-table join collapses to ONE streaming lineitem pass with two
    # searchsorted lookups per block feeding ≤|nations| integer
    # partials — zero exchanges. Above the gate the three-exchange
    # hash-join plan below runs unchanged (orders no longer fits one
    # broadcast array).
    if _pq(sf_dir, "orders", ["o_orderkey"]).count() <= 2 * _BCAST_KEYS_GATE:
        sup_t = collect_arrow(
            _pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
                lambda b: b.filter(
                    pc.is_in(b.column("s_nationkey"), value_set=nat_set)
                ),
                batch_format="pyarrow",
            ),
            schema=pa.schema(
                [("s_suppkey", pa.int64()), ("s_nationkey", pa.int64())]
            ),
        )
        sk = sup_t.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        snat = sup_t.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        so = np.argsort(sk, kind="stable")
        sk, snat = sk[so], snat[so]

        cust_t = collect_arrow(
            _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
                lambda b: b.filter(
                    pc.is_in(b.column("c_nationkey"), value_set=nat_set)
                ),
                batch_format="pyarrow",
            ),
            schema=pa.schema(
                [("c_custkey", pa.int64()), ("c_nationkey", pa.int64())]
            ),
        )
        ck = cust_t.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        cnat = cust_t.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        co = np.argsort(ck, kind="stable")
        ck, cnat = ck[co], cnat[co]

        lo_ = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
        hi_ = pa.scalar(np.datetime64("1997-01-01", "us"), pa.timestamp("us"))

        def ord_slice(b: pa.Table) -> pa.Table:
            d = pc.cast(b.column("o_orderdate"), pa.timestamp("us"))
            keep = pc.and_(pc.greater_equal(d, lo_), pc.less(d, hi_))
            t = b.filter(keep)
            return pa.table(
                {"o_orderkey": t.column("o_orderkey"), "o_custkey": t.column("o_custkey")}
            )

        ord_t = collect_arrow(
            _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"], blocks=8)
            .map_batches(ord_slice, batch_format="pyarrow"),
            schema=pa.schema(
                [("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]
            ),
        )
        okeys = ord_t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ocust = ord_t.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        cm = _sorted_member_mask(ck, ocust)
        okeys = okeys[cm]
        onat = cnat[np.minimum(np.searchsorted(ck, ocust[cm]), max(ck.size - 1, 0))]
        oo = np.argsort(okeys, kind="stable")
        okeys, onat = okeys[oo], onat[oo]
        max_nat = int(max(nat_ids)) + 1 if nat_ids else 1
        dim_ref = ray.put((sk, snat, okeys, onat))

        def li_pass(b: pa.Table) -> pa.Table:
            kk_s, nn_s, kk_o, nn_o = ray.get(dim_ref)
            rev = pc.multiply(
                b.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), b.column("l_discount")),
            )
            cents = _cents(rev).to_numpy(zero_copy_only=False)
            lsk = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
            lok = b.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
            m = _sorted_member_mask(kk_s, lsk) & _sorted_member_mask(kk_o, lok)
            s_nat = nn_s[np.minimum(np.searchsorted(kk_s, lsk[m]), max(kk_s.size - 1, 0))]
            o_nat = nn_o[np.minimum(np.searchsorted(kk_o, lok[m]), max(kk_o.size - 1, 0))]
            same = s_nat == o_nat
            sums = np.zeros(max_nat, dtype=np.int64)
            np.add.at(sums, s_nat[same], cents[m][same])
            present = np.flatnonzero(np.bincount(s_nat[same], minlength=max_nat) > 0)
            return pa.table(
                {
                    "c_nationkey": pa.array(present, pa.int64()),
                    "rev_cents": pa.array(sums[present], pa.int64()),
                }
            )

        parts = collect_arrow(
            _pq(
                sf_dir,
                "lineitem",
                ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
                blocks=16,
            ).map_batches(li_pass, batch_format="pyarrow"),
            schema=pa.schema([("c_nationkey", pa.int64()), ("rev_cents", pa.int64())]),
        )
        final = (
            parts.group_by("c_nationkey")
            .aggregate([("rev_cents", "sum")])
            .rename_columns(["c_nationkey", "rev_cents"])
        )
        names = pa.array(
            [nat_names[k] for k in final.column("c_nationkey").to_pylist()], pa.string()
        )
        out = pa.table(
            {
                "n_name": names,
                "rev_cents": final.column("rev_cents"),
                "revenue": pc.divide(
                    pc.cast(final.column("rev_cents"), pa.float64()), 100.0
                ),
            }
        )
        return out.take(pc.sort_indices(out, sort_keys=[("n_name", "ascending")]))

    def cust_scan(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b.column("c_nationkey"), value_set=nat_set)
        t = b.filter(keep)
        return pa.table(
            {"_ck": t.column("c_custkey"), "c_nationkey": t.column("c_nationkey")}
        )

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"], blocks=4).map_batches(
        cust_scan, batch_format="pyarrow"
    )

    lo = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"), pa.timestamp("us"))

    def ord_scan(b: pa.Table) -> pa.Table:
        d = pc.cast(b.column("o_orderdate"), pa.timestamp("us"))
        keep = pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))
        t = b.filter(keep)
        return pa.table({"o_orderkey": t.column("o_orderkey"), "_ck2": t.column("o_custkey")})

    ords = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"], blocks=8).map_batches(
        ord_scan, batch_format="pyarrow"
    )
    j1 = ords.join(cust, "inner", nparts, on=("_ck2",), right_on=("_ck",))

    def li_scan(b: pa.Table) -> pa.Table:
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
        t = pa.table(
            {
                "_ok": b.column("l_orderkey"),
                "l_suppkey": b.column("l_suppkey"),
                "rev_cents": _cents(rev),
            }
        )
        # pre-aggregate by the join key pair inside the block
        return (
            t.group_by(["_ok", "l_suppkey"])
            .aggregate([("rev_cents", "sum")])
            .rename_columns(["_ok", "l_suppkey", "rev_cents"])
        )

    li = _pq(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        blocks=16,
    ).map_batches(li_scan, batch_format="pyarrow")
    j2 = li.join(j1, "inner", nparts, on=("_ok",), right_on=("o_orderkey",))

    def combine(b: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "l_suppkey": b.column("l_suppkey"),
                    "c_nationkey": b.column("c_nationkey"),
                    "rev_cents": b.column("rev_cents"),
                }
            )
            .group_by(["l_suppkey", "c_nationkey"])
            .aggregate([("rev_cents", "sum")])
            .rename_columns(["l_suppkey", "c_nationkey", "rev_cents"])
        )

    # (suppkey, nation) is a supplier-proportional key set — fold it on
    # the sort-kernel, not Ray's per-group-Python aggregate (r5)
    agg = drop_empty_blocks(
        _sorted_agg_by_key(
            j2.map_batches(combine, batch_format="pyarrow"),
            ["l_suppkey", "c_nationkey"],
            [("rev_cents", "sum", "rev_cents")],
        )
    )

    def supp_scan(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b.column("s_nationkey"), value_set=nat_set)
        t = b.filter(keep)
        return pa.table(
            {"_sk": t.column("s_suppkey"), "s_nationkey": t.column("s_nationkey")}
        )

    # a small-file read split into blocks can leave an EMPTY read block
    # whose zero-column form aborts Dataset.join (util docstring) —
    # strip it like any groupby-derived input
    supp = drop_empty_blocks(
        _pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"], blocks=2).map_batches(
            supp_scan, batch_format="pyarrow"
        )
    )
    j3 = agg.join(supp, "inner", nparts, on=("l_suppkey",), right_on=("_sk",))
    final = collect_arrow(
        drop_empty_blocks(
            j3.map_batches(
                lambda b: b.filter(
                    pc.equal(b.column("c_nationkey"), b.column("s_nationkey"))
                ).select(["c_nationkey", "rev_cents"]),
                batch_format="pyarrow",
            )
            .groupby("c_nationkey")
            .aggregate(Sum("rev_cents", alias_name="rev_cents"))
        )
    )
    names = pa.array(
        [nat_names[k] for k in final.column("c_nationkey").to_pylist()], pa.string()
    )
    out = pa.table(
        {
            "n_name": names,
            "rev_cents": final.column("rev_cents"),
            "revenue": pc.divide(
                pc.cast(final.column("rev_cents"), pa.float64()), 100.0
            ),
        }
    )
    return out.take(pc.sort_indices(out, sort_keys=[("n_name", "ascending")]))


def embeddings_label_centroids(sf_dir: str):
    """Grouped VECTOR aggregate: the mean embedding per label — the
    k-means M-step / class-prototype primitive, and the one operator
    class where the aggregated value is a list column. Per-block
    partials carry (label, Σvec float64[d], n, min vec_id); the driver
    folds the handful of label partials in (label, min_vec_id) order so
    the float reduction order — hence the last ulp — is a pure function
    of the block layout, not of task completion order. Rows-only:
    float vector sums are not hash-stable against a SQL engine's own
    reduction order; a numpy reference test pins values to 1e-12."""
    from .stages.similarity import _vec_matrix
    from .util import collect_arrow

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding", "label"], blocks=8)

    def partial(b: pa.Table) -> pa.Table:
        vecs = _vec_matrix(b.column("embedding"))
        labels = b.column("label").to_numpy(zero_copy_only=False)
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        out_l, out_n, out_m, out_s = [], [], [], []
        for lab in np.unique(labels):
            sel = labels == lab
            out_l.append(int(lab))
            out_n.append(int(sel.sum()))
            out_m.append(int(ids[sel].min()))
            out_s.append(vecs[sel].sum(axis=0).tolist())
        return pa.table(
            {
                "label": pa.array(out_l, pa.int32()),
                "n": pa.array(out_n, pa.int64()),
                "min_id": pa.array(out_m, pa.int64()),
                "vsum": pa.array(out_s, pa.list_(pa.float64())),
            }
        )

    parts = collect_arrow(ds.map_batches(partial, batch_format="pyarrow"))
    labs = parts.column("label").to_pylist()
    ns = parts.column("n").to_pylist()
    mins = parts.column("min_id").to_pylist()
    sums = parts.column("vsum").to_pylist()
    folded: dict[int, list] = {}
    for _, lab, n, s in sorted(zip(mins, labs, ns, sums)):
        if lab not in folded:
            folded[lab] = [0, None]
        folded[lab][0] += n
        acc = folded[lab][1]
        folded[lab][1] = (
            np.asarray(s) if acc is None else acc + np.asarray(s)
        )
    out_lab = sorted(folded)
    return pa.table(
        {
            "label": pa.array(out_lab, pa.int32()),
            "n": pa.array([folded[k][0] for k in out_lab], pa.int64()),
            "centroid": pa.array(
                [(folded[k][1] / folded[k][0]).tolist() for k in out_lab],
                pa.list_(pa.float64()),
            ),
        }
    )


def docs_ngram_jaccard(sf_dir: str):
    """Exact token-set Jaccard similarity self-join (prefix-filtered
    PPJoin-style; SQL oracle is the brute-force cross join)."""
    from .stages.dedup import token_jaccard_pipeline

    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)
    # the templated synthetic docs put ~75% of a scale factor's docs
    # behind one shared rarest-prefix token; the pipeline splits such
    # degenerate buckets by the second shared prefix token (exactness
    # preserved — _prefix_block_keys), so the cap stays at its sane
    # default instead of the r2-era 100k escape hatch
    return token_jaccard_pipeline(ds, "text", "doc_id", threshold=0.9)


def embeddings_cosine_dups(sf_dir: str):
    """Embedding near-dup pairs (LSH-bucketed exact cosine ≥ 0.95).

    SQL oracle uses a brute-force cross join — equality holds as long as
    LSH recall is total at this threshold/size; validated in tests."""
    from .stages.dedup import embedding_cosine_pairs

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = embedding_cosine_pairs(ds, "embedding", "vec_id", threshold=0.95, num_planes=4)
    return out.select(["id_a", "id_b"])


# ---------------------------------------------------------------------------
# rows-only operators (not SQL-expressible; driver records weaker check)
# ---------------------------------------------------------------------------


def docs_langid(sf_dir: str):
    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)

    def lang(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(
                    [detect_language(t) for t in batch.column("text").to_pylist()],
                    pa.string(),
                ),
            }
        )

    return ds.map_batches(lang, batch_format="pyarrow")


def corpus_curate(sf_dir: str):
    """End-to-end IMAGE curation pipeline (the multimodal analogue of
    docs_curate, composing this repo's image stages into the sequence
    a LAION-style corpus build runs):

    1. near-dup clustering — phash Hamming banding + exact verify
       (corpus_phash_dups machinery), clusters closed by union-find at
       output size; each cluster keeps its highest-resolution member
       (pixels desc, image_id asc — the keep-best convention);
    2. quality gate — drop too-dark / blurry survivors
       (ExposureBlurStats decode actor pool, exact integer flags);
    3. batch shaping — surviving rows labeled with their integer
       aspect bucket (w·100 // h) for canvas grouping.

    Output: (image_id, caption, w, h, aspect_bucket) of the curated
    set. Rows-only (pixel decode + iterative closure); the composition
    invariants — survivors unique, no near-dup pair fully survives,
    no flagged image survives — are pinned in tests."""
    from .stages.dedup import phash_pairs
    from .util import collect_arrow

    meta = collect_arrow(
        corpus_parquet(columns=["image_id", "caption", "w", "h"])
    )
    ids = np.asarray(meta.column("image_id").to_pylist(), dtype=object)
    w = pc.cast(meta.column("w"), pa.int64()).to_numpy(zero_copy_only=False)
    h = pc.cast(meta.column("h"), pa.int64()).to_numpy(zero_copy_only=False)
    px = w * h
    order = np.argsort(ids.astype(str), kind="stable")
    ids_s = ids.astype(str)[order]
    px_s, w_s, h_s = px[order], w[order], h[order]
    caps = np.asarray(meta.column("caption").to_pylist(), dtype=object)[order]

    pairs = phash_pairs(
        corpus_parquet(columns=["image_id", "phash"]), hamming_threshold=4
    )
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(
        pairs.column("id_a").to_pylist(), pairs.column("id_b").to_pylist()
    ):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    clustered = sorted({x for p in parent.items() for x in p} |
                       set(parent.keys()) | set(parent.values()))
    best: dict = {}
    for x in clustered:
        i = int(np.searchsorted(ids_s, x))
        rep = find(x)
        cur = best.get(rep)
        cand = (-int(px_s[i]), x)
        if cur is None or cand < cur:
            best[rep] = cand
    keep_clustered = {v[1] for v in best.values()}
    drop = set(clustered) - keep_clustered

    flags = corpus_quality_flags(sf_dir).to_pandas().set_index("image_id")
    bad = set(flags.index[(flags["too_dark"] == 1) | (flags["blurry"] == 1)])

    keep_mask = np.array(
        [(x not in drop) and (x not in bad) for x in ids_s], dtype=bool
    )
    bucket = (w_s * 100) // np.maximum(h_s, 1)
    return pa.table(
        {
            "image_id": pa.array(ids_s[keep_mask].tolist(), pa.string()),
            "caption": pa.array(caps[keep_mask].tolist(), pa.string()),
            "w": pa.array(w_s[keep_mask]),
            "h": pa.array(h_s[keep_mask]),
            "aspect_bucket": pa.array(bucket[keep_mask]),
        }
    )


def lineitem_benford(sf_dir: str):
    """Benford's-law first-digit census over extended prices — the
    data-quality / fraud screen an ingest pipeline runs on numeric
    columns (organic magnitudes follow log10(1+1/d); fabricated or
    truncated feeds don't). First digit extracted EXACTLY: cents as
    int64 → Arrow cast to string → first byte (both engines do the
    same substring, no float log in the digit path); per-block 9-bin
    count partials fold driver-side. The observed share and Benford
    expectation are the only float columns, computed in mirrored op
    order (math.log10 = DuckDB log10, same libm)."""
    import math

    from .util import collect_arrow, drop_empty_blocks

    ds = _pq(sf_dir, "lineitem", ["l_extendedprice"], blocks=8)

    def digit_partial(b: pa.Table) -> pa.Table:
        cents = _cents(b.column("l_extendedprice"))
        first = pc.utf8_slice_codeunits(pc.cast(cents, pa.string()), 0, 1)
        t = pa.table({"digit": pc.cast(first, pa.int64())})
        return t.group_by("digit").aggregate([([], "count_all")]).rename_columns(
            ["digit", "n"]
        )

    parts = (
        collect_arrow(
            drop_empty_blocks(ds.map_batches(digit_partial, batch_format="pyarrow")),
            schema=pa.schema([("digit", pa.int64()), ("n", pa.int64())]),
        )
        .group_by("digit")
        .aggregate([("n", "sum")])
        .rename_columns(["digit", "n"])
    )
    dg = parts.column("digit").to_numpy(zero_copy_only=False).astype(np.int64)
    nn = parts.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    full = np.zeros(9, dtype=np.int64)
    full[dg - 1] = nn
    total = int(full.sum())
    digits = np.arange(1, 10, dtype=np.int64)
    share = np.array([float(c) / float(total) for c in full], dtype=np.float64)
    expected = np.array(
        [math.log10(1.0 + 1.0 / float(d)) for d in digits], dtype=np.float64
    )
    return pa.table(
        {
            "digit": pa.array(digits),
            "n": pa.array(full),
            "share": pa.array(share),
            "benford_expected": pa.array(expected),
        }
    )


def corpus_equalize(sf_dir: str):
    """Global histogram equalization APPLY over the image corpus — the
    two-stage broadcast shape: pass 1 derives the corpus-wide integer
    equalization LUT (corpus_luma_histogram's exact cdf math), the
    256-entry table broadcasts once via ``ray.put``, and pass 2's
    decode actor pool maps every channel through it (one uint8 gather
    per image) and re-encodes losslessly
    (stages/multimodal.EqualizeImages). Rows-only (pixel transform);
    the decode-back test pins output pixels to LUT[source] bit-exactly
    and checks the LUT's monotonicity."""
    from .stages.multimodal import EqualizeImages

    hist = corpus_luma_histogram(sf_dir)
    lut = hist.column("lut").to_numpy(zero_copy_only=False)
    lut_ref = ray.put(lut)
    ds = corpus_parquet(columns=["image_id", "bytes", "fmt"])
    return ds.map_batches(
        EqualizeImages,
        batch_format="pyarrow",
        batch_size=32,
        concurrency=2,
        fn_constructor_kwargs={"lut_ref": lut_ref},
    ).select_columns(["image_id", "w", "h", "mean_before", "mean_after"])


def basket_transitivity(sf_dir: str):
    """Global clustering coefficient (transitivity) of the basket
    co-occurrence graph — 3·triangles / wedges, the one-number
    graph-health metric next to the raw triangle count: how often two
    parts sharing a neighbor co-occur themselves. Triangles reuse the
    exact closed-wedge machinery of lineitem_basket_triangles; wedges
    are Σ d·(d−1)/2 over exact int64 degrees from one block-partial
    degree fold on the SAME materialized distinct edge set (shared
    blocks — the edge pipeline executes once). One mirrored float
    division at the end."""
    from .stages.graph import triangle_count
    from .util import collect_arrow, drop_empty_blocks

    nparts = _join_partitions()
    _, e = _basket_edges(sf_dir, nparts)
    e = e.materialize()
    n_tri = triangle_count(e, num_partitions=nparts)

    def deg_partial(b: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                b.column("p1").to_numpy(zero_copy_only=False),
                b.column("p2").to_numpy(zero_copy_only=False),
            ]
        )
        t = pa.table({"n": pa.array(nodes.astype(np.int64))})
        return t.group_by("n").aggregate([([], "count_all")]).rename_columns(
            ["n", "d"]
        )

    degs = (
        collect_arrow(
            drop_empty_blocks(e.map_batches(deg_partial, batch_format="pyarrow")),
            schema=pa.schema([("n", pa.int64()), ("d", pa.int64())]),
        )
        .group_by("n")
        .aggregate([("d", "sum")])
    )
    d = degs.column("d_sum").to_numpy(zero_copy_only=False).astype(np.int64)
    wedges = int((d * (d - 1) // 2).sum())
    return pa.table(
        {
            "triangles": pa.array([n_tri], pa.int64()),
            "wedges": pa.array([wedges], pa.int64()),
            "transitivity": pa.array(
                [(3.0 * float(n_tri)) / float(wedges)], pa.float64()
            ),
        }
    )


def events_point_in_time_join(sf_dir: str):
    """Feature-store POINT-IN-TIME join (leak-free temporal lookup):
    each order joins the customer's event-type state VALID AT order
    time from the SCD-2 interval table — the correctness contract
    every offline training-set builder enforces (no future state may
    reach a training row). The intervals come from the same change-log
    compression as events_scd2 (one groupby exchange); a user's
    non-empty intervals partition the timeline, so the interval valid
    at ts is exactly the one with the greatest valid_from ≤ ts — the
    backward as-of join (stages/joins.asof_join: union-tag + one
    co-partition + searchsorted; LEFT semantics keep orders with no
    prior state as nulls). Zero-length intervals (two state changes at
    one timestamp) are dropped before the join — SQL's [from, to)
    predicate can never match them, and dropping them makes the as-of
    tie-break exact."""
    from .stages.joins import asof_join

    scd = events_scd2(sf_dir)

    def nonempty(b: pa.Table) -> pa.Table:
        keep = pc.or_kleene(
            pc.is_null(b.column("valid_to")),
            pc.greater(b.column("valid_to"), b.column("valid_from")),
        )
        return b.filter(keep)

    scd = scd.map_batches(nonempty, batch_format="pyarrow")
    orders = _pq(
        sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"], blocks=8
    ).map_batches(
        lambda b: b.rename_columns(["user_id", "o_orderkey", "o_orderdate"]),
        batch_format="pyarrow",
    )
    return asof_join(
        orders,
        scd,
        key="user_id",
        left_ts="o_orderdate",
        right_ts="valid_from",
        left_cols=["o_orderkey"],
        right_cols=["event_type"],
    )


def embeddings_ivf_recall(sf_dir: str, k: int = 5):
    """ANN recall@k evaluation — the eval-harness operator every
    approximate-similarity deployment runs before trusting the index:
    for the same query set, compare the IVF probe's top-k against the
    exact brute-force top-k and report per-query recall plus the
    pruning fraction's complement (both engines in this repo: the scale
    path and its ground truth). Reuses knn_brute (broadcast query
    matrix, streamed local-top-k partials) and knn_ivf (nprobe cell
    files only); the set intersection is output-sized driver math.
    Rows-only (the IVF index is iterative/stateful); the invariants —
    recall ∈ [0, 1], exact self-hit always recalled, determinism —
    are pinned in tests."""
    from .stages.similarity import knn_brute, knn_ivf

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrows = sorted(
        ds.filter(expr="vec_id < 5").take_all(), key=lambda r: r["vec_id"]
    )
    queries = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    exact = knn_brute(ds, "embedding", "vec_id", queries, k=k)
    approx = knn_ivf(
        ds, "embedding", "vec_id", queries, k=k, nlist=32, nprobe=3
    )

    def _sets(tbl: pa.Table, qcol: str, ncol: str) -> dict:
        out: dict = {}
        for q, n in zip(
            tbl.column(qcol).to_pylist(), tbl.column(ncol).to_pylist()
        ):
            out.setdefault(int(q), set()).add(int(n))
        return out

    ex = _sets(exact, "query_idx", "neighbor_id")
    ap = _sets(approx, "query_idx", "neighbor_id")
    qids = sorted(ex)
    hits = [len(ex[q] & ap.get(q, set())) for q in qids]
    return pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "k": pa.array([k] * len(qids), pa.int64()),
            "n_hit": pa.array(hits, pa.int64()),
            "recall": pa.array(
                [h / float(k) for h in hits], pa.float64()
            ),
        }
    )


def docs_vocab_growth(sf_dir: str, n_checkpoints: int = 10):
    """Heaps'-law vocabulary growth curve — cumulative distinct
    vocabulary vs cumulative token count at doc-id decile checkpoints:
    the corpus-analysis primitive behind tokenizer sizing and
    dedup-saturation checks (a flattening curve says new shards add
    tokens but no new vocabulary). ONE streaming pass emits two
    union-schema block partials — (token, min doc id) for the vocab
    axis and (doc id, token count) for the volume axis; the vocab-sized
    fold is driver-side (the TF-IDF seam) where checkpoint counts are
    two searchsorteds over sorted first-seen ids and a cumsum. All
    checkpoint thresholds are the integer deciles of max(doc_id)+1 —
    pure integer math, identical in the oracle."""
    from .util import collect_arrow, drop_empty_blocks

    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)

    def partials(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.utf8_lower(b.column("text").combine_chunks()), " "
        )
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ids = pc.cast(b.column("doc_id"), pa.int64()).to_numpy(zero_copy_only=False)
        parent = np.repeat(ids, n_tok)
        t = pa.table(
            {"tok": pc.list_flatten(toks), "doc": pa.array(parent)}
        )
        g = t.group_by("tok").aggregate([("doc", "min")])
        return pa.table(
            {
                "kind": pa.array(
                    np.r_[
                        np.zeros(g.num_rows, dtype=np.int8),
                        np.ones(len(ids), dtype=np.int8),
                    ]
                ),
                "tok": pa.concat_arrays(
                    [
                        g.column("tok").combine_chunks().cast(pa.string()),
                        pa.nulls(len(ids), pa.string()),
                    ]
                ),
                "v1": pa.array(
                    np.r_[
                        g.column("doc_min")
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64),
                        ids,
                    ]
                ),
                "v2": pa.array(
                    np.r_[np.zeros(g.num_rows, dtype=np.int64), n_tok]
                ),
            }
        )

    t = collect_arrow(
        drop_empty_blocks(ds.map_batches(partials, batch_format="pyarrow")),
        schema=pa.schema(
            [
                ("kind", pa.int8()),
                ("tok", pa.string()),
                ("v1", pa.int64()),
                ("v2", pa.int64()),
            ]
        ),
    )
    kind = t.column("kind").to_numpy(zero_copy_only=False)
    vocab_part = t.filter(pa.array(kind == 0))
    first_seen = (
        vocab_part.select(["tok", "v1"])
        .group_by("tok")
        .aggregate([("v1", "min")])
        .column("v1_min")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    first_seen.sort()
    doc_part = t.filter(pa.array(kind == 1))
    doc_ids = doc_part.column("v1").to_numpy(zero_copy_only=False).astype(np.int64)
    doc_n = doc_part.column("v2").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(doc_ids, kind="stable")
    doc_ids, doc_n = doc_ids[order], doc_n[order]
    cum = np.zeros(len(doc_n) + 1, dtype=np.int64)
    np.cumsum(doc_n, out=cum[1:])
    m = int(doc_ids[-1]) + 1 if len(doc_ids) else 0
    deciles = np.arange(1, n_checkpoints + 1, dtype=np.int64)
    thresholds = deciles * m // n_checkpoints
    n_tokens = cum[np.searchsorted(doc_ids, thresholds, side="left")]
    vocab = np.searchsorted(first_seen, thresholds, side="left")
    return pa.table(
        {
            "decile": pa.array(deciles),
            "threshold": pa.array(thresholds),
            "n_tokens": pa.array(n_tokens.astype(np.int64)),
            "vocab": pa.array(vocab.astype(np.int64)),
        }
    )


def docs_lang_confusion(sf_dir: str):
    """Language-ID confusion matrix — predicted (n-gram/stopword
    heuristic, functions/text.detect_language) vs the labeled ``lang``
    column, censused per (label, prediction) cell: the eval harness a
    curation pipeline runs before trusting a classifier to route a
    multilingual crawl. ONE streaming pass emits block-local cell
    partials (label rides the same scan as the text); cells are
    |langs|² — driver fold. Oracle: the docs_langid heuristic CTE
    joined back to the label."""
    from .util import collect_arrow, drop_empty_blocks

    ds = _pq(sf_dir, "documents", ["doc_id", "text", "lang"], blocks=8)

    def cells(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "lang": batch.column("lang"),
                "lang_pred": pa.array(
                    [detect_language(t) for t in batch.column("text").to_pylist()],
                    pa.string(),
                ),
            }
        )
        return (
            t.group_by(["lang", "lang_pred"])
            .aggregate([([], "count_all")])
            .rename_columns(["lang", "lang_pred", "n"])
        )

    out = (
        collect_arrow(
            drop_empty_blocks(ds.map_batches(cells, batch_format="pyarrow")),
            schema=pa.schema(
                [("lang", pa.string()), ("lang_pred", pa.string()), ("n", pa.int64())]
            ),
        )
        .group_by(["lang", "lang_pred"])
        .aggregate([("n", "sum")])
        .rename_columns(["lang", "lang_pred", "n"])
    )
    return out.take(
        pc.sort_indices(
            out, sort_keys=[("lang", "ascending"), ("lang_pred", "ascending")]
        )
    )


def docs_quality(sf_dir: str):
    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)

    def q(batch: pa.Table) -> pa.Table:
        feats = [quality_features(t) for t in batch.column("text").to_pylist()]
        cols = {"doc_id": batch.column("doc_id")}
        for k in ("n_tokens", "mean_token_len", "digit_ratio", "punct_ratio",
                  "stopword_ratio", "quality_score"):
            typ = pa.int64() if k == "n_tokens" else pa.float64()
            cols[k] = pa.array([f[k] for f in feats], typ)
        return pa.table(cols)

    return ds.map_batches(q, batch_format="pyarrow")


def docs_fingerprint(sf_dir: str):
    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)

    def fp(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "fingerprint": pa.array(
                    [fingerprint64(t) for t in batch.column("text").to_pylist()],
                    pa.int64(),
                ),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


def docs_repetition(sf_dir: str):
    """Repetition-based quality stats (the Gopher/C4 pretraining
    filter): per-doc token histogram (total / distinct / most-frequent
    count) and bigram histogram (total / most-frequent count), plus an
    integer-only pass flag: top token ≤ 20 % of tokens and top bigram
    ≤ 20 % of bigrams, each applied only above a minimum count (5
    tokens / 20 bigrams — Gopher applies its repetition thresholds to
    long documents; below the minimum the check is vacuous), all
    cross-multiplied, no floats. NO shuffle at all: a document is one
    row, so both histograms are block-local Arrow group_bys and the
    map stage emits one finished row per doc."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)

    def rep(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.utf8_trim_whitespace(texts)), r"\s+"
        )
        arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        lens = np.diff(arr.offsets.to_numpy())
        did_all = batch.column("doc_id").to_numpy(zero_copy_only=False)
        flat = arr.values
        tl = pa.table(
            {"doc_id": pa.array(np.repeat(did_all, lens)), "tok": flat}
        ).filter(pc.not_equal(flat, ""))
        tc = tl.group_by(["doc_id", "tok"]).aggregate([([], "count_all")])
        ts = (
            tc.group_by(["doc_id"])
            .aggregate([("count_all", "sum"), ("count_all", "max"), ([], "count_all")])
            .rename_columns(["doc_id", "n_tokens", "top_token_n", "n_distinct"])
        )
        # bigrams over the UNFILTERED token list — the exact
        # construction the docs_top_ngrams oracle proves parity for
        ngrams, docidx = _bigram_expand(texts)
        bt = pa.table({"doc_id": pa.array(did_all[docidx]), "ng": ngrams})
        bc = bt.group_by(["doc_id", "ng"]).aggregate([([], "count_all")])
        bs = (
            bc.group_by(["doc_id"])
            .aggregate([("count_all", "sum"), ("count_all", "max")])
            .rename_columns(["doc_id", "n_bigrams", "top_bigram_n"])
        )
        j = ts.join(bs, keys="doc_id", join_type="left outer")
        n_tok = j.column("n_tokens").to_numpy(zero_copy_only=False)
        top_tok = j.column("top_token_n").to_numpy(zero_copy_only=False)
        n_bg = j.column("n_bigrams").fill_null(0).to_numpy(zero_copy_only=False)
        top_bg = j.column("top_bigram_n").fill_null(0).to_numpy(zero_copy_only=False)
        ok = ((n_tok < 5) | (top_tok * 5 <= n_tok)) & (
            (n_bg < 20) | (top_bg * 5 <= n_bg)
        )
        return pa.table(
            {
                "doc_id": j.column("doc_id"),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_distinct": j.column("n_distinct"),
                "top_token_n": pa.array(top_tok, pa.int64()),
                "n_bigrams": pa.array(n_bg, pa.int64()),
                "top_bigram_n": pa.array(top_bg, pa.int64()),
                "rep_ok": pa.array(ok),
            }
        )

    return ds.map_batches(rep, batch_format="pyarrow")


def docs_pack_sequences(sf_dir: str, budget: int = 256):
    """Greedy sequence packing (training-batch assembly): documents
    pack into bins of ≤ ``budget`` tokens by first-fit-decreasing
    WITHIN each block — packing is inherently sequential, so the
    distributed form packs per block (blocks' bins are independent and
    the corpus parallelizes) and names each bin by its smallest doc_id,
    which is deterministic for a deterministic block layout. A doc
    longer than the budget gets a singleton bin (truncation is the
    trainer's call). Rows-only: bin assignment is iterative, not SQL;
    capacity / partition / near-optimality invariants are test-pinned
    (FFD uses ≤ 11/9·OPT + 1 bins; the test checks the ceil(Σ/budget)
    lower bound per block)."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)

    def pack(batch: pa.Table) -> pa.Table:
        toks = pc.list_value_length(
            pc.split_pattern_regex(
                pc.utf8_lower(pc.utf8_trim_whitespace(batch.column("text"))), r"\s+"
            )
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.argsort(-toks, kind="stable")  # first-fit DECREASING
        bin_of = np.empty(len(did), dtype=np.int64)
        bins: list[list] = []  # [remaining, member row indices]
        for i in order:
            need = toks[i]
            for b, rec in enumerate(bins):
                if rec[0] >= need:
                    rec[0] -= need
                    rec[1].append(i)
                    bin_of[i] = b
                    break
            else:
                bins.append([max(budget - need, 0), [i]])
                bin_of[i] = len(bins) - 1
        bin_ids = np.array(
            [did[rec[1]].min() for rec in bins], dtype=np.int64
        )
        bin_tok = np.array([toks[rec[1]].sum() for rec in bins], dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(did),
                "n_tokens": pa.array(toks),
                "bin_id": pa.array(bin_ids[bin_of]),
                "bin_tokens": pa.array(bin_tok[bin_of]),
            }
        )

    # batch_size=None ⇒ whole-block batches: bins are per-BLOCK, the
    # documented packing unit
    return ds.map_batches(pack, batch_format="pyarrow", batch_size=None)


def docs_source_digest(sf_dir: str):
    """Order-independent per-source content digest — the partition
    integrity primitive for 100 TB verification: re-run after any
    repartition/migration and compare digests without sorting anything.
    Digest = Σ fingerprint64(text) mod 2⁶⁴ per source; commutative, so
    block order never matters. Exact distributed form: each block sums
    the 32-bit limbs separately (no int64 overflow below 2³¹ rows per
    block), one narrow groupby sums the limbs, and the driver composes
    limbs mod 2⁶⁴ over the handful of sources."""
    from .util import collect_arrow

    ds = _pq(sf_dir, "documents", ["source", "text"], blocks=8)

    def limb_partials(batch: pa.Table) -> pa.Table:
        h = np.array(
            [fingerprint64(t) for t in batch.column("text").to_pylist()],
            dtype=np.int64,
        ).view(np.uint64)
        t = pa.table(
            {
                "source": batch.column("source"),
                "lo": pa.array((h & np.uint64(0xFFFFFFFF)).astype(np.int64)),
                "hi": pa.array((h >> np.uint64(32)).astype(np.int64)),
                "n": pa.array(np.ones(len(h), dtype=np.int64)),
            }
        )
        return (
            t.group_by(["source"])
            .aggregate([("lo", "sum"), ("hi", "sum"), ("n", "sum")])
            .rename_columns(["source", "lo", "hi", "n"])
        )

    agg = (
        ds.map_batches(limb_partials, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("lo", alias_name="lo"),
            Sum("hi", alias_name="hi"),
            Sum("n", alias_name="n_docs"),
        )
    )
    t = collect_arrow(agg)
    digests = [
        (lo + (hi << 32)) % (1 << 64)
        for lo, hi in zip(t.column("lo").to_pylist(), t.column("hi").to_pylist())
    ]
    signed = [d - (1 << 64) if d >= (1 << 63) else d for d in digests]
    return pa.table(
        {
            "source": t.column("source"),
            "digest": pa.array(signed, pa.int64()),
            "n_docs": t.column("n_docs"),
        }
    )


def events_debounce(sf_dir: str, min_gap_us: int = 600_000_000):
    """Windowed deduplication (debounce): keep an event only if it is
    the first, or ≥ 10 minutes after the previous event of the same
    (user, event_type) — the duplicate-suppression primitive for noisy
    event streams. r5: ONE global (user, type, ts, event_id) sort + an
    across-group kernel via util.sorted_group_apply — the keep mask is
    a single shifted diff reset at (user, type) run starts; only
    narrow columns ride the shuffle, no per-group Python dispatch."""
    from .util import sorted_group_apply

    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"], blocks=16)

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                }
            )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()).to_numpy()
        et = t.column("event_type").combine_chunks()
        n = uid.size
        new_run = np.r_[
            True,
            (uid[1:] != uid[:-1])
            | pc.not_equal(et.slice(1), et.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            ),
        ]
        keep = new_run | np.r_[False, np.diff(ts) >= min_gap_us]
        out = t.filter(pa.array(keep))
        return pa.table(
            {
                "event_id": pc.cast(out.column("event_id"), pa.int64()),
                "user_id": pc.cast(out.column("user_id"), pa.int64()),
                "event_type": pc.cast(out.column("event_type"), pa.string()),
            }
        )

    return sorted_group_apply(
        ds, ["user_id", "event_type"], ["ts", "event_id"], kernel
    )


def docs_simhash(sf_dir: str):
    """Full signature table — returned as a streaming Dataset (the
    signatures never materialize on the driver; the driver/consumer
    collects at its own edge)."""
    from .stages.dedup import simhash_pipeline

    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)
    return simhash_pipeline(ds, "text", "doc_id")["signatures"]


def docs_simhash_dups(sf_dir: str):
    from .stages.dedup import simhash_pipeline

    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)
    # pairs-only consumer: no O(corpus) signature table is kept anywhere
    return simhash_pipeline(
        ds, "text", "doc_id", hamming_threshold=3, keep_signatures=False
    )["pairs"]


def docs_minhash_dups(sf_dir: str):
    from .stages.dedup import minhash_pipeline

    # 16 blocks: the signature stage is the compute-heavy part — give
    # the actor-free task pool enough input blocks to fill the node
    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=16)
    return minhash_pipeline(ds, "text", "doc_id", jaccard_threshold=0.5)["pairs"]


def docs_minhash_groups(sf_dir: str):
    """Near-dup GROUP labeling via the distributed connected-components
    path (min-label propagation over the verified pair set) — the
    cluster-scale alternative to driver union-find. SQL-paired against
    a recursive-CTE transitive closure over the brute-force pair set."""
    from .stages.dedup import minhash_pipeline

    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)
    return minhash_pipeline(
        ds, "text", "doc_id", jaccard_threshold=0.5, components="distributed"
    )["groups"]


def embeddings_knn_ivf(sf_dir: str):
    from .stages.similarity import knn_ivf

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrows = sorted(
        ds.filter(expr="vec_id < 5").take_all(), key=lambda r: r["vec_id"]
    )
    queries = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    # nlist ≫ nprobe·nq so the probe demonstrably prunes (logged fraction)
    return knn_ivf(ds, "embedding", "vec_id", queries, k=5, nlist=32, nprobe=3)


def embeddings_kmeans(sf_dir: str, k: int = 8):
    """Distributed k-means cluster assignment: train centroids on a
    sample (deterministic seeded Lloyd, driver-side — centroids are
    k×dim, tiny), broadcast them once, assign every vector in a
    vectorized map_batches matmul. Output (vec_id, cluster, n_members
    via second pass merge) — rows-only (iterative training is not
    ANSI-SQL); determinism + balance asserted in tests."""
    from .stages.similarity import _normalize, train_centroids

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"], blocks=8)
    cent = train_centroids(ds, "embedding", k)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        vecs = _normalize(np.array(batch.column("embedding").to_pylist(), dtype=np.float64))
        cl = (vecs @ c.T).argmax(axis=1).astype(np.int64)
        return pa.table(
            {"vec_id": batch.column("vec_id"), "cluster": pa.array(cl, pa.int64())}
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def events_asof_order(sf_dir: str):
    """Backward as-of join (temporal): each event picks the user's most
    recent order at event time — union-tag + one co-partition by key +
    in-group vectorized searchsorted (stages/joins.asof_join). The
    LATERAL oracle mirrors the (o_orderdate, o_orderkey) max tie-break."""
    from .stages.joins import asof_join

    events = _pq(sf_dir, "events", ["event_id", "user_id", "ts"], blocks=8)
    orders = _pq(
        sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"], blocks=8
    ).map_batches(
        lambda b: b.rename_columns(["user_id", "o_orderkey", "o_orderdate", "o_totalprice"]),
        batch_format="pyarrow",
    )
    return asof_join(
        events, orders,
        key="user_id", left_ts="ts", right_ts="o_orderdate",
        left_cols=["event_id"], right_cols=["o_orderkey", "o_totalprice"],
    )


def _asof_order(sf_dir: str, direction: str):
    from .stages.joins import asof_join

    events = _pq(sf_dir, "events", ["event_id", "user_id", "ts"], blocks=8)
    orders = _pq(
        sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"], blocks=8
    ).map_batches(
        lambda b: b.rename_columns(["user_id", "o_orderkey", "o_orderdate", "o_totalprice"]),
        batch_format="pyarrow",
    )
    return asof_join(
        events, orders,
        key="user_id", left_ts="ts", right_ts="o_orderdate",
        left_cols=["event_id"], right_cols=["o_orderkey", "o_totalprice"],
        direction=direction,
    )


def events_asof_order_forward(sf_dir: str):
    """Forward as-of join: each event picks the user's NEXT order at or
    after event time (earliest right_ts ≥ left_ts, min tie-break) —
    completes the merge_asof direction family with events_asof_order
    (backward) and events_asof_order_nearest."""
    return _asof_order(sf_dir, "forward")


def events_asof_order_nearest(sf_dir: str):
    """Nearest as-of join: each event picks the user's temporally
    CLOSEST order, earlier order winning equidistant ties — the third
    merge_asof direction."""
    return _asof_order(sf_dir, "nearest")


PRICE_BAND_EDGES = [0.0, 50_000.0, 100_000.0, 200_000.0, 300_000.0, 1_000_000.0]
PRICE_BAND_LABELS = ["b1_lt50k", "b2_50_100k", "b3_100_200k", "b4_200_300k", "b5_ge300k"]


def orders_price_band(sf_dir: str):
    """Static range join (banded): orders labeled against a constant
    band table via broadcast searchsorted (stages/joins.band_by_edges)
    — zero shuffle — then a map-side-combined grouped aggregate.
    Totals ride int64 cents (_cents) for order-independent sums."""
    from .stages.joins import band_by_edges
    from .util import collect_arrow

    ds = band_by_edges(
        _pq(sf_dir, "orders", ["o_totalprice"], blocks=8),
        "o_totalprice", PRICE_BAND_EDGES, PRICE_BAND_LABELS,
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"band": b.column("band"), "cents": _cents(b.column("o_totalprice"))}
        )
        return (
            t.group_by(["band"])
            .aggregate([([], "count_all"), ("cents", "sum")])
            .rename_columns(["band", "n_orders", "cents"])
        )

    parts = collect_arrow(ds.map_batches(partial, batch_format="pyarrow"))
    merged = (
        parts.group_by(["band"])
        .aggregate([("n_orders", "sum"), ("cents", "sum")])
        .rename_columns(["band", "n_orders", "cents"])
    )
    merged = _cents_to_dollars(merged, "cents", "total_price")
    return merged.take(pc.sort_indices(merged, sort_keys=[("band", "ascending")]))


def events_running_total(sf_dir: str):
    """Cumulative window: per-user running sum of event value ordered
    by (ts, event_id), in int64 cents (exact regardless of
    accumulation order). r5: ONE global (user, ts, event_id) sort +
    an across-user cumsum with boundary reset via
    util.sorted_group_apply — no per-user Python dispatch."""
    from .util import sorted_group_apply

    ds = _pq(sf_dir, "events", ["user_id", "event_id", "ts", "value"], blocks=16)

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "ts": pa.array([], pa.timestamp("us")),
                    "running_value": pa.array([], pa.float64()),
                }
            )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        cents = _cents(t.column("value")).to_numpy()
        cum = np.cumsum(cents)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        runlens = np.diff(np.r_[starts, uid.size])
        base = np.repeat((cum - cents)[starts], runlens)
        run = cum - base
        return pa.table(
            {
                "user_id": pc.cast(t.column("user_id"), pa.int64()),
                "event_id": pc.cast(t.column("event_id"), pa.int64()),
                "ts": pc.cast(t.column("ts"), pa.timestamp("us")),
                "running_value": pa.array(run.astype(np.float64) / 100.0, pa.float64()),
            }
        )

    return sorted_group_apply(ds, "user_id", ["ts", "event_id"], kernel)


def events_cusum(sf_dir: str, k_cents: int = 6000, h_cents: int = 5000):
    """One-sided CUSUM change-point statistic per user (Page 1954 —
    the drift monitor every streaming ingest runs on a metric):
    S_t = max(0, S_{t-1} + (x_t − k)), alarm when S_t > h. The
    recursion is computed in CLOSED FORM so it vectorizes:
    S_t = P_t − min(0, min_{j≤t} P_j) with P the (ts, event_id)-ordered
    prefix sum of x−k — one cumsum + one np.minimum.accumulate per
    group, no Python loop. All arithmetic in int64 cents (window sums
    are order-independent in integers), one mirrored /100.0 at the
    edge; the SQL pair is the same identity as two window CTEs, so
    values hash-exact."""
    ds = _pq(sf_dir, "events", ["user_id", "event_id", "ts", "value"], blocks=16)
    from .util import sorted_group_apply

    def kernel(t: pa.Table) -> pa.Table:
        """r5 across-user form: per-group prefix sum via boundary-reset
        cumsum; the per-group RUNNING min uses the group-offset trick —
        add (n_groups − gi)·BIG so earlier groups sit strictly above
        later ones and a single np.minimum.accumulate can never leak a
        minimum across a group boundary (exact in int64; BIG is the
        block's prefix-sum range, cent-scale values keep the product
        far below 2^62, guarded with a per-group fallback)."""
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "ts": pa.array([], pa.timestamp("us")),
                    "cusum": pa.array([], pa.float64()),
                    "alarm": pa.array([], pa.int32()),
                }
            )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        x = _cents(t.column("value")).to_numpy() - k_cents
        cum = np.cumsum(x)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        runlens = np.diff(np.r_[starts, uid.size])
        base = np.repeat((cum - x)[starts], runlens)
        p = cum - base
        gi = np.repeat(np.arange(starts.size, dtype=np.int64), runlens)
        big = int(p.max()) - int(p.min()) + 1
        if starts.size * big < 2**62:
            off = (starts.size - 1 - gi) * big
            runmin = np.minimum.accumulate(p + off) - off
        else:  # unreachable at cent scale; exact per-group fallback
            runmin = np.empty_like(p)
            for s0, ln in zip(starts, runlens):
                runmin[s0 : s0 + ln] = np.minimum.accumulate(p[s0 : s0 + ln])
        s = p - np.minimum(0, runmin)
        return pa.table(
            {
                "user_id": pc.cast(t.column("user_id"), pa.int64()),
                "event_id": pc.cast(t.column("event_id"), pa.int64()),
                "ts": pc.cast(t.column("ts"), pa.timestamp("us")),
                "cusum": pa.array(s.astype(np.float64) / 100.0, pa.float64()),
                "alarm": pa.array((s > h_cents).astype(np.int32)),
            }
        )

    return sorted_group_apply(ds, "user_id", ["ts", "event_id"], kernel)


def docs_stratified_sample(sf_dir: str):
    """Deterministic stratified sample: ~20 % of documents per stratum
    via a multiplicative hash on doc_id (Knuth constant) — a pure
    filter, no shuffle, identical expression in the oracle. Never
    Python hash() (process-salted)."""
    ds = _pq(sf_dir, "documents", ["doc_id", "lang", "n_chars"], blocks=8)

    def keep(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy()
        h = (d * 2654435761) % 4294967296
        return b.filter(pa.array(h % 5 == 0))

    return ds.map_batches(keep, batch_format="pyarrow")


def lineitem_price_quantiles(sf_dir: str):
    """Exact grouped discrete quantiles WITHOUT a distributed sort:
    iterative histogram refinement over int64 cents (stages/quantile) —
    3–4 streaming scans with O(groups×bins) partials, matching DuckDB's
    quantile_disc (rank = ceil(q·n)) bit-for-bit."""
    from .stages.quantile import grouped_quantile_disc

    ds = _pq(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"], blocks=16).map_batches(
        lambda b: pa.table(
            {"l_returnflag": b.column("l_returnflag"), "cents": _cents(b.column("l_extendedprice"))}
        ),
        batch_format="pyarrow",
    )
    t = grouped_quantile_disc(ds, "l_returnflag", "cents", [0.25, 0.5, 0.75, 0.95])
    cols = {"l_returnflag": t.column("l_returnflag")}
    for q in ("q25", "q50", "q75", "q95"):
        cols[q] = pc.divide(pc.cast(t.column(q), pa.float64()), 100.0)
    return pa.table(cols)


def docs_tfidf_top_terms(sf_dir: str, k: int = 3, df_broadcast_limit: int = 2_000_000):
    """TF-IDF top-k terms per document — flat tokenize → per-block
    (doc, term, tf) counts (map-side combine: within a block each doc
    is whole, so tf is final) → distributed DF groupby-sum (narrow,
    term-keyed) → attach DF per term → per-doc top-k rank.

    DF attachment has two identical-output paths: a broadcast map
    (ray.put once — right while the vocabulary ≤ ``df_broadcast_limit``
    terms) and, above the limit, a distributed JOIN of the (doc, term,
    tf) rows against the DF table on ``term`` — the open-web-vocabulary
    scale path (equality tested).

    Output is all-integer (tf, df, rk) — ranking uses tf/df as an IEEE
    double division (bit-identical in DuckDB and numpy), tie-broken by
    term ascending, so no float column ever reaches the value hash."""
    from ray.data.aggregate import Sum as _Sum

    from .util import collect_arrow

    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)

    def term_counts(batch: pa.Table) -> pa.Table:
        # vectorized tokenize (the docs_heavy_terms kernel): RE2 \s+
        # split → explode with doc_id repeated by list length → one
        # Arrow group_by — no per-row Python dict loop in the hot text
        # stage (VERDICT r03 #4). Boundary whitespace yields "" tokens;
        # filtering them reproduces str.split()/trim semantics.
        words = pc.split_pattern_regex(batch.column("text"), r"\s+")
        la = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        lens = np.diff(la.offsets.to_numpy())
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, lens), pa.int64()),
                "term": la.flatten(),
            }
        )
        t = t.filter(pc.not_equal(t.column("term"), ""))
        g = t.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
        g = g.rename_columns(["doc_id", "term", "tf"])
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "term": g.column("term").cast(pa.string()),
                "tf": g.column("tf").cast(pa.int64()),
            }
        )

    toks = ds.map_batches(term_counts, batch_format="pyarrow").materialize()

    def df_partial(b: pa.Table) -> pa.Table:
        return (
            b.group_by("term").aggregate([([], "count_all")]).rename_columns(["term", "df"])
        )

    # DF totals via the sort-kernel sum (vocabulary-proportional group
    # count — a groupby().aggregate() here walks every term in Python)
    df_ds = _sorted_sum_by_key(
        toks.map_batches(df_partial, batch_format="pyarrow"), "term", "df", "df"
    )

    from .util import drop_empty_blocks, sorted_group_apply

    df_ds = drop_empty_blocks(df_ds)  # groupby blocks break joins (util docstring)
    if df_ds.count() <= df_broadcast_limit:
        df_tbl = collect_arrow(df_ds)
        # broadcast as (sorted-by-nothing) parallel arrays; lookup is a
        # vectorized pc.index_in, not a per-row dict probe (VERDICT r4 #3)
        df_ref = ray.put(
            (
                df_tbl.column("term").combine_chunks(),
                df_tbl.column("df").to_numpy(zero_copy_only=False).astype(np.int64),
            )
        )

        def attach_df(b: pa.Table) -> pa.Table:
            terms, dfs = ray.get(df_ref)
            idx = pc.index_in(b.column("term"), value_set=terms)
            return b.append_column(
                "df",
                pa.array(
                    dfs[idx.to_numpy(zero_copy_only=False)], pa.int64()
                ),
            )

        withdf = toks.map_batches(attach_df, batch_format="pyarrow")
    else:
        # vocabulary over the broadcast limit: the DF table never
        # touches the driver — join it on term instead
        withdf = toks.join(df_ds, "inner", _join_partitions(), on=("term",))

    def score_batch(b: pa.Table) -> pa.Table:
        return b.append_column(
            "score",
            pc.divide(
                pc.cast(b.column("tf"), pa.float64()),
                pc.cast(b.column("df"), pa.float64()),
            ),
        )

    def kernel(t: pa.Table) -> pa.Table:
        """r5 across-doc top-k (sorted (doc, score DESC, term)):
        segment rank < k — replaces the per-doc map_groups walk."""
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                    "rk": pa.array([], pa.int64()),
                }
            )
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, did[1:] != did[:-1]])
        runlens = np.diff(np.r_[starts, did.size])
        rk = np.arange(did.size, dtype=np.int64) - np.repeat(starts, runlens)
        keep = rk < k
        out = t.filter(pa.array(keep))
        return pa.table(
            {
                "doc_id": pc.cast(out.column("doc_id"), pa.int64()),
                "term": pc.cast(out.column("term"), pa.string()),
                "tf": pc.cast(out.column("tf"), pa.int64()),
                "df": pc.cast(out.column("df"), pa.int64()),
                "rk": pa.array(rk[keep] + 1, pa.int64()),
            }
        )

    return sorted_group_apply(
        withdf.map_batches(score_batch, batch_format="pyarrow"),
        "doc_id",
        ["score", "term"],
        kernel,
        descending=[True, False],
    )


def events_users_per_type(sf_dir: str):
    """Exact grouped distinct-count (the HLL sketch's exact
    counterpart): per-block pair dedup (map-side combine shrinks the
    exchange to unique pairs) → ONE global (type, user) sort — not a
    pair-keyed groupby-aggregate, whose per-group Python walk is
    user-proportional (the sort-kernel lesson, BASELINE.md r4). After
    the sort duplicate pairs are adjacent: each block counts its
    interior distinct pairs per type vectorized; only rows equal to
    the block's FIRST or LAST pair (the runs that may straddle
    blocks) ship raw for the driver patch. Collected rows are
    type-grain + ≤2 pairs per block."""
    from .util import collect_arrow

    ds = _pq(sf_dir, "events", ["event_type", "user_id"], blocks=16)
    pairs = ds.map_batches(
        lambda b: b.group_by(["event_type", "user_id"]).aggregate([]),
        batch_format="pyarrow",
    ).sort(["event_type", "user_id"])

    def census(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "kind": pa.array([], pa.int8()),
                    "event_type": pa.array([], pa.string()),
                    "v": pa.array([], pa.int64()),
                }
            )
        et = b.column("event_type")
        et = et.combine_chunks() if isinstance(et, pa.ChunkedArray) else et
        uid = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        same_first = pc.and_(
            pc.equal(et, et[0]), pa.array(uid == uid[0])
        ).to_numpy(zero_copy_only=False)
        same_last = pc.and_(
            pc.equal(et, et[len(et) - 1]), pa.array(uid == uid[-1])
        ).to_numpy(zero_copy_only=False)
        em = same_first | same_last
        e_t, e_u = et.filter(pa.array(em)), uid[em]
        it, iu = et.filter(pa.array(~em)), uid[~em]
        c_t = pa.array([], pa.string())
        c_n = np.array([], np.int64)
        if len(it):
            # consecutive-dup mask, then distinct-pair count per type
            new = np.r_[
                True,
                pc.not_equal(it.slice(1), it.slice(0, len(it) - 1)).to_numpy(
                    zero_copy_only=False
                )
                | (iu[1:] != iu[:-1]),
            ]
            firsts = it.filter(pa.array(new))
            g = (
                pa.table({"event_type": firsts})
                .group_by("event_type")
                .aggregate([([], "count_all")])
            )
            c_t = g.column("event_type").combine_chunks().cast(pa.string())
            c_n = g.column("count_all").to_numpy().astype(np.int64)
        return pa.table(
            {
                "kind": pa.array(
                    np.r_[np.zeros(len(e_u), np.int8), np.ones(len(c_n), np.int8)]
                ),
                "event_type": pa.concat_arrays([e_t.cast(pa.string()), c_t]),
                "v": pa.array(np.r_[e_u, c_n], pa.int64()),
            }
        )

    parts = collect_arrow(
        pairs.map_batches(census, batch_format="pyarrow"),
        schema=pa.schema(
            [("kind", pa.int8()), ("event_type", pa.string()), ("v", pa.int64())]
        ),
    )
    kind = parts.column("kind").to_numpy()
    interior = (
        pa.table(
            {
                "event_type": parts.column("event_type").filter(pa.array(kind == 1)),
                "n_users": parts.column("v").filter(pa.array(kind == 1)),
            }
        )
        .group_by("event_type")
        .aggregate([("n_users", "sum")])
        .rename_columns(["event_type", "n_users"])
    )
    edge = parts.filter(pa.array(kind == 0))
    cols = {
        "event_type": interior.column("event_type"),
        "n_users": interior.column("n_users"),
    }
    if edge.num_rows:
        eg = (
            pa.table(
                {
                    "event_type": edge.column("event_type"),
                    "user_id": edge.column("v"),
                }
            )
            .group_by(["event_type", "user_id"])
            .aggregate([])
            .group_by("event_type")
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "n_users"])
        )
        cols = {
            "event_type": pa.concat_arrays(
                [
                    interior.column("event_type").combine_chunks().cast(pa.string()),
                    eg.column("event_type").combine_chunks().cast(pa.string()),
                ]
            ),
            "n_users": pa.concat_arrays(
                [
                    interior.column("n_users").combine_chunks().cast(pa.int64()),
                    eg.column("n_users").combine_chunks().cast(pa.int64()),
                ]
            ),
        }
    merged = (
        pa.table(cols)
        .group_by("event_type")
        .aggregate([("n_users", "sum")])
        .rename_columns(["event_type", "n_users"])
    )
    return merged.take(pc.sort_indices(merged, sort_keys=[("event_type", "ascending")]))


def events_approx_users(sf_dir: str):
    """HyperLogLog distinct-user sketch per event type (stages/sketch)
    — deterministic splitmix64 registers, max-merged map-side. SQL-paired
    not against DuckDB's own approx_count_distinct (a different HLL) but
    against this engine's HLL re-expressed exactly in SQL (HUGEINT
    splitmix64 + register groupby + scaled-integer register sum); the
    ~1.6 % error bound vs exact counts is asserted in tests."""
    from .stages.sketch import grouped_hll

    ds = _pq(sf_dir, "events", ["event_type", "user_id"], blocks=8)
    return grouped_hll(ds, "event_type", "user_id", p=12)


def events_type_overlap(sf_dir: str):
    """HLL set algebra — approximate audience OVERLAP between two event
    types ('click' ∩ 'view' users) from one pass: union by register
    max (the HLL-native merge), intersection by inclusion–exclusion
    (stages/sketch.hll_set_algebra).  The cross-segment overlap
    question every analytics store answers without a distinct-pair
    shuffle; error bound vs exact counts asserted in tests."""
    from .stages.sketch import hll_set_algebra

    ds = _pq(sf_dir, "events", ["event_type", "user_id"], blocks=8)
    return hll_set_algebra(ds, "event_type", "user_id", "click", "view", p=12)


def events_type_overlap_kmv(sf_dir: str):
    """Theta/KMV set algebra — the tight-small-intersection companion
    to `events_type_overlap` (closing the seam its HLL docstring
    names): bottom-k hash samples per event type, θ = min of the two
    saturation thresholds, and the intersection estimated from the
    DIRECT sample overlap below θ — error scales with Jaccard
    similarity, not union size (stages/sketch.kmv_set_algebra).
    Exact whenever a group's distinct count ≤ k."""
    from .stages.sketch import kmv_set_algebra

    ds = _pq(sf_dir, "events", ["event_type", "user_id"], blocks=8)
    return kmv_set_algebra(ds, "event_type", "user_id", "click", "view", k=1024)


def events_ab_test(sf_dir: str):
    """A/B EXPERIMENT READOUT — deterministic hash assignment of users
    to two arms (FNV-1a(user_id) % 2, restart-stable like docs_split),
    per-arm user counts and conversion rates (converted = any purchase
    of ≥ $150, exact cents), and the pooled two-proportion z
    statistic. Distributed shape: per-user (arm, converted) facts from
    block-level partials (user grain — the block groupby is the
    combiner) → one user-keyed sort-kernel max (``_sorted_sum_by_key``
    — no per-user Python walk) → arm-grain counts folded at the edge
    (2 rows). All counts exact int64; the rate and z
    divisions are single ordered float expressions mirrored in SQL
    (z pinned to 0 when the pooled variance degenerates)."""
    import math

    from .util import collect_arrow, drop_empty_blocks

    ds = _pq(sf_dir, "events", ["user_id", "event_type", "value"], blocks=16)

    def partial(b: pa.Table) -> pa.Table:
        is_buy = pc.equal(b.column("event_type"), "purchase")
        big = pc.and_(
            is_buy, pc.greater_equal(_cents(b.column("value")), 15_000)
        )
        t = pa.table(
            {
                "user_id": b.column("user_id"),
                "conv": pc.cast(big, pa.int64()),
            }
        )
        return (
            t.group_by("user_id")
            .aggregate([("conv", "max")])
            .rename_columns(["user_id", "conv"])
        )

    # user-keyed MAX via the sort-kernel (user-proportional group count
    # — Ray's groupby-aggregate walks every user in Python)
    per_user = drop_empty_blocks(
        _sorted_sum_by_key(
            ds.map_batches(partial, batch_format="pyarrow"),
            "user_id",
            "conv",
            "conv",
            op="max",
        )
    )

    def arm_counts(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        arm = (_fnv64(uid) % np.uint64(2)).astype(np.int64)
        t = pa.table(
            {
                "arm": pa.array(arm),
                "n_users": pa.array(np.ones(len(uid), dtype=np.int64)),
                "n_converted": pa.array(
                    b.column("conv").to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        )
        return (
            t.group_by("arm")
            .aggregate([("n_users", "sum"), ("n_converted", "sum")])
            .rename_columns(["arm", "n_users", "n_converted"])
        )

    folded = (
        collect_arrow(per_user.map_batches(arm_counts, batch_format="pyarrow"))
        .group_by("arm")
        .aggregate([("n_users", "sum"), ("n_converted", "sum")])
        .rename_columns(["arm", "n_users", "n_converted"])
    )
    folded = folded.take(pc.sort_indices(folded, sort_keys=[("arm", "ascending")]))
    n = folded.column("n_users").to_pylist()
    c = folded.column("n_converted").to_pylist()
    rate = [ci / ni for ci, ni in zip(c, n)]
    p_pool = (c[0] + c[1]) / (n[0] + n[1])
    se = math.sqrt(p_pool * (1.0 - p_pool) * (1.0 / n[0] + 1.0 / n[1]))
    z = (rate[1] - rate[0]) / se if se > 0.0 else 0.0
    return pa.table(
        {
            "arm": folded.column("arm"),
            "n_users": folded.column("n_users"),
            "n_converted": folded.column("n_converted"),
            "rate": pa.array(rate, pa.float64()),
            "z_stat": pa.array([z, z], pa.float64()),
        }
    )


def events_max_value_rows(sf_dir: str):
    """Grouped max-semi-join — ALL rows at their group's maximum
    (argmax with ties, the 'best row(s) per key' selector): block-local
    per-user max partials → one groupby(user) max → inner join back →
    equality filter.  Unlike argmin/argmax attribution (one row per
    group), ties survive — the semantics of `WHERE (k, v) IN (SELECT
    k, max(v) ...)`."""
    from .util import drop_empty_blocks

    ds = _pq(sf_dir, "events", ["user_id", "event_id", "value"], blocks=16)

    def local_max(b: pa.Table) -> pa.Table:
        return b.select(["user_id", "value"]).group_by("user_id").aggregate(
            [("value", "max")]
        ).rename_columns(["user_id", "mx"])

    mx = drop_empty_blocks(
        _sorted_agg_by_key(
            ds.map_batches(local_max, batch_format="pyarrow"),
            "user_id",
            [("mx", "max", "max(mx)")],
        )
    )

    joined = ds.join(mx, "inner", _join_partitions(), on=("user_id",))

    def keep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("value"), b.column("max(mx)")))
        return t.select(["user_id", "event_id", "value"])

    return joined.map_batches(keep, batch_format="pyarrow")


def crawl_wave_phases(sf_dir: str):
    """Engine observability — the per-wave phase breakdown
    (take / issue / workers / admit wall-clock plus issued count) the
    scaling analysis in BASELINE.md is built from, exposed as a query
    over the flagship crawl.  Rows-only (timings are measurements, not
    derivable data); the registry test asserts structural invariants."""
    from .oracle import CrawlSpec
    from .pipelines.crawl import EngineConfig, run_crawl

    spec = CrawlSpec(
        n_pages=CORPUS_N, seeds=[datagen.url(1)], max_urls=120, batch_size=25,
        scope=Scope("suffix", datagen.HOST_SUFFIX),
    )
    res = run_crawl(spec, corpus_dir(), EngineConfig(num_workers=_safe_workers()))
    rows = [m for m in res.wave_metrics if "t_workers" in m]
    return pa.table(
        {
            "wave": pa.array([int(m["wave"]) for m in rows], pa.int64()),
            "issued": pa.array([int(m["issued"]) for m in rows], pa.int64()),
            "t_take": pa.array([float(m["t_take"]) for m in rows], pa.float64()),
            "t_issue": pa.array([float(m["t_issue"]) for m in rows], pa.float64()),
            "t_workers": pa.array(
                [float(m["t_workers"]) for m in rows], pa.float64()
            ),
            "t_admit": pa.array([float(m["t_admit"]) for m in rows], pa.float64()),
        }
    )


def embeddings_quantize(sf_dir: str):
    """int8 EMBEDDING QUANTIZATION — the storage/serving feature-prep
    step (4× smaller vectors for ANN serving): per vector, symmetric
    max-abs scale and ``q = floor(x/scale·127 + 0.5)``, emitted in
    LONG form (vec_id, pos, q, scale) so the oracle compare is over
    plain integer rows.  Fully vectorized: one flat-buffer reshape per
    block (`similarity._vec_matrix`), one row-max, one broadcasted
    quantize — no per-row Python.  float32 → float64 casts are exact,
    and the float op order matches the SQL, so q is hash-exact."""
    from .stages.similarity import _vec_matrix

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"], blocks=8)

    def quant(b: pa.Table) -> pa.Table:
        m = _vec_matrix(b.column("embedding"))
        n, d = m.shape
        scale = np.abs(m).max(axis=1)
        safe = np.where(scale == 0.0, 1.0, scale)
        q = np.floor(m / safe[:, None] * 127.0 + 0.5).astype(np.int64)
        q[scale == 0.0] = 0
        ids = b.column("vec_id").to_numpy()
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, d)),
                "pos": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
                "q": pa.array(q.ravel()),
                "scale": pa.array(np.repeat(scale, d), pa.float64()),
            }
        )

    return ds.map_batches(quant, batch_format="pyarrow")


_CURATE_MIN_TOK = 20
_CURATE_MAX_TOK = 80


def docs_curate(sf_dir: str):
    """END-TO-END curation pass — the composition a training-data user
    actually runs, chained from this registry's own stages: exact
    dedup (min doc_id per text), the quality gate (exact composite
    score ≥ 0.75), a token-count band (20–80), and the
    deterministic FNV train/val/test split — one streaming pipeline,
    each stage the same distributed shape as its standalone query
    (dedup: text-keyed groupby-min; quality: vectorized block kernel;
    split: hash arithmetic; no driver rows anywhere).  The SQL oracle
    chains the same four stages as CTEs, so the WHOLE pipeline is
    hash-checked, not just its pieces."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)

    def keep_min(b: pa.Table) -> pa.Table:
        return b.group_by("text").aggregate([("doc_id", "min")]).rename_columns(
            ["text", "doc_id"]
        )

    keepers = (
        _sorted_agg_by_key(
            ds.map_batches(keep_min, batch_format="pyarrow"),
            "text",
            [("doc_id", "min", "min(doc_id)")],
        )
        .map_batches(
            lambda b: pa.table({"doc_id": b.column("min(doc_id)")}),
            batch_format="pyarrow",
        )
    )

    def qualify(b: pa.Table) -> pa.Table:
        feats = [quality_features(t) for t in b.column("text").to_pylist()]
        score = np.array([f["quality_score"] for f in feats])
        ntok = np.array([f["n_tokens"] for f in feats], dtype=np.int64)
        keep = (score >= 0.75) & (ntok >= _CURATE_MIN_TOK) & (ntok <= _CURATE_MAX_TOK)
        t = pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_tokens": pa.array(ntok),
                "quality_score": pa.array(score, pa.float64()),
            }
        )
        return t.filter(pa.array(keep))

    qualified = ds.map_batches(qualify, batch_format="pyarrow")
    curated = qualified.join(keepers, "inner", _join_partitions(), on=("doc_id",))

    def split(b: pa.Table) -> pa.Table:
        bucket = _fnv64(b.column("doc_id").to_numpy()) % np.uint64(10)
        names = np.where(
            bucket < 8, "train", np.where(bucket == 8, "val", "test")
        )
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_tokens": b.column("n_tokens"),
                "quality_score": b.column("quality_score"),
                "split": pa.array(names.astype(str)),
            }
        )

    return curated.map_batches(split, batch_format="pyarrow")


def crawl_visit_order(sf_dir: str):
    """The flagship crawl's deterministic visit order (north_rule)."""
    from .oracle import CrawlSpec
    from .pipelines.crawl import EngineConfig, run_crawl

    spec = CrawlSpec(
        n_pages=CORPUS_N, seeds=[datagen.url(1)], max_urls=120, batch_size=25,
        scope=Scope("suffix", datagen.HOST_SUFFIX),
    )
    res = run_crawl(spec, corpus_dir(), EngineConfig(num_workers=_safe_workers()))
    return res.audit.select(["visit_seq", "url", "depth", "status_code"])


def crawl_visit_order_weighted(sf_dir: str):
    """Flagship crawl under the weighted frontier (depth/link-score rank,
    north_star); deterministic order differs from FIFO."""
    from .oracle import CrawlSpec
    from .pipelines.crawl import EngineConfig, run_crawl

    spec = CrawlSpec(
        n_pages=CORPUS_N, seeds=[datagen.url(1)], max_urls=120, batch_size=25,
        scope=Scope("suffix", datagen.HOST_SUFFIX),
        link_score={"depth_weight": 1.0, "pattern_boost": 10.0,
                    "patterns": ["/page/img0000002"]},
    )
    res = run_crawl(spec, corpus_dir(), EngineConfig(num_workers=_safe_workers()))
    return res.audit.select(["visit_seq", "url", "depth"])


def crawl_audit_scores(sf_dir: str):
    from .oracle import CrawlSpec
    from .pipelines.crawl import EngineConfig, run_crawl
    from .pipelines.report import finalize_audit

    spec = CrawlSpec(
        n_pages=CORPUS_N, seeds=[datagen.url(1)], max_urls=120, batch_size=25,
        scope=Scope("suffix", datagen.HOST_SUFFIX),
    )
    res = run_crawl(spec, corpus_dir(), EngineConfig(num_workers=_safe_workers()))
    final = finalize_audit(res.audit)
    return final.select_columns(
        ["visit_seq", "url", "metatags_score", "risk_level", "title_duplicado",
         "description_duplicada", "caption_match", "phash_match"]
    )


def corpus_image_stats(sf_dir: str):
    """Multimodal decode/feature stage over the image corpus."""
    from .stages.multimodal import image_stats

    ds = corpus_parquet(columns=["image_id", "bytes", "fmt"])
    return image_stats(ds, concurrency=2, batch_size=64)


def corpus_channel_norm(sf_dir: str):
    """Corpus-level per-channel normalization constants — the dataset
    RGB mean/std a vision trainer computes once and bakes into its
    input transform (the ImageNet-normalization pattern). Decode runs
    in the multimodal actor pool; each block emits ONE row of exact
    int64 pixel moments (`stages/multimodal.ChannelMomentPartials`),
    so the driver folds blocks-many 7-int rows with Python ints (no
    overflow, no float partials). The only float ops are the three
    final expressions, in this documented order: mean = s/n,
    var = s2/n − mean·mean, std = sqrt(var) — bit-reproducible under
    any block layout because the integer partial sums are exact and
    commutative. Rows-only (an oracle would need SQL pixel decode);
    pinned to a whole-corpus numpy reference in tests."""
    import math

    from .stages.multimodal import ChannelMomentPartials

    ds = corpus_parquet(columns=["bytes", "fmt"])
    parts = ds.map_batches(
        ChannelMomentPartials, concurrency=2, batch_size=64, batch_format="pyarrow"
    ).to_pandas()
    n = sum(int(x) for x in parts["n_px"])
    chans, means, stds = [], [], []
    for ch in ("r", "g", "b"):
        s = sum(int(x) for x in parts[f"sum_{ch}"])
        s2 = sum(int(x) for x in parts[f"sumsq_{ch}"])
        mean = s / n
        var = s2 / n - mean * mean
        chans.append(ch)
        means.append(mean)
        stds.append(math.sqrt(var))
    return pa.table(
        {
            "channel": pa.array(chans, pa.string()),
            "n_px": pa.array([n] * 3, pa.int64()),
            "mean": pa.array(means, pa.float64()),
            "std": pa.array(stds, pa.float64()),
        }
    )


def corpus_patch_grid(sf_dir: str, patch: int = 16, max_images: int = 30):
    """ViT-style patch-grid geometry: for each image, every
    non-overlapping ``patch``×``patch`` tile fully inside the frame as
    (patch_idx, px, py, x0, y0) — the tiling plan a vision tokenizer
    materializes before cutting pixels (the cut itself is the decode
    actor pool's job; this is the pure-geometry operator, so it is
    integer-exact and SQL-paired). Capped at ``max_images`` images
    because output is patch-sized. Fully vectorized: per block, tile
    counts via floor division, then one np.repeat fan-out with
    cumulative-offset patch ids — no Python loop."""
    ds = corpus_parquet(columns=["image_id", "w", "h"])
    bound = f"img{max_images:08d}"

    def grid(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "image_id": pa.array([], pa.string()),
                "patch_idx": pa.array([], pa.int64()),
                "px": pa.array([], pa.int64()),
                "py": pa.array([], pa.int64()),
                "x0": pa.array([], pa.int64()),
                "y0": pa.array([], pa.int64()),
            }
        )
        keep = pc.less(b.column("image_id"), bound)
        b = b.filter(keep)
        if b.num_rows == 0:
            return empty
        w = b.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        h = b.column("h").to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = (w // patch) * (h // patch)
        total = int(cnt.sum())
        if total == 0:
            return empty
        rows = np.repeat(np.arange(len(w)), cnt)
        starts = np.zeros(len(w) + 1, dtype=np.int64)
        np.cumsum(cnt, out=starts[1:])
        pidx = np.arange(total, dtype=np.int64) - np.repeat(starts[:-1], cnt)
        nx = np.repeat(w // patch, cnt)
        px, py = pidx % nx, pidx // nx
        return pa.table(
            {
                "image_id": b.column("image_id").take(pa.array(rows)),
                "patch_idx": pa.array(pidx),
                "px": pa.array(px),
                "py": pa.array(py),
                "x0": pa.array(px * patch),
                "y0": pa.array(py * patch),
            }
        )

    return ds.map_batches(grid, batch_format="pyarrow")


def _fnv64_strings(arr: pa.Array) -> np.ndarray:
    """Vectorized FNV-1a (uint64, mod 2⁶⁴) over the UTF-8 bytes of a
    string column, processed per length class (FNV is sequential in
    the byte index, so each equal-length class runs as L vectorized
    xor-multiply passes over an (n, L) byte matrix — the FastSS
    length-class trick applied to hashing). Exactly expressible in SQL
    via HUGEINT list_reduce over ascii codes."""
    import pyarrow.compute as _pc

    lens = _pc.binary_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    joined = "".join(arr.to_pylist()).encode("utf-8")
    flat = np.frombuffer(joined, dtype=np.uint8)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    out = np.empty(len(lens), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for L in np.unique(lens):
            idx = np.flatnonzero(lens == L)
            h = np.full(len(idx), 14695981039346656037, dtype=np.uint64)
            if L:
                mat = flat[starts[idx][:, None] + np.arange(L)]
                for j in range(int(L)):
                    h = (h ^ mat[:, j].astype(np.uint64)) * np.uint64(1099511628211)
            out[idx] = h
    return out


def corpus_crop_plan(sf_dir: str, crop: int = 16):
    """Deterministic seeded crop-augmentation plan: for every image,
    one ``crop``×``crop`` window whose offsets are pure functions of
    the image id — the reproducible random-crop a training pipeline
    needs so re-runs (and the val loader) cut identical windows with
    no stored RNG state. Offsets: FNV-1a over the id bytes continued
    with one axis byte ('x' / 'y'), mod the valid offset range —
    integer-exact, vectorized per length class, and mirrored in SQL
    with HUGEINT list_reduce arithmetic. The cut itself belongs to the
    decode actor pool; this operator is the geometry plan (same
    contract as corpus_patch_grid)."""
    ds = corpus_parquet(columns=["image_id", "w", "h"])

    def plan(b: pa.Table) -> pa.Table:
        w = pc.cast(b.column("w"), pa.int64()).to_numpy(zero_copy_only=False)
        h = pc.cast(b.column("h"), pa.int64()).to_numpy(zero_copy_only=False)
        base = _fnv64_strings(b.column("image_id"))
        with np.errstate(over="ignore"):
            hx = (base ^ np.uint64(ord("x"))) * np.uint64(1099511628211)
            hy = (base ^ np.uint64(ord("y"))) * np.uint64(1099511628211)
        rx = np.maximum(w - crop + 1, 1).astype(np.uint64)
        ry = np.maximum(h - crop + 1, 1).astype(np.uint64)
        x0 = (hx % rx).astype(np.int64)
        y0 = (hy % ry).astype(np.int64)
        fits = (w >= crop) & (h >= crop)
        t = pa.table(
            {
                "image_id": b.column("image_id"),
                "x0": pa.array(x0),
                "y0": pa.array(y0),
                "x1": pa.array(x0 + crop),
                "y1": pa.array(y0 + crop),
            }
        )
        return t.filter(pa.array(fits))

    return ds.map_batches(plan, batch_format="pyarrow")


def corpus_augment(sf_dir: str, crop: int = 16):
    """APPLY the deterministic crop+flip augmentation to real pixels —
    the execution of corpus_crop_plan's geometry (decode → cut → flip →
    lossless re-encode in the multimodal actor pool;
    stages/multimodal.AugmentImages). Offsets reproduce the plan's FNV
    math exactly, flip = parity of fnv^'f'; output rows carry the
    augmented PNG bytes, dims, flip flag and the augmented phash —
    pixels never leave the stage. Rows-only (pixel transform isn't
    SQL); pinned by a decode-back equality test against a numpy
    replay."""
    from .stages.multimodal import AugmentImages
    from .util import collect_arrow

    ds = corpus_parquet(columns=["image_id", "bytes", "fmt"])
    out = collect_arrow(
        ds.map_batches(
            AugmentImages(crop),
            concurrency=_safe_workers(2),
            batch_size=64,
            batch_format="pyarrow",
        )
    )
    keep = pa.table(
        {
            "image_id": out.column("image_id"),
            "w": out.column("w"),
            "h": out.column("h"),
            "flipped": out.column("flipped"),
            "phash": out.column("phash"),
            "n_bytes": pc.binary_length(out.column("bytes")),
        }
    )
    return keep.take(pc.sort_indices(keep, sort_keys=[("image_id", "ascending")]))


def corpus_luma_histogram(sf_dir: str):
    """Corpus-wide 256-bin luminance histogram with its equalization
    LUT — the global histogram-equalization table (level → stretched
    level) an image pipeline derives once per dataset. Per-pixel luma
    is INTEGER ITU-601: (299·R + 587·G + 114·B) // 1000, so the whole
    operator is integer-exact end-to-end: the decode actor pool emits
    one ≤256-row bincount partial per block
    (`stages/multimodal.LumaHistogramPartials`), one level-keyed
    groupby sums them, and the driver's 256-row prefix scan derives
    cdf and lut = (255·cdf) // n_px. Rows-only (needs pixel decode);
    pinned bit-exact to a whole-corpus numpy reference in tests."""
    from .stages.multimodal import LumaHistogramPartials
    from .util import collect_arrow, drop_empty_blocks

    ds = corpus_parquet(columns=["bytes", "fmt"])
    agg = drop_empty_blocks(
        ds.map_batches(
            LumaHistogramPartials, concurrency=2, batch_size=64, batch_format="pyarrow"
        )
        .groupby("level")
        .aggregate(Sum("n", alias_name="n_sum"))
    )
    t = collect_arrow(
        agg, schema=pa.schema([("level", pa.int64()), ("n", pa.int64())])
    ).sort_by("level")
    levels = t.column("level").to_numpy(zero_copy_only=False)
    counts = t.column(t.schema.names[1]).to_numpy(zero_copy_only=False)
    full = np.zeros(256, dtype=np.int64)
    full[levels] = counts
    cdf = np.cumsum(full)
    n_px = int(cdf[-1])
    lut = (255 * cdf) // n_px
    return pa.table(
        {
            "level": pa.array(np.arange(256, dtype=np.int64)),
            "n": pa.array(full),
            "cdf": pa.array(cdf),
            "lut": pa.array(lut),
        }
    )


def corpus_quality_flags(sf_dir: str, dark_pct: int = 30, blur_var: int = 100):
    """Image-quality gate census — the multimodal analog of the Gopher
    text filter: per image, exposure fractions and a Laplacian-variance
    sharpness score from exact integer pixel math
    (`stages/multimodal.ExposureBlurStats`, decode actor pool), plus
    the keep/drop flags a curation run applies (too-dark = dark pixels
    > ``dark_pct`` % via integer cross-multiplication, blurry =
    lap_var < ``blur_var``). Rows-only (needs pixel decode); every
    numeric pinned to a whole-corpus numpy reference in tests."""
    from .stages.multimodal import ExposureBlurStats

    ds = corpus_parquet(columns=["image_id", "bytes", "fmt"])
    feats = ds.map_batches(
        ExposureBlurStats, concurrency=2, batch_size=64, batch_format="pyarrow"
    )

    def flags(b: pa.Table) -> pa.Table:
        too_dark = pc.greater(
            pc.multiply(b.column("n_dark"), 100), pc.multiply(b.column("n_px"), dark_pct)
        )
        blurry = pc.less(b.column("lap_var"), float(blur_var))
        return b.append_column("too_dark", pc.cast(too_dark, pa.int64())).append_column(
            "blurry", pc.cast(blurry, pa.int64())
        )

    return feats.map_batches(flags, batch_format="pyarrow")


def corpus_palette(sf_dir: str):
    """Dominant-color palette + color-entropy census over the image
    corpus (`stages/multimodal.DominantPalette`, decode actor pool,
    small batches): top-3 quantized RGB bins with pixel shares and the
    Shannon entropy of each image's 4096-bin color histogram. Rows-only
    (needs pixel decode); every numeric pinned to a whole-corpus numpy
    reference in tests."""
    from .stages.multimodal import DominantPalette

    ds = corpus_parquet(columns=["image_id", "bytes", "fmt"])
    return ds.map_batches(
        DominantPalette, concurrency=2, batch_size=64, batch_format="pyarrow"
    )


def corpus_channel_covariance(sf_dir: str):
    """Corpus-wide RGB COVARIANCE/CORRELATION matrix — the statistic
    behind ZCA whitening and PCA color augmentation (Krizhevsky et al.
    2012): which color channels co-vary across the whole corpus.
    Decode runs in the multimodal actor pool; each block emits ONE row
    of exact int64 cross moments (`stages/multimodal.
    ChannelCovariancePartials`), the driver folds blocks-many 10-int
    rows with Python ints, and the only float ops are the documented
    final expressions (cov = sxy/n − mean_x·mean_y, corr =
    cov/sqrt(var_x·var_y)) — bit-reproducible under any block layout.
    Rows-only (needs pixel decode); pinned to a whole-corpus numpy
    reference in tests."""
    import math

    from .stages.multimodal import ChannelCovariancePartials

    ds = corpus_parquet(columns=["bytes", "fmt"])
    parts = ds.map_batches(
        ChannelCovariancePartials, concurrency=2, batch_size=64,
        batch_format="pyarrow",
    ).to_pandas()
    n = sum(int(x) for x in parts["n_px"])
    s = {c: sum(int(x) for x in parts[f"sum_{c}"]) for c in "rgb"}
    sx = {
        p: sum(int(x) for x in parts[f"s_{p}"])
        for p in ("rr", "gg", "bb", "rg", "rb", "gb")
    }
    mean = {c: s[c] / n for c in "rgb"}
    var = {c: sx[c + c] / n - mean[c] * mean[c] for c in "rgb"}
    rows_a, rows_b, covs, corrs = [], [], [], []
    for a, b in (("r", "r"), ("r", "g"), ("r", "b"),
                 ("g", "g"), ("g", "b"), ("b", "b")):
        key = a + b if a + b in sx else b + a
        cov = sx[key] / n - mean[a] * mean[b]
        rows_a.append(a)
        rows_b.append(b)
        covs.append(cov)
        corrs.append(cov / math.sqrt(var[a] * var[b]))
    return pa.table(
        {
            "ch_a": pa.array(rows_a, pa.string()),
            "ch_b": pa.array(rows_b, pa.string()),
            "cov": pa.array(covs, pa.float64()),
            "corr": pa.array(corrs, pa.float64()),
        }
    )


def crawl_snapshot(sf_dir: str):
    """Time-travel read off the checkpoint lineage: run the flagship
    crawl with per-wave checkpoints, then reconstruct the audit AS OF
    wave 1 via `pipelines.report.audit_snapshot` (only committed waves
    — state.json is the atomic marker).  Because visit_seq is assigned
    at wave take, the snapshot must be a contiguous visit-order PREFIX
    of the final audit — the property the rows-only test asserts, and
    the property that makes mid-frontier resume deterministic."""
    import shutil
    import tempfile

    from .oracle import CrawlSpec
    from .pipelines.crawl import EngineConfig, run_crawl
    from .pipelines.report import audit_snapshot

    spec = CrawlSpec(
        n_pages=CORPUS_N, seeds=[datagen.url(1)], max_urls=120, batch_size=25,
        scope=Scope("suffix", datagen.HOST_SUFFIX),
    )
    ckpt = tempfile.mkdtemp(prefix="snap_ckpt_")
    try:
        run_crawl(
            spec, corpus_dir(),
            EngineConfig(num_workers=_safe_workers(), checkpoint_dir=ckpt),
        )
        snap = audit_snapshot(
            ckpt, upto_wave=1, columns=["visit_seq", "url", "wave", "status_code"]
        )
        t = snap.to_pandas()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    t = t.sort_values("visit_seq").reset_index(drop=True)
    return pa.Table.from_pandas(t, preserve_index=False)


_NEG_K = 4  # negatives per anchor


def corpus_negative_samples(sf_dir: str):
    """Deterministic negative sampling for contrastive image–caption
    training (the CLIP-style pair-construction step): each anchor image
    draws ``_NEG_K`` hash-seeded negatives uniformly from the corpus
    EXCLUDING itself (draw from [0, N−1) and shift past the anchor —
    exact, no rejection loop), reproducible across any partitioning and
    restart because the draw is fnv64(anchor·K + slot), not RNG state.
    Fully vectorized per block; the only inputs are the id column and
    the corpus size."""
    ds = corpus_parquet(columns=["image_id"])
    n = CORPUS_N
    K = _NEG_K

    def negs(b: pa.Table) -> pa.Table:
        idx = pc.cast(
            pc.utf8_slice_codeunits(b.column("image_id"), 3, 32), pa.int64()
        ).to_numpy()
        anchors, slots, neg = [], [], []
        for j in range(K):
            h = (_fnv64(idx * K + j) % np.uint64(n - 1)).astype(np.int64)
            neg.append(h + (h >= idx))
            anchors.append(idx)
            slots.append(np.full(len(idx), j, dtype=np.int64))
        a = np.concatenate(anchors)
        g = np.concatenate(neg)
        fmt = np.frompyfunc(lambda v: f"img{v:08d}", 1, 1)
        return pa.table(
            {
                "image_id": pa.array(fmt(a).astype(str)),
                "slot": pa.array(np.concatenate(slots)),
                "neg_image_id": pa.array(fmt(g).astype(str)),
            }
        )

    return ds.map_batches(negs, batch_format="pyarrow")


def corpus_phash_dups(sf_dir: str):
    """Image near-dup pairs by perceptual-hash Hamming banding over the
    corpus phash column (multimodal dedup). SQL-paired: threshold (4) <
    bands (8) gives total banding recall, so the brute-force Hamming
    cross join over the stored phash column is an exact oracle."""
    from .stages.dedup import phash_pairs

    ds = corpus_parquet(columns=["image_id", "phash"])
    return phash_pairs(ds, hamming_threshold=4)


def corpus_resize(sf_dir: str):
    from .stages.multimodal import resize_corpus

    ds = corpus_parquet(columns=["image_id", "bytes", "fmt"])
    return resize_corpus(ds, out_h=32, out_w=32, concurrency=2).select_columns(
        ["image_id", "w", "h", "fmt"]
    )


def corpus_phash_groups(sf_dir: str):
    """Image near-dup GROUP labeling: connected components (distributed
    min-label propagation) over the exact Hamming pair set from
    corpus_phash_dups — the image-side analogue of docs_minhash_groups.
    SQL-paired against a recursive-CTE transitive closure over the
    brute-force Hamming pair join."""
    from .stages.dedup import connected_components_distributed, phash_pairs

    ds = corpus_parquet(columns=["image_id", "phash"])
    pairs = phash_pairs(ds, hamming_threshold=4)
    return connected_components_distributed(pairs.select(["id_a", "id_b"]))


def corpus_phash_knn(sf_dir: str):
    """Exact Hamming k-nearest-neighbor search over the perceptual-hash
    column for the first 5 images — similarity search on the image
    axis (the knn_brute pattern with vectorized popcount instead of a
    matmul; the query hashes are broadcast once, each block emits only
    its local top-k)."""
    from .stages.similarity import knn_hamming

    ds = corpus_parquet(columns=["image_id", "phash"])
    qrows = sorted(
        ds.filter(expr="image_id < 'img00000005'").take_all(),
        key=lambda r: r["image_id"],
    )
    return knn_hamming(
        ds,
        "phash",
        "image_id",
        [r["image_id"] for r in qrows],
        np.array([r["phash"] for r in qrows], dtype=np.int64).view(np.uint64),
        k=5,
    )


def corpus_dedup_incremental(sf_dir: str, scan_stats: dict | None = None):
    """Incremental IMAGE dedup against a frozen history index — the
    image-side twin of docs_dedup_incremental over the phash column:
    history = images whose numeric id is not ≡ 0 (mod 4), frozen once
    into a (band, bucket)-partitioned Hamming index; the new wave
    (id ≡ 0 mod 4) probes only the touched partitions and verifies with
    one vectorized xor-popcount. Threshold 4 < 8 bands → total recall,
    so the brute cross Hamming join is an exact oracle."""
    from .stages.dedup import build_hamming_index, dedup_against_hamming_index

    base = corpus_parquet(columns=["image_id", "phash"])

    def _side(new: bool):
        def kernel(b: pa.Table) -> pa.Table:
            num = pc.cast(pc.utf8_slice_codeunits(b.column("image_id"), 3), pa.int64())
            m = pc.equal(pc.bit_wise_and(num, 3), pa.scalar(0, pa.int64()))
            return b.filter(m if new else pc.invert(m))

        return base.map_batches(kernel, batch_format="pyarrow")

    index_dir = os.path.join(_CACHE_ROOT, f"phash_index_n{CORPUS_N}_v1")
    if not os.path.exists(os.path.join(index_dir, "manifest.json")):
        build_hamming_index(_side(new=False), "phash", "image_id", index_dir)
    return dedup_against_hamming_index(
        _side(new=True),
        "phash",
        "image_id",
        index_dir,
        hamming_threshold=4,
        scan_stats=scan_stats,
    )


def corpus_keep_best_caption(sf_dir: str):
    """Image keep-best dedup on a shared caption key: among corpus rows
    sharing a caption (datagen plants i ≡ 13 (mod 26) caption
    duplicates), keep the highest-resolution image (w·h desc, image_id
    asc tiebreak) — the multimodal analogue of docs_dedup_keep_best
    (the reference keeps one row per duplicated title the same way:
    analyzers/metatags_analyzer.py:196-228).

    Distributed shape: per-block (caption → argmax) partials via one
    numpy lexsort, merged once at distinct-caption size with the same
    kernel — no wide shuffle, pixel payloads never read."""
    from .util import collect_arrow

    ds = corpus_parquet(columns=["image_id", "caption", "w", "h"])

    def _argmax_per_caption(cap, ids, px):
        order = np.lexsort((ids, -px, cap))
        cs = cap[order]
        first = np.r_[True, cs[1:] != cs[:-1]]
        return order[first]

    def partial(batch: pa.Table) -> pa.Table:
        px = batch.column("w").to_numpy().astype(np.int64) * batch.column(
            "h"
        ).to_numpy().astype(np.int64)
        ids = batch.column("image_id").to_numpy(zero_copy_only=False)
        cap = batch.column("caption").to_numpy(zero_copy_only=False)
        sel = _argmax_per_caption(cap, ids, px)
        return pa.table(
            {
                "image_id": pa.array(ids[sel].tolist(), pa.string()),
                "caption": pa.array(cap[sel].tolist(), pa.string()),
                "pixels": pa.array(px[sel], pa.int64()),
            }
        )

    parts = collect_arrow(
        ds.map_batches(partial, batch_format="pyarrow"),
        schema=pa.schema(
            [("image_id", pa.string()), ("caption", pa.string()), ("pixels", pa.int64())]
        ),
    )
    ids = parts.column("image_id").to_numpy(zero_copy_only=False)
    cap = parts.column("caption").to_numpy(zero_copy_only=False)
    px = parts.column("pixels").to_numpy()
    sel = _argmax_per_caption(cap, ids, px)
    return pa.table(
        {
            "image_id": pa.array(ids[sel].tolist(), pa.string()),
            "caption": pa.array(cap[sel].tolist(), pa.string()),
            "pixels": pa.array(px[sel], pa.int64()),
        }
    )


def corpus_resolution_census(sf_dir: str):
    """Resolution/format census — the 'what is in this image corpus'
    pre-training audit: row count and pixel-count extrema per
    (fmt, resolution band). Bands are fixed pixel thresholds over w·h;
    partials are hash-aggregated inside each block so the exchange
    ships ≤ |fmt×band| rows per block (the lineitem_agg combine shape
    over the multimodal table)."""
    from .util import collect_arrow

    ds = corpus_parquet(columns=["w", "h", "fmt"])

    def partial(batch: pa.Table) -> pa.Table:
        px = batch.column("w").to_numpy().astype(np.int64) * batch.column(
            "h"
        ).to_numpy().astype(np.int64)
        band = np.select(
            [px < 600, px < 1200, px < 1800], ["tiny", "small", "medium"], "large"
        )
        t = pa.table(
            {
                "fmt": batch.column("fmt"),
                "band": pa.array(band.tolist(), pa.string()),
                "sum_px": pa.array(px, pa.int64()),
                "min_px": pa.array(px, pa.int64()),
                "max_px": pa.array(px, pa.int64()),
            }
        )
        return (
            t.group_by(["fmt", "band"])
            .aggregate(
                [("sum_px", "sum"), ("min_px", "min"), ("max_px", "max"), ([], "count_all")]
            )
            .rename_columns(["fmt", "band", "sum_px", "min_px", "max_px", "n"])
        )

    parts = collect_arrow(
        ds.map_batches(partial, batch_format="pyarrow"),
        schema=pa.schema(
            [
                ("fmt", pa.string()),
                ("band", pa.string()),
                ("sum_px", pa.int64()),
                ("min_px", pa.int64()),
                ("max_px", pa.int64()),
                ("n", pa.int64()),
            ]
        ),
    )
    merged = (
        parts.group_by(["fmt", "band"])
        .aggregate(
            [("sum_px", "sum"), ("min_px", "min"), ("max_px", "max"), ("n", "sum")]
        )
        .rename_columns(["fmt", "band", "sum_px", "min_px", "max_px", "n"])
    )
    return merged.select(["fmt", "band", "n", "sum_px", "min_px", "max_px"])


def corpus_caption_filter(sf_dir: str):
    """Joint multimodal quality filter — the image+caption pairing
    filter every web-scale vision-language pipeline runs (LAION-style
    public recipe): caption token count in [3, 10], short side ≥ 24 px,
    format allowlist. Fully vectorized Arrow (split_pattern_regex token
    counts, min_element_wise short side); pixel payloads never read."""
    ds = corpus_parquet(columns=["image_id", "caption", "w", "h", "fmt"])

    def kernel(batch: pa.Table) -> pa.Table:
        ntok = pc.list_value_length(
            pc.split_pattern_regex(
                pc.utf8_trim_whitespace(batch.column("caption")), r"\s+"
            )
        )
        short = pc.min_element_wise(batch.column("w"), batch.column("h"))
        keep = pc.and_(
            pc.and_(pc.greater_equal(ntok, 3), pc.less_equal(ntok, 10)),
            pc.and_(pc.greater_equal(short, 24), pc.equal(batch.column("fmt"), "png")),
        )
        sel = pc.fill_null(keep, False)
        return pa.table(
            {
                "image_id": batch.column("image_id").filter(sel),
                "n_tokens": ntok.filter(sel),
                "short_side": short.filter(sel),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


def corpus_aspect_buckets(sf_dir: str):
    """Aspect-ratio bucketing census — multimodal batch shaping: a
    vision trainer groups images into aspect buckets so each device
    batch resizes to one canvas (padding waste ∝ within-bucket aspect
    spread). Bucket key is exact integer percent (w·100 // h — no
    float boundary ambiguity between engines); per bucket: count,
    total pixels and mean pixels (single float division, mirrored in
    the oracle). Block-local group_by combiner → one bucket-keyed
    groupby; pixels stay in the scan tasks."""
    from .util import collect_arrow

    ds = corpus_parquet(columns=["w", "h"])

    def partial(b: pa.Table) -> pa.Table:
        w = pc.cast(b.column("w"), pa.int64())
        h = pc.cast(b.column("h"), pa.int64())
        t = pa.table(
            {
                "aspect_pct": pc.divide(pc.multiply(w, 100), h),
                "sum_px": pc.multiply(w, h),
            }
        )
        return (
            t.group_by("aspect_pct")
            .aggregate([("sum_px", "sum"), ([], "count_all")])
            .rename_columns(["aspect_pct", "sum_px", "n"])
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("aspect_pct")
        .aggregate(Sum("sum_px", alias_name="sum_px"), Sum("n", alias_name="n"))
    )
    t = collect_arrow(
        agg,
        schema=pa.schema(
            [("aspect_pct", pa.int64()), ("sum_px", pa.int64()), ("n", pa.int64())]
        ),
    )
    out = pa.table(
        {
            "aspect_pct": t.column("aspect_pct"),
            "n": t.column("n"),
            "sum_px": t.column("sum_px"),
            "mean_px": pc.divide(
                pc.cast(t.column("sum_px"), pa.float64()),
                pc.cast(t.column("n"), pa.float64()),
            ),
        }
    )
    return out.take(pc.sort_indices(out, sort_keys=[("aspect_pct", "ascending")]))


def corpus_bytes_census(sf_dir: str):
    """Encoded-payload size census per format (storage budgeting for a
    100 TB image corpus): count + total/min/max octet length of the
    binary column, computed with the vectorized binary_length kernel —
    the bytes themselves stay inside the scan tasks."""
    from .util import collect_arrow

    ds = corpus_parquet(columns=["bytes", "fmt"])

    def partial(batch: pa.Table) -> pa.Table:
        blen = pc.cast(pc.binary_length(batch.column("bytes")), pa.int64())
        t = pa.table(
            {
                "fmt": batch.column("fmt"),
                "sum_bytes": blen,
                "min_bytes": blen,
                "max_bytes": blen,
            }
        )
        return (
            t.group_by(["fmt"])
            .aggregate(
                [
                    ("sum_bytes", "sum"),
                    ("min_bytes", "min"),
                    ("max_bytes", "max"),
                    ([], "count_all"),
                ]
            )
            .rename_columns(["fmt", "sum_bytes", "min_bytes", "max_bytes", "n"])
        )

    parts = collect_arrow(
        ds.map_batches(partial, batch_format="pyarrow"),
        schema=pa.schema(
            [
                ("fmt", pa.string()),
                ("sum_bytes", pa.int64()),
                ("min_bytes", pa.int64()),
                ("max_bytes", pa.int64()),
                ("n", pa.int64()),
            ]
        ),
    )
    merged = (
        parts.group_by(["fmt"])
        .aggregate(
            [
                ("sum_bytes", "sum"),
                ("min_bytes", "min"),
                ("max_bytes", "max"),
                ("n", "sum"),
            ]
        )
        .rename_columns(["fmt", "sum_bytes", "min_bytes", "max_bytes", "n"])
    )
    return merged.select(["fmt", "n", "sum_bytes", "min_bytes", "max_bytes"])


def events_first_last_touch(sf_dir: str):
    """First/last-touch attribution per user: the event_type of each
    user's earliest and latest event (ts, then event_id tiebreak) plus
    their event count — the argmin/argmax-by-timestamp grouped
    aggregate (SQL first_value/last_value windows). Distributed shape:
    per-block (user → extremes) lexsort partials carrying the order
    keys, merged once at distinct-user size with the same kernel (at
    10^10 rows the merge becomes a groupby over users; the per-block
    combine is unchanged)."""
    from .util import collect_arrow

    ds = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"], blocks=8)

    def _extremes(users, ts, eid, etype, n_partial):
        o = np.lexsort((eid, ts, users))
        u = users[o]
        fm = np.r_[True, u[1:] != u[:-1]]
        lm = np.r_[u[1:] != u[:-1], True]
        fi, li = o[fm], o[lm]
        uu, inv = np.unique(users, return_inverse=True)
        n = np.bincount(inv, weights=n_partial).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uu, pa.int64()),
                "first_ts": pa.array(ts[fi], pa.int64()),
                "first_eid": pa.array(eid[fi], pa.int64()),
                "first_type": pa.array(etype[fi].tolist(), pa.string()),
                "last_ts": pa.array(ts[li], pa.int64()),
                "last_eid": pa.array(eid[li], pa.int64()),
                "last_type": pa.array(etype[li].tolist(), pa.string()),
                "n_events": pa.array(n, pa.int64()),
            }
        )

    def partial(batch: pa.Table) -> pa.Table:
        return _extremes(
            batch.column("user_id").to_numpy(),
            batch.column("ts").to_numpy().view(np.int64),
            batch.column("event_id").to_numpy(),
            batch.column("event_type").to_numpy(zero_copy_only=False),
            np.ones(batch.num_rows, np.int64),
        )

    parts = collect_arrow(
        ds.map_batches(partial, batch_format="pyarrow"),
        schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("first_ts", pa.int64()),
                ("first_eid", pa.int64()),
                ("first_type", pa.string()),
                ("last_ts", pa.int64()),
                ("last_eid", pa.int64()),
                ("last_type", pa.string()),
                ("n_events", pa.int64()),
            ]
        ),
    )
    # merge: first fields compare by (first_ts, first_eid), last fields
    # by (last_ts, last_eid) — run the same kernel on each side
    users = parts.column("user_id").to_numpy()
    f = _extremes(
        users,
        parts.column("first_ts").to_numpy(),
        parts.column("first_eid").to_numpy(),
        parts.column("first_type").to_numpy(zero_copy_only=False),
        parts.column("n_events").to_numpy(),
    )
    lo = np.lexsort(
        (-parts.column("last_eid").to_numpy(), -parts.column("last_ts").to_numpy(), users)
    )
    u = users[lo]
    lm = np.r_[True, u[1:] != u[:-1]]
    li = lo[lm]
    return pa.table(
        {
            "user_id": f.column("user_id"),
            "first_type": f.column("first_type"),
            "last_type": pa.array(
                parts.column("last_type").to_numpy(zero_copy_only=False)[li].tolist(),
                pa.string(),
            ),
            "n_events": f.column("n_events"),
        }
    )


def lineitem_unpivot(sf_dir: str):
    """UNPIVOT (wide→long), the inverse of events_pivot: the four
    lineitem measures become (measure, amount) rows. Pure per-block
    stacking of four narrow projections — vectorized, no shuffle, no
    state; the returned-flag slice keeps the long table output-sized."""
    ds = _pq(
        sf_dir,
        "lineitem",
        [
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        ],
        blocks=8,
    )
    measures = [
        ("quantity", "l_quantity"),
        ("extendedprice", "l_extendedprice"),
        ("discount", "l_discount"),
        ("tax", "l_tax"),
    ]

    def kernel(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("l_returnflag"), "R"))
        parts = [
            pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "l_linenumber": t.column("l_linenumber"),
                    "measure": pa.array(
                        np.repeat(np.array([m], dtype=object), t.num_rows).tolist(),
                        pa.string(),
                    ),
                    "amount": pc.cast(t.column(col), pa.float64()),
                }
            )
            for m, col in measures
        ]
        return pa.concat_tables(parts)

    return ds.map_batches(kernel, batch_format="pyarrow")


def events_above_user_avg(sf_dir: str):
    """Decorrelated correlated-subquery: keep events STRICTLY above
    their own user's mean value. Exact and order-independent — value
    rides int64 cents and the predicate value > sum/n is evaluated as
    the integer cross-multiplication cents·n > sum_cents, so no float
    mean is ever computed on either side. Distributed shape: per-block
    per-user (sum_cents, n) hash-aggregate partials → one narrow
    user-grain groupby → Dataset.join back to the event stream (the
    user table can be 10^9 rows, so a join, not a broadcast) →
    vectorized filter."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "value"], blocks=8)

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": batch.column("user_id"),
                "sum_cents": _cents(batch.column("value")),
            }
        )
        return (
            t.group_by("user_id")
            .aggregate([("sum_cents", "sum"), ([], "count_all")])
            .rename_columns(["user_id", "sum_cents", "n"])
        )

    from .util import drop_empty_blocks

    stats = drop_empty_blocks(
        _sorted_agg_by_key(
            ds.map_batches(partial, batch_format="pyarrow"),
            "user_id",
            [("sum_cents", "sum", "sum_cents"), ("n", "sum", "n")],
        )
    )
    joined = ds.join(
        stats, "inner", _join_partitions(), on=("user_id",), right_on=("user_id",)
    )

    def above(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column("value"))
        keep = pc.greater(
            pc.multiply_checked(cents, batch.column("n")),
            batch.column("sum_cents"),
        )
        t = batch.filter(keep)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "value": t.column("value"),
            }
        )

    return joined.map_batches(above, batch_format="pyarrow")


def customer_order_stats(sf_dir: str):
    """Left-outer join (completes the Dataset join-type family: inner /
    anti / semi / broadcast / as-of / range / LEFT OUTER): every customer
    with its URGENT-order count and spend. Customers with no urgent
    orders survive the join with null partials and are filled to 0 — the
    null-preserving path the inner join can't demonstrate.

    Scale shape: orders are pre-aggregated by the join key inside each
    block, then globally (both exchanges ship custkey-grain partials,
    never raw orders); the customer side streams through the join."""
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_name"], blocks=4)
    orders = _pq(
        sf_dir, "orders", ["o_custkey", "o_orderpriority", "o_totalprice"], blocks=8
    )

    def urgent_partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("o_orderpriority"), "1-URGENT"))
        t = pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "spent_cents": _cents(t.column("o_totalprice")),
            }
        )
        return (
            t.group_by("o_custkey")
            .aggregate([("spent_cents", "sum"), ([], "count_all")])
            .rename_columns(["o_custkey", "spent_cents", "n"])
        )

    from .util import drop_empty_blocks

    urgent = drop_empty_blocks(
        _sorted_agg_by_key(
            orders.map_batches(urgent_partial, batch_format="pyarrow"),
            "o_custkey",
            [("spent_cents", "sum", "spent_cents"), ("n", "sum", "n")],
        )
    )
    joined = cust.join(
        urgent, "left_outer", _join_partitions(), on=("c_custkey",), right_on=("o_custkey",)
    )

    def finish(b: pa.Table) -> pa.Table:
        zero = pa.scalar(0, pa.int64())
        return pa.table(
            {
                "c_custkey": b.column("c_custkey"),
                "c_name": b.column("c_name"),
                "n_urgent": pc.coalesce(b.column("n"), zero),
                "urgent_spent": pc.divide(
                    pc.cast(pc.coalesce(b.column("spent_cents"), zero), pa.float64()),
                    100.0,
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def lineitem_rollup(sf_dir: str):
    """Grouping-sets / ROLLUP aggregate: (returnflag, linestatus) grain
    plus per-returnflag subtotals plus the grand total, rolled-up keys
    marked 'ALL'. One distributed pass produces the finest grain (with
    map-side combine); the coarser levels are derived from those ~6
    rows driver-side — rollup over low-cardinality keys never needs a
    second scan of the fact table."""
    ds = _pq(
        sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_extendedprice"], blocks=16
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "price_cents": _cents(b.column("l_extendedprice")),
            }
        )
        return (
            t.group_by(["l_returnflag", "l_linestatus"])
            .aggregate([("price_cents", "sum"), ([], "count_all")])
            .rename_columns(["l_returnflag", "l_linestatus", "price_cents", "n"])
        )

    from .util import collect_arrow

    fine = collect_arrow(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("price_cents", alias_name="price_cents"), Sum("n", alias_name="n")
        ),
        schema=pa.schema(
            [
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("price_cents", pa.int64()),
                ("n", pa.int64()),
            ]
        ),
    )
    lvl1 = (
        fine.group_by("l_returnflag")
        .aggregate([("price_cents", "sum"), ("n", "sum")])
        .rename_columns(["l_returnflag", "price_cents", "n"])
    )
    lvl1 = lvl1.add_column(
        1, "l_linestatus", pa.array(["ALL"] * lvl1.num_rows, pa.string())
    )
    total = pa.table(
        {
            "l_returnflag": pa.array(["ALL"], pa.string()),
            "l_linestatus": pa.array(["ALL"], pa.string()),
            "price_cents": pa.array([pc.sum(fine.column("price_cents")).as_py()], pa.int64()),
            "n": pa.array([pc.sum(fine.column("n")).as_py()], pa.int64()),
        }
    )
    out = pa.concat_tables(
        [fine.select(total.column_names), lvl1.select(total.column_names), total]
    )
    return pa.table(
        {
            "l_returnflag": out.column("l_returnflag"),
            "l_linestatus": out.column("l_linestatus"),
            "n": out.column("n"),
            "sum_price": pc.divide(pc.cast(out.column("price_cents"), pa.float64()), 100.0),
        }
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(sf_dir: str):
    """Pivot (long→wide): per-user event counts with one column per
    event type. Vectorized indicator columns + in-block combine, then
    one user-keyed groupby over the partials — the wide row never
    exists until after the shuffle, so the exchange ships 6 ints/user."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type"], blocks=16)

    def indicators(b: pa.Table) -> pa.Table:
        et = b.column("event_type")
        cols = {"user_id": b.column("user_id")}
        for t in _EVENT_TYPES:
            cols[f"n_{t}"] = pc.cast(pc.equal(et, t), pa.int64())
        names = list(cols)
        return (
            pa.table(cols)
            .group_by("user_id")
            .aggregate([(f"n_{t}", "sum") for t in _EVENT_TYPES])
            .rename_columns(names)
        )

    return _sorted_agg_by_key(
        ds.map_batches(indicators, batch_format="pyarrow"),
        "user_id",
        [(f"n_{t}", "sum", f"n_{t}") for t in _EVENT_TYPES],
    )


def events_lead_lag(sf_dir: str):
    """Lag window function: per-user delta vs the previous event (value
    delta in exact cents, gap in µs), ordered by (ts, event_id); each
    user's first event keeps NULL deltas — the null-row semantics that
    distinguish lag() from a self-join. r5: ONE global
    (user, ts, event_id) sort + shifted-array diffs masked at user-run
    starts via util.sorted_group_apply — no per-user Python dispatch."""
    from .util import sorted_group_apply

    ds = _pq(sf_dir, "events", ["user_id", "event_id", "ts", "value"], blocks=16)

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "dv_cents": pa.array([], pa.int64()),
                    "gap_us": pa.array([], pa.int64()),
                }
            )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()).to_numpy()
        vc = _cents(t.column("value")).to_numpy()
        mask = np.r_[True, uid[1:] != uid[:-1]]  # first row per user: NULL
        dv = np.r_[0, np.diff(vc)]
        gap = np.r_[0, np.diff(ts)]
        return pa.table(
            {
                "user_id": pc.cast(t.column("user_id"), pa.int64()),
                "event_id": pc.cast(t.column("event_id"), pa.int64()),
                "dv_cents": pa.array(dv, pa.int64(), mask=mask),
                "gap_us": pa.array(gap, pa.int64(), mask=mask),
            }
        )

    return sorted_group_apply(ds, "user_id", ["ts", "event_id"], kernel)


def _bigram_expand(texts) -> tuple:
    """Fully vectorized bigram expansion over a string column: Arrow
    regex split to a list array, numpy offset arithmetic to index
    adjacent token pairs, one binary_join kernel — no Python loop
    touches a row. Returns (ngram string array, int64 doc-index array
    mapping each bigram back to its row)."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.utf8_trim_whitespace(texts)), r"\s+"
    )
    arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offsets = arr.offsets.to_numpy()
    starts, lens = offsets[:-1], np.diff(offsets)
    nbi = np.maximum(lens - 1, 0)  # bigrams per doc
    total = int(nbi.sum())
    if total == 0:
        return pa.array([], pa.string()), np.empty(0, dtype=np.int64)
    # concatenated ranges: for each doc, starts[j] + [0..nbi[j])
    base = np.repeat(starts, nbi)
    within = np.arange(total) - np.repeat(np.cumsum(nbi) - nbi, nbi)
    idx = base + within
    left = arr.values.take(pa.array(idx))
    right = arr.values.take(pa.array(idx + 1))
    ngram = pc.binary_join_element_wise(left, right, " ")
    doc_idx = np.repeat(np.arange(len(nbi), dtype=np.int64), nbi)
    return ngram, doc_idx


def docs_top_ngrams(sf_dir: str, k: int = 50):
    """Corpus-wide top-k bigram counts (the n-gram statistics pass an
    LLM-corpus pipeline runs before vocabulary/contamination work).
    Bigram expansion is fully vectorized: Arrow regex split to a list
    array, numpy offset arithmetic to index adjacent token pairs, one
    binary_join kernel — no Python loop touches a row. In-block counts
    combine before the ngram-keyed groupby; the global top-k uses the
    local-top-k merge (no global sort shuffle)."""
    from .util import collect_arrow

    ds = _pq(sf_dir, "documents", ["text"], blocks=8)

    def bigram_counts(b: pa.Table) -> pa.Table:
        ngram, _ = _bigram_expand(b.column("text"))
        if len(ngram) == 0:
            return pa.table({"ngram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return (
            pa.table({"ngram": ngram})
            .group_by("ngram")
            .aggregate([([], "count_all")])
            .rename_columns(["ngram", "n"])
        )

    agg = _sorted_agg_by_key(
        ds.map_batches(bigram_counts, batch_format="pyarrow"),
        "ngram",
        [("n", "sum", "n")],
    )

    def local_topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            b, sort_keys=[("n", "descending"), ("ngram", "ascending")]
        )
        return b.take(idx[:k])

    parts = collect_arrow(
        agg.map_batches(local_topk, batch_format="pyarrow"),
        schema=pa.schema([("ngram", pa.string()), ("n", pa.int64())]),
    )
    idx = pc.sort_indices(
        parts, sort_keys=[("n", "descending"), ("ngram", "ascending")]
    )
    return parts.take(idx[:k])


def lineitem_bloom_semi(sf_dir: str):
    """Bloom-pruned semi-join — the standard 100 TB big-join reduction:
    the small side's keys (parts with p_size > 40, ~9 % of parts) fold
    into a Bloom filter (16 BITS/key vs 8+ bytes for a hash-set
    broadcast), `ray.put` once, and every lineitem scan task prunes its
    batches BEFORE any exchange; an exact `left_semi` join over the
    (already tiny) survivor set removes the Bloom's false positives, so
    the shuffle ships survivors, never the fact table. Output: per
    returnflag item count + revenue over the matching lineitems."""
    from .stages.bloom import bloom_contains, bloom_params, build_bloom
    from .util import collect_arrow

    part_keys = collect_arrow(
        _pq(sf_dir, "part", ["p_partkey", "p_size"], blocks=4)
        .filter(expr="p_size > 40")
        .select_columns(["p_partkey"])
    )
    keys_np = part_keys.column("p_partkey").to_numpy(zero_copy_only=False)
    m_bits, k = bloom_params(len(keys_np))
    bloom_ref = ray.put(build_bloom(keys_np.astype(np.uint64), m_bits, k))

    ds = _pq(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_returnflag", "l_extendedprice"],
        blocks=16,
    )

    def bloom_prune(batch: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)  # zero-copy plasma read, once per task
        mask = bloom_contains(
            bits,
            batch.column("l_partkey").to_numpy(zero_copy_only=False),
            m_bits,
            k,
        )
        t = batch.filter(pa.array(mask))
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "l_returnflag": t.column("l_returnflag"),
                "price_cents": _cents(t.column("l_extendedprice")),
            }
        )

    survivors = ds.map_batches(bloom_prune, batch_format="pyarrow")
    verified = survivors.join(
        rd.from_arrow(part_keys),
        "left_semi",
        _join_partitions(),
        on=("l_partkey",),
        right_on=("p_partkey",),
    )
    agg = verified.groupby("l_returnflag").aggregate(
        Count(alias_name="n_items"), Sum("price_cents", alias_name="price_cents")
    )
    return agg.map_batches(
        lambda b: _cents_to_dollars(b, "price_cents", "revenue"),
        batch_format="pyarrow",
    )


_Q19_BRACKETS = (
    # (brand, max_size, qty_lo, qty_hi) — bracket k qualifies a lineitem
    # row iff its part matches the brand + size window AND its quantity
    # falls in the bracket's range (TPC-H Q19's OR-of-ANDs shape).
    ("Brand#12", 5, 1.0, 11.0),
    ("Brand#23", 10, 10.0, 20.0),
    ("Brand#15", 15, 20.0, 30.0),
)


def lineitem_disjunctive_join(sf_dir: str):
    """TPC-H Q19 shape — a DISJUNCTIVE multi-bracket join predicate
    (OR of per-bracket AND-conditions spanning BOTH join sides), the
    case where naive plans join everything and filter late.  Plan:
    the part side resolves each part to its bracket id (brands are
    disjoint, so ≤1 per part) and only bracket-qualified parts survive
    — a bracket-selective build side, broadcast once via ``ray.put``
    as sorted partkey/bracket arrays; the streaming lineitem scan
    computes a per-row quantity BITMASK over the brackets, looks its
    part up with one vectorized ``searchsorted``, keeps rows whose
    part-bracket bit is set in the quantity mask (the whole
    disjunction becomes one integer AND), and folds exact revenue
    cents into per-block 3-row partials; a 3-group aggregate
    finishes.  No fact-side shuffle at all."""
    from .util import collect_arrow

    pt = collect_arrow(
        _pq(sf_dir, "part", ["p_partkey", "p_brand", "p_size"], blocks=4)
    )
    brand = pt.column("p_brand")
    size = pt.column("p_size")
    bracket = np.zeros(pt.num_rows, dtype=np.int64)
    for k, (b, smax, _, _) in enumerate(_Q19_BRACKETS, start=1):
        hit = pc.and_(
            pc.equal(brand, b),
            pc.and_(pc.greater_equal(size, 1), pc.less_equal(size, smax)),
        ).to_numpy(zero_copy_only=False)
        bracket[hit] = k
    keep = bracket > 0
    pk = pt.column("p_partkey").to_numpy()[keep]
    order = np.argsort(pk, kind="stable")
    build_ref = ray.put((pk[order], bracket[keep][order]))

    li = _pq(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        blocks=16,
    )

    def probe(b: pa.Table) -> pa.Table:
        keys, brk = ray.get(build_ref)  # plasma read, once per task
        lp = b.column("l_partkey").to_numpy()
        if len(keys) == 0:
            pbr = np.zeros(len(lp), dtype=np.int64)
        else:
            pos = np.minimum(np.searchsorted(keys, lp), len(keys) - 1)
            pbr = np.where(keys[pos] == lp, brk[pos], 0)
        qty = b.column("l_quantity").to_numpy()
        qmask = np.zeros(len(lp), dtype=np.int64)
        for k, (_, _, qlo, qhi) in enumerate(_Q19_BRACKETS, start=1):
            qmask |= np.int64(1 << k) * ((qty >= qlo) & (qty <= qhi))
        sel = (pbr > 0) & ((qmask >> pbr) & 1).astype(bool)
        if not sel.any():
            return pa.table(
                {
                    "bracket": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                }
            )
        t = b.filter(pa.array(sel))
        rev = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        part = pa.table(
            {
                "bracket": pa.array(pbr[sel], pa.int64()),
                "n": pa.array(np.ones(int(sel.sum()), dtype=np.int64)),
                "cents": _cents(rev),
            }
        )
        return part.group_by("bracket").aggregate(
            [("n", "sum"), ("cents", "sum")]
        ).rename_columns(["bracket", "n", "cents"])

    agg = (
        li.map_batches(probe, batch_format="pyarrow")
        .groupby("bracket")
        .sum(["n", "cents"])
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bracket": b.column("bracket"),
                "n": b.column("sum(n)"),
                "revenue": pc.divide(
                    pc.cast(b.column("sum(cents)"), pa.float64()), 100.0
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


_PROFILE_NUM = ("l_quantity", "l_extendedprice", "l_discount")
_PROFILE_STR = ("l_returnflag", "l_linestatus")


def lineitem_profile(sf_dir: str):
    """Column profiler — the data-quality audit every ingestion
    pipeline runs before training: per column, row/null counts, EXACT
    distinct cardinality, and min/max (numeric range for measure
    columns, lexicographic for categoricals), emitted as one row per
    column.  Two streaming passes over the fact table, driver holds
    only the five final rows:

    - stats pass: ``map_batches`` reduces each block to ONE partial
      row per column (count/nulls/min/max), folded by a 5-group
      ``groupby(col)``;
    - distinct pass: block-local ``pc.unique`` per column, values
      re-keyed to strings (float bit-values normalized so ±0.0
      collapse, matching SQL value equality) and HASH-SUB-BUCKETED so
      no single group ever holds a whole column's distinct set (the
      all-distinct measure column would otherwise be a one-worker
      group at scale); per-(col, bucket) unique counts then sum per
      col."""
    from .util import collect_arrow

    cols = list(_PROFILE_NUM) + list(_PROFILE_STR)
    ds = _pq(sf_dir, "lineitem", cols, blocks=16)

    def stats_partial(b: pa.Table) -> pa.Table:
        rows = {
            "col": [], "n_rows": [], "n_null": [],
            "min_num": [], "max_num": [], "min_str": [], "max_str": [],
        }
        for c in cols:
            a = b.column(c)
            rows["col"].append(c)
            rows["n_rows"].append(b.num_rows)
            rows["n_null"].append(a.null_count)
            if c in _PROFILE_NUM:
                rows["min_num"].append(pc.min(a).as_py())
                rows["max_num"].append(pc.max(a).as_py())
                rows["min_str"].append(None)
                rows["max_str"].append(None)
            else:
                rows["min_num"].append(None)
                rows["max_num"].append(None)
                rows["min_str"].append(pc.min(a).as_py())
                rows["max_str"].append(pc.max(a).as_py())
        return pa.table(
            {
                "col": pa.array(rows["col"], pa.string()),
                "n_rows": pa.array(rows["n_rows"], pa.int64()),
                "n_null": pa.array(rows["n_null"], pa.int64()),
                "min_num": pa.array(rows["min_num"], pa.float64()),
                "max_num": pa.array(rows["max_num"], pa.float64()),
                "min_str": pa.array(rows["min_str"], pa.string()),
                "max_str": pa.array(rows["max_str"], pa.string()),
            }
        )

    def stats_fold(g: pa.Table) -> pa.Table:
        name = g.column("col")[0].as_py()
        return pa.table(
            {
                "col": pa.array([name], pa.string()),
                "n_rows": pa.array([pc.sum(g.column("n_rows")).as_py()], pa.int64()),
                "n_null": pa.array([pc.sum(g.column("n_null")).as_py()], pa.int64()),
                "min_num": pa.array([pc.min(g.column("min_num")).as_py()], pa.float64()),
                "max_num": pa.array([pc.max(g.column("max_num")).as_py()], pa.float64()),
                "min_str": pa.array([pc.min(g.column("min_str")).as_py()], pa.string()),
                "max_str": pa.array([pc.max(g.column("max_str")).as_py()], pa.string()),
            }
        )

    stats = collect_arrow(
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .groupby("col")
        .map_groups(stats_fold, batch_format="pyarrow")
    )

    def distinct_pairs(b: pa.Table) -> pa.Table:
        out_col, out_val = [], []
        for c in cols:
            u = pc.unique(pc.drop_null(b.column(c)))
            if c in _PROFILE_NUM:
                v = u.to_numpy(zero_copy_only=False)
                v = np.where(v == 0, 0.0, v)  # ±0.0 → one SQL value
                vals = np.unique(v).astype(str)
            else:
                vals = u.to_numpy(zero_copy_only=False).astype(str)
            out_col.extend([c] * len(vals))
            out_val.extend(vals.tolist())
        t = pa.table(
            {"col": pa.array(out_col, pa.string()), "val": pa.array(out_val, pa.string())}
        )
        bucket = (_fnv64_strings(t.column("val")) % np.uint64(64)).astype(np.int64)
        return t.append_column("bucket", pa.array(bucket, pa.int64()))

    def bucket_distinct(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "col": pa.array([g.column("col")[0].as_py()], pa.string()),
                "nd": pa.array([len(pc.unique(g.column("val")))], pa.int64()),
            }
        )

    nd = collect_arrow(
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby(["col", "bucket"])
        .map_groups(bucket_distinct, batch_format="pyarrow")
        .groupby("col")
        .sum("nd")
    )
    nd_map = dict(zip(nd.column("col").to_pylist(), nd.column("sum(nd)").to_pylist()))
    order = pc.sort_indices(stats.column("col"))
    stats = stats.take(order)
    return stats.add_column(
        3,
        "n_distinct",
        pa.array([nd_map[c] for c in stats.column("col").to_pylist()], pa.int64()),
    )


def customer_order_histogram(sf_dir: str):
    """TPC-H Q13 shape — LEFT OUTER join + count DISTRIBUTION: how many
    customers placed 0, 1, 2, … qualifying orders, where the qualifier
    (non-urgent priority) lives in the JOIN predicate, so customers
    whose every order is filtered out still appear in the 0 bucket.
    The classic plan trap is materializing the outer join; here the
    fact side never joins at all: block-local per-custkey counts →
    one groupby(custkey) sum (at most one row per customer leaves the
    exchange) → the count-of-counts histogram is a second, tiny
    groupby.  The 0 bucket is arithmetic — total customers (metadata
    count of the dimension) minus customers seen in the aggregate —
    never a join.

    Size-gated dense plan (BASELINE.md): the block-local per-custkey
    partials are customer-grain, so below the gate the driver folds
    them with one Arrow group_by + np.unique histogram instead of two
    exchanges; above the gate the plan below runs unchanged."""
    from .util import collect_arrow

    orders = _pq(sf_dir, "orders", ["o_custkey", "o_orderpriority"], blocks=8)

    def local_cnt(b: pa.Table) -> pa.Table:
        t = b.filter(pc.not_equal(b.column("o_orderpriority"), "1-URGENT"))
        g = t.select(["o_custkey"]).group_by("o_custkey").aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["o_custkey", "n"])

    if orders.count() <= 2 * _BCAST_KEYS_GATE:
        parts = collect_arrow(
            orders.map_batches(local_cnt, batch_format="pyarrow"),
            schema=pa.schema([("o_custkey", pa.int64()), ("n", pa.int64())]),
        )
        per = (
            parts.group_by("o_custkey")
            .aggregate([("n", "sum")])
            .rename_columns(["o_custkey", "n"])
        )
        counts = per.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        uq, uc = np.unique(counts, return_counts=True)
        n_zero = _pq(sf_dir, "customer", ["c_custkey"]).count() - per.num_rows
        if n_zero > 0:
            uq = np.r_[np.int64(0), uq]
            uc = np.r_[np.int64(n_zero), uc]
        return pa.table(
            {
                "c_count": pa.array(uq.astype(np.int64)),
                "custdist": pa.array(uc.astype(np.int64)),
            }
        )

    per_cust = (
        _sorted_agg_by_key(
            orders.map_batches(local_cnt, batch_format="pyarrow"),
            "o_custkey",
            [("n", "sum", "sum(n)")],
        )
        .materialize()  # ≤ one row per customer, object-store resident;
        # lets the 0-bucket count reuse this shuffle instead of re-running it
    )
    n_with_orders = per_cust.count()
    n_customers = _pq(sf_dir, "customer", ["c_custkey"]).count()

    def to_bucket(b: pa.Table) -> pa.Table:
        return pa.table({"c_count": pc.cast(b.column("sum(n)"), pa.int64())})

    hist = per_cust.map_batches(to_bucket, batch_format="pyarrow").groupby(
        "c_count"
    ).count()

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_count": b.column("c_count"),
                "custdist": pc.cast(b.column("count()"), pa.int64()),
            }
        )

    out = hist.map_batches(finish, batch_format="pyarrow")
    n_zero = n_customers - n_with_orders
    if n_zero == 0:  # SQL emits no 0 bucket when every customer qualifies
        return out
    zero = rd.from_arrow(
        pa.table(
            {
                "c_count": pa.array([0], pa.int64()),
                "custdist": pa.array([n_zero], pa.int64()),
            }
        )
    )
    return out.union(zero)


_IDLE_CUTOFF = "2001-01-01"


def customer_above_avg_idle(sf_dir: str):
    """TPC-H Q22 shape — a GLOBAL scalar aggregate gating an anti-join:
    customers whose balance exceeds the positive-balance average AND
    who placed no order since a cutoff date, summarized per nation.
    Composition: (1) the average is one exact-cents scalar reduction
    (sum+count partials; the division happens once, identically to the
    SQL, so the float threshold is bit-identical); (2) the balance
    filter runs BEFORE the anti-join, so only above-average customers
    enter the exchange; (3) the anti side is the distinct custkeys of
    recent orders — block-local dedup shrinks it before the
    ``left_anti`` hash join; (4) a nation-keyed groupby folds exact
    cents.  No driver-side row ever exceeds one partial per block."""
    from .util import drop_empty_blocks

    cust = _pq(
        sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"], blocks=8
    )

    def avg_partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater(b.column("c_acctbal"), 0.0))
        return pa.table(
            {
                "cents": pa.array(
                    [pc.sum(_cents(t.column("c_acctbal"))).as_py() or 0], pa.int64()
                ),
                "n": pa.array([t.num_rows], pa.int64()),
            }
        )

    from .util import collect_arrow

    parts = collect_arrow(cust.map_batches(avg_partial, batch_format="pyarrow"))
    total_cents = pc.sum(parts.column("cents")).as_py()
    total_n = pc.sum(parts.column("n")).as_py()
    # one division, mirrored exactly in the oracle: cents::DOUBLE/100.0/n
    avg_bal = total_cents / 100.0 / total_n

    cutoff = np.datetime64(_IDLE_CUTOFF + "T00:00:00", "us").astype(np.int64)

    def recent_keys(b: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(b.column("o_orderdate"), pa.timestamp("us")), pa.int64())
        t = b.filter(pc.greater_equal(ts, cutoff))
        return t.select(["o_custkey"]).group_by("o_custkey").aggregate([])

    recent = drop_empty_blocks(
        _pq(sf_dir, "orders", ["o_custkey", "o_orderdate"], blocks=8).map_batches(
            recent_keys, batch_format="pyarrow"
        )
    )

    rich = cust.map_batches(
        lambda b: b.filter(pc.greater(b.column("c_acctbal"), avg_bal)),
        batch_format="pyarrow",
    )
    idle = rich.join(
        recent, "left_anti", _join_partitions(), on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def nation_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c_nationkey": b.column("c_nationkey"),
                "numcust": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                "cents": _cents(b.column("c_acctbal")),
            }
        )
        return t.group_by("c_nationkey").aggregate(
            [("numcust", "sum"), ("cents", "sum")]
        ).rename_columns(["c_nationkey", "numcust", "cents"])

    agg = (
        idle.map_batches(nation_partial, batch_format="pyarrow")
        .groupby("c_nationkey")
        .sum(["numcust", "cents"])
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                # the hash exchange upcasts the int32 key; restore it
                "c_nationkey": pc.cast(b.column("c_nationkey"), pa.int32()),
                "numcust": b.column("sum(numcust)"),
                "totacctbal": pc.divide(
                    pc.cast(b.column("sum(cents)"), pa.float64()), 100.0
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def events_flipflop(sf_dir: str):
    """LAG-based change detection — per user, how often the event type
    FLIPS between consecutive events in time order (the behavioral
    volatility / alternation metric; also the shape of status-change
    counting over any change-data stream).  r5: ONE global
    (user, ts, event_id) sort + an across-user kernel via
    util.sorted_group_apply — dictionary-encode once per block, one
    shifted comparison masked at user-run boundaries, one reduceat —
    no per-user Python dispatch."""
    from .util import sorted_group_apply

    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"], blocks=16)

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "n_changes": pa.array([], pa.int64()),
                }
            )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        codes = pc.dictionary_encode(
            t.column("event_type").combine_chunks()
        ).indices.to_numpy(zero_copy_only=False)
        same_user = uid[1:] == uid[:-1]
        chg = np.r_[
            np.zeros(1, np.int64),
            ((codes[1:] != codes[:-1]) & same_user).astype(np.int64),
        ]
        starts = np.flatnonzero(np.r_[True, ~same_user])
        runlens = np.diff(np.r_[starts, uid.size])
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "n_events": pa.array(runlens.astype(np.int64), pa.int64()),
                "n_changes": pa.array(np.add.reduceat(chg, starts), pa.int64()),
            }
        )

    return sorted_group_apply(ds, "user_id", ["ts", "event_id"], kernel)


def events_scd2(sf_dir: str):
    """Change-log → SCD-2 validity intervals: compress each user's
    event-type stream into runs, each with ``[valid_from, valid_to)``
    where valid_to is the NEXT run's start (NULL while current) — the
    snapshot-reconstruction shape every CDC/warehouse pipeline needs.
    r5: ONE global (user, ts, event_id) sort + an across-user kernel
    via util.sorted_group_apply: a segment starts at every type change
    OR user change, the NEXT segment's start is valid_to only when it
    belongs to the same user (each user's live segment keeps NULL) —
    pure index arithmetic, no per-user Python dispatch."""
    from .util import sorted_group_apply

    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"], blocks=16)

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                    "valid_from": pa.array([], pa.timestamp("us")),
                    "valid_to": pa.array([], pa.timestamp("us")),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()).to_numpy()
        etype = t.column("event_type").combine_chunks()
        codes = pc.dictionary_encode(etype).indices.to_numpy(zero_copy_only=False)
        chg = np.r_[
            True, (codes[1:] != codes[:-1]) | (uid[1:] != uid[:-1])
        ]
        idx = np.flatnonzero(chg)
        seg_len = np.diff(np.r_[idx, uid.size]).astype(np.int64)
        seg_user = uid[idx]
        valid_from = ts[idx]
        live = np.r_[seg_user[1:] != seg_user[:-1], True]  # last seg per user
        valid_to = pa.array(
            np.r_[valid_from[1:], 0], pa.int64(), mask=live
        )
        return pa.table(
            {
                "user_id": pa.array(seg_user, pa.int64()),
                "event_type": etype.take(pa.array(idx, pa.int64())),
                "valid_from": pa.array(valid_from).cast(pa.timestamp("us")),
                "valid_to": valid_to.cast(pa.timestamp("us")),
                "n_events": pa.array(seg_len),
            }
        )

    return sorted_group_apply(ds, "user_id", ["ts", "event_id"], kernel)


_BLAME_CUTOFF = "2001-06-01"


def supplier_blame(sf_dir: str, dense_row_limit: int = 8_000_000):
    """TPC-H Q21 shape — the multi-predicate EXISTS / NOT-EXISTS
    self-join: suppliers who were the ONLY late shipper on a
    multi-supplier order.  The two correlated subqueries never run:
    block-local (orderkey, suppkey, max-late) dedup shrinks the
    exchange to distinct pairs, then ONE groupby(orderkey) evaluates
    both quantifiers together inside the group (n distinct suppliers
    > 1 ∧ exactly one late supplier), emitting at most one blame row
    per order.  The late-supplier identity needs no join-back either:
    after the pair dedup each order has at most one late supplier in
    the blame set, so Σ(late·suppkey) IS that suppkey whenever
    Σlate = 1 — both quantifiers and the culprit fall out of ONE
    Arrow-native groupby(orderkey) with three integer sums (no
    per-group Python).  A supplier-keyed count and a broadcast 100-row
    name lookup finish.

    Size-gated dense plan (BASELINE.md): below the gate the distinct
    (orderkey, suppkey, late) pair partials — already block-deduped,
    ~|orders|·suppliers-per-order rows — fold driver-side with one
    Arrow group_by + a reduceat sweep; above it ONE global (ok, sk)
    sort makes every pair duplicate and order run contiguous, each
    block runs the same vectorized kernel on its interior orders, and
    the ≤2 boundary orders per block patch on the driver."""
    from .util import collect_arrow

    cutoff = np.datetime64(_BLAME_CUTOFF + "T00:00:00", "us").astype(np.int64)
    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"], blocks=16)

    def pair_partial(b: pa.Table) -> pa.Table:
        ship = pc.cast(pc.cast(b.column("l_shipdate"), pa.timestamp("us")), pa.int64())
        t = pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "l_suppkey": b.column("l_suppkey"),
                "late": pc.cast(pc.greater_equal(ship, cutoff), pa.int64()),
            }
        )
        return t.group_by(["l_orderkey", "l_suppkey"]).aggregate(
            [("late", "max")]
        ).rename_columns(["l_orderkey", "l_suppkey", "late"])

    pair_ds = li.map_batches(pair_partial, batch_format="pyarrow")

    if li.count() <= dense_row_limit:
        pairs = collect_arrow(
            pair_ds,
            schema=pa.schema(
                [
                    ("l_orderkey", pa.int64()),
                    ("l_suppkey", pa.int64()),
                    ("late", pa.int64()),
                ]
            ),
        )
        pairs = (
            pairs.group_by(["l_orderkey", "l_suppkey"])
            .aggregate([("late", "max")])
            .rename_columns(["l_orderkey", "l_suppkey", "late"])
        )
        ok = pairs.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        sk = pairs.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        lt = pairs.column("late").to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(ok, kind="stable")
        ok, sk, lt = ok[o], sk[o], lt[o]
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        n_supp = np.diff(np.r_[starts, ok.size])
        late_sum = np.add.reduceat(lt, starts) if ok.size else np.array([], np.int64)
        lsk_sum = (
            np.add.reduceat(lt * sk, starts) if ok.size else np.array([], np.int64)
        )
        blame_sk = lsk_sum[(n_supp > 1) & (late_sum == 1)]
        supp_ids, numwait = np.unique(blame_sk, return_counts=True)
        blamed_tbl = pa.table(
            {
                "l_suppkey": pa.array(supp_ids, pa.int64()),
                "count()": pa.array(numwait, pa.int64()),
            }
        )
        blamed = rd.from_arrow(blamed_tbl)
    else:
        # ONE exchange: a global (orderkey, suppkey) SORT. Ray's
        # groupby-aggregate walks groups in Python — ~600k pair groups
        # cost ~5.5 s at sf0.1 where the raw sort shuffle is ~0.65 s
        # (measured, BASELINE.md r4) — so the previous two-groupby plan
        # grew proportionally with the group count. After the sort every
        # (ok, sk) duplicate and every order run is CONTIGUOUS: each
        # block evaluates its interior orders fully vectorized
        # (consecutive-pair dedup + reduceat, the dense-path kernel) and
        # only the ≤2 BOUNDARY orders per block ship raw rows for an
        # identical driver-side patch. Partials leaving a block are
        # supplier-grain blame counts + boundary rows — both tiny.
        sorted_pairs = pair_ds.sort(["l_orderkey", "l_suppkey"])

        def census(b: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "kind": pa.array([], pa.int8()),
                    "k1": pa.array([], pa.int64()),
                    "k2": pa.array([], pa.int64()),
                    "k3": pa.array([], pa.int64()),
                }
            )
            if b.num_rows == 0:
                return empty
            ok = b.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
            sk = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
            lt = b.column("late").to_numpy(zero_copy_only=False).astype(np.int64)
            # an order straddling a block boundary is edge in BOTH blocks
            # (within one block an ok run is either wholly edge or wholly
            # interior), so the driver patch sees all of its rows
            edge = (ok == ok[0]) | (ok == ok[-1])
            e_ok, e_sk, e_lt = ok[edge], sk[edge], lt[edge]
            ok, sk, lt = ok[~edge], sk[~edge], lt[~edge]
            out_sk = np.array([], np.int64)
            out_n = np.array([], np.int64)
            if ok.size:
                # sorted ⇒ (ok, sk) duplicates are adjacent: dedup with
                # late-max, then order-run quantifiers via reduceat
                new = np.r_[True, (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])]
                starts = np.flatnonzero(new)
                lt = np.maximum.reduceat(lt, starts)
                ok, sk = ok[starts], sk[starts]
                o_st = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
                n_supp = np.diff(np.r_[o_st, ok.size])
                late_sum = np.add.reduceat(lt, o_st)
                lsk_sum = np.add.reduceat(lt * sk, o_st)
                blame_sk = lsk_sum[(n_supp > 1) & (late_sum == 1)]
                out_sk, out_n = np.unique(blame_sk, return_counts=True)
            return pa.table(
                {
                    "kind": pa.array(
                        np.r_[np.zeros(e_ok.size, np.int8), np.ones(out_sk.size, np.int8)]
                    ),
                    "k1": pa.array(np.r_[e_ok, out_sk], pa.int64()),
                    "k2": pa.array(np.r_[e_sk, out_n], pa.int64()),
                    "k3": pa.array(
                        np.r_[e_lt, np.zeros(out_sk.size, np.int64)], pa.int64()
                    ),
                }
            )

        parts = collect_arrow(
            sorted_pairs.map_batches(census, batch_format="pyarrow"),
            schema=pa.schema(
                [
                    ("kind", pa.int8()),
                    ("k1", pa.int64()),
                    ("k2", pa.int64()),
                    ("k3", pa.int64()),
                ]
            ),
        )
        kind = parts.column("kind").to_numpy()
        k1 = parts.column("k1").to_numpy()
        k2 = parts.column("k2").to_numpy()
        k3 = parts.column("k3").to_numpy()
        # boundary patch: identical dense-path kernel on the edge rows
        e_ok, e_sk, e_lt = k1[kind == 0], k2[kind == 0], k3[kind == 0]
        b_sk = np.array([], np.int64)
        b_n = np.array([], np.int64)
        if e_ok.size:
            o = np.lexsort((e_sk, e_ok))
            eo, es, el = e_ok[o], e_sk[o], e_lt[o]
            new = np.r_[True, (eo[1:] != eo[:-1]) | (es[1:] != es[:-1])]
            starts = np.flatnonzero(new)
            el = np.maximum.reduceat(el, starts)
            eo, es = eo[starts], es[starts]
            o_st = np.flatnonzero(np.r_[True, eo[1:] != eo[:-1]])
            n_supp = np.diff(np.r_[o_st, eo.size])
            late_sum = np.add.reduceat(el, o_st)
            lsk_sum = np.add.reduceat(el * es, o_st)
            b_sk, b_n = np.unique(
                lsk_sum[(n_supp > 1) & (late_sum == 1)], return_counts=True
            )
        fold = (
            pa.table(
                {
                    "l_suppkey": pa.array(np.r_[k1[kind == 1], b_sk], pa.int64()),
                    "n": pa.array(np.r_[k2[kind == 1], b_n], pa.int64()),
                }
            )
            .group_by("l_suppkey")
            .aggregate([("n", "sum")])
        )
        blamed = rd.from_arrow(
            pa.table(
                {
                    "l_suppkey": fold.column("l_suppkey"),
                    "count()": fold.column("n_sum"),
                }
            )
        )

    names = collect_arrow(_pq(sf_dir, "supplier", ["s_suppkey", "s_name"]))
    order = pc.sort_indices(names.column("s_suppkey"))
    name_ref = ray.put(
        (
            names.column("s_suppkey").take(order).to_numpy(),
            names.column("s_name").take(order).to_pylist(),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        keys, nm = ray.get(name_ref)
        sk = b.column("l_suppkey").to_numpy()
        pos = np.searchsorted(keys, sk)
        return pa.table(
            {
                "s_suppkey": b.column("l_suppkey"),
                "s_name": pa.array([nm[p] for p in pos], pa.string()),
                "numwait": pc.cast(b.column("count()"), pa.int64()),
            }
        )

    return blamed.map_batches(finish, batch_format="pyarrow")


@ray.remote
def _ks_block_meta(block: pa.Table):
    v = block.column("v").to_numpy()
    s1 = block.column("s1").to_numpy()
    return int(s1.sum()), int(len(s1) - s1.sum()), int(v[0]), int(v[-1])


@ray.remote
def _ks_block_best(block: pa.Table, carry1: int, carry2: int, n1: int, n2: int,
                   skip_last: bool):
    v = block.column("v").to_numpy()
    s1 = block.column("s1").to_numpy()
    cum1 = np.cumsum(s1) + carry1
    cum2 = np.cumsum(1 - s1) + carry2
    ends = np.flatnonzero(v[1:] != v[:-1])
    if not skip_last:
        ends = np.append(ends, len(v) - 1)
    if len(ends) == 0:
        return None
    # identical float expression to the oracle: DOUBLE(c)/n per side
    d = np.abs(cum1[ends] / n1 - cum2[ends] / n2)
    i = int(np.argmax(d))  # first max = smallest value (v ascending)
    return float(d[i]), int(v[ends[i]])


def orders_ks_drift(sf_dir: str):
    """EXACT two-sample Kolmogorov–Smirnov statistic — the
    distribution-drift gate (train vs holdout, yesterday vs today)
    computed without approximation: D = sup_x |F₁(x) − F₂(x)| over
    open-order vs closed-order price distributions.  One range sort
    on exact cents, then the driver holds FOUR scalars per block
    (side counts + boundary values): an exclusive prefix-count
    carry-in turns each block's cumsum into the global CDFs, each
    block reports its local (max D, argmin value), and the driver
    folds block bests.  Value runs spanning blocks are evaluated only
    at their true end (the carry logic skips a block's final run when
    the next block continues it).  Ties in D resolve to the smallest
    value on both sides, so the single output row is bit-exact vs the
    SQL window oracle."""
    ds = _pq(sf_dir, "orders", ["o_totalprice", "o_orderstatus"], blocks=16)

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": _cents(b.column("o_totalprice")),
                "s1": pc.cast(
                    pc.equal(b.column("o_orderstatus"), "O"), pa.int64()
                ),
            }
        )

    mat = ds.map_batches(prep, batch_format="pyarrow").sort("v").materialize()
    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
    metas = ray.get([_ks_block_meta.remote(r) for r in refs])
    n1 = sum(m[0] for m in metas)
    n2 = sum(m[1] for m in metas)
    tasks, c1, c2 = [], 0, 0
    for k, (ref, (b1, b2, _first, last)) in enumerate(zip(refs, metas)):
        skip = k + 1 < len(metas) and metas[k + 1][2] == last
        tasks.append(_ks_block_best.remote(ref, c1, c2, n1, n2, skip))
        c1 += b1
        c2 += b2
    best = (-1.0, 0)
    for r in ray.get(tasks):
        if r is not None and (r[0] > best[0] or (r[0] == best[0] and r[1] < best[1])):
            best = r
    return pa.table(
        {
            "d_stat": pa.array([best[0]], pa.float64()),
            "at_value": pa.array([best[1] / 100.0], pa.float64()),
            "n1": pa.array([n1], pa.int64()),
            "n2": pa.array([n2], pa.int64()),
        }
    )


_SPAN_K = 8  # tokens per shingle in the duplication census


def docs_dup_span_census(sf_dir: str):
    """Exact substring-duplication census (the span-level statistic
    behind suffix-array training-data dedup, Lee et al. 2022,
    arXiv:2107.06499): per document, how many of its DISTINCT
    token-8-grams also occur in at least one OTHER document — the
    per-doc duplicated-span exposure that decides trim-vs-drop.
    Gram construction is fully vectorized: one Arrow whitespace
    split per block, k shifted ``take``s off the flattened token
    buffer joined element-wise — no Python loop touches a token.
    A doc lives in one row, so block-distinct (doc, gram) pairs are
    GLOBALLY distinct: gram document-frequency is a block-partial
    count + one groupby(gram) sum (never a set union), and dup
    exposure is one inner join of the pairs against the df≥2 grams
    followed by a doc-keyed count.  At open-web scale the join key
    would be ``fingerprint64(gram)`` instead of the gram string
    (documented seam — exactness here is what the oracle checks)."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)
    K = _SPAN_K

    def gram_parts(b: pa.Table):
        toks = pc.split_pattern(b.column("text"), " ").combine_chunks()
        offs = np.asarray(toks.offsets)
        flat = toks.values
        n_gr = np.maximum(np.diff(offs) - (K - 1), 0)
        doc_ids = b.column("doc_id").to_numpy()
        total = int(n_gr.sum())
        if total == 0:
            return doc_ids, n_gr, None, None
        base = np.repeat(offs[:-1].astype(np.int64), n_gr)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(n_gr)[:-1])), n_gr
        )
        starts = base + within
        cols = [flat.take(pa.array(starts + j)) for j in range(K)]
        gram = pc.binary_join_element_wise(*cols, " ")
        return doc_ids, n_gr, np.repeat(doc_ids, n_gr), gram

    def totals(b: pa.Table) -> pa.Table:
        doc_ids, n_gr, pair_doc, gram = gram_parts(b)
        keep = n_gr > 0
        if gram is None:
            nd = np.zeros(0, dtype=np.int64)
            docs = doc_ids[keep]
        else:
            t = pa.table({"doc_id": pa.array(pair_doc), "gram": gram})
            d = t.group_by("doc_id").aggregate([("gram", "count_distinct")])
            dd = dict(
                zip(d.column("doc_id").to_pylist(),
                    d.column("gram_count_distinct").to_pylist())
            )
            docs = doc_ids[keep]
            nd = np.array([dd[i] for i in docs], dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(docs, pa.int64()),
                "n_kgrams": pa.array(n_gr[keep].astype(np.int64)),
                "n_distinct": pa.array(nd),
            }
        )

    def pairs(b: pa.Table) -> pa.Table:
        _, _, pair_doc, gram = gram_parts(b)
        if gram is None:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "gram": pa.array([], pa.string())}
            )
        t = pa.table({"doc_id": pa.array(pair_doc), "gram": gram})
        return t.group_by(["doc_id", "gram"]).aggregate([])

    from .util import collect_arrow, drop_empty_blocks

    # the pair set feeds BOTH the DF aggregate and the dup join — one
    # materialization (object-store resident, spillable) instead of two
    # full gram-construction passes
    pair_ds = ds.map_batches(pairs, batch_format="pyarrow").materialize()

    # below the gate the three string-keyed exchanges (gram groupby,
    # gram join, doc left_outer) cost ~5 s of fixed shuffle overhead on
    # a corpus whose whole distinct-pair table is a few hundred k rows
    # — the basket/kcore dense-path gate applies: fold pairs once on
    # the driver with Arrow kernels, identical algebra. Above it, the
    # distributed plan below runs unchanged.
    if pair_ds.count() <= 4_000_000:
        pt = collect_arrow(
            pair_ds,
            schema=pa.schema([("doc_id", pa.int64()), ("gram", pa.string())]),
        )
        dfc = pt.group_by("gram").aggregate([([], "count_all")])
        dup_grams = dfc.filter(
            pc.greater_equal(dfc.column("count_all"), 2)
        ).column("gram")
        hit = pt.filter(
            pc.is_in(pt.column("gram"), value_set=dup_grams.combine_chunks())
        )
        dupc = hit.group_by("doc_id").aggregate([([], "count_all")])
        dk = dupc.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        dv = dupc.column("count_all").to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(dk)
        dup_ref = ray.put((dk[o], dv[o]))

        def finish_dense(b: pa.Table) -> pa.Table:
            kk, vv = ray.get(dup_ref)
            ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(kk, ids)
            pos_c = np.minimum(pos, max(len(kk) - 1, 0))
            nd = np.where(
                (len(kk) > 0) & (kk[pos_c] == ids), vv[pos_c], 0
            ).astype(np.int64)
            return pa.table(
                {
                    "doc_id": b.column("doc_id"),
                    "n_kgrams": b.column("n_kgrams"),
                    "n_distinct": b.column("n_distinct"),
                    "n_dup": pa.array(nd),
                }
            )

        return ds.map_batches(totals, batch_format="pyarrow").map_batches(
            finish_dense, batch_format="pyarrow"
        )

    def df_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("gram").aggregate([([], "count_all")])
        return g.rename_columns(["gram", "nd"])

    df = drop_empty_blocks(
        _sorted_agg_by_key(
            pair_ds.map_batches(df_partial, batch_format="pyarrow"),
            "gram",
            [("nd", "sum", "nd")],
        ).map_batches(
            lambda b: b.filter(pc.greater_equal(b.column("nd"), 2)),
            batch_format="pyarrow",
        )
    )

    dup = _sorted_agg_by_key(
        drop_empty_blocks(pair_ds)
        .join(df, "inner", _join_partitions(), on=("gram",))
        .map_batches(
            lambda b: b.select(["doc_id"])
            .group_by("doc_id")
            .aggregate([([], "count_all")])
            .rename_columns(["doc_id", "n_dup"]),
            batch_format="pyarrow",
        ),
        "doc_id",
        [("n_dup", "sum", "sum(n_dup)")],
    )

    tot = ds.map_batches(totals, batch_format="pyarrow")
    out = tot.join(
        drop_empty_blocks(dup), "left_outer", _join_partitions(), on=("doc_id",)
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_kgrams": b.column("n_kgrams"),
                "n_distinct": b.column("n_distinct"),
                "n_dup": pc.fill_null(b.column("sum(n_dup)"), 0),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def docs_dedup_spans(sf_dir: str, dense_gate: int = 4_000_000):
    """Exact duplicated-span REMOVAL — the APPLY counterpart of
    docs_dup_span_census (ExactSubstr dedup, Lee et al. 2022,
    arXiv:2107.06499): every token covered by a K-gram whose total
    occurrence count across the corpus is ≥2 (multiset — within-doc
    repeats count, faithful to ExactSubstr) is cut; survivors are
    re-joined in original order. Output: (doc_id, dedup_text,
    n_tokens, n_removed) for EVERY document (a fully-duplicated doc
    keeps an empty string).

    Shape: pass 1 streams gram-count partials (block groupby →
    one global groupby(gram) sum → ≥2 filter). Below ``dense_gate``
    dup grams, the set broadcasts once (``ray.put``) and pass 2 is
    ZERO-exchange: per block, grams rebuilt vectorized (K shifted
    takes off the flat token buffer, as the census does), one
    ``pc.is_in`` mask, coverage by a ±1 difference array cumsummed
    over the flat token axis, reassembly as one
    ``ListArray.from_arrays`` + ``pc.binary_join`` — no Python loop
    touches a token. Above the gate (open-web spans), the same
    algebra runs distributed: occurrence rows join the dup-gram table
    on gram, hit starts co-locate per doc via groupby(doc_id), and a
    doc-keyed left join feeds the identical rewrite kernel (path
    equality pinned by a dense_gate=0 test)."""
    from .util import collect_arrow, drop_empty_blocks

    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)
    K = _SPAN_K

    def occ_rows(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ").combine_chunks()
        offs = np.asarray(toks.offsets).astype(np.int64)
        flat = toks.values
        n_gr = np.maximum(np.diff(offs) - (K - 1), 0)
        total = int(n_gr.sum())
        if total == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "start": pa.array([], pa.int64()),
                 "gram": pa.array([], pa.string())}
            )
        base = np.repeat(offs[:-1], n_gr)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(n_gr)[:-1])), n_gr
        )
        starts = base + within
        cols = [flat.take(pa.array(starts + j)) for j in range(K)]
        gram = pc.binary_join_element_wise(*cols, " ")
        return pa.table(
            {
                "doc_id": pa.array(
                    np.repeat(b.column("doc_id").to_numpy(), n_gr), pa.int64()
                ),
                "start": pa.array(within, pa.int64()),
                "gram": gram,
            }
        )

    def _rewrite(b: pa.Table, row_idx: np.ndarray, loc: np.ndarray) -> pa.Table:
        """Shared rewrite kernel: hit i is a dup gram starting at
        0-based token ``loc[i]`` of block row ``row_idx[i]`` — flat
        arrays, so no Python loop touches a row or a token."""
        toks = pc.split_pattern(b.column("text"), " ").combine_chunks()
        offs = np.asarray(toks.offsets).astype(np.int64)
        flat = toks.values
        n_tok = np.diff(offs)
        total_tok = int(n_tok.sum())
        d = np.zeros(total_tok + 1, dtype=np.int32)
        if len(loc):
            s = loc.astype(np.int64) + (offs[row_idx] - offs[0])
            np.add.at(d, s, 1)
            np.add.at(d, s + K, -1)
        covered = np.cumsum(d[:-1]) > 0
        kept = ~covered
        kp = np.concatenate(([0], np.cumsum(kept)))
        cp = np.concatenate(([0], np.cumsum(covered)))
        cuts = offs - offs[0]
        kept_vals = flat.take(pa.array(np.nonzero(kept)[0] + offs[0]))
        lists = pa.ListArray.from_arrays(
            pa.array(kp[cuts], pa.int32()), kept_vals
        )
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "dedup_text": pc.binary_join(lists, " "),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_removed": pa.array(
                    cp[cuts][1:] - cp[cuts][:-1], pa.int64()
                ),
            }
        )

    occ = ds.map_batches(occ_rows, batch_format="pyarrow").materialize()

    def df_partial(b: pa.Table) -> pa.Table:
        g = b.select(["gram"]).group_by("gram").aggregate([([], "count_all")])
        return g.rename_columns(["gram", "n"])

    # gram-proportional count via the sort-kernel (a groupby().sum()
    # here walks every distinct gram in Python — the r4 lesson)
    dupg = drop_empty_blocks(
        _sorted_sum_by_key(
            occ.map_batches(df_partial, batch_format="pyarrow"), "gram", "n", "n"
        ).map_batches(
            lambda b: pa.table({"gram": b.column("gram")}).filter(
                pc.greater_equal(b.column("n"), 2)
            ),
            batch_format="pyarrow",
        )
    ).materialize()

    if dupg.count() <= dense_gate:
        dup_ref = ray.put(
            collect_arrow(dupg, schema=pa.schema([("gram", pa.string())]))
            .column("gram")
            .combine_chunks()
        )

        def rewrite_dense(b: pa.Table) -> pa.Table:
            dup_set = ray.get(dup_ref)
            o = occ_rows(b)
            row_idx = np.zeros(0, dtype=np.int64)
            hs = np.zeros(0, dtype=np.int64)
            if o.num_rows and len(dup_set):
                hit = o.filter(pc.is_in(o.column("gram"), value_set=dup_set))
                ids = b.column("doc_id").to_numpy(zero_copy_only=False)
                order = np.argsort(ids, kind="stable")
                hd = hit.column("doc_id").to_numpy(zero_copy_only=False)
                hs = hit.column("start").to_numpy(zero_copy_only=False)
                row_idx = order[np.searchsorted(ids[order], hd)]
            return _rewrite(b, row_idx, hs)

        return ds.map_batches(rewrite_dense, batch_format="pyarrow")

    hits = drop_empty_blocks(occ).join(
        dupg, "inner", _join_partitions(), on=("gram",)
    )

    def starts_all(t: pa.Table) -> pa.Table:
        # r5 across-doc serialization on the (doc, start) sort — one
        # ListArray + binary_join per block, no per-doc Python.
        # comma-joined string, not list<int64>: Acero hash joins reject
        # list-typed payload columns, strings ride through fine
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "starts": pa.array([], pa.string()),
                }
            )
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        n = did.size
        run_starts = np.flatnonzero(np.r_[True, did[1:] != did[:-1]])
        strs = pc.cast(t.column("start").combine_chunks(), pa.string())
        la = pa.LargeListArray.from_arrays(
            pa.array(np.r_[run_starts, n], pa.int64()), strs
        )
        return pa.table(
            {
                "doc_id": pa.array(did[run_starts], pa.int64()),
                "starts": pc.cast(pc.binary_join(la, ","), pa.string()),
            }
        )

    from .util import sorted_group_apply

    starts_tbl = sorted_group_apply(
        hits.select_columns(["doc_id", "start"]), "doc_id", ["start"], starts_all
    )
    joined = ds.join(
        drop_empty_blocks(starts_tbl),
        "left_outer",
        _join_partitions(),
        on=("doc_id",),
    )

    def rewrite_joined(b: pa.Table) -> pa.Table:
        lists = pc.split_pattern(b.column("starts").combine_chunks(), ",")
        counts = pc.fill_null(pc.list_value_length(lists), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        loc = pc.cast(pc.list_flatten(lists), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        row_idx = np.repeat(np.arange(b.num_rows, dtype=np.int64), counts)
        return _rewrite(b.select(["doc_id", "text"]), row_idx, loc)

    return joined.map_batches(rewrite_joined, batch_format="pyarrow")


def part_value_concentration(sf_dir: str):
    """TPC-H Q11 shape — groups whose share of a GLOBAL total exceeds a
    scale-free threshold (inventory-value concentration; the same
    scalar-gated HAVING every 'which keys dominate' audit runs).  Q11's
    fixed fraction carries SF in the spec; the scale-free form used
    here keeps parts holding > 1.2× the AVERAGE per-part share.  The
    global total and the per-part totals come out of ONE pass:
    block-local (partkey, cents) partials feed the groupby, and the
    global total is the sum of the same partials' block sums (driver
    holds one int64 per block), so the fact table is read once.  The
    gate is exact-integer cross-multiplication — keep part p iff
    cents_p · n_parts · 10 > total · 12 — no float compare, mirrored
    in SQL (DuckDB evaluates it in HUGEINT; at true 100 TB scale the
    Arrow side would promote the products to decimal128 the same
    way)."""
    from .util import collect_arrow

    li = _pq(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"], blocks=16)

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_partkey": b.column("l_partkey"),
                "cents": _cents(b.column("l_extendedprice")),
            }
        )
        return t.group_by("l_partkey").aggregate([("cents", "sum")]).rename_columns(
            ["l_partkey", "cents"]
        )

    partials = li.map_batches(partial, batch_format="pyarrow").materialize()
    block_sums = collect_arrow(
        partials.map_batches(
            lambda b: pa.table(
                {"s": pa.array([pc.sum(b.column("cents")).as_py() or 0], pa.int64())}
            ),
            batch_format="pyarrow",
        )
    )
    total = pc.sum(block_sums.column("s")).as_py()

    agg = _sorted_agg_by_key(
        partials, "l_partkey", [("cents", "sum", "sum(cents)")]
    ).materialize()
    n_parts = agg.count()

    def finish(b: pa.Table) -> pa.Table:
        cents = b.column("sum(cents)")
        keep = pc.greater(
            pc.multiply(cents, n_parts * 10), pa.scalar(total * 12, pa.int64())
        )
        t = pa.table(
            {
                "l_partkey": b.column("l_partkey"),
                "value": pc.divide(pc.cast(cents, pa.float64()), 100.0),
            }
        )
        return t.filter(keep)

    return agg.map_batches(finish, batch_format="pyarrow")


def events_gap_stats(sf_dir: str):
    """Per-user inter-arrival gap statistics (min/max/mean seconds
    between consecutive events) — the cadence profile behind bot
    detection and session-timeout tuning.  r5: ONE global
    (user, ts, event_id) sort + an across-user kernel via
    util.sorted_group_apply: the gap ENDING at each row is neutral at
    user-run starts (+∞/−∞/0 for min/max/sum), so one reduceat per
    statistic folds every user at once; gaps stay exact int64
    microseconds until the single float division per aggregate,
    written identically in the oracle."""
    from .util import sorted_group_apply

    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id"], blocks=16)

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_gaps": pa.array([], pa.int64()),
                    "min_gap_s": pa.array([], pa.float64()),
                    "max_gap_s": pa.array([], pa.float64()),
                    "mean_gap_s": pa.array([], pa.float64()),
                }
            )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()).to_numpy()
        bound = np.r_[True, uid[1:] != uid[:-1]]
        d = np.r_[0, np.diff(ts)]  # gap ending at row i (0 at run starts)
        starts = np.flatnonzero(bound)
        runlens = np.diff(np.r_[starts, uid.size])
        n_gaps = (runlens - 1).astype(np.int64)
        hi = np.iinfo(np.int64).max
        dmin = np.where(bound, hi, d)
        dmax = np.where(bound, -hi, d)
        dsum = np.where(bound, 0, d)
        mins = np.minimum.reduceat(dmin, starts)
        maxs = np.maximum.reduceat(dmax, starts)
        sums = np.add.reduceat(dsum, starts)
        has = n_gaps > 0
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "n_gaps": pa.array(n_gaps, pa.int64()),
                "min_gap_s": pa.array(mins / 1_000_000.0, pa.float64(), mask=~has),
                "max_gap_s": pa.array(maxs / 1_000_000.0, pa.float64(), mask=~has),
                "mean_gap_s": pa.array(
                    sums / np.maximum(n_gaps, 1) / 1_000_000.0,
                    pa.float64(),
                    mask=~has,
                ),
            }
        )

    return sorted_group_apply(ds, "user_id", ["ts", "event_id"], kernel)


def orders_monthly_growth(sf_dir: str):
    """Period-over-period growth — monthly revenue plus its
    month-over-month ratio (the BI comparison every revenue dashboard
    leads with).  Exact-cents month totals via map-side partials; the
    month series is calendar-bounded (≤ a few thousand rows at ANY
    data scale), so the LAG ratio is one vectorized pass over the
    collected series — driver-sized by the domain, not the data."""
    from .util import collect_arrow

    ds = _pq(sf_dir, "orders", ["o_orderdate", "o_totalprice"], blocks=8)

    def partial(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("o_orderdate"), pa.timestamp("us"))
        month = pc.strftime(ts, format="%Y-%m-01")
        t = pa.table(
            {"month": month, "cents": _cents(b.column("o_totalprice"))}
        )
        return t.group_by("month").aggregate([("cents", "sum")]).rename_columns(
            ["month", "cents"]
        )

    agg = collect_arrow(
        ds.map_batches(partial, batch_format="pyarrow").groupby("month").sum("cents")
    )
    order = pc.sort_indices(agg.column("month"))
    months = agg.column("month").take(order)
    cents = agg.column("sum(cents)").take(order).to_numpy()
    rev = cents.astype(np.float64) / 100.0
    growth = np.concatenate(([np.nan], rev[1:] / rev[:-1]))
    return pa.table(
        {
            "month": months,
            "revenue": pa.array(rev, pa.float64()),
            "growth": pa.array(
                growth, pa.float64(), mask=np.isnan(growth)
            ),
        }
    )


_ANOM_W = 24  # trailing window (hours) for the anomaly baseline


def events_hourly_anomaly(sf_dir: str):
    """Streaming anomaly scores — each hour's event count z-scored
    against the PRECEDING ``_ANOM_W`` hours (exclusive frame), the
    alert primitive over any metric stream.  The heavy step (hourly
    counts) is map-side partials + one small groupby; the window pass
    runs over the hour series, which is calendar-bounded (10⁴ rows per
    year at any data scale) — the same domain-sized-series argument as
    the monthly-growth operator.  Mean and variance come from exact
    integer Σ/Σ² prefix sums in the same op order as the oracle; hours
    with an incomplete baseline (fewer than ``_ANOM_W`` predecessors)
    or zero variance emit NULL."""
    from .util import collect_arrow

    ds = _pq(sf_dir, "events", ["ts"], blocks=16)

    def partial(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("ts"), pa.timestamp("us"))
        hour = pc.strftime(ts, format="%Y-%m-%d %H:00:00")
        t = pa.table({"hour": hour})
        return t.group_by("hour").aggregate([([], "count_all")]).rename_columns(
            ["hour", "n"]
        )

    agg = collect_arrow(
        ds.map_batches(partial, batch_format="pyarrow").groupby("hour").sum("n")
    )
    order = pc.sort_indices(agg.column("hour"))
    hours = agg.column("hour").take(order)
    n = agg.column("sum(n)").take(order).to_numpy().astype(np.int64)
    W = _ANOM_W
    c1 = np.concatenate(([0], np.cumsum(n)))
    c2 = np.concatenate(([0], np.cumsum(n * n)))
    z = np.full(len(n), np.nan)
    for i in range(W, len(n)):
        s1 = int(c1[i] - c1[i - W])
        s2 = int(c2[i] - c2[i - W])
        mean = s1 / W
        var = s2 / W - mean * mean
        if var > 0:
            z[i] = (int(n[i]) - mean) / (var ** 0.5)
    return pa.table(
        {
            "hour": hours,
            "n": pa.array(n),
            "z": pa.array(z, pa.float64(), mask=np.isnan(z)),
        }
    )


# Poisson(1) CDF cutoffs scaled to 2^64 (floor(P(X≤k)·2^64), k=0..7):
# a row's replicate weight = #cutoffs ≤ its 64-bit hash — the standard
# hash-seeded Poisson bootstrap (one pass, no resampling shuffle)
_BOOT_T = (
    6786177901268885504,
    13572355802537771008,
    16965444753172213760,
    18096474403383695360,
    18379231815936565248,
    18435783298447138816,
    18445208545532233728,
    18446555009401532416,
)
_BOOT_B = 32  # bootstrap replicates


def lineitem_bootstrap_se(sf_dir: str):
    """Deterministic Poisson bootstrap — the one-pass distributed way
    to put an ERROR BAR on a statistic at any scale (Chamandy et al.,
    'Estimating Uncertainty for Massive Data Streams', Google 2012):
    every row gets ``B`` independent Poisson(1) weights derived from a
    hash of its key, so replicate means come out of ONE scan as 2·B
    int64 partials per block — no resampling shuffle, no RNG state,
    bit-reproducible across any partitioning.  Output: one row per
    replicate (its effective n and weighted mean revenue); the SE is
    the sample std of the means (asserted in tests; the replicate
    table is the oracle-checkable artifact).  The weight is the count
    of Poisson-CDF cutoffs ≤ fnv64(rid·B + b) — integer compares
    against shared literal constants, identical in the SQL oracle."""
    li = _pq(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_extendedprice"],
        blocks=16,
    )
    T = np.array(_BOOT_T, dtype=np.uint64)
    B = _BOOT_B

    def partial(b: pa.Table) -> pa.Table:
        rid = (
            b.column("l_orderkey").to_numpy() * 16
            + pc.cast(b.column("l_linenumber"), pa.int64()).to_numpy()
        )
        cents = _cents(b.column("l_extendedprice")).to_numpy()
        reps, sw, swc = [], [], []
        for rb in range(B):
            h = _fnv64(rid * B + rb)
            w = np.searchsorted(T, h, side="right").astype(np.int64)
            reps.append(rb)
            sw.append(int(w.sum()))
            swc.append(int((w * cents).sum()))
        return pa.table(
            {
                "replicate": pa.array(reps, pa.int64()),
                "sw": pa.array(sw, pa.int64()),
                "swc": pa.array(swc, pa.int64()),
            }
        )

    agg = li.map_batches(partial, batch_format="pyarrow").groupby(
        "replicate"
    ).sum(["sw", "swc"])

    def finish(b: pa.Table) -> pa.Table:
        sw = b.column("sum(sw)").to_numpy()
        swc = b.column("sum(swc)").to_numpy()
        return pa.table(
            {
                "replicate": b.column("replicate"),
                "n_eff": pa.array(sw),
                "mean_revenue": pa.array(swc / sw / 100.0, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _ntile_on(ds, sort_cols: list, tiles: int, key_col: str, out_col: str):
    """Global equi-depth NTILE over ``ds`` (same machinery as
    orders_ntile: range-sort + per-block offset stamping, driver holds
    one row count per block). Returns Dataset(key_col, out_col)."""
    from .stages.window import global_row_number

    rn = global_row_number(ds, sort_cols, out_col="rn")
    total = rn.count()
    big = total % tiles
    small = total // tiles
    cut = big * (small + 1)

    def stamp(b: pa.Table) -> pa.Table:
        r = b.column("rn").to_numpy() - 1
        if small == 0:
            tile = r + 1
        else:
            tile = np.where(r < cut, r // (small + 1), big + (r - cut) // small) + 1
        return pa.table(
            {
                key_col: b.column(key_col),
                out_col: pa.array(tile.astype(np.int64)),
            }
        )

    return rn.map_batches(stamp, batch_format="pyarrow")


def customer_rfm(sf_dir: str):
    """RFM segmentation — the classic customer-curation pipeline
    (recency / frequency / monetary quartiles): per-customer aggregates
    from one fact pass (count, exact-cents sum, max order date), then
    THREE independent global equi-depth NTILE(4) passes (each the
    range-sort + block-offset machinery — the aggregate table scales
    with customers, so no driver collection), joined back on custkey
    into the 3-digit RFM code.  Tie-breaks are (metric, custkey) in
    both the Ray sorts and the SQL windows, so quartile assignment is
    deterministic and hash-exact."""
    orders = _pq(
        sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"], blocks=8
    )

    def cust_partial(b: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(b.column("o_orderdate"), pa.timestamp("us")), pa.int64())
        t = pa.table(
            {
                "custkey": b.column("o_custkey"),
                "f": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                "m": _cents(b.column("o_totalprice")),
                "r": ts,
            }
        )
        return t.group_by("custkey").aggregate(
            [("f", "sum"), ("m", "sum"), ("r", "max")]
        ).rename_columns(["custkey", "f", "m", "r"])

    cust = (
        _sorted_agg_by_key(
            orders.map_batches(cust_partial, batch_format="pyarrow"),
            "custkey",
            [("f", "sum", "f"), ("m", "sum", "m"), ("r", "max", "r")],
        )
        .materialize()
    )

    rq = _ntile_on(cust.select_columns(["custkey", "r"]), ["r", "custkey"], 4,
                   "custkey", "r_q")
    fq = _ntile_on(cust.select_columns(["custkey", "f"]), ["f", "custkey"], 4,
                   "custkey", "f_q")
    mq = _ntile_on(cust.select_columns(["custkey", "m"]), ["m", "custkey"], 4,
                   "custkey", "m_q")
    joined = rq.join(fq, "inner", _join_partitions(), on=("custkey",)).join(
        mq, "inner", _join_partitions(), on=("custkey",)
    )

    def finish(b: pa.Table) -> pa.Table:
        code = (
            b.column("r_q").to_numpy() * 100
            + b.column("f_q").to_numpy() * 10
            + b.column("m_q").to_numpy()
        )
        return pa.table(
            {
                "custkey": b.column("custkey"),
                "r_q": b.column("r_q"),
                "f_q": b.column("f_q"),
                "m_q": b.column("m_q"),
                "rfm": pa.array(code.astype(np.int64)),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def crawl_hits(sf_dir: str):
    """HITS hubs-and-authorities over the flagship crawl's link graph
    (same closed edge set as crawl_pagerank): per page, the hub score
    (links to good authorities) and authority score (linked from good
    hubs) — the second classic link-quality fixed point the frontier's
    priority queue can consume.  Rows-only (iterative, not ANSI-SQL);
    pinned against a dense numpy reference in tests."""
    from .oracle import CrawlSpec
    from .pipelines.crawl import EngineConfig, run_crawl
    from .stages.graph import hits

    spec = CrawlSpec(
        n_pages=CORPUS_N, seeds=[datagen.url(1)], max_urls=120, batch_size=25,
        scope=Scope("suffix", datagen.HOST_SUFFIX),
    )
    res = run_crawl(spec, corpus_dir(), EngineConfig(num_workers=_safe_workers()))
    audit = res.audit
    urls = audit.column("url").combine_chunks()
    links = audit.column("links_encontrados").combine_chunks()
    ln = pc.list_value_length(links).fill_null(0).to_numpy(zero_copy_only=False)
    src = urls.take(pa.array(np.repeat(np.arange(len(urls)), ln)))
    dst = pc.list_flatten(links)
    visited = pc.is_in(dst, value_set=urls)
    edges = rd.from_arrow(
        pa.table({"src": src.filter(visited), "dst": dst.filter(visited)})
    )
    hub, auth = hits(edges, iterations=20)
    merged = hub.rename_columns(["url", "hub"]).join(
        auth.rename_columns(["url", "authority"]), keys="url"
    )
    return merged.take(
        pc.sort_indices(
            merged,
            sort_keys=[("authority", "descending"), ("url", "ascending")],
        )
    )


def nation_segments(sf_dir: str):
    """Grouped collect-list / string_agg: per nation, the sorted
    DISTINCT market segments of its customers as one comma-joined
    string. Block-level pair dedup shrinks the exchange to unique
    (nation, segment) pairs; the in-group sort+join happens after the
    shuffle on rows-per-group ≤ |segments|."""
    ds = _pq(sf_dir, "customer", ["c_nationkey", "c_mktsegment"], blocks=8)

    def local_pairs(b: pa.Table) -> pa.Table:
        return b.group_by(["c_nationkey", "c_mktsegment"]).aggregate([])

    def join_group(g: pa.Table) -> pa.Table:
        segs = sorted(set(g.column("c_mktsegment").to_pylist()))
        return pa.table(
            {
                "c_nationkey": g.column("c_nationkey").slice(0, 1),
                "segments": pa.array([",".join(segs)], pa.string()),
            }
        )

    return (
        ds.map_batches(local_pairs, batch_format="pyarrow")
        .groupby("c_nationkey")
        .map_groups(join_group, batch_format="pyarrow")
    )


def customer_set_flags(sf_dir: str):
    """Set operators (UNION / INTERSECT / EXCEPT in one output): set A =
    customers with an URGENT order, set B = customers with acctbal >
    9000. One row per custkey in A ∪ B with membership flags — in_a ∧
    in_b is the INTERSECT row set, in_a ∧ ¬in_b the EXCEPT. Both sides
    dedup to key grain inside their blocks, `Dataset.union` concatenates
    without a shuffle, and one max-combine groupby folds the flags."""
    from ray.data.aggregate import Max

    def flag_batch(key_col: str, in_a: int):
        def fn(b: pa.Table) -> pa.Table:
            keys = b.column(key_col).unique()
            n = len(keys)
            return pa.table(
                {
                    "c_custkey": keys,
                    "in_a": pa.array([in_a] * n, pa.int64()),
                    "in_b": pa.array([1 - in_a] * n, pa.int64()),
                }
            )

        return fn

    urgent = (
        _pq(sf_dir, "orders", ["o_custkey", "o_orderpriority"], blocks=8)
        .filter(expr="o_orderpriority == '1-URGENT'")
        .map_batches(flag_batch("o_custkey", 1), batch_format="pyarrow")
    )
    highbal = (
        _pq(sf_dir, "customer", ["c_custkey", "c_acctbal"], blocks=4)
        .filter(expr="c_acctbal > 9000")
        .map_batches(flag_batch("c_custkey", 0), batch_format="pyarrow")
    )
    return _sorted_agg_by_key(
        urgent.union(highbal),
        "c_custkey",
        [("in_a", "max", "in_a"), ("in_b", "max", "in_b")],
    )


def orders_price_window(sf_dir: str):
    """Ranking window functions: ntile(4) + percent_rank per
    o_orderpriority partition ordered by (o_totalprice, o_orderkey).
    groupby(partition).map_groups with one in-group lexsort; ntile uses
    the SQL bucket rule (first n%k buckets take the extra row) and the
    unique orderkey tie-break makes percent_rank = (rownum−1)/(n−1)
    exactly. Partition-must-fit-one-group is the documented constraint
    (same as any SQL window partition)."""
    ds = _pq(
        sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"], blocks=8
    )

    def window(g: pa.Table) -> pa.Table:
        price = g.column("o_totalprice").to_numpy(zero_copy_only=False)
        okey = g.column("o_orderkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, price))
        n = len(order)
        rownum = np.arange(n, dtype=np.int64)
        k = 4
        base, extra = divmod(n, k)
        # SQL ntile: the first n%k buckets hold one extra row each
        boundary = extra * (base + 1)
        tile = (
            np.where(
                rownum < boundary,
                rownum // max(base + 1, 1),
                extra + (rownum - boundary) // max(base, 1),
            )
            + 1
        )
        pct = rownum / (n - 1) if n > 1 else np.zeros(n)
        return pa.table(
            {
                "o_orderkey": pa.array(okey[order]),
                "o_orderpriority": g.column("o_orderpriority").take(pa.array(order)),
                "tile": pa.array(tile.astype(np.int64)),
                "pct_rank": pa.array(pct.astype(np.float64)),
            }
        )

    return ds.groupby("o_orderpriority").map_groups(window, batch_format="pyarrow")


def lineitem_zscore(sf_dir: str):
    """Global z-score standardization (feature scaling): two streaming
    passes. Pass 1 accumulates EXACT integer moments (n, Σx, Σx² over
    price cents, int64-safe sub-chunks folded into Python ints — the
    lineitem_corr machinery); the driver derives mean and sd as doubles
    from the exact integers with the SAME int→double conversions the
    HUGEINT SQL performs. Pass 2 stamps z = (x − mean)/sd per row,
    pure vectorized float ops in the identical IEEE order — so the
    doubles are bit-equal under any block layout, with no per-row
    big-int cost."""
    import math

    from .util import collect_arrow

    ds = _pq(
        sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice"],
        blocks=16,
    )
    dec = pa.decimal128(38, 0)

    def partial(b: pa.Table) -> pa.Table:
        x = _cents(b.column("l_extendedprice")).to_numpy()
        s = q = 0
        CH = 50_000  # y² ≲ 1.2·10¹⁴ ⇒ 50k-row sums stay < 2⁶³
        for s0 in range(0, len(x), CH):
            c = x[s0 : s0 + CH]
            s += int(c.sum())
            q += int((c * c).sum())
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "s": pa.array([s], dec),
                "q": pa.array([q], dec),
            }
        )

    parts = collect_arrow(ds.map_batches(partial, batch_format="pyarrow")).to_pydict()
    n = sum(int(v) for v in parts["n"])
    s = sum(int(v) for v in parts["s"])
    q = sum(int(v) for v in parts["q"])
    # identical conversions to the SQL: each exact integer → nearest
    # double once, then the same float expression
    mean = float(s) / float(n)
    sd = math.sqrt(float(q * n - s * s)) / float(n)

    def stamp(b: pa.Table) -> pa.Table:
        xf = _cents(b.column("l_extendedprice")).to_numpy().astype(np.float64)
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "l_linenumber": b.column("l_linenumber"),
                "z": pa.array((xf - mean) / sd),
            }
        )

    return ds.map_batches(stamp, batch_format="pyarrow")


def lineitem_corr(sf_dir: str):
    """Distributed correlation, exactly reproducible: per returnflag,
    corr(l_quantity, l_extendedprice) from EXACT INTEGER moments.
    Each block accumulates n, Σx, Σy, Σxy, Σx², Σy² over integer units
    (quantity, price cents) in overflow-guarded sub-chunks folded into
    Python ints, shipped as decimal128(38,0) partial rows (blocks ×
    groups); the driver merges in arbitrary-precision ints. The naive
    n·Σxy − Σx·Σy cancellation is a FLOAT hazard only — on exact
    integers the subtraction is exact at any row count — and the final
    expression (one int→double conversion per term, sqrt, divide) is
    the identical IEEE op sequence the HUGEINT SQL oracle performs, so
    the doubles are bit-equal under any block layout. (The previous
    Chan pairwise merge was numerically stable but its last-ulp result
    depended on the merge tree — unreproducible against any oracle.)"""
    import math

    from .util import collect_arrow

    ds = _pq(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_quantity", "l_extendedprice"],
        blocks=16,
    )
    dec = pa.decimal128(38, 0)

    def partial_moments(b: pa.Table) -> pa.Table:
        flags = b.column("l_returnflag").to_numpy(zero_copy_only=False)
        x = b.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.int64)
        y = _cents(b.column("l_extendedprice")).to_numpy()
        out = {
            "l_returnflag": [], "n": [], "sx": [], "sy": [],
            "sxy": [], "sxx": [], "syy": [],
        }
        # int64-safe sub-chunking: the largest per-row term is
        # y² ≲ 1.2·10¹⁴ cents², so 50k-row partial sums stay < 2⁶³
        # with >10³ headroom at any block size
        CH = 50_000
        for f in np.unique(flags):
            sel = flags == f
            xs, ys = x[sel], y[sel]
            n = len(xs)
            sx = sy = sxy = sxx = syy = 0
            for s0 in range(0, n, CH):
                cx, cy = xs[s0 : s0 + CH], ys[s0 : s0 + CH]
                sx += int(cx.sum())
                sy += int(cy.sum())
                sxy += int((cx * cy).sum())
                sxx += int((cx * cx).sum())
                syy += int((cy * cy).sum())
            out["l_returnflag"].append(str(f))
            out["n"].append(n)
            out["sx"].append(sx)
            out["sy"].append(sy)
            out["sxy"].append(sxy)
            out["sxx"].append(sxx)
            out["syy"].append(syy)
        return pa.table(
            {
                "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
                "n": pa.array(out["n"], pa.int64()),
                **{c: pa.array(out[c], dec) for c in ("sx", "sy", "sxy", "sxx", "syy")},
            }
        )

    parts = collect_arrow(
        ds.map_batches(partial_moments, batch_format="pyarrow")
    ).to_pydict()
    merged: dict[str, list[int]] = {}
    for i, f in enumerate(parts["l_returnflag"]):
        m = merged.setdefault(f, [0, 0, 0, 0, 0, 0])
        m[0] += int(parts["n"][i])
        for j, c in enumerate(("sx", "sy", "sxy", "sxx", "syy"), start=1):
            m[j] += int(parts[c][i])
    flags = sorted(merged)
    corr = []
    for f in flags:
        n, sx, sy, sxy, sxx, syy = merged[f]
        dx, dy = n * sxx - sx * sx, n * syy - sy * sy
        corr.append(
            float(n * sxy - sx * sy) / (math.sqrt(float(dx)) * math.sqrt(float(dy)))
            if dx > 0 and dy > 0
            else None
        )
    return pa.table(
        {
            "l_returnflag": pa.array(flags, pa.string()),
            "n": pa.array([merged[f][0] for f in flags], pa.int64()),
            "corr_qty_price": pa.array(corr, pa.float64()),
        }
    )


def lineitem_regression(sf_dir: str):
    """Grouped OLS fit (price-on-quantity slope + intercept per
    returnflag) from the SAME exact-integer-moment machinery as
    lineitem_corr: block partials in decimal128, arbitrary-precision
    driver merge, and a final expression whose int→double conversions
    and float op order are written identically in the HUGEINT oracle —
    bit-equal doubles under any block layout."""
    from .util import collect_arrow

    ds = _pq(
        sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"],
        blocks=16,
    )
    dec = pa.decimal128(38, 0)

    def partial(b: pa.Table) -> pa.Table:
        flags = b.column("l_returnflag").to_numpy(zero_copy_only=False)
        x = b.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.int64)
        y = _cents(b.column("l_extendedprice")).to_numpy()
        out = {"l_returnflag": [], "n": [], "sx": [], "sy": [], "sxy": [], "sxx": []}
        CH = 50_000
        for f in np.unique(flags):
            sel = flags == f
            xs, ys = x[sel], y[sel]
            sx = sy = sxy = sxx = 0
            for s0 in range(0, len(xs), CH):
                cx, cy = xs[s0 : s0 + CH], ys[s0 : s0 + CH]
                sx += int(cx.sum())
                sy += int(cy.sum())
                sxy += int((cx * cy).sum())
                sxx += int((cx * cx).sum())
            out["l_returnflag"].append(str(f))
            out["n"].append(len(xs))
            out["sx"].append(sx)
            out["sy"].append(sy)
            out["sxy"].append(sxy)
            out["sxx"].append(sxx)
        return pa.table(
            {
                "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
                "n": pa.array(out["n"], pa.int64()),
                **{c: pa.array(out[c], dec) for c in ("sx", "sy", "sxy", "sxx")},
            }
        )

    parts = collect_arrow(ds.map_batches(partial, batch_format="pyarrow")).to_pydict()
    merged: dict[str, list[int]] = {}
    for i, f in enumerate(parts["l_returnflag"]):
        m = merged.setdefault(f, [0, 0, 0, 0, 0])
        m[0] += int(parts["n"][i])
        for j, c in enumerate(("sx", "sy", "sxy", "sxx"), start=1):
            m[j] += int(parts[c][i])
    flags = sorted(merged)
    slopes, intercepts = [], []
    for f in flags:
        n, sx, sy, sxy, sxx = merged[f]
        dx = n * sxx - sx * sx
        if dx > 0:
            slope = float(n * sxy - sx * sy) / float(dx)
            intercepts.append(
                float(sy) / float(n) - slope * (float(sx) / float(n))
            )
            slopes.append(slope)
        else:
            slopes.append(None)
            intercepts.append(None)
    return pa.table(
        {
            "l_returnflag": pa.array(flags, pa.string()),
            "n": pa.array([merged[f][0] for f in flags], pa.int64()),
            "slope_cents_per_qty": pa.array(slopes, pa.float64()),
            "intercept_cents": pa.array(intercepts, pa.float64()),
        }
    )


def docs_sample_per_source(sf_dir: str, k: int = 20):
    """Deterministic fixed-k per-group sample: exactly min(k, |group|)
    docs per source, chosen by FNV-hash order — the 'give me 20 random-
    but-reproducible examples per bucket' every corpus-QA loop needs,
    stable across any partitioning. Each block prunes to its local
    per-source top-k by (hash, id) FULLY vectorized (one sort +
    run-length rank), so the groupby ships ≤ blocks×k rows per source;
    the in-group finish re-ranks those few."""
    ds = _pq(sf_dir, "documents", ["doc_id", "source"], blocks=8)

    def local_topk(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "source": b.column("source"),
                "doc_id": b.column("doc_id"),
                "hk": pa.array(_fnv64(ids), pa.uint64()),
            }
        )
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("source", "ascending"),
                ("hk", "ascending"),
                ("doc_id", "ascending"),
            ],
        )
        t = t.take(idx)
        src = t.column("source").to_numpy(zero_copy_only=False)
        # per-run rank without a Python loop: positions minus each run's
        # start position, runs found by adjacent inequality
        n = len(src)
        pos = np.arange(n, dtype=np.int64)
        starts = np.zeros(n, dtype=np.int64)
        new_run = np.concatenate(([True], src[1:] != src[:-1]))
        starts[new_run] = pos[new_run]
        np.maximum.accumulate(starts, out=starts)
        return t.filter(pa.array(pos - starts < k))

    def finish(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("hk", "ascending"), ("doc_id", "ascending")]
        )
        return g.take(idx[:k]).select(["source", "doc_id"])

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("source")
        .map_groups(finish, batch_format="pyarrow")
    )


def docs_mix_temperature(sf_dir: str, target: int = 100):
    """Temperature-based SOURCE MIXING — the multi-source/multilingual
    training-data allocation op (T5/mT5/LLaMA style): a `target`-doc
    budget splits across sources with weight |source|^(1/2)
    (temperature T=2 flattens the natural source distribution so small
    sources aren't drowned), and each source's quota is drawn
    deterministically by FNV-hash order (reproducible, partition-
    independent — the docs_sample_per_source draw). The quota
    arithmetic is PURE INTEGER so the SQL pair is hash-exact: weight =
    floor(sqrt(n)) (IEEE sqrt of an exact integer is correctly
    rounded, so it equals isqrt in both engines), base quota =
    target·w // Σw, and the leftover goes to the largest INTEGER
    remainders (rem DESC, source ASC) — no float ever reaches a
    boundary decision. Distributed shape: the source census is
    dimension-sized (block partials → driver fold), quotas broadcast
    by closure, each block prunes to its local per-source quota-top
    (vectorized run-rank), and a bounded per-source finish takes the
    global top — only ≤ blocks×quota rows move."""
    import math

    from .util import collect_arrow

    ds = _pq(sf_dir, "documents", ["doc_id", "source"], blocks=8)

    def count_partial(b: pa.Table) -> pa.Table:
        return (
            b.group_by("source")
            .aggregate([([], "count_all")])
            .rename_columns(["source", "n"])
        )

    counts = (
        collect_arrow(ds.map_batches(count_partial, batch_format="pyarrow"))
        .group_by("source")
        .aggregate([("n", "sum")])
        .rename_columns(["source", "n"])
    )
    src = counts.column("source").to_pylist()
    n_s = [int(x) for x in counts.column("n").to_pylist()]
    w = {s: math.isqrt(n) for s, n in zip(src, n_s)}
    tot = sum(w.values())
    if tot == 0:  # empty corpus: nothing to allocate
        return pa.table(
            {"source": pa.array([], pa.string()), "doc_id": pa.array([], pa.int64())}
        )
    base = {s: (target * w[s]) // tot for s in src}
    rem = {s: (target * w[s]) % tot for s in src}
    leftover = target - sum(base.values())
    quota = dict(base)
    for s in sorted(src, key=lambda s: (-rem[s], s))[:leftover]:
        quota[s] += 1

    def local_prune(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "source": b.column("source"),
                "doc_id": b.column("doc_id"),
                "hk": pa.array(_fnv64(ids), pa.uint64()),
            }
        )
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("source", "ascending"),
                ("hk", "ascending"),
                ("doc_id", "ascending"),
            ],
        )
        t = t.take(idx)
        srcs = t.column("source").to_numpy(zero_copy_only=False)
        n = len(srcs)
        pos = np.arange(n, dtype=np.int64)
        new_run = np.r_[True, srcs[1:] != srcs[:-1]]
        starts = np.zeros(n, dtype=np.int64)
        starts[new_run] = pos[new_run]
        np.maximum.accumulate(starts, out=starts)
        runlens = np.diff(np.r_[pos[new_run], n])
        k_row = np.repeat(
            np.array([quota.get(s, 0) for s in srcs[new_run]], np.int64), runlens
        )
        return t.filter(pa.array(pos - starts < k_row))

    def finish(g: pa.Table) -> pa.Table:
        q = quota.get(g.column("source")[0].as_py(), 0)
        idx = pc.sort_indices(
            g, sort_keys=[("hk", "ascending"), ("doc_id", "ascending")]
        )
        return g.take(idx[:q]).select(["source", "doc_id"])

    return (
        ds.map_batches(local_prune, batch_format="pyarrow")
        .groupby("source")  # bounded: one group per source
        .map_groups(finish, batch_format="pyarrow")
    )


def docs_decontaminate(sf_dir: str):
    """Benchmark decontamination — the n-gram-overlap pass every LLM
    training corpus runs before release: docs sharing ≥30% of their
    bigrams (multiset) with a held-out benchmark set (source 'src0')
    are flagged. The benchmark side reduces to DISTINCT bigrams
    distributedly and broadcasts once (`ray.put`); every train block
    then tests membership with one vectorized `pc.is_in` and folds
    per-doc hit counts with `np.bincount` — no row loop, and the flag
    compare is integer-exact (10·hits ≥ 3·bigrams). Scale seam: past
    broadcastable benchmark sizes, swap the is_in for the distributed
    semi-join on ngram (same shape as stages/dedup's text joins)."""
    from .util import collect_arrow

    docs = _pq(sf_dir, "documents", ["doc_id", "text", "source"], blocks=8)

    def bench_bigrams(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("source"), "src0"))
        ngram, _ = _bigram_expand(t.column("text"))
        return pa.table({"ngram": ngram}).group_by("ngram").aggregate([])

    bench = collect_arrow(
        _sorted_agg_by_key(
            docs.map_batches(bench_bigrams, batch_format="pyarrow"),
            "ngram",
            [(None, "count", "_c")],
        ).map_batches(lambda b: b.drop_columns(["_c"]), batch_format="pyarrow")
    )
    bench_ref = ray.put(bench.column("ngram").combine_chunks())

    def scan(b: pa.Table) -> pa.Table:
        t = b.filter(pc.invert(pc.equal(b.column("source"), "src0")))
        ngram, doc_idx = _bigram_expand(t.column("text"))
        n_rows = t.num_rows
        nbi = np.bincount(doc_idx, minlength=n_rows).astype(np.int64)
        hits_mask = pc.is_in(ngram, value_set=ray.get(bench_ref))
        hits = np.bincount(
            doc_idx, weights=hits_mask.to_numpy(zero_copy_only=False), minlength=n_rows
        ).astype(np.int64)
        keep = nbi > 0  # docs with <2 tokens have no bigram evidence
        return pa.table(
            {
                "doc_id": t.column("doc_id").filter(pa.array(keep)),
                "n_bigrams": pa.array(nbi[keep]),
                "n_hits": pa.array(hits[keep]),
                "contaminated": pa.array(10 * hits[keep] >= 3 * nbi[keep]),
            }
        )

    return docs.map_batches(scan, batch_format="pyarrow")


def orders_customer_full_join(sf_dir: str):
    """FULL OUTER join (completes the Dataset join-type family with the
    both-sides-null-preserving member): per-custkey count+spend of
    'F'-status orders, full-outer joined with the acctbal>8000 customer
    slice. Rows surviving from only one side keep nulls on the other —
    filled to sentinels plus an explicit ``side`` marker so the outer
    semantics are value-hash-checked, not just row-counted.

    Scale shape: the orders side is pre-aggregated by the join key
    inside each block then globally (the exchange ships custkey-grain
    partials, never raw orders); the customer side is filtered at the
    scan before the join."""
    orders = _pq(
        sf_dir, "orders", ["o_custkey", "o_orderstatus", "o_totalprice"], blocks=8
    )
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_acctbal"], blocks=4)

    def f_partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("o_orderstatus"), "F"))
        t = pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "spent_cents": _cents(t.column("o_totalprice")),
            }
        )
        return (
            t.group_by("o_custkey")
            .aggregate([("spent_cents", "sum"), ([], "count_all")])
            .rename_columns(["o_custkey", "spent_cents", "n"])
        )

    from .util import collect_arrow, drop_empty_blocks

    # Size-gated dense plan (BASELINE.md): both join inputs are
    # custkey-grain (order partials; the acctbal slice), so below the
    # gate they collect and full-outer join driver-side via Acero with
    # the same key-coalescing semantics; above it the distributed
    # groupby + full_outer exchange runs unchanged.
    if orders.count() <= 2 * _BCAST_KEYS_GATE:
        parts = collect_arrow(
            orders.map_batches(f_partial, batch_format="pyarrow"),
            schema=pa.schema(
                [("o_custkey", pa.int64()), ("spent_cents", pa.int64()), ("n", pa.int64())]
            ),
        )
        agg_t = (
            parts.group_by("o_custkey")
            .aggregate([("spent_cents", "sum"), ("n", "sum")])
            .rename_columns(["o_custkey", "spent_cents", "n"])
        )
        rich_t = collect_arrow(
            cust.map_batches(
                lambda b: b.filter(pc.greater(b.column("c_acctbal"), 8000.0)),
                batch_format="pyarrow",
            ),
            schema=pa.schema([("c_custkey", pa.int64()), ("c_acctbal", pa.float64())]),
        )
        joined_t = agg_t.join(
            rich_t,
            keys=["o_custkey"],
            right_keys=["c_custkey"],
            join_type="full outer",
        )
    else:
        agg = drop_empty_blocks(
            _sorted_agg_by_key(
                orders.map_batches(f_partial, batch_format="pyarrow"),
                "o_custkey",
                [("spent_cents", "sum", "spent_cents"), ("n", "sum", "n")],
            )
        )
        rich = cust.filter(expr="c_acctbal > 8000")
        joined = agg.join(
            rich, "full_outer", _join_partitions(), on=("o_custkey",), right_on=("c_custkey",)
        )
        joined_t = None

    def finish(b: pa.Table) -> pa.Table:
        # Ray's full_outer coalesces the join key into the left key
        # column, so side-detection reads the never-null value columns:
        # n ≥ 1 whenever the orders side matched, acctbal > 8000 (never
        # null in the slice) whenever the customer side matched
        zero = pa.scalar(0, pa.int64())
        return pa.table(
            {
                "custkey": b.column("o_custkey"),
                "n_f_orders": pc.coalesce(b.column("n"), zero),
                "f_spent": pc.divide(
                    pc.cast(pc.coalesce(b.column("spent_cents"), zero), pa.float64()),
                    100.0,
                ),
                "acctbal": pc.coalesce(
                    b.column("c_acctbal"), pa.scalar(-1.0, pa.float64())
                ),
                "side": pc.if_else(
                    pc.is_null(b.column("c_acctbal")),
                    pa.scalar("orders_only"),
                    pc.if_else(
                        pc.is_null(b.column("n")),
                        pa.scalar("customer_only"),
                        pa.scalar("both"),
                    ),
                ),
            }
        )

    if joined_t is not None:
        return finish(joined_t)
    return joined.map_batches(finish, batch_format="pyarrow")


def orders_priority_mode(sf_dir: str):
    """Grouped MODE (most frequent value) with a deterministic
    tie-break (higher count first, then lexicographically smaller
    value): the modal o_orderpriority per o_orderstatus. Distributed
    shape: per-block (status, priority) count partials → one tiny
    groupby over ≤ |statuses|×|priorities| rows → driver-side argmax —
    the fact table is scanned once and never shuffled."""
    from .util import collect_arrow

    ds = _pq(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"], blocks=8)

    def partial(b: pa.Table) -> pa.Table:
        return (
            b.group_by(["o_orderstatus", "o_orderpriority"])
            .aggregate([([], "count_all")])
            .rename_columns(["o_orderstatus", "o_orderpriority", "n"])
        )

    fine = collect_arrow(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Sum("n", alias_name="n")),
        schema=pa.schema(
            [
                ("o_orderstatus", pa.string()),
                ("o_orderpriority", pa.string()),
                ("n", pa.int64()),
            ]
        ),
    )
    fine = fine.take(
        pc.sort_indices(
            fine,
            sort_keys=[
                ("o_orderstatus", "ascending"),
                ("n", "descending"),
                ("o_orderpriority", "ascending"),
            ],
        )
    )
    seen: set = set()
    keep = []
    statuses = fine.column("o_orderstatus").to_pylist()
    for i, s in enumerate(statuses):
        if s not in seen:
            seen.add(s)
            keep.append(i)
    top = fine.take(pa.array(keep, pa.int64()))
    return pa.table(
        {
            "o_orderstatus": top.column("o_orderstatus"),
            "mode_priority": top.column("o_orderpriority"),
            "n": top.column("n"),
        }
    )


def docs_words(sf_dir: str):
    """UNNEST WITH ORDINALITY (flat_map explode): one row per
    (doc_id, 1-based position, whitespace token) over a deterministic
    doc_id%8 sample. Pure Arrow/numpy offset arithmetic — list flatten
    + parent-index repeat; no per-row Python, output rows never exist
    driver-side."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)

    def explode(b: pa.Table) -> pa.Table:
        t = b.filter(
            pc.equal(pc.bit_wise_and(b.column("doc_id"), 7), pa.scalar(0, pa.int64()))
        ).combine_chunks()
        words = pc.split_pattern(t.column("text"), " ")
        la = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        counts = np.diff(la.offsets.to_numpy())
        parent = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        pos = np.arange(counts.sum(), dtype=np.int64) - np.repeat(starts, counts)
        return pa.table(
            {
                "doc_id": t.column("doc_id").take(pa.array(parent)),
                "pos": pa.array(pos + 1, pa.int64()),
                "word": la.flatten(),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def docs_postings(sf_dir: str):
    """Inverted-index construction: term → document frequency + the
    postings list (sorted doc ids, comma-serialized) — the classic
    shuffle-heavy index-build job whose exchange key is the TERM.
    Map side: Arrow explode to (term, doc_id) pairs with a block-local
    ``group_by`` dedup (the combiner — collapses within-doc repeats
    before any bytes move); r5: ONE global (term, doc_id) sort via
    util.sorted_group_apply — after the sort each postings list is a
    contiguous ascending run, so the whole block serializes in one
    ListArray + binary_join (no per-term Python). Postings ride as a STRING
    column so the driver compare is byte-exact (nested list columns
    hash unstably across engines). At open-web scale the term key is
    Zipf-skewed — stop-word postings get huge; the standard refinement
    (documented, not needed at sf) splits a hot term's postings into
    bounded segments keyed (term, segment) and concatenates at read."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)

    def explode_distinct(b: pa.Table) -> pa.Table:
        t = b.combine_chunks()
        words = pc.split_pattern(t.column("text"), " ")
        la = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        counts = np.diff(la.offsets.to_numpy())
        parent = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        pairs = pa.table(
            {
                "term": la.flatten(),
                "doc_id": t.column("doc_id").take(pa.array(parent)),
            }
        )
        return pairs.group_by(["term", "doc_id"]).aggregate([])

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                    "postings": pa.array([], pa.string()),
                }
            )
        term_arr = pc.cast(t.column("term"), pa.string()).combine_chunks()
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(term_arr)
        tchg = np.r_[
            True,
            pc.not_equal(
                term_arr.slice(1), term_arr.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False),
        ]
        uniq = tchg | np.r_[False, did[1:] != did[:-1]]  # dedup (term, doc)
        ids2 = did[uniq]
        starts = np.flatnonzero(tchg[uniq])
        df = np.diff(np.r_[starts, ids2.size]).astype(np.int64)
        strs = pc.cast(pa.array(ids2), pa.string())
        la = pa.LargeListArray.from_arrays(
            pa.array(np.r_[starts, ids2.size], pa.int64()), strs
        )
        return pa.table(
            {
                "term": term_arr.filter(pa.array(uniq)).take(
                    pa.array(starts, pa.int64())
                ),
                "df": pa.array(df, pa.int64()),
                "postings": pc.cast(pc.binary_join(la, ","), pa.string()),
            }
        )

    from .util import collect_arrow, sorted_group_apply

    out = sorted_group_apply(
        ds.map_batches(explode_distinct, batch_format="pyarrow"),
        "term",
        ["doc_id"],
        kernel,
    )

    t = collect_arrow(out)
    return t.take(pc.sort_indices(t, sort_keys=[("term", "ascending")]))


def docs_bpe_pairs(sf_dir: str, k: int = 50):
    """Adjacent byte-pair frequency count — the BPE tokenizer-training
    primitive (merge round 0 counts every adjacent byte pair inside
    whitespace tokens across the corpus; reference semantics: what a
    from-scratch tokenizer trainer would run over the crawl text).
    Kernel insight: over space-separated text, "pairs within tokens" ≡
    "adjacent byte pairs of the raw text where NEITHER byte is the
    space", so the map stage runs directly on the Arrow string
    column's UTF-8 data buffer — one np.frombuffer view, two shifted
    slices, one 16-bit pack, one bincount. No tokenization, no
    per-row Python; pairs crossing ROW boundaries are masked via the
    offsets buffer. Each block emits ≤65,536 partial-count rows; one
    tiny code-keyed groupby merges them and the driver decodes +
    top-ks. (count desc, pair asc) is a total order over distinct
    pairs, so the LIMIT is deterministic; for ASCII, byte-code order ≡
    UTF-8 string order, so the SQL tie-break matches."""
    from .util import collect_arrow

    ds = _pq(sf_dir, "documents", ["text"], blocks=8)

    empty = pa.table(
        {"code": pa.array([], pa.int32()), "n": pa.array([], pa.int64())}
    )

    def pair_counts(b: pa.Table) -> pa.Table:
        col = b.column("text").combine_chunks()
        if len(col) == 0:
            return empty
        off = np.frombuffer(col.buffers()[1], dtype=np.int32)[
            col.offset : col.offset + len(col) + 1
        ].astype(np.int64)
        buf = np.frombuffer(col.buffers()[2], dtype=np.uint8)[off[0] : off[-1]]
        if len(buf) < 2:
            return empty
        a, c = buf[:-1], buf[1:]
        valid = (a != 32) & (c != 32)
        bidx = (off[1:-1] - off[0]) - 1  # pair spanning row r's last byte
        bidx = bidx[(bidx >= 0) & (bidx < len(valid))]
        valid[bidx] = False
        codes = (a[valid].astype(np.int32) << 8) | c[valid].astype(np.int32)
        counts = np.bincount(codes, minlength=1 << 16)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "code": pa.array(nz.astype(np.int32)),
                "n": pa.array(counts[nz].astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(pair_counts, batch_format="pyarrow")
        .groupby("code")
        .aggregate(Sum("n", alias_name="n"))
    )
    t = collect_arrow(agg, schema=pa.schema([("code", pa.int32()), ("n", pa.int64())]))
    t = t.take(
        pc.sort_indices(
            t, sort_keys=[("n", "descending"), ("code", "ascending")]
        )
    ).slice(0, k)
    codes = t.column("code").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "pair": pa.array([chr(cd >> 8) + chr(cd & 0xFF) for cd in codes]),
            "n": t.column("n"),
        }
    )


def docs_dedup_incremental(sf_dir: str, scan_stats: dict | None = None):
    """INCREMENTAL near-dup detection against a frozen history index —
    the production crawl shape: wave N+1's new documents are deduped
    against the full already-crawled history WITHOUT recomputing or
    rereading it. History (doc_id % 4 != 0) is banded+payload-packed
    once into an on-disk (band, bucket)-partitioned MinHash index
    (stages/dedup.build_minhash_index, cached under /tmp like the
    corpus); the new wave (doc_id % 4 == 0) probes ONLY the partitions
    its own band hashes touch (scan fraction via ``scan_stats``) and
    verifies exact set-Jaccard from the packed payloads. Emits cross
    pairs (id_a = history, id_b = new) at the same 0.5 threshold as
    docs_minhash_dups; banding recall is total on this corpus (the
    cross pairs are a subset of the SQL-verified full pair set)."""
    from .stages.dedup import build_minhash_index, dedup_against_minhash_index

    base = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)

    def _side(new: bool):
        def kernel(b: pa.Table) -> pa.Table:
            m = pc.equal(pc.bit_wise_and(b.column("doc_id"), 3), pa.scalar(0, pa.int64()))
            t = b.filter(m if new else pc.invert(m))
            return pa.table({"id": t.column("doc_id"), "text": t.column("text")})

        return base.map_batches(kernel, batch_format="pyarrow")

    index_dir = os.path.join(
        _CACHE_ROOT, f"mh_index_{os.path.basename(os.path.abspath(sf_dir))}_v1"
    )
    if not os.path.exists(os.path.join(index_dir, "manifest.json")):
        build_minhash_index(_side(new=False), "text", "id", index_dir)
    return dedup_against_minhash_index(
        _side(new=True), index_dir, jaccard_threshold=0.5, scan_stats=scan_stats
    )


def docs_dedup_index_lifecycle(sf_dir: str):
    """FULL recrawl lifecycle of the incremental MinHash index — the
    wave-N+1 production loop end to end: build the history index
    (doc_id % 4 != 0), probe the wave (doc_id % 4 == 0) for cross
    near-dups, TTL-EVICT the matched history docs (their band rows are
    dropped with partition-local rewrites — stages/dedup.
    evict_from_minhash_index, the SeenShard.evict analogue), re-probe
    (evicted docs must stop pairing), then EXTEND the index with the
    wave itself (partition-local appends) and re-probe once more (the
    wave now pairs against its just-admitted twins, not the evicted
    history). Returns an all-integer audit table of every phase:
    pair counts, rows removed, partitions rewritten/total — the
    evidence a 100 TB recrawl loop needs that index size stays flat
    under churn and every maintenance op touches only its own
    partitions. Rows-only (stateful on-disk index lifecycle is not
    ANSI-SQL); the same invariants are pinned in
    tests/test_dedup_similarity.py::test_minhash_index_evict_extend_lifecycle."""
    import shutil
    import tempfile

    from .stages.dedup import (
        build_minhash_index,
        dedup_against_minhash_index,
        evict_from_minhash_index,
        extend_minhash_index,
    )

    base = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)

    def _side(new: bool):
        def kernel(b: pa.Table) -> pa.Table:
            m = pc.equal(pc.bit_wise_and(b.column("doc_id"), 3), pa.scalar(0, pa.int64()))
            t = b.filter(m if new else pc.invert(m))
            return pa.table({"id": t.column("doc_id"), "text": t.column("text")})

        return base.map_batches(kernel, batch_format="pyarrow")

    index_dir = tempfile.mkdtemp(prefix="mh_lifecycle_")
    try:
        build_minhash_index(_side(new=False), "text", "id", index_dir)
        wave = _side(new=True)
        p1 = dedup_against_minhash_index(wave, index_dir, jaccard_threshold=0.5)
        matched_hist = sorted(set(p1.column("id_a").to_pylist()))
        ev = evict_from_minhash_index(index_dir, matched_hist)
        p2 = dedup_against_minhash_index(wave, index_dir, jaccard_threshold=0.5)
        still = set(p2.column("id_a").to_pylist()) & set(matched_hist)
        ss_ext: dict = {}
        extend_minhash_index(wave, "text", "id", index_dir, scan_stats=ss_ext)
        p3 = dedup_against_minhash_index(wave, index_dir, jaccard_threshold=0.5)
        rows = [
            ("probe_initial_pairs", p1.num_rows),
            ("evicted_history_docs", len(matched_hist)),
            ("evict_rows_removed", ev["rows_removed"]),
            ("evict_partitions_rewritten", ev["partitions_rewritten"]),
            ("evict_partitions_total", ev["partitions_total"]),
            ("probe_after_evict_pairs", p2.num_rows),
            ("evicted_still_pairing", len(still)),
            ("extend_partitions_rewritten", ss_ext["partitions_rewritten"]),
            ("extend_partitions_total", ss_ext["partitions_total"]),
            ("probe_after_extend_pairs", p3.num_rows),
        ]
        return pa.table(
            {
                "metric": pa.array([r[0] for r in rows], pa.string()),
                "value": pa.array([int(r[1]) for r in rows], pa.int64()),
            }
        )
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


def docs_heavy_terms(sf_dir: str):
    """Heavy-hitter TERMS across the whole corpus via the mergeable
    distributed top-k sketch (stages/sketch.heavy_hitters): blocks ship
    ≤ capacity+1 rows each regardless of vocabulary size; the result is
    returned ONLY when the sketch certifies the top-k set, counts and
    ordering equal the exact answer (it raises otherwise — no unlabeled
    estimates). SQL-paired against the exact count + row_number window;
    the corpus' Zipfy lowercase token distribution certifies at every
    sf. Tokenization: space split of lower(text), matching the oracle
    exactly."""
    from .stages.sketch import heavy_hitters

    ds = _pq(sf_dir, "documents", ["text"], blocks=8)

    def explode(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.utf8_lower(b.column("text")), " ")
        la = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        return pa.table({"term": la.flatten()})

    terms = ds.map_batches(explode, batch_format="pyarrow")
    out = heavy_hitters(terms, "term", k=10, capacity=64)
    if not out["certified"]:
        raise RuntimeError(
            "heavy_hitters could not certify the exact top-10 at "
            "capacity=64 — raise capacity (bounds table has the gap)"
        )
    t = out["table"]
    return pa.table(
        {"term": t.column("item"), "n": t.column("n"), "rank": t.column("rank")}
    )


def events_moving_avg(sf_dir: str):
    """ROWS-frame moving window aggregate: 4-row trailing mean of value
    per user ordered by (ts, event_id) — the frame-based window the
    lag/ntile entries don't cover. r5: ONE global (user, ts, event_id)
    sort + an across-user kernel via util.sorted_group_apply — the
    window's low edge is clamped to each user-run's start with index
    arithmetic on a single global cents cumsum (the frame never
    crosses a run boundary), exact-cents mean mirrored by the
    oracle."""
    from .util import sorted_group_apply

    ds = _pq(sf_dir, "events", ["user_id", "event_id", "ts", "value"], blocks=16)

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "event_id": b.column("event_id"),
                "ts": b.column("ts"),
                "cents": _cents(b.column("value")),
            }
        )

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "mov_avg": pa.array([], pa.float64()),
                }
            )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        c = t.column("cents").to_numpy(zero_copy_only=False)
        n = uid.size
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        runlens = np.diff(np.r_[starts, n])
        rel = np.arange(n, dtype=np.int64) - np.repeat(starts, runlens)
        cs = np.r_[0, np.cumsum(c)]
        idx = np.arange(n)
        lo = idx - np.minimum(rel, 3)
        wsum = cs[idx + 1] - cs[lo]
        wn = np.minimum(rel, 3) + 1
        return pa.table(
            {
                "user_id": pc.cast(t.column("user_id"), pa.int64()),
                "event_id": pc.cast(t.column("event_id"), pa.int64()),
                "mov_avg": pa.array((wsum / 100.0) / wn, pa.float64()),
            }
        )

    return sorted_group_apply(
        ds.map_batches(prep, batch_format="pyarrow"),
        "user_id",
        ["ts", "event_id"],
        kernel,
    )


def lineitem_price_quantiles_cont(sf_dir: str):
    """Exact grouped CONTINUOUS (interpolated) quantiles without a
    distributed sort — stages/quantile.grouped_quantile_cont: the same
    iterative-histogram machinery as the discrete entry resolves both
    bracketing order statistics, then interpolates in plain IEEE
    double ops the oracle reproduces bit-for-bit. Dyadic quantiles
    (quarters) keep the fractional rank exactly representable in both
    engines' arithmetic."""
    from .stages.quantile import grouped_quantile_cont

    ds = _pq(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"], blocks=16).map_batches(
        lambda b: pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "cents": _cents(b.column("l_extendedprice")),
            }
        ),
        batch_format="pyarrow",
    )
    t = grouped_quantile_cont(ds, "l_returnflag", "cents", [0.25, 0.5, 0.75])
    cols = {"l_returnflag": t.column("l_returnflag")}
    for q in ("q25", "q50", "q75"):
        cols[q] = pc.divide(t.column(q), 100.0)
    return pa.table(cols)


def orders_priority_share(sf_dir: str):
    """Percent-of-total window aggregate (``SUM(x) OVER ()`` ratio):
    order-value share per priority. Grouped exact-cents sums with
    map-side combine, then a driver-side 5-row ratio — no second scan,
    no window shuffle; the double division is performed identically in
    the oracle."""
    from .util import collect_arrow

    ds = _pq(sf_dir, "orders", ["o_orderpriority", "o_totalprice"], blocks=8)

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_orderpriority": b.column("o_orderpriority"),
                "cents": _cents(b.column("o_totalprice")),
            }
        )
        return (
            t.group_by("o_orderpriority")
            .aggregate([("cents", "sum"), ([], "count_all")])
            .rename_columns(["o_orderpriority", "cents", "n"])
        )

    agg = collect_arrow(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("cents", alias_name="cents"), Sum("n", alias_name="n")),
        schema=pa.schema(
            [("o_orderpriority", pa.string()), ("cents", pa.int64()), ("n", pa.int64())]
        ),
    )
    total = float(pc.sum(agg.column("cents")).as_py())
    return pa.table(
        {
            "o_orderpriority": agg.column("o_orderpriority"),
            "n": agg.column("n"),
            "revenue": pc.divide(pc.cast(agg.column("cents"), pa.float64()), 100.0),
            "share": pc.divide(pc.cast(agg.column("cents"), pa.float64()), total),
        }
    )


def lineitem_cube(sf_dir: str):
    """CUBE grouping sets (all four: fine grain, both one-dim margins,
    grand total) over (returnflag, linestatus), rolled-up keys marked
    'ALL'. One distributed pass with map-side combine produces the
    finest grain; every coarser level is derived from those ~6 rows
    driver-side — a CUBE over low-cardinality keys never rescans or
    reshuffles the fact table."""
    from .util import collect_arrow

    ds = _pq(
        sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_extendedprice"], blocks=16
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "price_cents": _cents(b.column("l_extendedprice")),
            }
        )
        return (
            t.group_by(["l_returnflag", "l_linestatus"])
            .aggregate([("price_cents", "sum"), ([], "count_all")])
            .rename_columns(["l_returnflag", "l_linestatus", "price_cents", "n"])
        )

    fine = collect_arrow(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("price_cents", alias_name="price_cents"), Sum("n", alias_name="n")
        ),
        schema=pa.schema(
            [
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("price_cents", pa.int64()),
                ("n", pa.int64()),
            ]
        ),
    )

    def margin(key: str, other: str) -> pa.Table:
        m = (
            fine.group_by(key)
            .aggregate([("price_cents", "sum"), ("n", "sum")])
            .rename_columns([key, "price_cents", "n"])
        )
        return m.add_column(
            1 if key == "l_returnflag" else 0,
            other,
            pa.array(["ALL"] * m.num_rows, pa.string()),
        )

    total = pa.table(
        {
            "l_returnflag": pa.array(["ALL"], pa.string()),
            "l_linestatus": pa.array(["ALL"], pa.string()),
            "price_cents": pa.array(
                [pc.sum(fine.column("price_cents")).as_py()], pa.int64()
            ),
            "n": pa.array([pc.sum(fine.column("n")).as_py()], pa.int64()),
        }
    )
    names = total.column_names
    out = pa.concat_tables(
        [
            fine.select(names),
            margin("l_returnflag", "l_linestatus").select(names),
            margin("l_linestatus", "l_returnflag").select(names),
            total,
        ]
    )
    return pa.table(
        {
            "l_returnflag": out.column("l_returnflag"),
            "l_linestatus": out.column("l_linestatus"),
            "n": out.column("n"),
            "sum_price": pc.divide(pc.cast(out.column("price_cents"), pa.float64()), 100.0),
        }
    )


def lineitem_price_quantile_sketch(sf_dir: str):
    """One-pass approximate quantiles (mergeable weighted-anchor
    summary, stages/sketch.quantile_sketch) over l_extendedprice —
    the single-scan complement to the exact iterative-histogram
    quantiles; rank error ≤ 2n/m is asserted by tests (no SQL oracle:
    the approximation is algorithm-specific, like the HLL sketch)."""
    from .stages.sketch import quantile_sketch

    ds = _pq(sf_dir, "lineitem", ["l_extendedprice"], blocks=16)
    return quantile_sketch(ds, "l_extendedprice", [0.25, 0.5, 0.9, 0.99])


def docs_dedup_keep_best(sf_dir: str):
    """Dup-group representative selection, keep-BEST policy: among
    documents sharing a duplicate key (the first-two-token prefix —
    exact texts are unique in this corpus, the prefix key has real
    collisions at every sf), keep the highest-quality row
    (quality_score desc, doc_id asc tiebreak). Training-data dedup
    uses this shape where keep-first would discard the best copy.

    Distributed shape: per-block (key → argmax) partials — numpy
    lexsort by (key, -score, id) + first-occurrence mask inside
    ``map_batches`` — merged once at distinct-key size with the same
    kernel (the dup-flag combiner pattern; at 10^10 rows the merge
    becomes its own groupby over distinct keys, the per-block combine
    is unchanged)."""
    from .util import collect_arrow

    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)

    def _argmax_per_key(k, ids, qs):
        order = np.lexsort((ids, -qs, k))
        ks = k[order]
        first = np.r_[True, ks[1:] != ks[:-1]]
        return order[first]

    def partial(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(batch.column("text"))
        first2 = pc.list_slice(pc.split_pattern_regex(trimmed, r"\s+"), 0, 2)
        keys = pc.utf8_lower(pc.binary_join(first2, " "))
        feats = [quality_features(t) for t in batch.column("text").to_pylist()]
        qs = np.asarray([f["quality_score"] for f in feats], np.float64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        k = keys.to_numpy(zero_copy_only=False)
        sel = _argmax_per_key(k, ids, qs)
        return pa.table(
            {
                "doc_id": pa.array(ids[sel].tolist(), pa.int64()),
                "text_key": pa.array(k[sel].tolist(), pa.string()),
                "quality_score": pa.array(qs[sel], pa.float64()),
            }
        )

    partials = collect_arrow(
        ds.map_batches(partial, batch_format="pyarrow"),
        schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text_key", pa.string()),
                ("quality_score", pa.float64()),
            ]
        ),
    )
    k = partials.column("text_key").to_numpy(zero_copy_only=False)
    ids = partials.column("doc_id").to_numpy()
    qs = partials.column("quality_score").to_numpy()
    sel = _argmax_per_key(k, ids, qs)
    return pa.table(
        {
            "doc_id": pa.array(ids[sel], pa.int64()),
            "text_key": pa.array(k[sel].tolist(), pa.string()),
            "quality_score": pa.array(qs[sel], pa.float64()),
        }
    )


def lineitem_iqr_outliers(sf_dir: str):
    """Tukey-fence outlier census over l_extendedprice: exact GLOBAL
    continuous quartiles in int64 cents (iterative-histogram, no sort,
    no shuffle), IEEE fences q1 − 1.5·iqr / q3 + 1.5·iqr, then one
    broadcast counting pass — the pre-statistics outlier screen a
    training-data pipeline runs before normalizing numeric features."""
    from .stages.quantile import grouped_quantile_cont
    from .util import collect_arrow

    ds = _pq(sf_dir, "lineitem", ["l_extendedprice"], blocks=8)

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "g": pa.array(np.zeros(b.num_rows, np.int32)),
                "cents": _cents(b.column("l_extendedprice")),
            }
        )

    cds = ds.map_batches(cents, batch_format="pyarrow")
    qt = grouped_quantile_cont(cds, "g", "cents", [0.25, 0.75])
    q1 = qt.column("q25")[0].as_py()
    q3 = qt.column("q75")[0].as_py()
    iqr = q3 - q1
    low = q1 - 1.5 * iqr
    high = q3 + 1.5 * iqr

    def census(b: pa.Table) -> pa.Table:
        c = _cents(b.column("l_extendedprice")).to_numpy()
        return pa.table(
            {
                "n_low": pa.array([int((c < low).sum())], pa.int64()),
                "n_high": pa.array([int((c > high).sum())], pa.int64()),
                "n_total": pa.array([len(c)], pa.int64()),
            }
        )

    parts = collect_arrow(
        ds.map_batches(census, batch_format="pyarrow"),
        schema=pa.schema(
            [("n_low", pa.int64()), ("n_high", pa.int64()), ("n_total", pa.int64())]
        ),
    )
    return pa.table(
        {
            "n_low": pa.array([pc.sum(parts.column("n_low")).as_py()], pa.int64()),
            "n_high": pa.array([pc.sum(parts.column("n_high")).as_py()], pa.int64()),
            "n_total": pa.array([pc.sum(parts.column("n_total")).as_py()], pa.int64()),
        }
    )


def docs_clean(sf_dir: str):
    """Text normalization (the first stage of every LLM-data pipeline):
    collapse whitespace runs, trim, lowercase — fully vectorized Arrow
    kernels (RE2 regex, same engine DuckDB uses, so the SQL pair is
    exact)."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)

    def clean(b: pa.Table) -> pa.Table:
        t = pc.utf8_lower(
            pc.utf8_trim_whitespace(
                pc.replace_substring_regex(
                    b.column("text"), pattern=r"\s+", replacement=" "
                )
            )
        )
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "clean_text": t,
                "n_chars": pc.cast(pc.utf8_length(t), pa.int64()),
            }
        )

    return ds.map_batches(clean, batch_format="pyarrow")


def orders_price_histogram(sf_dir: str, nbins: int = 16):
    """Fixed-width histogram of order totals: one exact min/max
    aggregate (int cents), then per-block ``np.bincount`` partials
    (nbins ints per block — the cheapest possible exchange) summed in a
    tiny groupby. Bin width = ceil((max−min+1)/nbins) in cents with the
    SAME double-division ceil in the SQL, so edges are bit-identical."""
    import math

    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Min as _Min

    ds = _pq(sf_dir, "orders", ["o_totalprice"], blocks=8).map_batches(
        lambda b: pa.table({"cents": _cents(b.column("o_totalprice"))}),
        batch_format="pyarrow",
    ).materialize()
    mm = ds.aggregate(_Min("cents", alias_name="mn"), _Max("cents", alias_name="mx"))
    mn, mx = mm["mn"], mm["mx"]
    width = int(math.ceil(float(mx - mn + 1) / nbins))

    def hist_partial(b: pa.Table) -> pa.Table:
        c = b.column("cents").to_numpy(zero_copy_only=False)
        counts = np.bincount((c - mn) // width, minlength=nbins)
        return pa.table(
            {
                "bin": pa.array(np.arange(nbins, dtype=np.int64)),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    from .util import collect_arrow

    t = collect_arrow(
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
    )
    t = t.filter(pc.greater(t.column("n"), 0))  # SQL GROUP BY emits no empty bins
    bins = t.column("bin").to_numpy(zero_copy_only=False)
    lo = (mn + bins * width).astype(np.float64) / 100.0
    hi = (mn + (bins + 1) * width - 1).astype(np.float64) / 100.0
    out = pa.table(
        {
            "bin": t.column("bin"),
            "lo": pa.array(lo, pa.float64()),
            "hi": pa.array(hi, pa.float64()),
            "n": t.column("n"),
        }
    )
    return out.take(pc.sort_indices(out, sort_keys=[("bin", "ascending")]))


def lineitem_mad(sf_dir: str):
    """Median absolute deviation per returnflag — the robust-stats
    sibling of lineitem_iqr_outliers: two exact interpolated-median
    passes over the sort-free histogram machinery. Works in DOUBLED
    cents (v = 2·cents) so the even-n interpolated median is an exact
    integer, making the deviation column |v − median| integer again;
    the second median's ±0.5 interpolation is dyadic, so the oracle's
    identical IEEE expression reproduces both columns bit-for-bit."""
    from .stages.quantile import grouped_quantile_cont

    ds = _pq(
        sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"], blocks=16
    ).map_batches(
        lambda b: pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "v": pc.multiply(_cents(b.column("l_extendedprice")), 2),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    med = grouped_quantile_cont(ds, "l_returnflag", "v", [0.5])
    m2 = dict(
        zip(med.column("l_returnflag").to_pylist(), med.column("q50").to_pylist())
    )
    m2_ref = ray.put(m2)

    def dev_batch(b: pa.Table) -> pa.Table:
        mm = ray.get(m2_ref)
        flags = b.column("l_returnflag").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False).astype(np.float64)
        center = np.empty(len(v), np.float64)
        for k, m in mm.items():
            center[flags == k] = m
        dev = np.abs(v - center).astype(np.int64)
        return pa.table(
            {"l_returnflag": b.column("l_returnflag"), "dev": pa.array(dev)}
        )

    mad = grouped_quantile_cont(
        ds.map_batches(dev_batch, batch_format="pyarrow"), "l_returnflag", "dev", [0.5]
    )
    md = dict(
        zip(mad.column("l_returnflag").to_pylist(), mad.column("q50").to_pylist())
    )
    keys = sorted(m2)
    return pa.table(
        {
            "l_returnflag": pa.array(keys, pa.string()),
            "median_price": pa.array([m2[k] / 200.0 for k in keys], pa.float64()),
            "mad_price": pa.array([md[k] / 200.0 for k in keys], pa.float64()),
        }
    )


def _emit_run_pairs(ok: np.ndarray, p: np.ndarray):
    """Vectorized within-basket pair emission over (ok, p) rows: dedup
    to distinct (ok, p), then for every ok-run emit all part pairs
    p1 < p2 via one np.repeat fan-out (no Python loop). Returns
    (ant, cons) int64 arrays — ant < cons by construction because
    parts are sorted inside each run."""
    if len(ok) == 0:
        z = np.array([], dtype=np.int64)
        return z, z
    order = np.lexsort((p, ok))
    ok, p = ok[order], p[order]
    keep = np.empty(len(ok), dtype=bool)
    keep[0] = True
    keep[1:] = (ok[1:] != ok[:-1]) | (p[1:] != p[:-1])
    ok, p = ok[keep], p[keep]
    newrun = np.empty(len(ok), dtype=bool)
    newrun[0] = True
    newrun[1:] = ok[1:] != ok[:-1]
    run_id = np.cumsum(newrun) - 1
    run_start = np.flatnonzero(newrun)
    run_len = np.diff(np.append(run_start, len(ok)))
    idx = np.arange(len(ok), dtype=np.int64)
    rem = run_start[run_id] + run_len[run_id] - idx - 1
    total = int(rem.sum())
    if total == 0:
        z = np.array([], dtype=np.int64)
        return z, z
    first = np.repeat(p, rem)
    base = np.repeat(idx + 1, rem)
    offs = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(rem) - rem, rem)
    return first.astype(np.int64), p[base + offs].astype(np.int64)


def _basket_pair_counts(sf_dir: str, nparts: int):
    """(ant, cons, sup) distinct-per-order part pairs with their order
    support, built WITHOUT the order-keyed self-join: one range sort of
    the narrow (order, part) table co-locates each basket, then every
    block pair-emits its interior runs vectorized (_emit_run_pairs)
    with a block-local count combiner; runs touching a block boundary
    (an order can straddle range partitions) ship their raw rows to a
    tiny side channel the driver pair-emits exactly once. Replaces the
    join build measured 21–47 s at sf0.1/32cpu with ~¼ the cost, and
    the exchange carries pre-combined pairs, not raw fan-out. Item
    supports and the distinct-order count ride the SAME pass (kinds 2
    and 3 of the mixed output), so association rules need no further
    fact-sized shuffles. Returns
    (lineitem ds, pair-count Dataset, item-support Dataset, n_orders).

    Full-dense gate (BASELINE.md): below 8 M rows the narrow
    (order, part) table collects in ONE pass — 16 bytes/row — and the
    lexsort + run-pair emission run driver-side, skipping the range
    sort AND the pair exchange entirely; above it the sort +
    boundary-side-channel plan below runs unchanged."""
    from .util import collect_arrow, drop_empty_blocks

    ds = _pq(sf_dir, "lineitem", ["l_orderkey", "l_partkey"], blocks=32)

    if ds.count() <= 8_000_000:
        t = collect_arrow(
            ds.map_batches(
                lambda b: pa.table(
                    {"ok": b.column("l_orderkey"), "p": b.column("l_partkey")}
                ),
                batch_format="pyarrow",
            ),
            schema=pa.schema([("ok", pa.int64()), ("p", pa.int64())]),
        )
        ok = t.column("ok").to_numpy(zero_copy_only=False).astype(np.int64)
        p = t.column("p").to_numpy(zero_copy_only=False).astype(np.int64)
        ant, cons = _emit_run_pairs(ok, p)
        pairs = (
            pa.table({"ant": pa.array(ant), "cons": pa.array(cons)})
            .group_by(["ant", "cons"])
            .aggregate([([], "count_all")])
            .rename_columns(["ant", "cons", "sup"])
        )
        pairs = pairs.set_column(
            pairs.schema.get_field_index("sup"), "sup",
            pc.cast(pairs.column("sup"), pa.int64()),
        )
        counts = rd.from_arrow(pairs).repartition(max(2, nparts))
        # distinct (order, part) rows → per-part distinct-order support
        oidx = np.lexsort((p, ok))
        ok_s, p_s = ok[oidx], p[oidx]
        if len(ok_s):
            keep = np.empty(len(ok_s), dtype=bool)
            keep[0] = True
            keep[1:] = (ok_s[1:] != ok_s[:-1]) | (p_s[1:] != p_s[:-1])
            ok_u, p_u = ok_s[keep], p_s[keep]
        else:
            ok_u, p_u = ok_s, p_s
        up, uc = np.unique(p_u, return_counts=True)
        items = rd.from_arrow(
            pa.table(
                {"p": pa.array(up, pa.int64()), "sup": pa.array(uc.astype(np.int64))}
            )
        )
        n_orders = int(1 + (ok_u[1:] != ok_u[:-1]).sum()) if ok_u.size else 0
        return ds, counts, items, n_orders

    nrw = ds.map_batches(
        lambda b: pa.table(
            {"ok": b.column("l_orderkey"), "p": b.column("l_partkey")}
        ),
        batch_format="pyarrow",
    ).sort("ok")

    def block_pairs(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "kind": pa.array([], pa.int8()),
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        ok = b.column("ok").to_numpy(zero_copy_only=False).astype(np.int64)
        p = b.column("p").to_numpy(zero_copy_only=False).astype(np.int64)
        # rows of the first and last order in this (range-sorted) block
        # may continue in neighbor blocks — side-channel them raw
        side = (ok == ok[0]) | (ok == ok[-1])
        ok_i, p_i = ok[~side], p[~side]
        tables = []
        if len(ok_i):
            order = np.lexsort((p_i, ok_i))
            ok_i, p_i = ok_i[order], p_i[order]
            keep = np.empty(len(ok_i), dtype=bool)
            keep[0] = True
            keep[1:] = (ok_i[1:] != ok_i[:-1]) | (p_i[1:] != p_i[:-1])
            ok_i, p_i = ok_i[keep], p_i[keep]
            ant, cons = _emit_run_pairs(ok_i, p_i)
            if len(ant):
                pairs = (
                    pa.table({"a": pa.array(ant), "b": pa.array(cons)})
                    .group_by(["a", "b"])
                    .aggregate([([], "count_all")])
                    .rename_columns(["a", "b", "c"])
                )
                tables.append(
                    pa.table(
                        {
                            "kind": pa.array(np.zeros(pairs.num_rows, dtype=np.int8)),
                            "a": pairs.column("a"),
                            "b": pairs.column("b"),
                            "c": pc.cast(pairs.column("c"), pa.int64()),
                        }
                    )
                )
            # kind 2: per-part distinct-order counts of the interior
            up, uc = np.unique(p_i, return_counts=True)
            tables.append(
                pa.table(
                    {
                        "kind": pa.array(np.full(len(up), 2, dtype=np.int8)),
                        "a": pa.array(up),
                        "b": pa.array(np.zeros(len(up), dtype=np.int64)),
                        "c": pa.array(uc.astype(np.int64)),
                    }
                )
            )
            # kind 3: interior distinct-order count
            n_runs = 1 + int((ok_i[1:] != ok_i[:-1]).sum())
            tables.append(
                pa.table(
                    {
                        "kind": pa.array([3], pa.int8()),
                        "a": pa.array([0], pa.int64()),
                        "b": pa.array([0], pa.int64()),
                        "c": pa.array([n_runs], pa.int64()),
                    }
                )
            )
        n_side = int(side.sum())
        if n_side:
            tables.append(
                pa.table(
                    {
                        "kind": pa.array(np.ones(n_side, dtype=np.int8)),
                        "a": pa.array(ok[side]),
                        "b": pa.array(p[side]),
                        "c": pa.array(np.ones(n_side, dtype=np.int64)),
                    }
                )
            )
        return pa.concat_tables(tables) if tables else empty

    mixed = nrw.map_batches(block_pairs, batch_format="pyarrow").materialize()

    side_t = collect_arrow(
        mixed.filter(expr="kind == 1"),
        schema=pa.schema(
            [("kind", pa.int8()), ("a", pa.int64()), ("b", pa.int64()), ("c", pa.int64())]
        ),
    )
    s_ok = side_t.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
    s_p = side_t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
    sa, sc = _emit_run_pairs(s_ok, s_p)
    side_rows = pa.table(
        {
            "kind": pa.array(np.zeros(len(sa), dtype=np.int8)),
            "a": pa.array(sa),
            "b": pa.array(sc),
            "c": pa.array(np.ones(len(sa), dtype=np.int64)),
        }
    )
    # side items: distinct (ok, p) → per-part counts; distinct ok count
    if len(s_ok):
        dedup = np.unique(np.stack([s_ok, s_p], axis=1), axis=0)  # tiny
        up_s, uc_s = np.unique(dedup[:, 1], return_counts=True)
        side_items = pa.table(
            {
                "kind": pa.array(np.full(len(up_s), 2, dtype=np.int8)),
                "a": pa.array(up_s.astype(np.int64)),
                "b": pa.array(np.zeros(len(up_s), dtype=np.int64)),
                "c": pa.array(uc_s.astype(np.int64)),
            }
        )
        n_side_orders = len(np.unique(s_ok))
    else:
        side_items = None
        n_side_orders = 0

    n_orders = n_side_orders + int(
        pc.sum(
            collect_arrow(
                mixed.filter(expr="kind == 3"),
                schema=pa.schema(
                    [("kind", pa.int8()), ("a", pa.int64()), ("b", pa.int64()), ("c", pa.int64())]
                ),
            ).column("c")
        ).as_py()
        or 0
    )

    pair_parts = drop_empty_blocks(mixed.filter(expr="kind == 0"))
    if side_rows.num_rows:
        pair_parts = pair_parts.union(rd.from_arrow(side_rows))
    # the blocks are already pair-combined, so the cross-block merge is
    # nearly a distinct-sum (~0.3 % dups at sf0.1) — Ray's hash-shuffle
    # aggregator costs ~13 s of fixed actor/exchange overhead on it
    # (measured at sf0.1/32cpu) while one driver-side Arrow group_by
    # costs ~0.3 s. Below the size gate, take the dense path (the
    # kcore/pagerank/triangle selection pattern: the SAME gate that
    # keeps output-sized folds off the driver keeps subgraph-sized ones
    # off the 16-actor exchange); above it, the distributed hash
    # aggregate with real parallelism.
    pair_rows = pair_parts.count()
    if pair_rows <= 8_000_000:
        t = collect_arrow(
            pair_parts,
            schema=pa.schema(
                [
                    ("kind", pa.int8()),
                    ("a", pa.int64()),
                    ("b", pa.int64()),
                    ("c", pa.int64()),
                ]
            ),
        )
        merged = (
            pa.table({"ant": t.column("a"), "cons": t.column("b"), "c": t.column("c")})
            .group_by(["ant", "cons"])
            .aggregate([("c", "sum")])
            .rename_columns(["ant", "cons", "sup"])
        )
        counts = rd.from_arrow(merged).repartition(max(2, nparts))
    else:
        gparts = max(nparts, min(16, _join_partitions() * 4))
        counts = drop_empty_blocks(
            _sorted_agg_by_key(
                pair_parts.map_batches(
                    lambda t: pa.table(
                        {"ant": t.column("a"), "cons": t.column("b"), "c": t.column("c")}
                    ),
                    batch_format="pyarrow",
                ),
                ["ant", "cons"],
                [("c", "sum", "sup")],
            )
        )
    item_parts = drop_empty_blocks(mixed.filter(expr="kind == 2"))
    if side_items is not None:
        item_parts = item_parts.union(rd.from_arrow(side_items))
    # item partials are blocks×vertices-sized — same dense-path gate
    if pair_rows <= 8_000_000:
        ti = collect_arrow(
            item_parts,
            schema=pa.schema(
                [
                    ("kind", pa.int8()),
                    ("a", pa.int64()),
                    ("b", pa.int64()),
                    ("c", pa.int64()),
                ]
            ),
        )
        items = rd.from_arrow(
            pa.table({"p": ti.column("a"), "c": ti.column("c")})
            .group_by("p")
            .aggregate([("c", "sum")])
            .rename_columns(["p", "sup"])
        )
    else:
        items = drop_empty_blocks(
            _sorted_agg_by_key(
                item_parts.map_batches(
                    lambda t: pa.table({"p": t.column("a"), "c": t.column("c")}),
                    batch_format="pyarrow",
                ),
                "p",
                [("c", "sum", "sup")],
            )
        )
    return ds, counts, items, n_orders


def _basket_edges(sf_dir: str, nparts: int):
    """Distinct oriented co-occurrence edges (p1 < p2) of the
    market-basket graph — parts appearing in the same order. Built on
    the sort + vectorized run-pair-emission path (_basket_pair_counts:
    measured ~4× over the order-keyed hash self-join it replaces, and
    ~12× over a ``groupby(order).map_groups`` per-order Python
    emission). Shared by the triangle-count, BFS and k-core
    operators."""
    ds, counts, _, _ = _basket_pair_counts(sf_dir, nparts)
    return ds, counts.map_batches(
        lambda b: pa.table({"p1": b.column("ant"), "p2": b.column("cons")}),
        batch_format="pyarrow",
    )


def lineitem_basket_triangles(sf_dir: str):
    """Triangle count over the market-basket co-occurrence graph — the
    classic multi-join graph analytic. Distinct oriented edges
    (_basket_edges), then two distributed hash joins build and close
    the wedges; only the COUNT leaves the cluster. Edges are keyed
    p1 < p2 so every triangle is counted exactly once. For
    degree-skewed graphs the standard refinement is orienting each edge
    from its lower-(degree, id) endpoint, which bounds the wedge
    fan-out at O(√m) per vertex — the part-basket graph is
    near-uniform, so the simple orientation is used and the refinement
    is documented here for the skewed case."""
    from .stages.graph import triangle_count

    nparts = _join_partitions()
    _, e = _basket_edges(sf_dir, nparts)
    n = triangle_count(e, num_partitions=nparts)
    return pa.table({"triangles": pa.array([n], pa.int64())})


def basket_bfs_depth(sf_dir: str, max_hops: int = 3):
    """BFS hop-depth labelling from the minimum part key over the
    basket co-occurrence graph — the distributed graph-traversal
    operator (level-synchronous frontier expansion,
    ``stages/graph.bfs_depths``; reference parity: the crawl's wave
    loop as a pure relational fixed point). Edges are the same distinct
    co-occurrence pairs as ``lineitem_basket_triangles``, symmetrized
    in-block because the traversal is undirected. Oracle: DuckDB
    recursive CTE with per-round (id, depth) dedup, min(depth) per
    vertex."""
    from .stages.graph import bfs_depths

    nparts = _join_partitions()
    ds, e = _basket_edges(sf_dir, nparts)

    def sym(b: pa.Table) -> pa.Table:
        p1 = b.column("p1").to_numpy(zero_copy_only=False)
        p2 = b.column("p2").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([p1, p2]), pa.int64()),
                "dst": pa.array(np.concatenate([p2, p1]), pa.int64()),
            }
        )

    edges = e.map_batches(sym, batch_format="pyarrow")
    seed = int(ds.min("l_partkey"))
    out = bfs_depths(edges, [seed], max_hops, nparts)
    return out.map_batches(
        lambda b: b.rename_columns(["part", "depth"]), batch_format="pyarrow"
    )


def basket_kcore(sf_dir: str, k: int = 80, max_rounds: int = 8):
    """k-core decomposition of the basket co-occurrence graph
    (``stages/graph.kcore``): iteratively peel vertices with degree
    < k until fixed point, return the surviving core with in-core
    degrees. The graph-densification operator a crawl corpus uses to
    isolate strongly-interlinked host clusters (reference parity: the
    crawl's link graph; here exercised on the part-basket graph so the
    oracle is pure SQL). k=80 peels non-trivially at both test scales:
    at sf0.001 the whole graph dissolves (empty core — exercises the
    full-peel path); at sf0.01 a ~1.9k-vertex core survives after 6
    peel rounds. Oracle: ``max_rounds`` unrolled HAVING/semi-join CTE
    rounds — identical output whether or not the peel converges early,
    because converged rounds are no-ops on both sides."""
    from .stages.graph import kcore
    from .util import collect_arrow

    nparts = _join_partitions()
    _, e = _basket_edges(sf_dir, nparts)

    def sym(b: pa.Table) -> pa.Table:
        p1 = b.column("p1").to_numpy(zero_copy_only=False)
        p2 = b.column("p2").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([p1, p2]), pa.int64()),
                "dst": pa.array(np.concatenate([p2, p1]), pa.int64()),
            }
        )

    out = kcore(e.map_batches(sym, batch_format="pyarrow"), k, max_rounds, nparts)
    # the core vertex list is output-sized (≤ #parts); collect so the
    # fully-peeled case keeps its typed empty schema (Ray 2.49's
    # Dataset.to_pandas drops columns on an empty dataset)
    return collect_arrow(
        out,
        schema=pa.schema([("part", pa.int64()), ("degree", pa.int64())]),
    )


def embeddings_pca_top(sf_dir: str, iters: int = 500):
    """Top principal component of the embedding table — the
    dimensionality-reduction / drift-monitoring primitive (anisotropy
    removal, 'is the new shard's dominant direction the old one?').
    Distributed shape: each block emits ONE (min_id, n, Σx, Σxxᵀ)
    moment partial (the 64×64 Gram via one BLAS syrk per block); the
    driver sorts partials by min_id so the float fold order is a
    function of the BLOCK LAYOUT only (layout-deterministic, the
    label-centroids rule), forms the covariance, and runs a fixed-seed
    power iteration with sign normalization (first component of
    largest |loading| made positive). Rows-only (eigenvectors aren't
    SQL); pinned to numpy.linalg.eigh + determinism in tests."""
    from .stages.similarity import _vec_matrix
    from .util import collect_arrow

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"], blocks=8)

    def moments(b: pa.Table) -> pa.Table:
        X = _vec_matrix(b.column("embedding"))
        d = X.shape[1]
        return pa.table(
            {
                "min_id": pa.array(
                    [int(pc.min(b.column("vec_id")).as_py())], pa.int64()
                ),
                "n": pa.array([X.shape[0]], pa.int64()),
                "s": pa.array([X.sum(axis=0)], pa.list_(pa.float64(), d)),
                "g": pa.array([(X.T @ X).ravel()], pa.list_(pa.float64(), d * d)),
            }
        )

    parts = collect_arrow(
        ds.map_batches(moments, batch_format="pyarrow")
    ).sort_by("min_id")
    n = int(pc.sum(parts.column("n")).as_py())
    d = len(parts.column("s")[0])
    s = np.zeros(d)
    g = np.zeros(d * d)
    for i in range(parts.num_rows):  # ≤ blocks partials, sorted fold
        s += np.asarray(parts.column("s")[i].as_py())
        g += np.asarray(parts.column("g")[i].as_py())
    mean = s / n
    cov = g.reshape(d, d) / n - np.outer(mean, mean)
    v = np.zeros(d)
    v[0] = 1.0  # fixed deterministic seed
    for _ in range(iters):
        w = cov @ v
        v = w / np.linalg.norm(w)
    eigval = float(v @ (cov @ v))
    if v[int(np.argmax(np.abs(v)))] < 0:
        v = -v  # canonical sign
    return pa.table(
        {
            "dim": pa.array(np.arange(d, dtype=np.int64)),
            "loading": pa.array(v, pa.float64()),
            "eigenvalue": pa.array(np.full(d, eigval), pa.float64()),
        }
    )


def basket_rules(sf_dir: str, min_support: int = 3, k: int = 20):
    """Association-rule mining over market baskets (the Apriori /
    FP-growth output surface at itemset size 2): the top-``k`` part
    pairs by co-occurrence support, each with antecedent/consequent
    supports, confidence and lift — the classic recommender /
    query-expansion primitive. Distributed shape: pair supports come
    straight from the shared sort + vectorized run-pair-emission build
    (_basket_pair_counts — each order contributes each distinct pair
    once, so the count IS the support); the HAVING prune cuts to
    frequent pairs, then item supports (vertex-sized) annotate via ONE
    broadcast searchsorted lookup — no pair re-shuffle (flip to two
    hash joins past web part cardinality: the tfidf broadcast/join
    threshold seam); top-k via per-block (sup desc, ant, cons)
    partials merged on the driver (≤ blocks·k rows). Confidence and
    lift are single divisions over exact int64 counts, expressions
    mirrored in the oracle."""
    from .util import collect_arrow, drop_empty_blocks

    nparts = _join_partitions()
    _, counts, isup, n_orders = _basket_pair_counts(sf_dir, nparts)

    pairs = drop_empty_blocks(
        counts.map_batches(
            lambda b: b.rename_columns(["ant", "cons", "sup_ab"]),
            batch_format="pyarrow",
        ).filter(expr=f"sup_ab >= {min_support}")
        # the HAVING prune can empty whole partitions; scrub so
        # downstream stages never meet a zero-column block
    )

    # item supports are vertex-sized (≤ #parts) — broadcast one sorted
    # (key, sup) pair of arrays and annotate with searchsorted instead
    # of two hash joins (each join re-shuffles the pair table; at
    # open-web part cardinality flip back to the join form — the tfidf
    # broadcast/join threshold seam)
    it = collect_arrow(
        isup, schema=pa.schema([("p", pa.int64()), ("sup", pa.int64())])
    )
    keys = it.column("p").to_numpy(zero_copy_only=False).astype(np.int64)
    sups = it.column("sup").to_numpy(zero_copy_only=False).astype(np.int64)
    ksort = np.argsort(keys)
    sup_ref = ray.put((keys[ksort], sups[ksort]))

    def annotate(b: pa.Table) -> pa.Table:
        kk, ss = ray.get(sup_ref)
        ant = b.column("ant").to_numpy(zero_copy_only=False).astype(np.int64)
        cons = b.column("cons").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "ant": b.column("ant"),
                "cons": b.column("cons"),
                "sup_ab": b.column("sup_ab"),
                "sup_a": pa.array(ss[np.searchsorted(kk, ant)]),
                "sup_b": pa.array(ss[np.searchsorted(kk, cons)]),
            }
        )

    joined = pairs.map_batches(annotate, batch_format="pyarrow")

    def block_topk(b: pa.Table) -> pa.Table:
        ant = b.column("ant").to_numpy(zero_copy_only=False)
        cons = b.column("cons").to_numpy(zero_copy_only=False)
        sup = b.column("sup_ab").to_numpy(zero_copy_only=False)
        order = np.lexsort((cons, ant, -sup))[:k]
        return b.select(["ant", "cons", "sup_ab", "sup_a", "sup_b"]).take(
            pa.array(order)
        )

    cand = collect_arrow(
        joined.map_batches(block_topk, batch_format="pyarrow"),
        schema=pa.schema(
            [
                ("ant", pa.int64()),
                ("cons", pa.int64()),
                ("sup_ab", pa.int64()),
                ("sup_a", pa.int64()),
                ("sup_b", pa.int64()),
            ]
        ),
    )
    ant = cand.column("ant").to_numpy(zero_copy_only=False)
    cons = cand.column("cons").to_numpy(zero_copy_only=False)
    sup = cand.column("sup_ab").to_numpy(zero_copy_only=False)
    order = np.lexsort((cons, ant, -sup))[:k]
    top = cand.take(pa.array(order))
    sup_ab = pc.cast(top.column("sup_ab"), pa.int64())
    s_a = pc.cast(top.column("sup_a"), pa.int64())
    s_b = pc.cast(top.column("sup_b"), pa.int64())
    conf = pc.divide(
        pc.cast(sup_ab, pa.float64()), pc.cast(s_a, pa.float64())
    )
    lift = pc.divide(
        pc.cast(pc.multiply(sup_ab, pa.scalar(n_orders, pa.int64())), pa.float64()),
        pc.cast(pc.multiply(s_a, s_b), pa.float64()),
    )
    return pa.table(
        {
            "ant": pc.cast(top.column("ant"), pa.int64()),
            "cons": pc.cast(top.column("cons"), pa.int64()),
            "sup_ab": sup_ab,
            "sup_a": s_a,
            "sup_b": s_b,
            "confidence": conf,
            "lift": lift,
        }
    )


def orders_chi2(sf_dir: str):
    """Pearson chi-square test of independence between order status and
    priority — the categorical-association statistic an analyst runs
    before trusting a segmentation. The contingency table is exact
    int64 (block-local group_by partials → one cell groupby); the
    driver folds cells-many rows and accumulates
    (obs − exp)²/exp STRICTLY in (status, priority) order with
    exp = double(row_tot·col_tot)/double(n) — both mirrored in the
    oracle's ordered aggregate, so the double is bit-equal."""
    ds = _pq(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"], blocks=8)

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["o_orderstatus", "o_orderpriority"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["s", "p", "obs"])

    from .util import collect_arrow, drop_empty_blocks

    cells = collect_arrow(
        drop_empty_blocks(
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["s", "p"])
            .aggregate(Sum("obs", alias_name="obs"))
        ),
        schema=pa.schema(
            [("s", pa.string()), ("p", pa.string()), ("obs", pa.int64())]
        ),
    ).to_pandas()
    n = int(cells["obs"].sum())
    rs = cells.groupby("s")["obs"].sum().to_dict()
    cs = cells.groupby("p")["obs"].sum().to_dict()
    chi2 = 0.0
    for _, row in cells.sort_values(["s", "p"]).iterrows():
        exp = float(int(rs[row["s"]]) * int(cs[row["p"]])) / float(n)
        d = float(row["obs"]) - exp
        chi2 += d * d / exp
    dof = (len(rs) - 1) * (len(cs) - 1)
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "dof": pa.array([dof], pa.int64()),
            "chi2": pa.array([chi2], pa.float64()),
        }
    )


def orders_mutual_info(sf_dir: str):
    """Mutual information I(status; priority) in bits — the
    information-theoretic dependence measure (chi-square's sibling;
    what a feature-selection pass ranks candidate columns by). Same
    distributed shape as orders_chi2: exact int64 contingency cells
    from block partials, then the driver accumulates
    (obs/n)·log2(obs·n / (rs·cs)) STRICTLY in (s, p) order — obs·n and
    rs·cs stay < 2^53 so the ratio is an exact-integer quotient and
    the double is bit-equal to the oracle's ordered aggregate."""
    import math

    ds = _pq(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"], blocks=8)

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["o_orderstatus", "o_orderpriority"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["s", "p", "obs"])

    from .util import collect_arrow, drop_empty_blocks

    cells = collect_arrow(
        drop_empty_blocks(
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["s", "p"])
            .aggregate(Sum("obs", alias_name="obs"))
        ),
        schema=pa.schema(
            [("s", pa.string()), ("p", pa.string()), ("obs", pa.int64())]
        ),
    ).to_pandas()
    n = int(cells["obs"].sum())
    rs = cells.groupby("s")["obs"].sum().to_dict()
    cs = cells.groupby("p")["obs"].sum().to_dict()
    mi = 0.0
    for _, row in cells.sort_values(["s", "p"]).iterrows():
        obs = int(row["obs"])
        mi += (obs / n) * math.log2(
            float(obs * n) / float(int(rs[row["s"]]) * int(cs[row["p"]]))
        )
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "mi_bits": pa.array([mi], pa.float64()),
        }
    )


def orders_time_decay(sf_dir: str, half_life_days: int = 30):
    """Exponential time-decay revenue per customer — the recency-
    weighted LTV feature (weight halves every ``half_life_days``).
    Days-from-anchor is exact integer µs arithmetic (mirrored via
    epoch_us in SQL); each customer's Σ cents·2^(−days/half_life) is
    accumulated STRICTLY in (o_orderdate, o_orderkey) order. r5: ONE
    global (cust, days DESC, orderkey) sort + an across-customer
    kernel via util.sorted_group_apply — terms fold column-by-column
    over a (customers × max-orders) padded matrix, which reproduces
    the strict left-to-right addition bit-for-bit (x + 0.0 ≡ x; the
    reduceat shortcut would re-associate, see BASELINE.md r4 entropy
    note), and the 2^(−d/h) weights come from a Python-pow LUT over
    the ≤ few-thousand distinct day values so libm pow parity with
    the oracle is preserved. No per-customer Python dispatch."""
    ds = _pq(
        sf_dir,
        "orders",
        ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
        blocks=8,
    )
    anchor_us = 1009756800000000  # epoch µs of TIMESTAMP '2001-12-31'

    def prep(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("o_orderdate"), pa.int64())
        days = pc.divide(
            pc.subtract(pa.scalar(anchor_us, pa.int64()), ts),
            pa.scalar(86_400_000_000, pa.int64()),
        )
        return pa.table(
            {
                "cust": b.column("o_custkey"),
                "ok": b.column("o_orderkey"),
                "days": days,
                "cents": _cents(b.column("o_totalprice")),
            }
        )

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "o_custkey": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                    "decayed_cents": pa.array([], pa.float64()),
                }
            )
        cust = t.column("cust").to_numpy(zero_copy_only=False)
        days = t.column("days").to_numpy(zero_copy_only=False)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        n = cust.size
        starts = np.flatnonzero(np.r_[True, cust[1:] != cust[:-1]])
        runlens = np.diff(np.r_[starts, n])
        # libm-pow LUT over distinct day values (Python 2.0**x, not a
        # numpy SIMD pow — bit parity with the oracle's pow)
        ud = np.unique(days)
        lut = np.array(
            [2.0 ** (-float(d) / float(half_life_days)) for d in ud], np.float64
        )
        terms = cents.astype(np.float64) * lut[np.searchsorted(ud, days)]
        g_count = starts.size
        width = int(runlens.max())
        M = np.zeros((g_count, width), np.float64)
        gi = np.repeat(np.arange(g_count, dtype=np.int64), runlens)
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, runlens)
        M[gi, pos] = terms
        s = np.zeros(g_count, np.float64)
        for j in range(width):  # strict in-order fold, all customers at once
            s = s + M[:, j]
        return pa.table(
            {
                "o_custkey": pa.array(cust[starts], pa.int64()),
                "n_orders": pa.array(runlens.astype(np.int64), pa.int64()),
                "decayed_cents": pa.array(s, pa.float64()),
            }
        )

    from .util import sorted_group_apply

    return sorted_group_apply(
        ds.map_batches(prep, batch_format="pyarrow"),
        "cust",
        ["days", "ok"],
        kernel,
        descending=[True, False],
    )


def supplier_part_coverage(sf_dir: str, max_size: int = 2, k: int = 10):
    """Relational division, ranked: which suppliers ship (all of, or
    the most of) the universe of small parts (p_size ≤ ``max_size``)
    seen in lineitem — the set-containment operator behind
    'supplier covers the whole catalog segment' checks. Universe ids
    broadcast via ``ray.put`` (segment-sized); distinct (supp, part)
    via block dedup + one groupby; coverage counts per supplier; the
    exact-division flag is cnt == |universe|. Top-``k`` by
    (coverage desc, suppkey) so the ranking is non-degenerate at any
    scale even when nobody divides exactly."""
    from .util import collect_arrow, drop_empty_blocks

    parts = _pq(sf_dir, "part", ["p_partkey", "p_size"]).filter(
        expr=f"p_size <= {max_size}"
    )
    small = set(
        collect_arrow(
            parts, schema=pa.schema([("p_partkey", pa.int64()), ("p_size", pa.int32())])
        )
        .column("p_partkey")
        .to_pylist()
    )
    ds = _pq(sf_dir, "lineitem", ["l_suppkey", "l_partkey"], blocks=16)
    universe_ref = ray.put(np.array(sorted(small), dtype=np.int64))

    def block_distinct(b: pa.Table) -> pa.Table:
        uni = ray.get(universe_ref)
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        keep = pa.array(np.isin(pk, uni))
        return (
            b.filter(keep)
            .group_by(["l_suppkey", "l_partkey"])
            .aggregate([])
            .rename_columns(["s", "p"])
        )

    sp = drop_empty_blocks(
        _sorted_agg_by_key(
            ds.map_batches(block_distinct, batch_format="pyarrow"),
            ["s", "p"],
            [(None, "count", "_c")],
        )
    )
    universe_in_li = int(
        drop_empty_blocks(
            _sorted_agg_by_key(sp, "p", [(None, "count", "_c")])
        ).count()
    )
    cov = collect_arrow(
        drop_empty_blocks(
            _sorted_agg_by_key(sp, "s", [(None, "count", "n_parts")])
        ),
        schema=pa.schema([("s", pa.int64()), ("n_parts", pa.int64())]),
    )
    s_arr = cov.column("s").to_numpy(zero_copy_only=False)
    n_arr = cov.column("n_parts").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((s_arr, -n_arr))[:k]
    return pa.table(
        {
            "suppkey": pa.array(s_arr[order].astype(np.int64)),
            "n_parts": pa.array(n_arr[order]),
            "universe": pa.array(
                np.full(len(order), universe_in_li, dtype=np.int64)
            ),
            "full_cover": pa.array(
                (n_arr[order] == universe_in_li).astype(np.int64)
            ),
        }
    )


def corpus_mip_levels(sf_dir: str):
    """Mipmap pyramid geometry: for every image, each level's
    (w >> level, h >> level) dimensions down to 1×1 — the LOD plan a
    texture/thumbnail pipeline materializes before generating the
    actual pyramid (generation belongs to the decode actor pool; this
    is the integer-exact plan, same contract as corpus_patch_grid).
    n_levels = ⌊log2(max(w,h))⌋ + 1; log2 of small ints is IEEE-exact
    on both engines. Vectorized np.repeat fan-out per block."""
    ds = corpus_parquet(columns=["image_id", "w", "h"])

    def levels(b: pa.Table) -> pa.Table:
        w = pc.cast(b.column("w"), pa.int64()).to_numpy(zero_copy_only=False)
        h = pc.cast(b.column("h"), pa.int64()).to_numpy(zero_copy_only=False)
        nlev = np.floor(np.log2(np.maximum(w, h))).astype(np.int64) + 1
        total = int(nlev.sum())
        rows = np.repeat(np.arange(len(w)), nlev)
        starts = np.zeros(len(w) + 1, dtype=np.int64)
        np.cumsum(nlev, out=starts[1:])
        lev = np.arange(total, dtype=np.int64) - np.repeat(starts[:-1], nlev)
        return pa.table(
            {
                "image_id": b.column("image_id").take(pa.array(rows)),
                "level": pa.array(lev),
                "w_l": pa.array(np.maximum(w[rows] >> lev, 1)),
                "h_l": pa.array(np.maximum(h[rows] >> lev, 1)),
            }
        )

    return ds.map_batches(levels, batch_format="pyarrow")


def docs_token_offsets(sf_dir: str, max_doc: int = 40):
    """Token ↔ character-span alignment: for each document, every
    whitespace-delimited token with its (token_idx, start_char,
    end_char) span — the training-data primitive for span labelling
    (NER offsets, answer-span supervision, byte↔token maps). Capped at
    ``max_doc`` docs because the output is token-sized, not doc-sized.

    Vectorized shape: per batch, all texts are joined into ONE buffer
    (separator '\\n' is in the delimiter class, so tokens never span
    docs), decoded once to a uint32 codepoint array, and token
    boundaries found with pure numpy mask shifts — no per-row regex.
    The only per-token Python is the final string slice, which is
    output-sized. Oracle: DuckDB recursive CTE peeling one token per
    round with ltrim/regexp_extract (char offsets on both sides)."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=4).filter(
        expr=f"doc_id < {max_doc}"
    )
    _ws_codes = np.array([9, 10, 13, 32], dtype=np.uint32)

    def offsets(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], b.schema.field("doc_id").type),
                "token_idx": pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "start_char": pa.array([], pa.int64()),
                "end_char": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        texts = b.column("text").to_pylist()
        doc_ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        big = "\n".join(texts)
        codes = np.frombuffer(big.encode("utf-32-le"), dtype=np.uint32)
        # char offset where each doc starts inside the joined buffer
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
        doc_starts = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(lens[:-1] + 1, out=doc_starts[1:])
        is_tok = ~np.isin(codes, _ws_codes)
        if not is_tok.any():
            return empty
        prev = np.empty_like(is_tok)
        prev[0] = False
        prev[1:] = is_tok[:-1]
        nxt = np.empty_like(is_tok)
        nxt[-1] = False
        nxt[:-1] = is_tok[1:]
        s = np.flatnonzero(is_tok & ~prev)
        e = np.flatnonzero(is_tok & ~nxt) + 1
        di = np.searchsorted(doc_starts, s, side="right") - 1
        newgrp = np.empty(len(di), dtype=bool)
        newgrp[0] = True
        newgrp[1:] = di[1:] != di[:-1]
        grp_first = np.flatnonzero(newgrp)
        token_idx = np.arange(len(di), dtype=np.int64) - grp_first[
            np.cumsum(newgrp) - 1
        ]
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[di], b.schema.field("doc_id").type),
                "token_idx": pa.array(token_idx),
                "token": pa.array([big[a:z] for a, z in zip(s, e)], pa.string()),
                "start_char": pa.array(s - doc_starts[di]),
                "end_char": pa.array(e - doc_starts[di]),
            }
        )

    return ds.map_batches(offsets, batch_format="pyarrow")


def orders_ntile(sf_dir: str, tiles: int = 8):
    """GLOBAL equi-depth NTILE bucketing — the feature-binning
    primitive for quantile discretization. Unlike orders_price_window's
    per-partition ntile (map_groups; partition fits one group), this is
    the unpartitioned window: no key to shard on, so it reuses
    stages/window.global_row_number (range-sort + per-block offset
    stamping; the driver holds one row COUNT per block, never rows);
    each block then derives its tile from (rn, N, k) arithmetic
    locally — SQL NTILE's first (N mod k) tiles get ceil(N/k) rows."""
    from .stages.window import global_row_number

    ds = _pq(sf_dir, "orders", ["o_orderkey", "o_totalprice"], blocks=8)
    rn = global_row_number(ds, ["o_totalprice", "o_orderkey"], out_col="rn")
    total = rn.count()  # post-materialize: a metadata sum, no scan
    big = total % tiles
    small = total // tiles
    cut = big * (small + 1)

    def stamp(b: pa.Table) -> pa.Table:
        r = b.column("rn").to_numpy() - 1  # 0-based global rank
        if small == 0:  # fewer rows than tiles: one row per tile
            tile = r + 1
        else:
            tile = np.where(r < cut, r // (small + 1), big + (r - cut) // small) + 1
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "tile": pa.array(tile.astype(np.int64)),
            }
        )

    return rn.map_batches(stamp, batch_format="pyarrow")


def _skyline2d(cents: np.ndarray, dates: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the 2-D Pareto frontier (maximize ``cents``,
    minimize ``dates``). A point is dropped only if some other point is
    ≥ on cents AND ≤ on dates AND strictly better on at least one —
    exact duplicates are both kept. One lexsort, one grouped reduceat,
    one prefix-min: no Python loop."""
    n = len(cents)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((dates, -cents))  # cents desc, date asc
    c, d = cents[order], dates[order]
    new_grp = np.concatenate(([True], c[1:] != c[:-1]))
    starts = np.flatnonzero(new_grp)
    gmin = np.minimum.reduceat(d, starts)  # min date per equal-cents group
    # exclusive prefix-min of dates over strictly-greater-cents groups
    prev = np.concatenate(
        ([np.iinfo(np.int64).max], np.minimum.accumulate(gmin)[:-1])
    )
    gidx = np.cumsum(new_grp) - 1
    keep_sorted = (d == gmin[gidx]) & (d < prev[gidx])
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


def orders_pareto(sf_dir: str):
    """2-D Pareto frontier (skyline) — orders undominated on
    (max price, earliest date). The skyline operator has an exact
    combiner: a globally undominated point is undominated inside its
    block, so skyline(∪ block skylines) = skyline(all). Each block ships
    only its local frontier (O(log n) points in expectation for
    independent dimensions) and the driver-side merge reruns the same
    vectorized kernel on that tiny union — no shuffle at all."""
    from .util import collect_arrow

    ds = _pq(
        sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"], blocks=8
    )

    def _dates_us(col) -> np.ndarray:
        return (
            pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
            .to_numpy(zero_copy_only=False)
        )

    def local_sky(b: pa.Table) -> pa.Table:
        cents = _cents(b.column("o_totalprice")).to_numpy()
        keep = _skyline2d(cents, _dates_us(b.column("o_orderdate")))
        idx = pa.array(np.flatnonzero(keep))
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey").take(idx),
                "price_cents": pa.array(cents[keep]),
                "o_orderdate": b.column("o_orderdate").take(idx),
            }
        )

    partials = collect_arrow(ds.map_batches(local_sky, batch_format="pyarrow"))
    keep = _skyline2d(
        partials.column("price_cents").to_numpy(zero_copy_only=False),
        _dates_us(partials.column("o_orderdate")),
    )
    out = partials.filter(pa.array(keep))
    return out.take(pc.sort_indices(out, sort_keys=[("o_orderkey", "ascending")]))


def events_transitions(sf_dir: str):
    """First-order Markov transition counts over each user's event
    sequence ordered by (ts, event_id) — the sequence-mining /
    session-model estimation primitive. r5: ONE global
    (user, ts, event_id) sort + an across-user kernel via
    util.sorted_group_apply that shifts the type column once and keeps
    only same-user adjacencies, PRE-COUNTED per block (combiner), so
    the remaining exchange is the |types|²-row pair groupby; counts
    are int64 end-to-end."""
    from .util import collect_arrow, sorted_group_apply

    ds = _pq(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"], blocks=16)

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "prev_type": pa.array([], pa.string()),
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if t.num_rows < 2:
            return empty
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        et = t.column("event_type").combine_chunks()
        same = pa.array(uid[1:] == uid[:-1])
        prs = pa.table(
            {
                "prev_type": et.slice(0, len(et) - 1).filter(same),
                "event_type": et.slice(1).filter(same),
            }
        )
        if prs.num_rows == 0:
            return empty
        gb = prs.group_by(["prev_type", "event_type"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "prev_type": gb.column("prev_type"),
                "event_type": gb.column("event_type"),
                "n": pc.cast(gb.column("count_all"), pa.int64()),
            }
        )

    agg = (
        sorted_group_apply(ds, "user_id", ["ts", "event_id"], kernel)
        .groupby(["prev_type", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
    )
    t = collect_arrow(agg)
    return t.take(
        pc.sort_indices(
            t,
            sort_keys=[("prev_type", "ascending"), ("event_type", "ascending")],
        )
    )


def events_retention(sf_dir: str):
    """Retention cohort analysis: users are cohorted by the DAY of
    their first event; each (cohort_day, day_offset) cell counts the
    DISTINCT cohort users active on that offset day — the standard
    product-analytics retention matrix, and a temporal self-join shape
    (per-key min related back onto the fact stream). Because BOTH the
    first-touch min and the per-user distinct-day dedup key on
    user_id, the whole thing needs exactly ONE fact-sized exchange:
    groupby(user).map_groups computes the user's first day, its
    distinct offset days and the cohort in place and emits ≤ |days|
    pre-counted cell rows per user; a tiny (cohort, offset) groupby
    sums them. (An earlier min-groupby + join-back + triple-groupby
    plan did three exchanges and ran 3× slower at sf0.1.)"""
    from .util import collect_arrow

    US_PER_DAY = 86_400_000_000

    ev = _pq(sf_dir, "events", ["user_id", "ts"], blocks=16)

    def _cells(uid: np.ndarray, day: np.ndarray) -> pa.Table:
        """(uid, day) sorted by (user, day), COMPLETE users → cell
        count partial (cohort_us, day_offset, n) — first-touch min,
        per-user distinct-day dedup and the cohort emit all vectorized
        across every user at once (sort-kernel form of the per-user
        map_groups)."""
        if uid.size == 0:
            return pa.table(
                {
                    "cohort_us": pa.array([], pa.int64()),
                    "day_offset": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        ustarts = np.flatnonzero(new_user)
        first = np.repeat(day[ustarts], np.diff(np.r_[ustarts, uid.size]))
        distinct = new_user | np.r_[True, day[1:] != day[:-1]]
        g = (
            pa.table(
                {
                    "cohort_us": pa.array(
                        (first[distinct] * US_PER_DAY).astype(np.int64)
                    ),
                    "day_offset": pa.array(
                        (day[distinct] - first[distinct]).astype(np.int64)
                    ),
                }
            )
            .group_by(["cohort_us", "day_offset"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["cohort_us", "day_offset", "n"])

    pre = ev.map_batches(
        lambda b: pa.table(
            {
                "user_id": pc.cast(b.column("user_id"), pa.int64()),
                "day": pc.cast(
                    pc.divide(
                        pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")), pa.int64()),
                        US_PER_DAY,
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def runs(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "kind": pa.array([], pa.int8()),
                "user_id": pa.array([], pa.int64()),
                "day": pa.array([], pa.int64()),
                "cohort_us": pa.array([], pa.int64()),
                "day_offset": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        uid = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        day = b.column("day").to_numpy(zero_copy_only=False).astype(np.int64)
        em = (uid == uid[0]) | (uid == uid[-1])
        done = _cells(uid[~em], day[~em])
        n_e, n_d = int(em.sum()), done.num_rows
        return pa.table(
            {
                "kind": pa.array(np.r_[np.zeros(n_e, np.int8), np.ones(n_d, np.int8)]),
                "user_id": pa.array(
                    np.r_[uid[em], np.zeros(n_d, np.int64)], pa.int64()
                ),
                "day": pa.array(np.r_[day[em], np.zeros(n_d, np.int64)], pa.int64()),
                "cohort_us": pa.array(
                    np.r_[np.zeros(n_e, np.int64), done.column("cohort_us").to_numpy()],
                    pa.int64(),
                ),
                "day_offset": pa.array(
                    np.r_[np.zeros(n_e, np.int64), done.column("day_offset").to_numpy()],
                    pa.int64(),
                ),
                "n": pa.array(
                    np.r_[np.zeros(n_e, np.int64), done.column("n").to_numpy()],
                    pa.int64(),
                ),
            }
        )

    parts = collect_arrow(
        pre.sort(["user_id", "day"]).map_batches(runs, batch_format="pyarrow"),
        schema=pa.schema(
            [
                ("kind", pa.int8()),
                ("user_id", pa.int64()),
                ("day", pa.int64()),
                ("cohort_us", pa.int64()),
                ("day_offset", pa.int64()),
                ("n", pa.int64()),
            ]
        ),
    )
    kind = parts.column("kind").to_numpy()
    cells = [
        pa.table(
            {
                "cohort_us": parts.column("cohort_us").filter(pa.array(kind == 1)),
                "day_offset": parts.column("day_offset").filter(pa.array(kind == 1)),
                "n": parts.column("n").filter(pa.array(kind == 1)),
            }
        )
    ]
    eu = parts.column("user_id").to_numpy()[kind == 0]
    ed = parts.column("day").to_numpy()[kind == 0]
    if eu.size:
        o = np.lexsort((ed, eu))
        cells.append(_cells(eu[o], ed[o]))
    t = (
        pa.concat_tables(cells)
        .group_by(["cohort_us", "day_offset"])
        .aggregate([("n", "sum")])
        .rename_columns(["cohort_us", "day_offset", "n_users"])
    )
    out = pa.table(
        {
            "cohort_day": pc.cast(t.column("cohort_us"), pa.timestamp("us")),
            "day_offset": t.column("day_offset"),
            "n_users": t.column("n_users"),
        }
    )
    return out.take(
        pc.sort_indices(
            out,
            sort_keys=[("cohort_day", "ascending"), ("day_offset", "ascending")],
        )
    )


def lineitem_weighted_median(sf_dir: str):
    """Exact grouped WEIGHTED median (price weighted by quantity) —
    the order-statistic no decomposable aggregate gives you. Plan:
    block-local ``group_by(key, price).sum(weight)`` combiner (the
    exchange then carries distinct (key, price) rows, not facts) →
    distributed groupby-sum → per-key ``map_groups`` sorts its
    distinct prices, prefix-sums the weights and picks the lower
    weighted median (first price where 2·cumw ≥ totw — mirrored
    verbatim in the oracle's window form). Prices are int64 cents
    end-to-end; the only float op is the final /100.0, identical in
    SQL. For a key whose distinct-value set itself overflows a group,
    stages/quantile's iterative histogram refinement is the scale
    path — documented there for the weighted case too."""
    from .util import collect_arrow

    ds = _pq(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_extendedprice", "l_quantity"],
        blocks=16,
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": b.column("l_returnflag"),
                "p": _cents(b.column("l_extendedprice")),
                "w": pc.cast(b.column("l_quantity"), pa.int64()),
            }
        )
        g = t.group_by(["k", "p"]).aggregate([("w", "sum")])
        return g.rename_columns(["k", "p", "w"])

    def pick(g: pa.Table) -> pa.Table:
        p = g.column("p").to_numpy(zero_copy_only=False)
        w = g.column("w").to_numpy(zero_copy_only=False)
        order = np.argsort(p, kind="stable")
        cw = np.cumsum(w[order])
        idx = int(np.searchsorted(2 * cw, cw[-1], side="left"))
        return pa.table(
            {
                "l_returnflag": g.column("k").slice(0, 1),
                "weighted_median_price": pa.array(
                    [float(p[order][idx]) / 100.0], pa.float64()
                ),
            }
        )

    agg = (
        _sorted_agg_by_key(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["k", "p"],
            [("w", "sum", "w")],
        )
        .groupby("k")
        .map_groups(pick, batch_format="pyarrow")
    )
    t = collect_arrow(agg)
    return t.take(pc.sort_indices(t, sort_keys=[("l_returnflag", "ascending")]))


def events_minute_gapfill(sf_dir: str):
    """Time-series densification: per-minute event count + value sum
    over a COMPLETE minute grid from the first to the last event, gaps
    zero-filled — the feature-store resample shape (downstream window
    models need every tick present). The sparse per-minute aggregate
    is one fact-sized groupby with cents partials; the grid is
    generated DISTRIBUTEDLY (``ray.data.range`` over minute ordinals —
    a year is only ~526k rows but a sensor fleet's grid can be
    key × minutes, so it must not be a driver list) and left-outer
    joined against the sparse aggregate; nulls coalesce to zero
    in-block. Driver holds two scalars (min/max minute)."""
    import ray.data as rd

    from .util import collect_arrow, drop_empty_blocks

    US_PER_MIN = 60_000_000

    ev = _pq(sf_dir, "events", ["ts", "value"], blocks=16)

    def partial(b: pa.Table) -> pa.Table:
        mins = (
            pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")), pa.int64())
            .to_numpy(zero_copy_only=False)
            // US_PER_MIN
        )
        t = pa.table(
            {
                "minute_us": pa.array(mins * US_PER_MIN),
                "cents": _cents(b.column("value")),
                "one": pa.array(np.ones(len(mins), dtype=np.int64)),
            }
        )
        g = t.group_by("minute_us").aggregate([("cents", "sum"), ("one", "sum")])
        return g.rename_columns(["minute_us", "cents", "n"])

    sparse = drop_empty_blocks(
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("minute_us")
        .aggregate(Sum("cents", alias_name="cents"), Sum("n", alias_name="n"))
    ).materialize()
    mn = int(sparse.min("minute_us"))
    mx = int(sparse.max("minute_us"))

    grid = rd.range((mx - mn) // US_PER_MIN + 1).map_batches(
        lambda b: pa.table(
            {"minute_us": pa.array(b["id"].astype(np.int64) * US_PER_MIN + mn)}
        ),
        batch_format="numpy",
    )

    def finish(b: pa.Table) -> pa.Table:
        cents = pc.coalesce(b.column("cents"), pa.scalar(0, pa.int64()))
        return pa.table(
            {
                "minute": pc.cast(b.column("minute_us"), pa.timestamp("us")),
                "n": pc.coalesce(b.column("n"), pa.scalar(0, pa.int64())),
                "sum_value": pc.divide(pc.cast(cents, pa.float64()), 100.0),
            }
        )

    joined = grid.join(
        sparse, "left_outer", _join_partitions(), on=("minute_us",)
    ).map_batches(finish, batch_format="pyarrow")
    t = collect_arrow(joined)
    return t.take(pc.sort_indices(t, sort_keys=[("minute", "ascending")]))


def events_user_entropy(sf_dir: str):
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity feature (bot / power-user detection: H≈0 is a
    single-action account, H≈ln(types) is uniform). ONE exchange:
    block-local (user, type) count partials ride a global (user, type)
    SORT; each block folds its interior users fully vectorized
    (consecutive-pair dedup-sum, per-user reduceat of Σ c·ln(c) in
    type order — numpy reduces the ≤|types|-term segments strictly
    left-to-right, the order the oracle mirrors with DuckDB's
    ordered-aggregate ``sum(... ORDER BY event_type)``), boundary
    users patch on the driver through the identical kernel. H = ln(n)
    − Σ c·ln(c) / n (counts exact ints, only this expression is
    float); no per-user Python call."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type"], blocks=16)

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id", "event_type"]).aggregate([([], "count_all")])
        return g.rename_columns(["user_id", "event_type", "c"])

    def _entropy_all(uid: np.ndarray, et: pa.Array, c: np.ndarray) -> pa.Table:
        """(uid, type, c) sorted by (user, type), COMPLETE users →
        per-user entropy rows, vectorized across every user (sort-
        kernel form of the map_groups). Σ c·ln(c) runs per user run
        via reduceat over ≤|types| terms — numpy reduces such short
        segments strictly left-to-right, the ordered-aggregate
        semantics the oracle mirrors."""
        if uid.size == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "n_types": pa.array([], pa.int64()),
                    "entropy": pa.array([], pa.float64()),
                }
            )
        import math

        def libm_log(vals: np.ndarray) -> np.ndarray:
            # libm log via a unique-value LUT: numpy's SIMD np.log can
            # differ from libm by 1 ulp, and the oracle's DuckDB ln IS
            # libm — counts repeat heavily so the LUT is tiny
            uq, inv = np.unique(vals, return_inverse=True)
            lut = np.array([math.log(float(v)) for v in uq], np.float64)
            return lut[inv]

        new_user = np.r_[True, uid[1:] != uid[:-1]]
        pair_new = new_user | np.r_[
            True,
            pc.not_equal(et.slice(1), et.slice(0, len(et) - 1)).to_numpy(
                zero_copy_only=False
            ),
        ]
        pstarts = np.flatnonzero(pair_new)
        c_tot = np.add.reduceat(c, pstarts).astype(np.float64)
        u_p = uid[pstarts]
        ustarts = np.flatnonzero(np.r_[True, u_p[1:] != u_p[:-1]])
        n_types = np.diff(np.r_[ustarts, u_p.size])
        n = np.add.reduceat(c_tot, ustarts)  # ints in float64 — exact
        # strict LEFT-TO-RIGHT per-user float sum, vectorized ACROSS
        # users: pad each user's c·ln(c) terms into a (users, ≤|types|)
        # matrix and fold its columns sequentially (reduceat/pairwise
        # would change the accumulation order the oracle's ordered
        # aggregate pins; adding the 0.0 padding is bit-neutral)
        terms = c_tot * libm_log(c_tot)
        width = int(n_types.max())
        pos = np.arange(u_p.size) - np.repeat(ustarts, n_types)
        M = np.zeros((ustarts.size, width), np.float64)
        M[np.repeat(np.arange(ustarts.size), n_types), pos] = terms
        s = M[:, 0].copy()
        for j in range(1, width):
            s = s + M[:, j]
        return pa.table(
            {
                "user_id": pa.array(u_p[ustarts], pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
                "n_types": pa.array(n_types.astype(np.int64), pa.int64()),
                "entropy": pa.array(libm_log(n) - s / n, pa.float64()),
            }
        )

    from .util import collect_arrow

    def runs(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "kind": pa.array([], pa.int8()),
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "c": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "n_types": pa.array([], pa.int64()),
                "entropy": pa.array([], pa.float64()),
            }
        )
        if b.num_rows == 0:
            return empty
        uid = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        et = b.column("event_type")
        et = et.combine_chunks() if isinstance(et, pa.ChunkedArray) else et
        c = b.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        em = (uid == uid[0]) | (uid == uid[-1])
        done = _entropy_all(uid[~em], et.filter(pa.array(~em)), c[~em])
        n_e, n_d = int(em.sum()), done.num_rows
        return pa.table(
            {
                "kind": pa.array(np.r_[np.zeros(n_e, np.int8), np.ones(n_d, np.int8)]),
                "user_id": pa.array(
                    np.r_[uid[em], done.column("user_id").to_numpy()], pa.int64()
                ),
                "event_type": pa.concat_arrays(
                    [
                        et.filter(pa.array(em)).cast(pa.string()),
                        pa.array([""] * n_d, pa.string()),
                    ]
                ),
                "c": pa.array(np.r_[c[em], np.zeros(n_d, np.int64)], pa.int64()),
                "n": pa.array(
                    np.r_[np.zeros(n_e, np.int64), done.column("n").to_numpy()],
                    pa.int64(),
                ),
                "n_types": pa.array(
                    np.r_[np.zeros(n_e, np.int64), done.column("n_types").to_numpy()],
                    pa.int64(),
                ),
                "entropy": pa.array(
                    np.r_[np.zeros(n_e, np.float64), done.column("entropy").to_numpy()],
                    pa.float64(),
                ),
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .sort(["user_id", "event_type"])
        .map_batches(runs, batch_format="pyarrow")
        .materialize()
    )
    interior = parts.filter(expr="kind == 1").map_batches(
        lambda b: b.select(["user_id", "n", "n_types", "entropy"]),
        batch_format="pyarrow",
    )
    edge = collect_arrow(parts.filter(expr="kind == 0"))
    if edge.num_rows == 0:
        return interior
    eu = edge.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    et_e = edge.column("event_type").combine_chunks()
    ec = edge.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
    t_e = pa.table({"user_id": pa.array(eu), "event_type": et_e, "c": pa.array(ec)})
    o = pc.sort_indices(
        t_e, sort_keys=[("user_id", "ascending"), ("event_type", "ascending")]
    )
    t_e = t_e.take(o)
    folded = _entropy_all(
        t_e.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64),
        t_e.column("event_type").combine_chunks(),
        t_e.column("c").to_numpy(zero_copy_only=False).astype(np.int64),
    )
    if folded.num_rows == 0:
        return interior
    return interior.union(rd.from_arrow(folded))


def events_trailing_hour_sum(sf_dir: str):
    """Time-based RANGE-frame window: for every event, the sum of
    event values within the trailing hour **by timestamp value**
    (RANGE … INTERVAL 1 HOUR PRECEDING — peers at the SAME ts are all
    included, unlike the ROWS frame in events_moving_avg; that peer
    rule is the semantics this operator pins). r5: ONE global
    (user, ts, event_id) sort + an across-user kernel via
    util.sorted_group_apply — each user-run's timestamps are rebased
    to the run start and lifted into a disjoint band (run index ×
    (span + hour + 2)), so a SINGLE pair of searchsorted probes over
    the whole block resolves every user's window bounds at once
    against one global prefix sum; exact int64 cents, overflow-guarded
    with a per-run fallback."""
    from .util import sorted_group_apply

    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"], blocks=16)

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts": pc.cast(b.column("ts"), pa.int64()),
                "cents": _cents(b.column("value")),
            }
        )

    HOUR = 3_600_000_000

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "ts": pa.array([], pa.timestamp("us")),
                    "trailing_cents": pa.array([], pa.int64()),
                }
            )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        n = uid.size
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        runlens = np.diff(np.r_[starts, n])
        rebase = np.repeat(ts[starts], runlens)
        rel = ts - rebase  # ≥0, ascending within each run
        prefix = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(cents, out=prefix[1:])
        span = int(rel.max()) if n else 0
        shift = span + HOUR + 2
        if starts.size * shift < 2**62:
            gi = np.repeat(np.arange(starts.size, dtype=np.int64), runlens)
            lifted = rel + gi * shift  # globally ascending, runs disjoint
            lo = np.searchsorted(lifted, lifted - HOUR, side="left")
            hi = np.searchsorted(lifted, lifted, side="right")
        else:  # unreachable for µs spans; exact per-run fallback
            lo = np.empty(n, np.int64)
            hi = np.empty(n, np.int64)
            for s0, ln in zip(starts, runlens):
                sl = ts[s0 : s0 + ln]
                lo[s0 : s0 + ln] = s0 + np.searchsorted(sl, sl - HOUR, "left")
                hi[s0 : s0 + ln] = s0 + np.searchsorted(sl, sl, "right")
        return pa.table(
            {
                "event_id": pc.cast(t.column("event_id"), pa.int64()),
                "user_id": pc.cast(t.column("user_id"), pa.int64()),
                "ts": pa.array(ts).cast(pa.timestamp("us")),
                "trailing_cents": pa.array(prefix[hi] - prefix[lo]),
            }
        )

    return sorted_group_apply(
        ds.map_batches(prep, batch_format="pyarrow"),
        "user_id",
        ["ts", "event_id"],
        kernel,
    )


def events_active_time(sf_dir: str, window_min: int = 30):
    """Interval-union 'active time': each event opens a
    ``window_min``-minute activity interval; per user, merge
    overlapping intervals into islands (the gaps-and-islands operator)
    and report total covered time, island count and event count — the
    engagement-duration metric sessionization alone can't give
    (overlaps must not double-count). r5: ONE global (user, ts) sort +
    an across-user kernel via util.sorted_group_apply — with ts
    ascending per run, each interval's running-max end IS its own end,
    so islands break where the gap to the previous event exceeds W or
    the user changes; island bounds and per-user folds are pure
    reduceat index arithmetic. Integer µs end-to-end; the oracle is
    the classic lag/running-max gaps-and-islands CTE."""
    from .util import sorted_group_apply

    ds = _pq(sf_dir, "events", ["user_id", "ts"], blocks=16)
    W = window_min * 60_000_000

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "ts": pc.cast(b.column("ts"), pa.int64()),
            }
        )

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "n_islands": pa.array([], pa.int64()),
                    "active_us": pa.array([], pa.int64()),
                }
            )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        n = uid.size
        run_start = np.r_[True, uid[1:] != uid[:-1]]
        brk = run_start.copy()
        brk[1:] |= ts[1:] > ts[:-1] + W
        isl_idx = np.flatnonzero(brk)
        isl_start = ts[isl_idx]
        isl_end = ts[np.r_[isl_idx[1:], n] - 1] + W
        isl_user_break = run_start[isl_idx]  # island opens a new user?
        u_starts = np.flatnonzero(isl_user_break)
        row_starts = np.flatnonzero(run_start)
        runlens = np.diff(np.r_[row_starts, n])
        n_islands = np.diff(np.r_[u_starts, isl_idx.size]).astype(np.int64)
        active = np.add.reduceat(isl_end - isl_start, u_starts)
        return pa.table(
            {
                "user_id": pa.array(uid[row_starts], pa.int64()),
                "n_events": pa.array(runlens.astype(np.int64), pa.int64()),
                "n_islands": pa.array(n_islands, pa.int64()),
                "active_us": pa.array(active.astype(np.int64), pa.int64()),
            }
        )

    return sorted_group_apply(
        ds.map_batches(prep, batch_format="pyarrow"), "user_id", ["ts"], kernel
    )


def events_markov_stationary(sf_dir: str, iters: int = 200):
    """Stationary distribution of the user-behavior Markov chain — the
    long-run state-occupancy vector (where sessions end up), composing
    the distributed transition-count operator with a driver-side power
    iteration over the |types|×|types| matrix (model-sized, like the
    PageRank dense path). Counts are exact int64; the matrix is
    row-normalized in sorted type order and iterated from the uniform
    vector with L1 renormalization — deterministic. Rows-only
    (iterative); pinned to a numpy eigenvector reference in tests."""
    from .util import collect_arrow

    tr = events_transitions(sf_dir)
    t = (tr if isinstance(tr, pa.Table) else collect_arrow(tr)).to_pandas()
    types = sorted(set(t["prev_type"]) | set(t["event_type"]))
    idx = {s: i for i, s in enumerate(types)}
    n = len(types)
    M = np.zeros((n, n), dtype=np.float64)
    for _, r in t.iterrows():  # |types|² rows, model-sized
        M[idx[r["prev_type"]], idx[r["event_type"]]] = float(r["n"])
    rows = M.sum(axis=1)
    for i in range(n):  # absorbing/unseen rows → uniform (standard fix)
        M[i] = M[i] / rows[i] if rows[i] > 0 else 1.0 / n
    v = np.full(n, 1.0 / n)
    for _ in range(iters):
        v = v @ M
        v = v / v.sum()
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "stationary": pa.array(v, pa.float64()),
        }
    )


def events_late_census(sf_dir: str, delay_min: int = 10):
    """Streaming watermark / late-data accounting — the semantics every
    streaming engine applies before closing an event-time window:
    arrival order is ``event_id``, the watermark at each arrival is the
    exclusive running max of event time minus the allowed delay, and a
    row is *late* when its event time is already behind that watermark
    (its window would have closed).  Built on
    `stages/window.global_exclusive_running_max` — range-sort by
    arrival, ONE scalar max per sorted block to the driver, exclusive
    prefix-max carry-in, per-block stamping (rows never leave the
    object store; same driver contract as the global ranking window).
    First arrival has an empty exclusive frame → NULL watermark, not
    late (matches the SQL window frame exactly).

    The synthetic events table is written in event-time order, which
    would make every arrival on-time; arrival order is therefore
    event time plus a DETERMINISTIC bounded jitter (Knuth
    multiplicative hash of event_id, < 30 min) modelling network
    reordering — the identical integer expression orders the oracle's
    window, so watermark and late flags stay hash-exact."""
    from .stages.window import global_exclusive_running_max

    ds = _pq(sf_dir, "events", ["event_id", "ts"], blocks=16)

    def arrival(b: pa.Table) -> pa.Table:
        eid = b.column("event_id").to_numpy().astype(np.uint64)
        jit = (eid * np.uint64(2654435761)) % np.uint64(4294967296) % np.uint64(
            1_800_000_000
        )
        ts_us = pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")), pa.int64())
        arr = ts_us.to_numpy() + jit.astype(np.int64)
        return b.append_column("arrival_us", pa.array(arr, pa.int64()))

    wm = global_exclusive_running_max(
        ds.map_batches(arrival, batch_format="pyarrow"),
        ["arrival_us", "event_id"],
        "ts",
        out_col="prev_max_us",
    )
    delay_us = delay_min * 60_000_000

    def finish(b: pa.Table) -> pa.Table:
        wm_us = pc.subtract(b.column("prev_max_us"), delay_us)  # null-safe
        ts_us = pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")), pa.int64())
        late = pc.cast(pc.fill_null(pc.less(ts_us, wm_us), False), pa.int64())
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "ts": pc.cast(b.column("ts"), pa.timestamp("us")),
                "watermark": pc.cast(wm_us, pa.timestamp("us")),
                "late": late,
            }
        )

    return wm.map_batches(finish, batch_format="pyarrow")


def events_engagement_gini(sf_dir: str):
    """Gini coefficient of per-user event counts — the inequality /
    skew diagnostic (0 = uniform engagement, →1 = one user dominates;
    the same statistic flags hot-key skew before a shuffle). Exact and
    distributed: per-user counts (one groupby), GLOBAL rank over
    (count, user) via the range-sort + per-block offset machinery
    (`stages/window.global_row_number`), then per-block INTEGER
    partials of Σ(2i−1)·n on object-dtype numpy (no overflow at any
    scale, the events_auc trick); the driver folds Python ints and the
    single division num/(n_users·total) is the only float op —
    bit-equal to the oracle's HUGEINT window sum."""
    from .stages.window import global_row_number
    from .util import collect_arrow, drop_empty_blocks

    ds = _pq(sf_dir, "events", ["user_id"], blocks=16)

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("user_id").aggregate([([], "count_all")])
        return g.rename_columns(["user_id", "n"])

    uc = drop_empty_blocks(
        _sorted_agg_by_key(
            ds.map_batches(partial, batch_format="pyarrow"),
            "user_id",
            [("n", "sum", "n")],
        )
    )
    ranked = global_row_number(uc, ["n", "user_id"], out_col="i")

    def moments(b: pa.Table) -> pa.Table:
        i = b.column("i").to_numpy(zero_copy_only=False).astype(object)
        n = b.column("n").to_numpy(zero_copy_only=False).astype(object)
        a = int(((2 * i - 1) * n).sum()) if len(i) else 0
        return pa.table(
            {
                "a": pa.array([str(a)], pa.string()),  # exact int as text
                "s": pa.array([int(n.sum()) if len(n) else 0], pa.int64()),
                "c": pa.array([len(n)], pa.int64()),
            }
        )

    parts = collect_arrow(
        ranked.map_batches(moments, batch_format="pyarrow"),
        schema=pa.schema([("a", pa.string()), ("s", pa.int64()), ("c", pa.int64())]),
    ).to_pandas()
    nu = int(parts["c"].sum())
    tot = sum(int(x) for x in parts["s"])
    num = sum(int(x) for x in parts["a"]) - nu * tot
    return pa.table(
        {
            "n_users": pa.array([nu], pa.int64()),
            "gini": pa.array([float(num) / float(nu * tot)], pa.float64()),
        }
    )


def docs_dup_cluster_sizes(sf_dir: str):
    """Duplicate-cluster size census: how many near-dup clusters of
    each size exist (the dedup-impact report a curation run publishes —
    'N pairs, M triples, one 12-way pile-up'). Composes the MinHash
    connected-components output (`docs_minhash_groups`, output-sized
    (id, rep) table) with two tiny aggregations; only dup-connected
    docs appear, so singletons are excluded by construction."""
    from .stages.dedup import minhash_pipeline

    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)
    groups = minhash_pipeline(
        ds, "text", "doc_id", jaccard_threshold=0.5, components="distributed"
    )["groups"]
    sizes = groups.group_by("rep").aggregate([([], "count_all")])
    hist = (
        sizes.rename_columns(["rep", "cluster_size"])
        .group_by("cluster_size")
        .aggregate([([], "count_all")])
        .rename_columns(["cluster_size", "n_clusters"])
        .sort_by("cluster_size")
    )
    return pa.table(
        {
            "cluster_size": pc.cast(hist.column("cluster_size"), pa.int64()),
            "n_clusters": pc.cast(hist.column("n_clusters"), pa.int64()),
        }
    )


def events_weekly_active(sf_dir: str):
    """7-day sliding-window DISTINCT user count per day — the rolling
    count-distinct window, which no plain windowed aggregate expresses
    (DISTINCT doesn't decompose over overlapping frames). Shape: the
    per-user distinct-day dedup AND the ×7 window expansion both key on
    user_id. r5: ONE global (user, ts) sort + an across-user kernel
    via util.sorted_group_apply — distinct (user, day) rows fall out
    of the sorted runs, the ×7 expansion + per-user re-dedup is one
    lexsort over the block, and the kernel PRE-COUNTS contributions
    per window-day (combiner), so the only remaining exchange is a
    tiny (day)-keyed groupby. A day d is reported iff some event fell
    in [d−6, d]."""
    from .util import collect_arrow, sorted_group_apply

    US_PER_DAY = 86_400_000_000

    ev = _pq(sf_dir, "events", ["user_id", "ts"], blocks=16)

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "wday_us": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        days = (
            pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64())
            .to_numpy(zero_copy_only=False)
            // US_PER_DAY
        )
        new_run = np.r_[True, uid[1:] != uid[:-1]]
        dmask = new_run | np.r_[False, days[1:] != days[:-1]]
        uu, du = uid[dmask], days[dmask]
        wu = np.repeat(uu, 7)
        wd = (du[:, None] + np.arange(7, dtype=np.int64)[None, :]).ravel()
        order = np.lexsort((wd, wu))
        wu, wd = wu[order], wd[order]
        uniq = np.r_[True, (wu[1:] != wu[:-1]) | (wd[1:] != wd[:-1])]
        wdays, counts = np.unique(wd[uniq], return_counts=True)
        return pa.table(
            {
                "wday_us": pa.array(wdays * US_PER_DAY),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    agg = (
        sorted_group_apply(ev, "user_id", ["ts"], kernel)
        .groupby("wday_us")
        .aggregate(Sum("n", alias_name="active_users"))
    )
    t = collect_arrow(agg)
    out = pa.table(
        {
            "wday": pc.cast(t.column("wday_us"), pa.timestamp("us")),
            "active_users": t.column("active_users"),
        }
    )
    return out.take(pc.sort_indices(out, sort_keys=[("wday", "ascending")]))


def orders_global_rank(sf_dir: str):
    """GLOBAL ranking window — row_number + cume_dist over ALL orders
    ordered by (o_totalprice, o_orderkey), i.e. no partition key to
    shard on. orders_price_window's map_groups shape would funnel the
    whole table through one worker here; instead stages/window.py
    range-sorts and stamps per-block offsets — the driver holds one row
    COUNT per sorted block, never rows."""
    from .stages.window import global_row_number

    ds = _pq(sf_dir, "orders", ["o_orderkey", "o_totalprice"], blocks=8)
    return global_row_number(
        ds, ["o_totalprice", "o_orderkey"], out_col="rn", cume_col="cume"
    )


def crawl_pagerank(sf_dir: str):
    """Link-graph PageRank over the flagship crawl: edges = visited page
    → discovered link (restricted to visited pages so the graph is
    closed), then the damped power iteration entirely as join+groupby
    rounds (stages/graph.py). Rows-only — iterative fixed-point, not
    ANSI-SQL; pinned against a dense numpy reference in
    tests/test_joins_quantile_sketch.py."""
    from .oracle import CrawlSpec
    from .pipelines.crawl import EngineConfig, run_crawl
    from .stages.graph import pagerank

    spec = CrawlSpec(
        n_pages=CORPUS_N, seeds=[datagen.url(1)], max_urls=120, batch_size=25,
        scope=Scope("suffix", datagen.HOST_SUFFIX),
    )
    res = run_crawl(spec, corpus_dir(), EngineConfig(num_workers=_safe_workers()))
    audit = res.audit
    urls = audit.column("url").combine_chunks()
    links = audit.column("links_encontrados").combine_chunks()
    ln = pc.list_value_length(links).fill_null(0).to_numpy(zero_copy_only=False)
    src = urls.take(pa.array(np.repeat(np.arange(len(urls)), ln)))
    dst = pc.list_flatten(links)
    visited = pc.is_in(dst, value_set=urls)
    edges = rd.from_arrow(
        pa.table({"src": src.filter(visited), "dst": dst.filter(visited)})
    )
    ranks = pagerank(edges, damping=0.85, iterations=15)
    return ranks.rename_columns(["url", "rank"])


def docs_term_pmi(sf_dir: str, k: int = 100):
    """Term co-occurrence lift (the monotone core of PMI, sans the
    ln whose libm rounding differs across engines): per-doc distinct
    terms → DF filter (df ≥ max(5, N//20)) → within-doc pair counts →
    lift = (c_ab·N)/(df_a·df_b), top-k.

    NO self-join: a document is one row, so its term set is block-local
    and the map stage emits the triangular pairs directly, pre-counted
    per block (combiner) — the only exchanges are the term-DF groupby
    and a pair groupby whose input is capped at blocks × vocab² rows.
    The surviving vocabulary is broadcast once (ray.put; tiny by
    construction — the DF threshold caps it at 20·docs/df terms)."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)
    n_docs = ds.count()
    min_df = max(5, n_docs // 20)

    def doc_terms(b: pa.Table) -> pa.ListArray:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.utf8_trim_whitespace(b.column("text"))), r"\s+"
        )
        return toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks

    def df_partial(b: pa.Table) -> pa.Table:
        toks = doc_terms(b)
        ln = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pa.table(
            {
                "doc": pa.array(np.repeat(np.arange(b.num_rows), ln)),
                "term": pc.list_flatten(toks),
            }
        ).group_by(["doc", "term"]).aggregate([])  # per-doc distinct
        return (
            flat.group_by("term")
            .aggregate([("doc", "count")])
            .rename_columns(["term", "df"])
        )

    from .util import collect_arrow, drop_empty_blocks

    df_tbl = collect_arrow(
        drop_empty_blocks(
            _sorted_agg_by_key(
                ds.map_batches(df_partial, batch_format="pyarrow"),
                "term",
                [("df", "sum", "df")],
            )
        )
    )
    df_tbl = df_tbl.filter(pc.greater_equal(df_tbl.column("df"), min_df))
    dfs = dict(
        zip(df_tbl.column("term").to_pylist(), df_tbl.column("df").to_pylist())
    )
    vocab_ref = ray.put(df_tbl.column("term").combine_chunks())

    def pair_partial(b: pa.Table) -> pa.Table:
        voc = ray.get(vocab_ref)
        toks = doc_terms(b)
        ln = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        keep = pc.is_in(flat, value_set=voc)
        tbl = pa.table(
            {
                "doc": pa.array(np.repeat(np.arange(b.num_rows), ln)).filter(keep),
                "term": flat.filter(keep),
            }
        ).group_by(["doc", "term"]).aggregate([])
        docs = tbl.column("doc").to_numpy(zero_copy_only=False)
        terms = np.asarray(tbl.column("term").to_pylist(), dtype=object)
        order = np.lexsort((terms, docs))
        docs, terms = docs[order], terms[order]
        cut = np.flatnonzero(np.diff(docs)) + 1
        starts = np.concatenate(([0], cut)) if len(docs) else np.array([], np.int64)
        ends = np.concatenate((cut, [len(docs)])) if len(docs) else np.array([], np.int64)
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            seg = terms[s:e]
            ia, ib = np.triu_indices(len(seg), k=1)
            out_a.append(seg[ia])
            out_b.append(seg[ib])
        if not out_a:
            return pa.table(
                {"term_a": pa.array([], pa.string()),
                 "term_b": pa.array([], pa.string()),
                 "c_ab": pa.array([], pa.int64())}
            )
        return (
            pa.table(
                {
                    "term_a": pa.array(np.concatenate(out_a), pa.string()),
                    "term_b": pa.array(np.concatenate(out_b), pa.string()),
                }
            )
            .group_by(["term_a", "term_b"])
            .aggregate([([], "count_all")])
            .rename_columns(["term_a", "term_b", "c_ab"])
        )

    c_ab = collect_arrow(
        drop_empty_blocks(
            _sorted_agg_by_key(
                ds.map_batches(pair_partial, batch_format="pyarrow"),
                ["term_a", "term_b"],
                [("c_ab", "sum", "c_ab")],
            )
        )
    )
    ta = c_ab.column("term_a").to_pylist()
    tb = c_ab.column("term_b").to_pylist()
    dfa = np.array([dfs[t] for t in ta], np.float64)
    dfb = np.array([dfs[t] for t in tb], np.float64)
    cab = c_ab.column("c_ab").to_numpy(zero_copy_only=False).astype(np.float64)
    lift = (cab * float(n_docs)) / (dfa * dfb)
    out = pa.table(
        {
            "term_a": c_ab.column("term_a"),
            "term_b": c_ab.column("term_b"),
            "c_ab": c_ab.column("c_ab"),
            "df_a": pa.array(dfa.astype(np.int64)),
            "df_b": pa.array(dfb.astype(np.int64)),
            "lift": pa.array(lift, pa.float64()),
        }
    )
    idx = pc.sort_indices(
        out,
        sort_keys=[
            ("lift", "descending"), ("term_a", "ascending"), ("term_b", "ascending"),
        ],
    )
    return out.take(idx.slice(0, k))


def events_auc(sf_dir: str):
    """Exact distributed ROC-AUC (Mann-Whitney U with tie handling) —
    the standard ranking-model evaluation metric, scored here as
    "does `value` rank purchase events above non-purchases". A naive
    plan sorts all N scores through one worker; the decomposition used
    by every distributed AUC (count discordant pairs via a prefix sum
    of negatives over the sorted DISTINCT scores) is:

      AUC = [Σ_s np(s)·(negs_below(s) + nn(s)/2)] / (npos·nneg)

    Shape: block-local group_by(score_cents) compresses raw rows to
    distinct scores with (n_pos, n_neg) partials → one distinct-score
    groupby → range-partition sort by score → per-block negative
    totals (one int per block on the driver, like
    ``stages/window.global_row_number``) → per-block exact
    contribution tasks. The per-block fold runs on object-dtype numpy
    (arbitrary-precision int — np·cum products overflow int64 past
    ~3·10⁹ rows); the final division is the single float op, mirrored
    in the oracle. Scores are exact cents so ties group identically in
    both engines."""
    from .util import collect_arrow, drop_empty_blocks

    ev = _pq(sf_dir, "events", ["event_type", "value"], blocks=16)

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c": _cents(b.column("value")),
                "np_": pc.cast(
                    pc.equal(b.column("event_type"), "purchase"), pa.int64()
                ),
                "nt": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )
        g = t.group_by("c").aggregate([("np_", "sum"), ("nt", "sum")])
        return g.rename_columns(["c", "np_", "nt"])

    dist = _sorted_agg_by_key(
        ev.map_batches(partial, batch_format="pyarrow"),
        "c",
        [("np_", "sum", "np_"), ("nt", "sum", "nt")],
    )
    mat = drop_empty_blocks(dist.sort("c")).materialize()

    @ray.remote
    def block_negsum(b: pa.Table) -> tuple[int, int]:
        npos = int(pc.sum(b.column("np_")).as_py() or 0)
        ntot = int(pc.sum(b.column("nt")).as_py() or 0)
        return npos, ntot - npos

    @ray.remote
    def block_contrib(b: pa.Table, neg_offset: int) -> int:
        np_a = b.column("np_").to_numpy(zero_copy_only=False).astype(object)
        nn_a = (
            b.column("nt").to_numpy(zero_copy_only=False)
            - b.column("np_").to_numpy(zero_copy_only=False)
        ).astype(object)
        # exclusive prefix of negatives within the block, plus the
        # cross-block offset; object dtype keeps the products exact
        cum = np.cumsum(nn_a) - nn_a + neg_offset
        return int((np_a * (2 * cum + nn_a)).sum())

    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(ref)
    sums = ray.get([block_negsum.remote(r) for r in refs])
    npos = sum(s[0] for s in sums)
    nneg = sum(s[1] for s in sums)
    offsets = [0]
    for _, nn in sums[:-1]:
        offsets.append(offsets[-1] + nn)
    num2 = sum(ray.get([
        block_contrib.remote(r, off) for r, off in zip(refs, offsets)
    ]))  # = 2 × Σ np·(negs_below + nn/2), exact integer
    auc = float(num2) / float(2 * npos * nneg)
    return pa.table(
        {
            "auc": pa.array([auc], pa.float64()),
            "n_pos": pa.array([npos], pa.int64()),
            "n_neg": pa.array([nneg], pa.int64()),
        }
    )


# Allowed target canvases for aspect-bucket resize assignment (w, h) —
# index order is the deterministic tiebreak, mirrored in the oracle.
RESIZE_BUCKETS = [(64, 64), (48, 64), (64, 48), (32, 64), (64, 32), (40, 56), (56, 40)]


def corpus_resize_buckets(sf_dir: str):
    """Aspect-bucket RESIZE ASSIGNMENT (the SDXL-style batch-shaping
    step that follows the census): map every image to the allowed
    target canvas minimizing aspect distortion, measured as the exact
    integer cross-product |w·th − h·tw| (no float ratio boundaries —
    both engines bucket identically), ties broken by bucket-list
    order. Fully vectorized: an n×B distortion matrix per block
    (B = len(RESIZE_BUCKETS)) and one argmin — embarrassingly
    parallel, no shuffle; per-bucket counts come from the same
    block-local combiner as the census."""
    from .util import collect_arrow

    ds = corpus_parquet(columns=["image_id", "w", "h"])
    tw = np.array([b[0] for b in RESIZE_BUCKETS], dtype=np.int64)
    th = np.array([b[1] for b in RESIZE_BUCKETS], dtype=np.int64)

    def assign(b: pa.Table) -> pa.Table:
        w = pc.cast(b.column("w"), pa.int64()).to_numpy(zero_copy_only=False)
        h = pc.cast(b.column("h"), pa.int64()).to_numpy(zero_copy_only=False)
        dist = np.abs(w[:, None] * th[None, :] - h[:, None] * tw[None, :])
        best = np.argmin(dist, axis=1)  # argmin takes the FIRST min = list order
        return pa.table(
            {
                "image_id": b.column("image_id"),
                "target_w": pa.array(tw[best]),
                "target_h": pa.array(th[best]),
                "distortion": pa.array(dist[np.arange(len(best)), best]),
            }
        )

    t = collect_arrow(ds.map_batches(assign, batch_format="pyarrow"))
    return t.take(pc.sort_indices(t, sort_keys=[("image_id", "ascending")]))


def corpus_letterbox(sf_dir: str):
    """Integer LETTERBOX geometry on top of the aspect-bucket
    assignment (the step a trainer's dataloader runs after
    ``corpus_resize_buckets``): scale each image to fit INSIDE its
    chosen target canvas and center it, emitting (scaled_w, scaled_h,
    pad_x, pad_y). All arithmetic is exact integers — the limiting side
    is picked by cross-product comparison (w·th ≥ h·tw ⇔ image wider
    than canvas) and the scaled short side is a floor division — so the
    engine and the oracle bucket identically with zero float ratio
    boundaries. Same embarrassingly parallel shape as the bucket
    assignment: one n×B distortion argmin + a handful of numpy
    where/floordiv ops per block, no shuffle."""
    from .util import collect_arrow

    ds = corpus_parquet(columns=["image_id", "w", "h"])
    tws = np.array([b[0] for b in RESIZE_BUCKETS], dtype=np.int64)
    ths = np.array([b[1] for b in RESIZE_BUCKETS], dtype=np.int64)

    def geom(b: pa.Table) -> pa.Table:
        w = pc.cast(b.column("w"), pa.int64()).to_numpy(zero_copy_only=False)
        h = pc.cast(b.column("h"), pa.int64()).to_numpy(zero_copy_only=False)
        dist = np.abs(w[:, None] * ths[None, :] - h[:, None] * tws[None, :])
        best = np.argmin(dist, axis=1)
        tw, th = tws[best], ths[best]
        wide = w * th >= h * tw  # image aspect ≥ canvas aspect → width-limited
        scaled_w = np.where(wide, tw, (w * th) // h)
        scaled_h = np.where(wide, (h * tw) // w, th)
        return pa.table(
            {
                "image_id": b.column("image_id"),
                "target_w": pa.array(tw),
                "target_h": pa.array(th),
                "scaled_w": pa.array(scaled_w),
                "scaled_h": pa.array(scaled_h),
                "pad_x": pa.array((tw - scaled_w) // 2),
                "pad_y": pa.array((th - scaled_h) // 2),
            }
        )

    t = collect_arrow(ds.map_batches(geom, batch_format="pyarrow"))
    return t.take(pc.sort_indices(t, sort_keys=[("image_id", "ascending")]))


def _fnv_rows(m: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a over the ROWS of a (n, L) uint8 matrix —
    L xor-multiply passes, one per byte column (the string analog of
    ``_fnv64``). Returns int64 bucket keys; 64-bit collisions are
    harmless wherever an exact verify follows."""
    with np.errstate(over="ignore"):
        h = np.full(m.shape[0], 14695981039346656037, dtype=np.uint64)
        for k in range(m.shape[1]):
            h = (h ^ m[:, k].astype(np.uint64)) * np.uint64(1099511628211)
    return h.view(np.int64)


def customer_fuzzy_pairs(sf_dir: str, bucket_cap: int = 2000):
    """String-similarity self-join at edit distance ≤ 1 via DELETION-
    NEIGHBORHOOD hashing (the FastSS / SymSpell family): every name
    emits itself plus each single-character-deletion variant as a
    bucket key; any two names within ed 1 of each other provably share
    a key (equal-length substitution → both delete the differing
    position; insertion/deletion → the shorter token IS a variant of
    the longer), so an exact in-bucket verify recovers the full answer
    with no N² comparison. Distributed shape, tuned bottom-up (each
    step replaced a measured hotspot at sf0.1):

    - variant emission is fully vectorized per length class (uint8
      matrix column-drops) and emits int64 FNV bucket keys straight
      from the byte matrices (``_fnv_rows``) — strings never ride the
      exchange as keys, and hash collisions are harmless because the
      verify is exact;
    - in-bucket pair emission is a hash SELF-JOIN on the int key (a
      map_groups over the ~13·N mostly-singleton buckets pays a Python
      call per bucket — measured 10× slower; string-keyed pair-distinct
      groupby was 47 s — measured 15× slower than this plan);
    - the exact edit-distance verify runs INSIDE the join's output
      map_batches, before any further exchange, vectorized for the
      dominant equal-length case (byte-matrix mismatch counts) with a
      Python fallback only for rare length-off-by-one candidates;
    - surviving pairs are block-deduped, and the final global distinct
      runs on the collected OUTPUT-SIZED table (house rule: driver
      folds are fine at output size — the same boundary dedup.py draws
      for its verified-pair sets).

    A bucket of size s costs s² join rows, so a count-partial cap
    check on the same int keys guards the join (dedup.bucket_cap
    convention: loud raise, never a silent quadratic)."""
    from .util import collect_arrow, drop_empty_blocks

    names = _pq(sf_dir, "customer", ["c_name"], blocks=8)

    def variants(b: pa.Table) -> pa.Table:
        toks = np.asarray(
            pc.unique(b.column("c_name")).to_numpy(zero_copy_only=False), dtype=object
        )
        lens = np.array([len(t) for t in toks])
        keys, owners = [], []
        for L in np.unique(lens):
            sub = toks[lens == L]
            # names are ASCII (Customer#%09d); general text would hash
            # codepoints instead of bytes
            m = (
                np.frombuffer("".join(sub.tolist()).encode("utf-8"), dtype=np.uint8)
                .reshape(len(sub), int(L))
            )
            # identity key (covers insert/delete: the shorter token IS
            # a deletion variant of the longer; L = 0 and L = 1 rows
            # emit it too — two distinct 1-char tokens only meet at the
            # EMPTY deletion variant, a case the property test caught)
            keys.append(_fnv_rows(m))
            owners.append(sub)
            for i in range(int(L)):
                keys.append(_fnv_rows(np.delete(m, i, axis=1)))
                owners.append(sub)
        return pa.table(
            {
                "key": pa.array(np.concatenate(keys)),
                "tok": pa.array(np.concatenate(owners), pa.string()),
            }
        )

    var_ds = names.map_batches(variants, batch_format="pyarrow").materialize()

    # subcorpus-sized variant table (~13·N rows): the int-key hash
    # self-join pays ~5 s of fixed exchange overhead at sf0.1/32cpu —
    # the basket/Q17 dense-path gate applies: sort the collected keys,
    # emit in-bucket index pairs with the shared _emit_run_pairs
    # fan-out, verify with the SAME kernel driver-side. Above the gate
    # the distributed join plan below runs unchanged.
    dense = var_ds.count() <= 4_000_000

    def ed_le_1_slow(x: str, y: str) -> bool:
        s, l = (x, y) if len(x) < len(y) else (y, x)
        i = 0
        while i < len(s) and s[i] == l[i]:
            i += 1
        return s[i:] == l[i + 1 :]

    def verify(b: pa.Table) -> pa.Table:
        mask = pc.less(b.column("tok_a"), b.column("tok_b"))
        b = pa.table(
            {"tok_a": b.column("tok_a"), "tok_b": b.column("tok_b")}
        ).filter(mask)
        if b.num_rows == 0:
            return b
        ta = np.asarray(b.column("tok_a").to_numpy(zero_copy_only=False), dtype=object)
        tb = np.asarray(b.column("tok_b").to_numpy(zero_copy_only=False), dtype=object)
        la = np.array([len(t) for t in ta])
        lb = np.array([len(t) for t in tb])
        keep = np.zeros(len(ta), dtype=bool)
        # dominant case: equal lengths → vectorized byte-mismatch count
        for L in np.unique(la[la == lb]):
            sel = (la == L) & (lb == L)
            ma = np.frombuffer(
                "".join(ta[sel].tolist()).encode("utf-8"), dtype=np.uint8
            ).reshape(-1, int(L))
            mb = np.frombuffer(
                "".join(tb[sel].tolist()).encode("utf-8"), dtype=np.uint8
            ).reshape(-1, int(L))
            keep[sel] = (ma != mb).sum(axis=1) <= 1
        # rare case: length off by one → two-pointer check
        off1 = np.abs(la - lb) == 1
        for i in np.nonzero(off1)[0]:
            keep[i] = ed_le_1_slow(ta[i], tb[i])
        b = b.filter(pa.array(keep))
        # block-local dedup; the global distinct runs at output size
        return b.group_by(["tok_a", "tok_b"]).aggregate([]) if b.num_rows else b

    if dense:
        vt = collect_arrow(var_ds)
        keys_np = vt.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
        toks_np = np.asarray(
            vt.column("tok").to_numpy(zero_copy_only=False), dtype=object
        )
        order = np.argsort(keys_np, kind="stable")
        k_s, t_s = keys_np[order], toks_np[order]
        run_len = np.diff(
            np.append(np.flatnonzero(np.concatenate(([True], k_s[1:] != k_s[:-1]))),
                      len(k_s))
        )
        if run_len.size and int(run_len.max()) > bucket_cap:
            raise RuntimeError(
                f"fuzzy-join bucket exceeds cap {bucket_cap}; split the bucket"
            )
        ia, ib = _emit_run_pairs(k_s, np.arange(len(k_s), dtype=np.int64))
        # index pairs carry arbitrary token order — canonicalize so the
        # verify kernel's tok_a < tok_b mask keeps every unordered pair
        a_t, b_t = t_s[ia], t_s[ib]
        swap = a_t > b_t
        a_t[swap], b_t[swap] = b_t[swap], a_t[swap]
        cand_t = pa.table(
            {
                "tok_a": pa.array(a_t, pa.string()),
                "tok_b": pa.array(b_t, pa.string()),
            }
        )
        out = verify(cand_t)
        if out.num_rows == 0:
            out = pa.table(
                {"tok_a": pa.array([], pa.string()), "tok_b": pa.array([], pa.string())}
            )
        out = out.group_by(["tok_a", "tok_b"]).aggregate([])
        return out.take(
            pc.sort_indices(
                out, sort_keys=[("tok_a", "ascending"), ("tok_b", "ascending")]
            )
        )

    caps = _sorted_agg_by_key(var_ds, "key", [(None, "count", "n")])

    def check_cap(b: pa.Table) -> pa.Table:
        over = pc.greater(b.column("n"), bucket_cap)
        if pc.any(over).as_py():
            hot = b.filter(over).column("key")[0].as_py()
            raise RuntimeError(
                f"fuzzy-join bucket {hot} exceeds cap {bucket_cap}; "
                "split the bucket"
            )
        return b.slice(0, 0)

    caps.map_batches(check_cap, batch_format="pyarrow").materialize()

    cand = var_ds.join(
        var_ds,
        "inner",
        max(_join_partitions(), 8),
        on=("key",),
        left_suffix="_a",
        right_suffix="_b",
    ).map_batches(verify, batch_format="pyarrow")

    out = collect_arrow(drop_empty_blocks(cand))
    out = out.group_by(["tok_a", "tok_b"]).aggregate([])
    return out.take(
        pc.sort_indices(out, sort_keys=[("tok_a", "ascending"), ("tok_b", "ascending")])
    )


def events_value_percentile(sf_dir: str):
    """Broadcast-CDF percentile transform: annotate EVERY event with its
    exact rank statistics within its event_type — (n_lt, n_eq, n_type)
    as integers, from which any percentile definition (rank, cume_dist,
    midrank) follows without a float in sight. Shape: block-local
    (type, cents) count partials → one small distinct-score groupby →
    the per-type sorted score CDF is broadcast via ray.put (distinct
    cents are bounded — price grids, not raw reals; at open-web
    cardinality this becomes a range-partitioned join on score instead,
    same seam as the TF-IDF DF map) → one vectorized searchsorted per
    (block × type present). The input-sized output never converges to
    the driver in pipeline use; collect here is the query edge."""
    ev = _pq(sf_dir, "events", ["event_id", "event_type", "value"], blocks=16)

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": b.column("event_type"),
                "c": _cents(b.column("value")),
                "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )
        g = t.group_by(["event_type", "c"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "c", "n"])

    from .util import collect_arrow

    # the (type, cents) partials are collected for the CDF broadcast
    # anyway — fold them on the driver (one Arrow group_by) instead of
    # paying the hash-shuffle aggregator's fixed overhead first
    # (measured ~2 s of the 3.9 s total at sf0.1/32cpu); above the
    # TF-IDF broadcast seam this whole stage flips to the
    # range-partitioned join form, distributed aggregate included
    cdf_tbl = (
        collect_arrow(ev.map_batches(partial, batch_format="pyarrow"))
        .group_by(["event_type", "c"])
        .aggregate([("n", "sum")])
        .rename_columns(["event_type", "c", "n"])
    )
    cdf = {}
    for typ in pc.unique(cdf_tbl.column("event_type")).to_pylist():
        sub = cdf_tbl.filter(pc.equal(cdf_tbl.column("event_type"), typ))
        order = pc.sort_indices(sub, sort_keys=[("c", "ascending")])
        sub = sub.take(order)
        cs = sub.column("c").to_numpy(zero_copy_only=False)
        ns = sub.column("n").to_numpy(zero_copy_only=False)
        cum = np.cumsum(ns)
        cdf[typ] = (cs, cum - ns, ns, int(cum[-1]))  # scores, n_lt, n_eq, total
    cdf_ref = ray.put(cdf)

    def annotate(b: pa.Table) -> pa.Table:
        m = ray.get(cdf_ref)
        types = b.column("event_type").to_numpy(zero_copy_only=False)
        c = _cents(b.column("value")).to_numpy(zero_copy_only=False)
        n_lt = np.empty(len(c), dtype=np.int64)
        n_eq = np.empty(len(c), dtype=np.int64)
        n_type = np.empty(len(c), dtype=np.int64)
        for typ in np.unique(types):
            mask = types == typ
            cs, lt, eq, tot = m[typ]
            pos = np.searchsorted(cs, c[mask])
            n_lt[mask] = lt[pos]
            n_eq[mask] = eq[pos]
            n_type[mask] = tot
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "event_type": b.column("event_type"),
                "n_lt": pa.array(n_lt),
                "n_eq": pa.array(n_eq),
                "n_type": pa.array(n_type),
            }
        )

    return ev.map_batches(annotate, batch_format="pyarrow")


def lineitem_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape — a DECORRELATED correlated aggregate: revenue
    from lineitems whose quantity is below 20 % of their part's average
    quantity. The correlated subquery (per-part AVG over the same fact
    table) decorrelates into: per-part (sum_qty, n) partials combined
    map-side → a part-keyed threshold table → one hash join back
    against the streaming fact → the predicate as an exact integer
    cross-multiplication 5·qty·n < sum_qty (no float average, so both
    engines select identical rows). Single-row output; the only float
    ops are the mirrored cents→dollars and ÷7 divisions."""
    li = _pq(
        sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"], blocks=16
    )
    # thresholds pass re-reads at HALF the block count: every block's
    # partial holds nearly all part keys, so partial volume (and the
    # 20k-key exchange) scales with block count — 8 blocks measured
    # 4.3 s vs 7.0 s at 16 for the same aggregate
    li_narrow = _pq(sf_dir, "lineitem", ["l_partkey", "l_quantity"], blocks=8)

    def qty_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_partkey": b.column("l_partkey"),
                "sum_qty": pc.cast(b.column("l_quantity"), pa.int64()),
                "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )
        g = t.group_by("l_partkey").aggregate([("sum_qty", "sum"), ("n", "sum")])
        return g.rename_columns(["l_partkey", "sum_qty", "n"])

    from .util import collect_arrow

    # the threshold side is part-keyed (|parts| rows) — fold the ≤
    # blocks×|parts| block partials driver-side (one Arrow group_by;
    # Ray's hash aggregate paid ~6 s of exchange overhead on the same
    # 160k partial rows) and broadcast it as sorted arrays +
    # searchsorted instead of hash-joining the whole fact (the
    # tfidf/basket-rules broadcast/join threshold seam; the full
    # Dataset.join shuffled every lineitem row and measured 8.4 s at
    # sf0.1/32cpu vs ~2 s broadcast). Past web part cardinality both
    # gates flip back to the distributed groupby + hash join.
    thr = (
        collect_arrow(li_narrow.map_batches(qty_partial, batch_format="pyarrow"))
        .group_by("l_partkey")
        .aggregate([("sum_qty", "sum"), ("n", "sum")])
        .rename_columns(["l_partkey", "sum_qty", "n"])
    )
    pk = thr.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(pk)
    thr_ref = ray.put(
        (
            pk[order],
            thr.column("sum_qty").to_numpy(zero_copy_only=False).astype(np.int64)[order],
            thr.column("n").to_numpy(zero_copy_only=False).astype(np.int64)[order],
        )
    )

    def select_small(b: pa.Table) -> pa.Table:
        kk, sq_all, n_all = ray.get(thr_ref)
        part = b.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(kk, part)
        n = n_all[pos]
        sq = sq_all[pos]
        qty = pc.cast(b.column("l_quantity"), pa.int64()).to_numpy(zero_copy_only=False)
        keep = 5 * qty * n < sq
        cents = _cents(b.column("l_extendedprice")).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_rows": pa.array([int(keep.sum())], pa.int64()),
                "cents": pa.array([int(cents[keep].sum())], pa.int64()),
            }
        )

    parts = collect_arrow(li.map_batches(select_small, batch_format="pyarrow"))
    n_rows = int(pc.sum(parts.column("n_rows")).as_py() or 0)
    cents = int(pc.sum(parts.column("cents")).as_py() or 0)
    return pa.table(
        {
            "n_rows": pa.array([n_rows], pa.int64()),
            "avg_yearly": pa.array([(float(cents) / 100.0) / 7.0], pa.float64()),
        }
    )


def docs_chunk_text(sf_dir: str, window: int = 64, stride: int = 48):
    """Sliding-window TOKEN CHUNKING (the RAG / pretraining
    segmentation step): split every document into chunks of ``window``
    whitespace tokens advancing by ``stride`` (overlap = window −
    stride), emitting (doc_id, chunk_id, tok_start, tok_end). The
    expansion is fully vectorized — per-doc token counts from the same
    Arrow regex kernels as docs_token_stats, chunk counts as
    ``(n−1)//stride + 1``, and the fan-out via np.repeat + offset
    arithmetic (no per-row Python, no shuffle: embarrassingly parallel
    over blocks, output ≈ input × n/stride rows which is exactly the
    fan-out a downstream embedder wants to stream)."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)

    def chunk(b: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(b.column("text"))
        n = pc.if_else(
            pc.equal(trimmed, ""),
            pa.scalar(0, pa.int64()),
            pc.cast(
                pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+")),
                pa.int64(),
            ),
        ).to_numpy(zero_copy_only=False)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        # stop once a window reaches the end: no redundant tail chunk
        # fully covered by its predecessor
        over = np.maximum(n - window, 0)
        n_chunks = np.where(n > 0, 1 + (over + stride - 1) // stride, 0)
        doc_rep = np.repeat(ids, n_chunks)
        n_rep = np.repeat(n, n_chunks)
        # chunk_id = position within its doc: global arange minus each
        # doc's cumulative offset
        offs = np.cumsum(n_chunks) - n_chunks
        cid = np.arange(int(n_chunks.sum()), dtype=np.int64) - np.repeat(offs, n_chunks)
        start = cid * stride
        return pa.table(
            {
                "doc_id": pa.array(doc_rep),
                "chunk_id": pa.array(cid),
                "tok_start": pa.array(start),
                "tok_end": pa.array(np.minimum(start + window, n_rep)),
            }
        )

    return ds.map_batches(chunk, batch_format="pyarrow")


def lineitem_winsorized(sf_dir: str):
    """Grouped WINSORIZED aggregate (the robust-statistics composition):
    per l_returnflag, clip extendedprice cents to the group's exact
    [P10, P90] discrete quantiles, then sum — outlier-robust revenue.
    Composes the iterative-histogram exact quantile stage
    (stages/quantile.grouped_quantile_disc: 3–4 streaming scans,
    O(groups × bins) partials, no sort) with a broadcast clip +
    map-side combine pass; everything int64 cents until the single
    mirrored ÷100."""
    from .stages.quantile import grouped_quantile_disc

    ds = _pq(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"], blocks=8)

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "cents": _cents(b.column("l_extendedprice")),
            }
        )

    narrow = ds.map_batches(to_cents, batch_format="pyarrow")
    qt = grouped_quantile_disc(narrow, "l_returnflag", "cents", [0.1, 0.9])
    bounds = {
        r["l_returnflag"]: (r["q10"], r["q90"]) for r in qt.to_pylist()
    }
    bounds_ref = ray.put(bounds)

    def clip_partial(b: pa.Table) -> pa.Table:
        m = ray.get(bounds_ref)
        flags = b.column("l_returnflag").to_numpy(zero_copy_only=False)
        cents = b.column("cents").to_numpy(zero_copy_only=False).copy()
        for flag, (lo, hi) in m.items():
            sel = flags == flag
            cents[sel] = np.clip(cents[sel], lo, hi)
        t = pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "wcents": pa.array(cents),
                "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )
        g = t.group_by("l_returnflag").aggregate([("wcents", "sum"), ("n", "sum")])
        return g.rename_columns(["l_returnflag", "wcents", "n"])

    agg = (
        narrow.map_batches(clip_partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Sum("wcents", alias_name="wcents"), Sum("n", alias_name="n"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return _cents_to_dollars(b, "wcents", "winsorized_sum")

    return agg.map_batches(finish, batch_format="pyarrow")


def events_session_paths(sf_dir: str, k: int = 20):
    """Session SEQUENCE MINING: the top-k most common within-session
    event-type paths (the product-analytics "common journeys" query).
    Sort-kernel shape (r4): ONE global (user, ts, event_id) sort; each
    block sessionizes its interior users vectorized across ALL of them
    at once (gap-and-island run boundaries; path assembly is ONE
    ``pc.binary_join`` over a ListArray of session slices — no Python
    join per session) and emits (path, n) count partials; boundary
    users fold on the driver through the identical kernel. Path totals
    ride the sort-kernel sum (path-proportional group count), then
    block-local top-k partials merge on the driver (blocks×k rows —
    the distinct-path table itself never collects). Same-timestamp
    ordering is pinned by (ts, event_id), exactly as the oracle's
    ORDER BY."""
    GAP_US = 30 * 60 * 1_000_000

    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"], blocks=16)

    def _path_counts(uid: np.ndarray, t: np.ndarray, types: pa.Array) -> pa.Table:
        """(uid, t, types) sorted by (user, ts, eid) → per-path count
        partial, fully vectorized."""
        if uid.size == 0:
            return pa.table(
                {"path": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        new_sess = np.r_[True, (uid[1:] != uid[:-1]) | ((t[1:] - t[:-1]) > GAP_US)]
        starts = np.flatnonzero(new_sess)
        lists = pa.ListArray.from_arrays(
            pa.array(np.r_[starts, uid.size], pa.int32()),
            types.cast(pa.string()),
        )
        paths = pc.binary_join(lists, ">")
        g = pa.table({"path": paths}).group_by("path").aggregate([([], "count_all")])
        return g.rename_columns(["path", "n"])

    pre = ds.map_batches(
        lambda b: pa.table(
            {
                "user_id": pc.cast(b.column("user_id"), pa.int64()),
                "ts_us": pc.cast(
                    pc.cast(b.column("ts"), pa.timestamp("us")), pa.int64()
                ),
                "event_id": pc.cast(b.column("event_id"), pa.int64()),
                "event_type": b.column("event_type"),
            }
        ),
        batch_format="pyarrow",
    )

    def runs(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "kind": pa.array([], pa.int8()),
                "user_id": pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "path": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        uid = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        t = b.column("ts_us").to_numpy(zero_copy_only=False).astype(np.int64)
        em = (uid == uid[0]) | (uid == uid[-1])
        et = b.column("event_type")
        et = et.combine_chunks() if isinstance(et, pa.ChunkedArray) else et
        done = _path_counts(uid[~em], t[~em], et.filter(pa.array(~em)))
        e = b.filter(pa.array(em))
        n_e, n_d = e.num_rows, done.num_rows
        return pa.table(
            {
                "kind": pa.array(np.r_[np.zeros(n_e, np.int8), np.ones(n_d, np.int8)]),
                "user_id": pa.concat_arrays(
                    [
                        e.column("user_id").combine_chunks().cast(pa.int64()),
                        pa.array([0] * n_d, pa.int64()),
                    ]
                ),
                "ts_us": pa.concat_arrays(
                    [
                        e.column("ts_us").combine_chunks().cast(pa.int64()),
                        pa.array([0] * n_d, pa.int64()),
                    ]
                ),
                "event_id": pa.concat_arrays(
                    [
                        e.column("event_id").combine_chunks().cast(pa.int64()),
                        pa.array([0] * n_d, pa.int64()),
                    ]
                ),
                "event_type": pa.concat_arrays(
                    [
                        e.column("event_type").combine_chunks().cast(pa.string()),
                        pa.array([""] * n_d, pa.string()),
                    ]
                ),
                "path": pa.concat_arrays(
                    [
                        pa.array([""] * n_e, pa.string()),
                        done.column("path").combine_chunks().cast(pa.string()),
                    ]
                ),
                "n": pa.concat_arrays(
                    [
                        pa.array([0] * n_e, pa.int64()),
                        done.column("n").combine_chunks().cast(pa.int64()),
                    ]
                ),
            }
        )

    from .util import collect_arrow

    parts = (
        pre.sort(["user_id", "ts_us", "event_id"])
        .map_batches(runs, batch_format="pyarrow")
        .materialize()
    )
    interior = parts.filter(expr="kind == 1").map_batches(
        lambda b: b.select(["path", "n"]), batch_format="pyarrow"
    )
    edge = collect_arrow(parts.filter(expr="kind == 0"))
    counts_in = interior
    if edge.num_rows:
        eu = edge.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ets = edge.column("ts_us").to_numpy(zero_copy_only=False).astype(np.int64)
        eid = edge.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((eid, ets, eu))
        folded = _path_counts(
            eu[o],
            ets[o],
            edge.column("event_type").combine_chunks().take(pa.array(o, pa.int64())),
        )
        if folded.num_rows:
            counts_in = interior.union(rd.from_arrow(folded))
    counts = _sorted_agg_by_key(counts_in, "path", [("n", "sum", "n")])

    def local_topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            b, sort_keys=[("n", "descending"), ("path", "ascending")]
        )
        return b.take(idx.slice(0, k))

    cand = collect_arrow(
        counts.map_batches(local_topk, batch_format="pyarrow"),
        schema=pa.schema([("path", pa.string()), ("n", pa.int64())]),
    )
    idx = pc.sort_indices(cand, sort_keys=[("n", "descending"), ("path", "ascending")])
    top = cand.take(idx.slice(0, k))
    return top.append_column(
        "rank", pa.array(np.arange(1, top.num_rows + 1, dtype=np.int64))
    )


def events_max_concurrency(sf_dir: str):
    """Interval-sweep MAX CONCURRENCY: the peak number of simultaneously
    open sessions (inclusive [start, end]) and the earliest instant it
    is reached — the classic capacity-planning stabbing query. Shape:
    the sessionize map_groups emits ±1 sweep marks ((start, +1),
    (end + 1 µs, −1)) instead of session rows → marks collapse by
    timestamp in a groupby (so same-instant opens/closes net BEFORE the
    level is read — the inclusive-boundary rule) → range-partitioned
    sort by ts → the running level uses the events_auc/running-total
    prefix trick: one int per block flows through the driver, each
    block's max + earliest argmax computed in parallel, a block-count-
    sized reduce at the end. No global sort-into-one-worker, no
    O(marks) driver state.

    Size-gated dense plan (BASELINE.md): marks are session-grain (two
    per session, block-combined by timestamp before collection), so
    below the gate they fold driver-side with one argsort + reduceat
    sweep instead of paying the groupby(ts) + range-sort exchanges."""
    GAP_US = 30 * 60 * 1_000_000

    ds = _pq(sf_dir, "events", ["user_id", "ts"], blocks=16)

    def marks_all(t: pa.Table) -> pa.Table:
        """r5 across-user sessionize-to-marks (sorted (user, ts)): a
        session breaks at a user change or a GAP_US gap, so every
        interior user's ±1 marks fall out of one boundary mask."""
        if t.num_rows == 0:
            return pa.table(
                {"ts": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}
            )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        tsv = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()).to_numpy()
        n = uid.size
        brk = np.r_[True, (uid[1:] != uid[:-1]) | (np.diff(tsv) > GAP_US)]
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], n) - 1
        return pa.table(
            {
                "ts": pa.array(np.concatenate([tsv[starts], tsv[ends] + 1])),
                "d": pa.array(
                    np.concatenate(
                        [
                            np.ones(len(starts), dtype=np.int64),
                            -np.ones(len(starts), dtype=np.int64),
                        ]
                    )
                ),
            }
        )

    from .util import collect_arrow, drop_empty_blocks, sorted_group_apply

    marks_ds = sorted_group_apply(ds, "user_id", ["ts"], marks_all)

    if ds.count() <= _BCAST_KEYS_GATE:
        t = collect_arrow(
            marks_ds.map_batches(
                lambda b: b.group_by("ts")
                .aggregate([("d", "sum")])
                .rename_columns(["ts", "d"]),
                batch_format="pyarrow",
            ),
            schema=pa.schema([("ts", pa.int64()), ("d", pa.int64())]),
        )
        ts = t.column("ts").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("d").to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(ts, kind="stable")
        ts, d = ts[o], d[o]
        starts = np.flatnonzero(np.r_[True, ts[1:] != ts[:-1]])
        run = np.cumsum(np.add.reduceat(d, starts))
        i = int(np.argmax(run))  # first occurrence = earliest ts
        return pa.table(
            {
                "max_concurrent": pa.array([int(run[i])], pa.int64()),
                "at_ts": pa.array([int(ts[starts[i]])], pa.int64()).cast(
                    pa.timestamp("us")
                ),
            }
        )

    # distributed: block-combined marks → ONE global ts sort (no
    # ts-keyed groupby-aggregate — distinct instants are session-
    # proportional and Ray's aggregate walks them in Python, the
    # sort-kernel lesson) → prefix-chained per-block peaks that read
    # the level only at SETTLED instants: a ts straddling blocks
    # settles in the LAST block holding it, so a block skips its final
    # run when the next block starts with the same ts (the
    # events_ks_drift skip_last pattern).
    combined = marks_ds.map_batches(
        lambda b: b.group_by("ts")
        .aggregate([("d", "sum")])
        .rename_columns(["ts", "d"]),
        batch_format="pyarrow",
    )
    mat = drop_empty_blocks(combined.sort("ts")).materialize()

    @ray.remote
    def block_meta(b: pa.Table) -> tuple[int, int, int]:
        ts = b.column("ts").to_numpy(zero_copy_only=False)
        d = b.column("d").to_numpy(zero_copy_only=False)
        return int(d.sum()), int(ts[0]), int(ts[-1])

    @ray.remote
    def block_peak(b: pa.Table, offset: int, skip_last: bool):
        ts = b.column("ts").to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column("d").to_numpy(zero_copy_only=False)
        ends = np.flatnonzero(np.r_[ts[1:] != ts[:-1], True])
        if skip_last:
            ends = ends[:-1]
        if ends.size == 0:
            return None
        run = np.cumsum(d) + offset
        lv = run[ends]
        i = int(np.argmax(lv))  # first occurrence = earliest ts
        return int(lv[i]), int(ts[ends[i]])

    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(ref)
    metas = ray.get([block_meta.remote(r) for r in refs])
    offsets = [0]
    for v, _, _ in metas[:-1]:
        offsets.append(offsets[-1] + v)
    skip = [
        i + 1 < len(metas) and metas[i][2] == metas[i + 1][1]
        for i in range(len(metas))
    ]
    peaks = [
        p
        for p in ray.get(
            [
                block_peak.remote(r, off, sk)
                for r, off, sk in zip(refs, offsets, skip)
            ]
        )
        if p is not None
    ]
    best = max(peaks, key=lambda p: (p[0], -p[1]))
    return pa.table(
        {
            "max_concurrent": pa.array([best[0]], pa.int64()),
            "at_ts": pa.array([best[1]], pa.int64()).cast(pa.timestamp("us")),
        }
    )


def embeddings_reciprocal_nn(
    sf_dir: str,
    k: int = 3,
    ivf_gate: int | None = None,
    nlist: int = 16,
    nprobe: int | None = None,
):
    """RECIPROCAL nearest-neighbor matching (mutual top-k): pairs where
    each vector ranks the other within its cosine top-k, self excluded
    — the high-precision matching rule used for cross-lingual /
    cross-modal pair mining (both directions must agree, which kills
    hub false-positives one-directional kNN suffers). Below the gate
    the scan is the exact streamed all-vectors top-(k+1)
    (knn_brute: broadcast query matrix, block-local top-k partials);
    ABOVE ``_ALLKNN_IVF_GATE`` rows the query matrix no longer
    collects/broadcasts — the scan routes through the cell-partitioned
    IVF index (stages/similarity.knn_all_ivf: tiled
    (query_chunk × cell) matmuls keyed by (probe_cell, chunk), no
    process holds O(N·d)). ``nprobe=None`` keeps the gated path EXACT
    (every cell probed — same output as brute, equality-tested);
    ``nprobe < nlist`` is the approximate production config. The
    directed edge list is N·k and the mutual intersection runs on it
    via one hash of swapped keys — identical downstream either way."""
    from .stages.similarity import _vec_matrix, knn_all_ivf, knn_brute
    from .util import collect_arrow

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    gate = _ALLKNN_IVF_GATE if ivf_gate is None else ivf_gate
    if ds.count() > gate:
        out = knn_all_ivf(
            ds, "embedding", "vec_id", k=k + 1, nlist=nlist, nprobe=nprobe
        )
        src = out.column("query_id").to_numpy(zero_copy_only=False).astype(np.int64)
        dst = out.column("neighbor_id").to_numpy(zero_copy_only=False)
    else:
        t0 = collect_arrow(ds)
        ids = t0.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(ids, kind="stable")
        ids = ids[o]
        queries = _vec_matrix(t0.column("embedding"))[o]
        out = knn_brute(ds, "embedding", "vec_id", queries, k=k + 1)
        src = ids[out.column("query_idx").to_numpy(zero_copy_only=False)]
        dst = out.column("neighbor_id").to_numpy(zero_copy_only=False)
    keep = src != dst  # leave-one-out, order preserved
    src, dst = src[keep], dst[keep]
    # re-rank within each query after self-removal, then cut to k —
    # vectorized segment ranks (position within the per-query run)
    bounds = np.flatnonzero(np.diff(src)) + 1
    starts = np.r_[0, bounds]
    idx = np.arange(len(src))
    rnk = idx - starts[np.searchsorted(bounds, idx, side="right")] + 1
    cut = rnk <= k
    src, dst, rnk = src[cut], dst[cut], rnk[cut]

    # mutual intersection on the N·k edge list: encode directed edges
    # as a single int64 key, binary-search the swapped key
    base = int(max(src.max(), dst.max())) + 1 if src.size else 1
    key = src * base + dst
    ko = np.argsort(key, kind="stable")
    key_sorted, rnk_sorted = key[ko], rnk[ko]
    swapped = dst * base + src
    if key_sorted.size:
        pos = np.minimum(np.searchsorted(key_sorted, swapped), len(key_sorted) - 1)
        mutual = (key_sorted[pos] == swapped) & (src < dst)
    else:
        pos = np.zeros(0, np.int64)
        mutual = np.zeros(0, bool)
    ia, ib, rab = src[mutual], dst[mutual], rnk[mutual]
    rba = rnk_sorted[pos[mutual]]
    t = pa.table(
        {
            "id_a": pa.array(ia, pa.int64()),
            "id_b": pa.array(ib, pa.int64()),
            "rank_ab": pa.array(rab, pa.int64()),
            "rank_ba": pa.array(rba, pa.int64()),
        }
    )
    return t.take(
        pc.sort_indices(t, sort_keys=[("id_a", "ascending"), ("id_b", "ascending")])
    )


def docs_weighted_sample(sf_dir: str, k: int = 128):
    """Deterministic WEIGHTED bottom-k sample — select k documents with
    probability ∝ n_chars, reproducibly (the quality-weighted sampling
    step of corpus curation, where longer/higher-scoring docs should be
    over-represented but the pick must replay identically across runs
    and partitionings). The A-Res exponential key u^(1/w) is replaced
    by the integer-exact analog rank = (hash43 << 20) // weight — a
    63-bit floor-scaled hash/weight ratio computed identically in SQL
    (HUGEINT) and numpy (uint64), so there is no float boundary and the
    selected SET is bit-stable. Shape: vectorized key stamp per block →
    block-local top-k partials → driver merge of ≤ blocks·k rows (the
    K1 distributed top-k pattern); no sort, no shuffle."""
    from .util import collect_arrow

    ds = _pq(sf_dir, "documents", ["doc_id", "n_chars"], blocks=8)

    def local_topk(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        w = b.column("n_chars").to_numpy(zero_copy_only=False).astype(np.uint64)
        h43 = _fnv64(ids) >> np.uint64(21)
        rank = ((h43 << np.uint64(20)) // np.maximum(w, 1)).astype(np.int64)
        t = pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_chars": b.column("n_chars"),
                "rank_key": pa.array(rank),
            }
        )
        idx = pc.sort_indices(
            t, sort_keys=[("rank_key", "ascending"), ("doc_id", "ascending")]
        )
        return t.take(idx.slice(0, k))

    parts = collect_arrow(ds.map_batches(local_topk, batch_format="pyarrow"))
    idx = pc.sort_indices(
        parts, sort_keys=[("rank_key", "ascending"), ("doc_id", "ascending")]
    )
    return parts.take(idx.slice(0, k))


def orders_shipping_priority(sf_dir: str):
    """TPC-H Q3-shaped join + grouped top-k — segment-filtered customer
    ⋈ date-sliced orders ⋈ shipdate-sliced lineitem, revenue per order,
    top 10. Distributed plan: every scan prunes its predicate and
    projects only join columns; lineitem pre-aggregates rev_cents by
    orderkey INSIDE each block before the exchange (the classic
    join-key combine — at 100 TB the per-order partials are ~4×
    smaller than the line rows); the final per-order groupby keys on
    (orderkey, orderdate, priority) since both ride functionally on
    orderkey; top-10 is a per-block local top-k merged driver-side —
    only 10 rows per block ever reach the driver.

    Size-gated dense plan (BASELINE.md "broadcast-plan join deltas"):
    below the gate the BUILDING custkeys and the date-sliced order
    slice ship once as sorted arrays, lineitem streams ONCE emitting
    block-local per-order rev partials for surviving orderkeys only,
    and the driver folds the partials into the top-10 — zero
    exchanges. Above the gate the two-join plan below runs unchanged."""
    from .util import collect_arrow, drop_empty_blocks

    nparts = _join_partitions()
    cutoff = pa.scalar(np.datetime64("1998-06-01", "us"), pa.timestamp("us"))

    bkeys = _building_keys(sf_dir)
    if (
        bkeys is not None
        and _pq(sf_dir, "orders", ["o_orderkey"]).count() <= 2 * _BCAST_KEYS_GATE
    ):
        def ord_slice(b: pa.Table) -> pa.Table:
            d = pc.cast(b.column("o_orderdate"), pa.timestamp("us"))
            t = b.filter(pc.less(d, cutoff))
            ck = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
            t = t.filter(pa.array(_sorted_member_mask(bkeys, ck)))
            return pa.table(
                {
                    "o_orderkey": t.column("o_orderkey"),
                    "o_orderdate": pc.cast(t.column("o_orderdate"), pa.timestamp("us")),
                    "o_orderpriority": t.column("o_orderpriority"),
                }
            )

        ord_t = collect_arrow(
            _pq(
                sf_dir, "orders",
                ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
                blocks=8,
            ).map_batches(ord_slice, batch_format="pyarrow"),
            schema=pa.schema(
                [
                    ("o_orderkey", pa.int64()),
                    ("o_orderdate", pa.timestamp("us")),
                    ("o_orderpriority", pa.string()),
                ]
            ),
        )
        okeys = ord_t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        oo = np.argsort(okeys, kind="stable")
        okeys = okeys[oo]
        ord_t = ord_t.take(pa.array(oo, pa.int64()))
        keys_ref = ray.put(okeys)

        def li_pass(b: pa.Table) -> pa.Table:
            kk = ray.get(keys_ref)
            d = pc.cast(b.column("l_shipdate"), pa.timestamp("us"))
            t = b.filter(pc.greater(d, cutoff))
            ok = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
            t = t.filter(pa.array(_sorted_member_mask(kk, ok)))
            rev = pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            )
            part = pa.table({"_ok": t.column("l_orderkey"), "rev_cents": _cents(rev)})
            return (
                part.group_by("_ok")
                .aggregate([("rev_cents", "sum")])
                .rename_columns(["_ok", "rev_cents"])
            )

        parts = collect_arrow(
            _pq(
                sf_dir, "lineitem",
                ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
                blocks=16,
            ).map_batches(li_pass, batch_format="pyarrow"),
            schema=pa.schema([("_ok", pa.int64()), ("rev_cents", pa.int64())]),
        )
        per = (
            parts.group_by("_ok")
            .aggregate([("rev_cents", "sum")])
            .rename_columns(["_ok", "rev_cents"])
        )
        idx = pc.sort_indices(
            per, sort_keys=[("rev_cents", "descending"), ("_ok", "ascending")]
        )
        top = per.take(idx.slice(0, 10))
        pos = np.searchsorted(
            okeys, top.column("_ok").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        meta = ord_t.take(pa.array(pos, pa.int64()))
        return _cents_to_dollars(
            pa.table(
                {
                    "l_orderkey": top.column("_ok"),
                    "o_orderdate": meta.column("o_orderdate"),
                    "o_orderpriority": meta.column("o_orderpriority"),
                    "rev_cents": top.column("rev_cents"),
                }
            ),
            "rev_cents",
            "revenue",
        )

    def cust_scan(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("c_mktsegment"), "BUILDING"))
        return pa.table({"_ck": t.column("c_custkey")})

    cust = drop_empty_blocks(
        _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"], blocks=4).map_batches(
            cust_scan, batch_format="pyarrow"
        )
    )

    def ord_scan(b: pa.Table) -> pa.Table:
        d = pc.cast(b.column("o_orderdate"), pa.timestamp("us"))
        t = b.filter(pc.less(d, cutoff))
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "_ck2": t.column("o_custkey"),
                "o_orderdate": pc.cast(t.column("o_orderdate"), pa.timestamp("us")),
                "o_orderpriority": t.column("o_orderpriority"),
            }
        )

    ords = _pq(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        blocks=8,
    ).map_batches(ord_scan, batch_format="pyarrow")
    j1 = ords.join(cust, "inner", nparts, on=("_ck2",), right_on=("_ck",))

    def li_scan(b: pa.Table) -> pa.Table:
        d = pc.cast(b.column("l_shipdate"), pa.timestamp("us"))
        t = b.filter(pc.greater(d, cutoff))
        rev = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        part = pa.table({"_ok": t.column("l_orderkey"), "rev_cents": _cents(rev)})
        return (
            part.group_by("_ok")
            .aggregate([("rev_cents", "sum")])
            .rename_columns(["_ok", "rev_cents"])
        )

    li = _pq(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        blocks=16,
    ).map_batches(li_scan, batch_format="pyarrow")
    j2 = li.join(j1, "inner", nparts, on=("_ok",), right_on=("o_orderkey",))

    per_order = drop_empty_blocks(
        _sorted_agg_by_key(
            j2,
            ["_ok", "o_orderdate", "o_orderpriority"],
            [("rev_cents", "sum", "rev_cents")],
        )
    )

    def local_topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            b, sort_keys=[("rev_cents", "descending"), ("_ok", "ascending")]
        )
        return b.take(idx.slice(0, 10))

    parts = collect_arrow(per_order.map_batches(local_topk, batch_format="pyarrow"))
    idx = pc.sort_indices(
        parts, sort_keys=[("rev_cents", "descending"), ("_ok", "ascending")]
    )
    top = parts.take(idx.slice(0, 10))
    return _cents_to_dollars(
        pa.table(
            {
                "l_orderkey": top.column("_ok"),
                "o_orderdate": top.column("o_orderdate"),
                "o_orderpriority": top.column("o_orderpriority"),
                "rev_cents": top.column("rev_cents"),
            }
        ),
        "rev_cents",
        "revenue",
    )


_Q18_MIN_QTY_CENTS = 14000  # sum(l_quantity) > 140


def orders_large_qty(sf_dir: str):
    """TPC-H Q18-shaped HAVING-gated join chain — orders whose total
    line quantity exceeds a threshold, joined back to orders+customer,
    top 100 by order value. Distributed plan: quantity sums as exact
    integer centi-units with a block-level combine before the orderkey
    groupby; the HAVING gate runs where the aggregate lands (the
    surviving set is tiny — at TPC-H SF100k only ~1e-5 of orders
    clear 140 units), so both downstream joins are semi-join-sized;
    customer joins last against the already-filtered order set."""
    from .util import collect_arrow, drop_empty_blocks

    nparts = _join_partitions()

    def li_scan(b: pa.Table) -> pa.Table:
        part = pa.table(
            {"_ok": b.column("l_orderkey"), "qty_c": _cents(b.column("l_quantity"))}
        )
        return (
            part.group_by("_ok")
            .aggregate([("qty_c", "sum")])
            .rename_columns(["_ok", "qty_c"])
        )

    big = drop_empty_blocks(
        _sorted_agg_by_key(
            _pq(sf_dir, "lineitem", ["l_orderkey", "l_quantity"], blocks=16)
            .map_batches(li_scan, batch_format="pyarrow"),
            "_ok",
            [("qty_c", "sum", "qty_c")],
        )
        .map_batches(
            lambda b: b.filter(pc.greater(b.column("qty_c"), _Q18_MIN_QTY_CENTS)),
            batch_format="pyarrow",
        )
    )

    def ord_scan(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "_ck": b.column("o_custkey"),
                "o_orderdate": pc.cast(b.column("o_orderdate"), pa.timestamp("us")),
                "total_cents": _cents(b.column("o_totalprice")),
            }
        )

    ords = _pq(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        blocks=8,
    ).map_batches(ord_scan, batch_format="pyarrow")
    j1 = big.join(ords, "inner", nparts, on=("_ok",), right_on=("o_orderkey",))

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_name"], blocks=4)
    j2 = j1.join(cust, "inner", nparts, on=("_ck",), right_on=("c_custkey",))

    def local_topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            b, sort_keys=[("total_cents", "descending"), ("_ok", "ascending")]
        )
        return b.take(idx.slice(0, 100))

    parts = collect_arrow(
        drop_empty_blocks(j2.map_batches(local_topk, batch_format="pyarrow"))
    )
    idx = pc.sort_indices(
        parts, sort_keys=[("total_cents", "descending"), ("_ok", "ascending")]
    )
    top = parts.take(idx.slice(0, 100))
    qty = pc.divide(pc.cast(top.column("qty_c"), pa.float64()), 100.0)
    return _cents_to_dollars(
        pa.table(
            {
                "c_custkey": top.column("_ck"),
                "c_name": top.column("c_name"),
                "o_orderkey": top.column("_ok"),
                "o_orderdate": top.column("o_orderdate"),
                "total_cents": top.column("total_cents"),
                "sum_qty": qty,
            }
        ),
        "total_cents",
        "o_totalprice",
    )


def orders_returned_customers(sf_dir: str):
    """TPC-H Q10-shaped returned-revenue ranking — lost revenue per
    customer from RETURNED lines in a one-quarter order window, with
    nation names, top 20. Distributed plan: lineitem prunes to
    returnflag='R' and combines rev_cents by orderkey in-block; orders
    prunes the quarter at the scan; after the orderkey join the rows
    collapse to custkey grain BEFORE the customer join (the exchange
    carries ≤ |customers| rows); the 25-row nation map is a closure
    broadcast, never a shuffle.

    Size-gated dense plan (BASELINE.md "broadcast-plan join deltas"):
    below the gate the quarter-sliced (orderkey → custkey) map ships
    once as sorted arrays, lineitem streams ONCE emitting block-local
    per-custkey rev partials for surviving orderkeys only, the driver
    folds the partials and takes the top-20, and the 20 customers'
    attributes come from one `is_in`-pruned customer scan — zero
    exchanges. Above the gate the join plan below runs unchanged."""
    from .util import collect_arrow, drop_empty_blocks

    nparts = _join_partitions()
    nat = collect_arrow(_pq(sf_dir, "nation", ["n_nationkey", "n_name"]))
    nat_names = dict(
        zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    )
    lo = pa.scalar(np.datetime64("1998-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1998-04-01", "us"), pa.timestamp("us"))

    if _pq(sf_dir, "orders", ["o_orderkey"]).count() <= 2 * _BCAST_KEYS_GATE:
        def ord_slice(b: pa.Table) -> pa.Table:
            d = pc.cast(b.column("o_orderdate"), pa.timestamp("us"))
            t = b.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
            return pa.table(
                {"o_orderkey": t.column("o_orderkey"), "_ck": t.column("o_custkey")}
            )

        ord_t = collect_arrow(
            _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"], blocks=8)
            .map_batches(ord_slice, batch_format="pyarrow"),
            schema=pa.schema([("o_orderkey", pa.int64()), ("_ck", pa.int64())]),
        )
        okeys = ord_t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ocust = ord_t.column("_ck").to_numpy(zero_copy_only=False).astype(np.int64)
        oo = np.argsort(okeys, kind="stable")
        okeys, ocust = okeys[oo], ocust[oo]
        dim_ref = ray.put((okeys, ocust))

        def li_pass(b: pa.Table) -> pa.Table:
            kk, cc = ray.get(dim_ref)
            t = b.filter(pc.equal(b.column("l_returnflag"), "R"))
            ok = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
            m = _sorted_member_mask(kk, ok)
            t = t.filter(pa.array(m))
            rev = pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            )
            ck = cc[np.minimum(np.searchsorted(kk, ok[m]), max(kk.size - 1, 0))]
            part = pa.table(
                {"_ck": pa.array(ck, pa.int64()), "rev_cents": _cents(rev)}
            )
            return (
                part.group_by("_ck")
                .aggregate([("rev_cents", "sum")])
                .rename_columns(["_ck", "rev_cents"])
            )

        parts = collect_arrow(
            _pq(
                sf_dir, "lineitem",
                ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
                blocks=16,
            ).map_batches(li_pass, batch_format="pyarrow"),
            schema=pa.schema([("_ck", pa.int64()), ("rev_cents", pa.int64())]),
        )
        per = (
            parts.group_by("_ck")
            .aggregate([("rev_cents", "sum")])
            .rename_columns(["_ck", "rev_cents"])
        )
        idx = pc.sort_indices(
            per, sort_keys=[("rev_cents", "descending"), ("_ck", "ascending")]
        )
        top = per.take(idx.slice(0, 20))
        want = pa.array(
            top.column("_ck").to_numpy(zero_copy_only=False).astype(np.int64),
            pa.int64(),
        )
        cust_t = collect_arrow(
            _pq(
                sf_dir, "customer",
                ["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
                blocks=4,
            ).map_batches(
                lambda b: b.filter(pc.is_in(b.column("c_custkey"), value_set=want)),
                batch_format="pyarrow",
            ),
        )
        ckeys = cust_t.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        co = np.argsort(ckeys, kind="stable")
        ckeys = ckeys[co]
        cust_t = cust_t.take(pa.array(co, pa.int64()))
        pos = np.searchsorted(
            ckeys, top.column("_ck").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        meta = cust_t.take(pa.array(pos, pa.int64()))
        names = pa.array(
            [nat_names[k] for k in meta.column("c_nationkey").to_pylist()], pa.string()
        )
        return _cents_to_dollars(
            pa.table(
                {
                    "c_custkey": top.column("_ck"),
                    "c_name": meta.column("c_name"),
                    "c_acctbal": meta.column("c_acctbal"),
                    "n_name": names,
                    "rev_cents": top.column("rev_cents"),
                }
            ),
            "rev_cents",
            "revenue",
        )

    def li_scan(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("l_returnflag"), "R"))
        rev = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        part = pa.table({"_ok": t.column("l_orderkey"), "rev_cents": _cents(rev)})
        return (
            part.group_by("_ok")
            .aggregate([("rev_cents", "sum")])
            .rename_columns(["_ok", "rev_cents"])
        )

    li = drop_empty_blocks(
        _pq(
            sf_dir, "lineitem",
            ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
            blocks=16,
        ).map_batches(li_scan, batch_format="pyarrow")
    )

    def ord_scan(b: pa.Table) -> pa.Table:
        d = pc.cast(b.column("o_orderdate"), pa.timestamp("us"))
        t = b.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        return pa.table(
            {"o_orderkey": t.column("o_orderkey"), "_ck": t.column("o_custkey")}
        )

    ords = drop_empty_blocks(
        _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"], blocks=8)
        .map_batches(ord_scan, batch_format="pyarrow")
    )
    j1 = li.join(ords, "inner", nparts, on=("_ok",), right_on=("o_orderkey",))

    # custkey-proportional sum via the sort-kernel (no per-group
    # Python walk; block groupby stays as the map-side combine)
    per_cust = drop_empty_blocks(
        _sorted_sum_by_key(
            j1.map_batches(
                lambda b: b.select(["_ck", "rev_cents"])
                .group_by("_ck")
                .aggregate([("rev_cents", "sum")])
                .rename_columns(["_ck", "rev_cents"]),
                batch_format="pyarrow",
            ),
            "_ck",
            "rev_cents",
            "rev_cents",
        )
    )

    cust = _pq(
        sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        blocks=4,
    )
    j2 = per_cust.join(cust, "inner", nparts, on=("_ck",), right_on=("c_custkey",))

    def local_topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            b, sort_keys=[("rev_cents", "descending"), ("_ck", "ascending")]
        )
        return b.take(idx.slice(0, 20))

    parts = collect_arrow(
        drop_empty_blocks(j2.map_batches(local_topk, batch_format="pyarrow"))
    )
    idx = pc.sort_indices(
        parts, sort_keys=[("rev_cents", "descending"), ("_ck", "ascending")]
    )
    top = parts.take(idx.slice(0, 20))
    names = pa.array(
        [nat_names[k] for k in top.column("c_nationkey").to_pylist()], pa.string()
    )
    return _cents_to_dollars(
        pa.table(
            {
                "c_custkey": top.column("_ck"),
                "c_name": top.column("c_name"),
                "c_acctbal": top.column("c_acctbal"),
                "n_name": names,
                "rev_cents": top.column("rev_cents"),
            }
        ),
        "rev_cents",
        "revenue",
    )


def part_promo_share(sf_dir: str):
    """TPC-H Q14-shaped conditional revenue share, grouped monthly —
    PROMO-part revenue as a fraction of all revenue per ship month.
    Distributed plan: lineitem pre-aggregates rev_cents by (partkey,
    month) inside each block (the join-key combine compresses the
    exchange ~|lines per part·month|×); part ships only (partkey,
    is_promo bool) into the hash join — at 100 TB both sides stay
    fact-sized so this is a true distributed join, not a broadcast;
    the month-grain finish is a tiny conditional-sum groupby. The one
    float division (promo/total) happens once per month row,
    identically ordered in SQL."""
    from .util import collect_arrow, drop_empty_blocks

    nparts = _join_partitions()

    def li_scan(b: pa.Table) -> pa.Table:
        d = pc.cast(b.column("l_shipdate"), pa.timestamp("us"))
        month = pc.floor_temporal(d, unit="month")
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
        part = pa.table(
            {
                "_pk": b.column("l_partkey"),
                "month": month,
                "rev_cents": _cents(rev),
            }
        )
        return (
            part.group_by(["_pk", "month"])
            .aggregate([("rev_cents", "sum")])
            .rename_columns(["_pk", "month", "rev_cents"])
        )

    li = _pq(
        sf_dir, "lineitem",
        ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        blocks=16,
    ).map_batches(li_scan, batch_format="pyarrow")

    def part_scan(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": b.column("p_partkey"),
                "is_promo": pc.equal(b.column("p_type"), "PROMO"),
            }
        )

    parts_ds = _pq(sf_dir, "part", ["p_partkey", "p_type"], blocks=4).map_batches(
        part_scan, batch_format="pyarrow"
    )
    j = li.join(parts_ds, "inner", nparts, on=("_pk",), right_on=("p_partkey",))

    def combine(b: pa.Table) -> pa.Table:
        promo = pc.if_else(
            b.column("is_promo"), b.column("rev_cents"), pa.scalar(0, pa.int64())
        )
        t = pa.table(
            {
                "month": b.column("month"),
                "promo_cents": promo,
                "total_cents": b.column("rev_cents"),
            }
        )
        return (
            t.group_by("month")
            .aggregate([("promo_cents", "sum"), ("total_cents", "sum")])
            .rename_columns(["month", "promo_cents", "total_cents"])
        )

    monthly = collect_arrow(
        drop_empty_blocks(
            j.map_batches(combine, batch_format="pyarrow")
            .groupby("month")
            .aggregate(
                Sum("promo_cents", alias_name="promo_cents"),
                Sum("total_cents", alias_name="total_cents"),
            )
        )
    )
    share = pc.divide(
        pc.cast(monthly.column("promo_cents"), pa.float64()),
        pc.cast(monthly.column("total_cents"), pa.float64()),
    )
    out = monthly.append_column("promo_share", share)
    return out.take(pc.sort_indices(out, sort_keys=[("month", "ascending")]))


def orders_priority_late(sf_dir: str):
    """TPC-H Q4-shaped EXISTS semi-join, decorrelated — orders in a
    one-year window having ANY line shipped >90 days after the order
    date, counted per priority. Distributed plan: the correlated
    EXISTS becomes a per-orderkey MAX(l_shipdate) aggregate (block
    combine → groupby max — the max is the only fact the predicate
    needs, so the exchange carries one row per order, not per line);
    the window prune runs at the orders scan; an inner join + integer
    timestamp comparison replaces the subquery; the finish is a
    5-row priority count."""
    from .util import collect_arrow, drop_empty_blocks

    nparts = _join_partitions()
    lo = pa.scalar(np.datetime64("1997-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1998-01-01", "us"), pa.timestamp("us"))
    late_us = 90 * 86_400_000_000  # 90 days in microseconds

    def li_scan(b: pa.Table) -> pa.Table:
        part = pa.table(
            {
                "_ok": b.column("l_orderkey"),
                "ship_us": pc.cast(
                    pc.cast(b.column("l_shipdate"), pa.timestamp("us")), pa.int64()
                ),
            }
        )
        return (
            part.group_by("_ok")
            .aggregate([("ship_us", "max")])
            .rename_columns(["_ok", "ship_us"])
        )

    li = drop_empty_blocks(
        _sorted_agg_by_key(
            _pq(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"], blocks=16)
            .map_batches(li_scan, batch_format="pyarrow"),
            "_ok",
            [("ship_us", "max", "ship_us")],
        )
    )

    def ord_scan(b: pa.Table) -> pa.Table:
        d = pc.cast(b.column("o_orderdate"), pa.timestamp("us"))
        t = b.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "ord_us": pc.cast(
                    pc.cast(t.column("o_orderdate"), pa.timestamp("us")), pa.int64()
                ),
                "o_orderpriority": t.column("o_orderpriority"),
            }
        )

    ords = drop_empty_blocks(
        _pq(
            sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"],
            blocks=8,
        ).map_batches(ord_scan, batch_format="pyarrow")
    )
    j = li.join(ords, "inner", nparts, on=("_ok",), right_on=("o_orderkey",))

    def late_count(b: pa.Table) -> pa.Table:
        keep = pc.greater(
            b.column("ship_us"), pc.add(b.column("ord_us"), pa.scalar(late_us))
        )
        t = b.filter(keep)
        return (
            pa.table({"o_orderpriority": t.column("o_orderpriority")})
            .group_by("o_orderpriority")
            .aggregate([([], "count_all")])
            .rename_columns(["o_orderpriority", "n_late"])
        )

    out = collect_arrow(
        drop_empty_blocks(
            j.map_batches(late_count, batch_format="pyarrow")
            .groupby("o_orderpriority")
            .aggregate(Sum("n_late", alias_name="n_late"))
        )
    )
    return out.take(
        pc.sort_indices(out, sort_keys=[("o_orderpriority", "ascending")])
    )


def events_cumulative_distinct(sf_dir: str):
    """Running COUNT(DISTINCT) window — per user, the number of
    distinct event types seen up to and including each event (ordered
    by ts, event_id). The classic streaming-dashboard window that SQL
    needs a two-window trick for (first-occurrence flag → running
    sum). r5: ONE global (user, ts, event_id) sort + an across-user
    kernel via util.sorted_group_apply — a second lexsort groups rows
    by (user, type) while keeping time order, so each (user, type)
    pair's FIRST position falls out of one shifted comparison and
    scatters back as a flag; the running count is a boundary-reset
    cumsum. No per-user Python dispatch."""
    from .util import sorted_group_apply

    ds = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"], blocks=8)

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "distinct_types": pa.array([], pa.int64()),
                }
            )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        n = uid.size
        codes = (
            pc.dictionary_encode(t.column("event_type").combine_chunks())
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        # group by (user, type), stable in time order
        o2 = np.lexsort((np.arange(n), codes, uid))
        u2, c2 = uid[o2], codes[o2]
        first = np.r_[True, (u2[1:] != u2[:-1]) | (c2[1:] != c2[:-1])]
        flags = np.zeros(n, np.int64)
        flags[o2[first]] = 1
        cum = np.cumsum(flags)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        runlens = np.diff(np.r_[starts, n])
        base = np.repeat((cum - flags)[starts], runlens)
        return pa.table(
            {
                "user_id": pc.cast(t.column("user_id"), pa.int64()),
                "event_id": pc.cast(t.column("event_id"), pa.int64()),
                "distinct_types": pa.array(cum - base),
            }
        )

    return sorted_group_apply(ds, "user_id", ["ts", "event_id"], kernel)


_SPLIT_TRAIN, _SPLIT_VAL = 0.8, 0.9


def docs_proportional_split(sf_dir: str):
    """Per-source EXACT-proportion train/val/test split — unlike the
    hash-bucket split (`docs_split`, proportions only in expectation),
    every source contributes exactly floor(0.8·n) train and
    floor(0.9·n)−floor(0.8·n) val rows: docs are ranked inside their
    source by (FNV-1a(doc_id), doc_id) — a deterministic shuffle — and
    ranks are cut at the exact boundaries. Distributed: one
    groupby(source).map_groups, vectorized hash + argsort per group;
    group count = source count, so skew is bounded by the biggest
    source (salt by hash prefix if one source dominates at scale)."""
    ds = _pq(sf_dir, "documents", ["doc_id", "source"], blocks=8)

    def per_source(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy()
        h = _fnv64(ids)
        order = np.lexsort((ids, h))
        n = len(ids)
        n_train = int(np.floor(_SPLIT_TRAIN * n))
        n_val = int(np.floor(_SPLIT_VAL * n))
        split = np.full(n, "test", dtype=object)
        split[:n_train] = "train"
        split[n_train:n_val] = "val"
        return pa.table(
            {
                "doc_id": pa.array(ids[order]),
                "source": g.column("source").take(pa.array(order)),
                "split": pa.array(split.astype(str)),
            }
        )

    return ds.groupby("source").map_groups(per_source, batch_format="pyarrow")


def docs_prefix_dups(sf_dir: str):
    """PREFIX-containment dedup — docs whose full text is a prefix of
    some other doc's text (the truncation-artifact near-dup class:
    partial fetches, cut-off mirrors; subsumes exact dups). Uses the
    lexicographic sandwich property: if A ≤ C ≤ B and A is a prefix of
    B then A is a prefix of C — so A is a prefix of SOME other doc iff
    A is a prefix of its immediate sorted successor (equal-text runs
    flag their last member via predecessor equality). Distributed
    shape: ONE groupby on the text's first character (any non-empty
    prefix pair shares it, so no cross-group pairs exist) →
    in-group numpy argsort + one vectorized shifted `startswith` —
    O(n log n) per group, no pair loop anywhere. First-char groups are
    Zipf-skewed on open-web text; the documented refinement
    sub-buckets by (first char, length band) exactly like the PPJoin
    degenerate-bucket split in stages/dedup. Empty-text docs (prefix
    of everything) are flagged by a tiny driver-side count check."""
    from .util import collect_arrow

    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)

    def key_batch(b: pa.Table) -> pa.Table:
        first = pc.utf8_slice_codeunits(b.column("text"), 0, 1)
        return b.append_column("_k", first)

    keyed = ds.map_batches(key_batch, batch_format="pyarrow")

    def per_group(g: pa.Table) -> pa.Table:
        texts = g.column("text").to_numpy(zero_copy_only=False).astype(str)
        ids = g.column("doc_id").to_numpy()
        order = np.lexsort((ids, texts))
        t_s, id_s = texts[order], ids[order]
        flag = np.zeros(len(t_s), dtype=bool)
        if len(t_s) > 1:
            flag[:-1] = np.char.startswith(t_s[1:], t_s[:-1])
            flag[1:] |= t_s[1:] == t_s[:-1]
        return pa.table({"doc_id": pa.array(id_s[flag])})

    out = collect_arrow(keyed.groupby("_k").map_groups(per_group, batch_format="pyarrow"))
    # empty text: prefix of every other doc — flagged iff any other doc
    # exists; the group pass can't see beyond its first-char group.
    n_total = ds.count()
    empty_ids = collect_arrow(
        ds.map_batches(
            lambda b: b.filter(pc.equal(b.column("text"), "")).select(["doc_id"]),
            batch_format="pyarrow",
        )
    )
    if empty_ids.num_rows and n_total > 1:
        out = pa.concat_tables(
            [out, empty_ids.filter(
                pc.invert(pc.is_in(empty_ids.column("doc_id"), value_set=out.column("doc_id").combine_chunks()))
            )]
        )
    return out.take(pc.sort_indices(out, sort_keys=[("doc_id", "ascending")]))


_BOOL_AND_TERMS = ("vector", "hash", "stream")


def docs_boolean_and(sf_dir: str):
    """Boolean AND search over the corpus — docs containing ALL query
    terms (the postings-intersection read path of the inverted index
    `docs_postings` builds). Distributed shape: the scan explodes each
    block to (term, doc) pairs, prunes to the |Q| query terms and
    dedups in-block (the combiner — only matching pairs leave the
    scan); r5: ONE global (doc, term) sort via util.sorted_group_apply
    replaces the two proportional-key groupby-aggregates — after the
    sort, cross-block repeats are adjacent, so one boundary mask both
    dedups pairs and counts distinct terms per doc (keep docs whose
    count equals |Q|). At index-serving scale you'd read the Q postings
    segments instead of scanning the corpus; this is the scan-side
    expression of the same algebra."""
    from .util import collect_arrow, drop_empty_blocks

    terms = pa.array(list(_BOOL_AND_TERMS), pa.string())
    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)

    def explode_prune(b: pa.Table) -> pa.Table:
        t = b.combine_chunks()
        words = pc.split_pattern(t.column("text"), " ")
        la = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        counts = np.diff(la.offsets.to_numpy())
        parent = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        pairs = pa.table(
            {
                "term": la.flatten(),
                "doc_id": t.column("doc_id").take(pa.array(parent)),
            }
        )
        pairs = pairs.filter(pc.is_in(pairs.column("term"), value_set=terms))
        return (
            pairs.group_by(["doc_id", "term"])
            .aggregate([])
        )

    from .util import sorted_group_apply

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_terms": pa.array([], pa.int64()),
                }
            )
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        term_arr = pc.cast(t.column("term"), pa.string()).combine_chunks()
        n = did.size
        dchg = np.r_[True, did[1:] != did[:-1]]
        uniq = dchg | np.r_[
            False,
            pc.not_equal(
                term_arr.slice(1), term_arr.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False),
        ]
        starts = np.flatnonzero(dchg[uniq])
        counts = np.diff(np.r_[starts, int(uniq.sum())]).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(did[uniq][starts], pa.int64()),
                "n_terms": pa.array(counts, pa.int64()),
            }
        )

    hits = sorted_group_apply(
        drop_empty_blocks(ds.map_batches(explode_prune, batch_format="pyarrow")),
        "doc_id",
        ["term"],
        kernel,
    )
    out = collect_arrow(
        hits.map_batches(
            lambda b: b.filter(
                pc.equal(b.column("n_terms"), len(_BOOL_AND_TERMS))
            ).select(["doc_id"]),
            batch_format="pyarrow",
        ),
        schema=pa.schema([("doc_id", pa.int64())]),
    )
    return out.take(pc.sort_indices(out, sort_keys=[("doc_id", "ascending")]))


def events_dau_wau(sf_dir: str):
    """DAU / trailing-7-day WAU stickiness — the product-analytics
    staple whose SQL form needs a sliding COUNT(DISTINCT) no window
    frame supports. r5: ONE global (user, ts) sort + an across-user
    kernel via util.sorted_group_apply; distinct (user, day) pairs
    fall out of the sorted runs, the sliding distinct becomes a
    bounded ×7 window expansion deduped per user with one block-level
    lexsort, and the block emits PRE-COUNTED (day, dau, wau) partials
    — day-sized, calendar-bounded. Window days no user was actually
    active on are pruned against the observed-day set during the
    fold. The ×7 fan-out is the price of exactness and is the
    standard trade against a sliding HLL sketch (events_approx_users)
    when the window is short."""
    from .util import collect_arrow, sorted_group_apply

    ds = _pq(sf_dir, "events", ["user_id", "ts"], blocks=16)
    DAY_US = 86_400_000_000

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "day": pa.array([], pa.int64()),
                    "dau": pa.array([], pa.int64()),
                    "wau": pa.array([], pa.int64()),
                }
            )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        days = (
            pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64())
            .to_numpy(zero_copy_only=False)
            // DAY_US
        ) * DAY_US
        new_run = np.r_[True, uid[1:] != uid[:-1]]
        dmask = new_run | np.r_[False, days[1:] != days[:-1]]
        uu, du = uid[dmask], days[dmask]
        d_days, d_counts = np.unique(du, return_counts=True)
        wu = np.repeat(uu, 7)
        wd = (du[:, None] + np.arange(7, dtype=np.int64)[None, :] * DAY_US).ravel()
        order = np.lexsort((wd, wu))
        wu, wd = wu[order], wd[order]
        uniq = np.r_[True, (wu[1:] != wu[:-1]) | (wd[1:] != wd[:-1])]
        w_days, w_counts = np.unique(wd[uniq], return_counts=True)
        return pa.table(
            {
                "day": pa.array(np.r_[d_days, w_days]),
                "dau": pa.array(
                    np.r_[d_counts, np.zeros(w_days.size)].astype(np.int64)
                ),
                "wau": pa.array(
                    np.r_[np.zeros(d_days.size), w_counts].astype(np.int64)
                ),
            }
        )

    parts = collect_arrow(sorted_group_apply(ds, "user_id", ["ts"], kernel))
    folded = (
        parts.group_by("day")
        .aggregate([("dau", "sum"), ("wau", "sum")])
        .rename_columns(["day", "dau", "wau"])
    )
    observed = folded.filter(pc.greater(folded.column("dau"), 0))
    out = pa.table(
        {
            "day": pc.cast(observed.column("day"), pa.timestamp("us")),
            "dau": observed.column("dau"),
            "wau": observed.column("wau"),
            "stickiness": pc.divide(
                pc.cast(observed.column("dau"), pa.float64()),
                pc.cast(observed.column("wau"), pa.float64()),
            ),
        }
    )
    return out.take(pc.sort_indices(out, sort_keys=[("day", "ascending")]))


def events_session_conversion(sf_dir: str):
    """Sessionized funnel CONVERSION RATE — per session-start day, what
    share of 30-min-gap sessions contain both a view AND a purchase.
    The composition a growth team actually runs: gap-and-island
    sessionization (events_sessionize's verified kernel) chained into
    per-session flags and a day-grain conditional aggregate. r5: ONE
    global (user, ts) sort + an across-user kernel via
    util.sorted_group_apply — a session breaks at a user change OR a
    30-min gap, so every block sessionizes ALL its interior users in
    one pass and emits (day, n_sessions, n_converted) partials; one
    tiny day groupby finishes. The exchange is day-sized."""
    from .util import collect_arrow, drop_empty_blocks, sorted_group_apply

    GAP_US = 30 * 60 * 1_000_000
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_type"], blocks=16)

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "day": pa.array([], pa.int64()),
                    "n_sessions": pa.array([], pa.int64()),
                    "n_converted": pa.array([], pa.int64()),
                }
            )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()).to_numpy()
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        n = uid.size
        new_s = np.r_[True, (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > GAP_US)]
        starts = np.flatnonzero(new_s)
        ends = np.append(starts[1:], n)
        s_start = ts[starts]
        cv = np.r_[0, np.cumsum((et == "view").astype(np.int64))]
        cb = np.r_[0, np.cumsum((et == "purchase").astype(np.int64))]
        has_both = ((cv[ends] - cv[starts]) > 0) & ((cb[ends] - cb[starts]) > 0)
        day = (s_start // 86_400_000_000) * 86_400_000_000
        t_out = pa.table(
            {
                "day": pa.array(day),
                "n_sessions": pa.array(np.ones(len(day), dtype=np.int64)),
                "n_converted": pa.array(has_both.astype(np.int64)),
            }
        )
        return (
            t_out.group_by("day")
            .aggregate([("n_sessions", "sum"), ("n_converted", "sum")])
            .rename_columns(["day", "n_sessions", "n_converted"])
        )

    agg = drop_empty_blocks(
        sorted_group_apply(ds, "user_id", ["ts"], kernel)
        .groupby("day")
        .aggregate(
            Sum("n_sessions", alias_name="n_sessions"),
            Sum("n_converted", alias_name="n_converted"),
        )
    )
    out = collect_arrow(agg)
    day_ts = pc.cast(pc.cast(out.column("day"), pa.int64()), pa.timestamp("us"))
    conv = pc.divide(
        pc.cast(out.column("n_converted"), pa.float64()),
        pc.cast(out.column("n_sessions"), pa.float64()),
    )
    res = pa.table(
        {
            "day": day_ts,
            "n_sessions": out.column("n_sessions"),
            "n_converted": out.column("n_converted"),
            "conversion": conv,
        }
    )
    return res.take(pc.sort_indices(res, sort_keys=[("day", "ascending")]))


def events_pattern_chain(sf_dir: str):
    """Sequence-pattern match (MATCH_RECOGNIZE's greedy first-match
    semantics): per user, the FIRST completed view → click → purchase
    chain — first view, then the first click strictly after it, then
    the first purchase strictly after that; users who never complete
    the chain are absent. r5: ONE global (user, ts) sort + an
    across-user kernel via util.sorted_group_apply — each chain step
    is a reduceat-min over candidate row indices gated by a per-row
    threshold broadcast from the previous step (the correlated min as
    segment arithmetic); no per-user Python dispatch, no joins. The
    SQL form needs three nested correlated mins."""
    from .util import sorted_group_apply

    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_type"], blocks=16)
    LO, HI = np.iinfo(np.int64).min, np.iinfo(np.int64).max

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "view_ts": pa.array([], pa.timestamp("us")),
                    "click_ts": pa.array([], pa.timestamp("us")),
                    "purchase_ts": pa.array([], pa.timestamp("us")),
                }
            )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()).to_numpy()
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        n = uid.size
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        runlens = np.diff(np.r_[starts, n])
        idx = np.arange(n, dtype=np.int64)

        def first_after(mask, thresh_per_group):
            """Per group: min row index with mask AND ts strictly above
            the group's threshold (HI threshold ⇒ no match)."""
            cand = np.where(
                mask & (ts > np.repeat(thresh_per_group, runlens)), idx, n
            )
            return np.minimum.reduceat(cand, starts)

        fv = first_after(et == "view", np.full(starts.size, LO))
        v_ts = np.where(fv < n, ts[np.minimum(fv, n - 1)], HI)
        fc = first_after(et == "click", v_ts)
        c_ts = np.where(fc < n, ts[np.minimum(fc, n - 1)], HI)
        fp = first_after(et == "purchase", c_ts)
        ok = fp < n
        return pa.table(
            {
                "user_id": pa.array(uid[starts][ok], pa.int64()),
                "view_ts": pa.array(v_ts[ok], pa.int64()).cast(pa.timestamp("us")),
                "click_ts": pa.array(c_ts[ok], pa.int64()).cast(pa.timestamp("us")),
                "purchase_ts": pa.array(
                    ts[np.minimum(fp, n - 1)][ok], pa.int64()
                ).cast(pa.timestamp("us")),
            }
        )

    return sorted_group_apply(ds, "user_id", ["ts"], kernel)


def orders_cohort_ltv(sf_dir: str):
    """Customer-cohort LTV triangle — revenue by (first-order month,
    months since first order): the lifetime-value matrix every
    subscription/commerce analyst maintains. Distributed shape: the
    first-touch min is a custkey-grain groupby(min) with block-local
    combine; it joins back to the order stream (fact×customer-grain
    hash join) and the month-pair groupby lands on cohort×age cells
    (tiny). Month arithmetic is integer (year·12+month), exact cents
    throughout."""
    from .util import collect_arrow, drop_empty_blocks

    nparts = _join_partitions()
    ds = _pq(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"], blocks=8)

    def scan(b: pa.Table) -> pa.Table:
        d = pc.cast(b.column("o_orderdate"), pa.timestamp("us"))
        mkey = pc.add(
            pc.multiply(pc.cast(pc.year(d), pa.int64()), 12),
            pc.cast(pc.subtract(pc.month(d), 1), pa.int64()),
        )
        return pa.table(
            {
                "_ck": b.column("o_custkey"),
                "mkey": mkey,
                "cents": _cents(b.column("o_totalprice")),
            }
        )

    fact = ds.map_batches(scan, batch_format="pyarrow").materialize()

    # first-touch is customer-grain — fold the ≤ blocks×customers
    # block partials driver-side and broadcast sorted (custkey, cohort)
    # arrays instead of a fact-sized hash join (the Q17 broadcast
    # seam); cell partials are (cohort × age)-tiny, folded at the edge
    fp = collect_arrow(
        fact.map_batches(
            lambda b: b.select(["_ck", "mkey"])
            .group_by("_ck")
            .aggregate([("mkey", "min")])
            .rename_columns(["_ck", "cohort"]),
            batch_format="pyarrow",
        )
    )
    fmin = (
        fp.group_by("_ck").aggregate([("cohort", "min")]).rename_columns(["_ck", "cohort"])
    )
    ck = fmin.column("_ck").to_numpy(zero_copy_only=False).astype(np.int64)
    co = fmin.column("cohort").to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(ck)
    first_ref = ray.put((ck[o], co[o]))

    def cells(b: pa.Table) -> pa.Table:
        kk, cc = ray.get(first_ref)
        cust = b.column("_ck").to_numpy(zero_copy_only=False).astype(np.int64)
        cohort = cc[np.searchsorted(kk, cust)]
        t = pa.table(
            {
                "cohort": pa.array(cohort),
                "age_months": pc.subtract(
                    b.column("mkey"), pa.array(cohort)
                ),
                "cents": b.column("cents"),
                "n_orders": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )
        return (
            t.group_by(["cohort", "age_months"])
            .aggregate([("cents", "sum"), ("n_orders", "sum")])
            .rename_columns(["cohort", "age_months", "cents", "n_orders"])
        )

    out = (
        collect_arrow(fact.map_batches(cells, batch_format="pyarrow"))
        .group_by(["cohort", "age_months"])
        .aggregate([("cents", "sum"), ("n_orders", "sum")])
        .rename_columns(["cohort", "age_months", "cents", "n_orders"])
    )
    y = pc.cast(pc.divide(out.column("cohort"), 12), pa.int64())
    m = pc.add(pc.subtract(out.column("cohort"), pc.multiply(y, 12)), 1)
    res = pa.table(
        {
            "cohort_year": y,
            "cohort_month": m,
            "age_months": out.column("age_months"),
            "n_orders": out.column("n_orders"),
            "revenue": pc.divide(pc.cast(out.column("cents"), pa.float64()), 100.0),
        }
    )
    return res.take(
        pc.sort_indices(
            res,
            sort_keys=[
                ("cohort_year", "ascending"),
                ("cohort_month", "ascending"),
                ("age_months", "ascending"),
            ],
        )
    )


def nation_trade_matrix(sf_dir: str):
    """TPC-H Q7-shaped bilateral trade matrix — revenue between every
    (supplier nation, customer nation) pair per ship year, full
    cross-nation matrix (n1 ≠ n2; Q7 additionally pins two nations —
    the synthetic nation keys carry no suppliers below sf0.01, so the
    matrix form keeps the query scale-independent). Distributed plan:
    the 25-row nation map broadcasts by closure; supplier and customer
    ship only (key → nationkey); lineitem joins supplier
    first (the smaller build side), pre-aggregates rev_cents by
    (orderkey, supp-nation, year) in-block, joins the
    orders⋈customer chain on orderkey, prunes the cross-pair
    (n1 ≠ n2) and finishes on a 2×years-cell groupby. Exact cents,
    the year from l_shipdate as in Q7."""
    from .util import collect_arrow, drop_empty_blocks

    nparts = _join_partitions()
    nat = collect_arrow(_pq(sf_dir, "nation", ["n_nationkey", "n_name"]))
    nat_names = dict(
        zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    )

    # Size-gated broadcast plan (the Q5 pattern): supplier and customer
    # resolve to (sorted key → nation) arrays, orders to a (sorted
    # orderkey → cust-nation) array, and the whole Q7 join collapses to
    # ONE streaming lineitem pass — two searchsorted lookups + an
    # in-block group_by on the ≤|nations|²×years cells. Above the gate
    # the three-exchange hash-join plan below runs unchanged.
    if _pq(sf_dir, "orders", ["o_orderkey"]).count() <= 2 * _BCAST_KEYS_GATE:
        sup_t = collect_arrow(_pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]))
        sk = sup_t.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        snat = sup_t.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        so = np.argsort(sk, kind="stable")
        sk, snat = sk[so], snat[so]

        cust_t = collect_arrow(_pq(sf_dir, "customer", ["c_custkey", "c_nationkey"]))
        ck = cust_t.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        cnat = cust_t.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        co = np.argsort(ck, kind="stable")
        ck, cnat = ck[co], cnat[co]

        ord_t = collect_arrow(_pq(sf_dir, "orders", ["o_orderkey", "o_custkey"], blocks=8))
        okeys = ord_t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ocust = ord_t.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        cm = _sorted_member_mask(ck, ocust)
        okeys = okeys[cm]
        onat = cnat[np.minimum(np.searchsorted(ck, ocust[cm]), max(ck.size - 1, 0))]
        oo = np.argsort(okeys, kind="stable")
        okeys, onat = okeys[oo], onat[oo]
        dim_ref = ray.put((sk, snat, okeys, onat))

        def li_pass(b: pa.Table) -> pa.Table:
            kk_s, nn_s, kk_o, nn_o = ray.get(dim_ref)
            d = pc.cast(b.column("l_shipdate"), pa.timestamp("us"))
            rev = pc.multiply(
                b.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), b.column("l_discount")),
            )
            cents = _cents(rev).to_numpy(zero_copy_only=False)
            year = pc.cast(pc.year(d), pa.int64()).to_numpy(zero_copy_only=False)
            lsk = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
            lok = b.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
            m = _sorted_member_mask(kk_s, lsk) & _sorted_member_mask(kk_o, lok)
            s_nat = nn_s[np.minimum(np.searchsorted(kk_s, lsk[m]), max(kk_s.size - 1, 0))]
            o_nat = nn_o[np.minimum(np.searchsorted(kk_o, lok[m]), max(kk_o.size - 1, 0))]
            cross = s_nat != o_nat
            return (
                pa.table(
                    {
                        "supp_nation": pa.array(s_nat[cross], pa.int64()),
                        "cust_nation": pa.array(o_nat[cross], pa.int64()),
                        "ship_year": pa.array(year[m][cross], pa.int64()),
                        "rev_cents": pa.array(cents[m][cross], pa.int64()),
                    }
                )
                .group_by(["supp_nation", "cust_nation", "ship_year"])
                .aggregate([("rev_cents", "sum")])
                .rename_columns(["supp_nation", "cust_nation", "ship_year", "rev_cents"])
            )

        parts = collect_arrow(
            _pq(
                sf_dir,
                "lineitem",
                ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
                blocks=16,
            ).map_batches(li_pass, batch_format="pyarrow"),
            schema=pa.schema(
                [
                    ("supp_nation", pa.int64()),
                    ("cust_nation", pa.int64()),
                    ("ship_year", pa.int64()),
                    ("rev_cents", pa.int64()),
                ]
            ),
        )
        out = (
            parts.group_by(["supp_nation", "cust_nation", "ship_year"])
            .aggregate([("rev_cents", "sum")])
            .rename_columns(["supp_nation", "cust_nation", "ship_year", "rev_cents"])
        )
        sn = pa.array(
            [nat_names[k] for k in out.column("supp_nation").to_pylist()], pa.string()
        )
        cn = pa.array(
            [nat_names[k] for k in out.column("cust_nation").to_pylist()], pa.string()
        )
        res = _cents_to_dollars(
            pa.table(
                {
                    "supp_nation": sn,
                    "cust_nation": cn,
                    "ship_year": out.column("ship_year"),
                    "rev_cents": out.column("rev_cents"),
                }
            ),
            "rev_cents",
            "revenue",
        )
        return res.take(
            pc.sort_indices(
                res,
                sort_keys=[
                    ("supp_nation", "ascending"),
                    ("cust_nation", "ascending"),
                    ("ship_year", "ascending"),
                ],
            )
        )

    def supp_scan(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_sk": b.column("s_suppkey"),
                "supp_nation": pc.cast(b.column("s_nationkey"), pa.int64()),
            }
        )

    supp = drop_empty_blocks(
        _pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"], blocks=2).map_batches(
            supp_scan, batch_format="pyarrow"
        )
    )

    def li_scan(b: pa.Table) -> pa.Table:
        d = pc.cast(b.column("l_shipdate"), pa.timestamp("us"))
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
        return pa.table(
            {
                "_ok": b.column("l_orderkey"),
                "_lsk": b.column("l_suppkey"),
                "ship_year": pc.cast(pc.year(d), pa.int64()),
                "rev_cents": _cents(rev),
            }
        )

    li = _pq(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        blocks=16,
    ).map_batches(li_scan, batch_format="pyarrow")
    j1 = li.join(supp, "inner", nparts, on=("_lsk",), right_on=("_sk",))

    def combine1(b: pa.Table) -> pa.Table:
        t = b.select(["_ok", "supp_nation", "ship_year", "rev_cents"])
        return (
            t.group_by(["_ok", "supp_nation", "ship_year"])
            .aggregate([("rev_cents", "sum")])
            .rename_columns(["_ok", "supp_nation", "ship_year", "rev_cents"])
        )

    j1c = drop_empty_blocks(j1.map_batches(combine1, batch_format="pyarrow"))

    def cust_scan(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_ck": b.column("c_custkey"),
                "cust_nation": pc.cast(b.column("c_nationkey"), pa.int64()),
            }
        )

    cust = drop_empty_blocks(
        _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"], blocks=4).map_batches(
            cust_scan, batch_format="pyarrow"
        )
    )
    ords = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey"], blocks=8).map_batches(
        lambda b: pa.table(
            {"o_orderkey": b.column("o_orderkey"), "_ck2": b.column("o_custkey")}
        ),
        batch_format="pyarrow",
    )
    oc = drop_empty_blocks(
        ords.join(cust, "inner", nparts, on=("_ck2",), right_on=("_ck",))
    )
    j2 = j1c.join(oc, "inner", nparts, on=("_ok",), right_on=("o_orderkey",))

    def finishcells(b: pa.Table) -> pa.Table:
        t = b.filter(
            pc.not_equal(b.column("supp_nation"), b.column("cust_nation"))
        ).select(["supp_nation", "cust_nation", "ship_year", "rev_cents"])
        return (
            t.group_by(["supp_nation", "cust_nation", "ship_year"])
            .aggregate([("rev_cents", "sum")])
            .rename_columns(["supp_nation", "cust_nation", "ship_year", "rev_cents"])
        )

    out = collect_arrow(
        drop_empty_blocks(
            j2.map_batches(finishcells, batch_format="pyarrow")
            .groupby(["supp_nation", "cust_nation", "ship_year"])
            .aggregate(Sum("rev_cents", alias_name="rev_cents"))
        )
    )
    sn = pa.array(
        [nat_names[k] for k in out.column("supp_nation").to_pylist()], pa.string()
    )
    cn = pa.array(
        [nat_names[k] for k in out.column("cust_nation").to_pylist()], pa.string()
    )
    res = _cents_to_dollars(
        pa.table(
            {
                "supp_nation": sn,
                "cust_nation": cn,
                "ship_year": out.column("ship_year"),
                "rev_cents": out.column("rev_cents"),
            }
        ),
        "rev_cents",
        "revenue",
    )
    return res.take(
        pc.sort_indices(
            res,
            sort_keys=[
                ("supp_nation", "ascending"),
                ("cust_nation", "ascending"),
                ("ship_year", "ascending"),
            ],
        )
    )


def corpus_embed_knn(sf_dir: str, k: int = 3, ivf_gate: int | None = None):
    """END-TO-END multimodal retrieval: decode → feature-extract →
    cosine kNN, the decode→embed→ANN chain a contrastive-training or
    near-dup curation pipeline runs over an image corpus. Stage 1 is
    the `ImageFeatureVectors` actor pool (pixels never leave the
    stage; a real vision encoder drops into the same signature).
    Stage 2, below ``_ALLKNN_IVF_GATE`` images, broadcasts the
    corpus-sized feature matrix (`ray.put` once) and each block
    computes its rows' top-k neighbors with one matmul — the
    embeddings_knn brute pattern; ABOVE the gate the matrix never
    collects: image ids map to dense ints against the sorted id
    column (id-grain, the same grain this query's output already
    collects) and the scan routes through the cell-partitioned
    `stages/similarity.knn_all_ivf` (exact multi-probe default,
    self dropped by id from a top-(k+1) fetch — equality-tested
    against the broadcast path). Ties break by neighbor id.
    Rows-only (pixel decode isn't SQL); pinned to a driver-side
    numpy replay in tests."""
    from .stages.multimodal import FEATURE_DIM, ImageFeatureVectors
    from .util import collect_arrow

    gate = _ALLKNN_IVF_GATE if ivf_gate is None else ivf_gate
    ds = corpus_parquet(columns=["image_id", "bytes", "fmt"])
    feats = ds.map_batches(
        ImageFeatureVectors,
        concurrency=_safe_workers(2),
        batch_size=64,
        batch_format="pyarrow",
    ).materialize()

    if feats.count() > gate:
        from .stages.similarity import knn_all_ivf

        id_t = collect_arrow(
            feats.map_batches(
                lambda b: b.select(["image_id"]), batch_format="pyarrow"
            )
        )
        ids_sorted = np.sort(
            np.asarray(id_t.column("image_id").to_pylist(), dtype=object)
        )
        ids_ref = ray.put(ids_sorted)

        def to_int_ids(b: pa.Table) -> pa.Table:
            lut = ray.get(ids_ref)
            bid = np.asarray(b.column("image_id").to_pylist(), dtype=object)
            return pa.table(
                {
                    "vec_id": pa.array(
                        np.searchsorted(lut, bid).astype(np.int64), pa.int64()
                    ),
                    "feat": b.column("feat"),
                }
            )

        out = knn_all_ivf(
            feats.map_batches(to_int_ids, batch_format="pyarrow"),
            "feat",
            "vec_id",
            k=k + 1,
            return_sim=True,
        )
        q = out.column("query_id").to_numpy(zero_copy_only=False)
        nbr = out.column("neighbor_id").to_numpy(zero_copy_only=False)
        sim = out.column("sim").to_numpy(zero_copy_only=False)
        keep = q != nbr  # drop self (rank order otherwise preserved)
        q, nbr, sim = q[keep], nbr[keep], sim[keep]
        # re-rank within each query after self-removal, cut to k
        bounds = np.flatnonzero(np.diff(q)) + 1
        starts = np.r_[0, bounds]
        idx = np.arange(len(q))
        rnk = idx - starts[np.searchsorted(bounds, idx, side="right")] + 1
        cut = rnk <= k
        q, nbr, sim, rnk = q[cut], nbr[cut], sim[cut], rnk[cut]
        res = pa.table(
            {
                "image_id": pa.array(ids_sorted[q], pa.string()),
                "neighbor_id": pa.array(ids_sorted[nbr], pa.string()),
                "rank": pa.array(rnk, pa.int64()),
                "cosine": pa.array(sim, pa.float64()),
            }
        )
        return res.take(
            pc.sort_indices(
                res, sort_keys=[("image_id", "ascending"), ("rank", "ascending")]
            )
        )

    ft = collect_arrow(feats)
    ids_all = np.asarray(ft.column("image_id").to_pylist(), dtype=object)
    M = np.asarray(ft.column("feat").to_pylist(), dtype=np.float64)
    order = np.argsort(ids_all)
    ids_all, M = ids_all[order], M[order]
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0.0] = 1.0
    Mn = M / norms[:, None]
    mat_ref = ray.put((ids_all, Mn))

    def topk(b: pa.Table) -> pa.Table:
        ids_b, base = ray.get(mat_ref)
        bid = np.asarray(b.column("image_id").to_pylist(), dtype=object)
        X = np.asarray(b.column("feat").to_pylist(), dtype=np.float64)
        nx = np.linalg.norm(X, axis=1)
        nx[nx == 0.0] = 1.0
        sims = (X / nx[:, None]) @ base.T
        qpos = np.searchsorted(ids_b, bid)
        sims[np.arange(len(bid)), qpos] = -np.inf  # exclude self
        out_q, out_n, out_r, out_s = [], [], [], []
        for i in range(len(bid)):
            row = sims[i]
            cand = np.argsort(-row, kind="stable")[:k]  # stable ⇒ id tiebreak
            for rank, j in enumerate(cand, start=1):
                out_q.append(bid[i])
                out_n.append(ids_b[j])
                out_r.append(rank)
                out_s.append(float(row[j]))
        return pa.table(
            {
                "image_id": pa.array(out_q, pa.string()),
                "neighbor_id": pa.array(out_n, pa.string()),
                "rank": pa.array(out_r, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    out = collect_arrow(feats.map_batches(topk, batch_format="pyarrow"))
    return out.take(
        pc.sort_indices(
            out, sort_keys=[("image_id", "ascending"), ("rank", "ascending")]
        )
    )


_ATTR_WINDOW_US = 7 * 86_400_000_000


def events_linear_attribution(sf_dir: str):
    """Multi-touch LINEAR ATTRIBUTION, integer-exact — each purchase's
    value (cents) splits across the user's view/click touches in the
    preceding 7 days; with no touches the credit goes to 'direct'.
    Exactness is the point: credit_i = cents//n + (rank_i ≤ cents%n) —
    the remainder goes to the EARLIEST touches, so the per-channel
    sums are integers and hash-stable (a float 1/n split would
    accumulate in block order). r5: ONE global (user, ts, event_id)
    sort + an across-user kernel via util.sorted_group_apply — every
    user's touch timestamps are rebased to the user's first event and
    lifted into disjoint bands (run index × (span + window + 2)), so
    a SINGLE searchsorted pair over the block's whole touch array
    resolves every purchase's window (a purchase whose user has no
    touches lands between bands, n = 0 → 'direct'); np.repeat
    fan-out, vectorized remainder assignment, bincount channel
    pre-sum — the remaining exchange is channel-sized."""
    from .util import sorted_group_apply

    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id", "event_type", "value"], blocks=16)

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "channel": pa.array([], pa.string()),
                "cents": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()).to_numpy()
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        cents_all = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        m = uid.size
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        runlens = np.diff(np.r_[starts, m])
        rel = ts - np.repeat(ts[starts], runlens)
        gi = np.repeat(np.arange(starts.size, dtype=np.int64), runlens)
        span = int(rel.max())
        shift = span + _ATTR_WINDOW_US + 2
        touch = (et == "view") | (et == "click")
        buy = et == "purchase"
        t_et = et[touch]
        b_cents = cents_all[buy]
        if starts.size * shift < 2**62:
            lifted = rel + gi * shift
            t_l = lifted[touch]
            b_l = lifted[buy]
            lo = np.searchsorted(t_l, b_l - _ATTR_WINDOW_US, side="left")
            hi = np.searchsorted(t_l, b_l, side="left")  # strictly before
        else:  # unreachable for µs spans; exact per-run fallback
            t_user, b_user = uid[touch], uid[buy]
            t_ts_a, b_ts_a = ts[touch], ts[buy]
            lo = np.empty(b_user.size, np.int64)
            hi = np.empty(b_user.size, np.int64)
            t_runs = np.searchsorted(t_user, uid[starts], side="left")
            t_ends = np.searchsorted(t_user, uid[starts], side="right")
            for k in range(starts.size):
                s0, e0 = t_runs[k], t_ends[k]
                bm = b_user == uid[starts[k]]
                lo[bm] = s0 + np.searchsorted(
                    t_ts_a[s0:e0], b_ts_a[bm] - _ATTR_WINDOW_US, "left"
                )
                hi[bm] = s0 + np.searchsorted(t_ts_a[s0:e0], b_ts_a[bm], "left")
        n = hi - lo
        out: dict[str, int] = {}
        none = n == 0
        if none.any():
            out["direct"] = int(b_cents[none].sum())
        sel = ~none
        if sel.any():
            nn, ll = n[sel], lo[sel]
            cc = b_cents[sel]
            total = int(nn.sum())
            base = np.repeat(ll, nn)
            within = np.arange(total, dtype=np.int64) - np.repeat(
                np.cumsum(nn) - nn, nn
            )
            pos = base + within
            per = np.repeat(cc // nn, nn)
            rem = np.repeat(cc % nn, nn)
            credit = per + (within < rem)
            chu, chi = np.unique(t_et[pos], return_inverse=True)
            sums = np.zeros(chu.size, np.int64)
            np.add.at(sums, chi, credit)  # exact int64 channel pre-sum
            for c, s in zip(chu, sums):
                out[str(c)] = out.get(str(c), 0) + int(s)
        if not out:
            return empty
        return pa.table(
            {
                "channel": pa.array(list(out.keys()), pa.string()),
                "cents": pa.array(list(out.values()), pa.int64()),
            }
        )

    agg = (
        sorted_group_apply(ds, "user_id", ["ts", "event_id"], kernel)
        .groupby("channel")
        .aggregate(Sum("cents", alias_name="cents"))
    )
    from .util import collect_arrow, drop_empty_blocks

    out = collect_arrow(drop_empty_blocks(agg))
    # integer cents and the one mirrored ÷100, names matched in SQL
    res = pa.table(
        {
            "channel": out.column("channel"),
            "attributed_cents": out.column("cents"),
            "attributed": pc.divide(pc.cast(out.column("cents"), pa.float64()), 100.0),
        }
    )
    return res.take(pc.sort_indices(res, sort_keys=[("channel", "ascending")]))


def events_hourly_ohlc(sf_dir: str):
    """Timeseries OHLC downsample — per (user, hour): the first event's
    value (open), max (high), min (low), last (close), and the event
    count — the classic resample a metrics store runs before plotting.
    First/last are argmin/argmax by (ts, event_id) so ties are pinned.
    r5: ONE global (user, ts, event_id) sort + an across-user kernel
    via util.sorted_group_apply — an OHLC bucket breaks at a user
    change OR an hour change, so slice endpoints and H/L reduceat fold
    every (user, hour) of the block at once; no per-user Python
    dispatch, output is (user × active hours)-sized. Exact int64
    cents; the mirrored ÷100 at the edge."""
    from .util import sorted_group_apply

    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id", "value"], blocks=16)
    HOUR_US = 3_600_000_000

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "hour": pa.array([], pa.timestamp("us")),
                    "open": pa.array([], pa.int64()),
                    "high": pa.array([], pa.int64()),
                    "low": pa.array([], pa.int64()),
                    "close": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()).to_numpy()
        cents = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        hour = (ts // HOUR_US) * HOUR_US
        brk = np.r_[True, (uid[1:] != uid[:-1]) | (hour[1:] != hour[:-1])]
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], uid.size)
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "hour": pa.array(hour[starts], pa.int64()).cast(pa.timestamp("us")),
                "open": pa.array(cents[starts]),
                "high": pa.array(np.maximum.reduceat(cents, starts)),
                "low": pa.array(np.minimum.reduceat(cents, starts)),
                "close": pa.array(cents[ends - 1]),
                "n_events": pa.array((ends - starts).astype(np.int64)),
            }
        )

    out = sorted_group_apply(ds, "user_id", ["ts", "event_id"], kernel)

    def dollars(b: pa.Table) -> pa.Table:
        cols = {"user_id": b.column("user_id"), "hour": b.column("hour")}
        for c in ("open", "high", "low", "close"):
            cols[c] = pc.divide(pc.cast(b.column(c), pa.float64()), 100.0)
        cols["n_events"] = b.column("n_events")
        return pa.table(cols)

    return out.map_batches(dollars, batch_format="pyarrow")


def top_window_supplier(sf_dir: str):
    """TPC-H Q15-shaped scalar-max semi-join over an aggregate: revenue
    per supplier within one ship-date quarter, keeping every supplier
    whose revenue EQUALS the global max (ties survive — Q15's
    revenue-view + scalar-subquery semantics). Distributed plan: the
    quarter filter and per-supplier cents partials fold inside each
    block, one supplier-grain merge on the driver (the aggregate is
    dimension-sized), max + equality filter are driver scalars, names
    annotate from the supplier dimension (reference parity: the
    reference has no relational layer; this extends its report
    aggregates per SURVEY §2.4)."""
    from .util import collect_arrow

    lo = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1996-04-01", "us"), pa.timestamp("us"))

    def rev_partial(b: pa.Table) -> pa.Table:
        d = pc.cast(b.column("l_shipdate"), pa.timestamp("us"))
        t = b.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        rev = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        t2 = pa.table({"s_suppkey": t.column("l_suppkey"), "rev_cents": _cents(rev)})
        return (
            t2.group_by("s_suppkey").aggregate([("rev_cents", "sum")])
            .rename_columns(["s_suppkey", "rev_cents"])
        )

    li = _pq(
        sf_dir, "lineitem",
        ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"], blocks=16,
    )
    parts = collect_arrow(
        li.map_batches(rev_partial, batch_format="pyarrow"),
        schema=pa.schema([("s_suppkey", pa.int64()), ("rev_cents", pa.int64())]),
    )
    merged = (
        parts.group_by("s_suppkey").aggregate([("rev_cents", "sum")])
        .rename_columns(["s_suppkey", "rev_cents"])
    )
    if merged.num_rows == 0:
        return pa.table(
            {
                "s_suppkey": pa.array([], pa.int64()),
                "s_name": pa.array([], pa.string()),
                "total_revenue": pa.array([], pa.float64()),
            }
        )
    mx = pc.max(merged.column("rev_cents"))
    best = merged.filter(pc.equal(merged.column("rev_cents"), mx))
    names = {
        r["s_suppkey"]: r["s_name"]
        for r in _pq(sf_dir, "supplier", ["s_suppkey", "s_name"]).take_all()
    }
    out = pa.table(
        {
            "s_suppkey": best.column("s_suppkey"),
            "s_name": pa.array(
                [names[k] for k in best.column("s_suppkey").to_pylist()], pa.string()
            ),
            "total_revenue": pc.divide(
                pc.cast(best.column("rev_cents"), pa.float64()), 100.0
            ),
        }
    )
    return out.sort_by("s_suppkey")


def part_supplier_census(sf_dir: str):
    """TPC-H Q16-shaped supplier census: COUNT(DISTINCT supplier) per
    (p_brand, p_type, p_size), suppliers with negative account balance
    excluded (Q16's complaints NOT IN). Distributed plan: blocks emit
    DISTINCT (partkey, suppkey) pairs with the bad-supplier set already
    filtered (broadcast sorted array — complaint sets are tiny by
    construction), ONE pair-keyed groupby makes the pairs globally
    distinct, part attributes arrive via a distributed hash join (part
    scales with SF in TPC-H, so no dimension broadcast here), a second
    block-local + grouped distinct over (brand, type, size, suppkey)
    collapses same-attribute multi-part duplicates, and the final count
    per attribute triple folds as block partials + a driver merge
    (≤ |brand|·|type|·|size| rows)."""
    from .util import collect_arrow, drop_empty_blocks

    sup = collect_arrow(_pq(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]))
    bad = np.sort(
        sup.filter(pc.less(sup.column("s_acctbal"), 0.0))
        .column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    )
    bad_ref = ray.put(bad)

    def pair_partial(b: pa.Table) -> pa.Table:
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ~np.isin(sk, ray.get(bad_ref))
        t = pa.table(
            {"_pk": b.column("l_partkey").filter(pa.array(keep)),
             "suppkey": b.column("l_suppkey").filter(pa.array(keep))}
        )
        return (
            t.group_by(["_pk", "suppkey"]).aggregate([([], "count_all")])
            .select(["_pk", "suppkey"])
        )

    pairs_partial = _pq(
        sf_dir, "lineitem", ["l_partkey", "l_suppkey"], blocks=16
    ).map_batches(pair_partial, batch_format="pyarrow")

    # Size-gated dense path: block-local distinct pairs are bounded by
    # |part|·|suppliers-per-part|; when the partial set is driver-sized
    # the three exchanges (pair dedup, part join, quad dedup) cost ~3×
    # the hash-shuffle fixed overhead for no gain — fold with pyarrow
    # group_by + searchsorted attr annotation instead. Above the gate
    # the distributed plan runs unchanged (the 100 TB shape).
    if pairs_partial.count() <= 5_000_000:
        t = collect_arrow(
            pairs_partial,
            schema=pa.schema([("_pk", pa.int64()), ("suppkey", pa.int64())]),
        )
        t = (
            t.group_by(["_pk", "suppkey"]).aggregate([([], "count_all")])
            .select(["_pk", "suppkey"])
        )
        part = collect_arrow(
            _pq(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"])
        )
        order = pc.sort_indices(part.column("p_partkey"))
        part = part.take(order)
        pk_sorted = part.column("p_partkey").to_numpy(zero_copy_only=False)
        probe = t.column("_pk").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(pk_sorted, probe)
        # inner-join semantics: drop pairs whose partkey has no part row
        idx_c = np.minimum(idx, max(len(pk_sorted) - 1, 0))
        hit = (len(pk_sorted) > 0) & (idx < len(pk_sorted)) & (pk_sorted[idx_c] == probe)
        t = t.filter(pa.array(hit))
        idx = idx_c[hit]
        quads = pa.table(
            {
                "p_brand": part.column("p_brand").take(pa.array(idx)),
                "p_type": part.column("p_type").take(pa.array(idx)),
                "p_size": pc.cast(
                    part.column("p_size").take(pa.array(idx)), pa.int64()
                ),
                "suppkey": t.column("suppkey"),
            }
        )
        quads = (
            quads.group_by(["p_brand", "p_type", "p_size", "suppkey"])
            .aggregate([([], "count_all")])
            .select(["p_brand", "p_type", "p_size", "suppkey"])
        )
        return (
            quads.group_by(["p_brand", "p_type", "p_size"])
            .aggregate([([], "count_all")])
            .rename_columns(["p_brand", "p_type", "p_size", "supplier_cnt"])
        )

    pairs = _sorted_agg_by_key(
        pairs_partial, ["_pk", "suppkey"], [(None, "count", "_n")]
    ).drop_columns(["_n"])
    part = _pq(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"])
    joined = drop_empty_blocks(pairs).join(
        part, "inner", _join_partitions(), on=("_pk",), right_on=("p_partkey",)
    )

    def quad_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "p_brand": b.column("p_brand"),
                "p_type": b.column("p_type"),
                "p_size": pc.cast(b.column("p_size"), pa.int64()),
                "suppkey": b.column("suppkey"),
            }
        )
        return (
            t.group_by(["p_brand", "p_type", "p_size", "suppkey"])
            .aggregate([([], "count_all")])
            .select(["p_brand", "p_type", "p_size", "suppkey"])
        )

    quads = _sorted_agg_by_key(
        joined.map_batches(quad_partial, batch_format="pyarrow"),
        ["p_brand", "p_type", "p_size", "suppkey"],
        [(None, "count", "_n")],
    )

    def count_partial(b: pa.Table) -> pa.Table:
        return (
            b.select(["p_brand", "p_type", "p_size"])
            .group_by(["p_brand", "p_type", "p_size"])
            .aggregate([([], "count_all")])
            .rename_columns(["p_brand", "p_type", "p_size", "supplier_cnt"])
        )

    parts = collect_arrow(
        quads.map_batches(count_partial, batch_format="pyarrow"),
        schema=pa.schema(
            [("p_brand", pa.string()), ("p_type", pa.string()),
             ("p_size", pa.int64()), ("supplier_cnt", pa.int64())]
        ),
    )
    return (
        parts.group_by(["p_brand", "p_type", "p_size"])
        .aggregate([("supplier_cnt", "sum")])
        .rename_columns(["p_brand", "p_type", "p_size", "supplier_cnt"])
    )


def region_best_supplier(sf_dir: str, dense_row_limit: int = 5_000_000):
    """TPC-H Q2-shaped correlated max: for every part, the ASIA-region
    supplier(s) with the highest account balance among the suppliers
    that shipped it (ties survive — the correlated scalar-subquery
    keeps every row equal to the per-part max). Distributed plan: the
    eligible-supplier attributes broadcast once (region⋈nation⋈supplier
    is dimension-sized; sorted arrays probed with searchsorted), blocks
    emit distinct (partkey, suppkey, bal_cents) candidate rows, and the
    per-part max-with-ties folds across ALL parts at once on a
    (part, bal DESC) sort via util.sorted_group_apply (r5 — no
    per-part Python dispatch); names annotate from the same
    broadcast."""
    from .util import collect_arrow

    nat = collect_arrow(_pq(sf_dir, "nation", ["n_nationkey", "n_regionkey"]))
    reg = collect_arrow(_pq(sf_dir, "region", ["r_regionkey", "r_name"]))
    asia_rk = {
        k for k, n in zip(
            reg.column("r_regionkey").to_pylist(), reg.column("r_name").to_pylist()
        ) if n == "ASIA"
    }
    asia_nk = {
        k for k, rk in zip(
            nat.column("n_nationkey").to_pylist(), nat.column("n_regionkey").to_pylist()
        ) if rk in asia_rk
    }
    sup = collect_arrow(
        _pq(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])
    )
    keep = pa.array([k in asia_nk for k in sup.column("s_nationkey").to_pylist()])
    sup = sup.filter(keep)
    order = pc.sort_indices(sup.column("s_suppkey"))
    sup = sup.take(order)
    lut_ref = ray.put(
        {
            "sk": sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64),
            "bal": _cents(sup.column("s_acctbal")).to_numpy(zero_copy_only=False),
            "name": np.asarray(sup.column("s_name").to_pylist(), dtype=object),
        }
    )

    def candidates(b: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(lut["sk"], sk)
        idx_c = np.minimum(idx, max(len(lut["sk"]) - 1, 0))
        ok = (len(lut["sk"]) > 0) & (idx < len(lut["sk"])) & (lut["sk"][idx_c] == sk)
        t = pa.table(
            {
                "p_partkey": b.column("l_partkey").filter(pa.array(ok)),
                "s_suppkey": pa.array(sk[ok]),
                "bal_cents": pa.array(lut["bal"][idx_c[ok]]),
            }
        )
        return (
            t.group_by(["p_partkey", "s_suppkey", "bal_cents"])
            .aggregate([([], "count_all")])
            .select(["p_partkey", "s_suppkey", "bal_cents"])
        )

    def keep_max_all(t: pa.Table) -> pa.Table:
        """r5 across-part form (sorted (part, bal DESC, suppkey)): a
        run's first row carries its max; keep ties, drop duplicate
        (part, suppkey) rows from different source blocks."""
        if t.num_rows == 0:
            return pa.table(
                {
                    "p_partkey": pa.array([], pa.int64()),
                    "s_suppkey": pa.array([], pa.int64()),
                    "bal_cents": pa.array([], pa.int64()),
                }
            )
        pk = t.column("p_partkey").to_numpy(zero_copy_only=False)
        sk = t.column("s_suppkey").to_numpy(zero_copy_only=False)
        bal = t.column("bal_cents").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]])
        runlens = np.diff(np.r_[starts, pk.size])
        mx = np.repeat(bal[starts], runlens)
        uniq = np.r_[True, (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])]
        keep = (bal == mx) & uniq
        return pa.table(
            {
                "p_partkey": pa.array(pk[keep], pa.int64()),
                "s_suppkey": pa.array(sk[keep], pa.int64()),
                "bal_cents": pa.array(bal[keep], pa.int64()),
            }
        )

    cand = _pq(sf_dir, "lineitem", ["l_partkey", "l_suppkey"], blocks=16).map_batches(
        candidates, batch_format="pyarrow"
    )

    # Size-gated dense path: the candidate partials are bounded by the
    # distinct (part, eligible-supplier) pairs; when driver-sized, one
    # pyarrow group_by-max + equality filter replaces the exchange.
    if cand.count() <= dense_row_limit:
        t = collect_arrow(
            cand,
            schema=pa.schema(
                [("p_partkey", pa.int64()), ("s_suppkey", pa.int64()),
                 ("bal_cents", pa.int64())]
            ),
        )
        t = (
            t.group_by(["p_partkey", "s_suppkey", "bal_cents"])
            .aggregate([([], "count_all")])
            .select(["p_partkey", "s_suppkey", "bal_cents"])
        )
        grp = (
            t.group_by("p_partkey").aggregate([("bal_cents", "max")])
            .rename_columns(["p_partkey", "bal_max"])
        )
        gsort = pc.sort_indices(grp.column("p_partkey"))
        grp = grp.take(gsort)
        gk = grp.column("p_partkey").to_numpy(zero_copy_only=False)
        gmax = grp.column("bal_max").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(gk, t.column("p_partkey").to_numpy(zero_copy_only=False))
        best_t = t.filter(
            pa.array(t.column("bal_cents").to_numpy(zero_copy_only=False) == gmax[idx])
        )
        lut = ray.get(lut_ref)
        sidx = np.searchsorted(
            lut["sk"], best_t.column("s_suppkey").to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "p_partkey": best_t.column("p_partkey"),
                "s_suppkey": best_t.column("s_suppkey"),
                "s_name": pa.array(list(lut["name"][sidx]), pa.string()),
                "s_acctbal": pc.divide(
                    pc.cast(best_t.column("bal_cents"), pa.float64()), 100.0
                ),
            }
        )

    from .util import sorted_group_apply

    best = sorted_group_apply(
        cand,
        "p_partkey",
        ["bal_cents", "s_suppkey"],
        keep_max_all,
        descending=[True, False],
    )

    def finish(b: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        sk = b.column("s_suppkey").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(lut["sk"], sk)
        return pa.table(
            {
                "p_partkey": b.column("p_partkey"),
                "s_suppkey": b.column("s_suppkey"),
                "s_name": pa.array(list(lut["name"][idx]), pa.string()),
                "s_acctbal": pc.divide(
                    pc.cast(b.column("bal_cents"), pa.float64()), 100.0
                ),
            }
        )

    return best.map_batches(finish, batch_format="pyarrow")


def nation_market_share(sf_dir: str):
    """TPC-H Q8-shaped market share: of all ECONOMY-part revenue sold
    into AMERICA-region customers' orders during 1996–1997, the
    fraction supplied by NATION_3, per order year. Distributed plan:
    the ECONOMY partkey set and the NATION_3 suppkey set broadcast as
    sorted arrays (part-type and nation slices are small; the fact scan
    turns both gates into vectorized membership probes), blocks
    pre-aggregate (orderkey → total cents, nation cents) so the join
    exchange ships order-grain partials, the AMERICA/1996–97 order side
    reduces to (orderkey, year) before the hash join, and the final
    year-grain share is two exact int64 sums + one float division
    (mirrored in SQL)."""
    from .util import collect_arrow, drop_empty_blocks

    part = collect_arrow(_pq(sf_dir, "part", ["p_partkey", "p_type"]))
    pkeys = np.sort(
        part.filter(pc.equal(part.column("p_type"), "ECONOMY"))
        .column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    )
    nat = collect_arrow(_pq(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]))
    reg = collect_arrow(_pq(sf_dir, "region", ["r_regionkey", "r_name"]))
    nat3 = {
        k for k, n in zip(
            nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist()
        ) if n == "NATION_3"
    }
    am_rk = {
        k for k, n in zip(
            reg.column("r_regionkey").to_pylist(), reg.column("r_name").to_pylist()
        ) if n == "AMERICA"
    }
    am_nk = {
        k for k, rk in zip(
            nat.column("n_nationkey").to_pylist(), nat.column("n_regionkey").to_pylist()
        ) if rk in am_rk
    }
    sup = collect_arrow(_pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]))
    skeys = np.sort(
        np.asarray(
            [
                k for k, nk in zip(
                    sup.column("s_suppkey").to_pylist(),
                    sup.column("s_nationkey").to_pylist(),
                ) if nk in nat3
            ],
            dtype=np.int64,
        )
    )
    cust = collect_arrow(_pq(sf_dir, "customer", ["c_custkey", "c_nationkey"]))
    ckeys = np.sort(
        np.asarray(
            [
                k for k, nk in zip(
                    cust.column("c_custkey").to_pylist(),
                    cust.column("c_nationkey").to_pylist(),
                ) if nk in am_nk
            ],
            dtype=np.int64,
        )
    )
    pk_ref, sk_ref, ck_ref = ray.put(pkeys), ray.put(skeys), ray.put(ckeys)
    lo = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1998-01-01", "us"), pa.timestamp("us"))

    def li_partial(b: pa.Table) -> pa.Table:
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        t = b.filter(pa.array(np.isin(pk, ray.get(pk_ref))))
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        rev = _cents(
            pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            )
        ).to_numpy(zero_copy_only=False)
        flag = np.isin(sk, ray.get(sk_ref)).astype(np.int64)
        t2 = pa.table(
            {
                "_ok": t.column("l_orderkey"),
                "total_cents": pa.array(rev),
                "nation_cents": pa.array(rev * flag),
            }
        )
        return (
            t2.group_by("_ok")
            .aggregate([("total_cents", "sum"), ("nation_cents", "sum")])
            .rename_columns(["_ok", "total_cents", "nation_cents"])
        )

    li = drop_empty_blocks(
        _pq(
            sf_dir, "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
            blocks=16,
        ).map_batches(li_partial, batch_format="pyarrow")
    )

    def ord_scan(b: pa.Table) -> pa.Table:
        d = pc.cast(b.column("o_orderdate"), pa.timestamp("us"))
        t = b.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.filter(pa.array(np.isin(ck, ray.get(ck_ref))))
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_year": pc.cast(
                    pc.year(pc.cast(t.column("o_orderdate"), pa.timestamp("us"))),
                    pa.int64(),
                ),
            }
        )

    ords = drop_empty_blocks(
        _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"], blocks=8)
        .map_batches(ord_scan, batch_format="pyarrow")
    )

    # Size-gated dense path: both join sides are already filtered to
    # (order-grain partials) × (qualifying orders) — when driver-sized,
    # one searchsorted probe replaces the hash-join exchange. The
    # distributed join below is the 100 TB shape.
    n_small = li.count() + ords.count()
    if n_small <= 5_000_000:
        lt = collect_arrow(
            li,
            schema=pa.schema(
                [("_ok", pa.int64()), ("total_cents", pa.int64()),
                 ("nation_cents", pa.int64())]
            ),
        )
        ot = collect_arrow(
            ords,
            schema=pa.schema([("o_orderkey", pa.int64()), ("o_year", pa.int64())]),
        )
        osort = pc.sort_indices(ot.column("o_orderkey"))
        ot = ot.take(osort)
        ok_sorted = ot.column("o_orderkey").to_numpy(zero_copy_only=False)
        probe = lt.column("_ok").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(ok_sorted, probe)
        idx_c = np.minimum(idx, max(len(ok_sorted) - 1, 0))
        hit = (len(ok_sorted) > 0) & (idx < len(ok_sorted)) & (ok_sorted[idx_c] == probe)
        lt = lt.filter(pa.array(hit))
        years = ot.column("o_year").take(pa.array(idx_c[hit]))
        merged = (
            pa.table(
                {
                    "o_year": years,
                    "nation_cents": lt.column("nation_cents"),
                    "total_cents": lt.column("total_cents"),
                }
            )
            .group_by("o_year")
            .aggregate([("nation_cents", "sum"), ("total_cents", "sum")])
            .rename_columns(["o_year", "nation_cents", "total_cents"])
        )
    else:
        joined = li.join(
            ords, "inner", _join_partitions(), on=("_ok",), right_on=("o_orderkey",)
        )

        def year_partial(b: pa.Table) -> pa.Table:
            return (
                b.select(["o_year", "nation_cents", "total_cents"])
                .group_by("o_year")
                .aggregate([("nation_cents", "sum"), ("total_cents", "sum")])
                .rename_columns(["o_year", "nation_cents", "total_cents"])
            )

        parts = collect_arrow(
            joined.map_batches(year_partial, batch_format="pyarrow"),
            schema=pa.schema(
                [("o_year", pa.int64()), ("nation_cents", pa.int64()),
                 ("total_cents", pa.int64())]
            ),
        )
        merged = (
            parts.group_by("o_year")
            .aggregate([("nation_cents", "sum"), ("total_cents", "sum")])
            .rename_columns(["o_year", "nation_cents", "total_cents"])
        )
    return pa.table(
        {
            "o_year": merged.column("o_year"),
            "nation_cents": merged.column("nation_cents"),
            "total_cents": merged.column("total_cents"),
            "mkt_share": pc.divide(
                pc.cast(merged.column("nation_cents"), pa.float64()),
                pc.cast(merged.column("total_cents"), pa.float64()),
            ),
        }
    )


def corpus_grayworld_gains(sf_dir: str):
    """Per-image gray-world white-balance gains (color-constancy
    correction before embedding/training) — decode actor pool emits
    (image_id, n_px, gain_r/g/b) from exact int64 channel sums with
    ONE float division per channel (`stages/multimodal.GrayWorldGains`
    documents the op order), so the output is bit-reproducible under
    any block layout. Rows-only (an oracle would need SQL pixel
    decode); pinned to a whole-corpus numpy reference in tests."""
    from .stages.multimodal import GrayWorldGains

    ds = corpus_parquet(columns=["image_id", "bytes", "fmt"])
    return ds.map_batches(
        GrayWorldGains,
        concurrency=_safe_workers(2),
        batch_size=64,
        batch_format="pyarrow",
    )


def corpus_tile_phash_dups(sf_dir: str, bucket_cap: int = 2000):
    """PARTIAL-duplicate image pairs by quadrant perceptual hashing —
    a crop, collage, or watermarked re-post shares exact tile hashes
    with its source even when the whole-frame phash diverges (the
    whole-frame entry is corpus_phash_dups). Distributed plan: the
    decode actor pool emits (image_id, tile_idx, tile_phash) long-form
    rows (`stages/multimodal.TilePhashes`); bucketing by tile_phash +
    in-bucket distinct-image pair emission + a pair-keyed count give
    (id_a, id_b, n_shared_tiles). Size-gated dense path (the tile
    table is 4 narrow rows per image): below 5M rows ONE driver-side
    lexsort + run-pair emission replaces the two exchanges; above it,
    groupby(tile_phash).map_groups pair emission + pair groupby — both
    branches raise loudly past ``bucket_cap`` distinct images in one
    bucket (flat-color tiles are the degenerate-bucket hazard; split
    by a second tile statistic before raising the cap)."""
    from .stages.multimodal import TilePhashes

    tiles = corpus_parquet(columns=["image_id", "bytes", "fmt"]).map_batches(
        TilePhashes,
        concurrency=_safe_workers(2),
        batch_size=64,
        batch_format="pyarrow",
    )
    return _tile_pairs(tiles, bucket_cap)


def _tile_pairs(tiles, bucket_cap: int = 2000, dense_limit: int = 5_000_000):
    """Shared-tile pair counting over (image_id, tile_idx, tile_phash)
    rows — the exchange/dense-path body of corpus_tile_phash_dups,
    factored out so tests can drive it with planted tile sets."""
    from .util import collect_arrow

    if tiles.count() <= dense_limit:
        t = collect_arrow(
            tiles,
            schema=pa.schema(
                [("image_id", pa.string()), ("tile_idx", pa.int64()),
                 ("tile_phash", pa.int64())]
            ),
        )
        # one distinct over (hash, image), then run-pair emission per hash
        t = (
            t.group_by(["tile_phash", "image_id"]).aggregate([([], "count_all")])
            .select(["tile_phash", "image_id"])
        )
        order = pc.sort_indices(
            t, sort_keys=[("tile_phash", "ascending"), ("image_id", "ascending")]
        )
        t = t.take(order)
        hashes = t.column("tile_phash").to_numpy(zero_copy_only=False)
        imgs = np.asarray(t.column("image_id").to_pylist(), dtype=object)
        starts = np.flatnonzero(np.r_[True, hashes[1:] != hashes[:-1]])
        ends = np.r_[starts[1:], len(hashes)]
        a_out, b_out = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            if m > bucket_cap:
                raise RuntimeError(
                    f"degenerate tile-phash bucket: {m} images share one tile "
                    f"hash (cap {bucket_cap})"
                )
            ia, ib = np.triu_indices(m, k=1)
            a_out.append(imgs[s + ia])
            b_out.append(imgs[s + ib])
        if not a_out:
            return pa.table(
                {
                    "id_a": pa.array([], pa.string()),
                    "id_b": pa.array([], pa.string()),
                    "n_shared_tiles": pa.array([], pa.int64()),
                }
            )
        pairs = pa.table(
            {
                "id_a": pa.array(list(np.concatenate(a_out)), pa.string()),
                "id_b": pa.array(list(np.concatenate(b_out)), pa.string()),
            }
        )
        out = (
            pairs.group_by(["id_a", "id_b"]).aggregate([([], "count_all")])
            .rename_columns(["id_a", "id_b", "n_shared_tiles"])
        )
        order = pc.sort_indices(
            out, sort_keys=[("id_a", "ascending"), ("id_b", "ascending")]
        )
        return out.take(order)

    def bucket_pairs_all(t: pa.Table) -> pa.Table:
        """r5 multi-bucket pair emission over (tile_phash, image_id)-
        sorted rows: adjacent (hash, image) dedup + index-arithmetic
        pair fan-out for ALL tile buckets at once — no per-bucket
        Python dispatch (tile-hash count is corpus-proportional)."""
        empty = pa.table(
            {"id_a": pa.array([], pa.string()), "id_b": pa.array([], pa.string())}
        )
        if t.num_rows == 0:
            return empty
        h = t.column("tile_phash").to_numpy(zero_copy_only=False)
        ids = t.column("image_id").combine_chunks()
        n = h.size
        hchg = np.r_[True, h[1:] != h[:-1]]
        uniq = hchg | np.r_[
            True,
            pc.not_equal(ids.slice(1), ids.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            ),
        ]
        ids_u = ids.filter(pa.array(uniq))
        m = len(ids_u)
        starts = np.flatnonzero(hchg[uniq])
        runlens = np.diff(np.r_[starts, m])
        if int(runlens.max(initial=0)) > bucket_cap:
            raise RuntimeError(
                f"degenerate tile-phash bucket: {int(runlens.max())} images "
                f"share one tile hash (cap {bucket_cap}) — split by a "
                "secondary tile statistic before raising the cap"
            )
        within = np.arange(m, dtype=np.int64) - np.repeat(starts, runlens)
        cnt = np.repeat(runlens, runlens) - 1 - within
        total = int(cnt.sum())
        if total == 0:
            return empty
        ia = np.repeat(np.arange(m, dtype=np.int64), cnt)
        ofs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        ib = ia + 1 + ofs
        return pa.table(
            {
                "id_a": pc.cast(ids_u.take(pa.array(ia)), pa.string()),
                "id_b": pc.cast(ids_u.take(pa.array(ib)), pa.string()),
            }
        )

    from .util import sorted_group_apply

    pairs = sorted_group_apply(tiles, "tile_phash", ["image_id"], bucket_pairs_all)
    return (
        _sorted_agg_by_key(
            pairs, ["id_a", "id_b"], [(None, "count", "n_shared_tiles")]
        )
        .sort(["id_a", "id_b"])
    )


def docs_kwic(sf_dir: str):
    """Keyword-in-context snippet extraction (search-result rendering /
    corpus inspection): for every document containing "hash", the first
    ±20-char window around an occurrence, via ONE vectorized RE2
    `extract_regex` per block — both engines run the same RE2
    leftmost-greedy semantics, so the snippets are byte-identical to
    the DuckDB `regexp_extract` oracle. Streaming, no exchange; output
    is matching-docs-sized."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)

    def kwic(b: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(b.column("text"))
        m = pc.extract_regex(txt, r"(?P<snippet>.{0,20}hash.{0,20})")
        keep = pc.is_valid(m)
        snip = pc.struct_field(m.filter(keep), "snippet")
        return pa.table(
            {"doc_id": b.column("doc_id").filter(keep), "snippet": snip}
        )

    return ds.map_batches(kwic, batch_format="pyarrow")


def docs_bm25_search(sf_dir: str, k: int = 10):
    """BM25 ranked retrieval (query = "hash merge window", k1=1.2,
    b=0.75, Lucene idf) — the scoring layer the inverted-index /
    boolean-search entries stop short of. Distributed plan: pass 1
    streams ONE scalar-partial row per block (n_docs, Σdl, per-term
    df); pass 2 re-streams the corpus with the five global scalars
    broadcast by closure, scores fully vectorized (flatten + bincount
    per block, fixed term order so the float sum is partition-
    independent), keeps candidates only, and block-local (score desc,
    doc_id) top-k partials merge on the driver (≤ blocks·k rows). The
    float expression is written operation-for-operation as in the
    oracle, so the result is hash-exact."""
    from .util import collect_arrow

    TERMS = ("hash", "merge", "window")
    K1, B = 1.2, 0.75

    def tf_matrix(b: pa.Table):
        words = pc.split_pattern(pc.utf8_lower(b.column("text")), " ")
        la = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        lens = la.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        flat = la.flatten()
        docidx = np.repeat(np.arange(len(lens)), lens)
        tfs = []
        for t in TERMS:
            m = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            tfs.append(np.bincount(docidx[m], minlength=len(lens)).astype(np.int64))
        return lens, tfs

    def stats_partial(b: pa.Table) -> pa.Table:
        lens, tfs = tf_matrix(b)
        row = {"n_docs": [np.int64(len(lens))], "sum_dl": [lens.sum()]}
        for i in range(len(TERMS)):
            row[f"df{i}"] = [np.int64((tfs[i] > 0).sum())]
        return pa.table(row)

    docs = lambda: _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)  # noqa: E731
    st = collect_arrow(
        docs().map_batches(stats_partial, batch_format="pyarrow"),
        schema=pa.schema(
            [("n_docs", pa.int64()), ("sum_dl", pa.int64())]
            + [(f"df{i}", pa.int64()) for i in range(len(TERMS))]
        ),
    )
    n = float(pc.sum(st.column("n_docs")).as_py() or 0)
    if n == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
        )
    avgdl = float(pc.sum(st.column("sum_dl")).as_py()) / n
    import math

    # math.log (system libm, matching DuckDB's ln) — numpy's SIMD log
    # is 1 ulp off for some inputs and flips the value hash
    idf = [
        math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for df in (
            float(pc.sum(st.column(f"df{i}")).as_py()) for i in range(len(TERMS))
        )
    ]

    def score_partial(b: pa.Table) -> pa.Table:
        lens, tfs = tf_matrix(b)
        dl = lens.astype(np.float64)
        score = np.zeros(len(lens), dtype=np.float64)
        any_tf = np.zeros(len(lens), dtype=np.int64)
        for i in range(len(TERMS)):
            tf = tfs[i].astype(np.float64)
            # literals written exactly as in the oracle (2.2 is NOT
            # bit-equal to runtime 1.2+1.0 — halfway-rounding hazard)
            score = score + idf[i] * (
                (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
            )
            any_tf += tfs[i]
        keep = any_tf > 0
        t = pa.table(
            {
                "doc_id": b.column("doc_id").filter(pa.array(keep)),
                "score": pa.array(score[keep]),
            }
        )
        order = pc.sort_indices(
            t, sort_keys=[("score", "descending"), ("doc_id", "ascending")]
        )
        return t.take(order[:k])

    parts = collect_arrow(
        docs().map_batches(score_partial, batch_format="pyarrow"),
        schema=pa.schema([("doc_id", pa.int64()), ("score", pa.float64())]),
    )
    order = pc.sort_indices(
        parts, sort_keys=[("score", "descending"), ("doc_id", "ascending")]
    )
    return parts.take(order[:k])


def corpus_pair_ssim(sf_dir: str, decorate_gate: int | None = None):
    """SSIM-verified image near-dup pairs: the phash Hamming banding
    (corpus_phash_dups) proposes candidates, then a structural
    similarity score is computed on REAL decoded pixels per pair
    (stages/multimodal actor pool) — the image-axis analogue of the
    text pipelines' exact-verify step, and the quality gate a training
    pipeline applies before dropping near-dups. Plan: the pair list is
    output-sized. Below ``_PIXEL_BCAST_GATE`` candidate images, their
    bytes prune ONE corpus scan (is_in filter) into a candidate-sized
    lookup shipped once via ray.put (PairSSIM, per-actor decode
    cache); ABOVE the gate no process holds O(candidates) bytes — the
    pair table joins the corpus on id_a then id_b so pixels ride the
    pair shuffle into the same actor-pool math (PairSSIMInline,
    equality-tested byte-identical). Pixel math isn't SQL →
    rows-only; pinned by a numpy-replay equality test
    (tests/test_queries.py)."""
    from .stages.dedup import phash_pairs
    from .stages.multimodal import PairSSIM, PairSSIMInline
    from .util import collect_arrow

    gate = _PIXEL_BCAST_GATE if decorate_gate is None else decorate_gate
    pairs = phash_pairs(
        corpus_parquet(columns=["image_id", "phash"]), hamming_threshold=4
    )
    ids = sorted(
        set(pairs.column("id_a").to_pylist()) | set(pairs.column("id_b").to_pylist())
    )
    if not ids:
        return pa.table(
            {
                "id_a": pa.array([], pa.string()),
                "id_b": pa.array([], pa.string()),
                "hamming": pa.array([], pa.int32()),
                "ssim": pa.array([], pa.float64()),
            }
        )
    if len(ids) > gate:
        nparts = _join_partitions()
        corpus = corpus_parquet(columns=["image_id", "bytes", "fmt"])
        j1 = rd.from_arrow(pairs).join(
            corpus, "inner", nparts, on=("id_a",), right_on=("image_id",)
        )
        j1 = j1.map_batches(
            lambda t: pa.table(
                {
                    "id_a": t.column("id_a"),
                    "id_b": t.column("id_b"),
                    "hamming": t.column("hamming"),
                    "bytes_a": t.column("bytes"),
                    "fmt_a": t.column("fmt"),
                }
            ),
            batch_format="pyarrow",
        )
        j2 = j1.join(corpus, "inner", nparts, on=("id_b",), right_on=("image_id",))
        j2 = j2.map_batches(
            lambda t: pa.table(
                {
                    "id_a": t.column("id_a"),
                    "id_b": t.column("id_b"),
                    "hamming": t.column("hamming"),
                    "bytes_a": t.column("bytes_a"),
                    "fmt_a": t.column("fmt_a"),
                    "bytes_b": t.column("bytes"),
                    "fmt_b": t.column("fmt"),
                }
            ),
            batch_format="pyarrow",
        )
        out = collect_arrow(
            j2.map_batches(
                PairSSIMInline,
                concurrency=_safe_workers(2),
                batch_size=256,
                batch_format="pyarrow",
            ),
            schema=pa.schema(
                [
                    ("id_a", pa.string()),
                    ("id_b", pa.string()),
                    ("hamming", pa.int32()),
                    ("ssim", pa.float64()),
                ]
            ),
        )
        return out.take(
            pc.sort_indices(
                out, sort_keys=[("id_a", "ascending"), ("id_b", "ascending")]
            )
        )
    need = pa.array(ids, pa.string())
    lk = collect_arrow(
        corpus_parquet(columns=["image_id", "bytes", "fmt"]).map_batches(
            lambda b: b.filter(pc.is_in(b.column("image_id"), value_set=need)),
            batch_format="pyarrow",
        )
    )
    lookup = {
        i.as_py(): (d.as_py(), f.as_py())
        for i, d, f in zip(
            lk.column("image_id"), lk.column("bytes"), lk.column("fmt")
        )
    }
    ref = ray.put(lookup)
    out = collect_arrow(
        rd.from_arrow(pairs).map_batches(
            PairSSIM(ref),
            concurrency=_safe_workers(2),
            batch_size=256,
            batch_format="pyarrow",
        )
    )
    return out.take(
        pc.sort_indices(
            out, sort_keys=[("id_a", "ascending"), ("id_b", "ascending")]
        )
    )


def lineitem_forecast_revenue(sf_dir: str):
    """TPC-H Q6-shaped forecast-revenue filter-aggregate — the
    canonical zero-shuffle scan: a one-year ship-date slice, a
    discount band and a quantity cap feed ONE global sum of
    extendedprice·discount. Exact integer plan: both factors become
    int64 (cents × discount-percent), each block emits a single int64
    partial, the driver adds Python ints (unbounded) and performs the
    one division back to dollars — bit-equal to the SQL at any block
    layout. At 100 TB this is a pure streaming pass: the filter and
    multiply prune inside each scan task and only ONE row per block
    leaves it."""
    from .util import collect_arrow

    lo_ = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
    hi_ = pa.scalar(np.datetime64("1997-01-01", "us"), pa.timestamp("us"))

    def partial(b: pa.Table) -> pa.Table:
        d = pc.cast(b.column("l_shipdate"), pa.timestamp("us"))
        disc = _cents(b.column("l_discount"))  # discount in percent points
        keep = pc.and_(
            pc.and_(pc.greater_equal(d, lo_), pc.less(d, hi_)),
            pc.and_(
                pc.and_(
                    pc.greater_equal(disc, pa.scalar(4, pa.int64())),
                    pc.less_equal(disc, pa.scalar(6, pa.int64())),
                ),
                pc.less(b.column("l_quantity"), pa.scalar(24.0)),
            ),
        )
        t = b.filter(keep)
        prod = pc.multiply(
            _cents(t.column("l_extendedprice")), _cents(t.column("l_discount"))
        )
        s = pc.sum(prod).as_py() or 0
        return pa.table({"part_sum": pa.array([s], pa.int64())})

    parts = collect_arrow(
        _pq(
            sf_dir,
            "lineitem",
            ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
            blocks=16,
        ).map_batches(partial, batch_format="pyarrow"),
        schema=pa.schema([("part_sum", pa.int64())]),
    )
    total = sum(parts.column("part_sum").to_pylist())  # Python-int exact
    return pa.table({"forecast_revenue": pa.array([total / 10000.0], pa.float64())})


def nation_year_profit(sf_dir: str):
    """TPC-H Q9-shaped profit by (supplier nation, ship year) for a
    part-name slice ('%red%'), adapted to the driver schema (no
    partsupp: unit cost = p_retailprice — documented deviation, the
    join/aggregate shape is Q9's). Exact integer amount per line:
    ext_cents·(100−disc_pct) − retail_cents·qty·100, both in
    1/10000-dollar units, divided back once.

    Size-gated plan (kcore/pagerank dense-path pattern, BASELINE.md):
    below the gate the filtered part dimension resolves to a sorted
    (partkey → retail_cents) array and supplier to a sorted
    (suppkey → nationkey) array, broadcast once via closure capture of
    ``ray.put`` refs; ONE streaming lineitem pass does two searchsorted
    lookups and folds (nation, year) int partials per block — zero
    exchanges. Above the gate: lineitem pre-aggregates by (partkey,
    suppkey, year) inside blocks, hash-joins the filtered part, then
    supplier, and a tiny (nation, year) groupby finishes."""
    from .util import collect_arrow, drop_empty_blocks

    nat = collect_arrow(_pq(sf_dir, "nation", ["n_nationkey", "n_name"]))
    nat_names = dict(
        zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    )

    def part_scan(b: pa.Table) -> pa.Table:
        t = b.filter(pc.match_substring(b.column("p_name"), "red"))
        return pa.table(
            {
                "p_partkey": t.column("p_partkey"),
                "retail_cents": _cents(t.column("p_retailprice")),
            }
        )

    parts_ds = _pq(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"]).map_batches(
        part_scan, batch_format="pyarrow"
    )

    small = (
        _pq(sf_dir, "part", ["p_partkey"]).count() <= _BCAST_KEYS_GATE
        and _pq(sf_dir, "supplier", ["s_suppkey"]).count() <= _BCAST_KEYS_GATE
    )
    if small:
        pt = collect_arrow(
            parts_ds,
            schema=pa.schema([("p_partkey", pa.int64()), ("retail_cents", pa.int64())]),
        )
        pk = pt.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        pr = pt.column("retail_cents").to_numpy(zero_copy_only=False).astype(np.int64)
        po = np.argsort(pk, kind="stable")
        pk, pr = pk[po], pr[po]
        st = collect_arrow(_pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]))
        sk = st.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        sn = st.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        so = np.argsort(sk, kind="stable")
        sk, sn = sk[so], sn[so]
        refs = (ray.put((pk, pr)), ray.put((sk, sn)))

        def fold(b: pa.Table) -> pa.Table:
            pkk, prr = ray.get(refs[0])
            skk, snn = ray.get(refs[1])
            lp = b.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
            m = _sorted_member_mask(pkk, lp)
            t = b.filter(pa.array(m))
            if t.num_rows == 0:
                return pa.table(
                    {
                        "nationkey": pa.array([], pa.int64()),
                        "o_year": pa.array([], pa.int64()),
                        "profit_u": pa.array([], pa.int64()),
                    }
                )
            lp = lp[m]
            retail = prr[np.searchsorted(pkk, lp)]
            ls = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
            nation = snn[np.minimum(np.searchsorted(skk, ls), skk.size - 1)]
            ext = _cents(t.column("l_extendedprice")).to_numpy(zero_copy_only=False)
            disc = _cents(t.column("l_discount")).to_numpy(zero_copy_only=False)
            qty = (
                pc.cast(
                    pc.floor(pc.add(t.column("l_quantity"), 0.5)), pa.int64()
                ).to_numpy(zero_copy_only=False)
            )
            amount = ext * (100 - disc) - retail * qty * 100
            year = (
                pc.cast(
                    pc.year(pc.cast(t.column("l_shipdate"), pa.timestamp("us"))),
                    pa.int64(),
                ).to_numpy(zero_copy_only=False)
            )
            g = pa.table(
                {
                    "nationkey": pa.array(nation),
                    "o_year": pa.array(year),
                    "profit_u": pa.array(amount),
                }
            )
            return (
                g.group_by(["nationkey", "o_year"])
                .aggregate([("profit_u", "sum")])
                .rename_columns(["nationkey", "o_year", "profit_u"])
            )

        folded = collect_arrow(
            _pq(
                sf_dir,
                "lineitem",
                [
                    "l_partkey",
                    "l_suppkey",
                    "l_extendedprice",
                    "l_discount",
                    "l_quantity",
                    "l_shipdate",
                ],
                blocks=16,
            ).map_batches(fold, batch_format="pyarrow"),
            schema=pa.schema(
                [
                    ("nationkey", pa.int64()),
                    ("o_year", pa.int64()),
                    ("profit_u", pa.int64()),
                ]
            ),
        )
        agg = (
            folded.group_by(["nationkey", "o_year"])
            .aggregate([("profit_u", "sum")])
            .rename_columns(["nationkey", "o_year", "profit_u"])
        )
    else:
        nparts = _join_partitions()

        def li_scan(b: pa.Table) -> pa.Table:
            year = pc.cast(
                pc.year(pc.cast(b.column("l_shipdate"), pa.timestamp("us"))),
                pa.int64(),
            )
            s1 = pc.multiply(
                _cents(b.column("l_extendedprice")),
                pc.subtract(pa.scalar(100, pa.int64()), _cents(b.column("l_discount"))),
            )
            qty = pc.cast(pc.floor(pc.add(b.column("l_quantity"), 0.5)), pa.int64())
            t = pa.table(
                {
                    "_pk": b.column("l_partkey"),
                    "_sk": b.column("l_suppkey"),
                    "o_year": year,
                    "s1": s1,
                    "sq": qty,
                }
            )
            return (
                t.group_by(["_pk", "_sk", "o_year"])
                .aggregate([("s1", "sum"), ("sq", "sum")])
                .rename_columns(["_pk", "_sk", "o_year", "s1", "sq"])
            )

        li = _pq(
            sf_dir,
            "lineitem",
            [
                "l_partkey",
                "l_suppkey",
                "l_extendedprice",
                "l_discount",
                "l_quantity",
                "l_shipdate",
            ],
            blocks=16,
        ).map_batches(li_scan, batch_format="pyarrow")
        j = drop_empty_blocks(li).join(
            drop_empty_blocks(parts_ds),
            "inner",
            nparts,
            on=("_pk",),
            right_on=("p_partkey",),
        )

        def amount_partial(b: pa.Table) -> pa.Table:
            amount = pc.subtract(
                b.column("s1"),
                pc.multiply(
                    pc.multiply(b.column("retail_cents"), b.column("sq")),
                    pa.scalar(100, pa.int64()),
                ),
            )
            t = pa.table(
                {
                    "_sk": b.column("_sk"),
                    "o_year": b.column("o_year"),
                    "profit_u": amount,
                }
            )
            return (
                t.group_by(["_sk", "o_year"])
                .aggregate([("profit_u", "sum")])
                .rename_columns(["_sk", "o_year", "profit_u"])
            )

        sup_ds = _pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
        j2 = drop_empty_blocks(
            j.map_batches(amount_partial, batch_format="pyarrow")
        ).join(
            drop_empty_blocks(sup_ds),
            "inner",
            nparts,
            on=("_sk",),
            right_on=("s_suppkey",),
        )
        agg = collect_arrow(
            drop_empty_blocks(
                j2.map_batches(
                    lambda b: pa.table(
                        {
                            "nationkey": b.column("s_nationkey"),
                            "o_year": b.column("o_year"),
                            "profit_u": b.column("profit_u"),
                        }
                    ),
                    batch_format="pyarrow",
                )
                .groupby(["nationkey", "o_year"])
                .aggregate(Sum("profit_u", alias_name="profit_u"))
            )
        )

    names = pa.array(
        [nat_names[k] for k in agg.column("nationkey").to_pylist()], pa.string()
    )
    out = pa.table(
        {
            "nation": names,
            "o_year": agg.column("o_year"),
            "profit": pc.divide(
                pc.cast(agg.column("profit_u"), pa.float64()), 10000.0
            ),
        }
    )
    return out.take(
        pc.sort_indices(
            out, sort_keys=[("nation", "ascending"), ("o_year", "ascending")]
        )
    )


def orders_urgent_by_status(sf_dir: str):
    """TPC-H Q12-shaped priority split, adapted to the driver schema
    (no l_shipmode: grouped by l_linestatus over a one-year ship-date
    slice — the orders⋈lineitem join + dual conditional count is Q12's
    shape). high = orders with 1-URGENT/2-HIGH priority.

    Size-gated plan: below the gate orders resolve to a sorted
    (orderkey → is_high) pair of arrays shipped once via ``ray.put``;
    ONE lineitem pass looks priorities up with searchsorted and folds
    per-linestatus high/low int partials — the fact side never
    shuffles. Above: lineitem pre-aggregates count by (orderkey,
    linestatus) inside blocks, hash-joins orders, and a ≤|statuses|
    conditional-sum groupby finishes."""
    from .util import collect_arrow, drop_empty_blocks

    lo_ = pa.scalar(np.datetime64("1997-01-01", "us"), pa.timestamp("us"))
    hi_ = pa.scalar(np.datetime64("1998-01-01", "us"), pa.timestamp("us"))

    def ord_scan(b: pa.Table) -> pa.Table:
        hi = pc.is_in(
            b.column("o_orderpriority"),
            value_set=pa.array(["1-URGENT", "2-HIGH"]),
        )
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "is_high": pc.cast(hi, pa.int64()),
            }
        )

    ords = _pq(sf_dir, "orders", ["o_orderkey", "o_orderpriority"], blocks=8).map_batches(
        ord_scan, batch_format="pyarrow"
    )

    if _pq(sf_dir, "orders", ["o_orderkey"]).count() <= 2 * _BCAST_KEYS_GATE:
        ot = collect_arrow(
            ords, schema=pa.schema([("o_orderkey", pa.int64()), ("is_high", pa.int64())])
        )
        ok = ot.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        oh = ot.column("is_high").to_numpy(zero_copy_only=False).astype(np.int64)
        oo = np.argsort(ok, kind="stable")
        ok, oh = ok[oo], oh[oo]
        ref = ray.put((ok, oh))

        def fold(b: pa.Table) -> pa.Table:
            okk, ohh = ray.get(ref)
            d = pc.cast(b.column("l_shipdate"), pa.timestamp("us"))
            t = b.filter(pc.and_(pc.greater_equal(d, lo_), pc.less(d, hi_)))
            lk = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
            hi = ohh[np.minimum(np.searchsorted(okk, lk), max(okk.size - 1, 0))]
            g = pa.table(
                {
                    "l_linestatus": t.column("l_linestatus"),
                    "high_line_count": pa.array(hi),
                    "low_line_count": pa.array(1 - hi),
                }
            )
            return (
                g.group_by("l_linestatus")
                .aggregate([("high_line_count", "sum"), ("low_line_count", "sum")])
                .rename_columns(["l_linestatus", "high_line_count", "low_line_count"])
            )

        folded = collect_arrow(
            _pq(
                sf_dir, "lineitem", ["l_orderkey", "l_linestatus", "l_shipdate"], blocks=16
            ).map_batches(fold, batch_format="pyarrow"),
            schema=pa.schema(
                [
                    ("l_linestatus", pa.string()),
                    ("high_line_count", pa.int64()),
                    ("low_line_count", pa.int64()),
                ]
            ),
        )
        out = (
            folded.group_by("l_linestatus")
            .aggregate([("high_line_count", "sum"), ("low_line_count", "sum")])
            .rename_columns(["l_linestatus", "high_line_count", "low_line_count"])
        )
    else:
        nparts = _join_partitions()

        def li_scan(b: pa.Table) -> pa.Table:
            d = pc.cast(b.column("l_shipdate"), pa.timestamp("us"))
            t = b.filter(pc.and_(pc.greater_equal(d, lo_), pc.less(d, hi_)))
            g = pa.table(
                {
                    "_ok": t.column("l_orderkey"),
                    "l_linestatus": t.column("l_linestatus"),
                    "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            )
            return (
                g.group_by(["_ok", "l_linestatus"])
                .aggregate([("n", "sum")])
                .rename_columns(["_ok", "l_linestatus", "n"])
            )

        li = _pq(
            sf_dir, "lineitem", ["l_orderkey", "l_linestatus", "l_shipdate"], blocks=16
        ).map_batches(li_scan, batch_format="pyarrow")
        j = drop_empty_blocks(li).join(
            drop_empty_blocks(ords), "inner", nparts, on=("_ok",), right_on=("o_orderkey",)
        )

        def combine(b: pa.Table) -> pa.Table:
            hi = pc.multiply(b.column("n"), b.column("is_high"))
            t = pa.table(
                {
                    "l_linestatus": b.column("l_linestatus"),
                    "high_line_count": hi,
                    "low_line_count": pc.subtract(b.column("n"), hi),
                }
            )
            return (
                t.group_by("l_linestatus")
                .aggregate([("high_line_count", "sum"), ("low_line_count", "sum")])
                .rename_columns(["l_linestatus", "high_line_count", "low_line_count"])
            )

        out = collect_arrow(
            drop_empty_blocks(
                j.map_batches(combine, batch_format="pyarrow")
                .groupby("l_linestatus")
                .aggregate(
                    Sum("high_line_count", alias_name="high_line_count"),
                    Sum("low_line_count", alias_name="low_line_count"),
                )
            )
        )

    return out.take(
        pc.sort_indices(out, sort_keys=[("l_linestatus", "ascending")])
    )


def supplier_excess_share(sf_dir: str):
    """TPC-H Q20 shape — the doubly-nested semi-join with a correlated
    share threshold (reference shape: suppliers whose availqty exceeds
    half a part's year shipments; `/root/reference` has no partsupp
    analog, so the correlation maps onto this schema as a
    per-(part, supplier) quantity share against the per-part total over
    the same date-sliced fact): suppliers in the even-keyed nation
    slice that shipped MORE THAN 25 % of some 'small%'-named part's
    1996 total quantity, with how many such parts each covers.

    Decorrelated plan: the prefix part-key set folds driver-side
    (dimension-sized) and broadcasts sorted for a searchsorted
    membership mask; ONE date-sliced lineitem pass emits
    (partkey, suppkey, qty) block partials — pair-grain, the query's
    own candidate cardinality. Below the gate the partials fold
    driver-side in one Arrow group_by, per-part totals derive from the
    folded pairs with np.add.at over part codes, and the share
    predicate is the exact integer cross-multiplication 4·q > tq (no
    float share, both engines pick identical rows). Above the gate the
    same partials flow through a distributed groupby(part, supp), a
    part-keyed total groupby, and a Dataset hash join back — the
    fact-sized path with no driver table. Supplier name/nation
    decoration is dimension-sized on either path."""
    from .util import collect_arrow, drop_empty_blocks

    lo = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"), pa.timestamp("us"))

    # nested IN #1: prefix-named parts (dimension-sized → broadcast)
    def prefix_parts(b: pa.Table) -> pa.Table:
        return b.filter(pc.starts_with(b.column("p_name"), "small"))

    pt = collect_arrow(
        _pq(sf_dir, "part", ["p_partkey", "p_name"], blocks=4).map_batches(
            prefix_parts, batch_format="pyarrow"
        ),
        schema=pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string())]),
    )
    part_keys = np.sort(
        pt.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    )
    part_ref = ray.put(part_keys)

    def pair_partial(b: pa.Table) -> pa.Table:
        d = pc.cast(b.column("l_shipdate"), pa.timestamp("us"))
        mask = pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))
        b = b.filter(mask)
        keys = ray.get(part_ref)
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        b = b.filter(pa.array(_sorted_member_mask(keys, pk)))
        t = pa.table(
            {
                "p": b.column("l_partkey"),
                "s": b.column("l_suppkey"),
                "q": pc.cast(b.column("l_quantity"), pa.int64()),
            }
        )
        return t.group_by(["p", "s"]).aggregate([("q", "sum")]).rename_columns(
            ["p", "s", "q"]
        )

    li = _pq(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        blocks=16,
    ).map_batches(pair_partial, batch_format="pyarrow")

    sup = collect_arrow(
        _pq(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"], blocks=2)
    )
    s_keys = sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    s_nat = sup.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    s_order = np.argsort(s_keys)
    s_keys, s_nat = s_keys[s_order], s_nat[s_order]
    s_names = np.asarray(sup.column("s_name").to_pylist(), dtype=object)[s_order]

    if _pq(sf_dir, "lineitem", ["l_partkey"]).count() <= 2 * _BCAST_KEYS_GATE:
        # dense path: pair partials are ≤ blocks × |pairs| rows — fold once
        pairs = (
            collect_arrow(
                drop_empty_blocks(li),
                schema=pa.schema(
                    [("p", pa.int64()), ("s", pa.int64()), ("q", pa.int64())]
                ),
            )
            .group_by(["p", "s"])
            .aggregate([("q", "sum")])
            .rename_columns(["p", "s", "q"])
        )
        p_arr = pairs.column("p").to_numpy(zero_copy_only=False).astype(np.int64)
        s_arr = pairs.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
        q_arr = pairs.column("q").to_numpy(zero_copy_only=False).astype(np.int64)
        uniq_p, codes = np.unique(p_arr, return_inverse=True)
        tot = np.zeros(len(uniq_p), dtype=np.int64)
        np.add.at(tot, codes, q_arr)
        excess = 4 * q_arr > tot[codes]
    else:
        # sort-kernel plan (the supplier_blame shape): ONE global
        # (p, s) sort makes every pair duplicate and part run
        # contiguous; each block dedup-sums its INTERIOR parts,
        # computes part totals and the excess test vectorized, and
        # ships ONLY qualifying (p, s) pairs (output grain — the old
        # plan's two proportional groupby-aggregates, Dataset join and
        # full-pair-table collect are gone) plus the ≤2 boundary
        # parts' raw partials for the driver patch.
        def _excess_pairs(p, s, q):
            new = np.r_[True, (p[1:] != p[:-1]) | (s[1:] != s[:-1])]
            st = np.flatnonzero(new)
            q = np.add.reduceat(q, st)
            p, s = p[st], s[st]
            pchg = np.r_[True, p[1:] != p[:-1]]
            tot = np.add.reduceat(q, np.flatnonzero(pchg))
            codes = np.cumsum(pchg) - 1
            m = 4 * q > tot[codes]
            return p[m], s[m]

        def census(b: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "kind": pa.array([], pa.int8()),
                    "k1": pa.array([], pa.int64()),
                    "k2": pa.array([], pa.int64()),
                    "k3": pa.array([], pa.int64()),
                }
            )
            if b.num_rows == 0:
                return empty
            p = b.column("p").to_numpy(zero_copy_only=False).astype(np.int64)
            s = b.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
            q = b.column("q").to_numpy(zero_copy_only=False).astype(np.int64)
            edge = (p == p[0]) | (p == p[-1])
            e_p, e_s, e_q = p[edge], s[edge], q[edge]
            p, s, q = p[~edge], s[~edge], q[~edge]
            out_p = np.array([], np.int64)
            out_s = np.array([], np.int64)
            if p.size:
                out_p, out_s = _excess_pairs(p, s, q)
            return pa.table(
                {
                    "kind": pa.array(
                        np.r_[np.zeros(e_p.size, np.int8), np.ones(out_p.size, np.int8)]
                    ),
                    "k1": pa.array(np.r_[e_p, out_p], pa.int64()),
                    "k2": pa.array(np.r_[e_s, out_s], pa.int64()),
                    "k3": pa.array(
                        np.r_[e_q, np.zeros(out_p.size, np.int64)], pa.int64()
                    ),
                }
            )

        parts = collect_arrow(
            li.sort(["p", "s"]).map_batches(census, batch_format="pyarrow"),
            schema=pa.schema(
                [
                    ("kind", pa.int8()),
                    ("k1", pa.int64()),
                    ("k2", pa.int64()),
                    ("k3", pa.int64()),
                ]
            ),
        )
        kind = parts.column("kind").to_numpy()
        k1 = parts.column("k1").to_numpy()
        k2 = parts.column("k2").to_numpy()
        k3 = parts.column("k3").to_numpy()
        b_p = np.array([], np.int64)
        b_s = np.array([], np.int64)
        e_p, e_s, e_q = k1[kind == 0], k2[kind == 0], k3[kind == 0]
        if e_p.size:
            o = np.lexsort((e_s, e_p))
            b_p, b_s = _excess_pairs(e_p[o], e_s[o], e_q[o])
        p_arr = np.r_[k1[kind == 1], b_p]
        s_arr = np.r_[k2[kind == 1], b_s]
        excess = np.ones(len(s_arr), bool)

    # nested IN #2 + nation slice: decorate qualifying suppliers
    s_q = s_arr[excess]
    pos = np.searchsorted(s_keys, s_q)
    keep = s_nat[pos] % 2 == 0
    s_q = s_q[keep]
    if len(s_q) == 0:
        return pa.table(
            {
                "s_suppkey": pa.array([], pa.int64()),
                "s_name": pa.array([], pa.string()),
                "n_parts": pa.array([], pa.int64()),
            }
        )
    uniq_s, counts = np.unique(s_q, return_counts=True)
    return pa.table(
        {
            "s_suppkey": pa.array(uniq_s),
            "s_name": pa.array(
                s_names[np.searchsorted(s_keys, uniq_s)].tolist(), pa.string()
            ),
            "n_parts": pa.array(counts.astype(np.int64)),
        }
    )


def corpus_mip_build(sf_dir: str):
    """Build the actual mip/thumbnail pyramid (levels 1–3) over the
    image corpus — the APPLY step of corpus_mip_levels' integer plan:
    decode in an actor pool, halve with an exact 2×2 integer box
    filter per level, re-encode losslessly (stages/multimodal.
    MipPyramid; pixels never leave the stage). Rows-only (pixel
    transforms aren't SQL); the decode-back test pins level-1 bytes to
    the numpy box-filter of the decoded originals bit-exactly."""
    from .stages.multimodal import MipPyramid

    ds = corpus_parquet(columns=["image_id", "bytes", "fmt"])
    return ds.map_batches(
        MipPyramid, batch_format="pyarrow", batch_size=32, concurrency=2
    ).select_columns(["image_id", "level", "w_l", "h_l", "mean_luma"])


def docs_heavy_hitters(sf_dir: str, k: int = 30):
    """EXACT frequent-items via the two-pass Misra–Gries protocol —
    the bounded-memory heavy-hitter operator (what replaces a full
    vocabulary groupby when the term universe doesn't fit anywhere):
    terms whose corpus frequency strictly exceeds n/(k+1) of the n
    total tokens. Pass 1: each block folds its exact token counts
    (block-local Arrow group_by) and COMPRESSES them to ≤ k weighted
    Misra–Gries counters (subtract the (k+1)-th largest, drop ≤ 0);
    the ≤ blocks×k counter rows merge driver-side by summation plus
    one final compress. Mergeability bound (Agarwal et al., mergeable
    summaries): total undercount per term ≤ n/(k+1), so every TRUE
    heavy hitter provably survives with a positive counter — the
    candidate set is a superset. Pass 2: the ≤ k candidates broadcast
    and ONE streaming re-count gives exact counts; the final filter is
    the integer cross-multiplication count·(k+1) > n (no float ratio).
    Output is exactly SQL's HAVING count(*)·(k+1) > total — but no
    stage ever holds more than k counters per block, versus
    docs_heavy_terms' full-vocabulary exchange."""
    from .util import collect_arrow, drop_empty_blocks

    ds = _pq(sf_dir, "documents", ["text"], blocks=8)

    # "\\x00" is a reserved sentinel row carrying the block's exact token
    # total (a space-split token can never contain NUL) — it survives
    # folds with counter 0 and is dropped by the exact-count threshold
    _SENT = "\x00"

    def mg_partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.utf8_lower(b.column("text").combine_chunks()), " "
        )
        t = pa.table({"term": pc.list_flatten(toks)})
        g = t.group_by("term").aggregate([([], "count_all")])
        terms = np.asarray(g.column("term").to_pylist(), dtype=object)
        cnt = g.column("count_all").to_numpy(zero_copy_only=False).astype(np.int64)
        n_block = int(cnt.sum())
        if len(cnt) > k:
            order = np.argsort(-cnt, kind="stable")
            sub = cnt[order[k]]
            kept = cnt[order[:k]] - sub
            pos = kept > 0
            terms, cnt = terms[order[:k]][pos], kept[pos]
        return pa.table(
            {
                "term": pa.array(list(terms) + [_SENT], pa.string()),
                "counter": pa.array(np.append(cnt, 0)),
                "_n": pa.array(
                    np.append(np.zeros(len(cnt), dtype=np.int64), n_block)
                ),
            }
        )

    parts = collect_arrow(
        drop_empty_blocks(ds.map_batches(mg_partial, batch_format="pyarrow")),
        schema=pa.schema(
            [("term", pa.string()), ("counter", pa.int64()), ("_n", pa.int64())]
        ),
    )
    n_total = int(pc.sum(parts.column("_n")).as_py() or 0)
    merged = (
        parts.select(["term", "counter"])
        .group_by("term")
        .aggregate([("counter", "sum")])
        .rename_columns(["term", "counter"])
    )
    terms = np.asarray(merged.column("term").to_pylist(), dtype=object)
    cnt = merged.column("counter").to_numpy(zero_copy_only=False).astype(np.int64)
    if len(cnt) > k:
        order = np.argsort(-cnt, kind="stable")
        sub = cnt[order[k]]
        kept = cnt[order[:k]] - sub
        pos = kept > 0
        terms = terms[order[:k]][pos]
    cand = np.sort(terms.astype(str))
    cand_ref = ray.put(cand)

    def exact_partial(b: pa.Table) -> pa.Table:
        c = ray.get(cand_ref)
        toks = pc.split_pattern(
            pc.utf8_lower(b.column("text").combine_chunks()), " "
        )
        t = pa.table({"term": pc.list_flatten(toks)})
        g = t.group_by("term").aggregate([([], "count_all")])
        tt = np.asarray(g.column("term").to_pylist(), dtype=str)
        pos = np.searchsorted(c, tt)
        pos_c = np.clip(pos, 0, len(c) - 1)
        hit = c[pos_c] == tt
        return pa.table(
            {
                "term": pa.array(tt[hit].tolist(), pa.string()),
                "n": g.column("count_all").take(pa.array(np.flatnonzero(hit))),
            }
        )

    exact = (
        collect_arrow(
            drop_empty_blocks(ds.map_batches(exact_partial, batch_format="pyarrow")),
            schema=pa.schema([("term", pa.string()), ("n", pa.int64())]),
        )
        .group_by("term")
        .aggregate([("n", "sum")])
        .rename_columns(["term", "n"])
    )
    nn = exact.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    keep = nn * (k + 1) > n_total
    out = exact.filter(pa.array(keep))
    return out.take(pc.sort_indices(out, sort_keys=[("term", "ascending")]))


def corpus_caption_conflicts(sf_dir: str, bucket_cap: int = 10_000):
    """Caption↔image consistency census over the (image, caption)
    corpus (input_hint schema): pairs of images sharing an IDENTICAL
    caption whose pixels are NOT near-duplicates (phash Hamming > 4,
    the complement of corpus_phash_dups' near-dup criterion) — the
    mislabel / templated-alt-text signal a paired multimodal corpus is
    screened for before training: same text over visually different
    images is either boilerplate or a labeling error. Distributed
    shape: exact caption grouping is ONE caption-keyed groupby
    exchange (the exact-dedup shape — pixels/bytes never read, only
    the three narrow metadata columns); in-group pair emission is
    vectorized (triu index fan-out + xor-popcount via the _POP8 byte
    LUT) with the dedup.py bucket_cap convention guarding degenerate
    caption groups (a stock caption shared by s images costs s²/2
    candidate rows — raise loudly, never a silent quadratic)."""
    from .stages.similarity import _POP8

    ds = corpus_parquet(columns=["image_id", "caption", "phash"])

    def pairs_all(t: pa.Table) -> pa.Table:
        """r5 across-caption kernel (sorted (caption, image_id)): pair
        fan-out + one byte-LUT xor-popcount for EVERY caption group of
        the block at once — caption count is corpus-proportional, so
        no per-group Python dispatch."""
        empty = pa.table(
            {
                "id_a": pa.array([], pa.string()),
                "id_b": pa.array([], pa.string()),
                "caption": pa.array([], pa.string()),
                "hamming": pa.array([], pa.int32()),
            }
        )
        if t.num_rows == 0:
            return empty
        cap_arr = pc.cast(t.column("caption"), pa.string()).combine_chunks()
        n = len(cap_arr)
        chg = np.r_[
            True,
            pc.not_equal(
                cap_arr.slice(1), cap_arr.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False),
        ]
        starts = np.flatnonzero(chg)
        runlens = np.diff(np.r_[starts, n])
        if int(runlens.max()) > bucket_cap:
            raise ValueError(
                f"caption group over cap={bucket_cap} ({int(runlens.max())} "
                "ids): raise the cap or pre-split the degenerate caption"
            )
        within = np.arange(n, dtype=np.int64) - np.repeat(starts, runlens)
        cnt = np.repeat(runlens, runlens) - 1 - within
        total = int(cnt.sum())
        if total == 0:
            return empty
        ia = np.repeat(np.arange(n, dtype=np.int64), cnt)
        ofs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        ib = ia + 1 + ofs
        hp = (
            pc.cast(t.column("phash"), pa.int64())
            .to_numpy(zero_copy_only=False)
            .view(np.uint64)
        )
        x = np.ascontiguousarray(hp[ia] ^ hp[ib])
        d = _POP8[x.view(np.uint8).reshape(-1, 8)].sum(axis=1, dtype=np.int32)
        keep = d > 4
        ids = t.column("image_id").combine_chunks()
        return pa.table(
            {
                "id_a": pc.cast(ids.take(pa.array(ia[keep])), pa.string()),
                "id_b": pc.cast(ids.take(pa.array(ib[keep])), pa.string()),
                "caption": cap_arr.take(pa.array(ia[keep])),
                "hamming": pa.array(d[keep], pa.int32()),
            }
        )

    from .util import sorted_group_apply

    return sorted_group_apply(ds, "caption", ["image_id"], pairs_all)


def customer_fuzzy_groups(sf_dir: str):
    """Entity-resolution GROUPING — the step after the fuzzy match:
    transitive closure over the edit-distance≤1 pair set, labeling
    every matched name with its group representative (lexicographic
    min, the same convention as docs_minhash_groups). The pair set
    comes from the SAME distributed FastSS deletion-neighborhood join
    as customer_fuzzy_pairs; the closure runs as a driver union-find
    on the OUTPUT-SIZED pair table (house rule — the distributed
    min-label-propagation path in stages/dedup is the above-output-size
    alternative and is exercised by docs_minhash_groups). SQL oracle:
    recursive-CTE reachability with the same min-rep convention."""
    pairs = customer_fuzzy_pairs(sf_dir)
    a = pairs.column("tok_a").to_pylist()
    b = pairs.column("tok_b").to_pylist()
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for x, y in zip(a, b):
        rx, ry = find(x), find(y)
        if rx != ry:
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo
    nodes = sorted(set(a) | set(b))
    return pa.table(
        {
            "tok": pa.array(nodes, pa.string()),
            "rep": pa.array([find(n) for n in nodes], pa.string()),
        }
    )


def docs_dup_source_matrix(sf_dir: str, decorate_gate: int | None = None):
    """Cross-source duplication matrix — which sources copy from which:
    per unordered source pair, how many verified near-duplicate
    document pairs straddle them (diagonal = within-source dups). The
    provenance census a curation pipeline runs before deciding which
    feed to drop; reference parity: the reference's duplicate report
    groups by page only (`reports/`), this adds the source axis an
    open-web corpus needs. Plan: the verified pair set comes from the
    SAME distributed minhash band-groupby + verify stage as
    docs_minhash_dups (pairs are output-sized). Below
    ``_BCAST_KEYS_GATE`` documents, each end decorates with its source
    via one narrow (doc_id, source) scan folded driver-side and
    searchsorted; ABOVE it the corpus map never touches the driver —
    the pair table joins the (doc_id, source) Dataset on each end
    (id_a then id_b, the docs_tfidf_top_terms join-fallback pattern)
    and only source-pair census partials are collected. Either way the
    (src_a, src_b) census is one output-grain Arrow group_by."""
    from .stages.dedup import minhash_pipeline
    from .util import collect_arrow

    gate = _BCAST_KEYS_GATE if decorate_gate is None else decorate_gate
    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=16)
    pairs = minhash_pipeline(ds, "text", "doc_id", jaccard_threshold=0.5)["pairs"]

    docs = _pq(sf_dir, "documents", ["doc_id", "source"], blocks=8)
    if docs.count() > gate:
        import ray.data as rd

        nparts = _join_partitions()
        pairs_ds = rd.from_arrow(pairs.select(["id_a", "id_b"]))
        j1 = pairs_ds.join(docs, "inner", nparts, on=("id_a",), right_on=("doc_id",))
        j1 = j1.map_batches(
            lambda t: pa.table(
                {"id_b": t.column("id_b"), "sa": t.column("source")}
            ),
            batch_format="pyarrow",
        )
        j2 = j1.join(docs, "inner", nparts, on=("id_b",), right_on=("doc_id",))

        def census_partial(t: pa.Table) -> pa.Table:
            sa = np.asarray(t.column("sa").to_pylist(), dtype=object)
            sb = np.asarray(t.column("source").to_pylist(), dtype=object)
            sa, sb = sa.astype(str), sb.astype(str)
            a_low = sa <= sb
            g = (
                pa.table(
                    {
                        "src_a": pa.array(np.where(a_low, sa, sb), pa.string()),
                        "src_b": pa.array(np.where(a_low, sb, sa), pa.string()),
                    }
                )
                .group_by(["src_a", "src_b"])
                .aggregate([([], "count_all")])
            )
            return g.rename_columns(["src_a", "src_b", "n_pairs"])

        out = (
            collect_arrow(j2.map_batches(census_partial, batch_format="pyarrow"))
            .group_by(["src_a", "src_b"])
            .aggregate([("n_pairs", "sum")])
            .rename_columns(["src_a", "src_b", "n_pairs"])
        )
        return out.take(
            pc.sort_indices(
                out, sort_keys=[("src_a", "ascending"), ("src_b", "ascending")]
            )
        )

    src = collect_arrow(
        docs,
        schema=pa.schema([("doc_id", pa.int64()), ("source", pa.string())]),
    )
    d_ids = src.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(d_ids)
    d_ids = d_ids[order]
    d_src = np.asarray(src.column("source").to_pylist(), dtype=object)[order]

    a = pairs.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
    b = pairs.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
    sa = d_src[np.searchsorted(d_ids, a)]
    sb = d_src[np.searchsorted(d_ids, b)]
    sa, sb = sa.astype(str), sb.astype(str)
    a_low = sa <= sb
    lo = np.where(a_low, sa, sb)
    hi = np.where(a_low, sb, sa)
    t = pa.table(
        {"src_a": pa.array(lo, pa.string()), "src_b": pa.array(hi, pa.string())}
    )
    out = (
        t.group_by(["src_a", "src_b"])
        .aggregate([([], "count_all")])
        .rename_columns(["src_a", "src_b", "n_pairs"])
    )
    return out.take(
        pc.sort_indices(
            out, sort_keys=[("src_a", "ascending"), ("src_b", "ascending")]
        )
    )


def embeddings_kcenter(sf_dir: str, k: int = 12):
    """Greedy k-center / farthest-point core-set selection (Gonzalez's
    2-approximation) — the diversity-sampling curation primitive: pick
    ``k`` vectors so every vector is near some pick, the opposite of
    near-dup removal (keep the SPREAD, not the dense mass). Each of
    the k−1 greedy rounds is ONE streaming pass over the (materialized
    — the iterative working set, the k-means/pagerank rule) embedding
    blocks: centers-so-far broadcast via ``ray.put`` (k×d, tiny), each
    block computes min squared-L2 to the centers with one matmul and
    emits only its block-argmax (vec_id, dist, vector) partial, and
    the driver folds ≤ blocks partials with the (dist desc, vec_id
    asc) tie-break. O(k) passes of O(n·r) flops — the exact greedy;
    at larger k switch the inner min to the IVF cells. Rows-only
    (iterative greedy argmax is not ANSI-SQL); pinned bit-exact by a
    numpy replay test. Output: (round, vec_id, dist) — dist is each
    pick's distance to the previously-picked set (0 for the seed,
    non-increasing thereafter, the k-center radius curve)."""
    from .stages.similarity import _vec_matrix
    from .util import collect_arrow

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"], blocks=8).materialize()

    def seed_partial(b: pa.Table) -> pa.Table:
        i = int(np.argmin(b.column("vec_id").to_numpy(zero_copy_only=False)))
        return b.take(pa.array([i]))

    seeds = collect_arrow(ds.map_batches(seed_partial, batch_format="pyarrow"))
    s_ids = seeds.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    j = int(np.argmin(s_ids))
    d_dim = _vec_matrix(seeds.column("embedding")).shape[1]
    centers = [_vec_matrix(seeds.column("embedding"))[j]]
    picked_ids = [int(s_ids[j])]
    picked_dist = [0.0]

    for _ in range(1, k):
        cref = ray.put(np.stack(centers))

        def far_partial(b: pa.Table, _cref=cref) -> pa.Table:
            C = ray.get(_cref)
            X = _vec_matrix(b.column("embedding"))
            d2 = (
                (X * X).sum(axis=1)[:, None]
                - 2.0 * (X @ C.T)
                + (C * C).sum(axis=1)[None, :]
            ).min(axis=1)
            vid = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
            i = int(np.lexsort((vid, -d2))[0])
            return pa.table(
                {
                    "vec_id": pa.array([int(vid[i])], pa.int64()),
                    "dist": pa.array([float(d2[i])], pa.float64()),
                    "vec": pa.array([X[i]], pa.list_(pa.float64(), d_dim)),
                }
            )

        parts = collect_arrow(ds.map_batches(far_partial, batch_format="pyarrow"))
        pv = parts.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        pd_ = parts.column("dist").to_numpy(zero_copy_only=False)
        w = int(np.lexsort((pv, -pd_))[0])
        picked_ids.append(int(pv[w]))
        picked_dist.append(float(pd_[w]))
        centers.append(np.asarray(parts.column("vec")[w].as_py(), dtype=np.float64))

    return pa.table(
        {
            "round": pa.array(np.arange(k, dtype=np.int64)),
            "vec_id": pa.array(np.asarray(picked_ids, dtype=np.int64)),
            "dist": pa.array(np.asarray(picked_dist, dtype=np.float64)),
        }
    )


def docs_unigram_logprob(sf_dir: str):
    """Unigram-LM document scoring — the CCNet-style quality signal: a
    document's mean token log-probability under the corpus's own
    unigram distribution (low = rare-token soup / gibberish, high =
    stereotyped boilerplate; curation pipelines threshold both tails).
    Reference parity: the reference scores pages with hand rules
    (`analise_*` modules); this is the statistical sibling an LLM-data
    pipeline adds on top.

    Two streaming passes: (1) global token counts — per-block Arrow
    split+group_by partials folded to the vocabulary grain (the
    documented TF-IDF vocabulary seam: below web-vocab scale the fold
    is driver-side and the sorted (token, count) arrays broadcast via
    ``ray.put``; above it the same partials feed a term-keyed groupby
    + join); (2) per-block scoring — tokens code via ``searchsorted``
    on the sorted vocab (binary/codepoint order on both engines), tf
    per (doc, token) from one lexsort run-length, each doc's
    Σ tf·ln(c/T) accumulated with ``np.add.accumulate`` STRICTLY in
    token order — a sequential left fold, bit-equal to the oracle's
    ``sum(... ORDER BY tok)`` ordered aggregate (ln is the same libm
    call on the same double on both sides — the BM25 idf precedent)."""
    from .util import collect_arrow, drop_empty_blocks

    ds = _pq(sf_dir, "documents", ["doc_id", "text"], blocks=8)

    def tok_counts(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.utf8_lower(b.column("text").combine_chunks()), " "
        )
        t = pa.table({"tok": pc.list_flatten(toks)})
        return (
            t.group_by("tok").aggregate([([], "count_all")]).rename_columns(
                ["tok", "c"]
            )
        )

    vocab = (
        collect_arrow(
            drop_empty_blocks(ds.map_batches(tok_counts, batch_format="pyarrow")),
            schema=pa.schema([("tok", pa.string()), ("c", pa.int64())]),
        )
        .group_by("tok")
        .aggregate([("c", "sum")])
        .rename_columns(["tok", "c"])
    )
    vt = np.asarray(vocab.column("tok").to_pylist(), dtype=str)
    vc = vocab.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vt, kind="stable")
    vt, vc = vt[order], vc[order]
    total = int(vc.sum())
    # ln once per vocab entry with math.log (glibc libm — the SAME
    # correctly-rounded call DuckDB's ln makes; numpy's SIMD np.log
    # drifts 1 ulp on ~25 % of inputs) and broadcast the values
    import math

    lnp_vocab = np.fromiter(
        (math.log(int(c) / float(total)) for c in vc),
        dtype=np.float64,
        count=len(vc),
    )
    vocab_ref = ray.put((vt, lnp_vocab))

    def score(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "avg_logprob": pa.array([], pa.float64()),
            }
        )
        if b.num_rows == 0:
            return empty
        vt_, lnp_ = ray.get(vocab_ref)
        toks = pc.split_pattern(
            pc.utf8_lower(b.column("text").combine_chunks()), " "
        )
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        parent = np.repeat(np.arange(b.num_rows, dtype=np.int64), n_tok)
        flat = np.asarray(pc.list_flatten(toks).to_pylist(), dtype=str)
        codes = np.searchsorted(vt_, flat)
        # tf per (doc, token): lexsort then run-length over the pair key
        srt = np.lexsort((codes, parent))
        p_s, c_s = parent[srt], codes[srt]
        new = np.empty(len(srt), dtype=bool)
        new[:1] = True
        new[1:] = (p_s[1:] != p_s[:-1]) | (c_s[1:] != c_s[:-1])
        starts = np.flatnonzero(new)
        tf = np.diff(np.append(starts, len(srt))).astype(np.int64)
        pair_doc, pair_code = p_s[starts], c_s[starts]
        vals = tf.astype(np.float64) * lnp_[pair_code]
        # per-doc sequential left fold in token order (oracle's ordered sum)
        doc_new = np.empty(len(pair_doc), dtype=bool)
        doc_new[:1] = True
        doc_new[1:] = pair_doc[1:] != pair_doc[:-1]
        seg = np.flatnonzero(doc_new)
        ends = np.append(seg[1:], len(pair_doc))
        sums = np.empty(len(seg), dtype=np.float64)
        for i, (s, e) in enumerate(zip(seg, ends)):
            sums[i] = np.add.accumulate(vals[s:e])[-1]
        doc_ids = pc.cast(b.column("doc_id"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        rows = pair_doc[seg]
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[rows]),
                "n_tokens": pa.array(n_tok[rows]),
                "avg_logprob": pa.array(sums / n_tok[rows].astype(np.float64)),
            }
        )

    return drop_empty_blocks(ds.map_batches(score, batch_format="pyarrow"))


def docs_zipf_census(sf_dir: str, vocab_gate: int | None = None):
    """Rank-octave frequency census of the corpus vocabulary — the
    Zipf-law diagnostic a curation pipeline runs to sanity-check a text
    source (a healthy natural-language corpus halves total frequency
    roughly per octave; templated/spam sources don't). Distributed
    per-block term-count partials (Arrow group_by inside the block =
    map-side combine; only (term, n) rows leave a block). Below
    ``_VOCAB_FOLD_GATE`` partial rows the (term, n) partials fold on
    the driver; ABOVE it no vocabulary ever touches the driver: ONE
    global sort on term, each block reduceat-folds its interior term
    runs straight into (count → #terms) histogram partials (the
    boundary terms patch on the driver), collapsing the collected
    rows to the DISTINCT-COUNT grain (O(√tokens) — Zipf's own tail
    bound), and the census is derived from the count histogram alone. The derivation is exact because the octave census is
    tie-order invariant: terms sharing a count occupy a contiguous
    rank run, so each count-group's overlap with the octave interval
    [2^o, 2^(o+1)) is pure integer interval math. Terms rank by
    (count desc, term asc); octaves use integer frexp exponents —
    never float log — so the output is all-integer."""
    from .util import collect_arrow

    gate = _VOCAB_FOLD_GATE if vocab_gate is None else vocab_gate
    ds = _pq(sf_dir, "documents", ["text"], blocks=8)

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.utf8_lower(b.column("text")), " ")
        la = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        g = pa.table({"term": la.flatten()}).group_by("term").aggregate(
            [("term", "count")]
        )
        return pa.table(
            {"term": g.column("term"), "n": g.column("term_count").cast(pa.int64())}
        )

    parts_ds = ds.map_batches(partial, batch_format="pyarrow").materialize()
    # parts row count (Σ per-block vocab) bounds what a driver fold
    # would collect — the honest gate signal, free on a materialized ds
    if parts_ds.count() <= gate:
        parts = collect_arrow(parts_ds)
        tot = parts.group_by("term").aggregate([("n", "sum")])
        n = tot.column("n_sum").to_numpy()
        terms = tot.column("term").to_numpy(zero_copy_only=False)
        order = np.lexsort((terms, -n))
        n_sorted = n[order]
        rank = np.arange(1, len(n_sorted) + 1, dtype=np.int64)
        octave = (np.frexp(rank.astype(np.float64))[1] - 1).astype(np.int32)
        starts = np.r_[0, np.flatnonzero(np.diff(octave)) + 1]
        return pa.table(
            {
                "octave": pa.array(octave[starts], pa.int32()),
                "n_terms": pa.array(np.diff(np.r_[starts, len(rank)]), pa.int64()),
                "total_freq": pa.array(np.add.reduceat(n_sorted, starts), pa.int64()),
                "min_rank": pa.array(rank[starts], pa.int64()),
            }
        )

    # distributed path: ONE global sort on term (NOT a term-keyed
    # groupby-aggregate — Ray's aggregate walks groups in Python at
    # ~9 µs/group, input-proportional at web vocabulary; the
    # supplier_blame sort-kernel lesson, BASELINE.md r4). After the
    # sort every term's partial rows are contiguous: each block folds
    # its INTERIOR term runs to totals via reduceat and collapses them
    # straight to a (count → #terms) histogram partial; only the
    # block's first/last term (which may straddle blocks) ships raw
    # for the driver patch. Collected rows: distinct-count grain +
    # ≤2 terms per block.
    sorted_parts = parts_ds.sort("term")

    def hist_fold(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "kind": pa.array([], pa.int8()),
                "term": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "m": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        keys = b.column("term")
        keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
        vals = b.column("n").to_numpy()
        em = pc.or_(
            pc.equal(keys, keys[0]), pc.equal(keys, keys[len(keys) - 1])
        ).to_numpy(zero_copy_only=False)
        e_terms = keys.filter(pa.array(em))
        e_n = vals[em]
        ik, iv = keys.filter(pa.array(~em)), vals[~em]
        h_n = np.array([], np.int64)
        h_m = np.array([], np.int64)
        if len(ik):
            change = np.r_[
                True,
                pc.not_equal(
                    ik.slice(1), ik.slice(0, len(ik) - 1)
                ).to_numpy(zero_copy_only=False),
            ]
            starts = np.flatnonzero(change)
            totals = np.add.reduceat(iv, starts)
            h_n, h_m = np.unique(totals, return_counts=True)
        pad = pa.array([""] * len(h_n), pa.string())
        return pa.table(
            {
                "kind": pa.array(
                    np.r_[np.zeros(len(e_n), np.int8), np.ones(len(h_n), np.int8)]
                ),
                "term": pa.concat_arrays([e_terms.cast(pa.string()), pad]),
                "n": pa.array(np.r_[e_n, h_n], pa.int64()),
                "m": pa.array(
                    np.r_[np.zeros(len(e_n), np.int64), h_m], pa.int64()
                ),
            }
        )

    parts = collect_arrow(
        sorted_parts.map_batches(hist_fold, batch_format="pyarrow"),
        schema=pa.schema(
            [
                ("kind", pa.int8()),
                ("term", pa.string()),
                ("n", pa.int64()),
                ("m", pa.int64()),
            ]
        ),
    )
    kind = parts.column("kind").to_numpy()
    # boundary patch: fold the straddling terms' partials to totals,
    # then merge into the histogram
    edge = parts.filter(pa.array(kind == 0))
    hist_n = parts.column("n").to_numpy()[kind == 1]
    hist_m = parts.column("m").to_numpy()[kind == 1]
    if edge.num_rows:
        et = (
            pa.table({"term": edge.column("term"), "n": edge.column("n")})
            .group_by("term")
            .aggregate([("n", "sum")])
        )
        b_n, b_m = np.unique(et.column("n_sum").to_numpy(), return_counts=True)
        hist_n = np.r_[hist_n, b_n]
        hist_m = np.r_[hist_m, b_m]
    hist = (
        pa.table(
            {"n": pa.array(hist_n, pa.int64()), "m": pa.array(hist_m, pa.int64())}
        )
        .group_by("n")
        .aggregate([("m", "sum")])
    )
    cnt = hist.column("n").to_numpy()
    m = hist.column("m_sum").to_numpy()
    order = np.argsort(-cnt, kind="stable")
    cnt, m = cnt[order], m[order]
    v = int(m.sum())
    g_end = np.cumsum(m)  # count-group rank runs: [g_start, g_end]
    g_start = g_end - m + 1
    oct_out, nt_out, tf_out, mr_out = [], [], [], []
    for o in range(max(v, 1).bit_length()):
        lo, hi = 1 << o, min((1 << (o + 1)) - 1, v)
        if lo > v:
            break
        ov = np.clip(np.minimum(g_end, hi) - np.maximum(g_start, lo) + 1, 0, None)
        oct_out.append(o)
        nt_out.append(hi - lo + 1)
        tf_out.append(int((cnt * ov).sum()))
        mr_out.append(lo)
    return pa.table(
        {
            "octave": pa.array(oct_out, pa.int32()),
            "n_terms": pa.array(nt_out, pa.int64()),
            "total_freq": pa.array(tf_out, pa.int64()),
            "min_rank": pa.array(mr_out, pa.int64()),
        }
    )


def docs_cms_counts(sf_dir: str, k: int = 16, width: int = 16_384, depth: int = 4):
    """Count-Min-sketched term frequencies probed at the certified exact
    top-k terms — the fixed-memory frequency path for open-web token
    streams where even a (term, n) pair table is too wide to exchange:
    each block folds into a depth×width counter grid (partial size is
    independent of block vocabulary), grids merge by elementwise sum.
    Probes come from the certified heavy-hitter sketch so n_exact is
    provably exact; n_cms ≥ n_exact always (CMS never undercounts) and
    the whole estimate — FNV-1a keys, splitmix64-derived second hash,
    double-hashed buckets, min-over-rows — is re-expressed bit-equal in
    HUGEINT SQL (same machinery as docs_fingerprint +
    events_approx_users)."""
    from .stages.sketch import cms_estimate, count_min, heavy_hitters

    ds = _pq(sf_dir, "documents", ["text"], blocks=8)

    def explode(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.utf8_lower(b.column("text")), " ")
        la = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        flat = la.flatten()
        return pa.table({"term": flat.filter(pc.not_equal(flat, ""))})

    terms = ds.map_batches(explode, batch_format="pyarrow")
    grid = count_min(terms, "term", _fnv64_strings, width=width, depth=depth)
    hh = heavy_hitters(terms, "term", k=k, capacity=256)
    if not hh["certified"]:
        raise RuntimeError(
            "heavy_hitters could not certify the exact top-k probe set — "
            "raise capacity"
        )
    probe_terms = hh["table"].column("item").combine_chunks()
    est = cms_estimate(grid, _fnv64_strings(probe_terms))
    return pa.table(
        {
            "term": probe_terms,
            "n_exact": hh["table"].column("n"),
            "n_cms": pa.array(est, pa.int64()),
        }
    ).sort_by("term")


# ---------------------------------------------------------------------------


def corpus_edge_density(sf_dir: str, edge_threshold: int = 128):
    """Per-image Sobel edge-density census over the image corpus — the
    texture/structure signal of the curation gate family
    (corpus_quality_flags covers exposure and blur; this covers
    flat/synthetic fills vs busy natural scenes). Decode actor pool
    (`stages/multimodal.SobelEdgeStats`, integer Sobel |Gx|+|Gy| on
    ITU-601 luma, pixels never leave the stage), narrow int64 output,
    sorted by image_id. Rows-only (needs pixel decode); pinned
    bit-exact to a whole-corpus numpy replay in tests."""
    from .stages.multimodal import SobelEdgeStats
    from .util import collect_arrow

    ds = corpus_parquet(columns=["image_id", "bytes", "fmt"])
    out = ds.map_batches(
        SobelEdgeStats,
        fn_constructor_kwargs={"edge_threshold": edge_threshold},
        concurrency=2,
        batch_size=64,
        batch_format="pyarrow",
    )
    return collect_arrow(out).sort_by("image_id")


def lineitem_zorder_layout(sf_dir: str, bits: int = 20, bucket_bits: int = 6):
    """Z-order (Morton) data-layout census — the space-filling-curve
    clustering a 100 TB table uses so ONE sort order serves min-max
    pruning on TWO filter columns at once (Delta/Iceberg OPTIMIZE
    ZORDER semantics): zkey interleaves the low ``bits`` bits of
    (l_partkey, l_suppkey); rows land in 2^``bucket_bits`` layout
    buckets by zkey prefix; per bucket the census reports count and
    min/max of BOTH dimensions — the pruning-effectiveness evidence
    (each bucket spans a bounded rectangle, not a stripe). Each key is
    normalized to EXACTLY ``bits`` significant bits from its actual
    domain (one cheap column-pruned max pass): narrow keys (bit_length
    < bits) left-shift up, wide keys (bit_length > bits, TPC-H SF ≳ 5
    for l_partkey) keep their TOP ``bits`` bits via right shift — so
    the interleave never overflows 2·bits and the census stays
    meaningful at every sf.
    Vectorized bit interleave per block + per-block Arrow group_by
    partials (map-side combine to ≤2^bucket_bits rows/block), tiny
    driver fold; bit math mirrored exactly in SQL
    (power(2,i)/power(4,i) are float-exact through 2^52).
    All-integer output."""
    from .util import collect_arrow

    ds = _pq(sf_dir, "lineitem", ["l_partkey", "l_suppkey"], blocks=16)
    mx = ds.max(["l_partkey", "l_suppkey"])
    bp = int(mx["max(l_partkey)"]).bit_length()
    bs = int(mx["max(l_suppkey)"]).bit_length()
    shift = np.uint64(max(2 * bits - bucket_bits, 0))

    def partial(b: pa.Table) -> pa.Table:
        # normalize each key to exactly ``bits`` bits so BOTH
        # dimensions' significant bits reach the bucket prefix: narrow
        # keys left-align up (unequal widths would otherwise leave the
        # narrow dimension unpruned), wide keys keep their top ``bits``
        # bits (a raw left shift by a negative amount would wrap/raise
        # in numpy and zero every bucket)
        p = b.column("l_partkey").to_numpy().astype(np.uint64)
        s = b.column("l_suppkey").to_numpy().astype(np.uint64)
        pz = (p << np.uint64(max(bits - bp, 0))) >> np.uint64(max(bp - bits, 0))
        sz = (s << np.uint64(max(bits - bs, 0))) >> np.uint64(max(bs - bits, 0))
        z = np.zeros(len(p), dtype=np.uint64)
        for i in range(bits):
            bit = np.uint64(i)
            z |= ((pz >> bit) & np.uint64(1)) << np.uint64(2 * i)
            z |= ((sz >> bit) & np.uint64(1)) << np.uint64(2 * i + 1)
        g = (
            pa.table(
                {
                    "bucket": pa.array((z >> shift).astype(np.int64)),
                    "p": pa.array(p.astype(np.int64)),
                    "s": pa.array(s.astype(np.int64)),
                }
            )
            .group_by("bucket")
            .aggregate(
                [("p", "count"), ("p", "min"), ("p", "max"),
                 ("s", "min"), ("s", "max")]
            )
        )
        return g

    parts = collect_arrow(ds.map_batches(partial, batch_format="pyarrow"))
    fold = parts.group_by("bucket").aggregate(
        [("p_count", "sum"), ("p_min", "min"), ("p_max", "max"),
         ("s_min", "min"), ("s_max", "max")]
    )
    return pa.table(
        {
            "bucket": fold.column("bucket"),
            "n": fold.column("p_count_sum"),
            "partkey_min": fold.column("p_min_min"),
            "partkey_max": fold.column("p_max_max"),
            "suppkey_min": fold.column("s_min_min"),
            "suppkey_max": fold.column("s_max_max"),
        }
    ).sort_by("bucket")


def events_key_skew(sf_dir: str, k: int = 20, parallelism: int = 32):
    """Hot-key skew diagnosis — the pre-shuffle audit a 100 TB pipeline
    runs before choosing a partitioning key (the engine's own frontier
    salting is the consumer of exactly this signal: a key holding p of
    the mass stalls a P-way exchange to max(1/P, p), so a hot key gets
    ceil(share·P) salts). Per-block Arrow group_by partials (map-side
    combine: only (key, n) rows leave a block), key-space-sized driver
    fold, top-k by (n desc, key asc). share_ppm and the recommended
    salt count are exact integer cross-multiplications — no float ever
    reaches the output."""
    from .util import collect_arrow

    ds = _pq(sf_dir, "events", ["user_id"], blocks=16)

    def partial(b: pa.Table) -> pa.Table:
        g = (
            pa.table({"user_id": b.column("user_id")})
            .group_by("user_id")
            .aggregate([("user_id", "count")])
        )
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "n": g.column("user_id_count").cast(pa.int64()),
            }
        )

    parts = collect_arrow(ds.map_batches(partial, batch_format="pyarrow"))
    fold = parts.group_by("user_id").aggregate([("n", "sum")])
    keys = fold.column("user_id").to_numpy(zero_copy_only=False)
    n = fold.column("n_sum").to_numpy()
    total = int(n.sum())
    order = np.lexsort((keys, -n))[:k]
    top_n = n[order].astype(np.int64)
    return pa.table(
        {
            "user_id": pa.array(keys[order].tolist()),
            "n": pa.array(top_n, pa.int64()),
            "share_ppm": pa.array(top_n * 1_000_000 // total, pa.int64()),
            "salt": pa.array(
                (top_n * parallelism + total - 1) // total, pa.int64()
            ),
        }
    )


QUERIES = {
    "supplier_excess_share": supplier_excess_share,
    "docs_zipf_census": docs_zipf_census,
    "docs_cms_counts": docs_cms_counts,
    "corpus_edge_density": corpus_edge_density,
    "lineitem_zorder_layout": lineitem_zorder_layout,
    "events_key_skew": events_key_skew,
    "docs_unigram_logprob": docs_unigram_logprob,
    "embeddings_kcenter": embeddings_kcenter,
    "docs_dup_source_matrix": docs_dup_source_matrix,
    "customer_fuzzy_groups": customer_fuzzy_groups,
    "corpus_caption_conflicts": corpus_caption_conflicts,
    "docs_heavy_hitters": docs_heavy_hitters,
    "corpus_mip_build": corpus_mip_build,
    "docs_lang_confusion": docs_lang_confusion,
    "docs_vocab_growth": docs_vocab_growth,
    "embeddings_ivf_recall": embeddings_ivf_recall,
    "events_point_in_time_join": events_point_in_time_join,
    "basket_transitivity": basket_transitivity,
    "corpus_equalize": corpus_equalize,
    "lineitem_benford": lineitem_benford,
    "corpus_curate": corpus_curate,
    "docs_dedup_spans": docs_dedup_spans,
    "events_cusum": events_cusum,
    "corpus_pair_ssim": corpus_pair_ssim,
    "lineitem_forecast_revenue": lineitem_forecast_revenue,
    "nation_year_profit": nation_year_profit,
    "orders_urgent_by_status": orders_urgent_by_status,
    "docs_kwic": docs_kwic,
    "corpus_grayworld_gains": corpus_grayworld_gains,
    "corpus_tile_phash_dups": corpus_tile_phash_dups,
    "docs_bm25_search": docs_bm25_search,
    "top_window_supplier": top_window_supplier,
    "part_supplier_census": part_supplier_census,
    "region_best_supplier": region_best_supplier,
    "nation_market_share": nation_market_share,
    "events_hourly_ohlc": events_hourly_ohlc,
    "events_linear_attribution": events_linear_attribution,
    "corpus_embed_knn": corpus_embed_knn,
    "nation_trade_matrix": nation_trade_matrix,
    "events_pattern_chain": events_pattern_chain,
    "orders_cohort_ltv": orders_cohort_ltv,
    "events_dau_wau": events_dau_wau,
    "events_session_conversion": events_session_conversion,
    "docs_prefix_dups": docs_prefix_dups,
    "docs_boolean_and": docs_boolean_and,
    "orders_priority_late": orders_priority_late,
    "events_cumulative_distinct": events_cumulative_distinct,
    "docs_proportional_split": docs_proportional_split,
    "orders_shipping_priority": orders_shipping_priority,
    "orders_large_qty": orders_large_qty,
    "orders_returned_customers": orders_returned_customers,
    "part_promo_share": part_promo_share,
    "lineitem_agg": lineitem_agg,
    "orders_topk": orders_topk,
    "docs_dedup_exact": docs_dedup_exact,
    "docs_dup_texts": docs_dup_texts,
    "events_hourly": events_hourly,
    "events_sessionize": events_sessionize,
    "events_hopping": events_hopping,
    "events_top3_per_user": events_top3_per_user,
    "events_props_extract": events_props_extract,
    "docs_split": docs_split,
    "events_anti_join": events_anti_join,
    "events_semi_join": events_semi_join,
    "revenue_by_part_type": revenue_by_part_type,
    "top_suppliers": top_suppliers,
    "customer_per_region": customer_per_region,
    "docs_token_stats": docs_token_stats,
    "lineitem_conditional": lineitem_conditional,
    "embeddings_knn": embeddings_knn,
    "embeddings_knn_classify": embeddings_knn_classify,
    "docs_ngram_jaccard": docs_ngram_jaccard,
    "embeddings_cosine_dups": embeddings_cosine_dups,
    "docs_langid": docs_langid,
    "docs_quality": docs_quality,
    "docs_fingerprint": docs_fingerprint,
    "docs_simhash": docs_simhash,
    "docs_simhash_dups": docs_simhash_dups,
    "docs_minhash_dups": docs_minhash_dups,
    "docs_minhash_groups": docs_minhash_groups,
    "embeddings_knn_ivf": embeddings_knn_ivf,
    "embeddings_kmeans": embeddings_kmeans,
    "events_asof_order": events_asof_order,
    "orders_price_band": orders_price_band,
    "events_running_total": events_running_total,
    "docs_stratified_sample": docs_stratified_sample,
    "lineitem_price_quantiles": lineitem_price_quantiles,
    "docs_tfidf_top_terms": docs_tfidf_top_terms,
    "events_users_per_type": events_users_per_type,
    "events_approx_users": events_approx_users,
    "crawl_visit_order": crawl_visit_order,
    "crawl_visit_order_weighted": crawl_visit_order_weighted,
    "crawl_audit_scores": crawl_audit_scores,
    "corpus_image_stats": corpus_image_stats,
    "corpus_phash_dups": corpus_phash_dups,
    "corpus_resize": corpus_resize,
    "corpus_keep_best_caption": corpus_keep_best_caption,
    "corpus_resolution_census": corpus_resolution_census,
    "corpus_caption_filter": corpus_caption_filter,
    "corpus_bytes_census": corpus_bytes_census,
    "corpus_phash_groups": corpus_phash_groups,
    "corpus_phash_knn": corpus_phash_knn,
    "corpus_dedup_incremental": corpus_dedup_incremental,
    "events_first_last_touch": events_first_last_touch,
    "lineitem_unpivot": lineitem_unpivot,
    "events_above_user_avg": events_above_user_avg,
    "docs_heavy_terms": docs_heavy_terms,
    "docs_dedup_incremental": docs_dedup_incremental,
    "docs_dedup_index_lifecycle": docs_dedup_index_lifecycle,
    "events_funnel": events_funnel,
    "customer_order_stats": customer_order_stats,
    "lineitem_rollup": lineitem_rollup,
    "events_pivot": events_pivot,
    "events_lead_lag": events_lead_lag,
    "docs_top_ngrams": docs_top_ngrams,
    "lineitem_bloom_semi": lineitem_bloom_semi,
    "nation_segments": nation_segments,
    "customer_set_flags": customer_set_flags,
    "orders_price_window": orders_price_window,
    "lineitem_corr": lineitem_corr,
    "docs_sample_per_source": docs_sample_per_source,
    "docs_mix_temperature": docs_mix_temperature,
    "docs_decontaminate": docs_decontaminate,
    "lineitem_price_quantile_sketch": lineitem_price_quantile_sketch,
    "orders_customer_full_join": orders_customer_full_join,
    "orders_priority_mode": orders_priority_mode,
    "docs_words": docs_words,
    "docs_postings": docs_postings,
    "docs_bpe_pairs": docs_bpe_pairs,
    "corpus_aspect_buckets": corpus_aspect_buckets,
    "events_moving_avg": events_moving_avg,
    "lineitem_price_quantiles_cont": lineitem_price_quantiles_cont,
    "orders_priority_share": orders_priority_share,
    "lineitem_cube": lineitem_cube,
    "docs_dedup_keep_best": docs_dedup_keep_best,
    "lineitem_iqr_outliers": lineitem_iqr_outliers,
    "docs_clean": docs_clean,
    "orders_global_rank": orders_global_rank,
    "crawl_pagerank": crawl_pagerank,
    "docs_term_pmi": docs_term_pmi,
    "orders_price_histogram": orders_price_histogram,
    "lineitem_mad": lineitem_mad,
    "lineitem_basket_triangles": lineitem_basket_triangles,
    "basket_bfs_depth": basket_bfs_depth,
    "basket_kcore": basket_kcore,
    "docs_token_offsets": docs_token_offsets,
    "events_user_entropy": events_user_entropy,
    "corpus_patch_grid": corpus_patch_grid,
    "corpus_channel_norm": corpus_channel_norm,
    "basket_rules": basket_rules,
    "corpus_crop_plan": corpus_crop_plan,
    "corpus_augment": corpus_augment,
    "corpus_luma_histogram": corpus_luma_histogram,
    "events_trailing_hour_sum": events_trailing_hour_sum,
    "events_active_time": events_active_time,
    "events_engagement_gini": events_engagement_gini,
    "events_late_census": events_late_census,
    "lineitem_disjunctive_join": lineitem_disjunctive_join,
    "lineitem_profile": lineitem_profile,
    "customer_order_histogram": customer_order_histogram,
    "customer_above_avg_idle": customer_above_avg_idle,
    "events_flipflop": events_flipflop,
    "events_scd2": events_scd2,
    "supplier_blame": supplier_blame,
    "orders_ks_drift": orders_ks_drift,
    "docs_dup_span_census": docs_dup_span_census,
    "corpus_palette": corpus_palette,
    "part_value_concentration": part_value_concentration,
    "events_gap_stats": events_gap_stats,
    "orders_monthly_growth": orders_monthly_growth,
    "events_hourly_anomaly": events_hourly_anomaly,
    "lineitem_bootstrap_se": lineitem_bootstrap_se,
    "customer_rfm": customer_rfm,
    "crawl_hits": crawl_hits,
    "corpus_negative_samples": corpus_negative_samples,
    "corpus_channel_covariance": corpus_channel_covariance,
    "crawl_snapshot": crawl_snapshot,
    "events_type_overlap": events_type_overlap,
    "events_type_overlap_kmv": events_type_overlap_kmv,
    "events_ab_test": events_ab_test,
    "events_max_value_rows": events_max_value_rows,
    "crawl_wave_phases": crawl_wave_phases,
    "embeddings_quantize": embeddings_quantize,
    "docs_curate": docs_curate,
    "docs_dup_cluster_sizes": docs_dup_cluster_sizes,
    "embeddings_pca_top": embeddings_pca_top,
    "corpus_quality_flags": corpus_quality_flags,
    "events_markov_stationary": events_markov_stationary,
    "orders_chi2": orders_chi2,
    "orders_mutual_info": orders_mutual_info,
    "orders_time_decay": orders_time_decay,
    "supplier_part_coverage": supplier_part_coverage,
    "corpus_mip_levels": corpus_mip_levels,
    "orders_ntile": orders_ntile,
    "orders_pareto": orders_pareto,
    "events_transitions": events_transitions,
    "events_retention": events_retention,
    "events_weekly_active": events_weekly_active,
    "lineitem_weighted_median": lineitem_weighted_median,
    "events_minute_gapfill": events_minute_gapfill,
    "embeddings_knn_pq": embeddings_knn_pq,
    "docs_source_digest": docs_source_digest,
    "events_debounce": events_debounce,
    "docs_repetition": docs_repetition,
    "docs_pack_sequences": docs_pack_sequences,
    "revenue_by_nation": revenue_by_nation,
    "lineitem_zscore": lineitem_zscore,
    "embeddings_label_centroids": embeddings_label_centroids,
    "events_asof_order_forward": events_asof_order_forward,
    "events_asof_order_nearest": events_asof_order_nearest,
    "lineitem_regression": lineitem_regression,
    "events_auc": events_auc,
    "corpus_resize_buckets": corpus_resize_buckets,
    "corpus_letterbox": corpus_letterbox,
    "customer_fuzzy_pairs": customer_fuzzy_pairs,
    "events_value_percentile": events_value_percentile,
    "lineitem_small_qty_revenue": lineitem_small_qty_revenue,
    "docs_chunk_text": docs_chunk_text,
    "lineitem_winsorized": lineitem_winsorized,
    "events_session_paths": events_session_paths,
    "events_max_concurrency": events_max_concurrency,
    "embeddings_reciprocal_nn": embeddings_reciprocal_nn,
    "docs_weighted_sample": docs_weighted_sample,
}

ORACLE_SQL = {
    "lineitem_forecast_revenue": """
        SELECT sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                   * CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))::DOUBLE
                 / 10000.0 AS forecast_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) BETWEEN 4 AND 6
          AND l_quantity < 24
    """,
    "nation_year_profit": """
        SELECT n_name AS nation,
               CAST(year(l_shipdate) AS BIGINT) AS o_year,
               sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                     * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))
                   - CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT)
                     * CAST(floor(l_quantity + 0.5) AS BIGINT) * 100)::DOUBLE
                 / 10000.0 AS profit
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
        ORDER BY nation, o_year
    """,
    "orders_urgent_by_status": """
        SELECT l_linestatus,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END)::BIGINT AS low_line_count
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    "lineitem_agg": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))::DOUBLE / 100.0
                 AS sum_base_price,
               avg(l_quantity) AS avg_qty,
               count(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "orders_topk": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    "docs_dedup_exact": """
        SELECT doc_id, text FROM (
          SELECT doc_id, text,
                 row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
          FROM documents) t
        WHERE rn = 1
    """,
    "docs_dup_texts": """
        SELECT lower(array_to_string(
                 (regexp_split_to_array(trim(text), '\\s+'))[1:2], ' ')) AS text_key,
               count(*) AS n
        FROM documents GROUP BY 1 HAVING count(*) > 1
    """,
    "events_hourly": """
        SELECT user_id, date_trunc('hour', ts) AS hour,
               count(*) AS n,
               sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))::DOUBLE / 100.0 AS sum_value
        FROM events GROUP BY user_id, date_trunc('hour', ts)
    """,
    "events_sessionize": """
        WITH gaps AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sess AS (
          SELECT user_id, ts,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_id
          FROM gaps
        )
        SELECT user_id, session_id::BIGINT AS session_id, count(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM sess GROUP BY user_id, session_id
    """,
    "events_hopping": """
        WITH w AS (
          SELECT time_bucket(INTERVAL '30 minutes', ts) AS b, value FROM events
        ), e AS (
          SELECT b AS w_start, value FROM w
          UNION ALL
          SELECT b - INTERVAL '30 minutes' AS w_start, value FROM w
        )
        SELECT w_start, count(*) AS n,
               sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))::DOUBLE / 100.0 AS sum_value
        FROM e GROUP BY w_start
    """,
    "events_top3_per_user": """
        SELECT user_id, event_id, value, rk FROM (
          SELECT user_id, event_id, value,
                 row_number() OVER (
                   PARTITION BY user_id ORDER BY value DESC, event_id
                 ) AS rk
          FROM events) t
        WHERE rk <= 3
    """,
    # FNV-1a over the id's 8 little-endian bytes, HUGEINT mod-2^64 —
    # bit-identical to the vectorized numpy chain in docs_split
    "docs_split": """
        SELECT doc_id,
               CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split
        FROM (
          SELECT doc_id,
                 list_reduce(
                   list_prepend(14695981039346656037::HUGEINT,
                     list_transform(range(0, 8), k ->
                       (doc_id::HUGEINT // CAST(power(2, 8*k) AS HUGEINT)) % 256)),
                   (acc, b) -> (xor(acc::HUGEINT, b::HUGEINT)
                                * 1099511628211::HUGEINT)
                               % 18446744073709551616::HUGEINT
                 ) % 10 AS b
          FROM documents) t
    """,
    "events_props_extract": """
        SELECT json_extract(props, '$.k')::BIGINT AS k,
               count(*) AS n,
               sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))::DOUBLE / 100.0 AS sum_value
        FROM events GROUP BY 1
    """,
    "events_anti_join": """
        SELECT e.event_id, e.user_id FROM events e
        WHERE NOT EXISTS (
          SELECT 1 FROM customer c
          WHERE c.c_custkey = e.user_id AND c.c_mktsegment = 'BUILDING')
    """,
    "events_semi_join": """
        SELECT e.event_id, e.user_id FROM events e
        WHERE e.user_id IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
    """,
    "revenue_by_part_type": """
        SELECT p.p_type,
               sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0 + 0.5)
                        AS BIGINT))::DOUBLE / 100.0 AS revenue,
               count(*) AS n_items
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_type
    """,
    "top_suppliers": """
        SELECT s.s_name,
               sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0 + 0.5)
                        AS BIGINT))::DOUBLE / 100.0 AS revenue
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY s.s_name
        ORDER BY revenue DESC, s.s_name LIMIT 10
    """,
    "customer_per_region": """
        SELECT r.r_name AS region, count(*) AS customers
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
    "docs_token_stats": """
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END::BIGINT AS n_tokens,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+'))::BIGINT
                 AS n_tokens_bpe,
               length(text)::BIGINT AS n_chars_calc,
               (length(text) - length(replace(text, '.', '')))::BIGINT AS n_periods,
               length(regexp_replace(text, '[^0-9]', '', 'g'))::BIGINT AS n_digits
        FROM documents
    """,
    "lineitem_conditional": """
        SELECT count(*)::BIGINT AS n_rows,
               sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT AS n_returned,
               sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)::BIGINT AS n_discounted,
               sum(CASE WHEN l_quantity > 45.0 THEN 1 ELSE 0 END)::BIGINT AS n_heavy
        FROM lineitem
    """,
    "embeddings_knn": """
        SELECT qid AS query_id, vec_id AS neighbor_id, rnk AS neighbor_rank FROM (
          SELECT q.qid, e.vec_id,
                 row_number() OVER (
                   PARTITION BY q.qid
                   ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC, e.vec_id
                 ) AS rnk
          FROM (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5) q
          CROSS JOIN embeddings e) t
        WHERE rnk <= 5
    """,
    "docs_ngram_jaccard": """
        WITH d AS (
          SELECT doc_id,
                 list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS toks
          FROM documents WHERE trim(text) <> ''
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM d a JOIN d b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
              / len(list_distinct(a.toks || b.toks)) >= 0.9
    """,
    "docs_langid": """
        WITH w AS (
          SELECT doc_id, text, length(text) AS n_chars,
                 length(regexp_replace(text, '[^\\x{4E00}-\\x{9FFF}]', '', 'g')) AS n_cjk,
                 list_transform(regexp_extract_all(text, '[a-zA-ZÀ-ÿ]+'), x -> lower(x)) AS words
          FROM documents
        ), h AS (
          SELECT doc_id, n_chars, n_cjk, len(words) AS n_words,
                 len(list_filter(words, x -> list_contains(['the','and','of','to','in','is','that','it','for','with','was','on'], x))) AS h_en,
                 len(list_filter(words, x -> list_contains(['el','la','de','que','y','los','las','en','un','una','por','con'], x))) AS h_es,
                 len(list_filter(words, x -> list_contains(['der','die','das','und','ist','nicht','ein','eine','mit','für','auf'], x))) AS h_de,
                 len(list_filter(words, x -> list_contains(['le','la','les','de','des','et','est','un','une','dans','pour','que'], x))) AS h_fr
          FROM w
        )
        SELECT doc_id,
               CASE
                 WHEN n_chars = 0 THEN 'unknown'
                 WHEN n_cjk > 0 AND n_cjk >= 0.05 * n_chars THEN 'zh'
                 WHEN n_words = 0 THEN 'unknown'
                 WHEN greatest(h_en, h_es, h_de, h_fr) = 0 THEN 'unknown'
                 WHEN h_en >= h_es AND h_en >= h_de AND h_en >= h_fr THEN 'en'
                 WHEN h_es >= h_de AND h_es >= h_fr THEN 'es'
                 WHEN h_de >= h_fr THEN 'de'
                 ELSE 'fr'
               END AS lang_pred
        FROM h
    """,
    "docs_quality": """
        WITH f AS (
          SELECT doc_id,
                 length(text) AS n_chars,
                 CASE WHEN trim(text)='' THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END::BIGINT AS n_tokens,
                 length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace,
                 length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
                 length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS n_punct,
                 list_transform(regexp_extract_all(text, '[a-zA-ZÀ-ÿ]+'), w -> lower(w)) AS words
          FROM documents
        ), g AS (
          SELECT doc_id, n_chars, n_tokens,
                 CASE WHEN n_tokens=0 THEN 0.0 ELSE n_nonspace::DOUBLE / n_tokens END AS mean_token_len,
                 CASE WHEN n_chars=0 THEN 0.0 ELSE n_digits::DOUBLE / n_chars END AS digit_ratio,
                 CASE WHEN n_chars=0 THEN 0.0 ELSE n_punct::DOUBLE / n_chars END AS punct_ratio,
                 CASE WHEN len(words)=0 THEN 0.0
                      ELSE len(list_filter(words, w -> list_contains(
                             ['the','and','of','to','in','is','that','it','for','with','was','on'], w)))::DOUBLE
                           / len(words) END AS stopword_ratio
          FROM f
        )
        SELECT doc_id, n_tokens, mean_token_len, digit_ratio, punct_ratio, stopword_ratio,
               greatest(0.0,
                 1.0
                 - CASE WHEN n_chars < 50 THEN 0.5 ELSE 0.0 END
                 - CASE WHEN n_tokens > 0 AND NOT (mean_token_len BETWEEN 3.0 AND 12.0) THEN 0.2 ELSE 0.0 END
                 - CASE WHEN n_chars > 0 AND digit_ratio > 0.2 THEN 0.2 ELSE 0.0 END
                 - CASE WHEN n_chars > 0 AND punct_ratio > 0.2 THEN 0.1 ELSE 0.0 END
               ) AS quality_score
        FROM g
    """,
    # MinHash+LSH pairs vs the brute-force exact shingle-Jaccard cross
    # join (same 5-token-window FNV shingles as functions.text.shingles).
    # Equality holds as long as LSH recall is total at the threshold —
    # verified on this corpus (every true pair has j ≥ 0.857, band miss
    # probability < 1e-6); same caveat pattern as embeddings_cosine_dups.
    "docs_minhash_dups": """
        WITH toks AS (
          SELECT doc_id,
                 list_transform(regexp_extract_all(coalesce(text, ''), '\\S+'),
                                t -> lower(t)) AS tk
          FROM documents
        ), th AS (
          SELECT doc_id,
                 list_transform(tk, tok ->
                   list_reduce(
                     list_prepend(14695981039346656037::HUGEINT,
                       list_transform(range(1, length(tok)+1), i -> ascii(tok[i]))),
                     (acc, b) -> (xor(acc::HUGEINT, b::HUGEINT)
                                  * 1099511628211::HUGEINT)
                                 % 18446744073709551616::HUGEINT)) AS hs
          FROM toks
        ), sh AS (
          SELECT doc_id,
                 CASE
                   WHEN len(hs) = 0 THEN []::HUGEINT[]
                   WHEN len(hs) < 5 THEN [list_reduce(
                       list_prepend(14695981039346656037::HUGEINT, hs),
                       (acc, h) -> (xor(acc::HUGEINT, h::HUGEINT)
                                    * 1099511628211::HUGEINT)
                                   % 18446744073709551616::HUGEINT)]
                   ELSE list_distinct(list_transform(range(1, len(hs) - 3), i ->
                     list_reduce(
                       list_prepend(14695981039346656037::HUGEINT, hs[i:i+4]),
                       (acc, h) -> (xor(acc::HUGEINT, h::HUGEINT)
                                    * 1099511628211::HUGEINT)
                                   % 18446744073709551616::HUGEINT)))
                 END AS sset
          FROM th
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.sset, b.sset))::DOUBLE
                 / len(list_distinct(a.sset || b.sset)) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_distinct(a.sset || b.sset)) > 0
          AND len(list_intersect(a.sset, b.sset))::DOUBLE
              / len(list_distinct(a.sset || b.sset)) >= 0.5
    """,
    # fingerprint64 = FNV-1a chain over FNV-1a token hashes — expressible
    # exactly in SQL over the ASCII corpus with HUGEINT mod-2^64 math
    "docs_fingerprint": """
        WITH th AS (
          SELECT doc_id,
                 list_transform(regexp_extract_all(coalesce(text, ''), '\\S+'), tok ->
                   list_reduce(
                     list_prepend(14695981039346656037::HUGEINT,
                       list_transform(range(1, length(tok)+1), i -> ascii(tok[i]))),
                     (acc, b) -> (xor(acc::HUGEINT, b::HUGEINT)
                                  * 1099511628211::HUGEINT)
                                 % 18446744073709551616::HUGEINT)) AS hs
          FROM documents
        ), fp AS (
          SELECT doc_id,
                 list_reduce(
                   list_prepend(14695981039346656037::HUGEINT, hs),
                   (acc, h) -> (xor(acc::HUGEINT, h::HUGEINT)
                                * 1099511628211::HUGEINT)
                               % 18446744073709551616::HUGEINT) AS h
          FROM th
        )
        SELECT doc_id,
               CASE WHEN h >= 9223372036854775808::HUGEINT
                    THEN (h - 18446744073709551616::HUGEINT)::BIGINT
                    ELSE h::BIGINT END AS fingerprint
        FROM fp
    """,
    # simhash64 = per-bit majority vote over FNV-1a hashes of lowercased
    # tokens (Charikar) — unnest tokens × 64 bit positions, sum votes
    "docs_simhash": """
        WITH th AS (
          SELECT doc_id,
                 list_transform(regexp_extract_all(coalesce(text, ''), '\\S+'), tok ->
                   list_reduce(
                     list_prepend(14695981039346656037::HUGEINT,
                       list_transform(range(1, length(tok)+1), i -> ascii(lower(tok)[i]))),
                     (acc, b) -> (xor(acc::HUGEINT, b::HUGEINT)
                                  * 1099511628211::HUGEINT)
                                 % 18446744073709551616::HUGEINT)) AS hs
          FROM documents
        ), votes AS (
          SELECT t.doc_id, bits.bit,
                 sum(CASE WHEN (u.h // CAST(power(2, bits.bit) AS HUGEINT)) % 2 = 1
                          THEN 1 ELSE -1 END) AS s
          FROM th t, unnest(t.hs) AS u(h), (SELECT unnest(range(64)) AS bit) bits
          GROUP BY t.doc_id, bits.bit
        ), sig AS (
          SELECT doc_id,
                 sum(CASE WHEN s > 0 THEN CAST(power(2, bit) AS HUGEINT)
                          ELSE 0::HUGEINT END) AS h
          FROM votes GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(
                 CASE WHEN s.h >= 9223372036854775808::HUGEINT
                      THEN (s.h - 18446744073709551616::HUGEINT)::BIGINT
                      ELSE s.h::BIGINT END, 0) AS simhash
        FROM documents d LEFT JOIN sig s ON d.doc_id = s.doc_id
    """,
    "embeddings_cosine_dups": """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a CROSS JOIN embeddings b
        WHERE a.vec_id < b.vec_id
          AND list_cosine_similarity(a.embedding, b.embedding) >= 0.95
    """,
    # backward as-of join; DESC/DESC LIMIT 1 mirrors the engine's
    # (right_ts, o_orderkey) ascending-sort searchsorted tie-break
    "events_asof_order": """
        SELECT e.user_id, e.ts, e.event_id, o.o_orderkey, o.o_totalprice
        FROM events e LEFT JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders o
          WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
          ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
        ) o ON TRUE
    """,
    "orders_price_band": """
        WITH bands(band, lo, hi) AS (VALUES
          ('b1_lt50k',        0.0,    50000.0),
          ('b2_50_100k',  50000.0,   100000.0),
          ('b3_100_200k', 100000.0,  200000.0),
          ('b4_200_300k', 200000.0,  300000.0),
          ('b5_ge300k',   300000.0, 1000000.0))
        SELECT b.band, count(*) AS n_orders,
               sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))::DOUBLE / 100.0
                 AS total_price
        FROM orders o JOIN bands b
          ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
        GROUP BY b.band ORDER BY b.band
    """,
    "events_running_total": """
        SELECT user_id, event_id, ts,
               CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100.0
                 AS running_value
        FROM events
    """,
    "docs_stratified_sample": """
        SELECT doc_id, lang, n_chars FROM documents
        WHERE ((doc_id * 2654435761) % 4294967296) % 5 = 0
    """,
    "events_users_per_type": """
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    # rank by tf/df (IEEE double division — bit-identical both sides);
    # only integer columns are emitted
    "docs_tfidf_top_terms": """
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
          FROM documents WHERE trim(text) <> ''
        ), tf AS (
          SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
        ), df AS (
          SELECT term, count(*) AS df FROM tf GROUP BY term
        ), ranked AS (
          SELECT t.doc_id, t.term, t.tf, d.df,
                 row_number() OVER (
                   PARTITION BY t.doc_id
                   ORDER BY CAST(t.tf AS DOUBLE) / CAST(d.df AS DOUBLE) DESC,
                            t.term ASC) AS rk
          FROM tf t JOIN df d ON t.term = d.term
        )
        SELECT doc_id, term, tf, df, rk FROM ranked WHERE rk <= 3
    """,
    "lineitem_price_quantiles": """
        SELECT l_returnflag,
               quantile_disc(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT), 0.25)::DOUBLE / 100.0 AS q25,
               quantile_disc(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT), 0.50)::DOUBLE / 100.0 AS q50,
               quantile_disc(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT), 0.75)::DOUBLE / 100.0 AS q75,
               quantile_disc(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT), 0.95)::DOUBLE / 100.0 AS q95
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
}

# --- derived oracles (composed from entries above) ----------------------

# brute-force Hamming pairs over the exact HUGEINT SimHash signatures;
# valid as an oracle for the banded pipeline because hamming_threshold
# (3) < bands (4) guarantees total LSH recall (pigeonhole)
ORACLE_SQL["docs_simhash_dups"] = (
    "WITH sig0 AS (" + ORACLE_SQL["docs_simhash"] + ")\n"
    "SELECT a.doc_id AS id_a, b.doc_id AS id_b,\n"
    "       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming\n"
    "FROM sig0 a JOIN sig0 b ON a.doc_id < b.doc_id\n"
    "WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"
)

# transitive closure (recursive CTE) over the brute-force pair set ==
# connected components; rep = min id of the component, exactly the
# min-label-propagation invariant of connected_components_distributed
ORACLE_SQL["docs_minhash_groups"] = (
    # MATERIALIZED is load-bearing: without it DuckDB inlines the
    # brute-force pair query into every recursion step (~3× runtime)
    "WITH RECURSIVE pairs AS MATERIALIZED (" + ORACLE_SQL["docs_minhash_dups"] + "),\n"
    "edges AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs\n"
    "          UNION ALL SELECT id_b, id_a FROM pairs),\n"
    "reach(id, r) AS (\n"
    "  SELECT a, b FROM edges\n"
    "  UNION\n"
    "  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a\n"
    ")\n"
    "SELECT id, least(id, min(r)) AS rep FROM reach GROUP BY id"
)

# cluster-size census = the same transitive closure, aggregated twice
ORACLE_SQL["docs_dup_cluster_sizes"] = (
    "WITH g AS ("
    + ORACLE_SQL["docs_minhash_groups"]
    + """)
    SELECT cluster_size, count(*)::BIGINT AS n_clusters
    FROM (SELECT rep, count(*)::BIGINT AS cluster_size FROM g GROUP BY rep)
    GROUP BY cluster_size ORDER BY cluster_size
"""
)

# --- corpus-backed oracles (read_parquet over the deterministic corpus
# cache — __ray_entry__.oracle_sql() materializes it before returning
# these, so the files exist whichever side the driver runs first) -------

_CORPUS_GLOB = os.path.join(
    _CACHE_ROOT,
    f"corpus_n{CORPUS_N}_d{_CORPUS_DIMS[0]}_{_CORPUS_DIMS[1]}_v{datagen.GEN_VERSION}",
    "part-*.parquet",
)

# brute-force Hamming pair join over the stored phash column; exact for
# the banded pipeline because hamming_threshold (4) < bands (8) gives
# total LSH recall (pigeonhole — see stages/dedup.phash_pairs)
ORACLE_SQL["corpus_phash_dups"] = f"""
    WITH c AS (SELECT image_id, phash FROM read_parquet('{_CORPUS_GLOB}'))
    SELECT a.image_id AS id_a, b.image_id AS id_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
    FROM c a JOIN c b ON a.image_id < b.image_id
    WHERE bit_count(xor(a.phash, b.phash)) <= 4
"""

# deterministic negative sampling: same FNV chain, draw from [0, N-1)
# then shift past the anchor (exact uniform over corpus minus self)
ORACLE_SQL["corpus_negative_samples"] = f"""
    WITH c AS (
      SELECT CAST(substr(image_id, 4) AS BIGINT) AS i
      FROM read_parquet('{_CORPUS_GLOB}')
    ), r AS (SELECT unnest(range(0, {_NEG_K})) AS j),
    h AS (
      SELECT c.i, r.j,
             list_reduce(
               list_prepend(14695981039346656037::HUGEINT,
                 list_transform(range(0, 8), k ->
                   ((c.i * {_NEG_K} + r.j)::HUGEINT
                    // CAST(power(2, 8*k) AS HUGEINT)) % 256)),
               (acc, byte) -> (xor(acc::HUGEINT, byte::HUGEINT)
                               * 1099511628211::HUGEINT)
                              % 18446744073709551616::HUGEINT
             ) % {CORPUS_N - 1} AS hv
      FROM c, r
    )
    SELECT printf('img%08d', i) AS image_id, j AS slot,
           printf('img%08d',
                  CAST(CASE WHEN hv >= i THEN hv + 1 ELSE hv END AS BIGINT))
             AS neg_image_id
    FROM h
"""

# column profiler: one row per profiled column; numeric min/max as
# DOUBLE, categorical min/max lexicographic, exact COUNT(DISTINCT)
ORACLE_SQL["lineitem_profile"] = """
    SELECT 'l_quantity' AS col, count(*) AS n_rows,
           count(*) - count(l_quantity) AS n_null,
           count(DISTINCT l_quantity) AS n_distinct,
           CAST(min(l_quantity) AS DOUBLE) AS min_num,
           CAST(max(l_quantity) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
           count(DISTINCT l_extendedprice),
           min(l_extendedprice), max(l_extendedprice), NULL, NULL
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', count(*), count(*) - count(l_discount),
           count(DISTINCT l_discount),
           min(l_discount), max(l_discount), NULL, NULL
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
           count(DISTINCT l_returnflag),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           min(l_returnflag), max(l_returnflag)
    FROM lineitem
    UNION ALL
    SELECT 'l_linestatus', count(*), count(*) - count(l_linestatus),
           count(DISTINCT l_linestatus),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           min(l_linestatus), max(l_linestatus)
    FROM lineitem
"""

# Q19-shaped disjunctive bracket join — the CASE resolves each part to
# its (unique, brands disjoint) bracket; the WHERE re-applies each
# bracket's quantity range, i.e. the OR-of-ANDs across both join sides
ORACLE_SQL["lineitem_disjunctive_join"] = """
    WITH p AS (
      SELECT p_partkey,
             CASE WHEN p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  THEN 1
                  WHEN p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 THEN 2
                  WHEN p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15 THEN 3
             END AS bracket
      FROM part
    )
    SELECT CAST(bracket AS BIGINT) AS bracket,
           count(*) AS n,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                    AS BIGINT))::DOUBLE / 100.0 AS revenue
    FROM lineitem l JOIN p ON l.l_partkey = p.p_partkey
    WHERE (bracket = 1 AND l_quantity BETWEEN 1 AND 11)
       OR (bracket = 2 AND l_quantity BETWEEN 10 AND 20)
       OR (bracket = 3 AND l_quantity BETWEEN 20 AND 30)
    GROUP BY bracket
"""

# Q13: left-outer count distribution — the 0 bucket comes from customers
# whose every order the JOIN predicate filters out
ORACLE_SQL["customer_order_histogram"] = """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
"""

# Q22: global positive-balance average (exact cents, one division) gating
# a date-filtered NOT EXISTS, per-nation rollup
ORACLE_SQL["customer_above_avg_idle"] = f"""
    WITH avgv AS (
      SELECT sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT))::DOUBLE
               / 100.0 / count(*) AS a
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey, count(*) AS numcust,
           sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT))::DOUBLE / 100.0
             AS totacctbal
    FROM customer c, avgv
    WHERE c.c_acctbal > avgv.a
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= DATE '{_IDLE_CUTOFF}'
      )
    GROUP BY c_nationkey
"""

# lag-based change detection: count of event-type flips per user in
# (ts, event_id) order
ORACLE_SQL["events_flipflop"] = """
    SELECT user_id, count(*) AS n_events,
           count(*) FILTER (
             WHERE prev IS NOT NULL AND prev <> event_type
           ) AS n_changes
    FROM (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    )
    GROUP BY user_id
"""

# int8 symmetric quantization in long form: exact float32→double casts,
# identical op order (x/scale*127, floor(+0.5)), zero-vector guard
ORACLE_SQL["embeddings_quantize"] = """
    WITH x AS (
      SELECT vec_id,
             list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v
      FROM embeddings
    ), s AS (
      SELECT vec_id, v,
             list_max(list_transform(v, e -> abs(e))) AS scale
      FROM x
    )
    SELECT vec_id, i - 1 AS pos,
           CAST(CASE WHEN scale = 0 THEN 0
                     ELSE floor(v[i] / scale * 127.0 + 0.5) END AS BIGINT) AS q,
           scale
    FROM (SELECT vec_id, v, scale,
                 unnest(generate_series(1, len(v))) AS i
          FROM s)
"""

# the whole curation pipeline as chained CTEs: exact dedup keepers,
# quality gate, token band, FNV split — the composition is hash-checked
ORACLE_SQL["docs_curate"] = f"""
    WITH keepers AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
    ), f AS (
      SELECT doc_id,
             length(text) AS n_chars,
             CASE WHEN trim(text)='' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+'))
             END::BIGINT AS n_tokens,
             length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
             length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS n_punct
      FROM documents
    ), g AS (
      SELECT doc_id, n_tokens,
             greatest(0.0,
               1.0
               - CASE WHEN n_chars < 50 THEN 0.5 ELSE 0.0 END
               - CASE WHEN n_tokens > 0 AND NOT
                      ((CASE WHEN n_tokens = 0 THEN 0.0
                             ELSE n_nonspace::DOUBLE / n_tokens END)
                       BETWEEN 3.0 AND 12.0) THEN 0.2 ELSE 0.0 END
               - CASE WHEN n_chars > 0 AND n_digits::DOUBLE / n_chars > 0.2
                      THEN 0.2 ELSE 0.0 END
               - CASE WHEN n_chars > 0 AND n_punct::DOUBLE / n_chars > 0.2
                      THEN 0.1 ELSE 0.0 END
             ) AS quality_score
      FROM f
    ), kept AS (
      SELECT g.doc_id, g.n_tokens, g.quality_score
      FROM g JOIN keepers USING (doc_id)
      WHERE g.quality_score >= 0.75
        AND g.n_tokens BETWEEN {_CURATE_MIN_TOK} AND {_CURATE_MAX_TOK}
    )
    SELECT doc_id, n_tokens, quality_score,
           CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test'
           END AS split
    FROM (
      SELECT *, list_reduce(
               list_prepend(14695981039346656037::HUGEINT,
                 list_transform(range(0, 8), k ->
                   (doc_id::HUGEINT // CAST(power(2, 8*k) AS HUGEINT)) % 256)),
               (acc, byte) -> (xor(acc::HUGEINT, byte::HUGEINT)
                               * 1099511628211::HUGEINT)
                              % 18446744073709551616::HUGEINT
             ) % 10 AS b
      FROM kept)
"""

# grouped max-semi-join: all rows at their group's max (ties survive)
ORACLE_SQL["events_max_value_rows"] = """
    SELECT e.user_id, e.event_id, e.value
    FROM events e
    JOIN (SELECT user_id, max(value) AS mx FROM events GROUP BY user_id) m
      ON e.user_id = m.user_id AND e.value = m.mx
"""

# Poisson bootstrap: same FNV-1a HUGEINT chain as docs_split, replicate
# weight = #CDF cutoffs ≤ hash, one weighted mean per replicate
ORACLE_SQL["lineitem_bootstrap_se"] = f"""
    WITH r AS (SELECT unnest(range(0, {_BOOT_B})) AS b),
    x AS (
      SELECT l_orderkey * 16 + l_linenumber AS rid,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM lineitem
    ), h AS (
      SELECT r.b, x.cents,
             list_reduce(
               list_prepend(14695981039346656037::HUGEINT,
                 list_transform(range(0, 8), k ->
                   ((x.rid * {_BOOT_B} + r.b)::HUGEINT
                    // CAST(power(2, 8*k) AS HUGEINT)) % 256)),
               (acc, byte) -> (xor(acc::HUGEINT, byte::HUGEINT)
                               * 1099511628211::HUGEINT)
                              % 18446744073709551616::HUGEINT
             ) AS hv
      FROM x, r
    ), w AS (
      SELECT b, cents,
             {" + ".join(f"(CASE WHEN hv >= {t}::HUGEINT THEN 1 ELSE 0 END)" for t in _BOOT_T)}
               AS w
      FROM h
    )
    SELECT b AS replicate, CAST(sum(w) AS BIGINT) AS n_eff,
           CAST(sum(w * cents) AS DOUBLE) / sum(w) / 100.0 AS mean_revenue
    FROM w GROUP BY b
"""

# RFM: three ntile(4) windows with (metric, custkey) tie-breaks over
# the per-customer aggregate
ORACLE_SQL["customer_rfm"] = """
    WITH c AS (
      SELECT o_custkey AS custkey, count(*) AS f,
             sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS m,
             max(o_orderdate) AS rdate
      FROM orders GROUP BY 1
    ), q AS (
      SELECT custkey,
             ntile(4) OVER (ORDER BY rdate, custkey) AS r_q,
             ntile(4) OVER (ORDER BY f, custkey) AS f_q,
             ntile(4) OVER (ORDER BY m, custkey) AS m_q
      FROM c
    )
    SELECT custkey, r_q, f_q, m_q, r_q * 100 + f_q * 10 + m_q AS rfm
    FROM q
"""

# Q11: per-part value share gated on a global total via integer
# cross-multiplication (no float compare)
ORACLE_SQL["part_value_concentration"] = """
    WITH p AS (
      SELECT l_partkey,
             sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS cents
      FROM lineitem GROUP BY l_partkey
    ), t AS (SELECT sum(cents) AS total, count(*) AS np FROM p)
    SELECT l_partkey, CAST(cents AS DOUBLE) / 100.0 AS value
    FROM p, t
    WHERE cents * np * 10 > total * 12
"""

# per-user inter-arrival gaps in (ts, event_id) order; single-event
# users emit NULL gap stats
ORACLE_SQL["events_gap_stats"] = """
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS d
      FROM events
    )
    SELECT user_id, count(d) AS n_gaps,
           min(d) / 1000000.0 AS min_gap_s,
           max(d) / 1000000.0 AS max_gap_s,
           sum(d) / count(d) / 1000000.0 AS mean_gap_s
    FROM g GROUP BY user_id
"""

# month-over-month growth: exact-cents month totals, LAG ratio
ORACLE_SQL["orders_monthly_growth"] = """
    WITH m AS (
      SELECT strftime(o_orderdate, '%Y-%m-01') AS month,
             sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    )
    SELECT month,
           CAST(cents AS DOUBLE) / 100.0 AS revenue,
           CAST(cents AS DOUBLE) / 100.0
             / lag(CAST(cents AS DOUBLE) / 100.0) OVER (ORDER BY month)
             AS growth
    FROM m
"""

# hourly anomaly z vs the preceding 24h (exclusive frame): exact integer
# window sums, identical float op order, NULL on short or flat baselines
ORACLE_SQL["events_hourly_anomaly"] = f"""
    WITH h AS (
      SELECT strftime(ts, '%Y-%m-%d %H:00:00') AS hour, count(*) AS n
      FROM events GROUP BY 1
    ), w AS (
      SELECT hour, n,
             sum(n) OVER win AS s1, sum(n * n) OVER win AS s2,
             count(*) OVER win AS cnt
      FROM h
      WINDOW win AS (ORDER BY hour
                     ROWS BETWEEN {_ANOM_W} PRECEDING AND 1 PRECEDING)
    )
    SELECT hour, n,
           CASE WHEN cnt = {_ANOM_W}
                 AND CAST(s2 AS DOUBLE) / {_ANOM_W}
                     - (CAST(s1 AS DOUBLE) / {_ANOM_W})
                       * (CAST(s1 AS DOUBLE) / {_ANOM_W}) > 0
                THEN (n - CAST(s1 AS DOUBLE) / {_ANOM_W})
                     / sqrt(CAST(s2 AS DOUBLE) / {_ANOM_W}
                            - (CAST(s1 AS DOUBLE) / {_ANOM_W})
                              * (CAST(s1 AS DOUBLE) / {_ANOM_W}))
           END AS z
    FROM w
"""

# exact two-sample KS: grouped cents CDFs, D evaluated at every distinct
# value, ties on D resolve to the smallest value
ORACLE_SQL["orders_ks_drift"] = """
    WITH s AS (
      SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v,
             CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS s1
      FROM orders
    ), tot AS (
      SELECT CAST(sum(s1) AS BIGINT) AS n1,
             CAST(sum(1 - s1) AS BIGINT) AS n2 FROM s
    ), c AS (
      SELECT v, sum(s1) AS c1, sum(1 - s1) AS c2 FROM s GROUP BY v
    ), cum AS (
      SELECT v,
             sum(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c1,
             sum(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c2
      FROM c
    )
    SELECT abs(CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2) AS d_stat,
           v::DOUBLE / 100.0 AS at_value, n1, n2
    FROM cum, tot
    ORDER BY d_stat DESC, v ASC
    LIMIT 1
"""

# span-duplication census: distinct token-8-grams per doc, document
# frequency per gram, per-doc count of grams shared with other docs
ORACLE_SQL["docs_dup_span_census"] = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), g AS (
      SELECT doc_id, array_to_string(t[i:i+{_SPAN_K - 1}], ' ') AS gram
      FROM (SELECT doc_id, t,
                   unnest(generate_series(1, greatest(len(t) - {_SPAN_K - 1}, 0)))
                     AS i
            FROM toks)
    ), d AS (
      SELECT DISTINCT doc_id, gram FROM g
    ), df AS (
      SELECT gram, count(*) AS nd FROM d GROUP BY gram
    ), tot AS (
      SELECT doc_id, count(*) AS n_kgrams,
             count(DISTINCT gram) AS n_distinct
      FROM g GROUP BY doc_id
    ), dup AS (
      SELECT d.doc_id, count(*) AS n_dup
      FROM d JOIN df USING (gram) WHERE df.nd >= 2 GROUP BY d.doc_id
    )
    SELECT doc_id, n_kgrams, n_distinct, coalesce(n_dup, 0) AS n_dup
    FROM tot LEFT JOIN dup USING (doc_id)
"""

# SCD-2 build: gaps-and-islands runs of event_type per user in
# (ts, event_id) order; valid_to = next run's start (NULL while current)
ORACLE_SQL["events_scd2"] = """
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), i AS (
      SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS island
      FROM o
    ), s AS (
      SELECT user_id, island, min(event_type) AS event_type,
             min(ts) AS valid_from, count(*) AS n_events
      FROM i GROUP BY user_id, island
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY island)
             AS valid_to,
           n_events
    FROM s
"""

# Q21: only-late-supplier-on-a-multi-supplier-order, the textual
# EXISTS / NOT EXISTS form the distributed plan decorrelates
ORACLE_SQL["supplier_blame"] = f"""
    WITH l AS (
      SELECT l_orderkey, l_suppkey,
             max(CASE WHEN l_shipdate >= DATE '{_BLAME_CUTOFF}'
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem GROUP BY l_orderkey, l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, count(*) AS numwait
    FROM l l1 JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.late = 1
      AND EXISTS (SELECT 1 FROM l l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey AND l3.late = 1)
    GROUP BY s.s_suppkey, s.s_name
"""

# streaming watermark: exclusive running max over arrival order, NULL on
# the first arrival (empty frame), late = event time behind the watermark
ORACLE_SQL["events_late_census"] = """
    WITH w AS (
      SELECT event_id, ts,
             max(ts) OVER (
               ORDER BY epoch_us(ts)
                        + CAST(CAST(event_id AS HUGEINT) * 2654435761
                               AS HUGEINT) % 4294967296 % 1800000000,
                        event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS pm
      FROM events
    )
    SELECT event_id, ts,
           pm - INTERVAL '10 minutes' AS watermark,
           CAST(CASE WHEN ts < pm - INTERVAL '10 minutes' THEN 1 ELSE 0 END
                AS BIGINT) AS late
    FROM w
"""

# resize emits a fixed target geometry per input row (pixel payloads are
# dropped by the query's projection) — the oracle checks the row multiset
ORACLE_SQL["corpus_resize"] = f"""
    SELECT image_id, CAST(32 AS INTEGER) AS w, CAST(32 AS INTEGER) AS h,
           'png' AS fmt
    FROM read_parquet('{_CORPUS_GLOB}')
"""

# keep-best representative per shared caption: exact window equivalent of
# the per-block argmax partials + distinct-caption merge
ORACLE_SQL["corpus_keep_best_caption"] = f"""
    SELECT image_id, caption, pixels FROM (
      SELECT image_id, caption,
             CAST(w AS BIGINT) * CAST(h AS BIGINT) AS pixels,
             row_number() OVER (
               PARTITION BY caption
               ORDER BY CAST(w AS BIGINT) * CAST(h AS BIGINT) DESC, image_id
             ) AS rn
      FROM read_parquet('{_CORPUS_GLOB}')
    ) WHERE rn = 1
"""

ORACLE_SQL["corpus_resolution_census"] = f"""
    SELECT fmt,
           CASE WHEN px < 600 THEN 'tiny'
                WHEN px < 1200 THEN 'small'
                WHEN px < 1800 THEN 'medium'
                ELSE 'large' END AS band,
           count(*) AS n,
           CAST(sum(px) AS BIGINT) AS sum_px,
           min(px) AS min_px, max(px) AS max_px
    FROM (SELECT fmt, CAST(w AS BIGINT) * CAST(h AS BIGINT) AS px
          FROM read_parquet('{_CORPUS_GLOB}'))
    GROUP BY 1, 2
"""

# caption token counts follow the engine's \\S+ tokenization exactly
ORACLE_SQL["corpus_caption_filter"] = f"""
    SELECT image_id, n_tokens, short_side FROM (
      SELECT image_id,
             CAST(array_length(regexp_split_to_array(trim(caption), '\\s+'))
                  AS INTEGER) AS n_tokens,
             CAST(least(w, h) AS INTEGER) AS short_side, fmt
      FROM read_parquet('{_CORPUS_GLOB}')
    ) WHERE fmt = 'png' AND short_side >= 24 AND n_tokens BETWEEN 3 AND 10
"""

# cross-corpus brute Jaccard: the same exact shingle CTE as
# docs_minhash_dups with the self-join condition swapped for the
# history (doc_id % 4 != 0) × new-wave (doc_id % 4 = 0) cross join
ORACLE_SQL["docs_dedup_incremental"] = ORACLE_SQL["docs_minhash_dups"].replace(
    "FROM sh a JOIN sh b ON a.doc_id < b.doc_id",
    "FROM sh a JOIN sh b ON a.doc_id % 4 != 0 AND b.doc_id % 4 = 0",
)

ORACLE_SQL["docs_heavy_terms"] = """
    SELECT term, n, CAST(rn AS INTEGER) AS rank FROM (
      SELECT term, count(*) AS n,
             row_number() OVER (ORDER BY count(*) DESC, term) AS rn
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS term
            FROM documents)
      GROUP BY term)
    WHERE rn <= 10
"""

ORACLE_SQL["events_funnel"] = """
    SELECT v.user_id, count(*) AS n_views,
           CAST(sum(CASE WHEN EXISTS (
             SELECT 1 FROM events p
             WHERE p.user_id = v.user_id AND p.event_type = 'purchase'
               AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
           ) THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
    FROM events v WHERE v.event_type = 'view'
    GROUP BY v.user_id
"""

ORACLE_SQL["events_first_last_touch"] = """
    SELECT user_id,
           max(CASE WHEN rn_a = 1 THEN event_type END) AS first_type,
           max(CASE WHEN rn_d = 1 THEN event_type END) AS last_type,
           count(*) AS n_events
    FROM (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events)
    GROUP BY user_id
"""

ORACLE_SQL["lineitem_unpivot"] = """
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
           l_quantity AS amount FROM lineitem WHERE l_returnflag = 'R'
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
    FROM lineitem WHERE l_returnflag = 'R'
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount
    FROM lineitem WHERE l_returnflag = 'R'
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax
    FROM lineitem WHERE l_returnflag = 'R'
"""

# integer cross-multiplication: value > mean ⟺ cents·n > sum_cents —
# exact on both sides (values are 2-decimal), no float mean anywhere
ORACLE_SQL["events_above_user_avg"] = """
    WITH s AS (
      SELECT user_id,
             sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS sc,
             count(*) AS n
      FROM events GROUP BY user_id)
    SELECT e.event_id, e.user_id, e.value
    FROM events e JOIN s USING (user_id)
    WHERE CAST(floor(e.value * 100.0 + 0.5) AS BIGINT) * s.n > s.sc
"""

# transitive closure over the exact Hamming pair set == the distributed
# min-label components (same invariant as docs_minhash_groups)
ORACLE_SQL["corpus_phash_groups"] = (
    "WITH RECURSIVE pairs AS MATERIALIZED ("
    + ORACLE_SQL["corpus_phash_dups"]
    + "),\n"
    "edges AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs\n"
    "          UNION ALL SELECT id_b, id_a FROM pairs),\n"
    "reach(id, r) AS (\n"
    "  SELECT a, b FROM edges\n"
    "  UNION\n"
    "  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a\n"
    ")\n"
    "SELECT id, least(id, min(r)) AS rep FROM reach GROUP BY id"
)

# cross Hamming join history (id % 4 != 0) × new wave (id % 4 = 0):
# exact for the banded probe because threshold 4 < 8 bands (pigeonhole)
ORACLE_SQL["corpus_dedup_incremental"] = f"""
    WITH c AS (SELECT image_id, phash,
                      CAST(substr(image_id, 4) AS BIGINT) % 4 AS m
               FROM read_parquet('{_CORPUS_GLOB}'))
    SELECT a.image_id AS id_a, b.image_id AS id_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
    FROM c a JOIN c b ON a.m != 0 AND b.m = 0
    WHERE bit_count(xor(a.phash, b.phash)) <= 4
"""

# brute-force Hamming top-5 per query image, ties by neighbor id — the
# exact window equivalent of the broadcast popcount local-top-k merge
ORACLE_SQL["corpus_phash_knn"] = f"""
    WITH c AS (SELECT image_id, phash FROM read_parquet('{_CORPUS_GLOB}')),
    q AS (SELECT image_id AS qid, phash AS qph FROM c ORDER BY image_id LIMIT 5),
    d AS (SELECT q.qid AS query_id, c.image_id AS neighbor_id,
                 CAST(bit_count(xor(q.qph, c.phash)) AS INTEGER) AS hamming
          FROM q JOIN c ON c.image_id <> q.qid)
    SELECT query_id, neighbor_id, hamming, CAST(rn AS INTEGER) AS rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY hamming, neighbor_id) AS rn FROM d)
    WHERE rn <= 5
"""

ORACLE_SQL["corpus_bytes_census"] = f"""
    SELECT fmt, count(*) AS n,
           CAST(sum(octet_length(bytes)) AS BIGINT) AS sum_bytes,
           CAST(min(octet_length(bytes)) AS BIGINT) AS min_bytes,
           CAST(max(octet_length(bytes)) AS BIGINT) AS max_bytes
    FROM read_parquet('{_CORPUS_GLOB}')
    GROUP BY fmt
"""


def _splitmix64_sql(src: str, uid: str = "user_id") -> str:
    """SQL for the exact splitmix64 finalizer over ``uid`` (HUGEINT
    arithmetic mod 2^64; 64×64-bit multiplies split into 32-bit halves so
    no partial product overflows HUGEINT) — bit-equal to
    stages.sketch.splitmix64 (verified over 50k keys)."""
    m = "18446744073709551616::HUGEINT"  # 2^64

    def mulmod(a: str, c: int) -> str:
        lo, hi = c & 0xFFFFFFFF, c >> 32
        return (
            f"(({a}) * {lo}::HUGEINT"
            f" + ((({a}) * {hi}::HUGEINT) % 4294967296::HUGEINT)"
            f" * 4294967296::HUGEINT) % {m}"
        )

    return f"""
      z0 AS (
        SELECT event_type,
               ({uid}::HUGEINT + 11400714819323198485::HUGEINT) % {m} AS z
        FROM {src}
      ), z1 AS (
        SELECT event_type,
               {mulmod("xor(z, z // 1073741824::HUGEINT)", 0xBF58476D1CE4E5B9)} AS z
        FROM z0
      ), z2 AS (
        SELECT event_type,
               {mulmod("xor(z, z // 134217728::HUGEINT)", 0x94D049BB133111EB)} AS z
        FROM z1
      ), hashed AS (
        SELECT event_type, xor(z, z // 2147483648::HUGEINT) AS h FROM z2
      )"""


# the pipeline's own HyperLogLog (splitmix64 hash, p=12, max-merged
# registers, linear-counting small-range correction) re-expressed in
# SQL — register index = top 12 bits, rank = clz(h<<12)+1 via
# 65-length(bin(x)) (bin() is exact; float log2 is not), register sum
# kept exact by scaling 2^-reg to the integer 2^(53-reg). Verified
# bit-equal to stages.sketch.grouped_hll on both the linear-counting
# and raw-estimator branches (148 and ~270k distinct).
ORACLE_SQL["events_approx_users"] = (
    "WITH " + _splitmix64_sql("events") + f""", rk AS (
      SELECT event_type,
             h // 4503599627370496::HUGEINT AS idx,
             CASE WHEN (h * 4096::HUGEINT) % 18446744073709551616::HUGEINT
                       = 0::HUGEINT THEN 53
                  ELSE 65 - length(bin(
                    (h * 4096::HUGEINT) % 18446744073709551616::HUGEINT))
             END AS rank
      FROM hashed
    ), regs AS (
      SELECT event_type, idx, max(rank) AS reg FROM rk GROUP BY event_type, idx
    ), agg AS (
      SELECT event_type,
             sum(CAST(power(2.0, 53 - reg) AS HUGEINT)) AS s_present,
             count(*) AS n_present
      FROM regs GROUP BY event_type
    ), est AS (
      SELECT event_type,
             (4096 - n_present) AS zeros,
             ((0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0)
               / (CAST(s_present + (4096::HUGEINT - n_present::HUGEINT)
                         * 9007199254740992::HUGEINT AS DOUBLE)
                  / 9007199254740992.0) AS raw
      FROM agg
    )
    SELECT event_type,
           CAST(round(CASE WHEN raw <= 10240.0 AND zeros > 0
                           THEN 4096.0 * ln(4096.0 / zeros) ELSE raw END)
                AS BIGINT) AS approx_distinct
    FROM est ORDER BY event_type"""
)

ORACLE_SQL["customer_order_stats"] = """
    SELECT c.c_custkey, c.c_name,
           coalesce(u.n, 0) AS n_urgent,
           coalesce(u.spent_cents, 0)::DOUBLE / 100.0 AS urgent_spent
    FROM customer c LEFT JOIN (
      SELECT o_custkey, count(*) AS n,
             sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS spent_cents
      FROM orders WHERE o_orderpriority = '1-URGENT'
      GROUP BY o_custkey) u
    ON u.o_custkey = c.c_custkey
"""

ORACLE_SQL["lineitem_rollup"] = """
    SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
           coalesce(l_linestatus, 'ALL') AS l_linestatus,
           count(*) AS n,
           sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))::DOUBLE / 100.0
             AS sum_price
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

ORACLE_SQL["events_pivot"] = """
    SELECT user_id,
           count(*) FILTER (event_type = 'click')    AS n_click,
           count(*) FILTER (event_type = 'error')    AS n_error,
           count(*) FILTER (event_type = 'purchase') AS n_purchase,
           count(*) FILTER (event_type = 'signup')   AS n_signup,
           count(*) FILTER (event_type = 'view')     AS n_view
    FROM events GROUP BY user_id
"""

ORACLE_SQL["events_lead_lag"] = """
    SELECT user_id, event_id,
           CAST(floor(value * 100.0 + 0.5) AS BIGINT)
             - lag(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER w AS dv_cents,
           epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

ORACLE_SQL["docs_top_ngrams"] = """
    WITH toks AS (
      SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM documents
    ), bg AS (
      SELECT unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i + 1])) AS ngram
      FROM toks
    )
    SELECT ngram, count(*) AS n FROM bg
    GROUP BY ngram ORDER BY n DESC, ngram LIMIT 50
"""

ORACLE_SQL["lineitem_bloom_semi"] = """
    SELECT l_returnflag, count(*) AS n_items,
           sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))::DOUBLE / 100.0
             AS revenue
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
    GROUP BY l_returnflag
"""

ORACLE_SQL["nation_segments"] = """
    SELECT c_nationkey,
           string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
    FROM customer GROUP BY c_nationkey
"""

ORACLE_SQL["customer_set_flags"] = """
    SELECT c_custkey, max(in_a)::BIGINT AS in_a, max(in_b)::BIGINT AS in_b FROM (
      SELECT DISTINCT o_custkey AS c_custkey, 1 AS in_a, 0 AS in_b
      FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT c_custkey, 0, 1 FROM customer WHERE c_acctbal > 9000
    ) GROUP BY c_custkey
"""

ORACLE_SQL["orders_price_window"] = """
    SELECT o_orderkey, o_orderpriority,
           ntile(4) OVER w AS tile,
           percent_rank() OVER w AS pct_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""

ORACLE_SQL["lineitem_corr"] = """
    WITH a AS (
      SELECT l_returnflag AS k, CAST(l_quantity AS BIGINT) AS x,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
      FROM lineitem
    ), m AS (
      SELECT k, count(*)::HUGEINT AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM a GROUP BY k
    )
    SELECT k AS l_returnflag, CAST(n AS BIGINT) AS n,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
             CAST(n * sxy - sx * sy AS DOUBLE)
               / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
           END AS corr_qty_price
    FROM m ORDER BY k
"""

ORACLE_SQL["docs_sample_per_source"] = """
    WITH h AS (
      SELECT source, doc_id,
             list_reduce(
               list_prepend(14695981039346656037::HUGEINT,
                 list_transform(range(0, 8), k ->
                   (doc_id::HUGEINT // CAST(power(2, 8*k) AS HUGEINT)) % 256)),
               (acc, b) -> (xor(acc::HUGEINT, b::HUGEINT)
                            * 1099511628211::HUGEINT)
                           % 18446744073709551616::HUGEINT
             ) AS hk
      FROM documents)
    SELECT source, doc_id FROM (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rn
      FROM h) t
    WHERE rn <= 20
"""

ORACLE_SQL["docs_mix_temperature"] = """
    WITH c AS (SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY source),
    w AS (SELECT source, n, CAST(floor(sqrt(n)) AS BIGINT) AS wt FROM c),
    t AS (SELECT sum(wt) AS tot FROM w),
    q AS (SELECT source, n, (100 * wt) // tot AS base, (100 * wt) % tot AS rem
          FROM w, t),
    l AS (SELECT 100 - sum(base) AS leftover FROM q),
    a AS (SELECT source,
                 base + CASE WHEN row_number()
                                  OVER (ORDER BY rem DESC, source ASC)
                             <= (SELECT leftover FROM l)
                        THEN 1 ELSE 0 END AS quota
          FROM q),
    h AS (
      SELECT d.source, d.doc_id, a.quota,
             list_reduce(
               list_prepend(14695981039346656037::HUGEINT,
                 list_transform(range(0, 8), k ->
                   (doc_id::HUGEINT // CAST(power(2, 8*k) AS HUGEINT)) % 256)),
               (acc, b) -> (xor(acc::HUGEINT, b::HUGEINT)
                            * 1099511628211::HUGEINT)
                           % 18446744073709551616::HUGEINT
             ) AS hk
      FROM documents d JOIN a USING (source))
    SELECT source, doc_id FROM (
      SELECT source, doc_id, quota,
             row_number() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rn
      FROM h) t
    WHERE rn <= quota
"""

ORACLE_SQL["docs_decontaminate"] = """
    WITH toks AS (
      SELECT doc_id, source,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents
    ), bg AS (
      SELECT doc_id, source,
             unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i + 1])) AS ngram
      FROM toks
    ), bench AS (
      SELECT DISTINCT ngram FROM bg WHERE source = 'src0'
    )
    SELECT doc_id, count(*) AS n_bigrams,
           count(*) FILTER (ngram IN (SELECT ngram FROM bench)) AS n_hits,
           (10 * count(*) FILTER (ngram IN (SELECT ngram FROM bench))
              >= 3 * count(*)) AS contaminated
    FROM bg WHERE source <> 'src0'
    GROUP BY doc_id
"""

ORACLE_SQL["orders_customer_full_join"] = """
    WITH agg AS (
      SELECT o_custkey,
             sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS spent_cents,
             count(*) AS n
      FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
    ), rich AS (
      SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 8000
    )
    SELECT coalesce(a.o_custkey, r.c_custkey) AS custkey,
           coalesce(a.n, 0) AS n_f_orders,
           coalesce(a.spent_cents, 0)::DOUBLE / 100.0 AS f_spent,
           coalesce(r.c_acctbal, -1.0) AS acctbal,
           CASE WHEN r.c_custkey IS NULL THEN 'orders_only'
                WHEN a.o_custkey IS NULL THEN 'customer_only'
                ELSE 'both' END AS side
    FROM agg a FULL OUTER JOIN rich r ON a.o_custkey = r.c_custkey
"""

ORACLE_SQL["orders_priority_mode"] = """
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n FROM (
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY count(*) DESC, o_orderpriority ASC) AS rn
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    ) WHERE rn = 1
"""

ORACLE_SQL["docs_words"] = """
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) AS pos,
           unnest(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id % 8 = 0
"""

ORACLE_SQL["events_moving_avg"] = """
    SELECT user_id, event_id,
           (CAST(sum(cents) OVER w AS DOUBLE) / 100.0)
             / (count(*) OVER w) AS mov_avg
    FROM (SELECT user_id, event_id, ts,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
          FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""

# fractional ranks use dyadic quantiles (quarters), exactly
# representable in both DuckDB's decimal literals and IEEE doubles, so
# the floor/frac arithmetic below is bit-identical to the engine's
_QCONT = """
    (max(CASE WHEN rr = CAST(floor((n - 1) * {q}) AS BIGINT) THEN cents END)
     + (max(CASE WHEN rr = least(CAST(floor((n - 1) * {q}) AS BIGINT) + 1, n - 1)
                 THEN cents END)
        - max(CASE WHEN rr = CAST(floor((n - 1) * {q}) AS BIGINT) THEN cents END))
       * ((n - 1) * {q} - floor((n - 1) * {q}))) / 100.0 AS {name}
"""
ORACLE_SQL["lineitem_price_quantiles_cont"] = (
    """
    WITH c AS (
      SELECT l_returnflag AS k,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM lineitem
    ), r AS (
      SELECT k, cents,
             row_number() OVER (PARTITION BY k ORDER BY cents) - 1 AS rr,
             count(*) OVER (PARTITION BY k) AS n
      FROM c
    )
    SELECT k AS l_returnflag,
"""
    + ",".join(
        _QCONT.format(q=q, name=name)
        for q, name in (("0.25", "q25"), ("0.5", "q50"), ("0.75", "q75"))
    )
    + """
    FROM r GROUP BY k, n ORDER BY k
"""
)

ORACLE_SQL["orders_priority_share"] = """
    WITH a AS (
      SELECT o_orderpriority, count(*) AS n,
             sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n,
           cents::DOUBLE / 100.0 AS revenue,
           CAST(cents AS DOUBLE) / CAST(sum(cents) OVER () AS DOUBLE) AS share
    FROM a
"""

ORACLE_SQL["lineitem_cube"] = """
    SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
           coalesce(l_linestatus, 'ALL') AS l_linestatus,
           count(*) AS n,
           sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))::DOUBLE / 100.0
             AS sum_price
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""

ORACLE_SQL["docs_dedup_keep_best"] = """
    WITH f AS (
      SELECT doc_id,
             length(text) AS n_chars,
             CASE WHEN trim(text)='' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END::BIGINT AS n_tokens,
             length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
             length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS n_punct
      FROM documents
    ), g AS (
      SELECT doc_id, n_chars, n_tokens,
             CASE WHEN n_tokens=0 THEN 0.0 ELSE n_nonspace::DOUBLE / n_tokens END AS mean_token_len,
             CASE WHEN n_chars=0 THEN 0.0 ELSE n_digits::DOUBLE / n_chars END AS digit_ratio,
             CASE WHEN n_chars=0 THEN 0.0 ELSE n_punct::DOUBLE / n_chars END AS punct_ratio
      FROM f
    ), q AS (
      SELECT doc_id,
             greatest(0.0,
               1.0
               - CASE WHEN n_chars < 50 THEN 0.5 ELSE 0.0 END
               - CASE WHEN n_tokens > 0 AND NOT (mean_token_len BETWEEN 3.0 AND 12.0) THEN 0.2 ELSE 0.0 END
               - CASE WHEN n_chars > 0 AND digit_ratio > 0.2 THEN 0.2 ELSE 0.0 END
               - CASE WHEN n_chars > 0 AND punct_ratio > 0.2 THEN 0.1 ELSE 0.0 END
             ) AS quality_score
      FROM g
    ), k AS (
      SELECT doc_id,
             lower(array_to_string(
               (regexp_split_to_array(trim(text), '\\s+'))[1:2], ' ')) AS text_key
      FROM documents
    )
    SELECT doc_id, text_key, quality_score FROM (
      SELECT k.doc_id, k.text_key, q.quality_score,
             row_number() OVER (
               PARTITION BY k.text_key
               ORDER BY q.quality_score DESC, k.doc_id) AS rn
      FROM k JOIN q ON k.doc_id = q.doc_id) t
    WHERE rn = 1
"""

ORACLE_SQL["lineitem_iqr_outliers"] = """
    WITH c AS (
      SELECT CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM lineitem
    ), r AS (
      SELECT cents, row_number() OVER (ORDER BY cents) - 1 AS rr,
             count(*) OVER () AS n
      FROM c
    ), qq AS (
      SELECT
        (max(CASE WHEN rr = CAST(floor((n - 1) * 0.25) AS BIGINT) THEN cents END)
         + (max(CASE WHEN rr = least(CAST(floor((n - 1) * 0.25) AS BIGINT) + 1, n - 1)
                     THEN cents END)
            - max(CASE WHEN rr = CAST(floor((n - 1) * 0.25) AS BIGINT) THEN cents END))
           * ((n - 1) * 0.25 - floor((n - 1) * 0.25))) AS q1,
        (max(CASE WHEN rr = CAST(floor((n - 1) * 0.75) AS BIGINT) THEN cents END)
         + (max(CASE WHEN rr = least(CAST(floor((n - 1) * 0.75) AS BIGINT) + 1, n - 1)
                     THEN cents END)
            - max(CASE WHEN rr = CAST(floor((n - 1) * 0.75) AS BIGINT) THEN cents END))
           * ((n - 1) * 0.75 - floor((n - 1) * 0.75))) AS q3
      FROM r GROUP BY n
    ), b AS (
      SELECT q1 - 1.5 * (q3 - q1) AS low, q3 + 1.5 * (q3 - q1) AS high FROM qq
    )
    SELECT count(*) FILTER (WHERE c.cents < b.low)  AS n_low,
           count(*) FILTER (WHERE c.cents > b.high) AS n_high,
           count(*) AS n_total
    FROM c, b
"""

ORACLE_SQL["docs_clean"] = """
    SELECT doc_id,
           lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS clean_text,
           length(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS n_chars
    FROM documents
"""

ORACLE_SQL["orders_global_rank"] = """
    SELECT o_orderkey, o_totalprice,
           row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
           CAST(row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS DOUBLE)
             / count(*) OVER () AS cume
    FROM orders
"""

# crawl_pagerank: iterative fixed point — not ANSI-SQL (rows-only).

ORACLE_SQL["docs_term_pmi"] = """
    WITH tok0 AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ), toks AS (
      SELECT DISTINCT doc_id, term FROM tok0
    ), n AS (SELECT count(*) AS n FROM documents),
    voc AS (
      SELECT term, count(*) AS df FROM toks GROUP BY term
      HAVING count(*) >= greatest(5, (SELECT n // 20 FROM n))
    ), tv AS (
      SELECT toks.doc_id, toks.term FROM toks JOIN voc USING (term)
    ), pairs AS (
      SELECT a.term AS term_a, b.term AS term_b, count(*) AS c_ab
      FROM tv a JOIN tv b ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY 1, 2
    )
    SELECT term_a, term_b, c_ab, va.df AS df_a, vb.df AS df_b,
           (CAST(c_ab AS DOUBLE) * (SELECT CAST(n AS DOUBLE) FROM n))
             / (CAST(va.df AS DOUBLE) * CAST(vb.df AS DOUBLE)) AS lift
    FROM pairs
    JOIN voc va ON va.term = pairs.term_a
    JOIN voc vb ON vb.term = pairs.term_b
    ORDER BY lift DESC, term_a, term_b LIMIT 100
"""

ORACLE_SQL["orders_price_histogram"] = """
    WITH c AS (
      SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents FROM orders
    ), m AS (SELECT min(cents) AS mn, max(cents) AS mx FROM c),
    w AS (
      SELECT mn, CAST(ceil(CAST(mx - mn + 1 AS DOUBLE) / 16) AS BIGINT) AS width
      FROM m
    )
    SELECT (cents - mn) // width AS bin,
           CAST(mn + ((cents - mn) // width) * width AS DOUBLE) / 100.0 AS lo,
           CAST(mn + (((cents - mn) // width) + 1) * width - 1 AS DOUBLE) / 100.0
             AS hi,
           count(*) AS n
    FROM c, w
    GROUP BY 1, 2, 3
    ORDER BY bin
"""

# MAD: the same rank-bracket construction as the cont-quantile oracle,
# in DOUBLED cents (see lineitem_mad's docstring for the exactness
# argument); q = 0.5 so frac = (n-1)*0.5 - floor((n-1)*0.5).
_MAD_BRACKET = """
    (max(CASE WHEN rr = CAST(floor((n - 1) * 0.5) AS BIGINT) THEN {v} END)
     + (max(CASE WHEN rr = least(CAST(floor((n - 1) * 0.5) AS BIGINT) + 1, n - 1)
                 THEN {v} END)
        - max(CASE WHEN rr = CAST(floor((n - 1) * 0.5) AS BIGINT) THEN {v} END))
       * ((n - 1) * 0.5 - floor((n - 1) * 0.5)))
"""

ORACLE_SQL["lineitem_mad"] = (
    """
    WITH c AS (
      SELECT l_returnflag AS k,
             2 * CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS v
      FROM lineitem
    ), r AS (
      SELECT k, v,
             row_number() OVER (PARTITION BY k ORDER BY v) - 1 AS rr,
             count(*) OVER (PARTITION BY k) AS n
      FROM c
    ), med AS (
      SELECT k, """
    + _MAD_BRACKET.format(v="v")
    + """ AS m2
      FROM r GROUP BY k, n
    ), d AS (
      SELECT c.k, CAST(abs(v - m2) AS BIGINT) AS dev
      FROM c JOIN med ON med.k = c.k
    ), rd AS (
      SELECT k, dev,
             row_number() OVER (PARTITION BY k ORDER BY dev) - 1 AS rr,
             count(*) OVER (PARTITION BY k) AS n
      FROM d
    ), madt AS (
      SELECT k, """
    + _MAD_BRACKET.format(v="dev")
    + """ AS md
      FROM rd GROUP BY k, n
    )
    SELECT med.k AS l_returnflag,
           m2 / 200.0 AS median_price,
           md / 200.0 AS mad_price
    FROM med JOIN madt ON madt.k = med.k
    ORDER BY l_returnflag
"""
)

ORACLE_SQL["lineitem_basket_triangles"] = """
    WITH e AS (
      SELECT DISTINCT l1.l_partkey AS p1, l2.l_partkey AS p2
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    )
    SELECT count(*) AS triangles
    FROM e e1
    JOIN e e2 ON e1.p2 = e2.p1
    JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
"""

ORACLE_SQL["orders_ntile"] = """
    SELECT o_orderkey,
           NTILE(8) OVER (ORDER BY o_totalprice, o_orderkey) AS tile
    FROM orders
"""

ORACLE_SQL["orders_pareto"] = """
    WITH o AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents,
             o_orderdate
      FROM orders
    )
    SELECT o_orderkey, price_cents, o_orderdate FROM o
    WHERE NOT EXISTS (
      SELECT 1 FROM o d
      WHERE d.price_cents >= o.price_cents
        AND d.o_orderdate <= o.o_orderdate
        AND (d.price_cents > o.price_cents OR d.o_orderdate < o.o_orderdate))
    ORDER BY o_orderkey
"""

ORACLE_SQL["events_transitions"] = """
    WITH s AS (
      SELECT event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type, count(*) AS n
    FROM s
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    ORDER BY prev_type, event_type
"""

ORACLE_SQL["events_retention"] = """
    WITH f AS (
      SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
    )
    SELECT date_trunc('day', f.first_ts) AS cohort_day,
           datediff('day', date_trunc('day', f.first_ts),
                    date_trunc('day', e.ts)) AS day_offset,
           count(DISTINCT e.user_id) AS n_users
    FROM events e JOIN f ON e.user_id = f.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
"""

# order-independent digest: reuse docs_fingerprint's exact FNV-1a CTE,
# then sum the unsigned hashes mod 2^64 per source (commutative)
ORACLE_SQL["docs_source_digest"] = """
    WITH th AS (
      SELECT d.source, d.doc_id,
             list_transform(regexp_extract_all(coalesce(d.text, ''), '\\S+'), tok ->
               list_reduce(
                 list_prepend(14695981039346656037::HUGEINT,
                   list_transform(range(1, length(tok)+1), i -> ascii(tok[i]))),
                 (acc, b) -> (xor(acc::HUGEINT, b::HUGEINT)
                              * 1099511628211::HUGEINT)
                             % 18446744073709551616::HUGEINT)) AS hs
      FROM documents d
    ), fp AS (
      SELECT source,
             list_reduce(
               list_prepend(14695981039346656037::HUGEINT, hs),
               (acc, h) -> (xor(acc::HUGEINT, h::HUGEINT)
                            * 1099511628211::HUGEINT)
                           % 18446744073709551616::HUGEINT) AS h
      FROM th
    ), agg AS (
      SELECT source,
             sum(h) % 18446744073709551616::HUGEINT AS d,
             count(*) AS n_docs
      FROM fp GROUP BY source
    )
    SELECT source,
           CASE WHEN d >= 9223372036854775808::HUGEINT
                THEN (d - 18446744073709551616::HUGEINT)::BIGINT
                ELSE d::BIGINT END AS digest,
           n_docs
    FROM agg
"""

ORACLE_SQL["events_debounce"] = """
    WITH s AS (
      SELECT event_id, user_id, event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap
      FROM events
    )
    SELECT event_id, user_id, event_type
    FROM s WHERE gap IS NULL OR gap >= 600000000
"""

ORACLE_SQL["docs_repetition"] = """
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ), tc AS (
      SELECT doc_id, tok, count(*) AS c
      FROM toks WHERE tok <> '' GROUP BY doc_id, tok
    ), ts AS (
      SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*) AS n_distinct,
             max(c) AS top_token_n
      FROM tc GROUP BY doc_id
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i + 1])) AS ngram
      FROM (SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS t
            FROM documents)
    ), bc AS (
      SELECT doc_id, ngram, count(*) AS c FROM bg GROUP BY doc_id, ngram
    ), bs AS (
      SELECT doc_id, sum(c)::BIGINT AS n_bigrams, max(c) AS top_bigram_n
      FROM bc GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_tokens, t.n_distinct, t.top_token_n,
           coalesce(b.n_bigrams, 0) AS n_bigrams,
           coalesce(b.top_bigram_n, 0) AS top_bigram_n,
           ((t.n_tokens < 5 OR t.top_token_n * 5 <= t.n_tokens)
            AND (coalesce(b.n_bigrams, 0) < 20
                 OR coalesce(b.top_bigram_n, 0) * 5 <= coalesce(b.n_bigrams, 0)))
             AS rep_ok
    FROM ts t LEFT JOIN bs b USING (doc_id)
"""

ORACLE_SQL["revenue_by_nation"] = """
    SELECT n.n_name,
           sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0 + 0.5)
                    AS BIGINT))::BIGINT AS rev_cents,
           sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0 + 0.5)
                    AS BIGINT))::BIGINT::DOUBLE / 100.0 AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND c.c_nationkey = s.s_nationkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY n.n_name
"""

ORACLE_SQL["lineitem_zscore"] = """
    WITH c AS (
      SELECT l_orderkey, l_linenumber,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS x
      FROM lineitem
    ), m AS (
      SELECT sum(x::HUGEINT) AS s,
             sum(x::HUGEINT * x::HUGEINT) AS q,
             count(*)::HUGEINT AS n
      FROM c
    )
    SELECT l_orderkey, l_linenumber,
           (x::DOUBLE - (s::DOUBLE / n::DOUBLE))
             / (sqrt((q * n - s * s)::DOUBLE) / n::DOUBLE) AS z
    FROM c, m
"""

ORACLE_SQL["events_asof_order_forward"] = """
    SELECT e.user_id, e.ts, e.event_id, o.o_orderkey, o.o_totalprice
    FROM events e LEFT JOIN LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
      ORDER BY o_orderdate ASC, o_orderkey ASC LIMIT 1
    ) o ON TRUE
"""

ORACLE_SQL["events_asof_order_nearest"] = """
    SELECT e.user_id, e.ts, e.event_id, o.o_orderkey, o.o_totalprice
    FROM events e LEFT JOIN LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = e.user_id
      ORDER BY abs(epoch_us(o.o_orderdate) - epoch_us(e.ts)) ASC,
               o_orderdate ASC, o_orderkey ASC LIMIT 1
    ) o ON TRUE
"""

ORACLE_SQL["lineitem_regression"] = """
    WITH a AS (
      SELECT l_returnflag AS k, CAST(l_quantity AS BIGINT) AS x,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
      FROM lineitem
    ), m AS (
      SELECT k, count(*)::HUGEINT AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM a GROUP BY k
    ), sl AS (
      SELECT k, n, sx, sy,
             CASE WHEN n * sxx - sx * sx > 0 THEN
               CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)
             END AS slope
      FROM m
    )
    SELECT k AS l_returnflag, CAST(n AS BIGINT) AS n,
           slope AS slope_cents_per_qty,
           (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             - slope * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
             AS intercept_cents
    FROM sl ORDER BY k
"""

ORACLE_SQL["basket_bfs_depth"] = """
    WITH RECURSIVE edges AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey <> b.l_partkey
    ),
    bfs AS (
      SELECT (SELECT min(l_partkey) FROM lineitem) AS id, 0 AS d
      UNION
      SELECT e.dst, bfs.d + 1
      FROM bfs JOIN edges e ON e.src = bfs.id
      WHERE bfs.d < 3
    )
    SELECT id AS part, CAST(min(d) AS BIGINT) AS depth
    FROM bfs GROUP BY id ORDER BY part
"""

def _kcore_oracle_sql(k: int = 80, rounds: int = 8) -> str:
    """Unrolled k-core peel: exactly ``rounds`` HAVING + semi-join
    rounds (converged rounds are no-ops), matching stages/graph.kcore
    with the same (k, max_rounds)."""
    parts = [
        """e0 AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey <> b.l_partkey
    )"""
    ]
    for i in range(1, rounds + 1):
        # MATERIALIZED is load-bearing: inlined, each round re-evaluates
        # the whole chain below it (measured 30 s at sf0.001 vs ~1 s)
        parts.append(
            f"v{i} AS MATERIALIZED (SELECT src FROM e{i - 1} "
            f"GROUP BY src HAVING count(*) >= {k})"
        )
        parts.append(
            f"e{i} AS MATERIALIZED (SELECT e.src, e.dst FROM e{i - 1} e "
            f"JOIN v{i} s ON e.src = s.src JOIN v{i} d ON e.dst = d.src)"
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT src AS part, count(*)::BIGINT AS degree"
        + f" FROM e{rounds} GROUP BY src ORDER BY part"
    )


ORACLE_SQL["basket_kcore"] = _kcore_oracle_sql()

ORACLE_SQL["docs_token_offsets"] = r"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, text AS rest,
               CAST(0 AS BIGINT) AS pos, CAST(-1 AS BIGINT) AS token_idx,
               CAST(NULL AS VARCHAR) AS token,
               CAST(NULL AS BIGINT) AS start_char, CAST(NULL AS BIGINT) AS end_char
        FROM documents WHERE doc_id < 40
        UNION ALL
        SELECT doc_id, substr(stripped, length(tok) + 1), pos + ws + length(tok),
               token_idx + 1, tok, pos + ws, pos + ws + length(tok)
        FROM (
            SELECT doc_id, pos, token_idx,
                   length(rest) - length(ltrim(rest, E' \t\r\n')) AS ws,
                   ltrim(rest, E' \t\r\n') AS stripped,
                   regexp_extract(ltrim(rest, E' \t\r\n'), '^[^ \t\r\n]+') AS tok
            FROM toks
        ) WHERE stripped <> ''
    )
    SELECT doc_id, token_idx, token, start_char, end_char
    FROM toks WHERE token_idx >= 0 ORDER BY doc_id, token_idx
"""

ORACLE_SQL["events_trailing_hour_sum"] = """
    WITH e AS (
      SELECT event_id, user_id, ts,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events
    )
    SELECT event_id, user_id, ts,
           sum(cents) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           )::BIGINT AS trailing_cents
    FROM e ORDER BY user_id, ts, event_id
"""

ORACLE_SQL["events_active_time"] = """
    WITH e AS (
      SELECT user_id, ts, ts + INTERVAL 30 MINUTE AS te FROM events
    ), m AS (
      SELECT user_id, ts, te,
             max(te) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_max
      FROM e
    ), f AS (
      SELECT user_id, ts, te,
             CASE WHEN prev_max IS NULL OR ts > prev_max THEN 1 ELSE 0 END AS brk
      FROM m
    ), g AS (
      SELECT user_id, ts, te,
             sum(brk) OVER (
               PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
             ) AS island
      FROM f
    ), i AS (
      SELECT user_id, island, min(ts) AS s, max(te) AS e2, count(*) AS ne
      FROM g GROUP BY user_id, island
    )
    SELECT user_id, sum(ne)::BIGINT AS n_events,
           count(*)::BIGINT AS n_islands,
           sum(epoch_us(e2) - epoch_us(s))::BIGINT AS active_us
    FROM i GROUP BY user_id ORDER BY user_id
"""

ORACLE_SQL["events_engagement_gini"] = """
    WITH uc AS (
      SELECT user_id, count(*)::BIGINT AS n FROM events GROUP BY user_id
    ), r AS (
      SELECT n, row_number() OVER (ORDER BY n, user_id) AS i,
             count(*) OVER () AS nu, sum(n) OVER () AS tot
      FROM uc
    )
    SELECT max(nu)::BIGINT AS n_users,
           CAST(sum((2 * i - nu - 1) * n) AS DOUBLE)
             / CAST(max(nu) * max(tot) AS DOUBLE) AS gini
    FROM r
"""

ORACLE_SQL["orders_chi2"] = """
    WITH cells AS (
      SELECT o_orderstatus AS s, o_orderpriority AS p, count(*)::BIGINT AS obs
      FROM orders GROUP BY 1, 2
    ), rt AS (SELECT s, sum(obs)::BIGINT AS rs FROM cells GROUP BY s),
    ct AS (SELECT p, sum(obs)::BIGINT AS cs FROM cells GROUP BY p),
    tot AS (SELECT sum(obs)::BIGINT AS n FROM cells),
    terms AS (
      SELECT c.s, c.p, c.obs,
             CAST(rt.rs * ct.cs AS DOUBLE) / CAST(tot.n AS DOUBLE) AS exp
      FROM cells c JOIN rt USING (s) JOIN ct USING (p) CROSS JOIN tot
    )
    SELECT (SELECT n FROM tot) AS n,
           ((SELECT count(*) FROM rt) - 1) * ((SELECT count(*) FROM ct) - 1) AS dof,
           sum((CAST(obs AS DOUBLE) - exp) * (CAST(obs AS DOUBLE) - exp) / exp
               ORDER BY s, p) AS chi2
    FROM terms
"""

ORACLE_SQL["orders_time_decay"] = """
    WITH o AS (
      SELECT o_custkey, o_orderkey,
             (1009756800000000 - epoch_us(o_orderdate)) // 86400000000 AS days,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_custkey, count(*)::BIGINT AS n_orders,
           sum(CAST(cents AS DOUBLE) * pow(2.0, -CAST(days AS DOUBLE) / 30.0)
               ORDER BY days DESC, o_orderkey) AS decayed_cents
    FROM o GROUP BY o_custkey ORDER BY o_custkey
"""

ORACLE_SQL["supplier_part_coverage"] = """
    WITH u AS (
      SELECT DISTINCT l_partkey AS p FROM lineitem
      JOIN part ON p_partkey = l_partkey WHERE p_size <= 2
    ), sp AS (
      SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
      WHERE l_partkey IN (SELECT p FROM u)
    ), cov AS (SELECT s, count(*)::BIGINT AS n_parts FROM sp GROUP BY s),
    tot AS (SELECT count(DISTINCT p)::BIGINT AS universe FROM sp)
    SELECT s AS suppkey, n_parts, tot.universe,
           CAST(CASE WHEN n_parts = tot.universe THEN 1 ELSE 0 END AS BIGINT)
             AS full_cover
    FROM cov CROSS JOIN tot ORDER BY n_parts DESC, s LIMIT 10
"""

ORACLE_SQL["corpus_mip_levels"] = f"""
    WITH i AS (
      SELECT image_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
             CAST(floor(log2(greatest(w, h))) AS BIGINT) + 1 AS nlev
      FROM read_parquet('{_CORPUS_GLOB}')
    ), e AS (
      SELECT image_id, w, h, unnest(range(nlev)) AS l FROM i
    )
    SELECT image_id, CAST(l AS BIGINT) AS level,
           greatest(w >> l, 1) AS w_l, greatest(h >> l, 1) AS h_l
    FROM e ORDER BY image_id, level
"""

ORACLE_SQL["basket_rules"] = """
    WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
    n AS (SELECT count(DISTINCT ok)::BIGINT AS n_orders FROM op),
    isup AS (SELECT p, count(*)::BIGINT AS sup FROM op GROUP BY p),
    pairs AS (
      SELECT a.p AS ant, b.p AS cons, count(*)::BIGINT AS sup_ab
      FROM op a JOIN op b ON a.ok = b.ok AND a.p < b.p
      GROUP BY 1, 2 HAVING count(*) >= 3
    )
    SELECT pr.ant, pr.cons, pr.sup_ab, ia.sup AS sup_a, ib.sup AS sup_b,
           CAST(pr.sup_ab AS DOUBLE) / CAST(ia.sup AS DOUBLE) AS confidence,
           CAST(pr.sup_ab * n.n_orders AS DOUBLE)
             / CAST(ia.sup * ib.sup AS DOUBLE) AS lift
    FROM pairs pr CROSS JOIN n
    JOIN isup ia ON pr.ant = ia.p
    JOIN isup ib ON pr.cons = ib.p
    ORDER BY pr.sup_ab DESC, pr.ant, pr.cons LIMIT 20
"""

ORACLE_SQL["corpus_crop_plan"] = f"""
    WITH f AS (
      SELECT image_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
             list_reduce(
               list_prepend(14695981039346656037::HUGEINT,
                 list_transform(range(1, length(image_id) + 1),
                                i -> ascii(image_id[i]))),
               (acc, b) -> (xor(acc::HUGEINT, b::HUGEINT)
                            * 1099511628211::HUGEINT)
                           % 18446744073709551616::HUGEINT) AS base
      FROM read_parquet('{_CORPUS_GLOB}')
    ), g AS (
      SELECT image_id, w, h,
             (xor(base, 120::HUGEINT) * 1099511628211::HUGEINT)
               % 18446744073709551616::HUGEINT AS hx,
             (xor(base, 121::HUGEINT) * 1099511628211::HUGEINT)
               % 18446744073709551616::HUGEINT AS hy
      FROM f WHERE w >= 16 AND h >= 16
    )
    SELECT image_id,
           CAST(hx % CAST(w - 15 AS HUGEINT) AS BIGINT) AS x0,
           CAST(hy % CAST(h - 15 AS HUGEINT) AS BIGINT) AS y0,
           CAST(hx % CAST(w - 15 AS HUGEINT) AS BIGINT) + 16 AS x1,
           CAST(hy % CAST(h - 15 AS HUGEINT) AS BIGINT) + 16 AS y1
    FROM g ORDER BY image_id
"""

ORACLE_SQL["events_user_entropy"] = """
    WITH tc AS (
      SELECT user_id, event_type, count(*)::BIGINT AS c
      FROM events GROUP BY user_id, event_type
    ), agg AS (
      SELECT user_id, sum(c)::BIGINT AS n, count(*)::BIGINT AS n_types,
             sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) ORDER BY event_type) AS s
      FROM tc GROUP BY user_id
    )
    SELECT user_id, n, n_types,
           ln(CAST(n AS DOUBLE)) - s / CAST(n AS DOUBLE) AS entropy
    FROM agg ORDER BY user_id
"""

ORACLE_SQL["corpus_patch_grid"] = f"""
    WITH i AS (
      SELECT image_id, CAST(w AS BIGINT) // 16 AS nx, CAST(h AS BIGINT) // 16 AS ny
      FROM read_parquet('{_CORPUS_GLOB}') WHERE image_id < 'img00000030'
    ), p AS (
      SELECT image_id, nx, unnest(range(nx * ny)) AS patch_idx
      FROM i WHERE nx * ny > 0
    )
    SELECT image_id, patch_idx::BIGINT AS patch_idx,
           (patch_idx % nx)::BIGINT AS px, (patch_idx // nx)::BIGINT AS py,
           ((patch_idx % nx) * 16)::BIGINT AS x0,
           ((patch_idx // nx) * 16)::BIGINT AS y0
    FROM p ORDER BY image_id, patch_idx
"""

ORACLE_SQL["events_weekly_active"] = """
    WITH ud AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ), exp AS (
      SELECT DISTINCT user_id, day + k * INTERVAL 1 DAY AS wday
      FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS k) g
    )
    SELECT wday, count(*)::BIGINT AS active_users
    FROM exp GROUP BY wday ORDER BY wday
"""

ORACLE_SQL["docs_postings"] = """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), pairs AS (
      SELECT DISTINCT doc_id, term FROM toks
    )
    SELECT term, count(*)::BIGINT AS df,
           string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
    FROM pairs GROUP BY term ORDER BY term
"""

ORACLE_SQL["lineitem_weighted_median"] = """
    WITH a AS (
      SELECT l_returnflag AS k,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS p,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem
    ), c AS (
      SELECT k, p, sum(w)::BIGINT AS w FROM a GROUP BY k, p
    ), cum AS (
      SELECT k, p,
             sum(w) OVER (PARTITION BY k ORDER BY p)::BIGINT AS cw,
             sum(w) OVER (PARTITION BY k)::BIGINT AS tot
      FROM c
    )
    SELECT k AS l_returnflag,
           CAST(min(p) AS DOUBLE) / 100.0 AS weighted_median_price
    FROM cum WHERE 2 * cw >= tot GROUP BY k ORDER BY k
"""

ORACLE_SQL["events_minute_gapfill"] = """
    WITH m AS (
      SELECT date_trunc('minute', ts) AS minute,
             sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))::BIGINT AS cents,
             count(*)::BIGINT AS n
      FROM events GROUP BY 1
    ), bounds AS (
      SELECT min(minute) AS mn, max(minute) AS mx FROM m
    ), grid AS (
      SELECT unnest(generate_series(mn, mx, INTERVAL 1 MINUTE)) AS minute
      FROM bounds
    )
    SELECT g.minute, coalesce(m.n, 0) AS n,
           coalesce(CAST(m.cents AS DOUBLE) / 100.0, 0.0) AS sum_value
    FROM grid g LEFT JOIN m ON g.minute = m.minute
    ORDER BY g.minute
"""

ORACLE_SQL["docs_bpe_pairs"] = """
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ), pairs AS (
      SELECT unnest(list_transform(range(1, length(tok)),
                                   i -> substr(tok, i, 2))) AS pair
      FROM toks
    )
    SELECT pair, count(*)::BIGINT AS n
    FROM pairs GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 50
"""

ORACLE_SQL["corpus_aspect_buckets"] = f"""
    WITH a AS (
      SELECT (CAST(w AS BIGINT) * 100) // CAST(h AS BIGINT) AS aspect_pct,
             CAST(w AS BIGINT) * CAST(h AS BIGINT) AS px
      FROM read_parquet('{_CORPUS_GLOB}')
    )
    SELECT aspect_pct, count(*)::BIGINT AS n,
           CAST(sum(px) AS BIGINT) AS sum_px,
           CAST(sum(px) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_px
    FROM a GROUP BY aspect_pct ORDER BY aspect_pct
"""

ORACLE_SQL["embeddings_knn_classify"] = """
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 50
    ), nn AS (
      SELECT q.qid, e.label,
             row_number() OVER (
               PARTITION BY q.qid
               ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC, e.vec_id
             ) AS rnk
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id <> q.qid
    ), votes AS (
      SELECT qid, label, count(*) AS c FROM nn WHERE rnk <= 5 GROUP BY qid, label
    ), sel AS (
      SELECT qid, label,
             row_number() OVER (PARTITION BY qid ORDER BY c DESC, label ASC) AS r
      FROM votes
    )
    SELECT qid AS query_id, CAST(label AS BIGINT) AS label
    FROM sel WHERE r = 1 ORDER BY query_id
"""

# exact Mann-Whitney AUC on distinct integer-cent scores: the windowed
# prefix-of-negatives mirrors the engine's per-block exclusive cumsum,
# the HUGEINT numerator keeps the products exact, and the single final
# division is the only float op in both engines
ORACLE_SQL["events_auc"] = """
    WITH s AS (
      SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
             CAST(event_type = 'purchase' AS BIGINT) AS pos
      FROM events
    ), d AS (
      SELECT c, sum(pos) AS np_, count(*) - sum(pos) AS nn
      FROM s GROUP BY c
    ), w AS (
      SELECT np_, nn,
             coalesce(sum(nn) OVER (
               ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS negs_below
      FROM d
    ), tot AS (
      SELECT CAST(sum(np_ * (2 * negs_below + nn)) AS HUGEINT) AS num2,
             CAST(sum(np_) AS BIGINT) AS n_pos,
             CAST(sum(nn) AS BIGINT) AS n_neg
      FROM w
    )
    SELECT CAST(num2 AS DOUBLE) / CAST(2 * n_pos * n_neg AS DOUBLE) AS auc,
           n_pos, n_neg
    FROM tot
"""

# first-min argmin over the fixed bucket list = row_number ordered by
# (exact integer cross-product distortion, bucket index)
ORACLE_SQL["corpus_resize_buckets"] = f"""
    WITH b(idx, tw, th) AS (VALUES
      (0, 64, 64), (1, 48, 64), (2, 64, 48), (3, 32, 64),
      (4, 64, 32), (5, 40, 56), (6, 56, 40)
    ), r AS (
      SELECT image_id, tw, th,
             abs(CAST(w AS BIGINT) * th - CAST(h AS BIGINT) * tw) AS distortion,
             row_number() OVER (
               PARTITION BY image_id
               ORDER BY abs(CAST(w AS BIGINT) * th - CAST(h AS BIGINT) * tw),
                        idx
             ) AS rn
      FROM read_parquet('{_CORPUS_GLOB}') CROSS JOIN b
    )
    SELECT image_id, CAST(tw AS BIGINT) AS target_w,
           CAST(th AS BIGINT) AS target_h, distortion
    FROM r WHERE rn = 1 ORDER BY image_id
"""

# letterbox geometry: same bucket argmin as corpus_resize_buckets, then
# the width/height-limited CASE via the exact integer cross-product and
# floor divisions — mirrored arithmetic, zero float ratios
ORACLE_SQL["corpus_letterbox"] = f"""
    WITH b(idx, tw, th) AS (VALUES
      (0, 64, 64), (1, 48, 64), (2, 64, 48), (3, 32, 64),
      (4, 64, 32), (5, 40, 56), (6, 56, 40)
    ), r AS (
      SELECT image_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
             CAST(tw AS BIGINT) AS tw, CAST(th AS BIGINT) AS th,
             row_number() OVER (
               PARTITION BY image_id
               ORDER BY abs(CAST(w AS BIGINT) * th - CAST(h AS BIGINT) * tw),
                        idx
             ) AS rn
      FROM read_parquet('{_CORPUS_GLOB}') CROSS JOIN b
    ), g AS (
      SELECT image_id, tw AS target_w, th AS target_h,
             CASE WHEN w * th >= h * tw THEN tw ELSE (w * th) // h END AS scaled_w,
             CASE WHEN w * th >= h * tw THEN (h * tw) // w ELSE th END AS scaled_h
      FROM r WHERE rn = 1
    )
    SELECT image_id, target_w, target_h, scaled_w, scaled_h,
           (target_w - scaled_w) // 2 AS pad_x,
           (target_h - scaled_h) // 2 AS pad_y
    FROM g ORDER BY image_id
"""

# brute-force ground truth for the deletion-neighborhood join: every
# distinct-name pair within levenshtein 1
ORACLE_SQL["customer_fuzzy_pairs"] = """
    WITH t AS (SELECT DISTINCT c_name AS tok FROM customer)
    SELECT a.tok AS tok_a, b.tok AS tok_b
    FROM t a, t b
    WHERE a.tok < b.tok AND levenshtein(a.tok, b.tok) <= 1
    ORDER BY tok_a, tok_b
"""

# exact per-type rank statistics: rank()-1 = strictly-below count, the
# (type, cents) partition count = tie count — integer-only, so the
# value hash is exact
ORACLE_SQL["events_value_percentile"] = """
    SELECT event_id, event_type,
           CAST(rank() OVER (PARTITION BY event_type ORDER BY c) - 1 AS BIGINT) AS n_lt,
           CAST(count(*) OVER (PARTITION BY event_type, c) AS BIGINT) AS n_eq,
           CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_type
    FROM (SELECT event_id, event_type,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
          FROM events)
"""

# Q17 decorrelated: the per-part average is compared via the exact
# integer cross-multiplication 5*qty*n < sum_qty, so both engines pick
# the same rows; cents→dollars→/7 are the only (mirrored) float ops
ORACLE_SQL["lineitem_small_qty_revenue"] = """
    WITH t AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           (CAST(coalesce(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)), 0)
                 AS DOUBLE) / 100.0) / 7.0 AS avg_yearly
    FROM lineitem l JOIN t ON l.l_partkey = t.l_partkey
    WHERE 5 * CAST(l.l_quantity AS BIGINT) * t.n < t.sum_qty
"""

# sliding-window chunk expansion: same trim/regex token count as
# docs_token_stats, chunk fan-out via unnest(range(...)) — integer-only
ORACLE_SQL["docs_chunk_text"] = """
    WITH n AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+'))
             END::BIGINT AS n
      FROM documents
    ), e AS (
      SELECT doc_id, n,
             unnest(range(1 + (greatest(n - 64, 0) + 47) // 48)) AS chunk_id
      FROM n WHERE n > 0
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(chunk_id * 48 AS BIGINT) AS tok_start,
           CAST(least(chunk_id * 48 + 64, n) AS BIGINT) AS tok_end
    FROM e
"""

# winsorized sum: quantile_disc bounds per group (same discrete
# convention as the engine's iterative-histogram stage), clip via
# least/greatest, int64 cents until the mirrored ÷100
ORACLE_SQL["lineitem_winsorized"] = """
    WITH c AS (
      SELECT l_returnflag,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM lineitem
    ), q AS (
      SELECT l_returnflag,
             quantile_disc(cents, 0.1) AS lo, quantile_disc(cents, 0.9) AS hi
      FROM c GROUP BY l_returnflag
    )
    SELECT c.l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(least(greatest(c.cents, q.lo), q.hi)) AS BIGINT)::DOUBLE / 100.0
             AS winsorized_sum
    FROM c JOIN q USING (l_returnflag)
    GROUP BY c.l_returnflag
"""

# sessionize (30-min strict gap, (ts, event_id) order) → per-session
# path → global count → deterministic top-k
ORACLE_SQL["events_session_paths"] = """
    WITH e AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, event_id, event_type,
             sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS sid
      FROM e
    ), p AS (
      SELECT user_id, sid,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM s GROUP BY user_id, sid
    ), c AS (
      SELECT path, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY path
    )
    SELECT path, n,
           CAST(row_number() OVER (ORDER BY n DESC, path ASC) AS BIGINT) AS rank
    FROM c ORDER BY n DESC, path ASC LIMIT 20
"""

# sweep-line peak concurrency: sessionize → ±1 marks (end + 1 µs keeps
# [start, end] inclusive), collapse per instant, running level, first
# instant achieving the max
ORACLE_SQL["events_max_concurrency"] = """
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM gaps
    ), iv AS (
      SELECT min(ts) AS s, max(ts) AS e FROM sess GROUP BY user_id, sid
    ), m AS (
      SELECT s AS ts, 1 AS d FROM iv
      UNION ALL
      SELECT e + INTERVAL 1 MICROSECOND, -1 FROM iv
    ), g AS (
      SELECT ts, sum(d) AS d FROM m GROUP BY ts
    ), r AS (
      SELECT ts, sum(d) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING) AS c
      FROM g
    )
    SELECT CAST(c AS BIGINT) AS max_concurrent, ts AS at_ts
    FROM r ORDER BY c DESC, ts ASC LIMIT 1
"""

# mutual top-k: both directed ranks ≤ k, self excluded, ties by
# (cosine desc, vec_id asc) exactly as knn_brute
ORACLE_SQL["embeddings_reciprocal_nn"] = """
    WITH e AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
                        b.vec_id
             ) AS rnk
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    ), t AS (SELECT src, dst, rnk FROM e WHERE rnk <= 3)
    SELECT x.src AS id_a, x.dst AS id_b,
           CAST(x.rnk AS BIGINT) AS rank_ab, CAST(y.rnk AS BIGINT) AS rank_ba
    FROM t x JOIN t y ON x.src = y.dst AND x.dst = y.src
    WHERE x.src < x.dst
    ORDER BY id_a, id_b
"""

# integer-exact weighted bottom-k: the docs_split FNV HUGEINT hash,
# top 43 bits scaled by << 20, floor-divided by the weight — identical
# arithmetic to the engine's uint64 path, so the set matches bit-wise
ORACLE_SQL["docs_weighted_sample"] = """
    SELECT doc_id, n_chars, CAST(rank_key AS BIGINT) AS rank_key FROM (
      SELECT doc_id, n_chars,
             (( (h // 2097152) << 20) // greatest(n_chars, 1)) AS rank_key
      FROM (
        SELECT doc_id, n_chars,
               list_reduce(
                 list_prepend(14695981039346656037::HUGEINT,
                   list_transform(range(0, 8), k ->
                     (doc_id::HUGEINT // CAST(power(2, 8*k) AS HUGEINT)) % 256)),
                 (acc, b) -> (xor(acc::HUGEINT, b::HUGEINT)
                              * 1099511628211::HUGEINT)
                             % 18446744073709551616::HUGEINT
               ) AS h
        FROM documents) t
    ) ORDER BY rank_key, doc_id LIMIT 128
"""

# Q3-shaped: segment × date-sliced join, exact-cents revenue, top 10
# (ties broken by orderkey, mirrored in the engine's sort keys)
ORACLE_SQL["orders_shipping_priority"] = """
    SELECT l.l_orderkey,
           o.o_orderdate, o.o_orderpriority,
           sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0 + 0.5)
                    AS BIGINT))::BIGINT::DOUBLE / 100.0 AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0 + 0.5)
                 AS BIGINT)) DESC, l.l_orderkey
    LIMIT 10
"""

# Q18-shaped: HAVING-gated quantity sum (exact centi-units) joined back
ORACLE_SQL["orders_large_qty"] = """
    WITH big AS (
      SELECT l_orderkey,
             sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT))::BIGINT AS qty_c
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) > 14000
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           big.qty_c::DOUBLE / 100.0 AS sum_qty,
           CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)::DOUBLE / 100.0
             AS o_totalprice
    FROM big
    JOIN orders o   ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) DESC, o.o_orderkey
    LIMIT 100
"""

# Q10-shaped: returned-line revenue per customer over one quarter, top 20
ORACLE_SQL["orders_returned_customers"] = """
    SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
           sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0 + 0.5)
                    AS BIGINT))::BIGINT::DOUBLE / 100.0 AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1998-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-04-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0 + 0.5)
                 AS BIGINT)) DESC, c.c_custkey
    LIMIT 20
"""

# Q14-shaped: monthly PROMO revenue share; the single float division is
# int64/int64 → double on both sides, so the share is bit-deterministic
ORACLE_SQL["part_promo_share"] = """
    SELECT date_trunc('month', l.l_shipdate)::TIMESTAMP AS month,
           sum(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                    * 100.0 + 0.5) AS BIGINT)
                    ELSE 0 END)::BIGINT AS promo_cents,
           sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0 + 0.5)
                    AS BIGINT))::BIGINT AS total_cents,
           sum(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                    * 100.0 + 0.5) AS BIGINT)
                    ELSE 0 END)::BIGINT::DOUBLE
             / sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0 + 0.5)
                        AS BIGINT))::BIGINT::DOUBLE AS promo_share
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY 1 ORDER BY 1
"""

# Q4-shaped EXISTS decorrelation: max shipdate per order replaces the
# correlated subquery; engine compares int64 microseconds identically
ORACLE_SQL["orders_priority_late"] = """
    SELECT o.o_orderpriority, count(*)::BIGINT AS n_late
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
"""

# running COUNT(DISTINCT) via first-occurrence flag + running sum —
# the two-window decomposition the engine mirrors with cumsum(flags)
ORACLE_SQL["events_cumulative_distinct"] = """
    SELECT user_id, event_id,
           sum(first_flag) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING)::BIGINT
             AS distinct_types
    FROM (
      SELECT user_id, event_id, ts,
             CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_flag
      FROM events)
"""

# exact-proportion per-source split: rank by (FNV-1a(doc_id), doc_id)
# inside the source, cut at floor(0.8n)/floor(0.9n)
ORACLE_SQL["docs_proportional_split"] = """
    SELECT doc_id, source,
           CASE WHEN rn <= CAST(floor(0.8 * n) AS BIGINT) THEN 'train'
                WHEN rn <= CAST(floor(0.9 * n) AS BIGINT) THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn,
             count(*) OVER (PARTITION BY source) AS n
      FROM (
        SELECT doc_id, source,
               list_reduce(
                 list_prepend(14695981039346656037::HUGEINT,
                   list_transform(range(0, 8), k ->
                     (doc_id::HUGEINT // CAST(power(2, 8*k) AS HUGEINT)) % 256)),
                 (acc, b) -> (xor(acc::HUGEINT, b::HUGEINT)
                              * 1099511628211::HUGEINT)
                             % 18446744073709551616::HUGEINT
               ) AS h
        FROM documents) t)
"""

# prefix-containment dedup: EXISTS other doc whose text starts with mine
ORACLE_SQL["docs_prefix_dups"] = """
    SELECT d.doc_id FROM documents d
    WHERE EXISTS (SELECT 1 FROM documents o
                  WHERE o.doc_id <> d.doc_id AND starts_with(o.text, d.text))
    ORDER BY d.doc_id
"""

# boolean AND search: docs containing every query term
ORACLE_SQL["docs_boolean_and"] = """
    SELECT doc_id FROM (
      SELECT doc_id, count(DISTINCT term) AS k
      FROM (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) AS term
            FROM documents)
      WHERE term IN ('vector', 'hash', 'stream')
      GROUP BY doc_id)
    WHERE k = 3
    ORDER BY doc_id
"""

# DAU / trailing-7-day WAU: the sliding COUNT(DISTINCT) as a correlated
# window count over distinct (user, day) pairs
ORACLE_SQL["events_dau_wau"] = """
    WITH p AS (
      SELECT DISTINCT user_id, date_trunc('day', ts)::TIMESTAMP AS day
      FROM events
    ), d AS (
      SELECT day, count(*)::BIGINT AS dau FROM p GROUP BY day
    )
    SELECT d.day, d.dau,
           (SELECT count(DISTINCT p2.user_id) FROM p p2
            WHERE p2.day BETWEEN d.day - INTERVAL 6 DAY AND d.day)::BIGINT AS wau,
           d.dau::DOUBLE /
           (SELECT count(DISTINCT p2.user_id) FROM p p2
            WHERE p2.day BETWEEN d.day - INTERVAL 6 DAY AND d.day)::DOUBLE
             AS stickiness
    FROM d ORDER BY d.day
"""

# sessionized view→purchase conversion per session-start day — the
# events_sessionize gap-and-island CTE chained into conditional flags
ORACLE_SQL["events_session_conversion"] = """
    WITH gaps AS (
      SELECT user_id, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts, event_type,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    ), per_session AS (
      SELECT user_id, session_id,
             date_trunc('day', min(ts))::TIMESTAMP AS day,
             CASE WHEN max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) = 1
                   AND max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1
                  THEN 1 ELSE 0 END AS converted
      FROM sess GROUP BY user_id, session_id
    )
    SELECT day, count(*)::BIGINT AS n_sessions,
           sum(converted)::BIGINT AS n_converted,
           sum(converted)::DOUBLE / count(*)::DOUBLE AS conversion
    FROM per_session GROUP BY day ORDER BY day
"""

# MATCH_RECOGNIZE greedy first-match: first view, first click after it,
# first purchase after that — three nested correlated mins
ORACLE_SQL["events_pattern_chain"] = """
    WITH v AS (
      SELECT user_id, min(ts) AS view_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT v.user_id, v.view_ts,
             (SELECT min(e.ts) FROM events e
              WHERE e.user_id = v.user_id AND e.event_type = 'click'
                AND e.ts > v.view_ts) AS click_ts
      FROM v
    ), p AS (
      SELECT c.user_id, c.view_ts, c.click_ts,
             (SELECT min(e.ts) FROM events e
              WHERE e.user_id = c.user_id AND e.event_type = 'purchase'
                AND e.ts > c.click_ts) AS purchase_ts
      FROM c WHERE c.click_ts IS NOT NULL
    )
    SELECT user_id, view_ts, click_ts, purchase_ts
    FROM p WHERE purchase_ts IS NOT NULL
"""

# cohort LTV triangle: first-order month × months-since, exact cents
ORACLE_SQL["orders_cohort_ltv"] = """
    WITH f AS (
      SELECT o_custkey,
             min(year(o_orderdate) * 12 + month(o_orderdate) - 1) AS cohort
      FROM orders GROUP BY o_custkey
    ), j AS (
      SELECT f.cohort,
             (year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1) - f.cohort
               AS age_months,
             CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders o JOIN f ON f.o_custkey = o.o_custkey
    )
    SELECT (cohort // 12)::BIGINT AS cohort_year,
           (cohort % 12 + 1)::BIGINT AS cohort_month,
           age_months::BIGINT AS age_months,
           count(*)::BIGINT AS n_orders,
           sum(cents)::BIGINT::DOUBLE / 100.0 AS revenue
    FROM j GROUP BY cohort, age_months
    ORDER BY cohort, age_months
"""

# Q7-shaped bilateral trade matrix between nation keys 0 and 1
ORACLE_SQL["nation_trade_matrix"] = """
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           year(l.l_shipdate)::BIGINT AS ship_year,
           sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0 + 0.5)
                    AS BIGINT))::BIGINT::DOUBLE / 100.0 AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    WHERE s.s_nationkey <> c.c_nationkey
    GROUP BY ns.n_name, nc.n_name, year(l.l_shipdate)
    ORDER BY supp_nation, cust_nation, ship_year
"""

# integer-exact linear attribution: cents//n + (rank <= cents%n),
# remainder to the earliest touches; untouched purchases → 'direct'
ORACLE_SQL["events_linear_attribution"] = """
    WITH b AS (
      SELECT user_id, ts AS bts, event_id AS bid,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ), t AS (
      SELECT user_id, ts, event_id, event_type
      FROM events WHERE event_type IN ('view', 'click')
    ), j AS (
      SELECT b.user_id, b.bid, b.cents, t.event_type,
             row_number() OVER (PARTITION BY b.user_id, b.bid
                                ORDER BY t.ts, t.event_id) AS rnk,
             count(*) OVER (PARTITION BY b.user_id, b.bid) AS n
      FROM b JOIN t ON t.user_id = b.user_id
                   AND t.ts >= b.bts - INTERVAL 7 DAY AND t.ts < b.bts
    ), credits AS (
      SELECT event_type AS channel,
             cents // n + CASE WHEN rnk <= cents % n THEN 1 ELSE 0 END AS credit
      FROM j
      UNION ALL
      SELECT 'direct', cents FROM b
      WHERE NOT EXISTS (SELECT 1 FROM t
                        WHERE t.user_id = b.user_id
                          AND t.ts >= b.bts - INTERVAL 7 DAY AND t.ts < b.bts)
    )
    SELECT channel, sum(credit)::BIGINT AS attributed_cents,
           sum(credit)::BIGINT::DOUBLE / 100.0 AS attributed
    FROM credits GROUP BY channel ORDER BY channel
"""

# OHLC resample: first/last by (ts, event_id), min/max, exact cents
ORACLE_SQL["events_hourly_ohlc"] = """
    WITH x AS (
      SELECT user_id, date_trunc('hour', ts)::TIMESTAMP AS hour,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_z
      FROM events
    )
    SELECT user_id, hour,
           max(CASE WHEN rn_a = 1 THEN cents END)::BIGINT::DOUBLE / 100.0 AS open,
           max(cents)::BIGINT::DOUBLE / 100.0 AS high,
           min(cents)::BIGINT::DOUBLE / 100.0 AS low,
           max(CASE WHEN rn_z = 1 THEN cents END)::BIGINT::DOUBLE / 100.0 AS close,
           count(*)::BIGINT AS n_events
    FROM x GROUP BY user_id, hour
"""

# mutual information in bits: (obs/n)·log2(obs·n/(rs·cs)), ordered fold
ORACLE_SQL["orders_mutual_info"] = """
    WITH cells AS (
      SELECT o_orderstatus AS s, o_orderpriority AS p, count(*)::BIGINT AS obs
      FROM orders GROUP BY 1, 2
    ), rt AS (SELECT s, sum(obs)::BIGINT AS rs FROM cells GROUP BY s),
    ct AS (SELECT p, sum(obs)::BIGINT AS cs FROM cells GROUP BY p),
    tot AS (SELECT sum(obs)::BIGINT AS n FROM cells)
    SELECT (SELECT n FROM tot) AS n,
           sum((CAST(obs AS DOUBLE) / CAST(tot.n AS DOUBLE))
               * log2(CAST(obs * tot.n AS DOUBLE)
                      / CAST(rt.rs * ct.cs AS DOUBLE))
               ORDER BY c.s, c.p) AS mi_bits
    FROM cells c JOIN rt USING (s) JOIN ct USING (p) CROSS JOIN tot
    GROUP BY tot.n
"""

# A/B readout: FNV arm assignment, per-user any-purchase conversion,
# pooled two-proportion z — float expressions in the engine's op order
ORACLE_SQL["events_ab_test"] = """
    WITH u AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'purchase'
                       AND CAST(floor(value * 100.0 + 0.5) AS BIGINT) >= 15000
                      THEN 1 ELSE 0 END) AS conv,
             list_reduce(
               list_prepend(14695981039346656037::HUGEINT,
                 list_transform(range(0, 8), k ->
                   (user_id::HUGEINT // CAST(power(2, 8*k) AS HUGEINT)) % 256)),
               (acc, b) -> (xor(acc::HUGEINT, b::HUGEINT)
                            * 1099511628211::HUGEINT)
                           % 18446744073709551616::HUGEINT
             ) % 2 AS arm
      FROM events GROUP BY user_id
    ), arms AS (
      SELECT arm::BIGINT AS arm, count(*)::BIGINT AS n_users,
             sum(conv)::BIGINT AS n_converted
      FROM u GROUP BY arm
    ), s AS (
      SELECT (SELECT n_converted FROM arms WHERE arm = 0)::DOUBLE
               / (SELECT n_users FROM arms WHERE arm = 0)::DOUBLE AS r0,
             (SELECT n_converted FROM arms WHERE arm = 1)::DOUBLE
               / (SELECT n_users FROM arms WHERE arm = 1)::DOUBLE AS r1,
             ((SELECT n_converted FROM arms WHERE arm = 0)
              + (SELECT n_converted FROM arms WHERE arm = 1))::DOUBLE
               / ((SELECT n_users FROM arms WHERE arm = 0)
                  + (SELECT n_users FROM arms WHERE arm = 1))::DOUBLE AS pp,
             (SELECT n_users FROM arms WHERE arm = 0)::BIGINT AS na,
             (SELECT n_users FROM arms WHERE arm = 1)::BIGINT AS nb
    )
    SELECT a.arm, a.n_users, a.n_converted,
           a.n_converted::DOUBLE / a.n_users::DOUBLE AS rate,
           CASE WHEN s.pp IN (0.0, 1.0) THEN 0.0
                ELSE (s.r1 - s.r0) / sqrt(s.pp * (1.0 - s.pp)
                       * (1.0 / s.na::DOUBLE + 1.0 / s.nb::DOUBLE))
           END AS z_stat
    FROM arms a CROSS JOIN s
    ORDER BY a.arm
"""

ORACLE_SQL["top_window_supplier"] = """
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                      AS BIGINT)) AS rev_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, rev.rev_cents::DOUBLE / 100.0 AS total_revenue
    FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
    WHERE rev.rev_cents = (SELECT max(rev_cents) FROM rev)
    ORDER BY s.s_suppkey
"""

ORACLE_SQL["part_supplier_census"] = """
    SELECT p.p_brand, p.p_type, p.p_size::BIGINT AS p_size,
           count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
"""

ORACLE_SQL["region_best_supplier"] = """
    WITH elig AS (
      SELECT DISTINCT l.l_partkey AS p_partkey, s.s_suppkey, s.s_name,
             CAST(floor(s.s_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
    )
    SELECT e.p_partkey, e.s_suppkey, e.s_name, e.bal_cents::DOUBLE / 100.0 AS s_acctbal
    FROM elig e
    WHERE e.bal_cents = (SELECT max(bal_cents) FROM elig e2
                         WHERE e2.p_partkey = e.p_partkey)
"""

ORACLE_SQL["nation_market_share"] = """
    WITH li AS (
      SELECT l.l_orderkey,
             CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0 + 0.5)
                  AS BIGINT) AS rev_cents,
             CASE WHEN n2.n_name = 'NATION_3' THEN 1 ELSE 0 END AS is_nat
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
    ),
    o AS (
      SELECT o.o_orderkey, year(o.o_orderdate) AS o_year
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'AMERICA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o.o_year::BIGINT AS o_year,
           sum(li.rev_cents * li.is_nat)::BIGINT AS nation_cents,
           sum(li.rev_cents)::BIGINT AS total_cents,
           sum(li.rev_cents * li.is_nat)::DOUBLE / sum(li.rev_cents)::DOUBLE AS mkt_share
    FROM li JOIN o ON o.o_orderkey = li.l_orderkey
    GROUP BY o.o_year
"""

ORACLE_SQL["docs_bm25_search"] = """
    WITH base AS (
      SELECT doc_id,
             len(regexp_split_to_array(lower(text), ' '))::BIGINT AS dl,
             len(list_filter(regexp_split_to_array(lower(text), ' '),
                             x -> x = 'hash'))::BIGINT AS tf0,
             len(list_filter(regexp_split_to_array(lower(text), ' '),
                             x -> x = 'merge'))::BIGINT AS tf1,
             len(list_filter(regexp_split_to_array(lower(text), ' '),
                             x -> x = 'window'))::BIGINT AS tf2
      FROM documents
    ),
    stats AS (
      SELECT count(*)::DOUBLE AS n,
             sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl,
             ln((count(*)::DOUBLE - sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)::DOUBLE + 0.5)
                / (sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)::DOUBLE + 0.5) + 1.0) AS idf0,
             ln((count(*)::DOUBLE - sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)::DOUBLE + 0.5)
                / (sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)::DOUBLE + 0.5) + 1.0) AS idf1,
             ln((count(*)::DOUBLE - sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END)::DOUBLE + 0.5)
                / (sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END)::DOUBLE + 0.5) + 1.0) AS idf2
      FROM base
    )
    SELECT b.doc_id,
           s.idf0 * ((b.tf0::DOUBLE * 2.2)
                     / (b.tf0::DOUBLE + 1.2 * (0.25 + 0.75 * (b.dl::DOUBLE / s.avgdl))))
         + s.idf1 * ((b.tf1::DOUBLE * 2.2)
                     / (b.tf1::DOUBLE + 1.2 * (0.25 + 0.75 * (b.dl::DOUBLE / s.avgdl))))
         + s.idf2 * ((b.tf2::DOUBLE * 2.2)
                     / (b.tf2::DOUBLE + 1.2 * (0.25 + 0.75 * (b.dl::DOUBLE / s.avgdl))))
           AS score
    FROM base b CROSS JOIN stats s
    WHERE b.tf0 + b.tf1 + b.tf2 > 0
    ORDER BY score DESC, b.doc_id
    LIMIT 10
"""

ORACLE_SQL["docs_kwic"] = """
    SELECT doc_id,
           regexp_extract(lower(text), '(.{0,20}hash.{0,20})', 1) AS snippet
    FROM documents
    WHERE regexp_matches(lower(text), 'hash')
"""

ORACLE_SQL["supplier_excess_share"] = """
    WITH pref AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
    pairs AS (
      SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS q
      FROM lineitem JOIN pref ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY 1, 2),
    tot AS (SELECT l_partkey, SUM(q) AS tq FROM pairs GROUP BY 1)
    SELECT s_suppkey,
           any_value(s_name) AS s_name,
           COUNT(*)::BIGINT AS n_parts
    FROM pairs
    JOIN tot USING (l_partkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE s_nationkey % 2 = 0 AND 4 * q > tq
    GROUP BY 1
    ORDER BY s_suppkey
"""

ORACLE_SQL["docs_unigram_logprob"] = """
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(text), ' ')) AS tok
      FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
    ),
    vocab AS (SELECT tok, count(*)::BIGINT AS c FROM toks GROUP BY 1),
    tot AS (SELECT count(*)::BIGINT AS t FROM toks)
    SELECT doc_id,
           sum(tf)::BIGINT AS n_tokens,
           sum(CAST(tf AS DOUBLE)
               * ln(CAST(c AS DOUBLE) / CAST(tot.t AS DOUBLE))
               ORDER BY tok)
             / CAST(sum(tf) AS DOUBLE) AS avg_logprob
    FROM tf JOIN vocab USING (tok) CROSS JOIN tot
    GROUP BY doc_id, tot.t
"""


ORACLE_SQL["docs_dup_source_matrix"] = (
    "WITH pairs AS MATERIALIZED (" + ORACLE_SQL["docs_minhash_dups"] + """)
    SELECT least(da.source, db.source) AS src_a,
           greatest(da.source, db.source) AS src_b,
           count(*)::BIGINT AS n_pairs
    FROM pairs
    JOIN documents da ON da.doc_id = pairs.id_a
    JOIN documents db ON db.doc_id = pairs.id_b
    GROUP BY 1, 2
    ORDER BY 1, 2
"""
)


ORACLE_SQL["customer_fuzzy_groups"] = (
    "WITH RECURSIVE pairs AS MATERIALIZED ("
    + ORACLE_SQL["customer_fuzzy_pairs"]
    + """),
    edges AS MATERIALIZED (
      SELECT tok_a AS a, tok_b AS b FROM pairs
      UNION ALL SELECT tok_b, tok_a FROM pairs),
    reach(tok, r) AS (
      SELECT a, b FROM edges
      UNION
      SELECT reach.tok, e.b FROM reach JOIN edges e ON reach.r = e.a
    )
    SELECT tok, least(tok, min(r)) AS rep FROM reach GROUP BY tok ORDER BY tok
"""
)


ORACLE_SQL["corpus_caption_conflicts"] = f"""
    WITH c AS (SELECT image_id, caption, phash FROM read_parquet('{_CORPUS_GLOB}'))
    SELECT a.image_id AS id_a, b.image_id AS id_b, a.caption AS caption,
           CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
    FROM c a JOIN c b ON a.caption = b.caption AND a.image_id < b.image_id
    WHERE bit_count(xor(a.phash, b.phash)) > 4
"""


ORACLE_SQL["docs_heavy_hitters"] = """
    WITH toks AS (
      SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents
    )
    SELECT term, count(*)::BIGINT AS n
    FROM toks
    GROUP BY term
    HAVING count(*) * 31 > (SELECT count(*) FROM toks)
    ORDER BY term
"""


ORACLE_SQL["docs_lang_confusion"] = (
    "WITH pred AS MATERIALIZED ("
    + ORACLE_SQL["docs_langid"]
    + """)
    SELECT d.lang, p.lang_pred, count(*)::BIGINT AS n
    FROM documents d JOIN pred p USING (doc_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
"""
)


ORACLE_SQL["docs_vocab_growth"] = """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ),
    mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
    cp AS (SELECT i AS decile, (i * m) // 10 AS threshold
           FROM range(1, 11) t(i) CROSS JOIN mx)
    SELECT decile, threshold,
           (SELECT count(*)::BIGINT FROM toks WHERE doc_id < threshold)
             AS n_tokens,
           (SELECT count(DISTINCT tok)::BIGINT FROM toks
             WHERE doc_id < threshold) AS vocab
    FROM cp ORDER BY decile
"""


ORACLE_SQL["events_point_in_time_join"] = (
    "WITH scd AS MATERIALIZED ("
    + ORACLE_SQL["events_scd2"]
    + """)
    SELECT o.o_custkey AS user_id, o.o_orderdate, o.o_orderkey,
           s.event_type
    FROM orders o
    LEFT JOIN scd s
      ON s.user_id = o.o_custkey
     AND s.valid_from <= o.o_orderdate
     AND (s.valid_to IS NULL OR o.o_orderdate < s.valid_to)
"""
)


ORACLE_SQL["basket_transitivity"] = """
    WITH e AS (
      SELECT DISTINCT l1.l_partkey AS p1, l2.l_partkey AS p2
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    nodes AS (SELECT p1 AS n FROM e UNION ALL SELECT p2 FROM e),
    deg AS (SELECT n, count(*)::BIGINT AS d FROM nodes GROUP BY n),
    w AS (SELECT sum(d * (d - 1) // 2)::BIGINT AS wedges FROM deg),
    t AS (
      SELECT count(*)::BIGINT AS triangles
      FROM e e1
      JOIN e e2 ON e1.p2 = e2.p1
      JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
    )
    SELECT triangles, wedges,
           (3.0 * CAST(triangles AS DOUBLE)) / CAST(wedges AS DOUBLE)
             AS transitivity
    FROM t CROSS JOIN w
"""


ORACLE_SQL["lineitem_benford"] = """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(l_extendedprice * 100.0 + 0.5)
                                   AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT)
               AS digit
      FROM lineitem
    ),
    c AS (SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY digit),
    tot AS (SELECT sum(n)::BIGINT AS t FROM c)
    SELECT g.digit,
           coalesce(c.n, 0)::BIGINT AS n,
           CAST(coalesce(c.n, 0) AS DOUBLE) / CAST(tot.t AS DOUBLE) AS share,
           log10(1.0 + 1.0 / CAST(g.digit AS DOUBLE)) AS benford_expected
    FROM (SELECT unnest(range(1, 10)) AS digit) g
    LEFT JOIN c USING (digit) CROSS JOIN tot
    ORDER BY g.digit
"""


ORACLE_SQL["docs_dedup_spans"] = f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    g AS (
      SELECT doc_id, l,
             unnest(range(1, greatest(len(l) - {_SPAN_K} + 2, 1))) AS start
      FROM d
    ),
    g2 AS (
      SELECT doc_id, start,
             array_to_string(
               list_slice(l, start, start + {_SPAN_K} - 1), ' ') AS gram
      FROM g
    ),
    dup AS (SELECT gram FROM g2 GROUP BY gram HAVING count(*) >= 2),
    hits AS (SELECT doc_id, start FROM g2
             WHERE gram IN (SELECT gram FROM dup)),
    cover AS (SELECT DISTINCT doc_id, start + ofs.o AS pos
              FROM hits,
                   (SELECT unnest(range(0, {_SPAN_K})) AS o) ofs),
    tok AS (SELECT doc_id, unnest(l) AS tok,
                   unnest(range(1, len(l) + 1)) AS pos
            FROM d),
    kept AS (
      SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.pos) AS dedup_text
      FROM tok t LEFT JOIN cover c ON t.doc_id = c.doc_id AND t.pos = c.pos
      WHERE c.doc_id IS NULL
      GROUP BY t.doc_id
    ),
    rem AS (SELECT doc_id, count(*)::BIGINT AS n_removed
            FROM cover GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(k.dedup_text, '') AS dedup_text,
           len(d.l)::BIGINT AS n_tokens,
           coalesce(rem.n_removed, 0)::BIGINT AS n_removed
    FROM d
    LEFT JOIN kept k USING (doc_id)
    LEFT JOIN rem USING (doc_id)
    ORDER BY d.doc_id
"""


ORACLE_SQL["events_cusum"] = """
    WITH e AS (
      SELECT user_id, event_id, ts,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) - 6000 AS x
      FROM events
    ),
    p AS (
      SELECT user_id, event_id, ts,
             sum(x) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS pfx
      FROM e
    )
    SELECT user_id, event_id, ts,
           CAST(pfx - least(0, min(pfx) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING)) AS DOUBLE) / 100.0 AS cusum,
           CAST(CASE WHEN pfx - least(0, min(pfx) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING)) > 5000
                THEN 1 ELSE 0 END AS INTEGER) AS alarm
    FROM p
    ORDER BY user_id, event_id
"""

ORACLE_SQL["docs_zipf_census"] = """
    WITH tf AS (
      SELECT term, count(*)::BIGINT AS n
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS term
            FROM documents)
      GROUP BY term
    ), r AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, term) AS rn FROM tf
    )
    -- integer octave: bit_length-1 == floor(log2) for positive BIGINT,
    -- matching the engine's frexp derivation exactly (a libm log2
    -- fractionally under k at rn = 2^k would shift the boundary)
    SELECT CAST(length(bin(rn)) - 1 AS INTEGER) AS octave,
           count(*)::BIGINT AS n_terms,
           sum(n)::BIGINT AS total_freq,
           min(rn)::BIGINT AS min_rank
    FROM r GROUP BY octave ORDER BY octave
"""


def _cms_oracle_sql(k: int = 16, width: int = 16_384, depth: int = 4) -> str:
    """Count-Min in HUGEINT SQL, bit-equal to stages.sketch.count_min:
    FNV-1a term keys (docs_fingerprint's CTE), the splitmix64 finalizer
    (events_approx_users' mulmod decomposition), odd-ified second hash,
    double-hashed buckets, min over rows."""
    m = "18446744073709551616::HUGEINT"  # 2^64

    def mulmod(a: str, c: int) -> str:
        lo, hi = c & 0xFFFFFFFF, c >> 32
        return (
            f"(({a}) * {lo}::HUGEINT"
            f" + ((({a}) * {hi}::HUGEINT) % 4294967296::HUGEINT)"
            f" * 4294967296::HUGEINT) % {m}"
        )

    return f"""
    WITH tf AS (
      SELECT term, count(*)::BIGINT AS n
      FROM (SELECT unnest(list_filter(string_split(lower(text), ' '),
                                      t -> t <> '')) AS term
            FROM documents)
      GROUP BY term
    ), keyed AS (
      SELECT term, n,
             list_reduce(
               list_prepend(14695981039346656037::HUGEINT,
                 list_transform(range(1, length(term)+1), i -> ascii(term[i]))),
               (acc, b) -> (xor(acc::HUGEINT, b::HUGEINT)
                            * 1099511628211::HUGEINT) % {m}) AS k
      FROM tf
    ), z0 AS (
      SELECT term, n, k, (k + 11400714819323198485::HUGEINT) % {m} AS z
      FROM keyed
    ), z1 AS (
      SELECT term, n, k,
             {mulmod("xor(z, z // 1073741824::HUGEINT)", 0xBF58476D1CE4E5B9)} AS z
      FROM z0
    ), z2 AS (
      SELECT term, n, k,
             {mulmod("xor(z, z // 134217728::HUGEINT)", 0x94D049BB133111EB)} AS z
      FROM z1
    ), hashed AS (
      SELECT term, n, k,
             CASE WHEN xor(z, z // 2147483648::HUGEINT) % 2::HUGEINT
                       = 0::HUGEINT
                  THEN xor(z, z // 2147483648::HUGEINT) + 1::HUGEINT
                  ELSE xor(z, z // 2147483648::HUGEINT) END AS h2
      FROM z2
    ), buck AS (
      SELECT term, n, r.r AS r,
             ((k + r.r::HUGEINT * h2) % {m}) % {width}::HUGEINT AS b
      FROM hashed, (SELECT unnest(range({depth})) AS r) r
    ), cms AS (
      SELECT r, b, sum(n)::BIGINT AS tot FROM buck GROUP BY r, b
    ), probes AS (
      SELECT term, n FROM tf
      QUALIFY row_number() OVER (ORDER BY n DESC, term) <= {k}
    )
    SELECT p.term, p.n AS n_exact, min(c.tot) AS n_cms
    FROM probes p
    JOIN buck bk ON bk.term = p.term
    JOIN cms c ON c.r = bk.r AND c.b = bk.b
    GROUP BY p.term, p.n
    ORDER BY p.term
    """


ORACLE_SQL["docs_cms_counts"] = _cms_oracle_sql()

ORACLE_SQL["lineitem_zorder_layout"] = """
    WITH mx AS (
      SELECT length(bin(max(l_partkey))) AS bp,
             length(bin(max(l_suppkey))) AS bs
      FROM lineitem
    ), z AS (
      -- normalize to exactly 20 significant bits: narrow keys scale up
      -- (× 2^(20-b)), wide keys keep their top 20 bits (// 2^(b-20)) —
      -- greatest() keeps both exponents non-negative so power() never
      -- truncates to 0 (mirrors the engine's two-sided shift)
      SELECT l_partkey, l_suppkey,
             (SELECT CAST(sum(
                  ((((l_partkey * CAST(power(2, greatest(20 - mx.bp, 0)) AS BIGINT))
                       // CAST(power(2, greatest(mx.bp - 20, 0)) AS BIGINT))
                      // CAST(power(2, i) AS BIGINT)) % 2)
                    * CAST(power(4, i) AS BIGINT)
                + ((((l_suppkey * CAST(power(2, greatest(20 - mx.bs, 0)) AS BIGINT))
                       // CAST(power(2, greatest(mx.bs - 20, 0)) AS BIGINT))
                      // CAST(power(2, i) AS BIGINT)) % 2)
                    * 2 * CAST(power(4, i) AS BIGINT)) AS BIGINT)
              FROM range(20) t(i)) AS zkey
      FROM lineitem, mx
    )
    SELECT zkey // 17179869184 AS bucket,   -- >> (2*20 - 6) = 2^34
           count(*)::BIGINT AS n,
           min(l_partkey) AS partkey_min,
           max(l_partkey) AS partkey_max,
           min(l_suppkey) AS suppkey_min,
           max(l_suppkey) AS suppkey_max
    FROM z GROUP BY bucket ORDER BY bucket
"""

ORACLE_SQL["events_key_skew"] = """
    WITH kc AS (
      SELECT user_id, count(*)::BIGINT AS n FROM events GROUP BY user_id
    ), tot AS (SELECT sum(n)::BIGINT AS total FROM kc)
    SELECT user_id, n,
           n * 1000000 // tot.total AS share_ppm,
           (n * 32 + tot.total - 1) // tot.total AS salt
    FROM kc, tot
    QUALIFY row_number() OVER (ORDER BY n DESC, user_id) <= 20
    ORDER BY n DESC, user_id
"""


# KMV/theta set algebra re-expressed in SQL (same pattern as the HLL
# oracle): exact splitmix64 over user_id, per-type DISTINCT hash sets,
# θ = min of the two k-th-smallest saturation thresholds (NULL = the
# sketch holds the complete sample, θ = 1), counts of the strictly-
# below-θ samples and their direct overlap, one mirrored double
# division. Bit-equal to stages.sketch.kmv_set_algebra.
ORACLE_SQL["events_type_overlap_kmv"] = (
    "WITH ev AS (SELECT event_type, user_id FROM events"
    "             WHERE event_type IN ('click', 'view')), "
    + _splitmix64_sql("ev")
    + """, ha AS (SELECT DISTINCT h FROM hashed WHERE event_type = 'click'
    ), hb AS (SELECT DISTINCT h FROM hashed WHERE event_type = 'view'
    ), th AS (
      SELECT least(
               coalesce((SELECT CASE WHEN (SELECT count(*) FROM ha) >= 1024
                         THEN (SELECT h FROM ha ORDER BY h LIMIT 1 OFFSET 1023)
                         END),
                        (SELECT CASE WHEN (SELECT count(*) FROM hb) >= 1024
                         THEN (SELECT h FROM hb ORDER BY h LIMIT 1 OFFSET 1023)
                         END)),
               coalesce((SELECT CASE WHEN (SELECT count(*) FROM hb) >= 1024
                         THEN (SELECT h FROM hb ORDER BY h LIMIT 1 OFFSET 1023)
                         END),
                        (SELECT CASE WHEN (SELECT count(*) FROM ha) >= 1024
                         THEN (SELECT h FROM ha ORDER BY h LIMIT 1 OFFSET 1023)
                         END))) AS theta_h
    ), ta AS (SELECT h FROM ha, th WHERE th.theta_h IS NULL OR h < th.theta_h
    ), tb AS (SELECT h FROM hb, th WHERE th.theta_h IS NULL OR h < th.theta_h
    ), stats AS (
      SELECT (SELECT count(*) FROM ta) AS ca,
             (SELECT count(*) FROM tb) AS cb,
             (SELECT count(*) FROM (SELECT h FROM ta INTERSECT SELECT h FROM tb)) AS ci,
             (SELECT count(*) FROM (SELECT h FROM ta UNION SELECT h FROM tb)) AS cu,
             (SELECT CASE WHEN theta_h IS NULL THEN 1.0
                          ELSE CAST(theta_h AS DOUBLE)
                               / 18446744073709551616.0 END FROM th) AS theta
    )
    SELECT 'click' AS key_a, 'view' AS key_b,
           CAST(round(ca / theta) AS BIGINT) AS approx_a,
           CAST(round(cb / theta) AS BIGINT) AS approx_b,
           CAST(round(cu / theta) AS BIGINT) AS approx_union,
           CAST(round(ci / theta) AS BIGINT) AS approx_intersection,
           theta
    FROM stats"""
)


def _hll_overlap_oracle_sql() -> str:
    """HLL set algebra in SQL — the events_approx_users estimator tail
    applied three times over per-type and max-merged register sets
    (union is the HLL-native register max; intersection is
    inclusion–exclusion over the UNROUNDED estimates, mirroring
    stages.sketch.hll_set_algebra)."""

    def est(agg: str) -> str:
        raw = (
            f"((0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0)"
            f" / (CAST({agg}.s + (4096::HUGEINT - {agg}.n::HUGEINT)"
            f"          * 9007199254740992::HUGEINT AS DOUBLE)"
            f"    / 9007199254740992.0)"
        )
        return (
            f"CASE WHEN {raw} <= 10240.0 AND (4096 - {agg}.n) > 0"
            f" THEN 4096.0 * ln(4096.0 / (4096 - {agg}.n)) ELSE {raw} END"
        )

    return (
        "WITH ev AS (SELECT event_type, user_id FROM events"
        "             WHERE event_type IN ('click', 'view')), "
        + _splitmix64_sql("ev")
        + f""", rk AS (
      SELECT event_type,
             h // 4503599627370496::HUGEINT AS idx,
             CASE WHEN (h * 4096::HUGEINT) % 18446744073709551616::HUGEINT
                       = 0::HUGEINT THEN 53
                  ELSE 65 - length(bin(
                    (h * 4096::HUGEINT) % 18446744073709551616::HUGEINT))
             END AS rank
      FROM hashed
    ), regs AS (
      SELECT event_type, idx, max(rank) AS reg FROM rk GROUP BY event_type, idx
    ), regs_u AS (
      SELECT idx, max(reg) AS reg FROM regs GROUP BY idx
    ), agg_a AS (
      SELECT coalesce(sum(CAST(power(2.0, 53 - reg) AS HUGEINT)),
                      0::HUGEINT) AS s,
             count(*) AS n
      FROM regs WHERE event_type = 'click'
    ), agg_b AS (
      SELECT coalesce(sum(CAST(power(2.0, 53 - reg) AS HUGEINT)),
                      0::HUGEINT) AS s,
             count(*) AS n
      FROM regs WHERE event_type = 'view'
    ), agg_u AS (
      SELECT coalesce(sum(CAST(power(2.0, 53 - reg) AS HUGEINT)),
                      0::HUGEINT) AS s,
             count(*) AS n
      FROM regs_u
    ), est AS (
      SELECT {est("a")} AS ea, {est("b")} AS eb, {est("u")} AS eu
      FROM agg_a a, agg_b b, agg_u u
    )
    SELECT 'click' AS key_a, 'view' AS key_b,
           CAST(round(ea) AS BIGINT) AS approx_a,
           CAST(round(eb) AS BIGINT) AS approx_b,
           CAST(round(eu) AS BIGINT) AS approx_union,
           greatest(0, CAST(round(ea + eb - eu) AS BIGINT))
             AS approx_intersection
    FROM est"""
    )


ORACLE_SQL["events_type_overlap"] = _hll_overlap_oracle_sql()
