"""Distributed cardinality sketch (HyperLogLog).

``grouped_hll`` estimates distinct-count per group with the classic
HyperLogLog register array (Flajolet et al. 2007) over a deterministic
splitmix64 hash — per-block register partials (O(groups × 2^p) bytes)
merged by element-wise max, so the combine is associative/commutative
and shuffle-free: the per-block partial IS the map-side combine, the
driver merge is tiny. 2^p registers at p=12 gives ~1.6 % standard
error regardless of input size — the scale path for "how many distinct
users/URLs" over 10^10 rows where an exact groupby-distinct would
shuffle every key.

Deterministic by construction (fixed hash, max-merge), so results are
reproducible across runs/cluster sizes — and therefore SQL-pairable: not against DuckDB's
approx_count_distinct (its own, different HLL) but against this exact
algorithm re-expressed in SQL (HUGEINT splitmix64, register groupby,
scaled-integer register sum — ORACLE_SQL["events_approx_users"]).
Tests additionally bound the error vs the exact count.

The reference has no sketches; this extends the engine for
training-data dedup/coverage accounting (SURVEY.md §2 extensions).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..util import collect_arrow


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public-domain splitmix64 finalizer) —
    never Python hash() (process-salted, memory: ray-graft landmines)."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _hll_registers(keys: np.ndarray, p: int) -> np.ndarray:
    """HLL register array (uint8[2^p]) for one group's int64 keys."""
    m = 1 << p
    h = splitmix64(keys)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # top 64-p bits shifted up
    # rank = leading zeros of `rest` + 1, capped at 64-p+1 (rest==0)
    lz = np.full(len(h), 64 - p, dtype=np.uint8)
    mask = rest != 0
    if mask.any():
        # float log2 is exact for counting leading zeros of a uint64's
        # top bits only below 2^53 — use a bit-halving loop instead
        r = rest[mask]
        n = np.zeros(len(r), dtype=np.uint8)
        for shift in (32, 16, 8, 4, 2, 1):
            s = np.uint64(shift)
            high_zero = r < (np.uint64(1) << np.uint64(64 - shift))
            n[high_zero] += np.uint8(shift)
            r = np.where(high_zero, r << s, r)
        lz[mask] = n
    ranks = lz + 1
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, ranks)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range (linear counting)
    correction."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def _grouped_registers(ds: Dataset, key: str, value: str, p: int) -> dict:
    """Map-side HLL register partials per key, max-merged on the driver
    (registers are 2^p bytes per key — sketch-sized, never row-sized).
    Shared by grouped_hll and hll_set_algebra."""

    def partial(b: pa.Table) -> pa.Table:
        gcol = b.column(key)
        v = b.column(value).to_numpy(zero_copy_only=False).astype(np.int64)
        garr = gcol.to_numpy(zero_copy_only=False)
        keys_out, regs_out = [], []
        for g in np.unique(garr):
            regs = _hll_registers(v[garr == g], p)
            keys_out.append(g)
            regs_out.append(regs.tobytes())
        return pa.table(
            {key: pa.array(keys_out, gcol.type), "regs": pa.array(regs_out, pa.binary())}
        )

    parts = collect_arrow(
        ds.select_columns([key, value]).map_batches(partial, batch_format="pyarrow")
    )
    merged: dict = {}
    for g, blob in zip(parts.column(key).to_pylist(), parts.column("regs").to_pylist()):
        regs = np.frombuffer(blob, dtype=np.uint8)
        if g in merged:
            merged[g] = np.maximum(merged[g], regs)
        else:
            merged[g] = regs.copy()
    ktype = parts.column(key).type if parts.num_rows else pa.string()
    return merged, ktype


def grouped_hll(ds: Dataset, key: str, value: str, p: int = 12) -> pa.Table:
    """Approximate distinct ``value`` (int64) per ``key``. Returns a
    small driver table (key, approx_distinct:int64) sorted by key."""
    merged, ktype = _grouped_registers(ds, key, value, p)
    ks = sorted(merged)
    out = pa.table(
        {
            key: pa.array(ks, ktype),
            "approx_distinct": pa.array(
                [int(round(_hll_estimate(merged[k]))) for k in ks], pa.int64()
            ),
        }
    )
    return out


def hll_set_algebra(
    ds: Dataset, key: str, value: str, key_a, key_b, p: int = 12
) -> pa.Table:
    """HLL SET ALGEBRA between two key groups — union by register max
    (the HLL-native merge, same error as a single sketch) and
    intersection by inclusion–exclusion (|A|+|B|−|A∪B|, the standard
    HLL intersection estimator; its relative error grows as the true
    intersection shrinks — callers needing tight small-intersection
    bounds should switch to theta/KMV sketches).  One pass over the
    data, three estimates, register-sized driver state."""
    merged, _ = _grouped_registers(ds, key, value, p)
    ra = merged.get(key_a)
    rb = merged.get(key_b)
    m = 1 << p
    if ra is None:
        ra = np.zeros(m, dtype=np.uint8)
    if rb is None:
        rb = np.zeros(m, dtype=np.uint8)
    na = _hll_estimate(ra)
    nb = _hll_estimate(rb)
    nu = _hll_estimate(np.maximum(ra, rb))
    return pa.table(
        {
            "key_a": pa.array([str(key_a)], pa.string()),
            "key_b": pa.array([str(key_b)], pa.string()),
            "approx_a": pa.array([int(round(na))], pa.int64()),
            "approx_b": pa.array([int(round(nb))], pa.int64()),
            "approx_union": pa.array([int(round(nu))], pa.int64()),
            "approx_intersection": pa.array(
                [max(0, int(round(na + nb - nu)))], pa.int64()
            ),
        }
    )


def _kmv_partial(keys: np.ndarray, k: int) -> np.ndarray:
    """k minimum splitmix64 hash values of ``keys`` (ascending,
    ≤ k entries, deduped) — the KMV/bottom-k sketch partial. Merge =
    k smallest of the union; mergeable and exact-dedup within."""
    h = np.unique(splitmix64(keys.astype(np.uint64)))
    return h[:k]


def kmv_set_algebra(
    ds: Dataset, key: str, value: str, key_a, key_b, k: int = 1024
) -> pa.Table:
    """KMV (bottom-k / theta-sketch) SET ALGEBRA between two key
    groups — the tight-small-intersection alternative the
    `hll_set_algebra` docstring defers to. Each block emits its
    bottom-k hash values per key (k·8 bytes — sketch-sized); the
    driver k-merges, then estimates via the standard theta estimators:
    with θ = (k-th smallest of the union sample), every group's
    distinct count is |{h ∈ sketch : h < θ}| / θ (unbiased under the
    uniform-hash model), and the INTERSECTION is estimated from the
    DIRECT overlap of the two bottom-k samples below θ — not
    inclusion–exclusion — so its error scales with the Jaccard
    similarity rather than the union size (the reason theta beats HLL
    exactly when the intersection is small). Exact when a group's
    distinct count ≤ k (θ clamps to 1)."""
    FULL = np.float64(2.0**64)

    def partial(b: pa.Table) -> pa.Table:
        gcol = b.column(key)
        v = b.column(value).to_numpy(zero_copy_only=False).astype(np.int64)
        garr = gcol.to_numpy(zero_copy_only=False)
        keys_out, blobs = [], []
        for g in np.unique(garr):
            keys_out.append(g)
            blobs.append(_kmv_partial(v[garr == g], k).tobytes())
        return pa.table(
            {key: pa.array(keys_out, gcol.type), "mins": pa.array(blobs, pa.binary())}
        )

    parts = collect_arrow(
        ds.select_columns([key, value]).map_batches(partial, batch_format="pyarrow")
    )
    merged: dict = {}
    for g, blob in zip(parts.column(key).to_pylist(), parts.column("mins").to_pylist()):
        h = np.frombuffer(blob, dtype=np.uint64)
        if g in merged:
            merged[g] = np.unique(np.concatenate([merged[g], h]))[:k]
        else:
            merged[g] = h.copy()
    sa = merged.get(key_a, np.array([], dtype=np.uint64))
    sb = merged.get(key_b, np.array([], dtype=np.uint64))
    # standard theta set-operation estimator: θ = min(θ_A, θ_B) where
    # θ_X is the k-th smallest hash of a SATURATED sketch (1.0 when the
    # group's full distinct sample fits); retain strictly-below-θ
    # entries of both (complete samples below θ), scale counts by 1/θ
    th_a = sa[k - 1] if len(sa) >= k else None
    th_b = sb[k - 1] if len(sb) >= k else None
    if th_a is None and th_b is None:
        theta = 1.0
        sa_t, sb_t = sa, sb
    else:
        theta_h = min(x for x in (th_a, th_b) if x is not None)
        theta = float(theta_h) / FULL
        sa_t = sa[sa < theta_h]
        sb_t = sb[sb < theta_h]
    n_a = len(sa_t) / theta
    n_b = len(sb_t) / theta
    inter = len(np.intersect1d(sa_t, sb_t)) / theta
    n_u = len(np.union1d(sa_t, sb_t)) / theta
    return pa.table(
        {
            "key_a": pa.array([str(key_a)], pa.string()),
            "key_b": pa.array([str(key_b)], pa.string()),
            "approx_a": pa.array([int(round(n_a))], pa.int64()),
            "approx_b": pa.array([int(round(n_b))], pa.int64()),
            "approx_union": pa.array([int(round(n_u))], pa.int64()),
            "approx_intersection": pa.array([int(round(inter))], pa.int64()),
            "theta": pa.array([theta], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# Mergeable quantile summary
# ---------------------------------------------------------------------------


def _compress(values: np.ndarray, weights: np.ndarray, m: int) -> tuple:
    """Compress a weighted, sorted sample to ≤m (value, cumweight)
    anchor points by taking equally-spaced cumulative-weight cuts —
    each compression adds ≤ W/m rank error (GK-style bound)."""
    if len(values) <= m:
        return values, weights
    cum = np.cumsum(weights)
    total = cum[-1]
    targets = (np.arange(1, m + 1) / m) * total
    idx = np.unique(np.searchsorted(cum, targets, side="left").clip(0, len(values) - 1))
    w = np.diff(np.concatenate(([0.0], cum[idx])))
    return values[idx], w


def quantile_sketch(
    ds: Dataset, column: str, qs: list[float], m: int = 512
) -> pa.Table:
    """Mergeable one-pass quantile summary: each block sorts its values
    and compresses them to ≤m weighted anchors (~1/m rank error); the
    driver merges the tiny per-block summaries (sort + one more
    compression) and answers any quantile by cumulative-weight
    interpolation. Two compression levels ⇒ rank error ≤ 2·n/m —
    error-bound tested vs the exact sorted rank.

    This is the single-scan approximate complement to the exact
    iterative-histogram quantiles in stages/quantile.py: one pass and
    O(blocks·m) driver state vs 3–4 passes for exactness — the right
    trade when the pipeline only needs p50/p95/p99 dashboards over
    10^10 rows."""
    import pyarrow.compute as pc  # noqa: F401  (kept for parity with siblings)

    def partial(b: pa.Table) -> pa.Table:
        v = b.column(column).to_numpy(zero_copy_only=False).astype(np.float64)
        v = np.sort(v[~np.isnan(v)])
        pv, pw = _compress(v, np.ones(len(v)), m)
        return pa.table(
            {"v": pa.array(pv, pa.float64()), "w": pa.array(pw, pa.float64())}
        )

    parts = collect_arrow(ds.map_batches(partial, batch_format="pyarrow"))
    v = parts.column("v").to_numpy(zero_copy_only=False)
    w = parts.column("w").to_numpy(zero_copy_only=False)
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    v, w = _compress(v, w, m)
    cum = np.cumsum(w)
    total = cum[-1] if len(cum) else 0.0
    out_q, out_v = [], []
    for q in qs:
        if total == 0:
            out_q.append(q)
            out_v.append(None)
            continue
        k = min(int(np.searchsorted(cum, q * total, side="left")), len(v) - 1)
        out_q.append(q)
        out_v.append(float(v[k]))
    return pa.table(
        {"q": pa.array(out_q, pa.float64()), "value": pa.array(out_v, pa.float64())}
    )


def heavy_hitters(
    ds: Dataset, item_col: str, k: int = 10, capacity: int = 64
) -> dict:
    """Distributed heavy hitters with CERTIFIED error bounds (the
    TPUT / distributed-top-k family over per-block exact partial
    counts): each block keeps only its ``capacity`` most frequent
    items plus the max dropped count (its per-block undercount bound),
    so the exchange ships ≤ capacity+1 rows per block no matter how
    large the block vocabulary is. One groupby over kept items merges
    lower bounds and per-item present-block error mass; an item's
    upper bound adds the error budget of every block where it was NOT
    kept (upper = lower + total_err − present_err).

    Returns {"table": pa.Table(item, n, rank) of the top-k by lower
    bound (ties: item asc), "certified": bool, "bounds": pa.Table} —
    ``certified`` is True iff every returned count is exact
    (upper == lower: the item was kept in every block) AND the k-th
    lower bound ≥ the max upper bound outside the top-k, i.e. the
    returned set, counts and ordering provably equal the exact top-k.
    Callers that need guarantees must check it (the docs_heavy_terms
    query raises on False rather than returning unlabeled estimates).

    Scale note: the merge groupby output is ≤ blocks × capacity rows,
    shuffled by item; only that distinct-kept-item table (and nothing
    vocabulary-sized) reaches the driver for the final certify+sort —
    at extreme block counts replace it with sort-limit on the lower
    bound plus a max-upper aggregate (same semantics)."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum as _Sum

    SENTINEL = "\x00__block_err__"

    def partial(b: pa.Table) -> pa.Table:
        items = b.column(item_col).to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(items, return_counts=True)
        order = np.lexsort((uniq, -counts))
        kept = order[:capacity]
        err_b = int(counts[order[capacity]]) if len(order) > capacity else 0
        return pa.table(
            {
                "item": pa.array(
                    np.r_[uniq[kept], [SENTINEL]].tolist(), pa.string()
                ),
                "cnt": pa.array(np.r_[counts[kept], [0]], pa.int64()),
                "err_b": pa.array(
                    np.full(len(kept) + 1, err_b, dtype=np.int64), pa.int64()
                ),
            }
        )

    merged = collect_arrow(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("item")
        .aggregate(
            _Sum("cnt", alias_name="lower"), _Sum("err_b", alias_name="present_err")
        ),
        schema=pa.schema(
            [("item", pa.string()), ("lower", pa.int64()), ("present_err", pa.int64())]
        ),
    )
    sent = pc.equal(merged.column("item"), SENTINEL)
    total_err = int(
        pc.sum(merged.filter(sent).column("present_err")).as_py() or 0
    )
    merged = merged.filter(pc.invert(sent))
    items = merged.column("item").to_numpy(zero_copy_only=False)
    lower = merged.column("lower").to_numpy()
    upper = lower + (total_err - merged.column("present_err").to_numpy())
    order = np.lexsort((items, -lower))
    top, rest = order[:k], order[k:]
    max_rest_upper = int(upper[rest].max()) if len(rest) else total_err
    # total_err == 0 → no block dropped anything → every count exact and
    # complete, so ties resolve by the same (n desc, item asc) order SQL
    # uses; otherwise require STRICT dominance over every excluded upper
    # bound (a tie with an inexact bound could reorder under tie-break)
    # AND a full k rows — with fewer than k kept items and nonzero error
    # mass, unseen items could occupy the missing ranks (found by the
    # certified-implies-exact property sweep: k=4, capacity=2)
    certified = bool(
        len(top)
        and (upper[top] == lower[top]).all()
        and (
            total_err == 0
            or (
                len(top) == k
                and lower[top].min() > max(max_rest_upper, total_err)
            )
        )
    )
    table = pa.table(
        {
            "item": pa.array(items[top].tolist(), pa.string()),
            "n": pa.array(lower[top], pa.int64()),
            "rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int32), pa.int32()),
        }
    )
    bounds = pa.table(
        {
            "item": pa.array(items[order].tolist(), pa.string()),
            "lower": pa.array(lower[order], pa.int64()),
            "upper": pa.array(upper[order], pa.int64()),
        }
    )
    return {"table": table, "certified": certified, "bounds": bounds}


def count_min(
    ds: Dataset,
    item_col: str,
    key_fn,
    width: int = 16_384,
    depth: int = 4,
) -> np.ndarray:
    """Distributed Count-Min sketch (Cormode & Muthukrishnan 2005) over
    a string item column — the fixed-memory frequency table for key
    spaces where even the (term, n) pair table is too wide to ship
    (open-web token streams): every block folds its items into a
    ``depth × width`` int64 counter grid (map-side combine; the partial
    is O(depth·width) REGARDLESS of block vocabulary), partials merge
    by elementwise SUM (associative/commutative, shuffle-free), and a
    point estimate is the min over rows — an overestimate by at most
    the colliding mass, never an undercount.

    ``key_fn``: pa.Array → uint64 keys (the caller picks the hash so
    the sketch is SQL-pairable; queries pass the FNV-1a used by
    docs_fingerprint). Row r's bucket = ((key + r·h2) mod 2⁶⁴) mod
    width with h2 = odd(splitmix64(key)) — Kirsch–Mitzenmacher double
    hashing, exactly reproducible in HUGEINT SQL.

    Returns the merged (depth, width) counter grid; estimate with
    ``cms_estimate``."""

    def partial(b: pa.Table) -> pa.Table:
        g = (
            pa.table({item_col: b.column(item_col)})
            .group_by(item_col)
            .aggregate([(item_col, "count")])
        )
        keys = key_fn(g.column(item_col).combine_chunks())
        cnts = g.column(f"{item_col}_count").to_numpy().astype(np.int64)
        grid = np.zeros((depth, width), dtype=np.int64)
        with np.errstate(over="ignore"):
            z = splitmix64(keys)
            h2 = np.where(z % np.uint64(2) == 0, z + np.uint64(1), z)
            for r in range(depth):
                b_r = ((keys + np.uint64(r) * h2) % np.uint64(width)).astype(np.int64)
                np.add.at(grid[r], b_r, cnts)
        return pa.table(
            {
                "r": pa.array(np.arange(depth, dtype=np.int32), pa.int32()),
                "counts": pa.array(list(grid), pa.list_(pa.int64())),
            }
        )

    parts = collect_arrow(ds.map_batches(partial, batch_format="pyarrow"))
    rows = parts.column("r").to_numpy()
    grids = np.asarray(parts.column("counts").to_pylist(), dtype=np.int64)
    merged = np.zeros((depth, width), dtype=np.int64)
    np.add.at(merged, rows, grids)
    return merged


def cms_estimate(grid: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Point-estimate counts for uint64 ``keys`` against a count_min
    grid: min over rows of the double-hashed buckets."""
    depth, width = grid.shape
    with np.errstate(over="ignore"):
        z = splitmix64(keys)
        h2 = np.where(z % np.uint64(2) == 0, z + np.uint64(1), z)
        est = np.full(len(keys), np.iinfo(np.int64).max, dtype=np.int64)
        for r in range(depth):
            b_r = ((keys + np.uint64(r) * h2) % np.uint64(width)).astype(np.int64)
            est = np.minimum(est, grid[r, b_r])
    return est
