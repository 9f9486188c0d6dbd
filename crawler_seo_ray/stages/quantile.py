"""Exact grouped discrete quantiles without a distributed sort.

``grouped_quantile_disc`` computes, per group, the exact
``quantile_disc`` element (DuckDB convention: the value at 1-based rank
``ceil(q * n)`` in sorted order) of an int64 column — via iterative
histogram refinement instead of sorting:

  pass 0   per-block (group → count, min, max) partials, tiny merge
  pass 1.. per-block 1024-bin histograms of each still-active
           (group, q) search range, tiny merge, rank-walk narrows the
           range ~1024× per pass
  final    per-block value-count partials inside the (now tiny) ranges,
           exact pick

Every pass is a full streaming scan whose per-block output is O(groups
× quantiles × 1024) ints — no shuffle, no sort, no driver
materialization of data rows. At 100 TB this is 3–4 column scans of a
single int64 column; the narrow projection is materialized once so the
passes do not re-read the source. Partitioning assumption: the number
of (group, quantile) tasks is small (≤ thousands) — the histogram
partials ride each task's return value.

The reference has no quantile operator; this extends the engine for
training-data quality-cutoff pipelines (SURVEY.md §2 extensions).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..util import collect_arrow

_NBINS = 1024
_FINAL_SPAN = 8192  # switch to exact value-counts when hi-lo+1 <= this


def _bin_width(lo: int, hi: int) -> int:
    """Fixed histogram bin width ceil(span/_NBINS), computed in Python
    ints so a full-int64-range span (2^64) never overflows. Guarantees
    dist // width < _NBINS for every value in [lo, hi]."""
    span = hi - lo + 1
    return (span + _NBINS - 1) // _NBINS


def grouped_quantile_disc(
    ds: Dataset, key: str, col: str, qs: list[float]
) -> pa.Table:
    """Exact per-group discrete quantiles of int64 ``col``. Returns a
    driver-side Arrow table (groups × quantiles is small by contract):
    one row per group, one int64 column ``q{percent}`` per quantile,
    sorted by group key."""
    narrow = ds.select_columns([key, col]).materialize()

    # pass 0: count/min/max per group
    def extent_partial(b: pa.Table) -> pa.Table:
        return (
            b.group_by([key])
            .aggregate([(col, "count"), (col, "min"), (col, "max")])
            .rename_columns([key, "n", "lo", "hi"])
        )

    ext = collect_arrow(narrow.map_batches(extent_partial, batch_format="pyarrow"))
    ext = (
        ext.group_by([key])
        .aggregate([("n", "sum"), ("lo", "min"), ("hi", "max")])
        .rename_columns([key, "n", "lo", "hi"])
    )
    groups = ext.column(key).to_pylist()
    ns = ext.column("n").to_pylist()
    los = ext.column("lo").to_pylist()
    his = ext.column("hi").to_pylist()

    # active search tasks: one per (group, quantile)
    # rank = remaining 1-based rank of the target within [lo, hi]
    tasks = []
    for gi, g in enumerate(groups):
        for q in qs:
            # float ceil(q*n) == exact-rational ceil for the supported
            # q values (swept n=1..10^6 vs Fraction) — the 0.95 double
            # rounds DOWN, so integer hits (n%20==0) still land exactly
            r = max(1, int(np.ceil(q * ns[gi])))
            tasks.append({"g": g, "q": q, "lo": los[gi], "hi": his[gi], "rank": r})

    while True:
        wide = [t for t in tasks if t["hi"] - t["lo"] + 1 > _FINAL_SPAN]
        if not wide:
            break
        _histogram_refine(narrow, key, col, wide)

    _exact_pick(narrow, key, col, tasks)

    cols: dict = {key: pa.array(groups)}
    by_gq = {(t["g"], t["q"]): t["ans"] for t in tasks}
    for q in qs:
        cols[f"q{int(round(q * 100))}"] = pa.array(
            [by_gq[(g, q)] for g in groups], pa.int64()
        )
    out = pa.table(cols)
    return out.take(pc.sort_indices(out, sort_keys=[(key, "ascending")]))


def grouped_quantile_cont(
    ds: Dataset, key: str, col: str, qs: list[float]
) -> pa.Table:
    """Exact per-group CONTINUOUS (interpolated) quantiles of int64
    ``col`` — the ``quantile_cont`` convention: the value at 0-based
    fractional rank ``(n-1)*q``, linearly interpolated between the two
    bracketing order statistics. Same iterative-histogram machinery as
    :func:`grouped_quantile_disc` (3–4 streaming scans, no sort, no
    shuffle); both bracketing ranks ride the same refinement passes.

    Returns one row per group with one float64 column ``q{percent}``
    per quantile, holding ``lo + (hi - lo) * frac`` in the source
    integer units (callers convert cents → currency at their edge).
    The interpolation arithmetic is plain IEEE double ops on exact
    int64 order statistics, so an oracle performing the identical
    expression reproduces it bit-for-bit."""
    narrow = ds.select_columns([key, col]).materialize()

    def extent_partial(b: pa.Table) -> pa.Table:
        return (
            b.group_by([key])
            .aggregate([(col, "count"), (col, "min"), (col, "max")])
            .rename_columns([key, "n", "lo", "hi"])
        )

    ext = collect_arrow(narrow.map_batches(extent_partial, batch_format="pyarrow"))
    ext = (
        ext.group_by([key])
        .aggregate([("n", "sum"), ("lo", "min"), ("hi", "max")])
        .rename_columns([key, "n", "lo", "hi"])
    )
    groups = ext.column(key).to_pylist()
    ns = ext.column("n").to_pylist()
    los = ext.column("lo").to_pylist()
    his = ext.column("hi").to_pylist()

    # one task per needed ORDER STATISTIC (deduped 1-based ranks): the
    # lo/hi brackets of adjacent quantiles often coincide
    tasks: list[dict] = []
    task_ix: dict[tuple, int] = {}
    brackets: dict[tuple, tuple[int, int, float]] = {}
    for gi, g in enumerate(groups):
        n = ns[gi]
        for q in qs:
            pos = (n - 1) * q  # IEEE double, reproduced by the oracle
            r0 = int(np.floor(pos))
            frac = pos - np.floor(pos)
            ranks = (r0 + 1, min(r0 + 2, n))  # 1-based lo/hi brackets
            for r in set(ranks):
                if (g, r) not in task_ix:
                    task_ix[(g, r)] = len(tasks)
                    tasks.append(
                        {"g": g, "lo": los[gi], "hi": his[gi], "rank": r}
                    )
            brackets[(g, q)] = (ranks[0], ranks[1], float(frac))

    while True:
        wide = [t for t in tasks if t["hi"] - t["lo"] + 1 > _FINAL_SPAN]
        if not wide:
            break
        _histogram_refine(narrow, key, col, wide)
    _exact_pick(narrow, key, col, tasks)

    ans = {gr: tasks[ti]["ans"] for gr, ti in task_ix.items()}
    cols: dict = {key: pa.array(groups)}
    for q in qs:
        vals = []
        for g in groups:
            r_lo, r_hi, frac = brackets[(g, q)]
            lo_v, hi_v = ans[(g, r_lo)], ans[(g, r_hi)]
            vals.append(lo_v + (hi_v - lo_v) * frac)
        cols[f"q{int(round(q * 100))}"] = pa.array(vals, pa.float64())
    out = pa.table(cols)
    return out.take(pc.sort_indices(out, sort_keys=[(key, "ascending")]))


def _histogram_refine(narrow: Dataset, key: str, col: str, wide: list[dict]) -> None:
    """One streaming pass: 1024-bin histogram per active task, merge,
    walk to the bin holding the remaining rank, shrink the range."""
    # snapshot task bounds for the closure (plain lists, cheap to ship)
    bounds = [(t["g"], t["lo"], t["hi"]) for t in wide]

    def hist_partial(b: pa.Table) -> pa.Table:
        gcol = b.column(key).to_numpy(zero_copy_only=False)
        v = b.column(col).to_numpy(zero_copy_only=False)
        tids, bins, counts = [], [], []
        for tid, (g, lo, hi) in enumerate(bounds):
            mask = (gcol == g) & (v >= lo) & (v <= hi)
            if not mask.any():
                continue
            # fixed bin width, distance computed in uint64: correct for
            # the FULL int64 range (span near 2^64 overflows any signed
            # `(v-lo)*NBINS` formulation)
            w = np.uint64(_bin_width(lo, hi))
            dist = v[mask].astype(np.uint64) - np.uint64(np.int64(lo).astype(np.uint64))
            binned = (dist // w).astype(np.int64)
            bc = np.bincount(binned, minlength=_NBINS)
            nz = np.flatnonzero(bc)
            tids.extend([tid] * len(nz))
            bins.extend(nz.tolist())
            counts.extend(bc[nz].tolist())
        return pa.table(
            {
                "tid": pa.array(tids, pa.int64()),
                "bin": pa.array(bins, pa.int64()),
                "cnt": pa.array(counts, pa.int64()),
            }
        )

    parts = collect_arrow(
        narrow.map_batches(hist_partial, batch_format="pyarrow"),
        schema=pa.schema([("tid", pa.int64()), ("bin", pa.int64()), ("cnt", pa.int64())]),
    )
    merged = (
        parts.group_by(["tid", "bin"]).aggregate([("cnt", "sum")]).rename_columns(["tid", "bin", "cnt"])
    )
    tid_np = merged.column("tid").to_numpy()
    bin_np = merged.column("bin").to_numpy()
    cnt_np = merged.column("cnt").to_numpy()
    for tid, t in enumerate(wide):
        sel = tid_np == tid
        h = np.zeros(_NBINS, dtype=np.int64)
        h[bin_np[sel]] = cnt_np[sel]
        cum = np.cumsum(h)
        b = int(np.searchsorted(cum, t["rank"], side="left"))
        lo, hi = t["lo"], t["hi"]
        w = _bin_width(lo, hi)  # Python int — exact at any span
        # bin b covers values [lo + b*w .. lo + (b+1)*w - 1] ∩ [lo, hi]
        t["rank"] -= int(cum[b - 1]) if b > 0 else 0
        t["lo"], t["hi"] = lo + b * w, min(lo + (b + 1) * w - 1, hi)


def _exact_pick(narrow: Dataset, key: str, col: str, tasks: list[dict]) -> None:
    """Final streaming pass: exact value-counts inside each (tiny)
    range, then pick the value at the remaining rank."""
    bounds = [(t["g"], t["lo"], t["hi"]) for t in tasks]

    def vc_partial(b: pa.Table) -> pa.Table:
        gcol = b.column(key).to_numpy(zero_copy_only=False)
        v = b.column(col).to_numpy(zero_copy_only=False)
        tids, vals, counts = [], [], []
        for tid, (g, lo, hi) in enumerate(bounds):
            mask = (gcol == g) & (v >= lo) & (v <= hi)
            if not mask.any():
                continue
            u, c = np.unique(v[mask], return_counts=True)
            tids.extend([tid] * len(u))
            vals.extend(u.tolist())
            counts.extend(c.tolist())
        return pa.table(
            {
                "tid": pa.array(tids, pa.int64()),
                "val": pa.array(vals, pa.int64()),
                "cnt": pa.array(counts, pa.int64()),
            }
        )

    parts = collect_arrow(
        narrow.map_batches(vc_partial, batch_format="pyarrow"),
        schema=pa.schema([("tid", pa.int64()), ("val", pa.int64()), ("cnt", pa.int64())]),
    )
    merged = (
        parts.group_by(["tid", "val"]).aggregate([("cnt", "sum")]).rename_columns(["tid", "val", "cnt"])
    )
    tid_np = merged.column("tid").to_numpy()
    val_np = merged.column("val").to_numpy()
    cnt_np = merged.column("cnt").to_numpy()
    for tid, t in enumerate(tasks):
        sel = tid_np == tid
        vals, cnts = val_np[sel], cnt_np[sel]
        order = np.argsort(vals)
        vals, cnts = vals[order], cnts[order]
        cum = np.cumsum(cnts)
        i = int(np.searchsorted(cum, t["rank"], side="left"))
        t["ans"] = int(vals[i]) if len(vals) else None
