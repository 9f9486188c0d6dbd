"""Temporal / range join operators Ray Data lacks natively.

``asof_join`` — backward/forward/nearest as-of join (each left row picks the latest
right row with right_ts <= left_ts for the same key), expressed as the
union-tag + co-partition pattern: both sides are projected to one
aligned narrow schema, unioned, co-located ONCE by a global key sort
(``util.sorted_group_apply`` — r5: every interior key of a block merges
in one vectorized pass via band-lifted searchsorted, no per-key Python
dispatch), — no driver-side state, one shuffle.
Partitioning assumption: a single key's rows fit in one worker's heap
(same assumption as any per-key window; salt hot keys upstream if not).

``band_by_edges`` — static range join against a tiny sorted band table
(the broadcast-small-side pattern): the band edges ride the closure
(constant-size), each batch is labeled with one ``np.searchsorted`` —
a pure map, no shuffle at any scale.

Reference parity: the reference has no temporal joins (its Excel report
joins are equality joins, reports/excel_generator.py); these extend the
engine for training-data pipelines (SURVEY.md §2 extensions).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def asof_join(
    left: Dataset,
    right: Dataset,
    key: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    direction: str = "backward",
) -> Dataset:
    """As-of LEFT join (pandas merge_asof parity). Every left row is
    kept; ``right_cols`` come from the matched right row (null when no
    match):

    - ``backward``: latest right row with ``right_ts <= left_ts``; ties
      on right_ts break to the GREATEST (right_ts, *right_cols) row.
    - ``forward``: earliest right row with ``right_ts >= left_ts``; ties
      break to the SMALLEST (right_ts, *right_cols) row.
    - ``nearest``: the candidate with the smaller |right_ts − left_ts|
      (the earlier/backward one when equidistant), tie within a ts run
      to the SMALLEST *right_cols — exactly the LATERAL oracle's
      ``ORDER BY abs(Δ), right_ts, *cols``.

    Timestamps are compared as int64 microseconds; ``left_ts`` is
    emitted back as timestamp[us] so value hashes are stable.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(direction)
    l_schema_cols = [key, left_ts, *left_cols]
    r_schema_cols = [key, right_ts, *right_cols]

    l_arrow = left.schema()
    l_types = dict(zip(l_arrow.names, l_arrow.types))
    r_arrow = right.schema()
    r_types = dict(zip(r_arrow.names, r_arrow.types))

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {
            key: pc.cast(b.column(key), pa.int64()),
            "__ts": pc.cast(pc.cast(b.column(left_ts), pa.timestamp("us")), pa.int64()),
            "__side": pa.array(np.ones(b.num_rows, dtype=np.int8)),
        }
        for c in left_cols:
            cols[c] = b.column(c)
        for c in right_cols:
            cols[c] = pa.nulls(b.num_rows, r_types[c])
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        cols = {
            key: pc.cast(b.column(key), pa.int64()),
            "__ts": pc.cast(pc.cast(b.column(right_ts), pa.timestamp("us")), pa.int64()),
            "__side": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
        }
        for c in left_cols:
            cols[c] = pa.nulls(b.num_rows, l_types[c])
        for c in right_cols:
            cols[c] = b.column(c)
        return pa.table(cols)

    tagged = (
        left.select_columns(l_schema_cols)
        .map_batches(tag_left, batch_format="pyarrow")
        .union(
            right.select_columns(r_schema_cols).map_batches(tag_right, batch_format="pyarrow")
        )
    )

    def merge_all(g: pa.Table) -> pa.Table:
        """r5 multi-key merge (sorted by key): the block's interior
        keys fold in ONE pass — the right side gets one Arrow
        (key, ts, *right_cols) sort, each key's timestamps are rebased
        to the key's min ts (both sides) and lifted into a disjoint
        int64 band (key index × (span + 2)), so a single searchsorted
        pair over the whole right array resolves every left row's
        candidate; per-key run bounds from searchsorted on the sorted
        key column gate the matched mask. Same direction/tie
        semantics as the per-group kernel (pandas merge_asof parity,
        property-tested); overflow-guarded with a per-key fallback."""
        side = g.column("__side").to_numpy(zero_copy_only=False)
        lmask, rmask = side == 1, side == 0
        lt = g.filter(pa.array(lmask))
        if lt.num_rows == 0:
            return _empty_out(g, key, left_ts, left_cols, right_cols)
        rt = g.filter(pa.array(rmask))
        out = {
            key: lt.column(key),
            left_ts: pc.cast(lt.column("__ts"), pa.timestamp("us")),
        }
        for c in left_cols:
            out[c] = lt.column(c)
        if rt.num_rows == 0:
            for c in right_cols:
                out[c] = pa.nulls(lt.num_rows, g.schema.field(c).type)
            return pa.table(out)
        # right ascending by (key, ts, *right_cols): searchsorted(side
        # ='right')-1 then lands on the max-tiebreak row among equal ts
        rt = rt.take(
            pc.sort_indices(
                rt,
                sort_keys=[(key, "ascending"), ("__ts", "ascending")]
                + [(c, "ascending") for c in right_cols],
            )
        )
        rkeys = rt.column(key).to_numpy(zero_copy_only=False)
        rts = rt.column("__ts").to_numpy(zero_copy_only=False)
        lkeys = lt.column(key).to_numpy(zero_copy_only=False)
        lts = lt.column("__ts").to_numpy(zero_copy_only=False)
        r_lo = np.searchsorted(rkeys, lkeys, side="left")
        r_hi = np.searchsorted(rkeys, lkeys, side="right")
        uk = np.unique(np.concatenate([rkeys, lkeys]))
        gi_r = np.searchsorted(uk, rkeys)
        gi_l = np.searchsorted(uk, lkeys)
        base = np.full(uk.size, np.iinfo(np.int64).max)
        np.minimum.at(base, gi_r, rts)
        np.minimum.at(base, gi_l, lts)
        rel_r = rts - base[gi_r]
        rel_l = lts - base[gi_l]
        span = max(int(rel_r.max(initial=0)), int(rel_l.max(initial=0)))
        shift = span + 2
        if uk.size * shift < 2**62:
            lr = rel_r + gi_r * shift  # globally ascending, keys disjoint
            lq = rel_l + gi_l * shift
        else:  # unreachable for µs spans; exact but slower per-key path
            lr, lq = None, None
        if direction == "backward":
            if lr is not None:
                idx = np.searchsorted(lr, lq, side="right") - 1
            else:
                idx = _per_key_ss(rkeys, rts, lkeys, lts, r_lo, "right") - 1
            matched = idx >= r_lo
        elif direction == "forward":
            if lr is not None:
                idx = np.searchsorted(lr, lq, side="left")
            else:
                idx = _per_key_ss(rkeys, rts, lkeys, lts, r_lo, "left")
            matched = idx < r_hi
            idx = np.minimum(idx, len(rts) - 1)
        else:  # nearest
            if lr is not None:
                bidx = np.searchsorted(lr, lq, side="right") - 1
                fidx = np.searchsorted(lr, lq, side="left")
            else:
                bidx = _per_key_ss(rkeys, rts, lkeys, lts, r_lo, "right") - 1
                fidx = _per_key_ss(rkeys, rts, lkeys, lts, r_lo, "left")
            bok = bidx >= r_lo
            fok = fidx < r_hi
            big = np.iinfo(np.int64).max
            bdt = np.where(bok, lts - rts[np.maximum(bidx, 0)], big)
            fdt = np.where(fok, rts[np.minimum(fidx, len(rts) - 1)] - lts, big)
            use_b = bok & (~fok | (bdt <= fdt))
            # re-tiebreak the backward candidate to the FIRST row of its
            # (key, ts) run: nearest uses min-(*right_cols) on BOTH sides
            if lr is not None:
                bfirst = np.searchsorted(lr, lr[np.maximum(bidx, 0)], side="left")
            else:
                bfirst = _per_key_ss(
                    rkeys, rts, rkeys[np.maximum(bidx, 0)],
                    rts[np.maximum(bidx, 0)],
                    np.searchsorted(rkeys, rkeys[np.maximum(bidx, 0)], side="left"),
                    "left",
                )
            idx = np.where(use_b, bfirst, np.minimum(fidx, len(rts) - 1))
            matched = bok | fok
        take_idx = pa.array(
            np.where(matched, idx, 0), pa.int64(), mask=~matched
        )  # null index -> null value
        for c in right_cols:
            out[c] = rt.column(c).take(take_idx)
        return pa.table(out)

    from ..util import sorted_group_apply

    return sorted_group_apply(tagged, key, [], merge_all)


def _per_key_ss(rkeys, rts, lkeys, lts, r_lo, side_):
    """Per-key searchsorted fallback for the (astronomically unlikely)
    int64 band-lift overflow in ``merge_all``: Python loop over the
    query rows' distinct keys, exact same positions as the lifted
    path."""
    out = np.empty(lkeys.size, np.int64)
    r_hi_all = np.searchsorted(rkeys, lkeys, side="right")
    for k in np.unique(lkeys):
        m = lkeys == k
        lo = int(r_lo[m][0])
        hi = int(r_hi_all[m][0])
        out[m] = lo + np.searchsorted(rts[lo:hi], lts[m], side=side_)
    return out


def _empty_out(g: pa.Table, key, left_ts, left_cols, right_cols) -> pa.Table:
    fields = [
        pa.field(key, pa.int64()),
        pa.field(left_ts, pa.timestamp("us")),
        *[g.schema.field(c) for c in left_cols],
        *[g.schema.field(c) for c in right_cols],
    ]
    return pa.schema(fields).empty_table()


def band_by_edges(
    ds: Dataset, col: str, edges: list[float], labels: list[str], out_col: str = "band"
) -> Dataset:
    """Label each row with the half-open band [edges[i], edges[i+1])
    its ``col`` value falls in (``labels[i]``); values below edges[0]
    or >= edges[-1] get a null label. len(labels) == len(edges) - 1.

    The band table is constant-size and rides the task closure — the
    broadcast-small-side range join; zero shuffle.
    """
    e = np.asarray(edges, dtype=np.float64)
    if len(labels) != len(e) - 1:
        raise ValueError("labels must be one shorter than edges")
    lab = pa.array(labels, pa.string())

    def apply(b: pa.Table) -> pa.Table:
        # float64 view: integer columns would crash np.isnan, and the
        # edge comparison is float anyway
        v = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.searchsorted(e, v, side="right") - 1
        ok = (idx >= 0) & (idx < len(labels)) & ~np.isnan(v)
        band = lab.take(pa.array(np.where(ok, idx, 0), pa.int64(), mask=~ok))
        return b.append_column(out_col, band)

    return ds.map_batches(apply, batch_format="pyarrow")
