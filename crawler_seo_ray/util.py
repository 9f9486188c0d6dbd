"""Small shared helpers."""

from __future__ import annotations

import pyarrow as pa
import ray
from ray.data import Dataset


def collect_arrow(ds: Dataset, schema: pa.Schema | None = None) -> pa.Table:
    """Materialize a (small) Dataset to one Arrow table.

    Ray Data may emit zero-row blocks with a blank schema; those break
    ``pa.concat_tables`` — drop them, falling back to ``schema`` (or the
    first real block's schema) for the all-empty case.
    """
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows > 0 and t.num_columns > 0]
    if tables:
        return pa.concat_tables(tables)
    if schema is not None:
        return schema.empty_table()
    # last resort: an empty table with whatever schema the dataset reports
    s = ds.schema()
    return pa.schema(zip(s.names, s.types)).empty_table()


def drop_empty_blocks(ds: Dataset) -> Dataset:
    """Ray 2.49 landmine workaround for groupby→join pipelines: hash
    aggregate / map_groups emit ZERO-COLUMN blocks for empty hash
    partitions, ``map_batches`` silently skips them (so a schema-fixing
    map cannot repair them), and a downstream ``Dataset.join`` aborts
    with "No match or multiple matches for key field reference … " when
    it meets one. Rebuild the dataset from its non-empty block refs —
    zero-copy (the refs never leave the object store), distribution
    preserved. Call this on any groupby-derived Dataset that feeds a
    join."""
    import ray.data as rd

    mat = ds.materialize()
    keep = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                keep.append(ref)
    if not keep:
        return mat  # all-empty: nothing to join anyway
    return rd.from_arrow_refs(keep)


def atomic_write_parquet(table: pa.Table, path: str) -> None:
    """Write-then-rename publish for on-disk index partitions. A Ray
    task can be retried or re-executed for lineage reconstruction AFTER
    its first attempt already ran; a plain ``pq.write_table`` then
    races a concurrent reader with a partially-written file (observed:
    0-byte IVF cell aborting a probe read). ``os.replace`` is atomic on
    POSIX, so readers only ever see complete files; the tmp name is
    unique per attempt so concurrent attempts never clobber each
    other's in-progress writes."""
    import os
    import uuid

    import pyarrow.parquet as pq

    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def sorted_group_apply(ds, key_cols, order_cols, kernel, descending=None):
    """Multi-group WINDOW sort-kernel — the generalization of
    ``sorted_agg_by_key`` to arbitrary per-group logic (running sums,
    lead/lag, per-group top-k, session stats): replaces
    ``groupby(key).map_groups(fn)``, whose per-group Python dispatch
    costs ~20 µs/group and scales with the wrong term when the group
    count is input-proportional (users, docs, orders).

    Shape: ONE global sort on (key, *order_cols); per block, rows of
    the block's FIRST/LAST key — the only groups that can straddle a
    block boundary, ≤2 keys per block — ship raw to the driver
    (bounded by group size, the events_funnel/sessionize contract),
    while every INTERIOR group is complete in-block and is processed
    by one vectorized ``kernel`` call. Driver-side the collected edge
    rows are re-sorted and folded by the same kernel, and the result
    unions back as one small block.

    ``kernel(table) -> table``: receives rows already sorted by
    (key, *order_cols), possibly MANY groups at once — it must be
    vectorized ACROSS groups (boundary-masked cumsum / reduceat /
    shifted arrays keyed on run starts), and must return its empty
    output schema for a zero-row input. Input and output column names
    may overlap freely (edge rows ride under ``_in_*`` aliases in the
    tagged union, so dtypes never clash).

    Cardinality contract: this operator is for keys whose COUNT is
    input-proportional (users, docs, terms, join keys) — then blocks
    hold many complete groups and the driver edge is small. With a
    LOW-cardinality key (≲ the block count) most blocks are single-key
    and everything routes through the driver fold — use a bounded-key
    ``groupby().map_groups`` (or a driver fold directly) there
    instead. Same per-group bound as any keyed window: one key's rows
    must fit a worker's heap; salt hot keys upstream if not."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    if isinstance(key_cols, str):
        key_cols = [key_cols]
    sort_cols = list(key_cols) + list(order_cols)
    # keys always ascend; ``descending`` (aligned with order_cols) lets
    # a kernel see e.g. (user, value DESC) runs for top-k shapes
    desc = [False] * len(key_cols) + list(
        descending if descending is not None else [False] * len(order_cols)
    )
    sorted_ds = ds.sort(
        sort_cols if len(sort_cols) > 1 else sort_cols[0],
        descending=desc if any(desc) else False,
    )

    def runs(b: pa.Table) -> pa.Table:
        out_empty = kernel(b.schema.empty_table())
        in_fields = [(f"_in_{n}", b.schema.field(n).type) for n in b.schema.names]
        out_fields = [(n, out_empty.schema.field(n).type) for n in out_empty.schema.names]
        schema = pa.schema(
            [("kind", pa.int8())] + in_fields + out_fields
        )
        if b.num_rows == 0:
            return schema.empty_table()
        n = b.num_rows
        em = np.ones(n, bool)
        el = np.ones(n, bool)
        for kc in key_cols:
            a = b.column(kc)
            a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
            em &= pc.equal(a, a[0]).to_numpy(zero_copy_only=False)
            el &= pc.equal(a, a[n - 1]).to_numpy(zero_copy_only=False)
        em = em | el
        edge_t = b.filter(pa.array(em))
        done_t = kernel(b.filter(pa.array(~em)))
        n_e, n_d = edge_t.num_rows, done_t.num_rows
        cols = {
            "kind": pa.array(np.r_[np.zeros(n_e, np.int8), np.ones(n_d, np.int8)])
        }
        for alias, typ in in_fields:
            src = edge_t.column(alias[4:]).cast(typ).combine_chunks()
            cols[alias] = pa.concat_arrays([src, pa.nulls(n_d, typ)])
        for name, typ in out_fields:
            src = done_t.column(name).cast(typ).combine_chunks()
            cols[name] = pa.concat_arrays([pa.nulls(n_e, typ), src])
        return pa.table(cols, schema=schema)

    parts = sorted_ds.map_batches(runs, batch_format="pyarrow").materialize()

    def strip(b: pa.Table) -> pa.Table:
        return b.select(
            [n for n in b.schema.names if n != "kind" and not n.startswith("_in_")]
        )

    interior = parts.filter(expr="kind == 1").map_batches(
        strip, batch_format="pyarrow"
    )
    edge = collect_arrow(parts.filter(expr="kind == 0"))
    if edge.num_rows == 0:
        return interior
    edge_in = pa.table(
        {n[4:]: edge.column(n) for n in edge.schema.names if n.startswith("_in_")}
    )
    edge_in = edge_in.take(
        pc.sort_indices(
            edge_in,
            sort_keys=[
                (c, "descending" if d else "ascending")
                for c, d in zip(sort_cols, desc)
            ],
        )
    )
    folded = kernel(edge_in)
    if folded.num_rows == 0:
        return interior
    return interior.union(rd.from_arrow(folded))


def sorted_agg_by_key(ds, key_cols, aggs):
    """Exact distributed per-key aggregation as a Dataset WITHOUT
    ``groupby().aggregate()``: Ray's aggregate walks rows AND groups in
    Python (measured r4: ~5 µs/row + ~20 µs/group — 23 s for a 1M-group
    sum whose raw sort shuffle costs 0.2 s), which dominates whenever
    the group count is input-proportional (vocabulary, users, grams,
    pairs). Shape: ONE global sort on the key(s); each block
    reduceat-folds its INTERIOR key runs (contiguous after the sort)
    and keeps them distributed; only the block's first/last key — the
    runs that may straddle block boundaries — reach the driver, and
    each such run is PRE-FOLDED inside the block to one
    (key, partial) row, so the driver edge is ≤2 ROWS per block under
    ANY key distribution (r4 shipped the straddling runs raw, making
    the driver slab Θ(hot-key rows) under skew — sum/max/min/count
    are all commutative monoids, so partials merge exactly). The
    supplier_blame sort-kernel lesson as a reusable operator.

    ``key_cols``: one column name or a list. ``aggs``: list of
    (val_col, op, alias) with op ∈ sum/max/min/count (count ignores
    val_col). Output columns: keys then aliases; value dtypes follow
    the inputs (count is int64). Value columns should be int64 or
    float64: partial folds compute in the numpy default (int64 /
    float64) and CAST back to the input dtype at the end, so a narrow
    int column whose true total overflows its own dtype would wrap —
    same contract as the caller's declared output type."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    if isinstance(key_cols, str):
        key_cols = [key_cols]
    ufuncs = {"sum": np.add, "max": np.maximum, "min": np.minimum}
    sort_key = key_cols if len(key_cols) > 1 else key_cols[0]
    sorted_ds = ds.sort(sort_key)

    def _val_np(b, col):
        return b.column(col).to_numpy(zero_copy_only=False)

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            cols = {"kind": pa.array([], pa.int8())}
            for kc in key_cols:
                cols[kc] = pa.array([], b.schema.field(kc).type)
            for vc, op, alias in aggs:
                cols[alias] = pa.array(
                    [], pa.int64() if op == "count" else b.schema.field(vc).type
                )
            return pa.table(cols)
        karrs = []
        for kc in key_cols:
            a = b.column(kc)
            karrs.append(a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a)
        n = b.num_rows
        mf = np.ones(n, bool)
        ml = np.ones(n, bool)
        for a in karrs:
            mf &= pc.equal(a, a[0]).to_numpy(zero_copy_only=False)
            ml &= pc.equal(a, a[n - 1]).to_numpy(zero_copy_only=False)
        ml &= ~mf  # distinct last-key run (empty when the block is one key)
        edge_masks = [mf] + ([ml] if ml.any() else [])
        edge_idx = pa.array(
            [0] + ([n - 1] if len(edge_masks) == 2 else []), pa.int64()
        )
        em = mf | ml
        keep = ~em
        change = np.zeros(int(keep.sum()), bool)
        if change.size:
            change[0] = True
            for a in karrs:
                ia = a.filter(pa.array(keep))
                change[1:] |= pc.not_equal(
                    ia.slice(1), ia.slice(0, len(ia) - 1)
                ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(change)
        runlens = np.diff(np.r_[starts, change.size])
        cols = {
            "kind": pa.array(
                np.r_[
                    np.zeros(len(edge_masks), np.int8),
                    np.ones(starts.size, np.int8),
                ]
            )
        }
        take_i = pa.array(starts, pa.int64())
        for kc, a in zip(key_cols, karrs):
            cols[kc] = pa.concat_arrays(
                [a.take(edge_idx), a.filter(pa.array(keep)).take(take_i)]
            )
        fold1 = {"sum": np.sum, "max": np.max, "min": np.min}
        for vc, op, alias in aggs:
            if op == "count":
                e_v = np.array([int(m.sum()) for m in edge_masks], np.int64)
                red = runlens.astype(np.int64)
                typ = pa.int64()
            else:
                v = _val_np(b, vc)
                e_v = np.array([fold1[op](v[m]) for m in edge_masks])
                iv = v[keep]
                red = (
                    ufuncs[op].reduceat(iv, starts)
                    if starts.size
                    else iv[:0]
                )
                typ = b.schema.field(vc).type
            cols[alias] = pa.array(np.r_[e_v, red]).cast(typ)
        return pa.table(cols)

    parts = sorted_ds.map_batches(fold, batch_format="pyarrow").materialize()
    interior = parts.filter(expr="kind == 1").map_batches(
        lambda b: b.drop_columns(["kind"]), batch_format="pyarrow"
    )
    edge = collect_arrow(parts.filter(expr="kind == 0"))
    if edge.num_rows == 0:
        return interior
    # driver patch: edge rows are per-block PARTIALS (≤2 per block), so
    # count partials merge as a sum and sum/max/min merge as themselves
    arrow_aggs = [
        (alias, "sum" if op == "count" else op) for _, op, alias in aggs
    ]
    folded = (
        edge.select(key_cols + [a for _, _, a in aggs])
        .group_by(key_cols)
        .aggregate(arrow_aggs)
        .rename_columns(key_cols + [a for _, _, a in aggs])
    )
    # Arrow's group_by sum promotes narrow ints to int64; cast each
    # alias back to the block-side dtype so interior ∪ edge schemas
    # match exactly.
    folded = pa.table(
        {
            c: folded.column(c).cast(edge.schema.field(c).type)
            for c in folded.column_names
        }
    )
    return interior.union(rd.from_arrow(folded))
