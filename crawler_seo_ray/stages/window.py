"""Global (unpartitioned) ranking windows at cluster scale.

``orders_price_window`` ranks WITHIN a partition via
``groupby().map_groups`` — fine whenever one partition fits one group,
which is the same contract SQL engines impose on window partitions.
A GLOBAL ``row_number() over (order by ...)`` has no partition key to
shard on, so the map_groups shape would funnel the whole table through
one worker. This module does it without that bottleneck:

1. ``ds.sort(keys)`` — Ray Data's range-partition sort (sample →
   cutpoints → exchange → per-range sort). Output blocks are globally
   ordered: every row of block *i* sorts ≤ every row of block *i+1*.
2. Materialize and read the per-block ROW COUNTS from block metadata —
   the only driver-resident state is one int per block (a 100 TB table
   at 128 MiB blocks is ~800k ints), never row data.
3. Exclusive prefix-sum the counts into per-block offsets and stamp
   ``offset + arange(len(block))`` onto each block in a parallel Ray
   task per block (refs in, refs out — rows never visit the driver).

Ties: callers must append a unique tiebreak column to ``sort_keys``
(the queries use the table's primary key), which makes the assigned
row numbers deterministic and equal to the SQL window's.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset


@ray.remote
def _stamp_block(block: pa.Table, offset: int, out_col: str, total: int,
                 cume_col: str | None) -> pa.Table:
    n = block.num_rows
    rn = np.arange(offset + 1, offset + n + 1, dtype=np.int64)
    out = block.append_column(out_col, pa.array(rn))
    if cume_col is not None:
        # unique tiebreak ⇒ rows ≤ current = row_number ⇒ cume_dist = rn/N
        out = out.append_column(cume_col, pa.array(rn.astype(np.float64) / total))
    return out


def global_row_number(
    ds: Dataset,
    sort_keys: list[str],
    out_col: str = "rn",
    cume_col: str | None = None,
) -> Dataset:
    """Exact global ``row_number() over (order by *sort_keys)`` (and
    optionally ``cume_dist`` when the keys are unique) as a Dataset.

    Driver state: one (ref, num_rows) pair per sorted block. Row data
    stays in the object store end-to-end."""
    mat = ds.sort(sort_keys).materialize()
    refs: list = []
    counts: list[int] = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows == 0:
                continue  # empty range partitions carry no schema either
            refs.append(ref)
            counts.append(meta.num_rows)
    if not refs:
        return mat
    total = int(sum(counts))
    offsets = np.concatenate(([0], np.cumsum(counts[:-1], dtype=np.int64)))
    stamped = [
        _stamp_block.remote(ref, int(off), out_col, total, cume_col)
        for ref, off in zip(refs, offsets)
    ]
    return rd.from_arrow_refs(stamped)


@ray.remote
def _block_col_max(block: pa.Table, val_col: str) -> int:
    # int64 view of the ordered column (timestamps arrive as int64 µs)
    v = pc.cast(block.column(val_col), pa.int64())
    return int(pc.max(v).as_py())


@ray.remote
def _stamp_running_max(
    block: pa.Table, prior_max: int | None, val_col: str, out_col: str
) -> pa.Table:
    v = pc.cast(block.column(val_col), pa.int64()).to_numpy()
    run = np.maximum.accumulate(v)
    if prior_max is None:
        prev = np.concatenate(([np.int64(0)], run[:-1]))
        valid = np.ones(len(v), dtype=bool)
        valid[0] = False  # SQL: empty exclusive frame → NULL
    else:
        prev = np.maximum(np.concatenate(([np.int64(prior_max)], run[:-1])), prior_max)
        valid = np.ones(len(v), dtype=bool)
    return block.append_column(out_col, pa.array(prev, pa.int64(), mask=~valid))


def global_exclusive_running_max(
    ds: Dataset,
    sort_keys: list[str],
    val_col: str,
    out_col: str = "prev_max",
) -> Dataset:
    """Exact global ``max(val) over (order by *sort_keys rows between
    unbounded preceding and 1 preceding)`` — the streaming-watermark
    primitive (arrival-ordered exclusive running max; NULL on the first
    row, like the SQL empty frame).

    Same driver contract as :func:`global_row_number`: after the range
    sort, the driver holds ONE int64 per block (the block's max), never
    rows — phase 1 reduces each sorted block to its scalar max, the
    exclusive prefix-max of those scalars is the carry-in for phase 2's
    per-block stamping tasks (refs in, refs out)."""
    mat = ds.sort(sort_keys).materialize()
    refs: list = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows == 0:
                continue
            refs.append(ref)
    if not refs:
        return mat
    maxes = ray.get([_block_col_max.remote(r, val_col) for r in refs])
    stamped = []
    carry: int | None = None
    for ref, mx in zip(refs, maxes):
        stamped.append(_stamp_running_max.remote(ref, carry, val_col, out_col))
        carry = mx if carry is None else max(carry, mx)
    return rd.from_arrow_refs(stamped)
