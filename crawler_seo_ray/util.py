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
