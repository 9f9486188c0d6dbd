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
