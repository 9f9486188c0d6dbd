"""Columnar storage seam.

north_rule asks for Lance tables; the ``lance``/``pylance`` package is
not installed in this environment, so the corpus/checkpoint container
is Parquet with the identical schema, behind this one seam (SURVEY.md
§7.0). Small row groups give us cheap point-``take`` reads — the
Parquet stand-in for ``lance.dataset(...).take`` — which is what the
fetch stage relies on.
"""

from __future__ import annotations

import json
import os
from typing import Iterable

import pyarrow as pa
import pyarrow.parquet as pq

# Row-group granularity for point reads: a scattered take decompresses
# whole row groups, so the group size IS the read amplification factor.
# 64 rows ≈ a few hundred KB of image bytes per group — the parquet
# stand-in for Lance's fine-grained take.
TAKE_ROW_GROUP_SIZE = 64


def write_table(table: pa.Table, path: str, *, for_take: bool = False) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    # binary payloads (encoded images) are already compressed — recoding
    # them in zstd wastes CPU at write AND at every point read
    compression: str | dict = "zstd"
    if "bytes" in table.column_names:
        compression = {c: ("NONE" if c == "bytes" else "zstd") for c in table.column_names}
    pq.write_table(
        table,
        tmp,
        row_group_size=TAKE_ROW_GROUP_SIZE if for_take else 64 * 1024,
        compression=compression,
    )
    os.replace(tmp, path)  # atomic publish → resumable layout


def read_table(path: str, columns: list[str] | None = None) -> pa.Table:
    return pq.read_table(path, columns=columns)


class ShardedTakeReader:
    """Point reads by global row index over a directory of fixed-size shards.

    The stand-in for a Lance ``take``: ``corpus_dir/part-{k:05d}.parquet``
    each holds exactly ``rows_per_shard`` rows (last may be short), and
    ``manifest.json`` records the layout. Row ``i`` lives in shard
    ``i // rows_per_shard`` at local offset ``i % rows_per_shard``; we read
    only the row groups that contain requested offsets.
    """

    def __init__(self, corpus_dir: str, columns: list[str] | None = None):
        with open(os.path.join(corpus_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.dir = corpus_dir
        self.rows_per_shard = int(self.manifest["rows_per_shard"])
        self.num_rows = int(self.manifest["num_rows"])
        self.columns = columns
        self._files: dict[int, pq.ParquetFile] = {}

    def _file(self, shard: int) -> pq.ParquetFile:
        f = self._files.get(shard)
        if f is None:
            f = pq.ParquetFile(
                os.path.join(self.dir, f"part-{shard:05d}.parquet"), memory_map=True
            )
            self._files[shard] = f
        return f

    def take(self, indices) -> pa.Table:
        """Rows for global indices, returned in the given order."""
        import numpy as np

        indices = np.asarray(indices, dtype=np.int64)
        out_order = np.argsort(indices, kind="stable")
        tables = []
        positions = []  # original positions, to restore caller order
        sorted_idx = indices[out_order]
        start = 0
        while start < len(sorted_idx):
            shard = int(sorted_idx[start] // self.rows_per_shard)
            end = start
            while end < len(sorted_idx) and sorted_idx[end] // self.rows_per_shard == shard:
                end += 1
            local = sorted_idx[start:end] - shard * self.rows_per_shard
            pf = self._file(shard)
            # map local offsets → row groups; one batched read per file
            rg_sizes = [pf.metadata.row_group(g).num_rows for g in range(pf.num_row_groups)]
            rg_starts = np.cumsum([0] + rg_sizes)
            groups = np.searchsorted(rg_starts, local, side="right") - 1
            wanted = sorted(set(groups.tolist()))
            tbl = pf.read_row_groups(wanted, columns=self.columns)
            # offsets of each wanted group within the concatenated read
            concat_starts = np.cumsum([0] + [rg_sizes[g] for g in wanted])
            gpos = {g: concat_starts[k] for k, g in enumerate(wanted)}
            rows = np.array(
                [gpos[g] + (l - rg_starts[g]) for g, l in zip(groups, local)],
                dtype=np.int64,
            )
            tables.append(tbl.take(pa.array(rows)))
            positions.extend(out_order[start:end].tolist())
            start = end
        if not tables:
            empty = self._file(0).schema_arrow
            if self.columns:
                empty = pa.schema([empty.field(c) for c in self.columns])
            return pa.table({f.name: pa.array([], f.type) for f in empty})
        merged = pa.concat_tables(tables)
        # restore caller order
        import numpy as np

        inv = np.empty(len(positions), dtype=np.int64)
        inv[np.asarray(positions)] = np.arange(len(positions))
        return merged.take(pa.array(inv))


def write_sharded(tables: Iterable[pa.Table], out_dir: str, rows_per_shard: int) -> dict:
    """Write fixed-size shards + manifest (atomic per file)."""
    os.makedirs(out_dir, exist_ok=True)
    total = 0
    shard = 0
    for t in tables:
        assert t.num_rows <= rows_per_shard
        write_table(t, os.path.join(out_dir, f"part-{shard:05d}.parquet"), for_take=True)
        total += t.num_rows
        shard += 1
    manifest = {"rows_per_shard": rows_per_shard, "num_rows": total, "num_shards": shard}
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest
