"""Post-crawl Ray Data analytics over the audit table (SURVEY.md A3,
M17–M20, G2–G5, K1, S5).

The reference computes duplicate flags against mutable dicts at visit
time and derives scores/issue lists inline; Excel sheets are pandas
projections at the end (reports/excel_generator.py). Here:

- duplicate flags = the combiner pattern over ``(visit_seq, text)``:
  per-block Arrow hash group-by partial mins (both text families in one
  pass), one tiny partial merge, broadcast key→min-seq dict; flag =
  ``visit_seq > min`` among processed non-empty occurrences. The wide
  audit rows never shuffle.
- scoring/issue finalization = a vectorized-ish ``map_batches`` kernel
  applying ``stages.scoring.finalize_page`` (the same kernel the oracle
  uses).
- "sheets" = Dataset pipelines (filter / sort-limit / groupby
  aggregates) written as parquet directories (the Excel workbook
  analog; formatting is presentation, out of engine scope).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Mean, Min

from ..stages.scoring import finalize_batch, finalize_page
from ..util import collect_arrow

JOIN_PARTITIONS = 16


def finalize_audit(audit: pa.Table | Dataset, num_partitions: int = JOIN_PARTITIONS) -> Dataset:
    """Add duplicate flags + score/issue columns to the audit table.

    Flags come from the combiner pattern (see _finalize_with_narrow) and
    are merged into the wide rows via a broadcast key→min-seq dict in a
    single ``map_batches`` pass — the wide nested rows never shuffle.
    Scale path for >RAM flag dicts: write the merged mins as key-sorted
    parquet and probe per batch (or a distributed partial merge) — the
    per-block combine is unchanged.
    """
    import numpy as np

    if isinstance(audit, pa.Table):
        ds = ray.data.from_arrow(audit.combine_chunks())
    else:
        ds = audit
    return _finalize_with_narrow(ds, ds, num_partitions)


def finalize_audit_from_checkpoint(
    checkpoint_dir: str, num_partitions: int = JOIN_PARTITIONS
) -> Dataset:
    """Finalize straight from the checkpointed audit partitions via one
    shared compacting read (see _compacting_read for why not
    read_parquet(columns=...))."""
    import glob
    import os

    paths = sorted(
        glob.glob(os.path.join(checkpoint_dir, "waves", "wave=*", "audit*.parquet"))
    )
    full = _compacting_read(paths, num_partitions)
    # the dup-flag partials pass reads ONLY its four columns from the
    # checkpoint (column-pruned parquet read, ~13× cheaper than the
    # wide rows with their nested lists/structs); the wide blocks are
    # read once, by the flag-merge pass that actually needs them
    narrow = _compacting_read(
        paths,
        num_partitions,
        columns=["visit_seq", "title", "meta_description", "processed"],
    )
    return _finalize_with_narrow(full, narrow, num_partitions)


def audit_snapshot(
    checkpoint_dir: str,
    upto_wave: int,
    num_partitions: int = JOIN_PARTITIONS,
    columns: list[str] | None = None,
) -> Dataset:
    """Time-travel read — the audit exactly as of wave ``upto_wave``,
    reconstructed from the per-wave per-partition checkpoint lineage
    (north_rule: resumable, per-partition lineage).  Only COMMITTED
    waves participate: ``state.json`` is each wave's atomic commit
    marker (written last), so a half-written wave from a crash is
    invisible here just as it is to resume.  Because ``visit_seq`` is
    assigned at wave take, the snapshot is a contiguous visit-order
    prefix of the final audit — asserted in tests."""
    import glob
    import os

    paths = []
    for d in sorted(glob.glob(os.path.join(checkpoint_dir, "waves", "wave=*"))):
        w = int(os.path.basename(d).split("=")[1])
        if w <= upto_wave and os.path.exists(os.path.join(d, "state.json")):
            paths.extend(sorted(glob.glob(os.path.join(d, "audit*.parquet"))))
    return _compacting_read(paths, num_partitions, columns=columns)


@ray.remote
def _read_many(paths: list[str], columns: list[str] | None = None) -> pa.Table:
    import pyarrow.parquet as pq

    return pa.concat_tables([pq.read_table(p, columns=columns) for p in paths])


def _compacting_read(
    paths: list[str], num_blocks: int, columns: list[str] | None = None
) -> Dataset:
    """Parallel read of many small checkpoint chunk files into
    ``num_blocks`` compacted Arrow blocks. Ray's read_parquet pays ~10ms
    of per-fragment scheduling per file (measured, Ray 2.49) — ruinous
    for per-wave-per-worker chunk files; batching ~30 files per task
    restores read throughput. (At cluster scale you'd also periodically
    compact old waves on disk.)"""
    if not paths:
        return ray.data.from_items([])
    per = max(1, -(-len(paths) // num_blocks))
    refs = [
        _read_many.remote(paths[i : i + per], columns)
        for i in range(0, len(paths), per)
    ]
    return ray.data.from_arrow_refs(refs)


def _finalize_with_narrow(ds: Dataset, narrow: Dataset, num_partitions: int) -> Dataset:
    import numpy as np

    # Dup-flag semantics: flag = visit_seq > min(visit_seq) among the
    # processed, non-empty occurrences of the same text (reference:
    # first occurrence in visit order unflagged). Computed with the
    # combiner pattern: per-block partial mins via Arrow's C++ hash
    # group-by (both text families in one pass), tiny partial tables
    # merged once — no row-level shuffle at all. At 10^10 rows the
    # merge of distinct-key partials becomes its own (much smaller)
    # groupby; the per-block combine is unchanged.
    def partial_mins(batch: pa.Table) -> pa.Table:
        proc = pc.fill_null(batch.column("processed"), False)
        out = []
        for src, col in (("t", "title"), ("d", "meta_description")):
            keys = batch.column(col)
            keep = pc.and_(proc, pc.invert(pc.equal(pc.coalesce(keys, ""), "")))
            sub = pa.table(
                {"key": batch.column(col), "visit_seq": batch.column("visit_seq")}
            ).filter(keep)
            if sub.num_rows == 0:
                continue
            agg = sub.group_by("key").aggregate([("visit_seq", "min")])
            out.append(
                pa.table(
                    {
                        "src": pa.array([src] * agg.num_rows, pa.string()),
                        "key": agg.column("key"),
                        "min_seq": agg.column("visit_seq_min"),
                    }
                )
            )
        if not out:
            return pa.table(
                {
                    "src": pa.array([], pa.string()),
                    "key": pa.array([], pa.string()),
                    "min_seq": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(out)

    partials = collect_arrow(
        narrow.select_columns(["visit_seq", "title", "meta_description", "processed"])
        .map_batches(partial_mins, batch_format="pyarrow"),
        schema=pa.schema(
            [("src", pa.string()), ("key", pa.string()), ("min_seq", pa.int64())]
        ),
    )
    merged = partials.group_by(["src", "key"]).aggregate([("min_seq", "min")])
    tmin: dict = {}
    dmin: dict = {}
    for src, key, mn in zip(
        merged.column("src").to_pylist(),
        merged.column("key").to_pylist(),
        merged.column("min_seq_min").to_pylist(),
    ):
        (tmin if src == "t" else dmin)[key] = mn
    flags_ref = ray.put((tmin, dmin))

    # only the fields finalize_page reads — materializing the heavy
    # nested columns (problem structs, sequences, resources) per row
    # would dominate the stage
    _NEEDED = [
        "processed", "title_status", "title_length", "description_status",
        "description_length", "h1_ausente", "h1_multiple", "hierarquia_correta",
        "headings_gravidade_critica", "headings_problematicos_count",
        "has_open_graph", "meta_viewport", "canonical_url", "status_warnings",
    ]

    def finalize(batch: pa.Table) -> pa.Table:
        t_mins, d_mins = ray.get(flags_ref)
        seqs = batch.column("visit_seq").to_numpy()
        proc = pc.fill_null(batch.column("processed"), False).to_numpy(zero_copy_only=False)
        titles = batch.column("title").to_pylist()
        descs = batch.column("meta_description").to_pylist()
        big = np.iinfo(np.int64).max
        tflag = proc & (
            seqs > np.array([t_mins.get(t, big) if t else big for t in titles])
        )
        dflag = proc & (
            seqs > np.array([d_mins.get(d, big) if d else big for d in descs])
        )
        batch = batch.append_column("title_duplicado", pa.array(tflag, pa.bool_()))
        batch = batch.append_column("description_duplicada", pa.array(dflag, pa.bool_()))
        extra = finalize_batch(batch.select(_NEEDED), tflag, dflag)
        out = batch
        for k, v in extra.items():
            typ = {
                "metatags_score": pa.int32(),
                "score_title": pa.int32(),
                "score_description": pa.int32(),
                "score_headings": pa.int32(),
                "score_bonus": pa.int32(),
                "total_critical": pa.int32(),
                "total_warnings": pa.int32(),
            }.get(k, pa.list_(pa.string()))
            out = out.append_column(k, pa.array(v, type=typ))
        return out

    return ds.map_batches(finalize, batch_format="pyarrow")


def excel_projection(final: Dataset) -> Dataset:
    """M19/M20 — the reference's fixed-schema report projection
    (analyzers/metatags_analyzer.py:329-373, main.py:121-162): booleans
    rendered 'SIM'/'NÃO', list columns flattened with ' | ' / ' → '
    joins, reference column names. Flat schema (strings/numbers only) —
    safe for pandas/Excel-style consumers."""

    def project(batch: pa.Table) -> pa.Table:
        def sim(col, default=False):
            vals = batch.column(col).to_pylist()
            return ["SIM" if (v if v is not None else default) else "NÃO" for v in vals]

        def join(col, sep):
            return [sep.join(v) if v else "" for v in batch.column(col).to_pylist()]

        def plain(col, default=None):
            return [v if v is not None else default for v in batch.column(col).to_pylist()]

        return pa.table(
            {
                "visit_seq": batch.column("visit_seq"),
                "wave": batch.column("wave"),
                "URL": batch.column("url"),
                "Depth": batch.column("depth"),
                "Status_Code": batch.column("status_code"),
                "Response_Time_ms": batch.column("response_time_ms"),
                "Title": plain("title", ""),
                "Title_Length": plain("title_length", 0),
                "Title_Status": plain("title_status", "Ausente"),
                "Title_Duplicado": sim("title_duplicado"),
                "Meta_Description": plain("meta_description", ""),
                "Description_Length": plain("description_length", 0),
                "Description_Status": plain("description_status", "Ausente"),
                "Description_Duplicada": sim("description_duplicada"),
                "H1_Count": plain("h1_count", 0),
                "H1_Text": plain("h1_text", ""),
                "H1_Ausente": sim("h1_ausente", True),
                "H1_Multiple": sim("h1_multiple"),
                "Hierarquia_Correta": sim("hierarquia_correta", True),
                "Headings_Problematicos_Total": plain("headings_problematicos_count", 0),
                "Headings_Vazios": plain("headings_vazios_count", 0),
                "Headings_Ocultos": plain("headings_ocultos_count", 0),
                "Headings_Criticos": plain("headings_gravidade_critica", 0),
                "Heading_Sequence_Completa": join("heading_sequence", " → "),
                "Heading_Sequence_Valida": join("heading_sequence_valida", " → "),
                "Total_Problemas_Headings": plain("total_problemas_headings", 0),
                "Problemas_Hierarquia": join("problemas_hierarquia", " | "),
                "Metatags_Score": plain("metatags_score", 0),
                "Critical_Issues": join("critical_issues", " | "),
                "Warnings": join("all_warnings", " | "),
                "Has_Mixed_Content": sim("has_mixed_content"),
                "Mixed_Content_Count": plain("mixed_content_count", 0),
                "Canonical_URL": plain("canonical_url", ""),
                "Meta_Viewport": plain("meta_viewport", ""),
                "Has_Open_Graph": sim("has_open_graph"),
                "Caption_Match": sim("caption_match", True),
                "Phash_Match": sim("phash_match", True),
            }
        )

    return final.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# report "sheets" (reports/excel_generator.py analogs)
# ---------------------------------------------------------------------------


def _where_processed(ds: Dataset) -> Dataset:
    """Vectorized `processed == true` filter (null-safe) — every sheet
    starts here; a row-lambda filter would deserialize each row into a
    Python dict."""
    return ds.map_batches(
        lambda b: b.filter(
            pc.fill_null(b.column("processed"), False)
        ),
        batch_format="pyarrow",
    )


def score_ranking(final: Dataset, k: int = 100) -> Dataset:
    """Top-k by score (K1; excel_generator.py:589 nlargest)."""
    return _where_processed(final).sort(
        "metatags_score", descending=True
    ).limit(k)


def duplicates_report(final: Dataset, text_col: str) -> Dataset:
    """Texts appearing on >1 page with their URL lists (G2;
    metatags_analyzer.py:387-404). Sort-kernel shape (r4): one global
    (text, visit_seq) sort, each block emits its interior duplicate
    runs as finished (text, urls, count) rows fully vectorized
    (ListArray over the run slices — no per-text Python call, which a
    groupby(text).map_groups pays page-proportionally), boundary texts
    patch on the driver through the identical kernel."""
    import numpy as np

    import ray.data as rd

    from ..util import collect_arrow

    def _dup_runs(tbl: pa.Table) -> pa.Table:
        """tbl sorted by (text, visit_seq) → one finished row per text
        with ≥2 pages."""
        out_empty = pa.table(
            {text_col: pa.array([], pa.string()),
             "urls": pa.array([], pa.list_(pa.string())),
             "count": pa.array([], pa.int64())}
        )
        if tbl.num_rows == 0:
            return out_empty
        it = tbl.column(text_col)
        it = it.combine_chunks() if isinstance(it, pa.ChunkedArray) else it
        change = np.r_[
            True,
            pc.not_equal(it.slice(1), it.slice(0, len(it) - 1)).to_numpy(
                zero_copy_only=False
            ),
        ]
        starts = np.flatnonzero(change)
        runlens = np.diff(np.r_[starts, len(it)])
        sel = runlens >= 2
        if not sel.any():
            return out_empty
        starts_k, lens_k = starts[sel], runlens[sel]
        total = int(lens_k.sum())
        row_idx = np.repeat(starts_k, lens_k) + (
            np.arange(total) - np.repeat(np.r_[0, np.cumsum(lens_k)[:-1]], lens_k)
        )
        urls_col = tbl.column("url")
        urls_col = (
            urls_col.combine_chunks()
            if isinstance(urls_col, pa.ChunkedArray)
            else urls_col
        )
        vals = urls_col.take(pa.array(row_idx, pa.int64()))
        lists = pa.ListArray.from_arrays(
            pa.array(np.r_[0, np.cumsum(lens_k)], pa.int32()), vals
        )
        return pa.table(
            {
                text_col: it.take(pa.array(starts_k, pa.int64())),
                "urls": lists,
                "count": pa.array(lens_k.astype(np.int64), pa.int64()),
            }
        )

    base = (
        _where_processed(final)
        .select_columns([text_col, "url", "visit_seq"])
        .map_batches(
            lambda b: b.filter(
                pc.and_(
                    pc.is_valid(b.column(text_col)),
                    pc.not_equal(pc.fill_null(b.column(text_col), ""), ""),
                )
            ),
            batch_format="pyarrow",
        )
    )

    def runs(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "kind": pa.array([], pa.int8()),
                text_col: pa.array([], pa.string()),
                "url": pa.array([], pa.string()),
                "visit_seq": pa.array([], pa.int64()),
                "urls": pa.array([], pa.list_(pa.string())),
                "count": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        it = b.column(text_col)
        it = it.combine_chunks() if isinstance(it, pa.ChunkedArray) else it
        em = pc.or_(
            pc.equal(it, it[0]), pc.equal(it, it[len(it) - 1])
        ).to_numpy(zero_copy_only=False)
        e = b.filter(pa.array(em))
        done = _dup_runs(b.filter(pa.array(~em)))
        n_e, n_d = e.num_rows, done.num_rows
        return pa.table(
            {
                "kind": pa.array(
                    np.r_[np.zeros(n_e, np.int8), np.ones(n_d, np.int8)]
                ),
                text_col: pa.concat_arrays(
                    [
                        e.column(text_col).combine_chunks().cast(pa.string()),
                        done.column(text_col).combine_chunks().cast(pa.string()),
                    ]
                ),
                "url": pa.concat_arrays(
                    [
                        e.column("url").combine_chunks().cast(pa.string()),
                        pa.array([""] * n_d, pa.string()),
                    ]
                ),
                "visit_seq": pa.concat_arrays(
                    [
                        e.column("visit_seq").combine_chunks().cast(pa.int64()),
                        pa.array([0] * n_d, pa.int64()),
                    ]
                ),
                "urls": pa.concat_arrays(
                    [
                        pa.array([None] * n_e, pa.list_(pa.string())),
                        done.column("urls").combine_chunks(),
                    ]
                ),
                "count": pa.concat_arrays(
                    [
                        pa.array([0] * n_e, pa.int64()),
                        done.column("count").combine_chunks().cast(pa.int64()),
                    ]
                ),
            }
        )

    parts = (
        base.sort([text_col, "visit_seq"])
        .map_batches(runs, batch_format="pyarrow")
        .materialize()
    )
    interior = parts.filter(expr="kind == 1").map_batches(
        lambda b: b.select([text_col, "urls", "count"]), batch_format="pyarrow"
    )
    edge = collect_arrow(parts.filter(expr="kind == 0"))
    if edge.num_rows == 0:
        return interior
    et = edge.select([text_col, "url", "visit_seq"])
    et = et.take(
        pc.sort_indices(
            et, sort_keys=[(text_col, "ascending"), ("visit_seq", "ascending")]
        )
    )
    folded = _dup_runs(et)
    if folded.num_rows == 0:
        return interior
    return interior.union(rd.from_arrow(folded))


def summary(final: Dataset) -> dict:
    """The Resumo sheet's conditional counts (G3;
    excel_generator.py:611-672). Computed as one pass of indicator sums
    + small aggregates — no driver-side row loop."""

    def indicators(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        proc = pc.fill_null(batch.column("processed"), False)
        crit = pc.and_(
            proc, pc.greater(pc.fill_null(batch.column("total_critical"), 0), 0)
        )
        h1abs = pc.and_(proc, pc.fill_null(batch.column("h1_ausente"), False))
        tdup = pc.and_(proc, pc.fill_null(batch.column("title_duplicado"), False))
        ddup = pc.and_(proc, pc.fill_null(batch.column("description_duplicada"), False))
        hprob = pc.and_(
            proc,
            pc.greater(pc.fill_null(batch.column("headings_problematicos_count"), 0), 0),
        )
        mixed = pc.and_(proc, pc.fill_null(batch.column("has_mixed_content"), False))
        return pa.table(
            {
                "rows": [batch.num_rows],
                "processed": [pc.sum(pc.cast(proc, pa.int64())).as_py() or 0],
                "with_critical": [pc.sum(pc.cast(crit, pa.int64())).as_py() or 0],
                "h1_absent": [pc.sum(pc.cast(h1abs, pa.int64())).as_py() or 0],
                "title_dups": [pc.sum(pc.cast(tdup, pa.int64())).as_py() or 0],
                "desc_dups": [pc.sum(pc.cast(ddup, pa.int64())).as_py() or 0],
                "heading_problem_pages": [pc.sum(pc.cast(hprob, pa.int64())).as_py() or 0],
                "mixed_content_pages": [pc.sum(pc.cast(mixed, pa.int64())).as_py() or 0],
                "critical_mixed": [pc.sum(pc.fill_null(batch.column("critical_mixed_count"), 0)).as_py() or 0],
                "passive_mixed": [pc.sum(pc.fill_null(batch.column("passive_mixed_count"), 0)).as_py() or 0],
            }
        )

    parts = final.map_batches(indicators, batch_format="pyarrow").to_pandas()
    totals = parts.sum(numeric_only=True).to_dict()

    score_stats = (
        _where_processed(final)
        .aggregate(
            Mean("metatags_score", alias_name="avg_score"),
            Min("metatags_score", alias_name="min_score"),
            Max("metatags_score", alias_name="max_score"),
        )
    )
    risk = (
        _where_processed(final)
        .groupby("risk_level")
        .aggregate(Count(alias_name="pages"))
        .to_pandas()
    )
    has_scores = bool(score_stats) and score_stats.get("avg_score") is not None
    totals["avg_score"] = float(score_stats["avg_score"]) if has_scores else None
    totals["min_score"] = int(score_stats["min_score"]) if has_scores else None
    totals["max_score"] = int(score_stats["max_score"]) if has_scores else None
    totals["risk_breakdown"] = (
        dict(zip(risk["risk_level"], risk["pages"].astype(int)))
        if "risk_level" in risk.columns
        else {}
    )
    return totals


def filter_breakdown(rejected: pa.Table) -> pa.Table:
    """G5: rejected.groupby(reason).count (url_manager.py:291-309).
    Always returns a table (empty-schema'd for a reject-free crawl)."""
    import pyarrow.compute as pc

    if rejected.num_rows == 0:
        return pa.table(
            {"values": pa.array([], pa.string()), "counts": pa.array([], pa.int64())}
        )
    arrs = pc.value_counts(rejected.column("reason")).cast(
        pa.struct([("values", pa.string()), ("counts", pa.int64())])
    ).flatten()
    return pa.table({"values": arrs[0], "counts": arrs[1]})


def problematic_headings_sheet(final: Dataset) -> Dataset:
    """The Headings_Problematicos consolidated sheet
    (headings_analyzer.py:376-412 HeadingsReportGenerator): one row per
    page with problematic headings; detail strings joined ' | ',
    unique motives joined ', ', gravity escalated to CRÍTICO when any
    h1 is problematic."""

    def project(batch: pa.Table) -> pa.Table:
        rows = batch.select(
            ["url", "headings_problematicos", "headings_vazios_count",
             "headings_ocultos_count", "h1_count", "hierarquia_correta",
             "heading_sequence", "heading_sequence_valida", "metatags_score",
             "processed"]
        ).to_pylist()
        out = []
        for r in rows:
            probs = r.get("headings_problematicos") or []
            if not r.get("processed") or not probs:
                continue
            gravidades = [p.get("gravidade") for p in probs]
            motivos = []
            for p in probs:
                motivos.extend(p.get("motivos") or [])
            out.append(
                {
                    "URL": r["url"],
                    "Total_Problemas": len(probs),
                    "Headings_Vazios": r.get("headings_vazios_count") or 0,
                    "Headings_Ocultos": r.get("headings_ocultos_count") or 0,
                    "Gravidade_Geral": "CRÍTICO" if "CRÍTICO" in gravidades else "MÉDIO",
                    "Problemas_Detalhados": " | ".join(p.get("descricao", "") for p in probs),
                    "Motivos_Unicos": ", ".join(sorted(set(motivos))),
                    "H1_Count": r.get("h1_count") or 0,
                    "Hierarquia_Correta": "SIM" if r.get("hierarquia_correta") else "NÃO",
                    "Sequencia_Completa": " → ".join(r.get("heading_sequence") or []),
                    "Sequencia_Valida": " → ".join(r.get("heading_sequence_valida") or []),
                    "Score": r.get("metatags_score") or 0,
                }
            )
        if not out:
            return pa.table(
                {c: pa.array([], t) for c, t in [
                    ("URL", pa.string()), ("Total_Problemas", pa.int64()),
                    ("Headings_Vazios", pa.int64()), ("Headings_Ocultos", pa.int64()),
                    ("Gravidade_Geral", pa.string()), ("Problemas_Detalhados", pa.string()),
                    ("Motivos_Unicos", pa.string()), ("H1_Count", pa.int64()),
                    ("Hierarquia_Correta", pa.string()), ("Sequencia_Completa", pa.string()),
                    ("Sequencia_Valida", pa.string()), ("Score", pa.int64())]}
            )
        return pa.Table.from_pylist(out)

    return final.map_batches(project, batch_format="pyarrow")


def hierarchy_problems_sheet(final: Dataset) -> Dataset:
    """The Hierarquia sheet (headings_analyzer.py:414-433): pages whose
    hierarchy is incorrect or that logged hierarchy problems."""

    def project(batch: pa.Table) -> pa.Table:
        rows = batch.select(
            ["url", "problemas_hierarquia", "h1_count", "h1_text",
             "heading_sequence", "heading_sequence_valida",
             "total_problemas_headings", "hierarquia_correta", "processed"]
        ).to_pylist()
        out = []
        for r in rows:
            if not r.get("processed"):
                continue
            probs = r.get("problemas_hierarquia") or []
            if r.get("hierarquia_correta", True) and not probs:
                continue
            out.append(
                {
                    "URL": r["url"],
                    "Problemas_Hierarquia": " | ".join(probs),
                    "H1_Count": r.get("h1_count") or 0,
                    "H1_Text": r.get("h1_text") or "",
                    "Sequencia_Completa": " → ".join(r.get("heading_sequence") or []),
                    "Sequencia_Valida": " → ".join(r.get("heading_sequence_valida") or []),
                    "Total_Problemas": r.get("total_problemas_headings") or 0,
                    "Hierarquia_Correta": "SIM" if r.get("hierarquia_correta") else "NÃO",
                }
            )
        if not out:
            return pa.table(
                {c: pa.array([], t) for c, t in [
                    ("URL", pa.string()), ("Problemas_Hierarquia", pa.string()),
                    ("H1_Count", pa.int64()), ("H1_Text", pa.string()),
                    ("Sequencia_Completa", pa.string()), ("Sequencia_Valida", pa.string()),
                    ("Total_Problemas", pa.int64()), ("Hierarquia_Correta", pa.string())]}
            )
        return pa.Table.from_pylist(out)

    return final.map_batches(project, batch_format="pyarrow")


def final_stats_report(res, final: Dataset, summary_dict: dict | None = None) -> dict:
    """The reference's consolidated end-of-run statistics tree
    (main.py:465-545 'FASE 3: ESTATÍSTICAS FINAIS INTEGRADAS'):
    crawler / integrated-analysis / metatags / status / report
    sections plus the filter breakdown, computed as narrow Dataset
    aggregates over the finalized audit (no driver row loops).
    ``summary_dict`` lets callers that already ran summary() (e.g.
    write_report) skip recomputing it."""
    s = summary_dict if summary_dict is not None else summary(final)

    def dup_key_count(col: str) -> int:
        # per-block vectorized partial counts + tiny merge (one narrow
        # pass per column; no per-row lambdas)
        def partial(b: pa.Table) -> pa.Table:
            keep = pc.and_(
                pc.fill_null(b.column("processed"), False),
                pc.not_equal(pc.fill_null(b.column(col), ""), ""),
            )
            t = b.filter(keep).select([col])
            return t.group_by(col).aggregate([([], "count_all")]).rename_columns([col, "n"])

        from ..util import collect_arrow

        parts = collect_arrow(
            final.select_columns(["processed", col]).map_batches(
                partial, batch_format="pyarrow"
            ),
            schema=pa.schema([(col, pa.string()), ("n", pa.int64())]),
        )
        merged = parts.group_by(col).aggregate([("n", "sum")])
        return int(pc.sum(pc.cast(pc.greater(merged.column("n_sum"), 1), pa.int64())).as_py() or 0)

    def status_indicators(batch: pa.Table) -> pa.Table:
        ok = pc.equal(pc.fill_null(batch.column("status_code"), ""), "200")
        red = pc.fill_null(batch.column("redirected"), False)
        return pa.table(
            {
                "n_200": [pc.sum(pc.cast(ok, pa.int64())).as_py() or 0],
                "n_redirect": [pc.sum(pc.cast(red, pa.int64())).as_py() or 0],
            }
        )

    st = (
        final.select_columns(["status_code", "redirected"])
        .map_batches(status_indicators, batch_format="pyarrow")
        .to_pandas()
        .sum()
    )
    rows = int(s.get("rows", 0) or 0)
    processed = int(s.get("processed", 0) or 0)
    n_200 = int(st.get("n_200", 0) or 0)
    stats = dict(res.stats)
    reject_counts = {}
    if res.rejected.num_rows:
        bd = filter_breakdown(res.rejected)
        reject_counts = dict(
            zip(bd.column("values").to_pylist(), bd.column("counts").to_pylist())
        )
    return {
        "crawler": {
            "urls_found": stats.get("total_found"),
            "urls_processed": stats.get("visited"),
            "urls_successful": n_200,
            "urls_failed": rows - n_200,
            "success_rate": round(100.0 * n_200 / rows, 1) if rows else 0.0,
            "total_crawling_time": stats.get("setup_sec", 0) + stats.get("loop_sec", 0),
            "waves": stats.get("waves"),
            "duplicates_skipped": stats.get("total_duplicates"),
            "frontier_remaining": stats.get("frontier_remaining"),
        },
        "integrated": {
            "urls_processadas": processed,
            "urls_com_erro": rows - processed,
            "success_rate": round(100.0 * processed / rows, 1) if rows else 0.0,
        },
        "metatags": {
            "total_duplicate_titles": dup_key_count("title"),
            "total_duplicate_descriptions": dup_key_count("meta_description"),
            "pages_title_duplicado": int(s.get("title_dups", 0) or 0),
            "pages_description_duplicada": int(s.get("desc_dups", 0) or 0),
        },
        "status": {
            "status_errors": rows - n_200,
            "mixed_content_found": int(s.get("mixed_content_pages", 0) or 0),
            "redirects_found": int(st.get("n_redirect", 0) or 0),
        },
        "report": {
            "pages": processed,
            "avg_score": s.get("avg_score"),
            "min_score": s.get("min_score"),
            "max_score": s.get("max_score"),
            "critical_pages": int(s.get("with_critical", 0) or 0),
            "heading_problem_pages": int(s.get("heading_problem_pages", 0) or 0),
            "mixed_content_pages": int(s.get("mixed_content_pages", 0) or 0),
            "risk_breakdown": s.get("risk_breakdown", {}),
        },
        "filters": reject_counts,
    }


def empty_headings_sheet(final: Dataset) -> Dataset:
    """Headings_Vazios — one row per EMPTY heading occurrence (flat map
    over the headings_problematicos struct list, 'Vazio' motive only;
    reference reports/excel_generator.py:82,391 _aba_headings_vazios)."""

    def project(batch: pa.Table) -> pa.Table:
        rows = batch.select(
            ["url", "headings_problematicos", "metatags_score", "processed"]
        ).to_pylist()
        out = []
        for r in rows:
            if not r.get("processed"):
                continue
            for p in r.get("headings_problematicos") or []:
                motivos = p.get("motivos") or []
                if "Vazio" not in motivos and "vazio" not in motivos:
                    continue
                tag = (p.get("tag") or "").upper()
                out.append(
                    {
                        "URL": r["url"],
                        "Tag": tag,
                        "Posicao": p.get("posicao") or 0,
                        "Gravidade": "CRÍTICO" if tag == "H1" else "MÉDIO",
                        "Descricao": p.get("descricao") or "",
                        "Texto": p.get("texto") or "",
                        "Score_Pagina": r.get("metatags_score") or 0,
                    }
                )
        if not out:
            return pa.table(
                {c: pa.array([], t) for c, t in [
                    ("URL", pa.string()), ("Tag", pa.string()), ("Posicao", pa.int64()),
                    ("Gravidade", pa.string()), ("Descricao", pa.string()),
                    ("Texto", pa.string()), ("Score_Pagina", pa.int64())]}
            )
        return pa.Table.from_pylist(out)

    return final.map_batches(project, batch_format="pyarrow")


def heading_sequence_sheet(final: Dataset) -> Dataset:
    """Sequencia_Headings — complete vs valid heading sequence per page
    with derived totals (reference excel_generator.py:90,433
    _aba_sequencia_headings)."""

    def project(batch: pa.Table) -> pa.Table:
        def join(col):
            return pa.array(
                [" → ".join(v) if v else "" for v in batch.column(col).to_pylist()],
                pa.string(),
            )

        h1 = pc.cast(pc.fill_null(batch.column("h1_count"), 0), pa.int64())
        total_prob = pc.cast(
            pc.fill_null(batch.column("total_problemas_headings"), 0), pa.int64()
        )
        probl = pc.cast(
            pc.fill_null(batch.column("headings_problematicos_count"), 0), pa.int64()
        )
        total = pc.add(h1, total_prob)
        return pa.table(
            {
                "URL": batch.column("url"),
                "Sequencia_Completa": join("heading_sequence"),
                "Sequencia_Valida": join("heading_sequence_valida"),
                "H1s": h1,
                "Problematicos": probl,
                "Hierarquia_OK": batch.column("hierarquia_correta"),
                "Total_Problemas": total_prob,
                "Problemas_Hierarquia": pa.array(
                    [" | ".join(v) if v else ""
                     for v in batch.column("problemas_hierarquia").to_pylist()],
                    pa.string(),
                ),
                "Score": pc.cast(pc.fill_null(batch.column("metatags_score"), 0), pa.int64()),
                "Total_Headings": total,
                "Headings_Validos": pc.subtract(total, probl),
            }
        )

    return _where_processed(final).map_batches(
        project, batch_format="pyarrow"
    )


def heading_gravity_sheet(final: Dataset) -> Dataset:
    """Gravidade_Headings — pages with critical or problematic headings
    (reference excel_generator.py:98,468 _aba_gravidade_headings)."""

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "URL": batch.column("url"),
                "Criticos": pc.cast(
                    pc.fill_null(batch.column("headings_gravidade_critica"), 0), pa.int64()
                ),
                "Total_Problematicos": pc.cast(
                    pc.fill_null(batch.column("headings_problematicos_count"), 0), pa.int64()
                ),
                "H1s": pc.cast(pc.fill_null(batch.column("h1_count"), 0), pa.int64()),
                "H1_Multiplo": batch.column("h1_multiple"),
                "Score": pc.cast(pc.fill_null(batch.column("metatags_score"), 0), pa.int64()),
            }
        )

    return final.filter(
        lambda r: bool(r["processed"])
        and ((r["headings_gravidade_critica"] or 0) > 0
             or (r["headings_problematicos_count"] or 0) > 0)
    ).map_batches(project, batch_format="pyarrow")


def mixed_content_sheet(final: Dataset) -> Dataset:
    """Mixed_Content — pages serving insecure subresources over HTTPS
    (reference excel_generator.py:155,674 _aba_mixed)."""

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "URL": batch.column("url"),
                "Tem_Mixed_Content": pa.array(
                    ["SIM"] * batch.num_rows, pa.string()
                ),
                "Quantidade": pc.cast(
                    pc.fill_null(batch.column("mixed_content_count"), 0), pa.int64()
                ),
                "Criticos": pc.cast(
                    pc.fill_null(batch.column("critical_mixed_count"), 0), pa.int64()
                ),
                "Passivos": pc.cast(
                    pc.fill_null(batch.column("passive_mixed_count"), 0), pa.int64()
                ),
                "Nivel_de_Risco": batch.column("risk_level"),
                "Score": pc.cast(pc.fill_null(batch.column("metatags_score"), 0), pa.int64()),
            }
        )

    return final.filter(
        lambda r: bool(r["processed"]) and bool(r["has_mixed_content"])
    ).map_batches(project, batch_format="pyarrow")


def write_report(final: Dataset, rejected: pa.Table, out_dir: str) -> dict:
    """The multi-sheet workbook analog: one parquet directory per sheet
    (S5; reference sheet inventory utils/constants.py:71-80). Returns
    the summary dict."""
    import os

    final = final.materialize()
    final.write_parquet(os.path.join(out_dir, "complete"))
    final.map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.fill_null(b.column("processed"), False),
                pc.greater(
                    pc.fill_null(b.column("total_critical"), 0), 0
                ),
            )
        ),
        batch_format="pyarrow",
    ).write_parquet(os.path.join(out_dir, "criticos"))
    score_ranking(final).write_parquet(os.path.join(out_dir, "score_ranking"))
    duplicates_report(final, "title").write_parquet(os.path.join(out_dir, "title_duplicados"))
    duplicates_report(final, "meta_description").write_parquet(
        os.path.join(out_dir, "desc_duplicadas")
    )
    problematic_headings_sheet(final).write_parquet(
        os.path.join(out_dir, "headings_problematicos")
    )
    hierarchy_problems_sheet(final).write_parquet(os.path.join(out_dir, "hierarquia"))
    empty_headings_sheet(final).write_parquet(os.path.join(out_dir, "headings_vazios"))
    heading_sequence_sheet(final).write_parquet(
        os.path.join(out_dir, "sequencia_headings")
    )
    heading_gravity_sheet(final).write_parquet(
        os.path.join(out_dir, "gravidade_headings")
    )
    mixed_content_sheet(final).write_parquet(os.path.join(out_dir, "mixed_content"))
    from ..storage import write_table as _wt

    _wt(filter_breakdown(rejected), os.path.join(out_dir, "filtros", "breakdown.parquet"))
    s = summary(final)
    import json

    with open(os.path.join(out_dir, "resumo.json"), "w") as f:
        json.dump({k: (v if not hasattr(v, "item") else v.item()) for k, v in s.items()}, f)
    if rejected.num_rows:
        from ..storage import write_table

        write_table(rejected, os.path.join(out_dir, "rejected", "rejected.parquet"))
    return s
