"""Duplicate-flag-dependent finalization (SURVEY.md A3 → M17, M18, M20).

The reference computes title/description duplicate flags *at visit
time* against a mutable dict (metatags_analyzer.py:196-228): the first
occurrence of a text is not flagged, every later occurrence is. Our
engine derives the same flags post-crawl with a groupby over
``(text, visit_seq)`` — flag = visit_seq > min(visit_seq) of the group
(empty text never flagged) — then applies this finalization kernel.

Covers: title/description issue lists (metatags_analyzer.py:100-151),
final score (:230-276), critical issues + warnings (:278-327), and the
consolidated warning list (main.py:89-119).
"""

from __future__ import annotations

from .analyzers import STATUS_ABSENT, STATUS_OK, STATUS_TOO_LONG, STATUS_TOO_SHORT, headings_score

SCORE_TITLE_OK = 30
SCORE_DESCRIPTION_OK = 25
PENALTY_DUP_TITLE = 10
PENALTY_DUP_DESCRIPTION = 10


def finalize_page(a: dict, title_dup: bool, desc_dup: bool) -> dict:
    """Merge dup flags into an analyzed page dict; returns the new fields."""
    out: dict = {"title_duplicado": title_dup, "description_duplicada": desc_dup}

    title_issues: list[str] = []
    ts, tl = a.get("title_status"), a.get("title_length", 0)
    if ts == STATUS_ABSENT:
        title_issues.append("Title ausente")
    elif ts == STATUS_TOO_SHORT:
        title_issues.append(f"Title muito curto ({tl} chars)")
    elif ts == STATUS_TOO_LONG:
        title_issues.append(f"Title muito longo ({tl} chars)")
    if title_dup:
        title_issues.append("Title duplicado")
    out["title_issues"] = title_issues

    desc_issues: list[str] = []
    ds, dl = a.get("description_status"), a.get("description_length", 0)
    if ds == STATUS_ABSENT:
        desc_issues.append("Meta description ausente")
    elif ds == STATUS_TOO_SHORT:
        desc_issues.append(f"Description muito curta ({dl} chars)")
    elif ds == STATUS_TOO_LONG:
        desc_issues.append(f"Description muito longa ({dl} chars)")
    if desc_dup:
        desc_issues.append("Description duplicada")
    out["description_issues"] = desc_issues

    # --- score (metatags_analyzer.py:230-276): note the reference quirks,
    # reproduced deliberately: a duplicated title earns the penalized score
    # regardless of its length status; non-OK non-dup earns 0.
    score = 0
    if ts == STATUS_OK and not title_dup:
        score += SCORE_TITLE_OK
    elif title_dup:
        score += max(0, SCORE_TITLE_OK - PENALTY_DUP_TITLE)
    if ds == STATUS_OK and not desc_dup:
        score += SCORE_DESCRIPTION_OK
    elif desc_dup:
        score += max(0, SCORE_DESCRIPTION_OK - PENALTY_DUP_DESCRIPTION)
    h_score = headings_score(a)
    score += h_score
    bonus = 0
    if a.get("has_open_graph"):
        bonus += 5
    if a.get("meta_viewport"):
        bonus += 3
    if a.get("canonical_url"):
        bonus += 2
    score += bonus
    final_score = min(score, 100)
    out["metatags_score"] = final_score
    out["score_title"] = SCORE_TITLE_OK if ts == STATUS_OK else 0
    out["score_description"] = SCORE_DESCRIPTION_OK if ds == STATUS_OK else 0
    out["score_headings"] = h_score
    out["score_bonus"] = bonus

    # --- critical issues + warnings (metatags_analyzer.py:278-327)
    critical: list[str] = []
    warnings: list[str] = []
    if ts == STATUS_ABSENT:
        critical.append("Title ausente")
    if ds == STATUS_ABSENT:
        critical.append("Meta description ausente")
    if a.get("h1_ausente"):
        critical.append("H1 ausente")
    if a.get("headings_gravidade_critica", 0) > 0:
        critical.append(f"H1s problemáticos ({a.get('headings_gravidade_critica')})")
    if title_dup:
        warnings.append("Title duplicado")
    if desc_dup:
        warnings.append("Description duplicada")
    if a.get("h1_multiple"):
        warnings.append("Múltiplos H1")
    if not a.get("hierarquia_correta", True):
        warnings.append("Hierarquia de headings incorreta")
    if a.get("headings_problematicos_count", 0) > 0:
        warnings.append(f"Headings problemáticos ({a.get('headings_problematicos_count')})")
    if ts in (STATUS_TOO_SHORT, STATUS_TOO_LONG):
        warnings.append(f"Title {ts.lower()}")
    if ds in (STATUS_TOO_SHORT, STATUS_TOO_LONG):
        warnings.append(f"Description {ds.lower()}")
    out["critical_issues"] = critical
    out["warnings"] = warnings
    out["total_critical"] = len(critical)
    out["total_warnings"] = len(warnings)

    # --- consolidated warning list (main.py:89-119): status warnings,
    # then metatag warnings, then critical issues prefixed CRÍTICO:
    out["all_warnings"] = (
        list(a.get("status_warnings") or [])
        + warnings
        + [f"CRÍTICO: {c}" for c in critical]
    )
    return out


def finalize_batch(batch, tflag, dflag):
    """Vectorized finalization over a narrow Arrow batch (numpy for all
    scalar columns; per-row Python only for the short issue/warning
    string lists). Must produce EXACTLY the columns/values of
    :func:`finalize_page` row-wise — A/B-tested in
    tests/test_analyzers_fixtures.py and transitively pinned by the
    engine≡oracle comparison.

    ``batch`` needs columns: processed, title_status, title_length,
    description_status, description_length, h1_ausente, h1_multiple,
    hierarquia_correta, headings_gravidade_critica,
    headings_problematicos_count, has_open_graph, meta_viewport,
    canonical_url, status_warnings. ``tflag``/``dflag`` are boolean
    numpy arrays. Returns a dict of column lists/arrays (None rows where
    processed is falsy).
    """
    import numpy as np
    import pyarrow.compute as pc

    n = batch.num_rows
    proc = pc.fill_null(batch.column("processed"), False).to_numpy(zero_copy_only=False)
    ts = batch.column("title_status").to_pylist()
    tl = pc.fill_null(batch.column("title_length"), 0).to_numpy(zero_copy_only=False)
    ds_ = batch.column("description_status").to_pylist()
    dl = pc.fill_null(batch.column("description_length"), 0).to_numpy(zero_copy_only=False)

    def b(col):
        return pc.fill_null(batch.column(col), False).to_numpy(zero_copy_only=False)

    def i(col):
        return pc.fill_null(batch.column(col), 0).to_numpy(zero_copy_only=False).astype(np.int64)

    h1_abs = b("h1_ausente")
    h1_mul = b("h1_multiple")
    hier = b("hierarquia_correta")
    crit_h = i("headings_gravidade_critica")
    probl = i("headings_problematicos_count")
    og = b("has_open_graph")
    viewport = np.array(
        [bool(v) for v in pc.coalesce(batch.column("meta_viewport"), "").to_pylist()]
    )
    canonical = np.array(
        [bool(v) for v in pc.coalesce(batch.column("canonical_url"), "").to_pylist()]
    )

    ts_ok = np.array([s == STATUS_OK for s in ts])
    ds_ok = np.array([s == STATUS_OK for s in ds_])

    # headings sub-score (analyzers.headings_score, vectorized)
    h_score = (
        np.where(~h1_abs & ~h1_mul, 20, np.where(~h1_abs, 10, 0))
        + np.where(hier, 15, 0)
        - crit_h * 10
        - (probl - crit_h) * 3
        - np.where(~hier, 15, 0)
    )
    h_score = np.clip(h_score, 0, 35)

    t_score = np.where(ts_ok & ~tflag, SCORE_TITLE_OK, np.where(tflag, SCORE_TITLE_OK - PENALTY_DUP_TITLE, 0))
    d_score = np.where(
        ds_ok & ~dflag, SCORE_DESCRIPTION_OK, np.where(dflag, SCORE_DESCRIPTION_OK - PENALTY_DUP_DESCRIPTION, 0)
    )
    bonus = og * 5 + viewport * 3 + canonical * 2
    final_score = np.minimum(t_score + d_score + h_score + bonus, 100)

    out = {
        "title_issues": [None] * n,
        "description_issues": [None] * n,
        "metatags_score": [None] * n,
        "score_title": [None] * n,
        "score_description": [None] * n,
        "score_headings": [None] * n,
        "score_bonus": [None] * n,
        "critical_issues": [None] * n,
        "warnings": [None] * n,
        "total_critical": [None] * n,
        "total_warnings": [None] * n,
        "all_warnings": [None] * n,
    }
    status_warn = batch.column("status_warnings").to_pylist()
    for k in np.flatnonzero(proc):
        tsk, dsk = ts[k], ds_[k]
        t_issues = []
        if tsk == STATUS_ABSENT:
            t_issues.append("Title ausente")
        elif tsk == STATUS_TOO_SHORT:
            t_issues.append(f"Title muito curto ({tl[k]} chars)")
        elif tsk == STATUS_TOO_LONG:
            t_issues.append(f"Title muito longo ({tl[k]} chars)")
        if tflag[k]:
            t_issues.append("Title duplicado")
        d_issues = []
        if dsk == STATUS_ABSENT:
            d_issues.append("Meta description ausente")
        elif dsk == STATUS_TOO_SHORT:
            d_issues.append(f"Description muito curta ({dl[k]} chars)")
        elif dsk == STATUS_TOO_LONG:
            d_issues.append(f"Description muito longa ({dl[k]} chars)")
        if dflag[k]:
            d_issues.append("Description duplicada")

        critical = []
        warnings = []
        if tsk == STATUS_ABSENT:
            critical.append("Title ausente")
        if dsk == STATUS_ABSENT:
            critical.append("Meta description ausente")
        if h1_abs[k]:
            critical.append("H1 ausente")
        if crit_h[k] > 0:
            critical.append(f"H1s problemáticos ({crit_h[k]})")
        if tflag[k]:
            warnings.append("Title duplicado")
        if dflag[k]:
            warnings.append("Description duplicada")
        if h1_mul[k]:
            warnings.append("Múltiplos H1")
        if not hier[k]:
            warnings.append("Hierarquia de headings incorreta")
        if probl[k] > 0:
            warnings.append(f"Headings problemáticos ({probl[k]})")
        if tsk in (STATUS_TOO_SHORT, STATUS_TOO_LONG):
            warnings.append(f"Title {tsk.lower()}")
        if dsk in (STATUS_TOO_SHORT, STATUS_TOO_LONG):
            warnings.append(f"Description {dsk.lower()}")

        out["title_issues"][k] = t_issues
        out["description_issues"][k] = d_issues
        out["metatags_score"][k] = int(final_score[k])
        out["score_title"][k] = SCORE_TITLE_OK if ts_ok[k] else 0
        out["score_description"][k] = SCORE_DESCRIPTION_OK if ds_ok[k] else 0
        out["score_headings"][k] = int(h_score[k])
        out["score_bonus"][k] = int(bonus[k])
        out["critical_issues"][k] = critical
        out["warnings"][k] = warnings
        out["total_critical"][k] = len(critical)
        out["total_warnings"][k] = len(warnings)
        out["all_warnings"][k] = (
            list(status_warn[k] or []) + warnings + [f"CRÍTICO: {c}" for c in critical]
        )
    return out
