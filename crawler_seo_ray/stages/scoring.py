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
