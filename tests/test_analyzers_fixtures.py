"""Analyzer-kernel conformance against the reference's three inline
HTML fixtures (in parsed-attribute form, FIXTURES.md F4):

- metatags_analyzer.py:504-522  (full page with heading problems)
- headings_analyzer.py:442-453 and :505-513 (hierarchy jumps)
- status_analyzer.py:397-425   (mixed content + mock responses)

Expected values are hand-derived from the reference's logic, not
computed by our own code.
"""

from crawler_seo_ray.stages.analyzers import (
    analyze_headings,
    analyze_mixed_content,
    analyze_page,
    analyze_status,
    headings_score,
    risk_level,
)
from crawler_seo_ray.stages.scoring import finalize_page


def H(tag, text, style="", classes=""):
    return {"tag": tag, "text": text, "style": style, "classes": classes}


def test_metatags_fixture_page():
    """The metatags test page: short title, 2×h1, empty h2, hidden h2,
    h3→h6 jump (metatags_analyzer.py:504-571)."""
    headings = [
        H("h1", "Título Principal"),
        H("h2", ""),  # empty
        H("h3", "Subtítulo"),
        H("h6", "Salto na hierarquia"),
        H("h2", "Heading Oculto", style="color: white;"),
        H("h1", "Segundo H1"),
    ]
    m = analyze_headings(headings)
    assert m["h1_count"] == 2
    assert m["h1_ausente"] is False
    assert m["h1_multiple"] is True
    assert m["headings_problematicos_count"] == 2
    assert m["headings_vazios_count"] == 1
    assert m["headings_ocultos_count"] == 1
    assert m["headings_gravidade_critica"] == 0  # both problematic are h2
    assert m["hierarquia_correta"] is False
    jumps = [p for p in m["problemas_hierarquia"] if "Salto" in p]
    assert len(jumps) == 1 and "H3 → H6" in jumps[0] and "H4, H5" in jumps[0]
    # total: 2 problematic + 1 multiple-h1 + 1 jump
    assert m["total_problemas_headings"] == 4
    # headings sub-score: +10 (h1 present, multiple) −2·3 −15 → clamp 0
    assert headings_score(m) == 0

    attrs = {
        "url": "https://test.com/page1",
        "status_code": 200,
        "content_type": "text/html",
        "final_url": "https://test.com/page1",
        "title": "Página de Teste SEO",  # 19 chars → Muito curto
        "meta_description": (
            "Esta é uma descrição de teste para análise SEO com tamanho "
            "adequado para validação completa."
        ),
        "meta_viewport": "width=device-width, initial-scale=1",
        "canonical_url": "https://test.com/canonical",
        "og_title": "Título Open Graph",
        "headings": headings,
    }
    a = analyze_page(attrs)
    assert a["title_status"] == "Muito curto"
    # the reference uses the same STATUS_TOO_SHORT constant for both
    # fields (utils/constants.py:53) — "Muito curto" even for description
    assert a["description_status"] == "Muito curto"  # 92 chars < 120
    assert a["has_open_graph"] is True
    f = finalize_page(a, False, False)
    # title 0 + desc 0 + headings 0 + bonus (OG 5 + viewport 3 + canonical 2)
    assert f["metatags_score"] == 10
    assert f["score_bonus"] == 10
    assert "H1 ausente" not in f["critical_issues"]
    assert "Múltiplos H1" in f["warnings"]
    assert "Hierarquia de headings incorreta" in f["warnings"]


def test_hierarchy_fix_fixture():
    """Hidden h3 + empty h4 must NOT mask the h4→h6 jump
    (headings_analyzer.py:436-496 — the 'niveis_todos' correction)."""
    m = analyze_headings(
        [
            H("h1", "Título Principal"),
            H("h2", "Subtítulo Nível 2"),
            H("h3", "Nível 3 OCULTO", style="display: none;"),
            H("h4", ""),
            H("h6", "SALTO PARA H6"),
            H("h3", "Volta para H3"),
        ]
    )
    assert m["hierarquia_correta"] is False
    jumps = [p for p in m["problemas_hierarquia"] if "Salto" in p]
    assert len(jumps) == 1 and "H4 → H6" in jumps[0] and "H5" in jumps[0]
    assert m["headings_vazios_count"] == 1
    assert m["headings_ocultos_count"] == 1
    assert m["total_problemas_headings"] == 3  # 2 problematic + 1 jump
    # valid sequence excludes the problematic two
    assert len(m["heading_sequence"]) == 6
    assert len(m["heading_sequence_valida"]) == 4


def test_simple_jump_fixture():
    """h1→h2→h6 must flag the H2→H6 jump (headings_analyzer.py:499-529)."""
    m = analyze_headings([H("h1", "Título"), H("h2", "Nível 2"), H("h6", "SALTO DIRETO PARA H6")])
    assert any("H2 → H6" in p for p in m["problemas_hierarquia"])
    assert m["hierarquia_correta"] is False


def test_status_fixture_mixed_content_and_risk():
    """The status analyzer fixture: 4 insecure resources (3 critical,
    1 passive), one https resource skipped; only X-Frame-Options set
    (status_analyzer.py:392-478)."""
    resources = [
        {"rtype": "stylesheet", "tag": "link", "attribute": "href",
         "url": "http://insecure.com/style.css", "category": "critical"},
        {"rtype": "script", "tag": "script", "attribute": "src",
         "url": "http://insecure.com/script.js", "category": "critical"},
        {"rtype": "image", "tag": "img", "attribute": "src",
         "url": "http://insecure.com/image.jpg", "category": "passive"},
        {"rtype": "iframe", "tag": "iframe", "attribute": "src",
         "url": "http://insecure.com/iframe.html", "category": "critical"},
        {"rtype": "image", "tag": "img", "attribute": "src",
         "url": "https://secure.com/safe.jpg", "category": "passive"},
    ]
    mixed = analyze_mixed_content("https://test.com", resources)
    assert mixed["mixed_content_count"] == 4  # the https one is skipped
    assert mixed["critical_mixed_count"] == 3
    assert mixed["passive_mixed_count"] == 1
    assert mixed["has_mixed_content"] is True

    status = analyze_status(
        {
            "url": "https://test.com",
            "status_code": 200,
            "final_url": "https://test.com",
            "content_type": "text/html; charset=utf-8",
            "content_length": 1024,
            "security_headers": {"X-Frame-Options": "DENY"},
        }
    )
    assert status["x_frame_options"] is True
    assert status["hsts_present"] is False
    # risk = (3·2 + 1 + 4 missing·3)·10 = 190 → clamp 100 → high
    r = risk_level(3, 1, status)
    assert r["risk_score"] == 100 and r["risk_level"] == "high"

    # http:// page: mixed-content scan is skipped entirely
    assert analyze_mixed_content("http://test.com", resources)["mixed_content_count"] == 0


def test_status_fixture_404_and_redirect():
    s404 = analyze_status(
        {"url": "https://test.com/404", "status_code": 404,
         "final_url": "https://test.com/404", "content_type": "text/html"}
    )
    assert "Página retornou código de status 404" in s404["status_warnings"]
    assert "Página não encontrada (404)" in s404["status_warnings"]

    s301 = analyze_status(
        {"url": "https://test.com/old-url", "status_code": 301,
         "final_url": "https://test.com/new-url", "content_type": "text/html"}
    )
    assert s301["redirected"] is True
    assert any(w.startswith("Redirect 301:") for w in s301["status_warnings"])
    assert "Redirect pode afetar SEO" in s301["seo_status_issues"]

    # >1MB content-length perf warning (status_analyzer.py:310-312)
    sbig = analyze_status(
        {"url": "https://t.com/big", "status_code": 200, "final_url": "https://t.com/big",
         "content_type": "text/html", "content_length": 2 * 1024 * 1024}
    )
    assert len(sbig["performance_issues"]) == 1


def test_no_headings_page_short_circuit():
    """No headings: one problem entry, hierarchy stays True, no h1-absent
    entry (the reference returns early, headings_analyzer.py:34-38)."""
    m = analyze_headings([])
    assert m["problemas_hierarquia"] == ["Nenhum heading encontrado"]
    assert m["hierarquia_correta"] is True
    assert m["h1_ausente"] is True
    assert m["total_problemas_headings"] == 1


def test_invisible_rgb_and_class_detection():
    m = analyze_headings(
        [
            H("h1", "ok"),
            H("h2", "rgb-light", style="color: rgb(252, 253, 254)"),
            H("h2", "class-hidden", classes="sr-only extra"),
            H("h2", "positioned", style="text-indent:-9999px"),
            H("h2", "visible", style="color: rgb(10, 20, 30)"),
        ]
    )
    assert m["headings_ocultos_count"] == 3

def test_finalize_batch_matches_finalize_page():
    """The vectorized kernel must equal the scalar reference kernel on
    every field, across a grid of statuses/flags/heading shapes."""
    import itertools

    import numpy as np
    import pyarrow as pa

    from crawler_seo_ray.stages.scoring import finalize_batch, finalize_page

    rows = []
    statuses = ["OK", "Ausente", "Muito curto", "Muito longo"]
    for ts, ds_, h1a, h1m, hier, crit, probl, og in itertools.product(
        statuses, statuses, [False, True], [False, True], [False, True], [0, 2], [0, 3], [False, True]
    ):
        rows.append(
            {
                "processed": True,
                "title_status": ts, "title_length": 12,
                "description_status": ds_, "description_length": 80,
                "h1_ausente": h1a, "h1_multiple": h1m, "hierarquia_correta": hier,
                "headings_gravidade_critica": crit,
                "headings_problematicos_count": crit + probl,
                "has_open_graph": og, "meta_viewport": "w" if og else "",
                "canonical_url": "" if h1a else "https://x/c",
                "status_warnings": ["w1"] if h1m else [],
            }
        )
    rows.append({**rows[0], "processed": False})
    batch = pa.Table.from_pylist(rows)
    n = len(rows)
    rng = np.random.default_rng(0)
    tflag = rng.random(n) < 0.5
    dflag = rng.random(n) < 0.5
    tflag[-1] = dflag[-1] = False
    out = finalize_batch(batch, tflag, dflag)
    for k, r in enumerate(rows):
        if not r["processed"]:
            assert out["metatags_score"][k] is None
            continue
        ref = finalize_page(r, bool(tflag[k]), bool(dflag[k]))
        for field in out:
            assert out[field][k] == ref[field], (k, field, out[field][k], ref[field])
