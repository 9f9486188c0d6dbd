"""Per-page SEO analyzer kernels (SURVEY.md M6–M16, M18 pre-dup parts).

Reimplemented from the reference's observed behavior:
- title/description classification  (analyzers/metatags_analyzer.py:81-161)
- other metatags                     (analyzers/metatags_analyzer.py:163-194)
- headings hierarchy + hidden/empty  (analyzers/headings_analyzer.py:15-313)
- HTTP status / mixed content / risk (analyzers/status_analyzer.py:58-353)

These are pure scalar functions over the structured page attributes
(our synthetic web stores parsed attributes, not raw HTML — FIXTURES.md
F4). The pure-Python oracle and the Ray batch stages both call them, so
orchestration differences can't hide kernel differences.

Everything that depends on the crawl-order duplicate flags
(title/description dup, final score, critical issues, consolidated
warnings) lives in ``pipelines.report`` — it needs the post-crawl
groupby (SURVEY.md A3/M17).
"""

from __future__ import annotations

import re

# behavioral constants observed in config/settings.py:46-49,130-154,196-197
TITLE_MIN, TITLE_MAX = 30, 60
DESC_MIN, DESC_MAX = 120, 160

STATUS_OK = "OK"
STATUS_ABSENT = "Ausente"
STATUS_TOO_SHORT = "Muito curto"
STATUS_TOO_LONG = "Muito longo"

GRAVITY_CRITICAL = "CRÍTICO"
GRAVITY_MEDIUM = "MÉDIO"
PROBLEM_EMPTY = "Vazio"
PROBLEM_HIDDEN = "Oculto"

HIDDEN_CSS_CLASSES = [
    "hidden", "hide", "invisible", "sr-only", "screen-reader",
    "visually-hidden", "off-screen", "text-hide", "visuallyhidden",
]
INVISIBLE_COLORS = [
    "color:white", "color: white", "color:#fff", "color: #fff",
    "color:#ffffff", "color: #ffffff", "color:transparent",
    "color: transparent", "color:rgba(0,0,0,0)", "color: rgba(0,0,0,0)",
    "color:rgba(255,255,255,0)", "color: rgba(255,255,255,0)",
]
HIDDEN_STYLES = [
    "display:none", "display: none", "visibility:hidden", "visibility: hidden",
    "opacity:0", "opacity: 0", "font-size:0", "font-size: 0",
]
SUSPICIOUS_POSITIONING = ["text-indent:-", "left:-", "top:-", "position:absolute", "clip:rect"]
RGB_LIGHT_THRESHOLD = 250
_RGB_RE = re.compile(r"color:\s*rgb\(\s*(\d+)\s*,\s*(\d+)\s*,\s*(\d+)\s*\)")

SECURITY_HEADER_KEYS = [
    "X-Frame-Options",
    "X-Content-Type-Options",
    "X-XSS-Protection",
    "Strict-Transport-Security",
    "Content-Security-Policy",
    "Referrer-Policy",
]


def classify_length(text: str, lo: int, hi: int) -> str:
    if not text:
        return STATUS_ABSENT
    n = len(text)
    if n < lo:
        return STATUS_TOO_SHORT
    if n > hi:
        return STATUS_TOO_LONG
    return STATUS_OK


def analyze_title(title: str) -> dict:
    t = (title or "").strip()
    return {"title": t, "title_length": len(t), "title_status": classify_length(t, TITLE_MIN, TITLE_MAX)}


def analyze_description(desc: str) -> dict:
    d = (desc or "").strip()
    return {
        "meta_description": d,
        "description_length": len(d),
        "description_status": classify_length(d, DESC_MIN, DESC_MAX),
    }


def analyze_other_meta(attrs: dict) -> dict:
    out = {
        k: (attrs.get(k) or "").strip()
        for k in (
            "meta_keywords",
            "meta_robots",
            "meta_viewport",
            "canonical_url",
            "og_title",
            "og_description",
            "og_image",
        )
    }
    out["has_open_graph"] = bool(out["og_title"] or out["og_description"])
    return out


def _is_hidden(style: str, classes: str, detect_invisible_colors: bool = True) -> bool:
    s = (style or "").lower()
    for h in HIDDEN_STYLES:
        if h in s:
            return True
    if detect_invisible_colors:
        for c in INVISIBLE_COLORS:
            if c in s:
                return True
        for r, g, b in _RGB_RE.findall(s):
            if int(r) > RGB_LIGHT_THRESHOLD and int(g) > RGB_LIGHT_THRESHOLD and int(b) > RGB_LIGHT_THRESHOLD:
                return True
    cl = (classes or "").lower()
    for h in HIDDEN_CSS_CLASSES:
        if h in cl:
            return True
    for p in SUSPICIOUS_POSITIONING:
        if p in s:
            return True
    return False


def _problem_description(tag: str, pos: int, texto: str, motivos: list[str]) -> dict:
    """Struct the reference builds at analyzers/headings_analyzer.py:259-285."""
    desc = f"{tag.upper()} na posição {pos}"
    if motivos:
        desc += f" ({', '.join(motivos).lower()})"
    if texto:
        desc += f': "{texto[:30]}..."' if len(texto) > 30 else f': "{texto}"'
    return {
        "descricao": desc,
        "tag": tag,
        "posicao": pos,
        "texto": texto[:50] + "..." if len(texto) > 50 else texto,
        "motivos": motivos,
        "gravidade": GRAVITY_CRITICAL if tag == "h1" else GRAVITY_MEDIUM,
    }


def analyze_headings(headings: list[dict], detect_invisible_colors: bool = True) -> dict:
    """Full hierarchy analysis (reference analyze_hierarchy_corrected +
    extract_heading_metrics + get_h1_text, headings_analyzer.py:15-332).

    Jump detection runs over ALL headings (including empty/hidden ones);
    only valid headings enter the 'valid sequence'. First-not-h1 and
    jump checks are skipped entirely when no h1 exists; the no-headings
    page short-circuits with a single problem entry and
    hierarquia_correta left True — all reference behaviors.
    """
    seq: list[str] = []
    seq_valid: list[str] = []
    problemas: list[str] = []
    issues: list[str] = []
    probl_structs: list[dict] = []
    h1_count = 0
    h1_text = ""
    total = 0

    if not headings:
        return {
            "h1_count": 0,
            "h1_text": "",
            "h1_ausente": True,
            "h1_multiple": False,
            "hierarquia_correta": True,
            "heading_sequence": [],
            "heading_sequence_valida": [],
            "problemas_hierarquia": ["Nenhum heading encontrado"],
            "heading_issues": ["Sem headings"],
            "headings_problematicos": [],
            "headings_problematicos_count": 0,
            "headings_vazios_count": 0,
            "headings_ocultos_count": 0,
            "headings_gravidade_critica": 0,
            "total_problemas_headings": 1,
        }

    levels_all: list[int] = []
    details: list[dict] = []
    for i, h in enumerate(headings):
        tag = h["tag"]
        nivel = int(tag[1])
        texto = (h.get("text") or "").strip()
        vazio = len(texto) == 0
        oculto = _is_hidden(h.get("style", ""), h.get("classes", ""), detect_invisible_colors)
        motivos = ([PROBLEM_EMPTY] if vazio else []) + ([PROBLEM_HIDDEN] if oculto else [])
        problematic = vazio or oculto
        details.append({"tag": tag, "pos": i + 1, "texto": texto, "vazio": vazio, "oculto": oculto})
        levels_all.append(nivel)
        seq.append(f"{tag}:{texto[:30]}...")
        if not problematic:
            seq_valid.append(f"{tag}:{texto[:30]}...")
        if tag == "h1":
            h1_count += 1
            if not h1_text:
                h1_text = texto  # reference get_h1_text: first h1's text
        if problematic:
            ps = _problem_description(tag, i + 1, texto, motivos)
            probl_structs.append(ps)
            issues.append(ps["descricao"])
            total += 1

    h1_ausente = h1_count == 0
    if h1_ausente:
        problemas.append("H1 ausente")
        issues.append("H1 ausente")
        total += 1
    h1_multiple = h1_count > 1
    if h1_multiple:
        problemas.append(f"Múltiplos H1 ({h1_count})")
        issues.append("Múltiplos H1")
        total += 1

    hierarquia_correta = True
    if levels_all and not h1_ausente:
        seq_problems: list[str] = []
        if levels_all[0] != 1:
            seq_problems.append(
                f"Primeiro heading válido é {details[0]['tag'].upper()}, deveria ser H1"
            )
        for i in range(1, len(levels_all)):
            prev, curr = levels_all[i - 1], levels_all[i]
            if curr > prev + 1:
                skipped = ", ".join(f"H{k}" for k in range(prev + 1, curr))
                seq_problems.append(
                    f"Salto na hierarquia: {details[i - 1]['tag'].upper()} → "
                    f"{details[i]['tag'].upper()} (níveis pulados: {skipped})"
                )
        if seq_problems:
            hierarquia_correta = False
            problemas.extend(seq_problems)
            issues.extend(seq_problems)
            total += len(seq_problems)

    vazios = sum(1 for p in probl_structs if PROBLEM_EMPTY in p["motivos"])
    ocultos = sum(1 for p in probl_structs if PROBLEM_HIDDEN in p["motivos"])
    criticos = sum(1 for p in probl_structs if p["gravidade"] == GRAVITY_CRITICAL)

    return {
        "h1_count": h1_count,
        "h1_text": h1_text,
        "h1_ausente": h1_ausente,
        "h1_multiple": h1_multiple,
        "hierarquia_correta": hierarquia_correta,
        "heading_sequence": seq,
        "heading_sequence_valida": seq_valid,
        "problemas_hierarquia": problemas,
        "heading_issues": issues,
        "headings_problematicos": probl_structs,
        "headings_problematicos_count": len(probl_structs),
        "headings_vazios_count": vazios,
        "headings_ocultos_count": ocultos,
        "headings_gravidade_critica": criticos,
        "total_problemas_headings": total,
    }


def headings_score(m: dict) -> int:
    """Reference HeadingsScoreCalculator (headings_analyzer.py:335-367)."""
    score = 0
    if not m.get("h1_ausente", True) and not m.get("h1_multiple", False):
        score += 20
    elif not m.get("h1_ausente", True):
        score += 10
    if m.get("hierarquia_correta", True):
        score += 15
    criticos = m.get("headings_gravidade_critica", 0)
    outros = m.get("headings_problematicos_count", 0) - criticos
    score -= criticos * 10 + outros * 3
    if not m.get("hierarquia_correta", True):
        score -= 15
    return max(0, min(score, 35))


def analyze_status(attrs: dict) -> dict:
    """HTTP-status portion (status_analyzer.py:58-102 + 271-324)."""
    code = attrs["status_code"]
    u = attrs["url"]
    final = attrs.get("final_url", u)
    warnings: list[str] = []
    if code != 200:
        warnings.append(f"Página retornou código de status {code}")
        if code in (301, 302, 303, 307, 308):
            warnings.append(f"Redirect {code}: {u} → {final}")
        elif code == 404:
            warnings.append("Página não encontrada (404)")
        elif isinstance(code, int) and code >= 500:
            warnings.append(f"Erro do servidor ({code})")
        elif code == 403:
            warnings.append("Acesso negado (403)")

    headers = attrs.get("security_headers", {}) or {}
    present = [k for k in SECURITY_HEADER_KEYS if headers.get(k)]
    flags = {
        "hsts_present": "Strict-Transport-Security" in present,
        "csp_present": "Content-Security-Policy" in present,
        "x_frame_options": "X-Frame-Options" in present,
        "x_content_type_options": "X-Content-Type-Options" in present,
        "referrer_policy": "Referrer-Policy" in present,
    }

    perf: list[str] = []
    clen = attrs.get("content_length")
    if clen and int(clen) > 1024 * 1024:
        perf.append(f"Página muito grande ({clen} bytes)")
    seo: list[str] = []
    if code in (301, 302):
        seo.append("Redirect pode afetar SEO")
    if "text/html" not in (attrs.get("content_type") or "").lower():
        seo.append("Content-Type não é HTML")

    return {
        "status_warnings": warnings,
        "redirected": final != u,
        "security_headers_present": present,
        **flags,
        "performance_issues": perf,
        "seo_status_issues": seo,
    }


def analyze_mixed_content(url: str, resources: list[dict]) -> dict:
    """Mixed-content scan over parsed resource structs
    (status_analyzer.py:111-269; HTTPS-only gate at :121-122)."""
    out = {
        "mixed_content_resources": [],
        "has_mixed_content": False,
        "mixed_content_count": 0,
        "critical_mixed_count": 0,
        "passive_mixed_count": 0,
    }
    if not url.startswith("https://"):
        return out
    found = []
    crit = passive = 0
    for r in resources or []:
        ru = (r.get("url") or "").strip()
        if not ru.lower().startswith("http://"):
            continue
        found.append(
            {
                "rtype": r["rtype"],
                "tag": r["tag"],
                "attribute": r["attribute"],
                "url": ru,
                "category": r["category"],
            }
        )
        if r["category"] == "critical":
            crit += 1
        else:
            passive += 1
    out.update(
        {
            "mixed_content_resources": found,
            "has_mixed_content": bool(found),
            "mixed_content_count": len(found),
            "critical_mixed_count": crit,
            "passive_mixed_count": passive,
        }
    )
    return out


def risk_level(critical_mixed: int, passive_mixed: int, flags: dict) -> dict:
    """Risk score (status_analyzer.py:326-353)."""
    missing = sum(
        not flags.get(k, False)
        for k in ("hsts_present", "csp_present", "x_frame_options", "x_content_type_options", "referrer_policy")
    )
    score = min((critical_mixed * 2 + passive_mixed + missing * 3) * 10, 100)
    level = "high" if score >= 70 else "medium" if score >= 40 else "low"
    return {"risk_level": level, "risk_score": score}


def analyze_page(attrs: dict, detect_invisible_colors: bool = True) -> dict:
    """Everything computable from one page alone (no cross-page state).

    Runs only for 200 + text/html pages, matching the reference gate
    (core/crawler.py:163-164, main.py:199).
    """
    out: dict = {}
    out.update(analyze_headings(attrs.get("headings") or [], detect_invisible_colors))
    out.update(analyze_title(attrs.get("title", "")))
    out.update(analyze_description(attrs.get("meta_description", "")))
    out.update(analyze_other_meta(attrs))
    status = analyze_status(attrs)
    mixed = analyze_mixed_content(attrs["url"], attrs.get("resources") or [])
    out.update(status)
    out.update(mixed)
    out.update(
        risk_level(mixed["critical_mixed_count"], mixed["passive_mixed_count"], status)
    )
    return out
