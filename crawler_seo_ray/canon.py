"""URL canonicalization + relevance filtering (SURVEY.md M2–M4).

Reimplements — from observed behavior, not code — the reference's
normalization pipeline (``core/url_manager.py:36-137``) and relevance
blocklists (``core/url_manager.py:139-198``):

normalize (reference ``normalize_url`` → ``_deep_normalize_url`` →
``_normalize_query_params``):
  1. strip; resolve against base_url when given (urljoin)
  2. scheme must be http/https, else reject (silent, no log)
  3. host (lowercased, ``www.``-stripped) must match the crawl scope,
     else reject (silent).  NOTE the canonical URL itself keeps the
     netloc verbatim — ``www.``/case variants are distinct canonicals
     in the reference, and we preserve that.
  4. drop fragment; collapse ``/+`` → ``/``; strip trailing slash on
     non-root paths; empty path → ``/``
  5. query: parse (blank values dropped), remove 17 tracking params,
     sort by key then value, re-encode; on parse failure keep original
  6. exceptions → reject with reason INVALID_URL (the only normalize
     reject the reference logs, core/url_manager.py:66)

relevance (reference ``is_url_relevant``): three blocklists over the
lowercased canonical URL — e-commerce path substrings, file-extension
suffixes, technical-pattern substrings — each logging a reasoned
reject.

The scalar functions are shared by the pure-Python oracle and the
vectorized batch kernel used inside ``map_batches`` stages.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from urllib.parse import parse_qs, urlencode, urljoin, urlparse, urlunparse

# --- behavioral constants (values observed in config/settings.py:72-124
#     and core/url_manager.py:113-196 of the reference) -------------------

TRACKING_PARAMS = (
    "utm_source utm_medium utm_campaign utm_content utm_term gclid fbclid "
    "ref _ga sessionid sid jsessionid phpsessid timestamp _t v cache nocache"
).split()

ECOMMERCE_PATTERNS = [
    "/checkout/cart/add/",
    "/checkout/cart/",
    "/customer/account/",
    "/customer/section/load/",
    "/wishlist/index/add/",
    "/review/product/post/",
    "/newsletter/subscriber/",
    "/sales/order/",
    "/downloadable/download/",
    "/paypal/",
    "/rest/V1/",
    "/graphql",
    "/admin/",
]

EXCLUDED_EXTENSIONS = (
    ".js .css .json .xml .txt .ico .jpg .jpeg .png .gif .webp .bmp .svg "
    ".pdf .doc .docx .xls .xlsx .zip .rar .7z .mp3 .mp4 .avi "
    ".woff .woff2 .ttf .eot .map"
).split()

TECHNICAL_PATTERNS = [
    "/wp-content/uploads/",
    "/wp-content/themes/",
    "/wp-content/plugins/",
    "/wp-includes/",
    "/wp-admin/",
    "/wp-json/",
    "/assets/",
    "/static/",
    "/media/",
    "/images/",
    "/node_modules/",
    "/vendor/",
    "/_next/",
    "/dist/",
    "/api/",
    "/ajax/",
    "/cron/",
    "/cache/",
    "google-analytics",
    "googleapis.com",
    "facebook.com",
    "cloudflare",
    "jquery",
    "bootstrap",
    "fontawesome",
]

DEFAULT_PRIORITY_PATTERNS = [
    "/produto/",
    "/product/",
    "/categoria/",
    "/category/",
    "/servico/",
    "/service/",
    "/sobre/",
    "/about/",
]

# reject reason codes; LOGGED_REASONS are the ones the reference writes
# to its filter log (scheme/scope rejects are silent there)
REASON_INVALID = "INVALID_URL"
REASON_ECOMMERCE = "ECOMMERCE_ENDPOINT"
REASON_EXTENSION = "FILE_EXTENSION"
REASON_TECHNICAL = "TECHNICAL_PATTERN"
REASON_SCHEME = "SCHEME"  # engine-only visibility
REASON_SCOPE = "OUT_OF_SCOPE"  # engine-only visibility
LOGGED_REASONS = {REASON_INVALID, REASON_ECOMMERCE, REASON_EXTENSION, REASON_TECHNICAL}

_MULTI_SLASH = re.compile(r"/+")

# Fast path: URLs already in canonical form — absolute http(s), lowercase
# host without www., single-slash path with no trailing slash, no query/
# fragment. For these normalize(url) == url, so the urllib pipeline can
# be skipped (the synthetic web and most real canonical links hit this).
_CANONICAL_RE = re.compile(
    r"^(https?)://((?!www\.)[a-z0-9.\-]+(?::\d+)?)/(?:[A-Za-z0-9_.\-~]+/)*[A-Za-z0-9_.\-~]+$"
)


@dataclass(frozen=True)
class Scope:
    """Crawl host scope.

    ``domain`` — reference-parity: host (lowercased, www-stripped) must
    equal ``value`` exactly (core/url_manager.py:54-58).
    ``suffix`` — engine extension for multi-host synthetic webs: host
    must equal ``value`` or end with ``"." + value``.
    ``any`` — no host restriction.
    """

    kind: str = "any"
    value: str = ""

    def allows(self, hostname: str) -> bool:
        if self.kind == "any":
            return True
        h = hostname.lower()
        if h.startswith("www."):
            h = h[4:]
        if self.kind == "domain":
            return h == self.value
        if self.kind == "suffix":
            return h == self.value or h.endswith("." + self.value)
        raise ValueError(self.kind)


def scope_from_seed(seed_url: str) -> Scope:
    """Reference-parity scope: the seed's www-stripped lowercase host
    (core/url_manager.py:29-34)."""
    h = urlparse(seed_url).netloc.lower()
    if h.startswith("www."):
        h = h[4:]
    return Scope("domain", h)


def _normalize_query(query: str) -> str:
    if not query:
        return ""
    try:
        params = parse_qs(query, keep_blank_values=False)
        for p in TRACKING_PARAMS:
            params.pop(p, None)
        if not params:
            return ""
        pairs = []
        for key in sorted(params):
            for value in sorted(params[key]):
                pairs.append((key, value))
        return urlencode(pairs)
    except Exception:
        return query


def normalize_url(url: str, base_url: str | None, scope: Scope) -> tuple[str | None, str | None]:
    """Return (canonical_url, reject_reason). Exactly one is non-None."""
    if not url:
        return None, REASON_INVALID
    try:
        url = url.strip()
        m = _CANONICAL_RE.match(url)
        if m:
            # already canonical (urljoin of an absolute URL is the URL);
            # only the scope check remains. Equivalence with the full
            # path is property-tested (tests/test_canon.py).
            if not scope.allows(m.group(2)):
                return None, REASON_SCOPE
            return url, None
        return _normalize_full(url, base_url, scope)
    except Exception:
        return None, REASON_INVALID


def _normalize_full(url: str, base_url: str | None, scope: Scope) -> tuple[str | None, str | None]:
    """The complete urllib normalization pipeline (no fast path)."""
    try:
        if base_url:
            url = urljoin(base_url, url)
        parsed = urlparse(url)
        if parsed.scheme not in ("http", "https"):
            return None, REASON_SCHEME
        if not scope.allows(parsed.netloc):
            return None, REASON_SCOPE
        path = _MULTI_SLASH.sub("/", parsed.path)
        if path.endswith("/") and len(path) > 1:
            path = path.rstrip("/")
        if not path:
            path = "/"
        query = _normalize_query(parsed.query)
        return urlunparse(parsed._replace(fragment="", path=path, query=query)), None
    except Exception:
        return None, REASON_INVALID


def relevance(url: str) -> tuple[bool, str | None, str | None]:
    """(is_relevant, reason, matched_pattern) over a canonical URL."""
    low = url.lower()
    for p in ECOMMERCE_PATTERNS:
        if p in low:
            return False, REASON_ECOMMERCE, p
    for ext in EXCLUDED_EXTENSIONS:
        if low.endswith(ext):
            return False, REASON_EXTENSION, ext
    for p in TECHNICAL_PATTERNS:
        if p in low:
            return False, REASON_TECHNICAL, p
    return True, None, None


def is_priority(url: str, patterns: list[str]) -> bool:
    """Smart-queue routing: substring match on the lowercased canonical
    (core/url_manager.py:370-372)."""
    low = url.lower()
    return any(p in low for p in patterns)


def url_digest(url: str) -> bytes:
    """128-bit stable identity for the seen index / sharding.

    md5 matches the reference's hash-set spirit (core/url_manager.py:234);
    we keep all 16 bytes: at a 10^10-URL frontier a 64-bit key expects
    birthday collisions (n²/2^65 ≈ 2.7), 128-bit is collision-free in
    practice.
    """
    return hashlib.md5(url.encode()).digest()


def shard_of(url: str, num_shards: int) -> int:
    return int.from_bytes(url_digest(url)[:8], "big") % num_shards


def host_of(url: str) -> str:
    return urlparse(url).netloc.lower()


# ---------------------------------------------------------------------------
# vectorized batch kernel (for map_batches stages)
# ---------------------------------------------------------------------------


@dataclass
class CanonResult:
    canonical: list  # str | None per input
    reasons: list  # str | None per input
    details: list  # str | None per input (matched pattern / error note)


def canonicalize_batch(
    urls: list[str], base_urls: list[str] | None, scope: Scope, *, apply_relevance: bool = True
) -> CanonResult:
    """Scalar pipeline applied per URL; URLs are irreducibly stringy so
    this is a tight Python loop per batch (no per-row Ray task)."""
    out_c: list = []
    out_r: list = []
    out_d: list = []
    for k, u in enumerate(urls):
        b = base_urls[k] if base_urls is not None else None
        c, reason = normalize_url(u, b, scope)
        detail = None
        if c is not None and apply_relevance:
            ok, rreason, pat = relevance(c)
            if not ok:
                c, reason, detail = None, rreason, pat
        out_c.append(c)
        out_r.append(reason)
        out_d.append(detail)
    return CanonResult(out_c, out_r, out_d)
