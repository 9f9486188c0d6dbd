"""Conformance tests for URL canonicalization (reference behavior,
core/url_manager.py:36-198 + its __main__ table at :479-490)."""

from crawler_seo_ray.canon import (
    REASON_ECOMMERCE,
    REASON_EXTENSION,
    REASON_SCHEME,
    REASON_SCOPE,
    REASON_TECHNICAL,
    Scope,
    canonicalize_batch,
    is_priority,
    normalize_url,
    relevance,
    scope_from_seed,
)

SC = Scope("domain", "example.com")


def n(u, base=None, scope=SC):
    return normalize_url(u, base, scope)


def test_reference_10_url_table():
    """The reference's own dedup/filter table (core/url_manager.py:479-490):
    canonical forms of rows 1,2,3,4,6,10 must all collapse to page1."""
    canon_page1 = "https://example.com/page1"
    assert n("https://example.com/page1")[0] == canon_page1
    assert n("https://example.com/page1/")[0] == canon_page1
    assert n("https://example.com/page1?utm_source=test")[0] == canon_page1
    assert n("https://example.com/page1#section")[0] == canon_page1
    assert n("https://example.com/page2")[0] == "https://example.com/page2"
    assert n("https://example.com/page1/?ref=123")[0] == canon_page1
    # filtered rows
    c7 = n("https://example.com/checkout/cart/add/123")[0]
    assert c7 is not None and relevance(c7)[1] == REASON_ECOMMERCE
    c8 = n("https://example.com/style.css")[0]
    assert c8 is not None and relevance(c8)[1] == REASON_EXTENSION
    assert n("https://other-domain.com/page") == (None, REASON_SCOPE)


def test_scheme_and_empty_rejected():
    assert n("ftp://example.com/x")[1] == REASON_SCHEME
    assert n("javascript:void(0)")[1] == REASON_SCHEME
    assert n("")[0] is None
    # mailto with base: urljoin keeps mailto scheme → rejected
    assert n("mailto:a@b.c", base="https://example.com/")[1] == REASON_SCHEME


def test_relative_resolution():
    assert n("/sub/page", base="https://example.com/dir/")[0] == "https://example.com/sub/page"
    assert n("child", base="https://example.com/dir/")[0] == "https://example.com/dir/child"
    assert n("../up", base="https://example.com/a/b/")[0] == "https://example.com/a/up"


def test_netloc_verbatim_preserved():
    # the reference's canonical keeps netloc case and www. verbatim
    # (only the scope *check* strips/lowers) — www and bare are distinct
    assert n("https://WWW.Example.com/Page")[0] == "https://WWW.Example.com/Page"
    assert n("https://www.example.com/p")[0] != n("https://example.com/p")[0]


def test_path_normalization():
    assert n("https://example.com//a///b//")[0] == "https://example.com/a/b"
    assert n("https://example.com")[0] == "https://example.com/"
    assert n("https://example.com/")[0] == "https://example.com/"


def test_query_normalization():
    assert n("https://example.com/p?b=2&a=1")[0] == "https://example.com/p?a=1&b=2"
    # blank values dropped (parse_qs keep_blank_values=False)
    assert n("https://example.com/p?a=&b=1")[0] == "https://example.com/p?b=1"
    # all 17 tracking params dropped
    u = "https://example.com/p?gclid=1&fbclid=2&utm_medium=m&sessionid=s&v=9&cache=0"
    assert n(u)[0] == "https://example.com/p"
    # multi-value keys sorted by value
    assert n("https://example.com/p?a=2&a=1")[0] == "https://example.com/p?a=1&a=2"


def test_idempotence_on_generated_urls():
    from crawler_seo_ray import datagen

    sc = Scope("suffix", datagen.HOST_SUFFIX)
    urls = []
    for i in range(0, 120):
        urls.extend(datagen.links(i, 500))
    for u in urls:
        c, _ = normalize_url(u, datagen.url(0), sc)
        if c is None:
            continue
        c2, _ = normalize_url(c, None, sc)
        assert c2 == c, f"not idempotent: {u} → {c} → {c2}"


def test_relevance_blocklists():
    assert relevance("https://example.com/wp-admin/x")[1] == REASON_TECHNICAL
    assert relevance("https://example.com/doc.pdf")[1] == REASON_EXTENSION
    assert relevance("https://example.com/graphql")[1] == REASON_ECOMMERCE
    assert relevance("https://example.com/fine/page")[0] is True
    # technical patterns also match host substrings
    assert relevance("https://cdn.googleapis.com.example.com/x")[1] == REASON_TECHNICAL


def test_priority_and_scope_helpers():
    assert is_priority("https://example.com/PRODUCT/1", ["/product/"])
    assert not is_priority("https://example.com/blog/1", ["/product/"])
    assert scope_from_seed("https://www.Example.com/a").value == "example.com"
    assert Scope("suffix", "example.test").allows("h3.example.test")
    assert not Scope("suffix", "example.test").allows("example.org")


def test_fast_path_equals_full_pipeline():
    """The canonical-form fast path must agree with the full urllib
    pipeline on every input (property test over generated + adversarial
    URLs)."""
    from crawler_seo_ray import datagen
    from crawler_seo_ray.canon import _normalize_full

    sc = Scope("suffix", datagen.HOST_SUFFIX)
    cases = []
    for i in range(0, 80):
        cases.extend(datagen.links(i, 400))
        cases.append(datagen.url(i))
    cases += [
        "https://example.test/a/b", "https://example.test/a/b/",
        "https://example.test", "https://example.test/",
        "https://h1.example.test/a.b-c_d~e", "http://h1.example.test/x",
        "https://h1.example.test/x?a=1", "https://h1.example.test/x#f",
        "https://WWW.h1.example.test/x", "https://www.h1.example.test/x",
        "https://h1.example.test//x", "https://h1.example.test/x/",
        "https://h1.example.test:8080/x", "ftp://h1.example.test/x",
    ]
    for u in cases:
        fast = normalize_url(u, None, sc)
        full = _normalize_full(u.strip(), None, sc)
        assert fast == full, (u, fast, full)
        with_base = normalize_url(u, datagen.url(0), sc)
        full_base = _normalize_full(u.strip(), datagen.url(0), sc)
        assert with_base == full_base, (u, with_base, full_base)


def test_batch_kernel_matches_scalar():
    urls = [
        "https://example.com/page1/",
        "https://example.com/style.css",
        "ftp://x/y",
        "https://other.com/z",
        "https://example.com/p?b=2&a=1&utm_source=t",
    ]
    r = canonicalize_batch(urls, None, SC)
    assert r.canonical[0] == "https://example.com/page1"
    assert r.canonical[1] is None and r.reasons[1] == REASON_EXTENSION and r.details[1] == ".css"
    assert r.reasons[2] == REASON_SCHEME
    assert r.reasons[3] == REASON_SCOPE
    assert r.canonical[4] == "https://example.com/p?a=1&b=2"
