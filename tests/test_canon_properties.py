"""Property-based robustness for URL canonicalization: never crash,
idempotent on every accepted output, fast path ≡ full path."""

from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_seo_ray.canon import Scope, _normalize_full, normalize_url, relevance

SC_ANY = Scope("any")
SC_DOM = Scope("domain", "example.com")

url_text = st.one_of(
    st.text(max_size=80),
    st.from_regex(r"https?://[a-zA-Z0-9.\-]{1,20}(/[a-zA-Z0-9._~%/?#&=+-]{0,40})?", fullmatch=True),
    st.from_regex(r"[a-zA-Z0-9._/\-]{0,40}", fullmatch=True),
)


@settings(max_examples=300, deadline=None)
@given(url_text, st.sampled_from([None, "https://example.com/base/page"]))
def test_normalize_never_crashes_and_is_idempotent(u, base):
    for scope in (SC_ANY, SC_DOM):
        c, reason = normalize_url(u, base, scope)
        assert (c is None) != (reason is None)
        if c is not None:
            c2, r2 = normalize_url(c, None, scope)
            assert c2 == c, (u, c, c2, r2)
            # relevance never crashes on a canonical
            relevance(c)


@settings(max_examples=300, deadline=None)
@given(url_text)
def test_fast_path_equals_full_everywhere(u):
    if not u or not u.strip():
        return  # normalize_url short-circuits empty input before the pipelines
    for scope in (SC_ANY, SC_DOM):
        assert normalize_url(u, None, scope) == _normalize_full(u.strip(), None, scope)
