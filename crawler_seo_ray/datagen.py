"""Deterministic synthetic web of image+caption pages (FIXTURES.md F1).

Every attribute of page ``i`` is a pure function of ``i`` (seed baked
into the functions), so the corpus, the link graph and the page
attributes are identical in every process — the property both the
pure-Python oracle and the distributed engine rely on.

Corpus schema is the BASELINE.json input_hint, verbatim:
``image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64``.

The crawlable structure of a page (its "HTML") — outlinks, title,
description, headings, resources, status code, headers — is derived
here rather than stored, mirroring how the reference derives them by
parsing a fetched body (reference: ``core/crawler.py:163-177``).
Problem classes are injected at fixed residues so every analyzer path
has coverage (see ``page_attrs``).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np
import pyarrow as pa

from .functions.imagecodec import decode_image, encode_image, phash64

SEED = 42
# bump when any pure generator changes — cache dir names include it
GEN_VERSION = 1
NUM_HOSTS = 64
HOST_SUFFIX = "example.test"
ZIPF_ALPHA = 1.2  # hot-host skew for salted-key splitting tests

# outlink generators: j = (i * p + q) % n  (FIXTURES.md "links(i)")
LINK_COEFFS = [(7, 1), (11, 3), (13, 7), (17, 11), (5, 2)]

_WORDS = (
    "amber basin cedar delta ember falcon garnet harbor indigo juniper "
    "kestrel lumen marble nectar onyx prairie quartz raven sierra timber "
    "umber violet willow xenon yonder zephyr arbor breeze cinder dunes"
).split()

_DESC_WORDS = (
    "analysis baseline careful detailed evaluation framework guidance "
    "holistic insight judicious knowledge layered metric notable outline "
    "practical quality rigorous summary thorough useful verified workflow"
).split()


def _h(i: int, salt: str) -> int:
    """Stable 64-bit integer from (seed, salt, i)."""
    d = hashlib.md5(f"{SEED}:{salt}:{i}".encode()).digest()
    return int.from_bytes(d[:8], "big")


def image_id(i: int) -> str:
    return f"img{i:08d}"


def parse_image_id(s: str) -> int:
    return int(s[3:])


def dims(i: int, dim_base: int = 32, dim_mod: int = 97) -> tuple[int, int]:
    return dim_base + (i * 7) % dim_mod, dim_base + (i * 11) % dim_mod


def fmt(i: int) -> str:
    return "png" if i % 3 else "jpeg"


def pixels(i: int, dim_base: int = 32, dim_mod: int = 97) -> np.ndarray:
    """Seeded noise plus a flat patch (keeps encoded size moderate)."""
    w, h = dims(i, dim_base, dim_mod)
    rng = np.random.default_rng([SEED, i])
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    # flat lower half: compressible + gives phash structure
    img[h // 2 :, :, :] = np.array(
        [(i * 37) % 256, (i * 59) % 256, (i * 83) % 256], dtype=np.uint8
    )
    return img


def _phrase(words: list[str], i: int, salt: str, lo: int, hi: int) -> str:
    n = lo + _h(i, salt + ":n") % (hi - lo + 1)
    return " ".join(words[_h(i, f"{salt}:{k}") % len(words)] for k in range(n))


@lru_cache(maxsize=1 << 18)
def caption(i: int) -> str:
    """Title/caption text; rows i ≡ 13 (mod 26) duplicate row i-13.

    Drives the visit-order duplicate-flag semantics
    (reference: analyzers/metatags_analyzer.py:196-228).
    """
    base = i - 13 if i % 26 == 13 else i
    # word count 2..12 → char length spans the 30/60 title bounds
    return _phrase(_WORDS, base, "caption", 2, 12).capitalize()


@lru_cache(maxsize=1 << 18)
def description(i: int) -> str:
    """Meta description; rows i ≡ 17 (mod 34) duplicate row i-17; absent at i%11==0."""
    if i % 11 == 0:
        return ""
    base = i - 17 if i % 34 == 17 else i
    return _phrase(_DESC_WORDS, base, "desc", 12, 30).capitalize() + "."


@lru_cache(maxsize=1 << 18)
def host(i: int) -> str:
    """Zipf-skewed host assignment (hot hosts exercise skew handling)."""
    u = (_h(i, "host") % 10**9) / 10**9
    return f"h{int(_zipf_cdf().searchsorted(u))}.{HOST_SUFFIX}"


@lru_cache(maxsize=1)
def _zipf_cdf() -> np.ndarray:
    w = 1.0 / np.arange(1, NUM_HOSTS + 1) ** ZIPF_ALPHA
    return np.cumsum(w / w.sum())


def url(i: int) -> str:
    return f"https://{host(i)}/page/{image_id(i)}"


def _alias(u: str, variant: int) -> str:
    """Alias forms that must canonicalize back to ``u``
    (reference table: core/url_manager.py:479-490)."""
    if variant == 0:
        return u + "/"
    if variant == 1:
        return u + "?utm_source=x&utm_campaign=y"
    if variant == 2:
        return u + "#frag"
    if variant == 3:
        scheme, rest = u.split("://", 1)
        h, path = rest.split("/", 1)
        return f"{scheme}://{h}//{path}"
    if variant == 4:
        return u + "?gclid=abc123"
    return u + "/?ref=99"


_BLOCKED_SAMPLES = [
    "/style.css",
    "/checkout/cart/add/1",
    "/wp-content/uploads/x",
    "/api/v2/data",
    "/logo.png",
    "/admin/login",
]


def links(i: int, n: int) -> list[str]:
    """Deterministic outlinks of page i over an n-page web.

    Mix: plain canonical links, alias variants (canonicalization
    exercise), blocked URLs (reject-log exercise) and a cross-scope
    URL (domain-scope exercise). Order is the "document order" the
    reference would see in <a href> iteration (core/crawler.py:189).
    """
    out = []
    for k, (p, q) in enumerate(LINK_COEFFS):
        j = (i * p + q) % n
        u = url(j)
        if k == 1:
            u = _alias(u, i % 6)  # one alias per page
        out.append(u)
    if i % 5 == 0:
        out.append(f"https://{host(i)}{_BLOCKED_SAMPLES[(i // 5) % len(_BLOCKED_SAMPLES)]}")
    if i % 7 == 0:
        out.append("https://other.example.org/page/x")
    if i % 9 == 0:  # same-page duplicate link (intra-page dedup exercise)
        out.append(url((i * 7 + 1) % n))
    return out


def status_code(i: int) -> int | str:
    if i % 59 == 0 and i > 0:
        return "ERROR"  # simulated fetch exception (core/crawler.py:215-227)
    if i % 41 == 0 and i > 0:
        return 404
    if i % 43 == 0 and i > 0:
        return 301
    return 200


def content_type(i: int) -> str:
    if i % 47 == 0 and i > 0:
        return "application/pdf"
    return "text/html"


def final_url(i: int, n: int) -> str:
    if status_code(i) == 301:
        return url((i + 1) % n)
    return url(i)


def response_time_ms(i: int) -> float:
    return float(50 + (i * 13) % 900)


_SEC_HEADERS = [
    "Strict-Transport-Security",
    "Content-Security-Policy",
    "X-Frame-Options",
    "X-Content-Type-Options",
    "Referrer-Policy",
]


def security_headers(i: int) -> dict[str, str]:
    mask = _h(i, "sech") % 32
    return {h: "present" for b, h in enumerate(_SEC_HEADERS) if mask >> b & 1}


def content_length_header(i: int) -> int:
    # >1MB at i%37==0 triggers the perf warning (status_analyzer.py:310-312)
    if i % 37 == 0 and i > 0:
        return 1024 * 1024 + 1 + i
    return 4096 + (i * 31) % 60000


def headings(i: int) -> list[dict]:
    """Heading structure with problems injected at fixed residues.

    empty @ i%17==0, hidden @ i%19==0, level-jump @ i%23==0,
    missing-h1 @ i%61==0, multiple-h1 @ i%67==0.
    Shape matches FIXTURES.md F4: {tag, text, style, classes}.
    """
    hs: list[dict] = []

    def mk(tag, text, style="", classes=""):
        hs.append({"tag": tag, "text": text, "style": style, "classes": classes})

    h1_text = caption(i) or "Untitled"
    if i % 61 != 0 or i == 0:
        mk("h1", h1_text)
    mk("h2", _phrase(_WORDS, i, "h2a", 2, 5))
    if i % 17 == 0:
        mk("h3", "")  # empty
    if i % 19 == 0:
        style = ["display:none", "color: white", "color: rgb(252, 253, 254)"][(i // 19) % 3]
        mk("h3", _phrase(_WORDS, i, "h3hid", 2, 4), style=style)
    if i % 23 == 0:
        mk("h5", _phrase(_WORDS, i, "h5jump", 2, 4))  # h2/h3 → h5 jump
    else:
        mk("h3", _phrase(_WORDS, i, "h3b", 2, 4))
    if i % 67 == 0 and i > 0:
        mk("h1", _phrase(_WORDS, i, "h1b", 2, 4))  # second h1
    return hs


def resources(i: int) -> list[dict]:
    """Mixed-content resources on an HTTPS page (insecure at i%29==0).

    Shape: {rtype, tag, attribute, url, category} — the struct the
    reference builds at analyzers/status_analyzer.py:138-146.
    """
    if i % 29 != 0 or i == 0:
        return []
    out = []
    kinds = [
        ("image", "img", "src", "passive"),
        ("script", "script", "src", "critical"),
        ("stylesheet", "link", "href", "critical"),
        ("iframe", "iframe", "src", "critical"),
        ("media", "video", "src", "passive"),
    ]
    cnt = 1 + (i // 29) % 4
    for k in range(cnt):
        rtype, tag, attr, cat = kinds[(i + k) % len(kinds)]
        out.append(
            {
                "rtype": rtype,
                "tag": tag,
                "attribute": attr,
                "url": f"http://insecure.example.net/{rtype}/{i}/{k}",
                "category": cat,
            }
        )
    return out


def other_meta(i: int) -> dict:
    return {
        "meta_keywords": "" if i % 6 else "keywords, seo, test",
        "meta_robots": "" if i % 4 else "index, follow",
        "meta_viewport": "" if i % 3 == 1 else "width=device-width, initial-scale=1",
        "canonical_url": "" if i % 5 == 2 else url(i),
        "og_title": "" if i % 7 == 3 else caption(i),
        "og_description": "" if i % 7 == 3 else description(i),
        "og_image": "" if i % 8 else f"https://{host(i)}/og/{image_id(i)}.png",
    }


def robots_rules(host: str) -> list[str]:
    """Synthetic per-host robots.txt deny prefixes (pure function of the
    host — the deterministic stand-in for fetching /robots.txt once per
    host). Every fifth host (k % 5 == 3) disallows its /page/ tree."""
    try:
        k = int(host.partition(".")[0][1:])
    except ValueError:
        return []
    if k % 5 == 3:
        return ["/page/"]  # host fully disallowed (robots Disallow: /page/)
    return []


def page_attrs(i: int, n: int) -> dict:
    """Everything the fetch of page i yields (the parsed 'HTML')."""
    om = other_meta(i)
    return {
        "page_index": i,
        "url": url(i),
        "host": host(i),
        "status_code": status_code(i),
        "content_type": content_type(i),
        "final_url": final_url(i, n),
        "response_time_ms": response_time_ms(i),
        "content_length": content_length_header(i),
        "title": caption(i),
        "meta_description": description(i),
        "headings": headings(i),
        "resources": resources(i),
        "security_headers": security_headers(i),
        "links": links(i, n),
        **om,
    }


# ---------------------------------------------------------------------------
# corpus materialization
# ---------------------------------------------------------------------------


def corpus_row(i: int, dim_base: int = 32, dim_mod: int = 97) -> dict:
    px = pixels(i, dim_base, dim_mod)
    f = fmt(i)
    data = encode_image(px, f)
    # phash describes the *stored* (possibly lossy) image
    ph = phash64(decode_image(data, f))
    w, h = dims(i, dim_base, dim_mod)
    return {
        "image_id": image_id(i),
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": f,
        "caption": caption(i),
        "phash": ph,
    }


CORPUS_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def corpus_batch(indices, dim_base: int = 32, dim_mod: int = 97) -> pa.Table:
    rows = [corpus_row(int(i), dim_base, dim_mod) for i in indices]
    return pa.Table.from_pylist(rows, schema=CORPUS_SCHEMA)


def write_corpus(
    out_dir: str,
    n: int,
    rows_per_shard: int = 2048,
    dim_base: int = 32,
    dim_mod: int = 97,
) -> dict:
    """Materialize the n-page corpus as sharded parquet (Lance stand-in).

    Row i lives at global row index i, so URL → image_id → row index is
    a pure function and fetch is a point take (storage.ShardedTakeReader).
    """
    from . import storage

    def gen():
        for start in range(0, n, rows_per_shard):
            idx = range(start, min(start + rows_per_shard, n))
            yield corpus_batch(idx, dim_base, dim_mod)

    manifest = storage.write_sharded(gen(), out_dir, rows_per_shard)
    manifest.update({"dim_base": dim_base, "dim_mod": dim_mod, "n": n, "seed": SEED})
    import json
    import os

    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def write_corpus_parallel(
    out_dir: str,
    n: int,
    rows_per_shard: int = 2048,
    dim_base: int = 32,
    dim_mod: int = 97,
) -> dict:
    """Parallel corpus materialization: one Ray task per shard (pure
    functions of the row index → embarrassingly parallel, identical
    output to write_corpus). Requires an initialized Ray session."""
    import json
    import os

    import ray

    from . import storage

    @ray.remote
    def gen_shard(shard: int, start: int, end: int) -> int:
        t = corpus_batch(range(start, end), dim_base, dim_mod)
        storage.write_table(
            t, os.path.join(out_dir, f"part-{shard:05d}.parquet"), for_take=True
        )
        return t.num_rows

    os.makedirs(out_dir, exist_ok=True)
    futures = [
        gen_shard.remote(k, start, min(start + rows_per_shard, n))
        for k, start in enumerate(range(0, n, rows_per_shard))
    ]
    counts = ray.get(futures)
    manifest = {
        "rows_per_shard": rows_per_shard,
        "num_rows": sum(counts),
        "num_shards": len(counts),
        "dim_base": dim_base,
        "dim_mod": dim_mod,
        "n": n,
        "seed": SEED,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest
