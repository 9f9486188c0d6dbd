"""Text-analysis kernels for large-scale training-data pipelines:
language ID (n-gram/stopword heuristic), quality scoring, token
counting, and rolling-hash document fingerprinting.

All kernels are batch-vectorized (numpy / Python over a batch, never a
Ray task per row) and deterministic. They power the ``documents``-table
operators in ``__ray_entry__.queries()``.
"""

from __future__ import annotations

import re

import numpy as np

_TOKEN_RE = re.compile(r"\S+")
_WORD_RE = re.compile(r"[a-zA-ZÀ-ÿ]+")

# small, distinctive stopword profiles (public linguistics knowledge)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "with", "was", "on"},
    "es": {"el", "la", "de", "que", "y", "los", "las", "en", "un", "una", "por", "con"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für", "auf"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "un", "une", "dans", "pour", "que"},
}


def tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall(text or "")


def token_count(text: str) -> int:
    return len(_TOKEN_RE.findall(text or ""))


def detect_language(text: str) -> str:
    """Heuristic language ID: CJK character ratio → 'zh'; otherwise the
    stopword profile with the highest hit ratio; 'unknown' when nothing
    matches."""
    if not text:
        return "unknown"
    cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
    if cjk > 0 and cjk >= 0.05 * len(text):
        return "zh"
    words = [w.lower() for w in _WORD_RE.findall(text)]
    if not words:
        return "unknown"
    best, best_hits = "unknown", 0
    for lang, sw in _STOPWORDS.items():
        hits = sum(1 for w in words if w in sw)
        if hits > best_hits:
            best, best_hits = lang, hits
    return best if best_hits > 0 else "unknown"


def quality_features(text: str) -> dict:
    """Length/punctuation/stopword/digit features + a composite score in
    [0, 1] — the heuristic-quality-filter family used by web-scale
    corpus pipelines (C4/Gopher-style rules, public literature)."""
    t = text or ""
    n = len(t)
    toks = _TOKEN_RE.findall(t)
    n_tok = len(toks)
    mean_tok = (sum(len(x) for x in toks) / n_tok) if n_tok else 0.0
    digits = sum(ch.isdigit() for ch in t)
    punct = sum(not ch.isalnum() and not ch.isspace() for ch in t)
    words = [w.lower() for w in _WORD_RE.findall(t)]
    sw = _STOPWORDS["en"]
    stop_ratio = (sum(1 for w in words if w in sw) / len(words)) if words else 0.0
    score = 1.0
    if n < 50:
        score -= 0.5
    if n_tok and not (3.0 <= mean_tok <= 12.0):
        score -= 0.2
    if n and digits / n > 0.2:
        score -= 0.2
    if n and punct / n > 0.2:
        score -= 0.1
    return {
        "n_chars": n,
        "n_tokens": n_tok,
        "mean_token_len": mean_tok,
        "digit_ratio": (digits / n) if n else 0.0,
        "punct_ratio": (punct / n) if n else 0.0,
        "stopword_ratio": stop_ratio,
        "quality_score": max(0.0, score),
    }


_FP_BASE = 1099511628211
_FP_OFFSET = 14695981039346656037
_U64 = 0xFFFFFFFFFFFFFFFF


def fingerprint64(text: str) -> int:
    """Order-sensitive rolling document fingerprint (FNV-style over
    token hashes); signed int64 for Arrow friendliness."""
    h = _FP_OFFSET
    for tok in _TOKEN_RE.findall(text or ""):
        h = ((h ^ hash_token(tok)) * _FP_BASE) & _U64
    return h - (1 << 64) if h >= (1 << 63) else h


_token_hash_cache: dict[str, int] = {}


def hash_token(tok: str) -> int:
    """Stable 64-bit token hash (FNV-1a over utf-8 bytes), memoized —
    natural-language token vocabularies repeat heavily."""
    h = _token_hash_cache.get(tok)
    if h is None:
        h = 14695981039346656037
        for b in tok.encode("utf-8"):
            h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
        if len(_token_hash_cache) < 1 << 20:
            _token_hash_cache[tok] = h
    return h


def _token_hash_array(toks: list[str]) -> np.ndarray:
    return np.array([hash_token(t) for t in toks], dtype=np.uint64)


def shingles(text: str, k: int = 5) -> set[int]:
    """Hashed k-token shingles (w-shingling for near-dup detection).

    The window FNV chain is vectorized across all windows: k shifted
    xor-multiply passes over the token-hash array (uint64 wraparound is
    the FNV modulus)."""
    toks = [t.lower() for t in _TOKEN_RE.findall(text or "")]
    if len(toks) < k:
        return {fingerprint64(" ".join(toks))} if toks else set()
    H = _token_hash_array(toks)
    n = len(toks) - k + 1
    with np.errstate(over="ignore"):
        acc = np.full(n, 14695981039346656037, dtype=np.uint64)
        prime = np.uint64(1099511628211)
        for j in range(k):
            acc = (acc ^ H[j : j + n]) * prime
    return set(acc.tolist())


def shingle_array(text: str, k: int = 5) -> np.ndarray:
    """``shingles`` as a SORTED UNIQUE uint64 array (r5) — the form the
    minhash kernels consume: no Python set materialization, and
    np.unique IS the set semantics (duplicate windows collapse; min
    over duplicates is unchanged)."""
    toks = [t.lower() for t in _TOKEN_RE.findall(text or "")]
    if len(toks) < k:
        if not toks:
            return np.empty(0, np.uint64)
        return np.array([fingerprint64(" ".join(toks))], np.uint64)
    H = _token_hash_array(toks)
    n = len(toks) - k + 1
    with np.errstate(over="ignore"):
        acc = np.full(n, 14695981039346656037, dtype=np.uint64)
        prime = np.uint64(1099511628211)
        for j in range(k):
            acc = (acc ^ H[j : j + n]) * prime
    return np.unique(acc)


_BIT_IDX = np.arange(64, dtype=np.uint64)


def simhash64(text: str) -> int:
    """64-bit SimHash over token hashes (Charikar); signed int64."""
    toks = [t.lower() for t in _TOKEN_RE.findall(text or "")]
    if not toks:
        return 0
    hs = np.array([hash_token(t) for t in toks], dtype=np.uint64)
    bits = ((hs[:, None] >> _BIT_IDX[None, :]) & np.uint64(1)).astype(np.int64)
    acc = (bits * 2 - 1).sum(axis=0)
    out = np.uint64(0)
    for b in np.nonzero(acc > 0)[0]:
        out |= np.uint64(1) << np.uint64(b)
    return int(out.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
