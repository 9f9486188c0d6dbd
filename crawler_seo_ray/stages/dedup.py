"""Deduplication operators for training-data pipelines.

Five families, each expressed Ray-Data-first:

- exact:        hash-partitioned ``groupby(key).map_groups(first)``
- MinHash+LSH:  shingle → minhash signature → banded bucket groupby →
                candidate pairs → exact-Jaccard verify → components
- SimHash:      64-bit simhash → band-of-bits bucketing → Hamming verify
- n-gram Jaccard: shared shingle machinery, direct pair verification
- embedding cosine: normalized-vector blocking (random-hyperplane LSH)
                → in-bucket exact cosine

Scale notes (10^10-row honest): signatures/buckets shuffles carry only
(id, band_hash)-width rows; texts are re-fetched for verification via a
broadcast id→shingle-set map at test scale and would be a bucketed
self-join of (id, shingles) at cluster scale — the groupby-bucket
structure is identical. Connected components use driver union-find on
the *candidate-pair* set (tiny vs corpus); the scale path is iterative
min-label propagation with the same pair table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data import Dataset

from ..functions.text import shingles, simhash64
from ..util import collect_arrow

# 31-bit Mersenne prime: a,b,x < 2^31 keeps a*x+b < 2^63 — exact in
# uint64, so the (a·x+b) mod p permutation family vectorizes in numpy
_MERSENNE = (1 << 31) - 1


def exact_dedup(ds: Dataset, key_col: str, order_col: str) -> Dataset:
    """Keep the first row (min order_col) of every key group — the
    reference's keep-first URL-dedup semantics (SURVEY.md §2.7) applied
    relationally."""

    def first_by_order(g: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(g, sort_keys=[(order_col, "ascending")])
        return g.take(idx[:1])

    return ds.groupby(key_col).map_groups(first_by_order, batch_format="pyarrow")


def _minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _stable_hash64(data: bytes) -> int:
    """Process-stable 63-bit hash (Python's hash() is salted per process
    — unusable for cross-worker bucketing)."""
    import hashlib

    return int.from_bytes(hashlib.md5(data).digest()[:8], "big") >> 1


def minhash_pipeline(
    ds: Dataset,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.7,
) -> dict:
    """MinHash+LSH near-dup detection. Returns
    {"pairs": pa.Table(id_a, id_b, jaccard), "groups": pa.Table(id, rep)}.
    """
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    a, b = _minhash_params(num_perm)
    a_ref, b_ref = ray.put(a), ray.put(b)

    def sig_batch(batch: pa.Table) -> pa.Table:
        aa, bb = ray.get(a_ref), ray.get(b_ref)
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_ids, out_band, out_hash = [], [], []
        for i, t in zip(ids, texts):
            sh = shingles(t, shingle_k)
            if not sh:
                continue
            x = np.fromiter(sh, dtype=np.uint64, count=len(sh)) % np.uint64(_MERSENNE)
            sig = ((x[:, None] * aa[None, :] + bb[None, :]) % np.uint64(_MERSENNE)).min(axis=0)
            for band in range(bands):
                seg = sig[band * rows_per_band : (band + 1) * rows_per_band]
                bh = _stable_hash64(seg.tobytes())
                out_ids.append(i)
                out_band.append(band)
                out_hash.append(bh)
        return pa.table(
            {
                id_col: pa.array(out_ids),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.int64()),
            }
        )

    buckets = ds.select_columns([id_col, text_col]).map_batches(
        sig_batch, batch_format="pyarrow"
    )

    # bucket membership via the combiner pattern: per-block Arrow hash
    # group-by collects (band, band_hash) → id-list partials; one driver
    # merge joins the lists. (Cluster scale: the partial merge becomes a
    # distributed groupby over buckets — already ~#distinct-buckets
    # rows, a fraction of the band-row count.)
    def partial_buckets(batch: pa.Table) -> pa.Table:
        return batch.group_by(["band", "band_hash"]).aggregate([(id_col, "list")])

    parts = collect_arrow(
        buckets.map_batches(partial_buckets, batch_format="pyarrow"),
        schema=pa.schema(
            [("band", pa.int32()), ("band_hash", pa.int64()),
             (f"{id_col}_list", pa.list_(pa.int64()))]
        ),
    )
    # pyarrow can't hash-aggregate list columns, so the (small) partial
    # merge is a dict fold on the driver
    merged: dict[tuple, list] = {}
    for band, bh, ids_part in zip(
        parts.column("band").to_pylist(),
        parts.column("band_hash").to_pylist(),
        parts.column(f"{id_col}_list").to_pylist(),
    ):
        merged.setdefault((band, bh), []).extend(ids_part)
    cap = 50  # guard against degenerate buckets
    out_a, out_b = [], []
    for members in merged.values():
        if len(members) < 2:
            continue
        ids = sorted(members)
        for i in range(min(len(ids), cap)):
            for j in range(i + 1, min(len(ids), cap)):
                out_a.append(ids[i])
                out_b.append(ids[j])
    pairs = pa.table(
        {"id_a": pa.array(out_a, pa.int64()), "id_b": pa.array(out_b, pa.int64())}
    )
    if pairs.num_rows:
        import pyarrow.compute as pc

        key = pc.add(
            pc.multiply(pc.cast(pairs.column("id_a"), pa.int64()), 1 << 32),
            pc.cast(pairs.column("id_b"), pa.int64()),
        )
        order = pc.sort_indices(key)
        pairs = pairs.take(order)
        key_sorted = key.take(order).to_numpy()
        keep = np.flatnonzero(
            np.diff(key_sorted, prepend=key_sorted[0] - 1) != 0
        )
        pairs = pairs.take(pa.array(keep))

    # verify candidates with exact shingle Jaccard (broadcast id→shingles;
    # cluster-scale: bucketed self-join of (id, shingles) instead)
    cand_ids = set(pairs.column("id_a").to_pylist()) | set(pairs.column("id_b").to_pylist())
    sh_map: dict = {}
    if cand_ids:
        cand_ref = ray.put(cand_ids)

        def collect_shingles(batch: pa.Table) -> pa.Table:
            want = ray.get(cand_ref)
            ids = batch.column(id_col).to_pylist()
            texts = batch.column(text_col).to_pylist()
            rows = [
                {"id": i, "sh": list(shingles(t, shingle_k))}
                for i, t in zip(ids, texts)
                if i in want
            ]
            return pa.table(
                {
                    "id": pa.array([r["id"] for r in rows]),
                    "sh": pa.array([r["sh"] for r in rows], pa.list_(pa.uint64())),
                }
            )

        sh_tbl = collect_arrow(
            ds.select_columns([id_col, text_col]).map_batches(
                collect_shingles, batch_format="pyarrow"
            )
        )
        sh_map = {r["id"]: set(r["sh"]) for r in sh_tbl.to_pylist()}

    va, vb, vj = [], [], []
    for ia, ib in zip(pairs.column("id_a").to_pylist(), pairs.column("id_b").to_pylist()):
        sa, sb = sh_map.get(ia, set()), sh_map.get(ib, set())
        union = len(sa | sb)
        j = (len(sa & sb) / union) if union else 0.0
        if j >= jaccard_threshold:
            va.append(ia)
            vb.append(ib)
            vj.append(j)
    verified = pa.table(
        {"id_a": pa.array(va, pa.int64()), "id_b": pa.array(vb, pa.int64()), "jaccard": pa.array(vj, pa.float64())}
    )

    groups = _connected_components(va, vb)
    groups_tbl = pa.table(
        {
            "id": pa.array(list(groups.keys()), pa.int64()),
            "rep": pa.array(list(groups.values()), pa.int64()),
        }
    )
    return {"pairs": verified, "groups": groups_tbl}


def _connected_components(a: list, b: list) -> dict:
    """Union-find over verified pairs; rep = min id of the component."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for x, y in zip(a, b):
        rx, ry = find(x), find(y)
        if rx != ry:
            lo, hi = min(rx, ry), max(rx, ry)
            parent[hi] = lo
            parent.setdefault(lo, lo)
    return {x: find(x) for x in set(a) | set(b)}


def simhash_pipeline(
    ds: Dataset,
    text_col: str,
    id_col: str,
    hamming_threshold: int = 3,
    bands: int = 4,
) -> dict:
    """SimHash near-dup: 64-bit signatures, band-of-bits bucketing
    (any pair within Hamming ≤ bands-1 shares ≥1 exact band), Hamming
    verify. Returns {"signatures": Table(id, simhash), "pairs": Table}."""
    band_bits = 64 // bands

    def sig_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        sigs = [simhash64(t) for t in texts]
        return pa.table(
            {id_col: pa.array(ids), "simhash": pa.array(sigs, pa.int64())}
        )

    sigs = ds.select_columns([id_col, text_col]).map_batches(
        sig_batch, batch_format="pyarrow"
    ).materialize()

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        hs = batch.column("simhash").to_pylist()
        out_i, out_b, out_v = [], [], []
        for i, h in zip(ids, hs):
            uh = h & 0xFFFFFFFFFFFFFFFF
            for band in range(bands):
                out_i.append(i)
                out_b.append(band)
                out_v.append((uh >> (band * band_bits)) & ((1 << band_bits) - 1))
        return pa.table(
            {
                id_col: pa.array(out_i),
                "band": pa.array(out_b, pa.int32()),
                "band_val": pa.array(out_v, pa.int64()),
            }
        )

    buckets = sigs.map_batches(band_rows, batch_format="pyarrow")

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = sorted(g.column(id_col).to_pylist())
        cap = 50
        out_a, out_b = [], []
        for i in range(min(len(ids), cap)):
            for j in range(i + 1, min(len(ids), cap)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pa.table({"id_a": pa.array(out_a, pa.int64()), "id_b": pa.array(out_b, pa.int64())})

    cand = collect_arrow(
        buckets.groupby(["band", "band_val"]).map_groups(bucket_pairs, batch_format="pyarrow")
    )
    sig_map = dict(
        zip(
            collect_arrow(sigs).column(id_col).to_pylist(),
            collect_arrow(sigs).column("simhash").to_pylist(),
        )
    )
    seen = set()
    va, vb, vd = [], [], []
    for ia, ib in zip(cand.column("id_a").to_pylist(), cand.column("id_b").to_pylist()):
        if (ia, ib) in seen:
            continue
        seen.add((ia, ib))
        d = bin((sig_map[ia] ^ sig_map[ib]) & 0xFFFFFFFFFFFFFFFF).count("1")
        if d <= hamming_threshold:
            va.append(ia)
            vb.append(ib)
            vd.append(d)
    pairs = pa.table(
        {
            "id_a": pa.array(va, pa.int64()),
            "id_b": pa.array(vb, pa.int64()),
            "hamming": pa.array(vd, pa.int32()),
        }
    )
    return {"signatures": collect_arrow(sigs), "pairs": pairs}


def embedding_cosine_pairs(
    ds: Dataset,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    num_planes: int = 8,
    seed: int = 7,
) -> pa.Table:
    """Embedding near-dup: random-hyperplane LSH bucket groupby, then
    exact cosine within buckets. Pairs within cos ≥ threshold that land
    in different buckets are possible (LSH recall<1) — num_planes trades
    recall vs bucket size; callers wanting exactness use brute force
    (similarity.knn_brute with k=n)."""
    import pyarrow.compute as pc

    first = ds.take(1)
    dim = len(first[0][vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_planes))
    planes_ref = ray.put(planes)

    def bucket(batch: pa.Table) -> pa.Table:
        P = ray.get(planes_ref)
        vecs = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        vn = vecs / norms
        bits = (vn @ P) > 0
        codes = (bits * (1 << np.arange(num_planes))).sum(axis=1)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "bucket": pa.array(codes, pa.int64()),
                "vec": pa.array([v.tolist() for v in vn], pa.list_(pa.float64())),
            }
        )

    bucketed = ds.map_batches(bucket, batch_format="pyarrow")

    def in_bucket_pairs(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_pylist()
        vecs = np.array(g.column("vec").to_pylist(), dtype=np.float64)
        if len(ids) < 2:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        sims = vecs @ vecs.T
        order = np.argsort(ids)
        out_a, out_b, out_c = [], [], []
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                i, j = order[x], order[y]
                if sims[i, j] >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_c.append(float(sims[i, j]))
        return pa.table(
            {"id_a": pa.array(out_a, pa.int64()), "id_b": pa.array(out_b, pa.int64()),
             "cosine": pa.array(out_c, pa.float64())}
        )

    out = collect_arrow(
        bucketed.groupby("bucket").map_groups(in_bucket_pairs, batch_format="pyarrow"),
        schema=pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()), ("cosine", pa.float64())]),
    )
    if out.num_rows:
        out = out.take(pc.sort_indices(out, sort_keys=[("id_a", "ascending"), ("id_b", "ascending")]))
    return out


def token_jaccard_pipeline(
    ds: Dataset,
    text_col: str,
    id_col: str,
    threshold: float = 0.9,
    bucket_cap: int = 2000,
) -> pa.Table:
    """EXACT token-set Jaccard similarity self-join (n-gram Jaccard with
    n=1, SQL-checkable) via prefix filtering (PPJoin-style):

    1. global token document-frequency via per-block combiner partials
       (rare-token ordering maximizes pruning), broadcast as rank map;
    2. each doc emits its ⌊(1−t)·|T|⌋+1 rarest tokens as blocking keys —
       any pair with Jaccard ≥ t provably shares one;
    3. candidate pairs within token buckets (combiner + driver fold),
       verified with exact set Jaccard.

    Token normalization matches DuckDB's
    ``list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))``.
    ``bucket_cap`` only guards runaway buckets and is logged — below the
    cap the join is exact.
    """
    import math

    def tokens_of(t: str) -> list[str]:
        return sorted(set((t or "").strip().lower().split()))

    # pass 1: document frequency per token (combiner)
    def df_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            if (t or "").strip():
                c.update(tokens_of(t))
        return pa.table(
            {"tok": pa.array(list(c.keys()), pa.string()),
             "n": pa.array(list(c.values()), pa.int64())}
        )

    parts = collect_arrow(
        ds.select_columns([text_col]).map_batches(df_partial, batch_format="pyarrow"),
        schema=pa.schema([("tok", pa.string()), ("n", pa.int64())]),
    )
    merged = parts.group_by("tok").aggregate([("n", "sum")])
    freq = dict(zip(merged.column("tok").to_pylist(), merged.column("n_sum").to_pylist()))
    rank = {t: i for i, (f, t) in enumerate(sorted((f, t) for t, f in freq.items()))}
    rank_ref = ray.put(rank)

    # pass 2: prefix blocking keys
    def prefix_keys(batch: pa.Table) -> pa.Table:
        rk = ray.get(rank_ref)
        out_tok, out_id = [], []
        for i, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
            toks = tokens_of(t)
            if not toks:
                continue
            p = len(toks) - math.ceil(threshold * len(toks)) + 1
            for tok in sorted(toks, key=lambda x: rk[x])[:p]:
                out_tok.append(tok)
                out_id.append(i)
        return pa.table(
            {"tok": pa.array(out_tok, pa.string()), id_col: pa.array(out_id, pa.int64())}
        )

    def bucket_partial(batch: pa.Table) -> pa.Table:
        return batch.group_by("tok").aggregate([(id_col, "list")])

    bparts = collect_arrow(
        ds.select_columns([id_col, text_col])
        .map_batches(prefix_keys, batch_format="pyarrow")
        .map_batches(bucket_partial, batch_format="pyarrow"),
        schema=pa.schema([("tok", pa.string()), (f"{id_col}_list", pa.list_(pa.int64()))]),
    )
    buckets: dict[str, list] = {}
    for tok, ids in zip(
        bparts.column("tok").to_pylist(), bparts.column(f"{id_col}_list").to_pylist()
    ):
        buckets.setdefault(tok, []).extend(ids)
    cand: set[tuple] = set()
    overflow = 0
    for ids in buckets.values():
        if len(ids) > bucket_cap:
            overflow += 1
            ids = ids[:bucket_cap]
        ids = sorted(ids)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                cand.add((ids[x], ids[y]))
    if overflow:
        print(f"token_jaccard: {overflow} buckets over cap={bucket_cap} (join no longer exact)")

    # verify with exact token-set jaccard (broadcast id→token set)
    def collect_tokens(batch: pa.Table) -> pa.Table:
        rows_i, rows_t = [], []
        for i, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
            rows_i.append(i)
            rows_t.append(tokens_of(t))
        return pa.table(
            {"id": pa.array(rows_i, pa.int64()), "toks": pa.array(rows_t, pa.list_(pa.string()))}
        )

    tok_tbl = collect_arrow(
        ds.select_columns([id_col, text_col]).map_batches(collect_tokens, batch_format="pyarrow"),
        schema=pa.schema([("id", pa.int64()), ("toks", pa.list_(pa.string()))]),
    )
    tok_map = {r["id"]: set(r["toks"]) for r in tok_tbl.to_pylist()}
    va, vb = [], []
    for ia, ib in sorted(cand):
        sa, sb = tok_map.get(ia, set()), tok_map.get(ib, set())
        u = len(sa | sb)
        if u and len(sa & sb) / u >= threshold:
            va.append(ia)
            vb.append(ib)
    return pa.table({"id_a": pa.array(va, pa.int64()), "id_b": pa.array(vb, pa.int64())})


def phash_pairs(
    ds: Dataset,
    phash_col: str = "phash",
    id_col: str = "image_id",
    hamming_threshold: int = 6,
    bands: int = 8,
) -> pa.Table:
    """Near-duplicate IMAGES by perceptual-hash Hamming distance: band
    the 64-bit phash into ``bands`` segments (any pair within Hamming ≤
    bands−1 shares an exact band), bucket via the combiner pattern,
    verify exact Hamming. Same machinery as SimHash text dedup applied
    to the corpus ``phash`` column (multimodal near-dup)."""
    band_bits = 64 // bands

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        hs = batch.column(phash_col).to_pylist()
        out_i, out_b, out_v = [], [], []
        for i, h in zip(ids, hs):
            uh = (h if h is not None else 0) & 0xFFFFFFFFFFFFFFFF
            for band in range(bands):
                out_i.append(i)
                out_b.append(band)
                out_v.append((uh >> (band * band_bits)) & ((1 << band_bits) - 1))
        return pa.table(
            {
                id_col: pa.array(out_i, pa.string()),
                "band": pa.array(out_b, pa.int32()),
                "band_val": pa.array(out_v, pa.int64()),
            }
        )

    def partial_buckets(batch: pa.Table) -> pa.Table:
        return batch.group_by(["band", "band_val"]).aggregate([(id_col, "list")])

    parts = collect_arrow(
        ds.select_columns([id_col, phash_col])
        .map_batches(band_rows, batch_format="pyarrow")
        .map_batches(partial_buckets, batch_format="pyarrow"),
        schema=pa.schema(
            [("band", pa.int32()), ("band_val", pa.int64()),
             (f"{id_col}_list", pa.list_(pa.string()))]
        ),
    )
    merged: dict[tuple, list] = {}
    for band, bv, ids_part in zip(
        parts.column("band").to_pylist(),
        parts.column("band_val").to_pylist(),
        parts.column(f"{id_col}_list").to_pylist(),
    ):
        merged.setdefault((band, bv), []).extend(ids_part)
    cand: set[tuple] = set()
    cap = 200
    for members in merged.values():
        if len(members) < 2:
            continue
        ids = sorted(set(members))
        for x in range(min(len(ids), cap)):
            for y in range(x + 1, min(len(ids), cap)):
                cand.add((ids[x], ids[y]))
    # verify exact hamming with a broadcast id→phash map
    ph_tbl = collect_arrow(
        ds.select_columns([id_col, phash_col]),
        schema=pa.schema([(id_col, pa.string()), (phash_col, pa.int64())]),
    )
    ph = dict(zip(ph_tbl.column(id_col).to_pylist(), ph_tbl.column(phash_col).to_pylist()))
    va, vb, vd = [], [], []
    for ia, ib in sorted(cand):
        d = bin((ph[ia] ^ ph[ib]) & 0xFFFFFFFFFFFFFFFF).count("1")
        if d <= hamming_threshold:
            va.append(ia)
            vb.append(ib)
            vd.append(d)
    return pa.table(
        {
            "id_a": pa.array(va, pa.string()),
            "id_b": pa.array(vb, pa.string()),
            "hamming": pa.array(vd, pa.int32()),
        }
    )
