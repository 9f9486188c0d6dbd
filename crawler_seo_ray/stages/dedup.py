"""Deduplication operators for training-data pipelines.

Five families, each expressed Ray-Data-first:

- exact:        hash-partitioned ``groupby(key).map_groups(first)``
- MinHash+LSH:  shingle → minhash signature → banded bucket groupby →
                candidate pairs → exact-Jaccard verify → components
- SimHash:      64-bit simhash → band-of-bits bucketing → Hamming verify
- n-gram Jaccard: shared shingle machinery, direct pair verification
- embedding cosine: normalized-vector blocking (random-hyperplane LSH)
                → in-bucket exact cosine

Scale shape (10^10-row honest, round-2 rework): every stage that scales
with the corpus is distributed —

- bucket membership is a ``groupby(band, band_hash).map_groups`` over
  narrow (id, band, hash) rows; candidate pairs are emitted *inside*
  the owning group (no driver-side bucket dict).
- signature-verifiable families (SimHash, phash) carry the 64-bit
  signature along the band rows and verify Hamming inside the group —
  zero extra passes.
- exact-verification families (MinHash-Jaccard, token Jaccard)
  distinct the candidate pairs with a ``groupby(id_a, id_b)``
  aggregate, then JOIN the pair table back to the text column (twice:
  a-side, b-side) and verify inside ``map_batches`` — no broadcast
  id→shingles map; the only driver-resident tables are final verified
  outputs.
- connected components use driver union-find on the *verified-pair*
  set (output-sized); the scale path is iterative min-label
  propagation over the same pair table.
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


def _emit_bucket_pairs(
    id_col: str,
    cap: int,
    strict: bool = True,
    len_col: str | None = None,
    len_ratio: float | None = None,
):
    """map_groups kernel: emit candidate (id_a, id_b) pairs from one
    LSH bucket. Runs inside the owning group after the distributed
    ``groupby(band, hash)`` shuffle — no driver-side bucket dict.
    ``cap`` bounds degenerate buckets (quadratic blowup guard).
    ``strict`` (default) RAISES on overflow — the exception propagates
    to the driver, which a worker-side print (invisible under
    log_to_driver=False) does not; pass strict=False to deterministically
    keep the ``cap`` smallest ids and accept recall loss.

    With ``len_col``/``len_ratio`` set, applies the EXACT PPJoin length
    filter: Jaccard ≥ t implies min(|A|,|B|) ≥ t·max(|A|,|B|), so only
    pairs inside the sliding length window are emitted (sorted two-
    pointer — no recall loss, big candidate cut when sizes vary)."""

    def emit(g: pa.Table) -> pa.Table:
        if len_col is not None:
            by_id = {}
            for i, n in zip(g.column(id_col).to_pylist(), g.column(len_col).to_pylist()):
                by_id[i] = n
            # sort by (len, id): the length window is contiguous
            members = sorted(by_id.items(), key=lambda kv: (kv[1], kv[0]))
        else:
            members = [(i, 0) for i in sorted(set(g.column(id_col).to_pylist()))]
        if len(members) > cap:
            if strict:
                raise ValueError(
                    f"dedup bucket over cap={cap} ({len(members)} ids): pair "
                    "emission would lose recall — raise bucket_cap or pass "
                    "strict=False to truncate deterministically"
                )
            members = members[:cap]
        out_a, out_b = [], []
        for i in range(len(members)):
            ida, na = members[i]
            for j in range(i + 1, len(members)):
                idb, nb = members[j]
                if len_col is not None and na < len_ratio * nb:
                    break  # lengths ascend: every later j fails too
                a, b = (ida, idb) if ida < idb else (idb, ida)
                out_a.append(a)
                out_b.append(b)
        return pa.table(
            {"id_a": pa.array(out_a, pa.int64()), "id_b": pa.array(out_b, pa.int64())}
        )

    return emit


def _distinct_pairs(pairs: Dataset) -> Dataset:
    """Distributed pair-dedup (a pair colliding in k bands is emitted k
    times): one narrow groupby over the candidate-pair keys."""
    from ray.data.aggregate import Count as _Count

    return pairs.groupby(["id_a", "id_b"]).aggregate(_Count(alias_name="_n")).drop_columns(["_n"])


def _attach_texts(pairs: Dataset, ds: Dataset, text_col: str, id_col: str,
                  num_partitions: int = 4) -> Dataset:
    """JOIN the candidate-pair table back to the text column, a-side and
    b-side — the distributed replacement for a broadcast id→text map.
    Pair count is LSH-candidate-sized (≪ corpus), so the join's shuffle
    ships only colliding rows plus the narrow pair keys."""

    def _side(side: str) -> Dataset:
        key, val = f"_{side}id", f"text_{side}"

        def rename(batch: pa.Table) -> pa.Table:
            return pa.table({key: batch.column(id_col), val: batch.column(text_col)})

        return ds.select_columns([id_col, text_col]).map_batches(
            rename, batch_format="pyarrow"
        )

    j = pairs.join(_side("a"), "inner", num_partitions, on=("id_a",), right_on=("_aid",))
    j = j.join(_side("b"), "inner", num_partitions, on=("id_b",), right_on=("_bid",))
    return j


def minhash_pipeline(
    ds: Dataset,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.7,
    bucket_cap: int = 200,
    components: str = "driver",
) -> dict:
    """MinHash+LSH near-dup detection. Returns
    {"pairs": pa.Table(id_a, id_b, jaccard), "groups": pa.Table(id, rep)}.

    Fully distributed: band rows → ``groupby(band, hash)`` bucket pair
    emission → pair-distinct groupby → text join (a/b sides) → exact
    shingle-Jaccard verify in ``map_batches``. Only the verified pairs
    (output-sized) ever land on the driver.
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
                id_col: pa.array(out_ids, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.int64()),
            }
        )

    band_rows = ds.select_columns([id_col, text_col]).map_batches(
        sig_batch, batch_format="pyarrow"
    )
    cand = _distinct_pairs(
        band_rows.groupby(["band", "band_hash"]).map_groups(
            _emit_bucket_pairs(id_col, bucket_cap), batch_format="pyarrow"
        )
    ).materialize()  # candidate pairs: small, reused by both join sides

    if cand.count() == 0:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
        return {"pairs": empty, "groups": pa.table(
            {"id": pa.array([], pa.int64()), "rep": pa.array([], pa.int64())})}

    def verify(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        for ia, ib, ta, tb in zip(
            batch.column("id_a").to_pylist(), batch.column("id_b").to_pylist(),
            batch.column("text_a").to_pylist(), batch.column("text_b").to_pylist(),
        ):
            sa, sb = shingles(ta, shingle_k), shingles(tb, shingle_k)
            union = len(sa | sb)
            j = (len(sa & sb) / union) if union else 0.0
            if j >= jaccard_threshold:
                out_a.append(ia)
                out_b.append(ib)
                out_j.append(j)
        return pa.table(
            {"id_a": pa.array(out_a, pa.int64()), "id_b": pa.array(out_b, pa.int64()),
             "jaccard": pa.array(out_j, pa.float64())}
        )

    verified = collect_arrow(
        _attach_texts(cand, ds, text_col, id_col).map_batches(
            verify, batch_format="pyarrow"
        ),
        schema=pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()), ("jaccard", pa.float64())]
        ),
    )
    verified = _sort_pairs(verified)

    if components == "distributed":
        # cluster-scale path: iterative min-label propagation when even
        # the verified-pair set outgrows driver memory
        groups_tbl = connected_components_distributed(verified)
    else:
        va = verified.column("id_a").to_pylist()
        vb = verified.column("id_b").to_pylist()
        groups = _connected_components(va, vb)
        groups_tbl = pa.table(
            {
                "id": pa.array(list(groups.keys()), pa.int64()),
                "rep": pa.array(list(groups.values()), pa.int64()),
            }
        )
    return {"pairs": verified, "groups": groups_tbl}


def _sort_pairs(tbl: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    if tbl.num_rows == 0:
        return tbl
    return tbl.take(
        pc.sort_indices(tbl, sort_keys=[("id_a", "ascending"), ("id_b", "ascending")])
    )


def connected_components_distributed(
    pairs: pa.Table | Dataset, max_iters: int = 64
) -> pa.Table:
    """Distributed connected components over a verified-pair edge table
    via iterative MIN-LABEL PROPAGATION — the cluster-scale path for
    component labeling when the pair set itself exceeds driver memory
    (the driver union-find in _connected_components is output-sized and
    fine below that).

    Each round every vertex takes the min label among itself and its
    neighbors (one join edges⋈labels + one groupby-min); convergence in
    O(component diameter) rounds, detected by the monotone global label
    sum. Returns Table(id, rep) with rep = component min id.
    """
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Min as _Min
    from ray.data.aggregate import Sum as _Sum

    tbl = pairs if isinstance(pairs, pa.Table) else collect_arrow(pairs)
    if tbl.num_rows == 0:
        return pa.table({"id": pa.array([], pa.int64()), "rep": pa.array([], pa.int64())})
    # both edge directions, narrow (src, dst) int64 columns
    edges_tbl = pa.table(
        {
            "src": pa.concat_arrays(
                [tbl.column("id_a").combine_chunks(), tbl.column("id_b").combine_chunks()]
            ).cast(pa.int64()),
            "dst": pa.concat_arrays(
                [tbl.column("id_b").combine_chunks(), tbl.column("id_a").combine_chunks()]
            ).cast(pa.int64()),
        }
    )
    edges = rd.from_arrow(edges_tbl)
    ids = pc.unique(
        pa.concat_arrays(
            [edges_tbl.column("src").combine_chunks(), edges_tbl.column("dst").combine_chunks()]
        )
    )
    labels = rd.from_arrow(pa.table({"id": ids, "label": ids}))
    prev_sum = None
    converged = False
    for _ in range(max_iters):
        # neighbor messages: edge (src,dst) ships src's current label to dst
        msgs = edges.join(
            labels, "inner", 4, on=("src",), right_on=("id",)
        ).map_batches(
            lambda b: pa.table({"id": b.column("dst"), "label": b.column("label")}),
            batch_format="pyarrow",
        )
        labels = (
            labels.union(msgs)
            .groupby("id")
            .aggregate(_Min("label", alias_name="label"))
            .materialize()
        )
        cur = labels.aggregate(_Sum("label", alias_name="s"))["s"]
        if prev_sum is not None and cur == prev_sum:
            converged = True
            break
        prev_sum = cur
    if not converged:
        # partially-propagated labels are silently WRONG (rep != min id
        # for components wider than max_iters hops) — refuse to return
        # them; propagation converges in O(component diameter) rounds
        raise RuntimeError(
            f"component labeling did not converge in {max_iters} rounds "
            "(component diameter exceeds max_iters) — raise max_iters"
        )
    out = collect_arrow(labels)
    out = out.rename_columns(["id", "rep"])
    return out.take(pc.sort_indices(out.column("id")))


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
    verify. Returns {"signatures": Table(id, simhash), "pairs": Table}.

    Distributed shape: the band rows CARRY the full signature (one
    int64), so exact Hamming verification happens inside the bucket
    group — no driver-side id→signature map, no second corpus pass.
    The final distinct is over verified pairs only (output-sized)."""
    pairs, sigs = _signature_band_pairs(
        ds.select_columns([id_col, text_col]).map_batches(
            _simhash_sig_batch(text_col, id_col), batch_format="pyarrow"
        ),
        id_col, "simhash", hamming_threshold, bands,
    )
    return {"signatures": sigs, "pairs": pairs}


def _simhash_sig_batch(text_col: str, id_col: str):
    def sig_batch(batch: pa.Table) -> pa.Table:
        sigs = [simhash64(t) for t in batch.column(text_col).to_pylist()]
        return pa.table(
            {id_col: batch.column(id_col), "simhash": pa.array(sigs, pa.int64())}
        )

    return sig_batch


def _signature_band_pairs(
    sigs: Dataset,
    id_col: str,
    sig_col: str,
    hamming_threshold: int,
    bands: int,
    cap: int = 200,
    id_type: pa.DataType = pa.int64(),
) -> tuple[pa.Table, pa.Table]:
    """Shared distributed Hamming-banding machinery for 64-bit
    signature families (SimHash text, phash images): band the signature
    into ``bands`` segments, groupby ``(band, segment value)``, emit
    exact-Hamming-verified pairs inside the owning group (signatures
    ride the narrow band rows), distinct the (output-sized) verified
    pairs driver-side. Returns (pairs, signatures)."""
    band_bits = 64 // bands
    sigs = sigs.materialize()  # reused: band expansion + returned signatures

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        hs = batch.column(sig_col).to_pylist()
        out_i, out_b, out_v, out_s = [], [], [], []
        for i, h in zip(ids, hs):
            uh = (h if h is not None else 0) & 0xFFFFFFFFFFFFFFFF
            for band in range(bands):
                out_i.append(i)
                out_b.append(band)
                out_v.append((uh >> (band * band_bits)) & ((1 << band_bits) - 1))
                out_s.append(h if h is not None else 0)
        return pa.table(
            {
                id_col: pa.array(out_i, id_type),
                "band": pa.array(out_b, pa.int32()),
                "band_val": pa.array(out_v, pa.int64()),
                sig_col: pa.array(out_s, pa.int64()),
            }
        )

    def bucket_verified_pairs(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_pylist()
        hs = g.column(sig_col).to_pylist()
        order = sorted(range(len(ids)), key=lambda k: ids[k])
        if len(order) > cap:
            # raise (driver-visible) rather than silently losing recall
            # — a worker-side print disappears under log_to_driver=False
            raise ValueError(
                f"signature bucket over cap={cap} ({len(order)} ids): "
                "raise the cap or pre-split the degenerate bucket"
            )
        out_a, out_b, out_d = [], [], []
        for x in range(len(order)):
            for y in range(x + 1, len(order)):
                i, j = order[x], order[y]
                if ids[i] == ids[j]:
                    continue
                d = bin((hs[i] ^ hs[j]) & 0xFFFFFFFFFFFFFFFF).count("1")
                if d <= hamming_threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_d.append(d)
        return pa.table(
            {
                "id_a": pa.array(out_a, id_type),
                "id_b": pa.array(out_b, id_type),
                "hamming": pa.array(out_d, pa.int32()),
            }
        )

    verified = collect_arrow(
        sigs.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "band_val"])
        .map_groups(bucket_verified_pairs, batch_format="pyarrow"),
        schema=pa.schema(
            [("id_a", id_type), ("id_b", id_type), ("hamming", pa.int32())]
        ),
    )
    # distinct over verified pairs (a pair may collide in several bands)
    if verified.num_rows:
        verified = verified.group_by(["id_a", "id_b"]).aggregate([("hamming", "min")])
        verified = verified.rename_columns(["id_a", "id_b", "hamming"])
        verified = _sort_pairs(verified)
    return verified, collect_arrow(sigs)


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
       (rare-token ordering maximizes pruning), broadcast as rank map
       (vocabulary-sized — the PPJoin global token order);
    2. each doc emits its ⌊(1−t)·|T|⌋+1 rarest tokens as blocking keys —
       any pair with Jaccard ≥ t provably shares one;
    3. candidate pairs emitted inside the distributed token-bucket
       groupby, pair-distincted with a second narrow groupby, joined
       back to the texts (a/b sides) and verified with exact set
       Jaccard in ``map_batches`` — no driver-side bucket dict or
       broadcast id→token-set map.

    Token normalization matches DuckDB's
    ``list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))``.
    ``bucket_cap`` guards runaway buckets; overflow RAISES (exactness is
    the contract — callers size the cap to their corpus). Inside the
    bucket the exact PPJoin length filter prunes before pair emission.
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
        out_tok, out_id, out_n = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
            toks = tokens_of(t)
            if not toks:
                continue
            p = len(toks) - math.ceil(threshold * len(toks)) + 1
            for tok in sorted(toks, key=lambda x: rk[x])[:p]:
                out_tok.append(tok)
                out_id.append(i)
                out_n.append(len(toks))
        return pa.table(
            {
                "tok": pa.array(out_tok, pa.string()),
                id_col: pa.array(out_id, pa.int64()),
                "ntok": pa.array(out_n, pa.int64()),
            }
        )

    cand = _distinct_pairs(
        ds.select_columns([id_col, text_col])
        .map_batches(prefix_keys, batch_format="pyarrow")
        .groupby("tok")
        .map_groups(
            # exact PPJoin length filter inside the bucket (J >= t
            # implies min >= t*max token counts) — no recall loss
            _emit_bucket_pairs(
                id_col, bucket_cap, len_col="ntok", len_ratio=threshold
            ),
            batch_format="pyarrow",
        )
    ).materialize()

    if cand.count() == 0:
        return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})

    def verify(batch: pa.Table) -> pa.Table:
        out_a, out_b = [], []
        for ia, ib, ta, tb in zip(
            batch.column("id_a").to_pylist(), batch.column("id_b").to_pylist(),
            batch.column("text_a").to_pylist(), batch.column("text_b").to_pylist(),
        ):
            sa, sb = set(tokens_of(ta)), set(tokens_of(tb))
            u = len(sa | sb)
            if u and len(sa & sb) / u >= threshold:
                out_a.append(ia)
                out_b.append(ib)
        return pa.table(
            {"id_a": pa.array(out_a, pa.int64()), "id_b": pa.array(out_b, pa.int64())}
        )

    return _sort_pairs(
        collect_arrow(
            _attach_texts(cand, ds, text_col, id_col).map_batches(
                verify, batch_format="pyarrow"
            ),
            schema=pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())]),
        )
    )


def phash_pairs(
    ds: Dataset,
    phash_col: str = "phash",
    id_col: str = "image_id",
    hamming_threshold: int = 6,
    bands: int = 8,
) -> pa.Table:
    """Near-duplicate IMAGES by perceptual-hash Hamming distance: the
    same distributed Hamming-banding machinery as SimHash text dedup
    (_signature_band_pairs) applied to the corpus ``phash`` column —
    band the 64-bit phash into ``bands`` segments (any pair within
    Hamming ≤ bands−1 shares an exact band), verify exact Hamming
    inside the distributed bucket group (multimodal near-dup)."""
    pairs, _ = _signature_band_pairs(
        ds.select_columns([id_col, phash_col]),
        id_col, phash_col, hamming_threshold, bands, id_type=pa.string(),
    )
    return pairs
