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
import pyarrow.compute as pc
import ray
import ray.data
from ray.data import Dataset

from ..functions.text import shingles, simhash64
from ..util import atomic_write_parquet, collect_arrow

# 31-bit Mersenne prime: a,b,x < 2^31 keeps a*x+b < 2^63 — exact in
# uint64, so the (a·x+b) mod p permutation family vectorizes in numpy
_MERSENNE = (1 << 31) - 1


def exact_dedup(ds: Dataset, key_col: str, order_col: str) -> Dataset:
    """Keep the first row (min order_col) of every key group — the
    reference's keep-first URL-dedup semantics (SURVEY.md §2.7) applied
    relationally. r5: ONE global (key, order) sort via
    util.sorted_group_apply — each run's first row IS the keeper, so
    the kernel is a boundary mask (the key count is input-proportional;
    a groupby.map_groups here pays per-key Python dispatch).
    ``order_col`` must be unique within a key (every caller passes a
    row id) so the keeper is well-defined under sort ties."""
    import pyarrow.compute as pc

    from ..util import sorted_group_apply

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        ka = t.column(key_col).combine_chunks()
        chg = np.r_[
            True,
            pc.not_equal(
                ka.slice(1), ka.slice(0, len(ka) - 1)
            ).to_numpy(zero_copy_only=False),
        ]
        return t.filter(pa.array(chg))

    return sorted_group_apply(ds, key_col, [order_col], kernel)


def _minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _batch_signatures(texts, shingle_k: int, aa: np.ndarray, bb: np.ndarray):
    """r5: minhash signatures for a WHOLE batch in doc-chunked numpy —
    per-doc sorted-unique shingle arrays concatenate into one uint64
    stream, the (shingles × perms) affine pass runs per chunk, and each
    doc's signature is one minimum.reduceat over its segment; the only
    per-doc Python left is the shingle window chain itself (already
    vectorized within a doc). Values are bit-identical to the old
    per-doc kernel (all operands < 2^31, so no uint64 wrap).

    Returns (keep_indices, shingle_arrays, sigs[m × num_perm])."""
    from ..functions.text import shingle_array

    arrs_all = [shingle_array(t, shingle_k) for t in texts]
    keep = [i for i, a in enumerate(arrs_all) if a.size]
    if not keep:
        return [], [], np.empty((0, aa.size), np.uint64)
    arrs = [arrs_all[i] for i in keep]
    lens = np.array([a.size for a in arrs], np.int64)
    M = np.uint64(_MERSENNE)
    X = np.concatenate(arrs) % M
    bounds = np.r_[0, np.cumsum(lens)]
    m = len(arrs)
    sigs = np.empty((m, aa.size), np.uint64)
    CH = 400_000  # shingles per chunk bounds the (CH × perms) scratch
    c0 = 0
    while c0 < m:
        c1 = c0 + 1
        while c1 < m and bounds[c1 + 1] - bounds[c0] <= CH:
            c1 += 1
        seg = X[bounds[c0] : bounds[c1]]
        H = (seg[:, None] * aa[None, :] + bb[None, :]) % M
        sigs[c0:c1] = np.minimum.reduceat(
            H, bounds[c0:c1] - bounds[c0], axis=0
        )
        c0 = c1
    return keep, arrs, sigs


def _stable_hash64(data: bytes) -> int:
    """Process-stable 63-bit hash (Python's hash() is salted per process
    — unusable for cross-worker bucketing)."""
    import hashlib

    return int.from_bytes(hashlib.md5(data).digest()[:8], "big") >> 1


def _vec_window_within(lens: np.ndarray, ratio: float | None):
    """Vectorized candidate-window emission inside one (len, id)-sorted
    bucket: member i pairs with the contiguous window of later members
    whose length ≤ len_i/ratio (the EXACT PPJoin length filter —
    J ≥ t ⟹ min(|A|,|B|) ≥ t·max(|A|,|B|)). Returns INDEX arrays into
    the sorted member order — O(output) numpy work, no Python pair
    loop."""
    n = len(lens)
    if n < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if ratio is None:
        ub = np.full(n, n, dtype=np.int64)
    else:
        ub = np.searchsorted(lens, lens.astype(np.float64) / ratio, side="right")
    lo = np.arange(1, n + 1, dtype=np.int64)
    counts = np.maximum(ub - lo, 0)
    ia = np.repeat(np.arange(n, dtype=np.int64), counts)
    ib = (
        np.concatenate([np.arange(i + 1, ub[i], dtype=np.int64) for i in range(n) if counts[i] > 0])
        if counts.any()
        else np.empty(0, np.int64)
    )
    return ia, ib


def _vec_window_cross(lens_a: np.ndarray, lens_b: np.ndarray, ratio: float | None):
    """Vectorized cross-window emission between two length-sorted member
    chunks (the split halves of an over-cap bucket): for each a the
    compatible b-window is lens_b ∈ [ratio·len_a, len_a/ratio].
    Returns index arrays (into a-order, into b-order)."""
    na, nb = len(lens_a), len(lens_b)
    if not na or not nb:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if ratio is None:
        j0 = np.zeros(na, np.int64)
        j1 = np.full(na, nb, np.int64)
    else:
        fa = lens_a.astype(np.float64)
        j0 = np.searchsorted(lens_b, ratio * fa, side="left")
        j1 = np.searchsorted(lens_b, fa / ratio, side="right")
    counts = np.maximum(j1 - j0, 0)
    ia = np.repeat(np.arange(na, dtype=np.int64), counts)
    ib = (
        np.concatenate([np.arange(j0[i], j1[i], dtype=np.int64) for i in range(na) if counts[i] > 0])
        if counts.any()
        else np.empty(0, np.int64)
    )
    return ia, ib


_PAIR_ROUND_SCHEMA = pa.schema(
    [
        ("id_a", pa.int64()),
        ("id_b", pa.int64()),
        ("subkey", pa.string()),
        ("member", pa.int64()),
        ("mlen", pa.int64()),
        ("side", pa.int8()),
        ("payload", pa.binary()),
    ]
)


def _emit_pairs(
    ids_a: np.ndarray,
    ids_b: np.ndarray,
    sets_a: list | None,
    sets_b: list | None,
    ia: np.ndarray,
    ib: np.ndarray,
    threshold: float | None,
):
    """Map window index pairs to normalized (id_a < id_b) id pairs; with
    token-set payloads, verify EXACT set Jaccard in place (the verify
    step runs inside the owning bucket task — candidates never ride a
    shuffle). r5: the verify is a BITSET-matrix pass — members map
    their rank arrays onto the bucket's local vocabulary once
    (per-member, ≤ cap rows), then every candidate pair's
    |A∩B| is one vectorized AND + byte-LUT popcount, chunked to bound
    the (pairs × vocab/8) scratch. The old per-pair Python set
    union/intersection walked millions of candidates at bench scale."""
    if sets_a is not None and len(ia):
        from .similarity import _POP8

        same = sets_a is sets_b
        arrs = list(sets_a) if same else list(sets_a) + list(sets_b)
        off_b = 0 if same else len(sets_a)
        vocab = np.unique(
            np.concatenate([a for a in arrs if a.size] or [np.empty(0, np.int32)])
        )
        words = max(1, (vocab.size + 63) // 64)
        bits = np.zeros((len(arrs), words), np.uint64)
        lens = np.empty(len(arrs), np.int64)
        for m, arr in enumerate(arrs):  # per MEMBER (≤ cap), not per pair
            lens[m] = arr.size
            if arr.size:
                pos = np.searchsorted(vocab, arr)
                np.bitwise_or.at(
                    bits[m],
                    pos >> 6,
                    np.uint64(1) << (pos & 63).astype(np.uint64),
                )
        xb = ib + off_b
        keep_mask = np.zeros(len(ia), bool)
        CH = max(1, 16_000_000 // (words * 8))  # ~128 MB scratch cap
        for s in range(0, len(ia), CH):
            e = min(s + CH, len(ia))
            inter_bits = bits[ia[s:e]] & bits[xb[s:e]]
            inter = _POP8[
                inter_bits.view(np.uint8).reshape(e - s, words * 8)
            ].sum(axis=1, dtype=np.int64)
            union = lens[ia[s:e]] + lens[xb[s:e]] - inter
            ok = union > 0
            ok[ok] = (inter[ok] / union[ok]) >= threshold
            keep_mask[s:e] = ok
        ia = ia[keep_mask]
        ib = ib[keep_mask]
    a = ids_a[ia] if len(ia) else np.empty(0, np.int64)
    b = ids_b[ib] if len(ib) else np.empty(0, np.int64)
    return np.minimum(a, b), np.maximum(a, b)


def _decode_sets(payloads: list) -> list:
    """Binary-packed sorted int32 token-rank arrays → one numpy array
    per member (exact — ranks are vocabulary positions, not hashes);
    consumed by _emit_pairs' bitset verify."""
    return [
        np.frombuffer(p, dtype=np.int32)
        if p is not None
        else np.empty(0, np.int32)
        for p in payloads
    ]


def _bucket_candidate_pairs(
    key_rows: Dataset,
    key_cols: list[str],
    id_col: str,
    cap: int,
    len_col: str | None = None,
    len_ratio: float | None = None,
    payload_col: str | None = None,
    verify_threshold: float | None = None,
) -> Dataset:
    """Distributed candidate-pair emission over LSH/prefix buckets with
    DETERMINISTIC DEGENERATE-BUCKET SPLITTING (no recall loss, no raise):

    round 1 — ``groupby(key_cols)``; a bucket with ≤ ``cap`` members
    emits its pairs directly (vectorized window generation, PPJoin
    length-filtered). An over-cap bucket is cut into ⌈n/cap⌉ length-
    ordered chunks and re-emitted as narrow member rows keyed by
    feasible chunk pairs (i, j) — every original pair lands in exactly
    one sub-bucket, and length-infeasible chunk pairs are pruned at
    chunk granularity.

    round 2 — ``groupby(subkey)`` over the (bounded ≤ 2·cap) sub-
    buckets emits within-chunk or cross-chunk pairs.

    The inherently-quadratic work of a dense bucket (a corpus whose
    true near-dup output IS quadratic in its cluster sizes) is thereby
    spread over the cluster in ≤ cap²-pair tasks instead of landing on
    one worker or raising — the PPJoin-literature degenerate-bucket
    refinement, exactness preserved.

    With ``payload_col`` (binary-packed sorted token-rank arrays) and
    ``verify_threshold``, EXACT set-Jaccard verification happens inside
    the bucket task and only VERIFIED pairs leave it — no candidate-
    sized shuffle, no text join, no separate verify stage. Returned
    pairs may still repeat across buckets (≤ shared-prefix-token
    count); callers distinct the output-sized result."""

    def _members(g: pa.Table):
        ids_raw = g.column(id_col).to_numpy(zero_copy_only=False)
        _, first = np.unique(ids_raw, return_index=True)
        ids = ids_raw[first]
        if len_col is not None:
            lens = g.column(len_col).to_numpy(zero_copy_only=False)[first]
        else:
            lens = np.zeros(len(ids), np.int64)
        order = np.lexsort((ids, lens))
        ids, lens = ids[order], lens[order]
        payloads = None
        if payload_col is not None:
            pl = g.column(payload_col).to_pylist()
            payloads = [pl[first[k]] for k in order]
        return ids, lens, payloads

    def _pair_table(a: np.ndarray, b: np.ndarray, full_schema: bool) -> pa.Table:
        cols = {"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())}
        if not full_schema:
            return pa.table(cols)
        n = len(a)
        cols.update(
            subkey=pa.nulls(n, pa.string()),
            member=pa.nulls(n, pa.int64()),
            mlen=pa.nulls(n, pa.int64()),
            side=pa.nulls(n, pa.int8()),
            payload=pa.nulls(n, pa.binary()),
        )
        return pa.table(cols, schema=_PAIR_ROUND_SCHEMA)

    def round1(g: pa.Table) -> pa.Table:
        ids, lens, payloads = _members(g)
        n = len(ids)
        if n <= cap:
            ia, ib = _vec_window_within(lens, len_ratio)
            sets = _decode_sets(payloads) if payloads is not None else None
            a, b = _emit_pairs(ids, ids, sets, sets, ia, ib, verify_threshold)
            return _pair_table(a, b, full_schema=True)
        # over-cap: deterministic chunk split (members already sorted by
        # (len, id) — chunk boundaries and contents are data-determined)
        base = "\x00".join(str(g.column(c)[0].as_py()) for c in key_cols)
        k = -(-n // cap)
        size = -(-n // k)
        chunks = [
            (ids[s : s + size], lens[s : s + size],
             payloads[s : s + size] if payloads is not None else None)
            for s in range(0, n, size)
        ]
        out_key, out_member, out_mlen, out_side, out_pl = [], [], [], [], []
        for i in range(len(chunks)):
            for j in range(i, len(chunks)):
                if (
                    i != j
                    and len_ratio is not None
                    and chunks[i][1][-1] < len_ratio * chunks[j][1][0]
                ):
                    continue  # no feasible cross pair: lengths too far apart
                sk = f"{base}\x00#{i}-{j}"
                for side, c in (((0, i),) if i == j else ((0, i), (1, j))):
                    cid, clen, cpl = chunks[c]
                    out_key.extend([sk] * len(cid))
                    out_member.extend(cid.tolist())
                    out_mlen.extend(clen.tolist())
                    out_side.extend([side] * len(cid))
                    out_pl.extend(cpl if cpl is not None else [None] * len(cid))
        m = len(out_key)
        return pa.table(
            {
                "id_a": pa.nulls(m, pa.int64()),
                "id_b": pa.nulls(m, pa.int64()),
                "subkey": pa.array(out_key, pa.string()),
                "member": pa.array(out_member, pa.int64()),
                "mlen": pa.array(out_mlen, pa.int64()),
                "side": pa.array(out_side, pa.int8()),
                "payload": pa.array(out_pl, pa.binary()),
            },
            schema=_PAIR_ROUND_SCHEMA,
        )

    def round2(g: pa.Table) -> pa.Table:
        member = g.column("member").to_numpy(zero_copy_only=False)
        mlen = g.column("mlen").to_numpy(zero_copy_only=False)
        side = g.column("side").to_numpy(zero_copy_only=False)
        pl = g.column("payload").to_pylist() if payload_col is not None else None
        ratio = len_ratio if len_col is not None else None
        if side.max() == 0:  # within-chunk sub-bucket
            order = np.lexsort((member, mlen))
            ids, lens = member[order], mlen[order]
            sets = (
                _decode_sets([pl[k] for k in order]) if pl is not None else None
            )
            ia, ib = _vec_window_within(lens, ratio)
            a, b = _emit_pairs(ids, ids, sets, sets, ia, ib, verify_threshold)
        else:
            sa, sb = np.flatnonzero(side == 0), np.flatnonzero(side == 1)
            oa = sa[np.lexsort((member[sa], mlen[sa]))]
            ob = sb[np.lexsort((member[sb], mlen[sb]))]
            sets_a = _decode_sets([pl[k] for k in oa]) if pl is not None else None
            sets_b = _decode_sets([pl[k] for k in ob]) if pl is not None else None
            ia, ib = _vec_window_cross(mlen[oa], mlen[ob], ratio)
            a, b = _emit_pairs(
                member[oa], member[ob], sets_a, sets_b, ia, ib, verify_threshold
            )
        return _pair_table(a, b, full_schema=False)

    r1 = key_rows.groupby(key_cols).map_groups(
        round1, batch_format="pyarrow"
    ).materialize()
    import pyarrow.compute as pc

    direct = r1.map_batches(
        lambda b: b.filter(pc.is_valid(b.column("id_a"))).select(["id_a", "id_b"]),
        batch_format="pyarrow",
    )
    deferred = r1.map_batches(
        lambda b: b.filter(pc.is_valid(b.column("subkey"))).select(
            ["subkey", "member", "mlen", "side", "payload"]
        ),
        batch_format="pyarrow",
    ).materialize()
    if deferred.count() == 0:
        # the common case — no bucket over cap: skip round 2 entirely
        # (an empty groupby still pays the sort-shuffle fixed cost)
        return direct
    split = deferred.groupby("subkey").map_groups(round2, batch_format="pyarrow")
    return direct.union(split)


def _distinct_pairs(pairs: Dataset) -> Dataset:
    """Distributed pair-dedup (a pair colliding in k bands is emitted k
    times): one sort-kernel count over the candidate-pair keys (pair
    count is input-proportional — Ray's groupby-aggregate would walk
    every pair in Python, the r4 lesson)."""
    from ..util import sorted_agg_by_key

    return sorted_agg_by_key(
        pairs, ["id_a", "id_b"], [(None, "count", "_n")]
    ).drop_columns(["_n"])


def _attach_texts(pairs: Dataset, ds: Dataset, text_col: str, id_col: str,
                  num_partitions: int = 2) -> Dataset:
    """JOIN the candidate-pair table back to the text column, a-side and
    b-side — the distributed replacement for a broadcast id→text map.
    Pair count is LSH-candidate-sized (≪ corpus), so the join's shuffle
    ships only colliding rows plus the narrow pair keys."""

    from ..util import drop_empty_blocks

    def _side(side: str) -> Dataset:
        key, val = f"_{side}id", f"text_{side}"

        def rename(batch: pa.Table) -> pa.Table:
            return pa.table({key: batch.column(id_col), val: batch.column(text_col)})

        return ds.select_columns([id_col, text_col]).map_batches(
            rename, batch_format="pyarrow"
        )

    # pairs is groupby-derived (_distinct_pairs): strip the zero-column
    # empty-partition blocks that abort Dataset.join (util docstring)
    pairs = drop_empty_blocks(pairs)
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
    candidate_broadcast_limit: int = 200_000,
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
        keep, _, sigs = _batch_signatures(texts, shingle_k, aa, bb)
        out_ids, out_band, out_hash = [], [], []
        for row, i in enumerate(keep):
            sig = sigs[row]
            for band in range(bands):
                seg = sig[band * rows_per_band : (band + 1) * rows_per_band]
                out_ids.append(ids[i])
                out_band.append(band)
                out_hash.append(_stable_hash64(seg.tobytes()))
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
    # candidate pairs: small, reused by both join sides. Cross-band
    # duplicates (a pair colliding in k bands) are NOT distincted here —
    # the duplication factor is ≤ bands and the verified output is
    # deduped at the driver edge, which is cheaper than a second
    # sort-shuffle over the candidate rows
    cand = _bucket_candidate_pairs(
        band_rows, ["band", "band_hash"], id_col, bucket_cap
    ).materialize()

    n_cand = cand.count()
    if n_cand == 0:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
        return {"pairs": empty, "groups": pa.table(
            {"id": pa.array([], pa.int64()), "rep": pa.array([], pa.int64())})}

    def pair_jaccards(ids_a, ids_b, texts_of):
        cache: dict = {}

        def sh(i):
            s = cache.get(i)
            if s is None:
                s = cache[i] = shingles(texts_of(i), shingle_k)
            return s

        out_a, out_b, out_j = [], [], []
        for ia, ib in zip(ids_a, ids_b):
            sa, sb = sh(ia), sh(ib)
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

    schema = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()), ("jaccard", pa.float64())]
    )
    if n_cand <= candidate_broadcast_limit:
        # output-sized candidate set: fetch ONLY the colliding docs'
        # texts with one streaming membership filter (broadcast the
        # candidate-id set — candidate-sized, not corpus-sized) and
        # verify over the candidate blocks. Avoids two join shuffles.
        cand_tbl = collect_arrow(cand)
        import pyarrow.compute as pc

        need = pc.unique(
            pa.concat_arrays(
                [cand_tbl.column("id_a").combine_chunks(),
                 cand_tbl.column("id_b").combine_chunks()]
            )
        )
        need_ref = ray.put(need)

        def pick(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b.column(id_col), value_set=ray.get(need_ref)))

        texts = collect_arrow(
            ds.select_columns([id_col, text_col]).map_batches(
                pick, batch_format="pyarrow"
            )
        )
        tmap_ref = ray.put(
            dict(zip(texts.column(id_col).to_pylist(), texts.column(text_col).to_pylist()))
        )

        def verify_bcast(batch: pa.Table) -> pa.Table:
            tm = ray.get(tmap_ref)
            return pair_jaccards(
                batch.column("id_a").to_pylist(), batch.column("id_b").to_pylist(),
                lambda i: tm.get(i, ""),
            )

        verified = collect_arrow(
            cand.map_batches(verify_bcast, batch_format="pyarrow"), schema=schema
        )
    else:
        # candidates outgrow a broadcast: JOIN the texts a-side/b-side
        def verify(batch: pa.Table) -> pa.Table:
            ta = dict(zip(batch.column("id_a").to_pylist(), batch.column("text_a").to_pylist()))
            tb = dict(zip(batch.column("id_b").to_pylist(), batch.column("text_b").to_pylist()))
            return pair_jaccards(
                batch.column("id_a").to_pylist(), batch.column("id_b").to_pylist(),
                lambda i: ta.get(i) if i in ta else tb.get(i, ""),
            )

        verified = collect_arrow(
            _attach_texts(cand, ds, text_col, id_col).map_batches(
                verify, batch_format="pyarrow"
            ),
            schema=schema,
        )
    if verified.num_rows:
        # cross-band duplicates verified k times carry identical
        # jaccard values — one output-sized driver-edge distinct
        verified = (
            verified.group_by(["id_a", "id_b"]).aggregate([("jaccard", "min")])
            .rename_columns(["id_a", "id_b", "jaccard"])
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
    from ray.data.aggregate import Sum as _Sum

    from ..util import drop_empty_blocks, sorted_agg_by_key

    tbl = pairs if isinstance(pairs, pa.Table) else collect_arrow(pairs)
    id_type = tbl.schema.field("id_a").type
    if tbl.num_rows == 0:
        return pa.table({"id": pa.array([], id_type), "rep": pa.array([], id_type)})
    # non-integer ids (e.g. image_id strings) ride as SORTED dense codes:
    # np.unique order == lexicographic order, so min-code propagation is
    # min-id propagation and the decoded rep matches SQL least(). The
    # dictionary is pair-set-sized (the edge table is already collected
    # here), not corpus-sized.
    decode = None
    if not pa.types.is_integer(id_type):
        a = tbl.column("id_a").to_numpy(zero_copy_only=False)
        b = tbl.column("id_b").to_numpy(zero_copy_only=False)
        decode, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        codes = pa.array(inv, pa.int64())
        tbl = pa.table(
            {"id_a": codes.slice(0, len(a)), "id_b": codes.slice(len(a), len(b))}
        )
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
        labels = drop_empty_blocks(  # groupby blocks break the next join
            sorted_agg_by_key(
                labels.union(msgs), "id", [("label", "min", "label")]
            )
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
    if decode is not None:
        out = pa.table(
            {
                "id": pa.array(decode[out.column("id").to_numpy()], id_type),
                "rep": pa.array(decode[out.column("rep").to_numpy()], id_type),
            }
        )
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
    keep_signatures: bool = True,
) -> dict:
    """SimHash near-dup: 64-bit signatures, band-of-bits bucketing
    (any pair within Hamming ≤ bands-1 shares ≥1 exact band), Hamming
    verify. Returns {"signatures": Dataset(id, simhash) | None,
    "pairs": Table}.

    Distributed shape: the band rows CARRY the full signature (one
    int64), so exact Hamming verification happens inside the bucket
    group — no driver-side id→signature map, no second corpus pass.
    The final distinct is over verified pairs only (output-sized), and
    the signatures are returned as a DATASET (collect at the consumer's
    edge if a table is wanted) — pass ``keep_signatures=False`` when
    only the pairs matter and the signature blocks need not persist."""
    pairs, sigs = _signature_band_pairs(
        ds.select_columns([id_col, text_col]).map_batches(
            _simhash_sig_batch(text_col, id_col), batch_format="pyarrow"
        ),
        id_col, "simhash", hamming_threshold, bands,
        keep_signatures=keep_signatures,
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
    keep_signatures: bool = False,
    dense_rows: int | None = None,
    dense_row_limit: int = 4_000_000,
) -> tuple[pa.Table, Dataset | None]:
    """Shared distributed Hamming-banding machinery for 64-bit
    signature families (SimHash text, phash images): band the signature
    into ``bands`` segments, groupby ``(band, segment value)``, emit
    exact-Hamming-verified pairs inside the owning group (signatures
    ride the narrow band rows), distinct the (output-sized) verified
    pairs driver-side. Returns (pairs, signatures).

    Signatures stay a DATASET (never an O(corpus) driver table): with
    ``keep_signatures`` the signature stage is materialized once (band
    expansion + the returned handle share the blocks) and returned;
    otherwise the signatures are consumed by the band expansion alone
    and the second element is None (pairs-only callers such as
    phash_pairs / docs_simhash_dups pay no corpus-sized collection)."""
    band_bits = 64 // bands
    if keep_signatures:
        sigs = sigs.materialize()  # shared: band expansion + returned handle
        if dense_rows is None:
            dense_rows = sigs.count()  # metadata read post-materialize

    def band_rows(batch: pa.Table) -> pa.Table:
        # fully vectorized expansion: view the (null-filled) int64
        # signatures as uint64, shift/mask every (row, band) pair in one
        # numpy pass, and repeat-take the id column — no per-row Python
        n = batch.num_rows
        ids = batch.column(id_col).combine_chunks()
        sig = pc.coalesce(batch.column(sig_col), pa.scalar(0, pa.int64()))
        uh = pc.cast(sig, pa.int64()).to_numpy(zero_copy_only=False).view(np.uint64)
        rep = np.repeat(np.arange(n, dtype=np.int64), bands)
        band = np.tile(np.arange(bands, dtype=np.int32), n)
        shifts = (band.astype(np.uint64)) * np.uint64(band_bits)
        mask = np.uint64((1 << band_bits) - 1)
        vals = ((uh[rep] >> shifts) & mask).astype(np.int64)
        return pa.table(
            {
                id_col: ids.take(pa.array(rep)),
                "band": pa.array(band),
                "band_val": pa.array(vals),
                sig_col: pa.array(uh[rep].view(np.int64)),
            }
        )

    def buckets_verified_pairs_all(t: pa.Table) -> pa.Table:
        """r5 multi-bucket kernel: ALL (band, band_val) buckets of an
        id-sorted slab verify in one vectorized pass — run detection,
        index-arithmetic pair fan-out (m·(m−1)/2 per run), one
        byte-LUT xor-popcount over the pair arrays. Replaces both the
        per-group map_groups walk (~20 µs/bucket Python) and the
        per-pair Python loop."""
        from .similarity import _POP8

        if t.num_rows == 0:
            return pair_schema.empty_table()
        bd = t.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        bv = t.column("band_val").to_numpy(zero_copy_only=False).astype(np.int64)
        n = bd.size
        new = np.r_[True, (bd[1:] != bd[:-1]) | (bv[1:] != bv[:-1])]
        starts = np.flatnonzero(new)
        runlens = np.diff(np.r_[starts, n])
        if int(runlens.max()) > cap:
            # raise (driver-visible) rather than silently losing recall
            # — a worker-side print disappears under log_to_driver=False
            raise ValueError(
                f"signature bucket over cap={cap} ({int(runlens.max())} ids): "
                "raise the cap or pre-split the degenerate bucket"
            )
        within = np.arange(n, dtype=np.int64) - np.repeat(starts, runlens)
        cnt = np.repeat(runlens, runlens) - 1 - within  # pairs led by this row
        total = int(cnt.sum())
        if total == 0:
            return pair_schema.empty_table()
        ia = np.repeat(np.arange(n, dtype=np.int64), cnt)
        ofs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        ib = ia + 1 + ofs
        hs = (
            pc.cast(t.column(sig_col), pa.int64())
            .to_numpy(zero_copy_only=False)
            .view(np.uint64)
        )
        x = np.ascontiguousarray(hs[ia] ^ hs[ib])
        d = _POP8[x.view(np.uint8).reshape(-1, 8)].sum(axis=1, dtype=np.int32)
        ok = d <= hamming_threshold
        ids = t.column(id_col).combine_chunks()
        ida = ids.take(pa.array(ia[ok]))
        idb = ids.take(pa.array(ib[ok]))
        neq = pc.not_equal(ida, idb)  # duplicate-id rows inside a bucket
        return pa.table(
            {
                "id_a": ida.filter(neq).cast(id_type),
                "id_b": idb.filter(neq).cast(id_type),
                "hamming": pa.array(
                    d[ok][neq.to_numpy(zero_copy_only=False)], pa.int32()
                ),
            }
        )

    pair_schema = pa.schema(
        [("id_a", id_type), ("id_b", id_type), ("hamming", pa.int32())]
    )
    band_ds = sigs.map_batches(band_rows, batch_format="pyarrow")
    if dense_rows is not None and dense_rows * bands <= dense_row_limit:
        # dense path (bench: phash_pairs over the image corpus paid the
        # hash-shuffle + per-group-Python overhead on ~2.4k band rows):
        # collect the narrow band rows in the pipeline's ONE execution,
        # segment with a driver lexsort, and run the SAME bucket verify
        # kernel per multi-occupant segment — identical groups,
        # identical output. Callers pass dense_rows only when counting
        # is metadata-cheap (parquet read / post-materialize); None
        # keeps the distributed exchange unconditionally.
        tbl = collect_arrow(
            band_ds,
            schema=pa.schema(
                [
                    (id_col, id_type),
                    ("band", pa.int32()),
                    ("band_val", pa.int64()),
                    (sig_col, pa.int64()),
                ]
            ),
        )
        tbl = tbl.take(
            pc.sort_indices(
                tbl,
                sort_keys=[
                    ("band", "ascending"),
                    ("band_val", "ascending"),
                    (id_col, "ascending"),
                ],
            )
        )
        verified = buckets_verified_pairs_all(tbl)
    else:
        from ..util import sorted_group_apply

        verified = collect_arrow(
            sorted_group_apply(
                band_ds, ["band", "band_val"], [id_col], buckets_verified_pairs_all
            ),
            schema=pair_schema,
        )
    # distinct over verified pairs (a pair may collide in several bands)
    if verified.num_rows:
        verified = verified.group_by(["id_a", "id_b"]).aggregate([("hamming", "min")])
        verified = verified.rename_columns(["id_a", "id_b", "hamming"])
        verified = _sort_pairs(verified)
    return verified, (sigs if keep_signatures else None)


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
        from .similarity import _vec_matrix

        vecs = _vec_matrix(batch.column(vec_col))
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
        """r5: id-sorted members → one matmul → upper-triangle mask —
        the per-pair Python loop is gone (bucket size is corpus/2^planes,
        so the loop was an O(m²) row walk at scale)."""
        ids = np.asarray(g.column(id_col).to_pylist(), dtype=np.int64)
        from .similarity import _vec_matrix

        if ids.size < 2:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        vecs = _vec_matrix(g.column("vec"))[order]
        sims = vecs @ vecs.T
        iu, ju = np.triu_indices(ids.size, 1)
        vals = sims[iu, ju]
        keep = vals >= threshold
        return pa.table(
            {
                "id_a": pa.array(ids[iu[keep]], pa.int64()),
                "id_b": pa.array(ids[ju[keep]], pa.int64()),
                "cosine": pa.array(vals[keep], pa.float64()),
            }
        )

    out = collect_arrow(
        bucketed.groupby("bucket").map_groups(in_bucket_pairs, batch_format="pyarrow"),
        schema=pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()), ("cosine", pa.float64())]),
    )
    if out.num_rows:
        out = out.take(pc.sort_indices(out, sort_keys=[("id_a", "ascending"), ("id_b", "ascending")]))
    return out


def _prefix_block_keys(
    toks_ranked: list[str], threshold: float, hot: set
) -> list[str]:
    """Blocking keys for one doc's rank-sorted token set (PPJoin prefix
    filter with degenerate-bucket splitting).

    Base guarantee: any pair with Jaccard ≥ t shares a token in their
    length-p prefixes, p = |T| − ⌈t·|T|⌉ + 1 (|A∩B| ≥ ⌈t·|A|⌉ for a
    valid pair, so the prefix past which only α−1 elements remain must
    intersect). Cold prefix token w → single key ``1␀w``.

    Degenerate-bucket split (hot w, DF > cap): the 2-overlap extension
    of the prefix lemma — |A∩B| ≥ α implies the length-(|T|−α+2)
    prefixes share ≥ 2 tokens — means a valid pair sharing a hot prefix
    token w also shares a SECOND token x in both extended (p+1)
    prefixes. Emitting pair keys ``2␀w␀x`` for every x in the extended
    prefix therefore covers every such pair while fanning the one huge
    w-bucket out over the varying second tokens (the PPJoin-literature
    degenerate-bucket refinement, exactness preserved). Docs with a
    single token have no second token to split on and keep the single
    key (their bucket holds only identical one-token sets)."""
    n = len(toks_ranked)
    import math

    p = n - math.ceil(threshold * n) + 1
    ext = toks_ranked[: p + 1]
    keys: list[str] = []
    for w in toks_ranked[:p]:
        if w not in hot or len(ext) < 2:
            keys.append("1\x00" + w)
        else:
            keys.extend("2\x00" + w + "\x00" + x for x in ext if x != w)
    return keys


def _prefix_keys_via_join(
    ds: Dataset,
    text_col: str,
    id_col: str,
    merged_df: pa.Table,
    threshold: float,
    hot_ref,
    tokens_of,
) -> Dataset:
    """Scale path for the PPJoin global token order when the vocabulary
    exceeds the broadcast limit: ship the rank as DATA. Explode docs to
    (doc, token, ntok) rows, join the distributed (token, rank) table on
    the token, regroup by doc and emit the blocking keys inside the
    group — two narrow shuffles instead of a vocabulary-sized ray.put.
    Output is identical to the broadcast path (tested)."""
    import pyarrow.compute as pc
    import ray.data as rd

    order = pc.sort_indices(
        merged_df, sort_keys=[("n_sum", "ascending"), ("tok", "ascending")]
    )
    rank_tbl = pa.table(
        {
            "tok": merged_df.column("tok").take(order),
            "rank": pa.array(range(merged_df.num_rows), pa.int64()),
        }
    )
    rank_ds = rd.from_arrow(rank_tbl)

    def explode(batch: pa.Table) -> pa.Table:
        out_id, out_tok, out_n = [], [], []
        for i, t in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            toks = tokens_of(t)
            for tok in toks:
                out_id.append(i)
                out_tok.append(tok)
                out_n.append(len(toks))
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "tok": pa.array(out_tok, pa.string()),
                "ntok": pa.array(out_n, pa.int64()),
            }
        )

    exploded = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow"
    )
    with_rank = exploded.join(rank_ds, "inner", 4, on=("tok",))

    def emit_keys_all(t: pa.Table) -> pa.Table:
        """r5 across-doc key emission over (doc, rank)-sorted rows —
        the _prefix_block_keys semantics (prefix lemma + hot-token
        2-key split) computed for EVERY doc of the block at once:
        per-run prefix/extended masks from index arithmetic, hot
        membership via one pc.is_in, the 2-key fan-out via repeat
        offsets, and each doc's int32 rank payload sliced zero-copy
        out of the block's contiguous rank buffer. No per-doc Python
        dispatch (doc count is input-proportional)."""
        import math

        empty = pa.table(
            {
                "bkey": pa.array([], pa.string()),
                id_col: pa.array([], pa.int64()),
                "ntok": pa.array([], pa.int64()),
                "ranks": pa.array([], pa.binary()),
            }
        )
        if t.num_rows == 0:
            return empty
        ht = ray.get(hot_ref)
        did = t.column(id_col).to_numpy(zero_copy_only=False)
        ranks = (
            t.column("rank").to_numpy(zero_copy_only=False).astype("<i4")
        )
        ntok = t.column("ntok").to_numpy(zero_copy_only=False)
        toks = pc.cast(t.column("tok"), pa.string()).combine_chunks()
        n = did.size
        starts = np.flatnonzero(np.r_[True, did[1:] != did[:-1]])
        runlens = np.diff(np.r_[starts, n])
        within = np.arange(n, dtype=np.int64) - np.repeat(starts, runlens)
        nt = ntok[starts].astype(np.int64)
        p = nt - np.ceil(threshold * nt).astype(np.int64) + 1
        p_row = np.repeat(p, runlens)
        ext_len = np.minimum(p + 1, runlens)
        ext_row = np.repeat(ext_len, runlens)
        in_prefix = within < p_row
        if ht:
            is_hot = pc.is_in(
                toks, value_set=pa.array(sorted(ht), pa.string())
            ).to_numpy(zero_copy_only=False)
        else:
            is_hot = np.zeros(n, bool)
        cold_mask = in_prefix & (~is_hot | (ext_row < 2))
        hot_mask = in_prefix & is_hot & (ext_row >= 2)
        gi = np.repeat(np.arange(starts.size, dtype=np.int64), runlens)
        # per-doc payload: binary array whose offsets slice the block's
        # contiguous little-endian int32 rank buffer
        off_np = (np.r_[starts, n] * 4).astype(np.int32)
        payload = pa.Array.from_buffers(
            pa.binary(),
            int(starts.size),
            [None, pa.py_buffer(off_np.tobytes()), pa.py_buffer(ranks.tobytes())],
        )
        out_key, out_row = [], []
        cold_idx = np.flatnonzero(cold_mask)
        if cold_idx.size:
            ck = pc.binary_join_element_wise(
                pa.scalar("1"), toks.take(pa.array(cold_idx)), "\x00"
            )
            out_key.append(ck)
            out_row.append(cold_idx)
        hidx = np.flatnonzero(hot_mask)
        if hidx.size:
            e = ext_row[hidx]
            tot = int(e.sum())
            ia = np.repeat(hidx, e)
            base = np.repeat(starts[gi[hidx]], e)
            ofs = np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(e) - e, e)
            jb = base + ofs
            keep = jb != ia  # x != w (tokens are distinct within a doc)
            ia, jb = ia[keep], jb[keep]
            hk = pc.binary_join_element_wise(
                pa.scalar("2"),
                toks.take(pa.array(ia)),
                toks.take(pa.array(jb)),
                "\x00",
            )
            out_key.append(hk)
            out_row.append(ia)
        if not out_key:
            return empty
        rows = np.concatenate(out_row)
        keys = pa.concat_arrays([k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k for k in out_key])
        return pa.table(
            {
                "bkey": pc.cast(keys, pa.string()),
                id_col: pa.array(did[rows], pa.int64()),
                "ntok": pa.array(ntok[rows].astype(np.int64), pa.int64()),
                "ranks": payload.take(pa.array(gi[rows])),
            }
        )

    from ..util import sorted_group_apply

    return sorted_group_apply(with_rank, id_col, ["rank"], emit_keys_all)


def token_jaccard_pipeline(
    ds: Dataset,
    text_col: str,
    id_col: str,
    threshold: float = 0.9,
    bucket_cap: int = 2000,
    broadcast_rank_limit: int = 2_000_000,
) -> pa.Table:
    """EXACT token-set Jaccard similarity self-join (n-gram Jaccard with
    n=1, SQL-checkable) via prefix filtering (PPJoin-style):

    1. global token document-frequency via per-block combiner partials
       (rare-token ordering maximizes pruning); the global token order
       is broadcast as a rank map when the vocabulary fits
       (≤ ``broadcast_rank_limit`` terms) and otherwise JOINED on the
       token (explode → join rank table → regroup by doc) — the
       open-web-vocabulary scale path, identical output;
    2. each doc emits blocking keys from its ⌊(1−t)·|T|⌋+1 rarest
       tokens — any pair with Jaccard ≥ t provably shares one; tokens
       whose DF exceeds ``bucket_cap`` (degenerate buckets — one shared
       rare token covering most of a templated corpus) are split by the
       SECOND shared prefix token (see _prefix_block_keys; exactness
       preserved by the 2-overlap prefix lemma);
    3. candidate pairs emitted inside the distributed key-bucket
       groupby, pair-distincted with a second narrow groupby, joined
       back to the texts (a/b sides) and verified with exact set
       Jaccard in ``map_batches`` — no driver-side bucket dict or
       broadcast id→token-set map.

    Token normalization matches DuckDB's
    ``list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))``.
    ``bucket_cap`` bounds per-task bucket work; buckets that stay over
    the cap even after the hot-token split (tiny-vocabulary corpora
    whose true near-dup output is itself quadratic in cluster sizes)
    are chunk-split deterministically and emitted across the cluster
    (_bucket_candidate_pairs) — never truncated, never raising. Inside
    every bucket the exact PPJoin length filter prunes before pair
    emission, vectorized (no Python pair loop).
    """

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
    # hot = degenerate-bucket tokens (DF alone can over-cap the bucket);
    # the hot SET is tiny by construction (≤ total_tokens / cap entries)
    import pyarrow.compute as pc

    hot = set(
        merged.filter(pc.greater(merged.column("n_sum"), bucket_cap))
        .column("tok").to_pylist()
    )
    hot_ref = ray.put(hot)

    if merged.num_rows <= broadcast_rank_limit:
        # vocabulary fits: broadcast the global (DF, token) rank order
        freq = dict(
            zip(merged.column("tok").to_pylist(), merged.column("n_sum").to_pylist())
        )
        rank = {t: i for i, (f, t) in enumerate(sorted((f, t) for t, f in freq.items()))}
        rank_ref = ray.put(rank)

        def prefix_keys(batch: pa.Table) -> pa.Table:
            rk = ray.get(rank_ref)
            ht = ray.get(hot_ref)
            out_key, out_id, out_n, out_pl = [], [], [], []
            for i, t in zip(
                batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
            ):
                toks = tokens_of(t)
                if not toks:
                    continue
                ranked = sorted(toks, key=lambda x: rk[x])
                # the doc's token set as sorted int32 vocabulary ranks,
                # binary-packed — rides each key row so the owning
                # bucket can verify EXACT Jaccard without a text join
                pl = np.sort(
                    np.array([rk[x] for x in ranked], dtype=np.int32)
                ).tobytes()
                for key in _prefix_block_keys(ranked, threshold, ht):
                    out_key.append(key)
                    out_id.append(i)
                    out_n.append(len(toks))
                    out_pl.append(pl)
            return pa.table(
                {
                    "bkey": pa.array(out_key, pa.string()),
                    id_col: pa.array(out_id, pa.int64()),
                    "ntok": pa.array(out_n, pa.int64()),
                    "ranks": pa.array(out_pl, pa.binary()),
                }
            )

        key_rows = ds.select_columns([id_col, text_col]).map_batches(
            prefix_keys, batch_format="pyarrow"
        )
    else:
        # open-web vocabulary: the rank map cannot ride ray.put — JOIN
        # the exploded (doc, token) rows against the distributed rank
        # table on the token, regroup by doc, emit keys in the group
        key_rows = _prefix_keys_via_join(
            ds, text_col, id_col, merged, threshold, hot_ref, tokens_of
        )

    # pair emission + EXACT in-bucket Jaccard verification in one
    # distributed pass (over-cap buckets split deterministically, never
    # raising); only verified — output-sized — pairs leave the buckets
    verified = collect_arrow(
        _bucket_candidate_pairs(
            key_rows, ["bkey"], id_col, bucket_cap,
            len_col="ntok", len_ratio=threshold,
            payload_col="ranks", verify_threshold=threshold,
        ),
        schema=pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())]),
    )
    # distinct the (≤ prefix-length-fold duplicated) verified pairs at
    # the driver edge — output-sized by construction
    if verified.num_rows:
        verified = verified.group_by(["id_a", "id_b"]).aggregate([])
    return _sort_pairs(verified)


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
        # metadata-only count on the parquet-backed corpus read
        dense_rows=ds.count(),
    )
    return pairs


# ---------------------------------------------------------------------------
# incremental dedup against a frozen on-disk band index
# ---------------------------------------------------------------------------


def _band_payload_rows(
    ds: Dataset,
    text_col: str,
    id_col: str,
    num_perm: int,
    bands: int,
    shingle_k: int,
) -> Dataset:
    """MinHash band rows that also carry each doc's packed shingle-hash
    payload (sorted uint64 bytes), so exact Jaccard verification can
    happen wherever the band rows land — no text join, no second read
    of the source corpus. Payload rides every band row (×bands index
    amplification, documented trade: probe-time verification touches
    nothing but the index)."""
    rows_per_band = num_perm // bands
    a, b = _minhash_params(num_perm)
    a_ref, b_ref = ray.put(a), ray.put(b)

    def kernel(batch: pa.Table) -> pa.Table:
        aa, bb = ray.get(a_ref), ray.get(b_ref)
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        # r5: batched signatures (one doc-chunked numpy pass, see
        # _batch_signatures); payload stays the sorted-unique shingle
        # array bytes — identical to the old per-doc set→sort form
        keep, arrs, sigs = _batch_signatures(texts, shingle_k, aa, bb)
        out = {"id": [], "band": [], "band_hash": [], "slen": [], "payload": []}
        for row, i in enumerate(keep):
            payload = arrs[row].tobytes()
            slen = int(arrs[row].size)
            sig = sigs[row]
            for band in range(bands):
                seg = sig[band * rows_per_band : (band + 1) * rows_per_band]
                out["id"].append(ids[i])
                out["band"].append(band)
                out["band_hash"].append(_stable_hash64(seg.tobytes()))
                out["slen"].append(slen)
                out["payload"].append(payload)
        return pa.table(
            {
                "id": pa.array(out["id"], pa.int64()),
                "band": pa.array(out["band"], pa.int32()),
                "band_hash": pa.array(out["band_hash"], pa.int64()),
                "slen": pa.array(out["slen"], pa.int32()),
                "payload": pa.array(out["payload"], pa.binary()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow"
    )


def build_minhash_index(
    ds: Dataset,
    text_col: str,
    id_col: str,
    index_dir: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    num_buckets: int = 8,
) -> dict:
    """Freeze a corpus' MinHash band rows as a (band, bucket)-partitioned
    on-disk index — the INCREMENTAL dedup shape: each later crawl wave
    is deduped against the full history by probing only the index
    partitions its own band hashes touch, never recomputing or even
    rereading the historical corpus. One narrow shuffle
    (``groupby(band, bucket)``) writes one parquet file per partition
    (the build_ivf_index layout; same shared-FS contract as
    EngineConfig.checkpoint_dir on a multi-node cluster).

    Returns {"dir", "params", "manifest": {(band, bucket): rows}}."""
    import json
    import os

    import pyarrow.parquet as pq

    os.makedirs(index_dir, exist_ok=True)
    rows = _band_payload_rows(ds, text_col, id_col, num_perm, bands, shingle_k)

    def add_bucket(batch: pa.Table) -> pa.Table:
        bh = batch.column("band_hash").to_numpy()
        return batch.append_column(
            "bucket", pa.array((bh % num_buckets).astype(np.int32), pa.int32())
        )

    def write_part(g: pa.Table) -> pa.Table:
        band = g.column("band")[0].as_py()
        bucket = g.column("bucket")[0].as_py()
        atomic_write_parquet(
            g.drop_columns(["bucket"]),
            os.path.join(index_dir, f"band={band:02d}_bucket={bucket:02d}.parquet"),
        )
        return pa.table(
            {
                "band": pa.array([band], pa.int32()),
                "bucket": pa.array([bucket], pa.int32()),
                "rows": pa.array([g.num_rows], pa.int64()),
            }
        )

    manifest_tbl = collect_arrow(
        rows.map_batches(add_bucket, batch_format="pyarrow")
        .groupby(["band", "bucket"])
        .map_groups(write_part, batch_format="pyarrow"),
        schema=pa.schema(
            [("band", pa.int32()), ("bucket", pa.int32()), ("rows", pa.int64())]
        ),
    )
    manifest = {
        (b, k): r
        for b, k, r in zip(
            manifest_tbl.column("band").to_pylist(),
            manifest_tbl.column("bucket").to_pylist(),
            manifest_tbl.column("rows").to_pylist(),
        )
    }
    params = {
        "num_perm": num_perm,
        "bands": bands,
        "shingle_k": shingle_k,
        "num_buckets": num_buckets,
    }
    with open(os.path.join(index_dir, "manifest.json"), "w") as f:
        json.dump(
            {"params": params, "rows": {f"{b}:{k}": r for (b, k), r in manifest.items()}},
            f,
        )
    return {"dir": index_dir, "params": params, "manifest": manifest}


def dedup_against_minhash_index(
    ds_new: Dataset,
    index_dir: str,
    jaccard_threshold: float = 0.5,
    max_candidates: int = 5_000_000,
    scan_stats: dict | None = None,
) -> pa.Table:
    """Dedup NEW documents against a frozen build_minhash_index: compute
    the new docs' band rows, read ONLY the index partitions whose
    (band, bucket) the new hashes touch (partition pruning — the scan
    fraction is logged and returned via ``scan_stats``), inner-join on
    (band, band_hash), and verify exact set-Jaccard from the packed
    payloads riding both sides. Only cross pairs (history × new) are
    emitted; new-vs-new dedup is minhash_pipeline's job on the wave
    itself. Returns pa.Table(id_a=history, id_b=new, jaccard),
    distinct, sorted."""
    import glob
    import json
    import os

    import ray.data as rd

    with open(os.path.join(index_dir, "manifest.json")) as f:
        meta = json.load(f)
    p = meta["params"]
    new_rows = collect_arrow(
        _band_payload_rows(
            ds_new, "text", "id", p["num_perm"], p["bands"], p["shingle_k"]
        ).map_batches(
            lambda b: b.rename_columns(["nid", "band", "band_hash", "nslen", "npayload"]),
            batch_format="pyarrow",
        )
    )
    if new_rows.num_rows == 0:
        return pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    touched = sorted(
        set(
            zip(
                new_rows.column("band").to_pylist(),
                (
                    new_rows.column("band_hash").to_numpy() % p["num_buckets"]
                ).tolist(),
            )
        )
    )
    all_files = sorted(glob.glob(os.path.join(index_dir, "band=*_bucket=*.parquet")))
    want = {f"band={b:02d}_bucket={k:02d}.parquet" for b, k in touched}
    files = [f for f in all_files if os.path.basename(f) in want]
    frac = len(files) / max(1, len(all_files))
    if scan_stats is not None:
        scan_stats["files_read"] = len(files)
        scan_stats["files_total"] = len(all_files)
        scan_stats["scan_fraction"] = frac
    if not files:
        return pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    # Size-gated dense join (BASELINE.md): the touched partitions and
    # the new-wave band rows are both probe-sized, so below the gate
    # read them with pyarrow and hash-join driver-side (Acero) — the
    # distributed Dataset.join's fixed exchange overhead dominates at
    # this size. Above the gate the distributed join runs unchanged.
    import pyarrow.parquet as _pqt

    hist_rows = sum(_pqt.read_metadata(f).num_rows for f in files)
    if hist_rows + new_rows.num_rows <= 4_000_000:
        hist_t = pa.concat_tables([_pqt.read_table(f) for f in files])
        cand = rd.from_arrow(
            hist_t.join(
                new_rows, keys=["band", "band_hash"], join_type="inner"
            )
        )
        n_cand = cand.count()
    else:
        hist = rd.read_parquet(files)
        cand = hist.join(
            rd.from_arrow(new_rows),
            "inner",
            4,
            on=("band", "band_hash"),
            right_on=("band", "band_hash"),
        ).materialize()
        n_cand = cand.count()
    if n_cand > max_candidates:
        raise ValueError(
            f"incremental dedup candidate explosion: {n_cand} > {max_candidates} "
            "(degenerate band bucket — raise num_buckets or split the band)"
        )

    def verify(batch: pa.Table) -> pa.Table:
        ia = batch.column("id").to_pylist()
        ib = batch.column("nid").to_pylist()
        pa_ = batch.column("payload").to_pylist()
        pb_ = batch.column("npayload").to_pylist()
        out_a, out_b, out_j = [], [], []
        for a_id, b_id, ap, bp in zip(ia, ib, pa_, pb_):
            if a_id == b_id:
                continue
            sa = np.frombuffer(ap, dtype=np.uint64)
            sb = np.frombuffer(bp, dtype=np.uint64)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            if union and inter / union >= jaccard_threshold:
                out_a.append(a_id)
                out_b.append(b_id)
                out_j.append(inter / union)
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    verified = collect_arrow(
        cand.map_batches(verify, batch_format="pyarrow"),
        schema=pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()), ("jaccard", pa.float64())]
        ),
    )
    # distinct (a pair collides in ≤ bands bands) — output-sized
    key = np.stack(
        [verified.column("id_a").to_numpy(), verified.column("id_b").to_numpy()], axis=1
    )
    _, first = np.unique(key, axis=0, return_index=True)
    out = verified.take(pa.array(np.sort(first)))
    return out.take(
        pc.sort_indices(
            out, sort_keys=[("id_a", "ascending"), ("id_b", "ascending")]
        )
    )


def extend_minhash_index(
    ds_new: Dataset,
    text_col: str,
    id_col: str,
    index_dir: str,
    scan_stats: dict | None = None,
) -> dict:
    """Append a new wave to a frozen ``build_minhash_index`` — the
    wave-N+1 production loop: after ``dedup_against_minhash_index``
    reports the wave's cross-dups, the SURVIVING docs join the history
    so wave N+2 sees them. Computes the wave's band rows and rewrites
    ONLY the (band, bucket) partitions they land in (read existing
    partition + concat + atomic rewrite; untouched partitions are
    never opened — the touched fraction is reported via
    ``scan_stats``). Manifest is updated in place. Single-writer
    contract: one extend/evict at a time, same as checkpoint commits.

    Returns {"dir", "params", "manifest"} like build_minhash_index."""
    import json
    import os

    import pyarrow.parquet as pq

    with open(os.path.join(index_dir, "manifest.json")) as f:
        meta = json.load(f)
    p = meta["params"]
    rows = _band_payload_rows(
        ds_new, text_col, id_col, p["num_perm"], p["bands"], p["shingle_k"]
    )
    num_buckets = p["num_buckets"]

    def add_bucket(batch: pa.Table) -> pa.Table:
        bh = batch.column("band_hash").to_numpy()
        return batch.append_column(
            "bucket", pa.array((bh % num_buckets).astype(np.int32), pa.int32())
        )

    def merge_part(g: pa.Table) -> pa.Table:
        band = g.column("band")[0].as_py()
        bucket = g.column("bucket")[0].as_py()
        path = os.path.join(index_dir, f"band={band:02d}_bucket={bucket:02d}.parquet")
        fresh = g.drop_columns(["bucket"])
        if os.path.exists(path):
            fresh = pa.concat_tables([pq.read_table(path), fresh])
        # At-least-once hardening (ADVICE r4): Ray may re-execute this
        # task after its first attempt already published the file; the
        # retry then re-reads its own output and would append the
        # wave's rows twice. A doc has exactly one row per band, so
        # dedup on (id, band_hash) — keep='first' preserves the
        # already-persisted row — makes the rewrite idempotent.
        import pandas as pd

        dup = pd.DataFrame(
            {
                "id": fresh.column("id").to_pandas(),
                "bh": fresh.column("band_hash").to_pandas(),
            }
        ).duplicated().to_numpy()
        if dup.any():
            fresh = fresh.filter(pa.array(~dup))
        atomic_write_parquet(fresh, path)
        return pa.table(
            {
                "band": pa.array([band], pa.int32()),
                "bucket": pa.array([bucket], pa.int32()),
                "rows": pa.array([fresh.num_rows], pa.int64()),
            }
        )

    touched_tbl = collect_arrow(
        rows.map_batches(add_bucket, batch_format="pyarrow")
        .groupby(["band", "bucket"])
        .map_groups(merge_part, batch_format="pyarrow"),
        schema=pa.schema(
            [("band", pa.int32()), ("bucket", pa.int32()), ("rows", pa.int64())]
        ),
    )
    counts = {f"{b}:{k}": r for b, k, r in zip(
        touched_tbl.column("band").to_pylist(),
        touched_tbl.column("bucket").to_pylist(),
        touched_tbl.column("rows").to_pylist(),
    )}
    total = p["bands"] * num_buckets
    if scan_stats is not None:
        scan_stats["partitions_rewritten"] = len(counts)
        scan_stats["partitions_total"] = total
        scan_stats["rewrite_fraction"] = len(counts) / max(1, total)
    meta["rows"].update(counts)
    _atomic_write_json(meta, os.path.join(index_dir, "manifest.json"))
    manifest = {
        tuple(int(x) for x in key.split(":")): r for key, r in meta["rows"].items()
    }
    return {"dir": index_dir, "params": p, "manifest": manifest}


def evict_from_minhash_index(
    index_dir: str, ids, scan_stats: dict | None = None
) -> dict:
    """TTL eviction for the incremental index — the ``SeenShard.evict``
    analogue on the dedup side: drop every band row of ``ids`` so
    evicted (expired / recrawl-due) documents stop pairing, and the
    index's size stays flat under recrawl churn instead of growing
    monotonically. One distributed pass over the partition FILES: each
    task reads only the ``id`` column first (column pruning) and
    rewrites a partition only if it actually holds an evicted id;
    emptied partitions are deleted. Manifest updated in place; same
    single-writer contract as extend.

    Returns {"rows_removed", "partitions_rewritten", "partitions_total"}."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    with open(os.path.join(index_dir, "manifest.json")) as f:
        meta = json.load(f)
    evict = np.asarray(sorted({int(i) for i in ids}), dtype=np.int64)
    files = sorted(glob.glob(os.path.join(index_dir, "band=*_bucket=*.parquet")))
    if not files or evict.size == 0:
        return {
            "rows_removed": 0,
            "partitions_rewritten": 0,
            "partitions_total": len(files),
        }
    ev_ref = ray.put(evict)

    def rewrite(batch: pa.Table) -> pa.Table:
        ev = ray.get(ev_ref)
        out = {"name": [], "rows": [], "removed": []}
        for path in batch.column("path").to_pylist():
            idcol = pq.read_table(path, columns=["id"]).column("id").to_numpy()
            n_hit = int(np.isin(idcol, ev).sum())
            if n_hit == 0:
                continue
            t = pq.read_table(path)
            keep = ~np.isin(t.column("id").to_numpy(), ev)
            kept = t.filter(pa.array(keep))
            if kept.num_rows:
                atomic_write_parquet(kept, path)
            else:
                os.remove(path)
            out["name"].append(os.path.basename(path))
            out["rows"].append(kept.num_rows)
            out["removed"].append(n_hit)
        return pa.table(
            {
                "name": pa.array(out["name"], pa.string()),
                "rows": pa.array(out["rows"], pa.int64()),
                "removed": pa.array(out["removed"], pa.int64()),
            }
        )

    stats = collect_arrow(
        rd.from_items([{"path": f} for f in files]).map_batches(
            rewrite, batch_format="pyarrow"
        ),
        schema=pa.schema(
            [("name", pa.string()), ("rows", pa.int64()), ("removed", pa.int64())]
        ),
    )
    removed = 0
    rewritten = 0
    for name, rows_left, n_rm in zip(
        stats.column("name").to_pylist(),
        stats.column("rows").to_pylist(),
        stats.column("removed").to_pylist(),
    ):
        band, bucket = (
            int(name.split("=")[1][:2]),
            int(name.split("=")[2].split(".")[0]),
        )
        key = f"{band}:{bucket}"
        removed += n_rm
        rewritten += 1
        if rows_left:
            meta["rows"][key] = rows_left
        else:
            meta["rows"].pop(key, None)
    _atomic_write_json(meta, os.path.join(index_dir, "manifest.json"))
    out = {
        "rows_removed": removed,
        "partitions_rewritten": rewritten,
        "partitions_total": len(files),
    }
    if scan_stats is not None:
        scan_stats.update(out)
    return out


def _atomic_write_json(obj, path: str) -> None:
    import json
    import os

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def build_hamming_index(
    ds: Dataset,
    sig_col: str,
    id_col: str,
    index_dir: str,
    bands: int = 8,
    num_buckets: int = 8,
) -> dict:
    """Freeze a corpus' 64-bit signatures (phash / SimHash) as a
    (band, bucket)-partitioned on-disk Hamming index — the image-side
    twin of build_minhash_index for INCREMENTAL near-dup detection:
    later waves probe only the partitions their own band values touch.
    Much lighter than the text index: the 8-byte signature IS the
    verification payload, so rows are ~30 B and verification is a
    vectorized xor-popcount. Total recall for any probe threshold
    < bands (pigeonhole). Ids are strings (image_id)."""
    import json
    import os

    import pyarrow.parquet as pq

    os.makedirs(index_dir, exist_ok=True)
    band_bits = 64 // bands

    def band_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch.column(id_col).combine_chunks()
        uh = (
            pc.cast(pc.coalesce(batch.column(sig_col), pa.scalar(0, pa.int64())), pa.int64())
            .to_numpy(zero_copy_only=False)
            .view(np.uint64)
        )
        rep = np.repeat(np.arange(n, dtype=np.int64), bands)
        band = np.tile(np.arange(bands, dtype=np.int32), n)
        shifts = band.astype(np.uint64) * np.uint64(band_bits)
        mask = np.uint64((1 << band_bits) - 1)
        vals = ((uh[rep] >> shifts) & mask).astype(np.int64)
        bucket = (vals % num_buckets).astype(np.int32)
        return pa.table(
            {
                "id": ids.take(pa.array(rep)),
                "band": pa.array(band),
                "band_val": pa.array(vals),
                "sig": pa.array(uh[rep].view(np.int64)),
                "bucket": pa.array(bucket),
            }
        )

    def write_part(g: pa.Table) -> pa.Table:
        band = g.column("band")[0].as_py()
        bucket = g.column("bucket")[0].as_py()
        atomic_write_parquet(
            g.drop_columns(["bucket"]),
            os.path.join(index_dir, f"band={band:02d}_bucket={bucket:02d}.parquet"),
        )
        return pa.table(
            {
                "band": pa.array([band], pa.int32()),
                "bucket": pa.array([bucket], pa.int32()),
                "rows": pa.array([g.num_rows], pa.int64()),
            }
        )

    manifest_tbl = collect_arrow(
        ds.select_columns([id_col, sig_col])
        .map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "bucket"])
        .map_groups(write_part, batch_format="pyarrow"),
        schema=pa.schema(
            [("band", pa.int32()), ("bucket", pa.int32()), ("rows", pa.int64())]
        ),
    )
    params = {"bands": bands, "num_buckets": num_buckets, "band_bits": band_bits}
    with open(os.path.join(index_dir, "manifest.json"), "w") as f:
        json.dump(
            {
                "params": params,
                "rows": {
                    f"{b}:{k}": r
                    for b, k, r in zip(
                        manifest_tbl.column("band").to_pylist(),
                        manifest_tbl.column("bucket").to_pylist(),
                        manifest_tbl.column("rows").to_pylist(),
                    )
                },
            },
            f,
        )
    return {"dir": index_dir, "params": params}


def dedup_against_hamming_index(
    ds_new: Dataset,
    sig_col: str,
    id_col: str,
    index_dir: str,
    hamming_threshold: int = 4,
    scan_stats: dict | None = None,
) -> pa.Table:
    """Probe a frozen build_hamming_index with new signatures: band the
    new rows, read ONLY touched (band, bucket) partitions, inner-join
    on (band, band_val) and verify Hamming with one vectorized
    xor-popcount over the joined signature columns (no per-row Python).
    Cross pairs only: (id_a = history, id_b = new, hamming). Exact for
    hamming_threshold < bands (total banding recall)."""
    import glob
    import json
    import os

    import ray.data as rd

    with open(os.path.join(index_dir, "manifest.json")) as f:
        meta = json.load(f)
    p = meta["params"]
    bands, band_bits = p["bands"], p["band_bits"]
    if hamming_threshold >= bands:
        raise ValueError("threshold must be < bands for total recall")

    def band_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch.column(id_col).combine_chunks()
        uh = (
            pc.cast(pc.coalesce(batch.column(sig_col), pa.scalar(0, pa.int64())), pa.int64())
            .to_numpy(zero_copy_only=False)
            .view(np.uint64)
        )
        rep = np.repeat(np.arange(n, dtype=np.int64), bands)
        band = np.tile(np.arange(bands, dtype=np.int32), n)
        shifts = band.astype(np.uint64) * np.uint64(band_bits)
        mask = np.uint64((1 << band_bits) - 1)
        vals = ((uh[rep] >> shifts) & mask).astype(np.int64)
        return pa.table(
            {
                "nid": ids.take(pa.array(rep)),
                "band": pa.array(band),
                "band_val": pa.array(vals),
                "nsig": pa.array(uh[rep].view(np.int64)),
            }
        )

    new_rows = collect_arrow(
        ds_new.select_columns([id_col, sig_col]).map_batches(
            band_rows, batch_format="pyarrow"
        )
    )
    empty = pa.table(
        {
            "id_a": pa.array([], pa.string()),
            "id_b": pa.array([], pa.string()),
            "hamming": pa.array([], pa.int32()),
        }
    )
    if new_rows.num_rows == 0:
        return empty
    touched = sorted(
        set(
            zip(
                new_rows.column("band").to_pylist(),
                (new_rows.column("band_val").to_numpy() % p["num_buckets"]).tolist(),
            )
        )
    )
    all_files = sorted(glob.glob(os.path.join(index_dir, "band=*_bucket=*.parquet")))
    want = {f"band={b:02d}_bucket={k:02d}.parquet" for b, k in touched}
    files = [f for f in all_files if os.path.basename(f) in want]
    if scan_stats is not None:
        scan_stats["files_read"] = len(files)
        scan_stats["files_total"] = len(all_files)
        scan_stats["scan_fraction"] = len(files) / max(1, len(all_files))
    if not files:
        return empty
    cand = rd.read_parquet(files).join(
        rd.from_arrow(new_rows),
        "inner",
        4,
        on=("band", "band_val"),
        right_on=("band", "band_val"),
    )

    def verify_pairs(batch: pa.Table) -> pa.Table:
        from .similarity import _POP8

        a = batch.column("sig").to_numpy().view(np.uint64)
        b = batch.column("nsig").to_numpy().view(np.uint64)
        x = np.ascontiguousarray(a ^ b)
        d = _POP8[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1, dtype=np.int32)
        ids_a = batch.column("id").to_numpy(zero_copy_only=False)
        ids_b = batch.column("nid").to_numpy(zero_copy_only=False)
        keep = (d <= hamming_threshold) & (ids_a != ids_b)
        return pa.table(
            {
                "id_a": pa.array(ids_a[keep].tolist(), pa.string()),
                "id_b": pa.array(ids_b[keep].tolist(), pa.string()),
                "hamming": pa.array(d[keep], pa.int32()),
            }
        )

    verified = collect_arrow(
        cand.map_batches(verify_pairs, batch_format="pyarrow"),
        schema=pa.schema(
            [("id_a", pa.string()), ("id_b", pa.string()), ("hamming", pa.int32())]
        ),
    )
    key = np.char.add(
        np.char.add(verified.column("id_a").to_numpy(zero_copy_only=False).astype(str), "|"),
        verified.column("id_b").to_numpy(zero_copy_only=False).astype(str),
    )
    _, first = np.unique(key, return_index=True)
    out = verified.take(pa.array(np.sort(first)))
    return out.take(
        pc.sort_indices(out, sort_keys=[("id_a", "ascending"), ("id_b", "ascending")])
    )
