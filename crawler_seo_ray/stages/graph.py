"""Distributed graph analytics over edge Datasets: PageRank and
triangle counting.

Same iterative join+groupby shape as
``dedup.connected_components_distributed`` (the repo's other fixed-point
graph operator): each round is one hash join (edges ⋈ ranks on src) and
one groupby-sum (contributions by dst) — both all-to-all exchanges over
EDGE-sized data, never node adjacency materialized on the driver. The
driver holds only scalars (N, dangling mass).

Semantics (public, classic damped power iteration):
rank' = (1−d)/N + d·(Σ in-contributions + dangling/N), where dangling
is the total rank of nodes with out-degree 0, redistributed uniformly.
Duplicate edges are kept (legitimate weight); the ITERATION COUNT is
fixed so the distributed run and the dense-numpy reference used in
tests execute the same number of rounds. Deterministic up to float
summation order inside the groupby (tests use an epsilon).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from ..util import collect_arrow, drop_empty_blocks, sorted_agg_by_key


def _pagerank_dense(et: pa.Table, damping: float, iterations: int) -> pa.Table:
    """Driver-side vectorized loop over a collected edge table — the
    identical recurrence the distributed rounds compute (np.add.at in
    place of the groupby-sum; summation order differs only within IEEE
    rounding)."""
    import numpy as np

    if et.num_rows == 0:
        return pa.table(
            {"id": pa.array([], pa.string()), "rank": pa.array([], pa.float64())}
        )
    src = np.asarray(et.column("src").to_pylist(), dtype=object)
    dst = np.asarray(et.column("dst").to_pylist(), dtype=object)
    univ, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    src_i, dst_i = inv[: len(src)], inv[len(src):]
    n = len(univ)
    deg = np.bincount(src_i, minlength=n).astype(np.float64)
    out_deg = np.where(deg > 0, deg, 1.0)
    r = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n
    for _ in range(iterations):
        dang = r[deg == 0].sum()
        nxt = np.zeros(n)
        np.add.at(nxt, dst_i, r[src_i] / out_deg[src_i])
        r = base + damping * (nxt + dang / n)
    out = pa.table({"id": pa.array(univ.tolist()), "rank": pa.array(r, pa.float64())})
    return out.take(
        pc.sort_indices(out, sort_keys=[("rank", "descending"), ("id", "ascending")])
    )


def pagerank(
    edges: Dataset,
    damping: float = 0.85,
    iterations: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 8,
    driver_edge_limit: int = 1_000_000,
) -> pa.Table:
    """Rank every node appearing in ``edges`` (either endpoint).

    Returns a pa.Table(id, rank) sorted by rank desc — node-count-sized,
    which IS the operator's output (consumed as a top-k or a broadcast
    priority side downstream).

    Path selection (the df_broadcast_limit pattern): a graph whose edge
    list fits the driver (≤ ``driver_edge_limit`` edges) runs the same
    recurrence as one vectorized numpy loop — each distributed round
    costs several whole Dataset executions of fixed overhead, which for
    a subgraph-sized input is pure waste. Past the limit, every
    per-round state stays in the object store as edge-/node-sized
    Datasets (tests pin both paths to the same ranks)."""
    edges = edges.map_batches(
        lambda b: pa.table({"src": b.column(src_col), "dst": b.column(dst_col)}),
        batch_format="pyarrow",
    ).materialize()

    if edges.count() <= driver_edge_limit:
        return _pagerank_dense(collect_arrow(edges), damping, iterations)

    # node universe = src nodes (with out-degree) ∪ dst-only nodes (deg 0)
    deg = drop_empty_blocks(
        sorted_agg_by_key(edges, "src", [(None, "count", "deg")])
    )
    dsts = drop_empty_blocks(
        sorted_agg_by_key(edges, "dst", [(None, "count", "_n")])
    ).map_batches(
        lambda b: pa.table({"src": b.column("dst")}), batch_format="pyarrow"
    )
    dst_only = drop_empty_blocks(
        dsts.join(deg, "left_anti", num_partitions, on=("src",))
    ).map_batches(
        lambda b: pa.table(
            {"id": b.column("src"),
             "deg": pa.array([0] * b.num_rows, pa.int64())}
        ),
        batch_format="pyarrow",
    )
    nodes = deg.map_batches(
        lambda b: pa.table({"id": b.column("src"), "deg": b.column("deg")}),
        batch_format="pyarrow",
    ).union(dst_only).materialize()

    n = nodes.count()
    if n == 0:
        return pa.table(
            {"id": pa.array([], pa.string()), "rank": pa.array([], pa.float64())}
        )

    init = 1.0 / n
    ranks = nodes.map_batches(
        lambda b: b.append_column(
            "rank", pa.array([init] * b.num_rows, pa.float64())
        ),
        batch_format="pyarrow",
    ).materialize()

    def dang_partial(b: pa.Table) -> pa.Table:
        m = pc.sum(
            pc.if_else(
                pc.equal(b.column("deg"), 0),
                b.column("rank"),
                pa.scalar(0.0, pa.float64()),
            )
        ).as_py()
        return pa.table({"m": pa.array([m or 0.0], pa.float64())})

    base = (1.0 - damping) / n
    for _ in range(iterations):
        # dangling mass: per-block partials → one tiny driver scalar
        dang = (
            ranks.map_batches(dang_partial, batch_format="pyarrow")
            .aggregate(Sum("m", alias_name="m"))["m"]
            or 0.0
        )

        contrib = edges.join(
            ranks, "inner", num_partitions, on=("src",), right_on=("id",)
        ).map_batches(
            lambda b: pa.table(
                {
                    "dst": b.column("dst"),
                    "c": pc.divide(
                        b.column("rank"), pc.cast(b.column("deg"), pa.float64())
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        summed = drop_empty_blocks(
            sorted_agg_by_key(contrib, "dst", [("c", "sum", "c")])
        )
        add = base + damping * (dang / n)
        ranks = nodes.join(
            summed, "left_outer", num_partitions, on=("id",), right_on=("dst",)
        ).map_batches(
            lambda b: pa.table(
                {
                    "id": b.column("id"),
                    "deg": b.column("deg"),
                    "rank": pc.add(
                        pc.multiply(
                            pc.coalesce(b.column("c"), pa.scalar(0.0, pa.float64())),
                            damping,
                        ),
                        add,
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    out = collect_arrow(ranks.select_columns(["id", "rank"]))
    return out.take(
        pc.sort_indices(out, sort_keys=[("rank", "descending"), ("id", "ascending")])
    )


def _triangles_dense(et: pa.Table) -> int:
    """Driver-side vectorized wedge check over a collected oriented
    edge table (columns p1 < p2): CSR successor lists, ragged-gather
    wedge expansion, packed-key membership — no Python loop."""
    import numpy as np

    if et.num_rows == 0:
        return 0
    a = et.column("p1").to_numpy(zero_copy_only=False)
    b = et.column("p2").to_numpy(zero_copy_only=False)
    univ, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ai, bi = inv[: len(a)].astype(np.int64), inv[len(a):].astype(np.int64)
    n = len(univ)
    # CSR of successors by first endpoint
    order = np.lexsort((bi, ai))
    ai, bi = ai[order], bi[order]
    out_deg = np.bincount(ai, minlength=n)
    start = np.concatenate(([0], np.cumsum(out_deg)))[:-1]
    # wedges (x→m→y): for every edge (x, m), fan out to succ(m).
    # Membership is searchsorted against the (already CSR-lexsorted)
    # packed edge keys — np.isin re-sorts wedges+edges together
    # (measured 87 s on 72 M wedges); binary search is ~20×. Wedge
    # buffers are built in bounded chunks so peak memory stays
    # ~8 M rows regardless of graph density.
    cnt = out_deg[bi]
    total = int(cnt.sum())
    if total == 0:
        return 0
    edge_keys = ai * n + bi  # lexsorted (ai, bi) ⇒ already ascending
    # (an O(1) dense bool membership table was measured 2–4× SLOWER
    # here — 72 M random reads into an n²-sized table thrash cache;
    # binary search over the 1.2 M sorted keys stays resident)
    cum = np.cumsum(cnt)
    tri = 0
    chunk_wedges = 8_000_000
    lo = 0
    while lo < len(ai):
        hi = int(np.searchsorted(cum, (cum[lo - 1] if lo else 0) + chunk_wedges))
        hi = max(hi, lo + 1)
        c = cnt[lo:hi]
        t = int(c.sum())
        if t:
            base = np.repeat(start[bi[lo:hi]], c)
            offs = np.arange(t, dtype=np.int64) - np.repeat(np.cumsum(c) - c, c)
            wy = bi[base + offs]
            wx = np.repeat(ai[lo:hi], c)
            keys = wx * n + wy
            pos = np.searchsorted(edge_keys, keys)
            pos = np.minimum(pos, len(edge_keys) - 1)
            tri += int((edge_keys[pos] == keys).sum())
        lo = hi
    return tri


def triangle_count(
    edges: Dataset,
    num_partitions: int = 8,
    driver_edge_limit: int = 4_000_000,
) -> int:
    """Count triangles in an oriented distinct edge Dataset (columns
    ``p1 < p2``; every triangle then appears as exactly one wedge
    a→b→c, a<b<c, closed by edge (a, c)).

    Distributed shape: one hash join builds the wedges (edges ⋈ edges
    on the middle vertex), one composite-key join closes them; only the
    count leaves the cluster. Degree-skewed graphs want the standard
    lower-(degree, id) orientation refinement to bound wedge fan-out at
    O(√m) per vertex. Below ``driver_edge_limit`` the same wedge check
    runs as one vectorized numpy pass (see _triangles_dense) — the two
    joins cost whole fixed-overhead Dataset executions, pure waste for
    a subgraph-sized edge list (the pagerank path-selection pattern)."""
    edges = edges.materialize()
    if edges.count() <= driver_edge_limit:
        return _triangles_dense(collect_arrow(edges))

    mid = edges.map_batches(
        lambda b: pa.table({"q1": b.column("p1"), "q2": b.column("p2")}),
        batch_format="pyarrow",
    )
    wedges = edges.join(
        mid, "inner", num_partitions, on=("p2",), right_on=("q1",)
    ).map_batches(
        lambda b: pa.table({"a": b.column("p1"), "c": b.column("q2")}),
        batch_format="pyarrow",
    )
    closing = edges.map_batches(
        lambda b: pa.table({"r1": b.column("p1"), "r2": b.column("p2")}),
        batch_format="pyarrow",
    )
    return wedges.join(
        closing, "inner", num_partitions, on=("a", "c"), right_on=("r1", "r2")
    ).count()


def _kcore_dense(et: pa.Table, k: int, max_rounds: int) -> pa.Table:
    """Driver-side vectorized peel over a collected SYMMETRIC edge
    table (src, dst): per round, one boolean mask finds under-degree
    vertices and one bincount decrements their incident edges — exactly
    the distributed rounds' semantics (v_i = deg ≥ k in e_{i-1};
    e_i = both endpoints kept), so the two paths are interchangeable."""
    import numpy as np

    empty = pa.table(
        {"part": pa.array([], pa.int64()), "degree": pa.array([], pa.int64())}
    )
    if et.num_rows == 0:
        return empty
    src = et.column("src").to_numpy(zero_copy_only=False)
    dst = et.column("dst").to_numpy(zero_copy_only=False)
    univ, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    si = inv[: len(src)].astype(np.int64)
    di = inv[len(src):].astype(np.int64)
    n = len(univ)
    alive_v = np.ones(n, dtype=bool)
    alive_e = np.ones(len(si), dtype=bool)
    deg = np.bincount(si, minlength=n)
    for _ in range(max_rounds):
        bad = alive_v & (deg < k)
        if not bad.any():
            break
        alive_v &= ~bad
        kill = alive_e & (bad[si] | bad[di])
        deg -= np.bincount(si[kill], minlength=n)
        alive_e &= ~kill
    keep = alive_v & (deg > 0)
    if not keep.any():
        return empty
    return pa.table(
        {
            "part": pa.array(univ[keep].astype(np.int64)),
            "degree": pa.array(deg[keep].astype(np.int64)),
        }
    )


def kcore(
    edges: Dataset,
    k: int,
    max_rounds: int,
    num_partitions: int = 8,
    driver_edge_limit: int = 4_000_000,
) -> Dataset:
    """Iterative k-core peel: repeatedly delete vertices whose degree
    in the remaining graph is < ``k`` until fixed point (or
    ``max_rounds`` peels), then return the surviving vertices with
    their in-core degree — the classic graph-densification filter
    (Matula & Beck 1983's peeling order, run level-synchronously).

    ``edges`` must be the SYMMETRIC distinct edge set (both directions
    present, no self-loops), so degree(v) = row count with src=v.

    Distributed shape — one narrow ``groupby(src).count`` plus two
    ``left_semi`` joins per round, every exchange edge- or
    vertex-sized over int64 columns; the driver holds only per-round
    vertex COUNTS for the convergence check. The edge set shrinks
    monotonically, so each round is cheaper than the last; a converged
    round (nothing peeled) short-circuits, making the fixed number of
    oracle-unrolled rounds and the early-exit loop give identical
    results whether or not the peel converges within ``max_rounds``.
    Survivors are re-materialized per round so later rounds don't
    re-execute the whole join chain.
    """

    def _degrees(e: Dataset) -> Dataset:
        return drop_empty_blocks(
            sorted_agg_by_key(e, "src", [(None, "count", "degree")])
        )

    empty = pa.table(
        {"part": pa.array([], pa.int64()), "degree": pa.array([], pa.int64())}
    )
    edges = edges.materialize()
    if edges.count() <= driver_edge_limit:
        # subgraph-sized edge list: 8 distributed rounds cost ~24 whole
        # Dataset executions of fixed overhead — the pagerank /
        # triangle_count dense-path selection pattern applies
        import ray.data as rd

        return rd.from_arrow(_kcore_dense(collect_arrow(edges), k, max_rounds))
    for _ in range(max_rounds):
        deg = _degrees(edges).materialize()
        n_vertices = deg.count()
        if n_vertices == 0:
            import ray.data as rd

            return rd.from_arrow(empty)
        keep = (
            drop_empty_blocks(deg.filter(expr=f"degree >= {k}"))
            .map_batches(
                lambda b: pa.table({"id": b.column("src")}), batch_format="pyarrow"
            )
            .materialize()
        )
        n_keep = keep.count()
        if n_keep == n_vertices:
            break  # fixed point: every survivor already meets the bar
        if n_keep == 0:
            # whole graph peeled — joining an all-empty right side would
            # hit the Ray 2.49 zero-column-block join abort
            import ray.data as rd

            return rd.from_arrow(empty)
        edges = drop_empty_blocks(
            drop_empty_blocks(
                edges.join(keep, "left_semi", num_partitions, on=("src",), right_on=("id",))
            ).join(keep, "left_semi", num_partitions, on=("dst",), right_on=("id",))
        ).materialize()
    final = _degrees(edges).materialize()
    if final.count() == 0:
        import ray.data as rd

        return rd.from_arrow(empty)
    return final.map_batches(
        lambda b: pa.table(
            {
                "part": pc.cast(b.column("src"), pa.int64()),
                "degree": pc.cast(b.column("degree"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def _bfs_dense(et: pa.Table, seed_ids, max_hops: int) -> pa.Table:
    """Driver-side vectorized level-synchronous BFS over a collected
    int64 edge table — identical visit set / min depths to the
    distributed rounds (same gate rationale as _kcore_dense: 3 rounds
    × 3 fixed-overhead exchanges are pure waste on a subgraph-sized
    edge list)."""
    import numpy as np

    seeds = np.unique(np.asarray(list(seed_ids), dtype=np.int64))
    if et.num_rows == 0:
        return pa.table(
            {
                "id": pa.array(seeds),
                "depth": pa.array(np.zeros(len(seeds), dtype=np.int64)),
            }
        )
    src = et.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    dst = et.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    univ = np.unique(np.concatenate([src, dst, seeds]))
    src_i = np.searchsorted(univ, src)
    dst_i = np.searchsorted(univ, dst)
    order = np.argsort(src_i, kind="stable")
    s_sorted, d_sorted = src_i[order], dst_i[order]
    rng = np.arange(len(univ), dtype=np.int64)
    starts = np.searchsorted(s_sorted, rng)
    ends = np.searchsorted(s_sorted, rng + 1)
    depth = np.full(len(univ), -1, dtype=np.int64)
    frontier = np.searchsorted(univ, seeds)
    depth[frontier] = 0
    for d in range(1, max_hops + 1):
        if len(frontier) == 0:
            break
        cnt = ends[frontier] - starts[frontier]
        total = int(cnt.sum())
        if total == 0:
            break
        base = np.repeat(starts[frontier], cnt)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        nbr = d_sorted[base + within]
        new = np.unique(nbr)
        new = new[depth[new] < 0]
        depth[new] = d
        frontier = new
    keep = depth >= 0
    return pa.table({"id": pa.array(univ[keep]), "depth": pa.array(depth[keep])})


def bfs_depths(
    edges: Dataset,
    seed_ids: "pa.Array | list[int]",
    max_hops: int,
    num_partitions: int = 8,
    driver_edge_limit: int = 4_000_000,
) -> Dataset:
    """Label every vertex reachable from ``seed_ids`` within
    ``max_hops`` edges with its BFS hop depth (first-visit = minimum
    depth, the classic level-synchronous frontier expansion).

    Distributed shape — the third fixed-point graph operator next to
    ``pagerank`` and ``dedup.connected_components_distributed``: each
    round is ONE hash join (frontier ⋈ edges on the source endpoint),
    one narrow groupby-distinct of the neighbor set, and one
    ``left_anti`` join against the visited set; every exchange is
    frontier- or visited-sized (single int64 id column), never the
    adjacency, and no frontier row ever transits the driver — levels
    stay distributed and the result is their lazy union. The driver
    holds only round counters and per-round row COUNTS; an empty
    frontier short-circuits before ``max_hops``, so termination is
    exact. ``edges`` must already contain both directions for an
    undirected traversal (symmetrize upstream: the operator itself is
    direction-agnostic).

    At 10^10-frontier scale this is exactly the crawl wave loop with
    the fetch stage deleted, which is why it shares the wave-barrier
    scaling analysis in BASELINE.md: rounds are synchronous, so wave
    size (frontier breadth) must dwarf the per-round barrier cost.
    """
    import numpy as np
    import ray.data as rd

    edges = edges.materialize()
    if edges.count() <= driver_edge_limit:
        return rd.from_arrow(_bfs_dense(collect_arrow(edges), seed_ids, max_hops))

    def stamp(depth: int):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column(
                "depth", pa.array(np.full(b.num_rows, depth, dtype=np.int64))
            )

        return fn

    frontier = rd.from_arrow(pa.table({"id": pa.array(seed_ids, pa.int64())}))
    level_ds: list[Dataset] = [frontier]  # id-only, for the visited anti-join
    labeled: list[Dataset] = [
        frontier.map_batches(stamp(0), batch_format="pyarrow")
    ]

    for depth in range(1, max_hops + 1):
        visited = level_ds[0] if len(level_ds) == 1 else level_ds[0].union(*level_ds[1:])
        nbrs = edges.join(
            frontier, "inner", num_partitions, on=("src",), right_on=("id",)
        ).map_batches(
            lambda b: pa.table({"id": b.column("dst")}), batch_format="pyarrow"
        )
        distinct = drop_empty_blocks(
            sorted_agg_by_key(nbrs, "id", [(None, "count", "_c")])
        ).map_batches(lambda b: b.drop_columns(["_c"]), batch_format="pyarrow")
        frontier = drop_empty_blocks(
            distinct.join(visited, "left_anti", num_partitions, on=("id",))
        ).materialize()
        if frontier.count() == 0:
            break
        level_ds.append(frontier)
        labeled.append(frontier.map_batches(stamp(depth), batch_format="pyarrow"))

    return labeled[0] if len(labeled) == 1 else labeled[0].union(*labeled[1:])


def _hits_dense(et: pa.Table, iterations: int) -> tuple:
    """Driver-side vectorized HITS loop over a collected edge table —
    the identical recurrence the distributed rounds compute."""
    import numpy as np

    if et.num_rows == 0:
        empty = pa.table(
            {"id": pa.array([], pa.string()),
             "score": pa.array([], pa.float64())}
        )
        return empty, empty
    src = np.asarray(et.column("src").to_pylist(), dtype=object)
    dst = np.asarray(et.column("dst").to_pylist(), dtype=object)
    univ, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    src_i, dst_i = inv[: len(src)], inv[len(src):]
    n = len(univ)
    hub = np.full(n, 1.0 / n)
    auth = np.full(n, 1.0 / n)
    for _ in range(iterations):
        a_new = np.zeros(n)
        np.add.at(a_new, dst_i, hub[src_i])
        s = a_new.sum()
        auth = a_new / s if s > 0 else a_new
        h_new = np.zeros(n)
        np.add.at(h_new, src_i, auth[dst_i])
        s = h_new.sum()
        hub = h_new / s if s > 0 else h_new

    def as_table(scores):
        t = pa.table(
            {"id": pa.array(univ.tolist()), "score": pa.array(scores, pa.float64())}
        )
        return t.take(
            pc.sort_indices(
                t, sort_keys=[("score", "descending"), ("id", "ascending")]
            )
        )

    return as_table(hub), as_table(auth)


def hits(
    edges: Dataset,
    iterations: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 8,
    driver_edge_limit: int = 1_000_000,
) -> tuple:
    """HITS hubs-and-authorities fixed point (Kleinberg 1999): a node
    is a good HUB when it links to good authorities and a good
    AUTHORITY when good hubs link to it — the mutual recursion
    ``a ← Aᵀh``, ``h ← A·a``, L1-normalized each half-step (the fixed
    ray is the same as the classic L2 form; L1 keeps the normalizer a
    one-scalar driver fold).  Returns ``(hubs, authorities)`` — two
    node-count-sized pa.Tables(id, score) sorted by score desc.

    Same dual-path selection as :func:`pagerank`: a subgraph-sized
    edge list (≤ ``driver_edge_limit``) runs the dense numpy loop;
    past it, each half-step is one hash join (edges ⋈ scores on one
    endpoint) and one groupby-sum over EDGE-sized data, with the L1
    normalizer as per-block partials → one driver scalar."""
    edges = edges.map_batches(
        lambda b: pa.table({"src": b.column(src_col), "dst": b.column(dst_col)}),
        batch_format="pyarrow",
    ).materialize()

    if edges.count() <= driver_edge_limit:
        return _hits_dense(collect_arrow(edges), iterations)

    srcs = sorted_agg_by_key(edges, "src", [(None, "count", "_n")]).map_batches(
        lambda b: pa.table({"id": b.column("src")}), batch_format="pyarrow"
    )
    dsts = sorted_agg_by_key(edges, "dst", [(None, "count", "_n")]).map_batches(
        lambda b: pa.table({"id": b.column("dst")}), batch_format="pyarrow"
    )
    nodes = sorted_agg_by_key(
        drop_empty_blocks(srcs.union(dsts)), "id", [(None, "count", "_n")]
    ).map_batches(
        lambda b: pa.table({"id": b.column("id")}), batch_format="pyarrow"
    ).materialize()
    n = nodes.count()
    if n == 0:
        empty = pa.table(
            {"id": pa.array([], pa.string()), "score": pa.array([], pa.float64())}
        )
        return empty, empty

    init = 1.0 / n

    def with_score(ds, value):
        return ds.map_batches(
            lambda b: pa.table(
                {"id": b.column("id"),
                 "score": pa.array([value] * b.num_rows, pa.float64())}
            ),
            batch_format="pyarrow",
        ).materialize()

    def half_step(scores, from_col, to_col):
        """to(x) = Σ_{edges} score(from side); L1-normalized."""
        raw = drop_empty_blocks(
            sorted_agg_by_key(
                edges.join(scores, "inner", num_partitions, on=(from_col,),
                           right_on=("id",))
                .map_batches(
                    lambda b: pa.table(
                        {"id": b.column(to_col), "c": b.column("score")}
                    ),
                    batch_format="pyarrow",
                ),
                "id",
                [("c", "sum", "c")],
            )
        )
        norm = raw.map_batches(
            lambda b: pa.table(
                {"s": pa.array([pc.sum(b.column("c")).as_py() or 0.0],
                               pa.float64())}
            ),
            batch_format="pyarrow",
        ).aggregate(Sum("s", alias_name="s"))["s"] or 0.0
        inv_norm = (1.0 / norm) if norm > 0 else 0.0
        return nodes.join(
            raw, "left_outer", num_partitions, on=("id",)
        ).map_batches(
            lambda b: pa.table(
                {
                    "id": b.column("id"),
                    "score": pc.multiply(
                        pc.coalesce(b.column("c"), pa.scalar(0.0, pa.float64())),
                        inv_norm,
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    hub = with_score(nodes, init)
    auth = with_score(nodes, init)
    for _ in range(iterations):
        auth = half_step(hub, "src", "dst")
        hub = half_step(auth, "dst", "src")

    def collect_sorted(ds):
        t = collect_arrow(ds)
        return t.take(
            pc.sort_indices(
                t, sort_keys=[("score", "descending"), ("id", "ascending")]
            )
        )

    return collect_sorted(hub), collect_sorted(auth)
