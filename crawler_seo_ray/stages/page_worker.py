"""PageWorker — the stateful fetch+decode+analyze+extract actor stage.

One actor = one reference "worker thread" slot (core/crawler.py:111),
but with per-actor state amortized across every wave (SURVEY.md S1/S2):
the sharded corpus reader (open parquet handles = the Lance-take
session), the crawl scope, and the analyzer config are built once in
``__init__``. Each ``process`` call handles a contiguous, ordered chunk
of a wave and returns four Arrow tables:

- ``audit``      one row per URL (crawl + analyzer fields, pre-dup) —
                 written straight to the checkpoint when ``audit_out``
                 is given
- ``candidates`` flattened outlinks with global order keys + precomputed
                 shard routing and frontier rank
- ``rejects``    the reasoned filter log (SURVEY.md A6)
- ``host_stats`` per-host (visits, errors) partials for the adaptive
                 between-wave priority recompute

Image invariants (BASELINE.json input_hint) are enforced here: every
fetched row's stored bytes are decoded and checked — caption equality
always, phash-of-decode always, full PSNR≥40dB against the reference
pixels on a configurable sample (``psnr_every``; pixel re-generation
is the expensive part, decode is mandatory anyway).
Pixels are dropped immediately after the check — only scalars ride
onward, so shuffles never carry image bytes (SURVEY.md §7.5).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .. import datagen
from ..canon import Scope, is_priority, shard_of
from ..state.frontier import owner_shard
from ..functions.imagecodec import decode_image, phash64, psnr
from ..storage import ShardedTakeReader
from ..web import build_audit_row, extract_links, fetch_page, link_rank

MAX_LINKS_PER_PAGE = 4096  # order_key = visit_seq * MAX_LINKS + position

_problem_struct = pa.struct(
    [
        ("descricao", pa.string()),
        ("tag", pa.string()),
        ("posicao", pa.int32()),
        ("texto", pa.string()),
        ("motivos", pa.list_(pa.string())),
        ("gravidade", pa.string()),
    ]
)
_resource_struct = pa.struct(
    [
        ("rtype", pa.string()),
        ("tag", pa.string()),
        ("attribute", pa.string()),
        ("url", pa.string()),
        ("category", pa.string()),
    ]
)

AUDIT_SCHEMA = pa.schema(
    [
        ("visit_seq", pa.int64()),
        ("wave", pa.int32()),
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("page_index", pa.int64()),
        ("status_code", pa.string()),
        ("final_url", pa.string()),
        ("redirected", pa.bool_()),
        ("content_type", pa.string()),
        ("response_time_ms", pa.float64()),
        ("content_length", pa.int64()),
        ("error_details", pa.string()),
        ("processed", pa.bool_()),
        ("links_encontrados", pa.list_(pa.string())),
        ("links_count", pa.int32()),
        # metatags (null when not processed)
        ("title", pa.string()),
        ("title_length", pa.int32()),
        ("title_status", pa.string()),
        ("meta_description", pa.string()),
        ("description_length", pa.int32()),
        ("description_status", pa.string()),
        ("meta_keywords", pa.string()),
        ("meta_robots", pa.string()),
        ("meta_viewport", pa.string()),
        ("canonical_url", pa.string()),
        ("og_title", pa.string()),
        ("og_description", pa.string()),
        ("og_image", pa.string()),
        ("has_open_graph", pa.bool_()),
        # headings
        ("h1_count", pa.int32()),
        ("h1_text", pa.string()),
        ("h1_ausente", pa.bool_()),
        ("h1_multiple", pa.bool_()),
        ("hierarquia_correta", pa.bool_()),
        ("heading_sequence", pa.list_(pa.string())),
        ("heading_sequence_valida", pa.list_(pa.string())),
        ("problemas_hierarquia", pa.list_(pa.string())),
        ("heading_issues", pa.list_(pa.string())),
        ("headings_problematicos", pa.list_(_problem_struct)),
        ("headings_problematicos_count", pa.int32()),
        ("headings_vazios_count", pa.int32()),
        ("headings_ocultos_count", pa.int32()),
        ("headings_gravidade_critica", pa.int32()),
        ("total_problemas_headings", pa.int32()),
        # status / security / mixed content
        ("status_warnings", pa.list_(pa.string())),
        ("security_headers_present", pa.list_(pa.string())),
        ("hsts_present", pa.bool_()),
        ("csp_present", pa.bool_()),
        ("x_frame_options", pa.bool_()),
        ("x_content_type_options", pa.bool_()),
        ("referrer_policy", pa.bool_()),
        ("performance_issues", pa.list_(pa.string())),
        ("seo_status_issues", pa.list_(pa.string())),
        ("mixed_content_resources", pa.list_(_resource_struct)),
        ("has_mixed_content", pa.bool_()),
        ("mixed_content_count", pa.int32()),
        ("critical_mixed_count", pa.int32()),
        ("passive_mixed_count", pa.int32()),
        ("risk_level", pa.string()),
        ("risk_score", pa.int32()),
        # image payload invariants (input_hint)
        ("image_id", pa.string()),
        ("img_w", pa.int32()),
        ("img_h", pa.int32()),
        ("img_fmt", pa.string()),
        ("phash", pa.int64()),
        ("caption", pa.string()),
        ("caption_match", pa.bool_()),
        ("phash_match", pa.bool_()),
        ("psnr_db", pa.float64()),
    ]
)

CANDIDATE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("order_key", pa.int64()),
        ("priority", pa.bool_()),
        ("rank", pa.float64()),  # frontier order rank (web.link_rank)
        # shard routing computed in the (parallel) worker so the driver's
        # admission merge does no hashing at all
        ("seen_shard", pa.int32()),
        ("frontier_shard", pa.int32()),
    ]
)

REJECT_SCHEMA = pa.schema(
    [("url", pa.string()), ("reason", pa.string()), ("details", pa.string()), ("wave", pa.int32())]
)


@ray.remote
class PageWorker:
    def __init__(self, corpus_dir: str | None, spec_dict: dict, seen_handles=None):
        # one actor = one parallel unit: cap pyarrow's per-process pools
        # (default = machine cores, so a 30-actor pool otherwise spawns
        # ~30×32 compute threads that thrash each other during the
        # concurrent corpus point-takes — measured 2-3× worker-phase
        # inflation at 32 CPUs; Ray's OMP_NUM_THREADS=1 covers BLAS but
        # not arrow's own pool)
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
        self.n = spec_dict["n_pages"]
        self.num_seen_shards = spec_dict.get("num_seen_shards", 1)
        self.num_frontier_shards = spec_dict.get("num_frontier_shards", 1)
        self.frontier_salt = spec_dict.get("frontier_salt", 1)
        self.max_depth = spec_dict["max_depth"]
        self.scope = Scope(*spec_dict["scope"])
        self.priority_patterns = spec_dict.get("priority_patterns")
        self.link_score = spec_dict.get("link_score")
        self.rank_patterns = self.priority_patterns or (
            (self.link_score or {}).get("patterns")
        )
        self.detect_colors = spec_dict.get("detect_invisible_colors", True)
        self.psnr_every = spec_dict.get("psnr_every", 1)
        self.max_retries = spec_dict.get("max_retries", 3)
        self.fault_rate = spec_dict.get("fault_rate", 0.0)
        self.synthetic_hang = spec_dict.get("synthetic_hang")
        from ..web import RobotsCache

        static_robots = spec_dict.get("robots")
        synth = spec_dict.get("synthetic_robots", False)
        # per-host rules resolved lazily, once per host per actor (the
        # robots.txt fetch cache)
        self.robots = (
            RobotsCache(static_robots, synth) if (static_robots or synth) else None
        )
        # seen-shard actor handles for the P2P candidate shuffle: each
        # chunk's candidate slices ship worker→shard directly, so the
        # driver's wave loop never routes candidate rows (it re-shipped
        # every candidate in r2 and became the 32-core bottleneck)
        self.seen_handles = seen_handles
        self.verify_images = spec_dict.get("verify_images", True) and corpus_dir is not None
        self.reader = (
            ShardedTakeReader(corpus_dir) if self.verify_images else None
        )
        if self.reader is not None:
            m = self.reader.manifest
            self.dim_base, self.dim_mod = m.get("dim_base", 32), m.get("dim_mod", 97)

    def process(
        self,
        entries: list[tuple],
        wave: int,
        audit_out: str | None = None,
        chunk_key: int | None = None,
    ):
        """entries: ordered [(visit_seq, url, host, depth)]. Returns
        (audit, candidates, rejects, host_stats, n_candidates) Arrow
        tables; when ``audit_out`` is given the audit chunk is written
        there as parquet instead of being returned (the wide nested rows
        then never transit the driver — the checkpoint IS the audit sink
        at scale). When ``chunk_key`` is given and seen handles exist,
        the candidate rows likewise never transit the driver: they ship
        straight to their seen shards (acked before this call returns,
        so chunk completion implies registration)."""
        entries = entry_rows(entries)
        audit_rows: list[dict] = []
        cand_rows: list[dict] = []
        rej_rows: list[dict] = []
        if self.synthetic_hang:  # test hook for straggler containment
            sub, sec = self.synthetic_hang
            if any(sub in url for _, url, _, _ in entries):
                import time as _t

                _t.sleep(float(sec))
        all_attrs = [
            fetch_page(url, self.n, self.max_retries, self.fault_rate)
            for _, url, _, _ in entries
        ]
        page_rows = {}
        if self.verify_images:
            valid = sorted(
                {
                    a["page_index"]
                    for a in all_attrs
                    if a.get("page_index", -1) >= 0 and a["status_code"] == 200
                }
            )
            if valid:
                t = self.reader.take(valid)
                page_rows = {datagen.parse_image_id(r["image_id"]): r for r in t.to_pylist()}

        for (seq, url, host, depth), attrs in zip(entries, all_attrs):
            try:
                row = build_audit_row(url, depth, attrs, self.detect_colors)
            except Exception as exc:  # per-row fault containment — a bad
                # page becomes an ERROR row (core/crawler.py:129-134
                # semantics: failures count toward the budget, never kill
                # the wave)
                row = {
                    "url": url, "depth": depth, "page_index": -1,
                    "status_code": "ERROR", "final_url": url, "redirected": False,
                    "content_type": "", "response_time_ms": 0.0, "content_length": 0,
                    "links_encontrados": [], "processed": False,
                    "error_details": f"analyze error: {exc}",
                }
            row["visit_seq"] = seq
            row["wave"] = wave
            row["host"] = host
            i = attrs.get("page_index", -1)
            crow = page_rows.get(i)
            if crow is not None:
                try:
                    dec = decode_image(crow["bytes"], crow["fmt"])
                    row.update(
                        {
                            "image_id": crow["image_id"],
                            "img_w": crow["w"],
                            "img_h": crow["h"],
                            "img_fmt": crow["fmt"],
                            "phash": crow["phash"],
                            "caption": crow["caption"],
                            # invariants vs the reference functions (input_hint)
                            "caption_match": crow["caption"] == datagen.caption(i),
                            "phash_match": phash64(dec) == crow["phash"],
                        }
                    )
                    if self.psnr_every and i % self.psnr_every == 0:
                        ref_px = datagen.pixels(i, self.dim_base, self.dim_mod)
                        row["psnr_db"] = psnr(ref_px, dec)
                    del dec
                except Exception as exc:
                    # corrupted payload: keep the crawl row, record the
                    # failed invariant instead of killing the wave
                    row.update(
                        {
                            "image_id": crow["image_id"],
                            "caption_match": False,
                            "phash_match": False,
                            "error_details": f"decode error: {exc}",
                        }
                    )
            if row["processed"] and depth < self.max_depth:
                kept, rejects = extract_links(attrs, url, self.scope, self.robots)
                row["links_encontrados"] = kept
                for r in rejects:
                    rej_rows.append({**r, "wave": wave})
                for pos, c in enumerate(kept):
                    chost = c.partition("://")[2].partition("/")[0]
                    pri = bool(self.rank_patterns) and is_priority(c, self.rank_patterns)
                    if self.priority_patterns is None and self.link_score is None:
                        pri = False
                    cand_rows.append(
                        {
                            "url": c,
                            "host": chost,
                            "depth": depth + 1,
                            "order_key": seq * MAX_LINKS_PER_PAGE + pos,
                            "priority": pri,
                            "rank": link_rank(depth + 1, pri, self.link_score),
                            "seen_shard": shard_of(c, self.num_seen_shards),
                            "frontier_shard": owner_shard(
                                chost, self.num_frontier_shards, c, self.frontier_salt
                            ),
                        }
                    )
            row["links_count"] = len(row["links_encontrados"])
            audit_rows.append(row)

        audit = rows_to_table(audit_rows, AUDIT_SCHEMA)
        # per-host partial stats for adaptive priority (combiner pattern:
        # one tiny (host, visits, errors) table per chunk)
        hs: dict[str, list] = {}
        for r in audit_rows:
            st = hs.setdefault(r["host"], [0, 0])
            st[0] += 1
            if r.get("status_code") != "200":
                st[1] += 1
        host_stats = pa.table(
            {
                "host": pa.array(list(hs.keys()), pa.string()),
                "visits": pa.array([v[0] for v in hs.values()], pa.int64()),
                "errors": pa.array([v[1] for v in hs.values()], pa.int64()),
            }
        )
        if audit_out is not None:
            from ..storage import write_table

            write_table(audit, audit_out)
            audit = None
        cands = rows_to_table(cand_rows, CANDIDATE_SCHEMA)
        n_cands = cands.num_rows
        if self.seen_handles is not None and chunk_key is not None and n_cands:
            sh = cands.column("seen_shard").to_numpy()
            futs = [
                self.seen_handles[int(s)].buffer_full.remote(
                    chunk_key, cands.take(pa.array(np.flatnonzero(sh == s)))
                )
                for s in np.unique(sh)
            ]
            ray.get(futs)  # registered-before-complete guarantee
            cands = CANDIDATE_SCHEMA.empty_table()
        return (audit, cands, rows_to_table(rej_rows, REJECT_SCHEMA), host_stats, n_cands)


def entry_rows(entries) -> list[tuple]:
    """Normalize a dispatch-chunk payload to [(visit_seq, url, host,
    depth)] tuples. The driver ships chunks as compact Arrow tables
    (columnar end to end on its serial path); the per-row tuple
    materialization happens HERE, inside the parallel worker (or in the
    driver's rare straggler-timeout path)."""
    if isinstance(entries, pa.Table):
        return list(
            zip(
                entries.column("visit_seq").to_pylist(),
                entries.column("url").to_pylist(),
                entries.column("host").to_pylist(),
                entries.column("depth").to_pylist(),
            )
        )
    return entries


def rows_to_table(rows: list[dict], schema: pa.Schema) -> pa.Table:
    if not rows:
        return schema.empty_table()
    cols = {name: [r.get(name) for r in rows] for name in schema.names}
    return pa.Table.from_pydict(cols, schema=schema)
