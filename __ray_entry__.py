"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline: the deterministic synthetic
image+caption web (BASELINE.json input_hint shape) crawled by the
Ray-native frontier/fetch/analyze engine, followed by the post-crawl
Ray Data finalization (duplicate flags + scores). Returns the finalized
audit Dataset.

``queries()``/``oracle_sql()`` expose one entry per implemented
operator class (SURVEY.md §2 + training-data extensions) over the
driver's parquet tables; see crawler_seo_ray/queries.py.

Ray is initialised by the driver BEFORE this module is imported — no
ray.init()/ray.shutdown() anywhere on these paths.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crawler_seo_ray import datagen  # noqa: E402
from crawler_seo_ray.canon import Scope  # noqa: E402
from crawler_seo_ray.queries import ORACLE_SQL, QUERIES, corpus_dir  # noqa: E402


def entry() -> Any:
    """Flagship crawl on the synthetic corpus + sf0.001 table smoke."""
    from crawler_seo_ray.oracle import CrawlSpec
    from crawler_seo_ray.pipelines.crawl import EngineConfig, run_crawl
    from crawler_seo_ray.pipelines.report import excel_projection, finalize_audit

    spec = CrawlSpec(
        n_pages=300,
        seeds=[datagen.url(1)],
        max_urls=150,
        batch_size=25,
        scope=Scope("suffix", datagen.HOST_SUFFIX),
    )
    from crawler_seo_ray.queries import _safe_workers

    res = run_crawl(spec, corpus_dir(), EngineConfig(num_workers=_safe_workers()))
    return excel_projection(finalize_audit(res.audit))


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    # the corpus-backed oracles (corpus_phash_dups / corpus_resize /
    # …) read the deterministic corpus cache via read_parquet —
    # materialize it now so the files exist even if the driver runs the
    # SQL side before the Ray side
    corpus_dir()
    return dict(ORACLE_SQL)
