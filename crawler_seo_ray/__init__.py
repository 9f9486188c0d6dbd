"""crawler_seo_ray — a Ray-Data-native crawl + data-processing engine.

A from-scratch reimplementation of the *capabilities* of the reference
repo ``GuilhermeAquino92/crawler_seo`` (see SURVEY.md) on top of
``ray.data.Dataset`` pipelines:

- a deterministic synthetic web of image+caption "pages" (``datagen``)
- URL canonicalization / relevance filtering (``canon``)
- a sharded URL-seen membership index and host-sharded frontier
  scheduler held in Ray actors (``state``)
- fetch/decode/analyze stages as vectorized batch kernels (``stages``)
- the iterative wave crawl driver (``pipelines.crawl``)
- post-crawl shuffles: duplicate flagging, scoring, top-k, summaries
  (``pipelines.report``)
- large-scale training-data operators: exact/near dedup, similarity
  search, text analysis, multimodal plumbing (``stages``/``functions``)

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — the
host (driver, tests' conftest, bench.py) owns the Ray session.
"""

__version__ = "0.1.0"


def quick_analysis(*args, **kwargs):
    """Programmatic crawl+audit (the reference's quick_analysis surface);
    see crawler_seo_ray.cli.quick_analysis."""
    from .cli import quick_analysis as _qa

    return _qa(*args, **kwargs)
