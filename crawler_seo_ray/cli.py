"""Command-line entry point — the reference's ``python main.py`` UX
(main.py:231-310 argument surface) over the Ray engine.

    python -m crawler_seo_ray.cli --seeds https://h0.example.test/page/img00000001 \
        --n-pages 300 --max-urls 100 --output /tmp/crawl_out

Owns the Ray session (the only places allowed to: CLI, bench, tests).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="crawler_seo_ray",
        description="Ray-Data-native crawl + SEO audit over the synthetic image+caption web",
    )
    p.add_argument("--seeds", nargs="+", required=True, help="seed URLs (wave-0 frontier)")
    p.add_argument("--n-pages", type=int, default=300, help="size of the synthetic web")
    p.add_argument("--corpus", default=None,
                   help="corpus dir (generated+cached under /tmp when omitted)")
    p.add_argument("--max-urls", type=int, default=100, help="crawl budget incl. error rows")
    p.add_argument("--max-depth", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=25, help="wave size (reference max_threads)")
    p.add_argument("--priority-patterns", nargs="*", default=None,
                   help="smart-queue substring patterns (reference smart mode)")
    p.add_argument("--depth-weight", type=float, default=None,
                   help="weighted frontier: rank += w*depth")
    p.add_argument("--pattern-boost", type=float, default=None,
                   help="weighted frontier: rank -= b*pattern_match")
    p.add_argument("--politeness", type=int, default=None, help="max URLs per host per wave")
    p.add_argument("--num-workers", type=int, default=None)
    p.add_argument("--checkpoint", default=None, help="checkpoint dir (enables --resume)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--output", default=None, help="report output dir (parquet sheets)")
    p.add_argument("--quick", action="store_true",
                   help="quick mode: depth 3, small waves (reference quick_analysis)")
    p.add_argument("--quiet", action="store_true")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    import ray

    if not ray.is_initialized():
        # honor the cluster address under `ray job submit` (Ray sets
        # RAY_ADDRESS in the job's env); standalone runs stay local
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            log_to_driver=False,
        )
    try:
        filepath, df, stats = quick_analysis(
            seeds=args.seeds,
            n_pages=args.n_pages,
            corpus=args.corpus,
            max_urls=args.max_urls,
            max_depth=3 if args.quick else args.max_depth,
            batch_size=5 if args.quick else args.batch_size,
            priority_patterns=args.priority_patterns,
            depth_weight=args.depth_weight,
            pattern_boost=args.pattern_boost,
            politeness=args.politeness,
            num_workers=args.num_workers,
            checkpoint=args.checkpoint,
            resume=args.resume,
            output=args.output,
        )
        if not args.quiet:
            print(json.dumps(stats, indent=2, default=str))
            if filepath:
                print(f"report sheets: {filepath}")
            print(f"audited rows: {len(df)}")
        return 0
    finally:
        ray.shutdown()


def quick_analysis(
    seeds,
    n_pages: int = 300,
    corpus: str | None = None,
    max_urls: int = 100,
    max_depth: int = 3,
    batch_size: int = 5,
    priority_patterns=None,
    depth_weight: float | None = None,
    pattern_boost: float | None = None,
    politeness: int | None = None,
    num_workers: int | None = None,
    checkpoint: str | None = None,
    resume: bool = False,
    output: str | None = None,
):
    """The reference's programmatic surface (main.py:570-607
    quick_analysis): run a crawl, optionally write the report sheets,
    return (report_path, audit DataFrame, stats). Ray must already be
    initialized by the caller."""
    from . import datagen
    from .canon import Scope
    from .oracle import CrawlSpec
    from .pipelines.crawl import EngineConfig, run_crawl
    from .pipelines.report import excel_projection, finalize_audit, write_report
    from .queries import _safe_workers

    if corpus is None:
        from .queries import CORPUS_N, corpus_dir

        if n_pages == CORPUS_N:
            corpus = corpus_dir()
        else:
            import os

            from . import datagen as _dg

            corpus = f"/tmp/crawler_seo_ray_cache/cli_corpus_n{n_pages}_d16_33_v{_dg.GEN_VERSION}"
            if not os.path.exists(os.path.join(corpus, "manifest.json")):
                datagen.write_corpus_parallel(
                    corpus, n_pages, rows_per_shard=2048, dim_base=16, dim_mod=33
                )

    link_score = None
    if depth_weight is not None or pattern_boost is not None:
        link_score = {
            "depth_weight": depth_weight if depth_weight is not None else 1.0,
            "pattern_boost": pattern_boost if pattern_boost is not None else 0.0,
            "patterns": priority_patterns or [],
        }
        priority_patterns = None

    spec = CrawlSpec(
        n_pages=n_pages,
        seeds=list(seeds),
        max_urls=max_urls,
        max_depth=max_depth,
        batch_size=batch_size,
        scope=Scope("suffix", datagen.HOST_SUFFIX),
        priority_patterns=priority_patterns,
        link_score=link_score,
        politeness_per_wave=politeness,
    )
    cfg = EngineConfig(
        num_workers=num_workers or _safe_workers(),
        checkpoint_dir=checkpoint,
    )
    res = run_crawl(spec, corpus, cfg, resume=resume)
    final = finalize_audit(res.audit).materialize()
    report_path = None
    report_summary = None
    if output:
        report_summary = write_report(final, res.rejected, output)
        report_path = output
    df = excel_projection(final).to_pandas()
    if "visit_seq" in df.columns:
        df = df.sort_values("visit_seq", ignore_index=True)
    stats = dict(res.stats)
    stats["waves"] = res.stats.get("waves")
    # the reference's consolidated end-of-run tree (main.py:465-545);
    # reuse write_report's summary instead of recomputing it
    from .pipelines.report import final_stats_report

    stats["final_report"] = final_stats_report(res, final, summary_dict=report_summary)
    return report_path, df, stats


if __name__ == "__main__":
    sys.exit(main())
