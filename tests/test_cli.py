"""CLI / quick_analysis surface (the reference's main.py UX analog)."""

import pytest


@pytest.mark.usefixtures("ray_session")
def test_quick_analysis_surface(small_corpus, tmp_path):
    from crawler_seo_ray import datagen, quick_analysis

    corpus_dir, _ = small_corpus
    out = str(tmp_path / "report")
    path, df, stats = quick_analysis(
        seeds=[datagen.url(1)],
        n_pages=300,
        corpus=corpus_dir,
        max_urls=30,
        batch_size=10,
        output=out,
    )
    assert path == out
    assert len(df) == 30 and stats["visited"] == 30
    assert list(df["visit_seq"]) == list(range(30))
    assert {"URL", "Metatags_Score", "Title_Duplicado"} <= set(df.columns)
    import os

    assert os.path.isdir(os.path.join(out, "complete"))


@pytest.mark.usefixtures("ray_session")
def test_quick_analysis_empty_seed(small_corpus):
    from crawler_seo_ray import quick_analysis

    corpus_dir, _ = small_corpus
    path, df, stats = quick_analysis(seeds=["notaurl"], n_pages=300, corpus=corpus_dir, max_urls=5)
    assert len(df) == 0 and stats["visited"] == 0 and path is None
