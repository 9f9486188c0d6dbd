"""Nested configuration surface — the reference's config tree
(config/settings.py:202-231 DEFAULT_CONFIG, 249-261 update_config
deep-merge) re-expressed over the Ray engine's CrawlSpec/EngineConfig.

The reference exposes a single nested dict (crawler / analysis /
filters / output sections) that callers partially override with a
recursive deep-merge; ``main.py:335-341`` quick mode is one such
override. Here the same nested surface materializes into the two
engine dataclasses, so a reference user's config dict ports directly:

    cfg = update_config({"crawler": {"max_urls": 500},
                         "engine": {"num_workers": 8}})
    spec, engine = materialize(cfg, seeds=[...], n_pages=300)
"""

from __future__ import annotations

import copy
from typing import Any

from . import datagen
from .canon import Scope

# the reference's sections (settings.py:202-231), plus the Ray-engine
# section that replaces its thread-pool knobs
DEFAULT_CONFIG: dict[str, Any] = {
    "crawler": {
        "max_urls": 100,           # reference MAX_URLS_DEFAULT scale-down
        "max_depth": 10,           # settings.py MAX_DEPTH_DEFAULT
        "batch_size": 25,          # wave size = reference max_threads
        "max_retries": 3,          # session_manager.py:33-38
        "politeness_per_wave": None,
        "priority_patterns": None,
        "link_score": None,
        "synthetic_robots": False,
    },
    "analysis": {
        "detect_invisible_colors": True,   # settings.py analysis section
    },
    "engine": {
        "num_workers": 4,
        "num_seen_shards": 4,
        "num_frontier_shards": 4,
        "frontier_salt": 1,
        "chunk_timeout_sec": 300.0,
        "verify_images": True,
        "psnr_every": 1,
        "checkpoint_dir": None,
    },
    "output": {
        "folder": None,            # report sheet directory (None = no report)
    },
}

# the reference quick-mode override (main.py:335-341 apply_quick_mode)
QUICK_CONFIG: dict[str, Any] = {
    "crawler": {"max_urls": 100, "max_depth": 3, "batch_size": 5}
}


def default_config() -> dict[str, Any]:
    """settings.py:244-247 get_config — a fresh copy of the defaults."""
    return copy.deepcopy(DEFAULT_CONFIG)


def deep_update(base: dict, override: dict) -> dict:
    """settings.py:253-259 — recursive merge: nested dicts merge
    key-wise, everything else replaces. Mutates and returns ``base``."""
    for key, value in override.items():
        if key in base and isinstance(base[key], dict) and isinstance(value, dict):
            deep_update(base[key], value)
        else:
            base[key] = value
    return base


def update_config(custom: dict | None = None, *, quick: bool = False) -> dict:
    """settings.py:249-261 update_config + the quick-mode merge: start
    from the defaults, optionally fold in QUICK_CONFIG, then the
    caller's partial override tree."""
    cfg = default_config()
    if quick:
        deep_update(cfg, copy.deepcopy(QUICK_CONFIG))
    if custom:
        deep_update(cfg, copy.deepcopy(custom))
    return cfg


def materialize(cfg: dict, seeds: list[str], n_pages: int):
    """Turn a (validated) nested config into the engine dataclasses."""
    from .oracle import CrawlSpec
    from .pipelines.crawl import EngineConfig

    c, a, e = cfg["crawler"], cfg["analysis"], cfg["engine"]
    spec = CrawlSpec(
        n_pages=n_pages,
        seeds=list(seeds),
        max_urls=c["max_urls"],
        max_depth=c["max_depth"],
        batch_size=c["batch_size"],
        scope=Scope("suffix", datagen.HOST_SUFFIX),
        priority_patterns=c["priority_patterns"],
        link_score=c["link_score"],
        politeness_per_wave=c["politeness_per_wave"],
        synthetic_robots=c["synthetic_robots"],
        detect_invisible_colors=a["detect_invisible_colors"],
        max_retries=c["max_retries"],
    )
    engine = EngineConfig(
        num_workers=e["num_workers"],
        num_seen_shards=e["num_seen_shards"],
        num_frontier_shards=e["num_frontier_shards"],
        frontier_salt=e["frontier_salt"],
        chunk_timeout_sec=e["chunk_timeout_sec"],
        verify_images=e["verify_images"],
        psnr_every=e["psnr_every"],
        checkpoint_dir=e["checkpoint_dir"],
    )
    return spec, engine
