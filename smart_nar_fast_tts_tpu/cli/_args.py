"""Shared argument plumbing for the reference-compatible CLI triplet."""

from __future__ import annotations

import argparse

from ..config import Config, FeatureStats
import dataclasses
import os


def enable_compilation_cache() -> None:
    """Persist XLA executables across CLI runs.

    First compiles on a (possibly remote-attached) TPU take tens of seconds
    to minutes for the vocoder's conv-transpose graph; the on-disk cache
    makes every subsequent ``synthesize``/``train`` invocation start hot.
    Opt out with ``SMART_TTS_NO_COMPILE_CACHE=1``.
    """
    if os.environ.get("SMART_TTS_NO_COMPILE_CACHE"):
        return
    import jax
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "smart_nar_fast_tts_tpu", "xla_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is best-effort; never block the CLI on it
        pass


def add_config_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("-p", "--preprocess_config", type=str,
                        required=True, help="path to preprocess.yaml")
    parser.add_argument("-m", "--model_config", type=str, required=True,
                        help="path to model.yaml")
    parser.add_argument("-t", "--train_config", type=str, required=True,
                        help="path to train.yaml")


def load_config(args: argparse.Namespace, need_stats: bool = True) -> Config:
    cfg = Config.from_yaml_triplet(
        args.preprocess_config, args.model_config, args.train_config)
    if need_stats and cfg.preprocess.stats is None:
        stats_path = os.path.join(cfg.preprocess.preprocessed_path,
                                  "stats.json")
        if os.path.exists(stats_path):
            cfg = dataclasses.replace(
                cfg, preprocess=dataclasses.replace(
                    cfg.preprocess,
                    stats=FeatureStats.from_stats_json(stats_path)))
    return cfg
