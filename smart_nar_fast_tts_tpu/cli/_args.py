"""Shared argument plumbing for the reference-compatible CLI triplet."""

from __future__ import annotations

import argparse

from ..config import Config, FeatureStats
import dataclasses
import os


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
