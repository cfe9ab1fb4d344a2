"""Offline preprocessing CLI (reference ``preprocess.py:7-14``).

Usage: ``python -m smart_nar_fast_tts_tpu.cli.preprocess <preprocess.yaml>``
(also accepts ``--prepare_align <corpus_dir>`` to run the LJSpeech
metadata→lab/wav step the reference ships but never invokes,
``preprocessor/ljspeech.py:11-40``).
"""

from __future__ import annotations

import argparse

import yaml

from ..config import Config
from ..data.preprocessor import Preprocessor


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config", type=str, help="path to preprocess.yaml")
    parser.add_argument("--prepare_align", type=str, default=None,
                        metavar="CORPUS_DIR",
                        help="run metadata.csv → .lab/.wav corpus prep "
                             "first (LJSpeech layout)")
    parser.add_argument("--workers", type=int, default=1,
                        help="parallel utterance workers (process pool)")
    args = parser.parse_args(argv)

    with open(args.config) as f:
        raw = yaml.safe_load(f)
    cfg = Config.from_dicts(raw, {}, {})
    if args.prepare_align:
        from ..data.ljspeech import prepare_align
        prepare_align(args.prepare_align, cfg.preprocess)
    out = Preprocessor(cfg.preprocess).build_from_path(
        num_workers=args.workers)
    print(f"preprocessed {len(out)} utterances "
          f"→ {cfg.preprocess.preprocessed_path}")


if __name__ == "__main__":
    main()
