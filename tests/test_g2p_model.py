"""Learned G2P fallback (VERDICT.md Missing #2): the committed seq2seq
model must beat a phoneme-error-rate bar on words it never saw in
training, produce only valid symbol-table phones, and be wired as G2P's
default OOV fallback (lexicon-first, like the reference's g2p_en usage at
``synthesize.py:36,43``)."""

import numpy as np
import pytest

import conftest  # noqa: F401

from smart_nar_fast_tts_tpu.text.g2p import G2P
from smart_nar_fast_tts_tpu.text.g2p_model import (DEFAULT_SEED_LEXICON,
                                                   DEFAULT_WEIGHTS, PHONEMES,
                                                   G2PModel, load_default)


@pytest.fixture(scope="module")
def model():
    return G2PModel(DEFAULT_WEIGHTS)


def test_weights_are_committed():
    assert load_default() is not None


def test_held_out_per(model):
    """PER on the deterministic held-out slice (words excluded from
    training by hash split — see cli/train_g2p.py) must stay under 25%.
    The committed model measures ~14% at export time; the margin absorbs
    retraining noise."""
    from smart_nar_fast_tts_tpu.cli.train_g2p import (load_pairs,
                                                      phoneme_error_rate,
                                                      split_heldout)
    pairs = load_pairs(DEFAULT_SEED_LEXICON)
    _, held = split_heldout(pairs)
    assert len(held) >= 100
    per = phoneme_error_rate(model, held)
    assert per < 0.25, f"held-out PER {per:.3f}"


def test_valid_phones_only(model):
    valid = set(PHONEMES[3:])
    for word in ("zorblax", "quixotic", "brillig", "interwoven",
                 "misunderestimate", "cryptographic"):
        phones = model.predict(word)
        assert phones, word
        assert all(p in valid for p in phones), (word, phones)


def test_known_words_exact(model):
    """Training words should round-trip (sanity that weights loaded)."""
    from smart_nar_fast_tts_tpu.cli.train_g2p import load_pairs
    pairs = load_pairs(DEFAULT_SEED_LEXICON)
    hits = sum(model.predict(w) == pairs[w]
               for w in ("hello", "world", "water", "computer", "music"))
    assert hits >= 4


def test_g2p_uses_learned_fallback():
    """OOV words route through the learned model, not the rule pass, and
    the output parses through text_to_sequence."""
    from smart_nar_fast_tts_tpu.text import text_to_sequence

    g2p = G2P()          # no lexicon: everything is OOV
    out = g2p("Hello zorblax.")
    assert out.startswith("{") and out.endswith("}")
    model = load_default()
    inner = out[1:-1].split()
    want = model.predict("hello") + model.predict("zorblax") + ["sp"]
    assert inner == want
    ids = text_to_sequence(out, ["english_cleaners"])
    assert len(ids) == len(want)


def test_lexicon_still_wins():
    g2p = G2P()
    g2p.lexicon = {"zorblax": ["Z", "AO1", "R", "B", "L", "AE1", "K", "S"]}
    assert g2p("zorblax") == "{Z AO1 R B L AE1 K S}"
