"""Text frontend tests: symbol-table parity with the reference and
cleaner/number behavior."""

import sys

import pytest

from smart_nar_fast_tts_tpu.text import (
    SYMBOLS, SYMBOL_TO_ID, VOCAB_SIZE, text_to_sequence, sequence_to_text,
    phonemes_to_sequence,
)
from smart_nar_fast_tts_tpu.text.numbers import (
    normalize_numbers, number_to_words, number_to_ordinal_words,
)
from smart_nar_fast_tts_tpu.text.cleaners import english_cleaners, to_ascii
from smart_nar_fast_tts_tpu.text.g2p import G2P, _rule_g2p


def test_symbol_table_size():
    # 1 pad + 1 special + 10 punct + 52 letters + 84 arpabet + 209 pinyin + 3
    assert len(SYMBOLS) == 360
    assert VOCAB_SIZE == 361
    assert SYMBOLS[0] == "_"
    assert SYMBOLS[-3:] == ["@sp", "@spn", "@sil"]


def test_symbol_table_matches_reference_ordering():
    """Byte-exact ID parity with reference text/symbols.py (checkpoint-
    visible via the embedding table)."""
    import types
    for name in ("unidecode", "inflect"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.unidecode = lambda s: s
            m.engine = lambda: None
            sys.modules[name] = m
    sys.path.insert(0, "/root/reference")
    try:
        import importlib
        ref_symbols = importlib.import_module("text.symbols").symbols
    except Exception:
        pytest.skip("reference symbols unavailable")
    finally:
        sys.path.remove("/root/reference")
    assert list(SYMBOLS) == list(ref_symbols)


def test_arpabet_sequence_roundtrip():
    seq = text_to_sequence("{HH AH0 L OW1} world!", ["english_cleaners"])
    assert all(0 < s < 360 for s in seq)
    text = sequence_to_text(seq)
    assert "{HH AH0 L OW1}" in text
    assert "world" in text


def test_pad_and_tilde_dropped():
    seq = text_to_sequence("a_b", ["basic_cleaners"])
    assert SYMBOL_TO_ID["_"] not in seq
    assert len(seq) == 2


def test_phonemes_to_sequence_silences():
    seq = phonemes_to_sequence("HH AH0 sp")
    assert seq[-1] == SYMBOL_TO_ID["@sp"]


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(14) == "fourteen"
    assert number_to_words(42) == "forty-two"
    assert number_to_words(100) == "one hundred"
    assert number_to_words(123) == "one hundred twenty-three"
    assert number_to_words(1000000) == "one million"


def test_normalize_numbers():
    # 1000<n<3000 is read year-style (reference text/numbers.py:50-63)
    assert normalize_numbers("1,234") == "twelve thirty-four"
    assert normalize_numbers("4,567") == \
        "four thousand five hundred sixty-seven"
    assert normalize_numbers("$5") == "five dollars"
    assert normalize_numbers("$1.50") == "one dollar, fifty cents"
    assert normalize_numbers("3.14") == "three point fourteen"
    assert normalize_numbers("2nd") == "second"
    assert normalize_numbers("21st") == "twenty-first"
    assert normalize_numbers("1984") == "nineteen eighty-four"
    assert normalize_numbers("2000") == "two thousand"
    assert normalize_numbers("2005") == "two thousand five"
    assert normalize_numbers("£10") == "ten pounds"


def test_ordinals():
    assert number_to_ordinal_words(3) == "third"
    assert number_to_ordinal_words(12) == "twelfth"
    assert number_to_ordinal_words(20) == "twentieth"
    assert number_to_ordinal_words(101) == "one hundred first"


def test_english_cleaners():
    assert english_cleaners("Dr. Smith  bought   2 apples.") == \
        "doctor smith bought two apples."
    assert english_cleaners("Mr. Café") == "mister cafe"


def test_to_ascii():
    assert to_ascii("naïve œuvre ß") == "naive oeuvre ss"


def test_g2p_lexicon_free_fallback():
    phones = _rule_g2p("hello")
    assert all(isinstance(p, str) and p for p in phones)
    g2p = G2P()
    out = g2p("Hello, world.")
    assert out.startswith("{") and out.endswith("}")
    assert "sp" in out.split()  # punctuation → silence


def test_g2p_lexicon_lookup(tmp_path):
    lex = tmp_path / "lex.txt"
    lex.write_text("HELLO  HH AH0 L OW1\nWORLD  W ER1 L D\n")
    g2p = G2P(str(lex))
    out = g2p("hello world")
    assert out == "{HH AH0 L OW1 W ER1 L D}"


# ---------------------------------------------------------------------------
# CMUdict parser (reference text/cmudict.py)
# ---------------------------------------------------------------------------

def test_cmudict_valid_symbols():
    from smart_nar_fast_tts_tpu.text.cmudict import VALID_SYMBOLS
    assert len(VALID_SYMBOLS) == 84
    assert "AA0" in VALID_SYMBOLS and "ZH" in VALID_SYMBOLS
    # stress variants only on vowels
    assert "B0" not in VALID_SYMBOLS


def test_cmudict_parse_and_lexicon():
    from smart_nar_fast_tts_tpu.text.cmudict import CMUDict
    from smart_nar_fast_tts_tpu.text.g2p import G2P
    lines = [
        ";;; comment line",
        "HELLO  HH AH0 L OW1",
        "HELLO(1)  HH EH0 L OW1",
        "WORLD  W ER1 L D",
        "BAD-ENTRY  QQ XX",          # invalid phones dropped
        "MALFORMED LINE NO DOUBLESPACE",
    ]
    d = CMUDict(lines)
    assert len(d) == 2
    assert d.lookup("hello") == ["HH AH0 L OW1", "HH EH0 L OW1"]
    assert d.lookup("absent") is None
    # keep_ambiguous=False drops multi-pronunciation words
    assert CMUDict(lines, keep_ambiguous=False).lookup("hello") is None

    g2p = G2P()
    g2p.lexicon = d.as_lexicon()          # first pronunciation wins
    assert g2p("hello world") == "{HH AH0 L OW1 W ER1 L D}"


def test_cmudict_format_autodetected_by_g2p(tmp_path):
    """A raw cmudict-format file works directly as cfg lexicon_path:
    read_lexicon detects the ';;;' header (or .dict extension) and routes
    through CMUDict, stripping WORD(1) keys and invalid entries."""
    from smart_nar_fast_tts_tpu.text.g2p import G2P, read_lexicon
    body = (";;; cmudict 0.7b style header\n"
            "HELLO  HH AH0 L OW1\n"
            "HELLO(1)  HH EH0 L OW1\n"
            "WORLD  W ER1 L D\n"
            "BAD  QQ XX\n")
    by_header = tmp_path / "cmu.txt"
    by_header.write_text(body)
    lex = read_lexicon(str(by_header))
    assert lex == {"hello": ["HH", "AH0", "L", "OW1"],
                   "world": ["W", "ER1", "L", "D"]}
    # extension alone is enough, even without the header
    by_ext = tmp_path / "cmu.dict"
    by_ext.write_text(body.split("\n", 1)[1])
    assert read_lexicon(str(by_ext)) == lex
    assert G2P(str(by_header))("hello world") == \
        "{HH AH0 L OW1 W ER1 L D}"
