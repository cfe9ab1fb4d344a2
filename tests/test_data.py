"""Data layer tests: TextGrid parsing, alignment semantics, F0 tracker,
wav IO, offline preprocessing contract, bucketed batching (SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest

from smart_nar_fast_tts_tpu.config import AudioConfig, PreprocessConfig
from smart_nar_fast_tts_tpu.data import (
    AcousticDataset, BucketBatcher, Preprocessor, estimate_f0,
    get_alignment, read_textgrid)
from smart_nar_fast_tts_tpu.data.wavio import load_wav, save_wav

SR, HOP = 22050, 256

LONG_TG = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 2.0
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 2.0
        intervals: size = 1
        intervals [1]:
            xmin = 0
            xmax = 2.0
            text = "hello"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 2.0
        intervals: size = 5
        intervals [1]:
            xmin = 0
            xmax = 0.25
            text = "sil"
        intervals [2]:
            xmin = 0.25
            xmax = 0.8
            text = "HH"
        intervals [3]:
            xmin = 0.8
            xmax = 1.1
            text = "sp"
        intervals [4]:
            xmin = 1.1
            xmax = 1.6
            text = "AH0"
        intervals [5]:
            xmin = 1.6
            xmax = 2.0
            text = "sil"
"""

SHORT_TG = """File type = "ooTextFile"
Object class = "TextGrid"

0
2.0
<exists>
1
"IntervalTier"
"phones"
0
2.0
3
0
0.5
"sil"
0.5
1.5
"K"
1.5
2.0
"AE1"
"""


def test_read_textgrid_long(tmp_path):
    p = tmp_path / "a.TextGrid"
    p.write_text(LONG_TG)
    tg = read_textgrid(str(p))
    phones = tg.get_tier_by_name("phones")
    assert [iv.text for iv in phones.intervals] == \
        ["sil", "HH", "sp", "AH0", "sil"]
    assert phones.intervals[1].start_time == pytest.approx(0.25)
    assert phones.intervals[3].end_time == pytest.approx(1.6)
    words = tg.get_tier_by_name("words")
    assert [iv.text for iv in words.intervals] == ["hello"]


def test_read_textgrid_short(tmp_path):
    p = tmp_path / "b.TextGrid"
    p.write_text(SHORT_TG)
    tg = read_textgrid(str(p))
    phones = tg.get_tier_by_name("phones")
    assert [iv.text for iv in phones.intervals] == ["sil", "K", "AE1"]
    assert phones.intervals[1].end_time == pytest.approx(1.5)


def test_get_alignment_trims_silence(tmp_path):
    p = tmp_path / "a.TextGrid"
    p.write_text(LONG_TG)
    tier = read_textgrid(str(p)).get_tier_by_name("phones")
    phones, durations, start, end = get_alignment(tier, SR, HOP)
    # leading sil skipped, interior sp kept, trailing sil trimmed
    assert phones == ["HH", "sp", "AH0"]
    assert start == pytest.approx(0.25)
    assert end == pytest.approx(1.6)
    # durations: round(e*sr/hop) - round(s*sr/hop), relative to [0.25, 1.6]
    def frames(s, e):
        return int(round(e * SR / HOP) - round(s * SR / HOP))
    assert durations == [frames(0.25, 0.8), frames(0.8, 1.1),
                         frames(1.1, 1.6)]


def test_estimate_f0_sine():
    t = np.arange(int(1.0 * SR)) / SR
    for hz in (110.0, 220.0, 440.0):
        wav = 0.5 * np.sin(2 * np.pi * hz * t).astype(np.float32)
        f0 = estimate_f0(wav, SR, HOP)
        assert len(f0) == len(wav) // HOP + 1
        voiced = f0[f0 > 0]
        assert len(voiced) > 0.8 * len(f0)
        np.testing.assert_allclose(np.median(voiced), hz, rtol=0.02)


def test_estimate_f0_silence_unvoiced():
    wav = np.zeros(SR // 2, np.float32)
    f0 = estimate_f0(wav, SR, HOP)
    assert np.all(f0 == 0)


def test_wav_roundtrip(tmp_path):
    wav = (0.3 * np.sin(2 * np.pi * 220 *
                        np.arange(SR // 4) / SR)).astype(np.float32)
    path = str(tmp_path / "x.wav")
    save_wav(path, wav, SR)
    back, sr = load_wav(path)
    assert sr == SR
    np.testing.assert_allclose(back, wav, atol=2e-4)


def test_load_wav_resamples(tmp_path):
    wav = np.sin(2 * np.pi * 100 * np.arange(16000) / 16000)
    path = str(tmp_path / "y.wav")
    save_wav(path, wav.astype(np.float32), 16000)
    back, sr = load_wav(path, SR)
    assert sr == SR
    assert abs(len(back) - 16000 * SR / 16000) < 4


# ---------------------------------------------------------------------------
# synthetic corpus end-to-end
# ---------------------------------------------------------------------------

PHONES = ["HH", "AH0", "L", "OW1", "W", "ER0", "D", "AE1", "T", "S"]


def _make_corpus(root, n_utts=6):
    """Synthetic speaker with sine-ish 'speech', labs, and TextGrids."""
    rng = np.random.default_rng(0)
    in_dir = root / "raw"
    out_dir = root / "preprocessed"
    spk = in_dir / "spk0"
    tg_dir = out_dir / "TextGrid" / "spk0"
    spk.mkdir(parents=True)
    tg_dir.mkdir(parents=True)
    for u in range(n_utts):
        n_phones = int(rng.integers(3, 7))
        lengths = rng.uniform(0.08, 0.25, size=n_phones)
        t0 = 0.1                      # leading silence
        entries = [(0.0, t0, "sil")]
        phs = []
        for i in range(n_phones):
            p = PHONES[int(rng.integers(len(PHONES)))]
            entries.append((t0, t0 + lengths[i], p))
            phs.append(p)
            t0 += lengths[i]
        entries.append((t0, t0 + 0.1, "sil"))
        total = t0 + 0.1

        # waveform: harmonic tone with vibrato + noise
        t = np.arange(int(total * SR)) / SR
        hz = 160 + 30 * np.sin(2 * np.pi * 2.5 * t)
        phase = 2 * np.pi * np.cumsum(hz) / SR
        wav = (0.4 * np.sin(phase) + 0.2 * np.sin(2 * phase)
               + 0.01 * rng.normal(size=len(t))).astype(np.float32)
        save_wav(str(spk / f"utt{u}.wav"), wav, SR)
        (spk / f"utt{u}.lab").write_text(f"synthetic utterance {u}")

        lines = [
            'File type = "ooTextFile"', 'Object class = "TextGrid"', "",
            "xmin = 0", f"xmax = {total}", "tiers? <exists>", "size = 1",
            "item []:", "    item [1]:", '        class = "IntervalTier"',
            '        name = "phones"', "        xmin = 0",
            f"        xmax = {total}",
            f"        intervals: size = {len(entries)}"]
        for k, (s, e, p) in enumerate(entries):
            lines += [f"        intervals [{k+1}]:",
                      f"            xmin = {s}",
                      f"            xmax = {e}",
                      f'            text = "{p}"']
        (tg_dir / f"utt{u}.TextGrid").write_text("\n".join(lines) + "\n")
    return in_dir, out_dir


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    in_dir, out_dir = _make_corpus(root)
    cfg = PreprocessConfig(
        data_path=str(in_dir), preprocessed_path=str(out_dir),
        val_size=2, audio=AudioConfig())
    pre = Preprocessor(cfg)
    out = pre.build_from_path(seed=7)
    return cfg, out_dir, out


def test_preprocessor_contract(corpus):
    cfg, out_dir, out = corpus
    assert len(out) >= 4
    stats = json.load(open(out_dir / "stats.json"))
    assert set(stats) == {"pitch", "energy"}
    for k in stats:
        vmin, vmax, mean, std = stats[k]
        assert vmin < vmax and std > 0
    speakers = json.load(open(out_dir / "speakers.json"))
    assert speakers == {"spk0": 0}
    train = open(out_dir / "train.txt").read().strip().splitlines()
    val = open(out_dir / "val.txt").read().strip().splitlines()
    assert len(val) == 2 and len(train) == len(out) - 2
    # per-utterance features exist with consistent lengths
    name, spk, text, raw = train[0].split("|")
    mel = np.load(out_dir / "mel" / f"{spk}-mel-{name}.npy")
    pitch = np.load(out_dir / "pitch" / f"{spk}-pitch-{name}.npy")
    energy = np.load(out_dir / "energy" / f"{spk}-energy-{name}.npy")
    assert mel.shape[1] == 80
    assert mel.shape[0] == len(pitch) == len(energy)
    assert text.startswith("{") and text.endswith("}")
    # normalized pitch: roughly zero-centered
    allp = np.concatenate([
        np.load(out_dir / "pitch" / f)
        for f in os.listdir(out_dir / "pitch")])
    assert abs(np.mean(allp[allp != np.float32(0)])) < 5.0


def test_dataset_and_bucket_batcher(corpus):
    cfg, out_dir, out = corpus
    ds = AcousticDataset("train.txt", cfg)
    item = ds[0]
    assert item["text"].dtype == np.int32 and len(item["text"]) > 0
    assert item["mel"].shape[1] == 80

    batcher = BucketBatcher(ds, batch_size=2, text_buckets=(8, 16, 32),
                            mel_buckets=(64, 128, 256), seed=3)
    batches = list(batcher.batches(epoch=0))
    assert len(batches) == batcher.steps_per_epoch()
    seen = set()
    for batch, ids, raws in batches:
        B, L = batch.texts.shape
        assert B == 2 and L in (8, 16, 32)
        assert batch.mels.shape[1] in (64, 128, 256)
        assert np.all(batch.src_lens <= L)
        assert np.all(batch.mel_lens <= batch.mels.shape[1])
        # frame-level pitch/energy padded to the mel cap
        assert batch.pitch.shape == batch.mels.shape[:2]
        seen.update(ids)
    assert seen == {r.split("|")[0] for r in
                    open(out_dir / "train.txt").read().strip().splitlines()}

    # determinism: same epoch -> same schedule; next epoch differs
    b0 = [ids for _, ids, _ in batcher.batches(epoch=0)]
    b0b = [ids for _, ids, _ in batcher.batches(epoch=0)]
    assert b0 == b0b


def test_bucket_batcher_multihost_lockstep(corpus):
    cfg, out_dir, _ = corpus
    ds = AcousticDataset("train.txt", cfg)
    hosts = [BucketBatcher(ds, batch_size=2, text_buckets=(32,),
                           mel_buckets=(256,), seed=5, host_id=h,
                           num_hosts=2) for h in range(2)]
    seqs = [list(b.batches(epoch=1)) for b in hosts]
    assert len(seqs[0]) == len(seqs[1])
    for (ba, ia, _), (bb, ib, _) in zip(*seqs):
        assert ba.texts.shape == bb.texts.shape    # lockstep shapes
        assert len(ia) == len(ib) == 1             # local batch = 1


def test_bucket_batcher_mid_epoch_resume(corpus):
    cfg, out_dir, _ = corpus
    ds = AcousticDataset("train.txt", cfg)
    batcher = BucketBatcher(ds, batch_size=2, text_buckets=(8, 16, 32),
                            mel_buckets=(64, 128, 256), seed=7)
    full = [ids for _, ids, _ in batcher.batches(epoch=2)]
    assert len(full) >= 2
    resumed = [ids for _, ids, _ in batcher.batches(epoch=2, skip=2)]
    assert resumed == full[2:]
    # skipping the whole epoch yields nothing
    assert list(batcher.batches(epoch=2, skip=len(full))) == []


def test_preprocessor_parallel_matches_serial(tmp_path):
    """num_workers=2 must write byte-identical stats to the serial path."""
    import json

    root = tmp_path / "par"
    root.mkdir()
    in_dir, out_dir = _make_corpus(root, n_utts=4)
    cfg = PreprocessConfig(
        data_path=str(in_dir), preprocessed_path=str(out_dir),
        val_size=1, audio=AudioConfig())
    Preprocessor(cfg).build_from_path(seed=7, num_workers=2)
    par_stats = json.load(open(out_dir / "stats.json"))

    root2 = tmp_path / "ser"
    root2.mkdir()
    in_dir2, out_dir2 = _make_corpus(root2, n_utts=4)
    cfg2 = PreprocessConfig(
        data_path=str(in_dir2), preprocessed_path=str(out_dir2),
        val_size=1, audio=AudioConfig())
    Preprocessor(cfg2).build_from_path(seed=7, num_workers=1)
    ser_stats = json.load(open(out_dir2 / "stats.json"))

    np.testing.assert_allclose(par_stats["pitch"], ser_stats["pitch"],
                               rtol=1e-9)
    np.testing.assert_allclose(par_stats["energy"], ser_stats["energy"],
                               rtol=1e-9)
    assert (out_dir / "train.txt").read_text() \
        == (out_dir2 / "train.txt").read_text()


def test_preprocessor_phoneme_level_features(tmp_path):
    """phoneme_level pitch/energy (reference preprocessor.py:197-227):
    frame values averaged per phoneme (pitch with unvoiced-gap interp), so
    stored arrays have one value per phoneme; the bucketed collate then
    pads them to the text cap, not the mel cap."""
    in_dir, out_dir = _make_corpus(tmp_path, n_utts=4)
    cfg = PreprocessConfig(
        data_path=str(in_dir), preprocessed_path=str(out_dir),
        val_size=1, audio=AudioConfig(),
        pitch_feature="phoneme_level", energy_feature="phoneme_level")
    out = Preprocessor(cfg).build_from_path(seed=3)
    assert len(out) >= 3

    import dataclasses
    from smart_nar_fast_tts_tpu.config import FeatureStats
    cfg = dataclasses.replace(cfg, stats=FeatureStats.from_stats_json(
        str(out_dir / "stats.json")))
    ds = AcousticDataset("train.txt", cfg)
    for i in range(len(ds)):
        item = ds[i]
        n_phones = len(item["text"])
        assert item["pitch"].shape == (n_phones,)
        assert item["energy"].shape == (n_phones,)
        assert item["mel"].shape[0] > n_phones    # frames ≫ phones

    b = BucketBatcher(ds, batch_size=2, text_buckets=(16,),
                      mel_buckets=(256,))
    batch, ids, raws = next(iter(b.batches(0)))
    assert batch.pitch.shape == (2, 16)           # text cap, not mel cap
    assert batch.energy.shape == (2, 16)
    assert batch.mels.shape == (2, 256, 80)


def test_phoneme_average_oracle():
    """_phoneme_average against hand-computed reference semantics
    (preprocessor.py:197-227): pitch interpolates unvoiced gaps first,
    energy does not; values averaged over each phoneme's frame span."""
    from smart_nar_fast_tts_tpu.data.preprocessor import _phoneme_average

    pitch = np.array([0.0, 100.0, 0.0, 200.0, 0.0, 0.0], np.float32)
    durations = [2, 3, 1]
    # interp over nonzero support [1:100, 3:200] -> [100,100,150,200,200,200]
    # phoneme means: [100,100] -> 100; [150,200,200] -> 550/3; [200] -> 200
    got = _phoneme_average(pitch, durations, interpolate=True)
    np.testing.assert_allclose(got, [100.0, 550.0 / 3.0, 200.0], rtol=1e-6)

    energy = np.array([1.0, 3.0, 2.0, 4.0, 6.0, 8.0], np.float32)
    got = _phoneme_average(energy, durations, interpolate=False)
    np.testing.assert_allclose(got, [2.0, 4.0, 8.0], rtol=1e-6)
