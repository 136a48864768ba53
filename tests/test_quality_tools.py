"""Unit tests for the quality-run tooling (scripts/): corpus generator and
the MCD / mel-L1 reconstruction metrics used by QUALITY.md."""
import os
import sys

import numpy as np
import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")
sys.path.insert(0, os.path.abspath(SCRIPTS))


def test_synth_corpus_utterance_properties():
    from make_synth_corpus import SR, speaker_profile, synth_utterance

    rng = np.random.default_rng(0)
    spk = speaker_profile(rng, "f")
    y, phones = synth_utterance(rng, spk, n_phones=12)
    assert y.dtype == np.float32
    assert np.abs(y).max() <= 1.0
    assert len(y) > SR  # at least a second
    assert len(phones) == 12
    # voiced speech-like content: strong energy below 4 kHz
    f = np.abs(np.fft.rfft(y.astype(np.float64)))
    fr = np.fft.rfftfreq(len(y), 1 / SR)
    low = f[fr < 4000].sum()
    assert low / f.sum() > 0.7


def test_synth_corpus_speakers_differ():
    from make_synth_corpus import speaker_profile, synth_utterance

    rng = np.random.default_rng(1)
    a = speaker_profile(rng, "m")
    b = speaker_profile(rng, "f")
    assert abs(a["f0"] - b["f0"]) > 20  # male/female F0 ranges are disjoint


def test_mcd_zero_for_identical_and_positive_otherwise():
    from quality_eval import mcd_db

    rng = np.random.default_rng(0)
    a = rng.standard_normal((50, 39))
    assert mcd_db(a, a) == 0.0
    b = a + rng.standard_normal((50, 39)) * 0.1
    assert mcd_db(a, b) > 0.0
    # known value: constant offset d on every coefficient c1..c12.
    # Inputs are dB-scale POWER-spectrum cepstra (dsp.mfcc convention);
    # mcd_db rescales them by ln(10)/10/2 to natural-log magnitude
    # cepstra before applying the classic formula.
    d = 0.3
    c = a.copy()
    c[:, 1:13] += d
    scale = np.log(10.0) / 10.0 / 2.0
    expect = (10.0 / np.log(10)) * np.sqrt(2 * 12 * (scale * d) ** 2)
    np.testing.assert_allclose(mcd_db(a, c), expect, rtol=1e-6)


def test_mel_l1_zero_for_identical():
    from quality_eval import mel_l1
    from wavenet_autoencoders_tpu.config import load_preset

    cfg = load_preset("svqwae")
    rng = np.random.default_rng(0)
    w = rng.uniform(-0.5, 0.5, 16000).astype(np.float32)
    assert mel_l1(cfg, w, w) == 0.0
    assert mel_l1(cfg, w, np.roll(w, 200)) > 0.01


def test_abx_proxy_separable_vs_random():
    from abx_proxy import abx_error, load_segments
    import numpy as np

    rng = np.random.default_rng(0)
    phones = ["a", "e", "i", "o"]
    # perfectly separable: each phone has a distinct direction; speakers
    # add a small offset
    dirs = {p: np.eye(8)[i] for i, p in enumerate(phones)}
    segs, segs_rand = [], []
    # abx_error takes (T, D) segment matrices (frame sequences), not mean
    # vectors: give each segment a few noisy frames around its direction
    for spk in ["S090", "S091"]:
        off = rng.standard_normal(8) * 0.05
        for k in range(40):
            p = phones[k % 4]
            T = int(rng.integers(2, 6))
            frames = dirs[p] + off + rng.standard_normal((T, 8)) * 0.02
            segs.append((p, spk, f"{spk}_{k}", frames))
            segs_rand.append((p, spk, f"{spk}_{k}", rng.standard_normal((T, 8))))
    err, n = abx_error(segs, across_speaker=True, n_triplets=2000)
    assert n > 500 and err < 5.0, (err, n)
    err_r, n_r = abx_error(segs_rand, across_speaker=True, n_triplets=2000)
    assert 35.0 < err_r < 65.0, (err_r, n_r)


def test_abx_load_segments_frame_windows():
    from abx_proxy import load_segments
    import numpy as np

    mat = np.arange(10)[:, None].astype(float)  # 10 frames at 25 Hz
    labels = {"S090_1": [["a", 0.0, 0.08], ["e", 0.08, 0.4]]}
    segs = load_segments({"S090_1": mat}, labels, 25.0)
    assert len(segs) == 2
    # first segment covers frames 0..2 (a (2, 1) matrix, mean 0.5)
    assert segs[0][0] == "a" and segs[0][3].shape == (2, 1)
    assert abs(segs[0][3].mean() - 0.5) < 1e-9
