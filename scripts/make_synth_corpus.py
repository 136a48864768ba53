"""Formant-synthesized multi-speaker corpus in ZeroSpeech-2019 layout.

No real speech exists in this container (zero egress), so the quality run
(QUALITY.md) trains on generated speech-LIKE audio: a shared phoneme
inventory (vowel formant triples + fricative noise units) rendered through
per-speaker source-filter parameters (base F0, vocal-tract length scaling,
breathiness). Content units are speaker-independent while speaker identity
colors F0 and formant positions — exactly the structure the IN/SVQ
bottlenecks are built to disentangle.

Synthesis: phase-continuous harmonic oscillator bank (cumsum phase of an
F0 track with declination + jitter) with per-sample harmonic amplitudes
sampled from the formant envelope, plus envelope-shaped noise (STFT
coloring) for aspiration/fricatives. Writes
  <root>/english/train/unit/S0xx_<id>.wav     (content speakers)
  <root>/english/train/voice/V00x_<id>.wav    (voice-conversion targets)
  <root>/english/test/S09x_<id>.wav           (held-out utterances)
plus synthesis.txt pairs for the VC stage.

Usage: python scripts/make_synth_corpus.py <out_root> [--n-unit 600]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
from scipy.io import wavfile

SR = 16000

# shared phoneme inventory: (F1, F2, F3) Hz for a neutral vocal tract
VOWELS = {
    "a": (800, 1200, 2500),
    "e": (500, 1900, 2500),
    "i": (300, 2300, 3000),
    "o": (450, 800, 2500),
    "u": (325, 700, 2530),
    "ae": (660, 1700, 2400),
    "ə": (500, 1500, 2500),
    "ɔ": (570, 840, 2410),
}
# fricative-ish units: (center, bandwidth) of the noise peak, voiced?
FRICS = {
    "s": (6000, 2000, False),
    "sh": (3500, 1500, False),
    "f": (4500, 3500, False),
    "z": (5500, 2000, True),
    "h": (1500, 2500, False),
}
PHONES = list(VOWELS) + list(FRICS)


def speaker_profile(rng: np.random.Generator, kind: str) -> dict:
    return {
        "f0": float(rng.uniform(95, 145) if kind == "m" else rng.uniform(175, 235)),
        # vocal-tract length scaling moves all formants together
        "vtl": float(rng.uniform(0.82, 1.18)),
        "breath": float(rng.uniform(0.01, 0.05)),
        "tilt": float(rng.uniform(-9.0, -5.0)),  # dB/octave spectral tilt
    }


def formant_envelope(freqs: np.ndarray, formants, bws=(90.0, 110.0, 170.0)) -> np.ndarray:
    """Sum of resonance magnitude responses + spectral tilt, evaluated at
    ``freqs``; (nF,) or (T, nF) if formants is (T, 3)."""
    formants = np.asarray(formants, np.float64)
    out = 0.0
    for j, bw in enumerate(bws):
        fc = formants[..., j : j + 1]
        out = out + 1.0 / (1.0 + ((freqs - fc) / (bw * 1.5)) ** 2)
    return out


# phone-duration range (s) and coarticulation-smoothing width (10 ms frames).
# Defaults reproduce the round-3 run-A/B corpora; shorter/sharper settings
# raise the predictive value of the conditioning for the AR decoder (the
# anti-bottleneck-collapse lever identified by runs A/B).
DUR_RANGE = (0.07, 0.22)
SMOOTH_W = 9


def synth_utterance(rng: np.random.Generator, spk: dict, n_phones: int | None = None,
                    dur_range=None, smooth_w=None):
    """Returns (waveform, segments) where segments is a list of
    (phone, start_sec, end_sec) — ground-truth alignments for ABX-style
    evaluation of learned representations. No rng draws depend on the
    bookkeeping, so corpora regenerate byte-identically per seed."""
    dur_range = DUR_RANGE if dur_range is None else dur_range
    smooth_w = SMOOTH_W if smooth_w is None else smooth_w
    if n_phones is None:
        # keep utterances ~1.5-3.2 s regardless of the phone-duration range
        avg = 0.5 * (dur_range[0] + dur_range[1])
        lo = max(int(1.5 / avg), 4)
        hi = max(int(3.2 / avg), lo + 1)  # rng.integers needs high > low
        n_phones = int(rng.integers(lo, hi))
    phones = [PHONES[i] for i in rng.integers(0, len(PHONES), n_phones)]
    durs = rng.uniform(dur_range[0], dur_range[1], n_phones)
    # 10 ms control frames
    hop = SR // 100
    n_frames = int(np.ceil(durs.sum() * 100)) + 10
    T = n_frames * hop

    # per-frame targets
    f_formants = np.zeros((n_frames, 3))
    f_voiced = np.zeros(n_frames)
    f_noise_env = np.zeros((n_frames, 2))  # (center, bw) for frics
    f_amp = np.zeros(n_frames)
    pos = 0.0
    for ph, dur in zip(phones, durs):
        a, b = int(pos * 100), int((pos + dur) * 100)
        b = min(b, n_frames)
        if ph in VOWELS:
            f_formants[a:b] = np.array(VOWELS[ph]) * spk["vtl"]
            f_voiced[a:b] = 1.0
            f_amp[a:b] = rng.uniform(0.6, 1.0)
        else:
            c, bw, voiced = FRICS[ph]
            f_formants[a:b] = np.array([500, 1500, 2500]) * spk["vtl"]
            f_noise_env[a:b] = (c * spk["vtl"], bw)
            f_voiced[a:b] = 0.35 if voiced else 0.0
            f_amp[a:b] = rng.uniform(0.25, 0.5)
        pos += dur
    # lead-in/out silence + random pauses
    f_amp[: int(rng.uniform(5, 12))] = 0.0
    f_amp[-int(rng.uniform(5, 12)) :] = 0.0

    # smooth everything (coarticulation) with a short moving average
    def smooth(x, w=7):
        k = np.hanning(w)
        k /= k.sum()
        if x.ndim == 1:
            return np.convolve(x, k, mode="same")
        return np.stack([np.convolve(x[:, j], k, mode="same") for j in range(x.shape[1])], 1)

    f_formants = smooth(f_formants, smooth_w)
    f_amp = smooth(f_amp, smooth_w)
    f_voiced = smooth(f_voiced, smooth_w)

    # F0 track: declination + slow wander + jitter
    f0 = spk["f0"] * (1.0 - 0.18 * np.linspace(0, 1, n_frames))
    f0 *= 1.0 + 0.06 * smooth(rng.standard_normal(n_frames), 31)
    f0 = np.clip(f0, 60, 400)

    # upsample controls to sample rate
    t_f = np.arange(n_frames) * hop
    t_s = np.arange(T)
    f0_s = np.interp(t_s, t_f, f0)
    amp_s = np.interp(t_s, t_f, f_amp)
    voiced_s = np.interp(t_s, t_f, f_voiced)
    form_s = np.stack([np.interp(t_s, t_f, f_formants[:, j]) for j in range(3)], 1)

    # harmonic bank with per-sample amplitudes from the formant envelope
    phase = np.cumsum(2 * np.pi * f0_s / SR)
    n_harm = int(SR / 2 / f0.max()) - 1
    y = np.zeros(T)
    ks = np.arange(1, n_harm + 1)
    tilt = 10 ** (spk["tilt"] * np.log2(ks) / 20.0)
    for k, tl in zip(ks, tilt):
        fk = k * f0_s
        ak = formant_envelope(fk[:, None], form_s)[:, 0] * tl
        ak = np.where(fk < SR / 2 - 200, ak, 0.0)
        y += ak * np.sin(k * phase)
    y *= amp_s * voiced_s

    # noise source: aspiration (envelope-shaped) + fricative peaks
    noise = rng.standard_normal(T)
    spec = np.fft.rfft(noise)
    freqs = np.fft.rfftfreq(T, 1 / SR)
    env_mean = formant_envelope(freqs, form_s.mean(0))
    aspir = np.fft.irfft(spec * env_mean, T) * amp_s * spk["breath"] * 6.0
    nz_c = np.interp(t_s, t_f, f_noise_env[:, 0])
    nz_bw = np.interp(t_s, t_f, np.maximum(f_noise_env[:, 1], 1.0))
    fric_gate = (nz_c > 100).astype(np.float64)
    # cheap time-varying band-pass: modulate white noise by a cosine at the
    # center frequency and low-pass via moving average of width ~SR/bw
    lp = smooth(rng.standard_normal(T), 15)
    fric = lp * np.cos(np.cumsum(2 * np.pi * nz_c / SR)) * fric_gate
    fric *= amp_s * 0.9 * (1.0 - voiced_s * 0.5)
    _ = nz_bw  # bandwidth folded into the fixed 15-tap low-pass

    y = y + aspir + fric
    y = y / (np.abs(y).max() + 1e-6) * rng.uniform(0.55, 0.8)
    segs = []
    pos = 0.0
    for ph, dur in zip(phones, durs):
        segs.append((ph, round(pos, 4), round(min(pos + dur, T / SR), 4)))
        pos += dur
    return y.astype(np.float32), segs


def write_wav(path: Path, y: np.ndarray):
    path.parent.mkdir(parents=True, exist_ok=True)
    wavfile.write(path, SR, (np.clip(y, -1, 1) * 32767).astype(np.int16))


def _render_one(job):
    """(path, spk_profile, seed_tuple, want_segs, dur_range, smooth_w) ->
    segments or None. Per-utterance rng: order- and count-independent
    regeneration. dur_range/smooth_w travel in the job tuple so workers see
    the CLI values under any multiprocessing start method (spawn included),
    not just fork-inherited globals."""
    path, spk, seed_tuple, want_segs, dur_range, smooth_w = job
    rng = np.random.default_rng(seed_tuple)
    y, segs = synth_utterance(rng, spk, dur_range=dur_range, smooth_w=smooth_w)
    write_wav(path, y)
    return segs if want_segs else None


def main():
    global DUR_RANGE, SMOOTH_W
    ap = argparse.ArgumentParser()
    ap.add_argument("out_root")
    ap.add_argument("--n-unit", type=int, default=600)
    ap.add_argument("--n-voice", type=int, default=60)
    ap.add_argument("--n-test", type=int, default=40)
    ap.add_argument("--n-spk", type=int, default=8, help="unit speakers")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--jobs", type=int, default=2)
    ap.add_argument("--dur-min", type=float, default=DUR_RANGE[0])
    ap.add_argument("--dur-max", type=float, default=DUR_RANGE[1])
    ap.add_argument("--smooth-w", type=int, default=SMOOTH_W)
    args = ap.parse_args()

    DUR_RANGE = dr = (args.dur_min, args.dur_max)
    SMOOTH_W = sw = args.smooth_w

    root = Path(args.out_root) / "english"
    # speaker profiles from dedicated streams — stable under any counts
    unit_speakers = {
        f"S{i:03d}": speaker_profile(np.random.default_rng([args.seed, 1, i]), "m" if i % 2 else "f")
        for i in range(args.n_spk)
    }
    voice_speakers = {
        f"V00{i+1}": speaker_profile(np.random.default_rng([args.seed, 2, i]), "m" if i else "f")
        for i in range(2)
    }
    test_speakers = {
        f"S09{i}": speaker_profile(np.random.default_rng([args.seed, 3, i]), "m" if i % 2 else "f")
        for i in range(2)
    }

    jobs = []
    for i in range(args.n_unit):
        spk = f"S{i % args.n_spk:03d}"
        jobs.append((root / "train/unit" / f"{spk}_{10000 + i}.wav",
                     unit_speakers[spk], (args.seed, 10, i), False, dr, sw))
    for i in range(args.n_voice):
        spk = f"V00{i % 2 + 1}"
        jobs.append((root / "train/voice" / f"{spk}_{20000 + i}.wav",
                     voice_speakers[spk], (args.seed, 20, i), False, dr, sw))
    test_names, syn_lines = [], []
    for i in range(args.n_test):
        spk = f"S09{i % 2}"
        name = f"{spk}_{30000 + i}"
        test_names.append(name)
        jobs.append((root / "test" / f"{name}.wav",
                     test_speakers[spk], (args.seed, 30, i), True, dr, sw))
        syn_lines.append(f"{name} V00{i % 2 + 1}")

    import json
    from multiprocessing import Pool

    if args.jobs > 1:
        with Pool(args.jobs) as pool:
            results = pool.map(_render_one, jobs, chunksize=16)
    else:
        results = [_render_one(j) for j in jobs]

    labels = {}
    for name, segs in zip(test_names, results[-args.n_test:]):
        labels[name] = [list(s) for s in segs]
    (Path(args.out_root) / "synthesis.txt").write_text("\n".join(syn_lines) + "\n")
    (Path(args.out_root) / "test_phone_labels.json").write_text(json.dumps(labels))
    print(f"wrote {args.n_unit}+{args.n_voice} train, {args.n_test} test wavs -> {root}")


if __name__ == "__main__":
    main()
