"""Machine ABX discriminability on the exported representations.

The ZeroSpeech toolkit (`zerospeech2020-evaluate`) is not installable here
(zero egress), so this computes the same style of metric on the synthetic
test corpus, whose ground-truth phone alignments the generator wrote
(`test_phone_labels.json`): segment-level across-speaker and
within-speaker ABX error, plus the MFCC input features as the baseline
(the challenge's own baseline representation).

ABX (Schatz-style, segment means, cosine distance): for a phone pair
(p, q), A and B are p/q segments from the same speaker, X is a p segment
from the OTHER speaker (across-speaker) or the same speaker, different
utterance (within-speaker). Error = fraction of triplets with
d(X, A) >= d(X, B). Lower is better; chance = 50%.

Usage:
  python scripts/abx_proxy.py <abx_txt_dir> <labels_json> <test_dump_dir> [frame_rate]
"""
from __future__ import annotations

import json
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np


def load_segments(vec_per_utt: dict, labels: dict, rate_hz: float):
    """-> list of (phone, speaker, mean_vector)."""
    segs = []
    for utt, mat in vec_per_utt.items():
        spk = utt.split("_")[0]
        for ph, t0, t1 in labels.get(utt, []):
            a, b = int(np.floor(t0 * rate_hz)), int(np.ceil(t1 * rate_hz))
            b = min(b, len(mat))
            if b - a < 1:
                continue
            segs.append((ph, spk, utt, mat[a:b]))
    return segs


def cosd(a, b):
    na = np.linalg.norm(a) + 1e-9
    nb = np.linalg.norm(b) + 1e-9
    return 1.0 - float(np.dot(a, b) / (na * nb))


def dtw_cosd(A: np.ndarray, B: np.ndarray) -> float:
    """Mean cosine distance along the DTW alignment path of two (T, D)
    segments — the ZS19 toolkit's distance (DTW + frame-wise angular
    distance) rather than segment means."""
    na = A / (np.linalg.norm(A, axis=1, keepdims=True) + 1e-9)
    nb = B / (np.linalg.norm(B, axis=1, keepdims=True) + 1e-9)
    d = 1.0 - na @ nb.T  # (Ta, Tb) local distances
    Ta, Tb = d.shape
    acc = np.full((Ta + 1, Tb + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, Ta + 1):
        for j in range(1, Tb + 1):
            acc[i, j] = d[i - 1, j - 1] + min(
                acc[i - 1, j], acc[i, j - 1], acc[i - 1, j - 1]
            )
    # normalize by path length (approximate with max(Ta, Tb))
    return float(acc[Ta, Tb] / max(Ta, Tb))


def abx_error(segs, across_speaker: bool, n_triplets=20000, seed=0, dtw=False):
    rng = np.random.default_rng(seed)
    by = defaultdict(list)
    for ph, spk, utt, v in segs:
        by[(ph, spk)].append((utt, v))
    phones = sorted({ph for ph, _, _, _ in segs})
    speakers = sorted({spk for _, spk, _, _ in segs})
    err, n = 0, 0
    trials = 0
    while n < n_triplets and trials < n_triplets * 20:
        trials += 1
        p, q = rng.choice(phones, 2, replace=False)
        if across_speaker:
            if len(speakers) < 2:
                break
            s1, s2 = rng.choice(speakers, 2, replace=False)
        else:
            s1 = s2 = rng.choice(speakers)
        A_pool, B_pool, X_pool = by.get((p, s1)), by.get((q, s1)), by.get((p, s2))
        if not A_pool or not B_pool or not X_pool:
            continue
        ua, va = A_pool[rng.integers(len(A_pool))]
        ub, vb = B_pool[rng.integers(len(B_pool))]
        ux, vx = X_pool[rng.integers(len(X_pool))]
        if not across_speaker and (ux == ua):
            continue  # within-speaker X must come from a different utterance
        if dtw:
            err += dtw_cosd(vx, va) >= dtw_cosd(vx, vb)
        else:
            err += cosd(vx.mean(0), va.mean(0)) >= cosd(vx.mean(0), vb.mean(0))
        n += 1
    return 100.0 * err / max(n, 1), n


def main():
    abx_dir = Path(sys.argv[1])
    labels = json.load(open(sys.argv[2]))
    dump_dir = Path(sys.argv[3])
    frame_rate = float(sys.argv[4]) if len(sys.argv) > 4 else 25.0

    lat = {}
    for f in sorted(abx_dir.glob("*.txt")):
        lat[f.stem] = np.loadtxt(f, ndmin=2)
    assert lat, f"no txt exports under {abx_dir}"

    mfcc = {}
    for utt in lat:
        p = dump_dir / utt / "mfcc.norm.npy"
        if p.exists():
            mfcc[utt] = np.load(p)

    out = {}
    for name, vecs, rate in [
        ("latents", lat, frame_rate),
        ("mfcc_baseline", mfcc, 100.0),
    ]:
        segs = load_segments(vecs, labels, rate)
        across, n_a = abx_error(segs, across_speaker=True)
        within, n_w = abx_error(segs, across_speaker=False)
        across_d, _ = abx_error(segs, across_speaker=True, n_triplets=4000, dtw=True)
        within_d, _ = abx_error(segs, across_speaker=False, n_triplets=4000, dtw=True)
        out[name] = {
            "abx_across_speaker_err_pct": round(across, 2),
            "abx_within_speaker_err_pct": round(within, 2),
            "abx_dtw_across_speaker_err_pct": round(across_d, 2),
            "abx_dtw_within_speaker_err_pct": round(within_d, 2),
            "n_segments": len(segs),
            "n_triplets": [n_a, n_w],
        }
        print(f"{name:14s} across-spk ABX err {across:5.2f}%  "
              f"within-spk {within:5.2f}%  "
              f"(DTW: {across_d:5.2f}/{within_d:5.2f})  ({len(segs)} segments)")
    print(json.dumps(out))
    (abx_dir.parent / "abx_proxy.json").write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
