"""Objective speaker-identity check for voice-conversion outputs.

Median autocorrelation-F0 of (a) source test utterances, (b) the target
voice's natural utterances, (c) the VC outputs. A working conversion
moves (c) to the target's F0 register, away from the source's — the
cheapest objective correlate of the challenge's human speaker-similarity
judgment available offline.

Usage: python scripts/vc_f0_check.py <qroot> <syn_out_dir> <target_spk>
Writes <syn_out_dir>/vc_f0_check.json.
"""
from __future__ import annotations

import glob
import json
import sys

import numpy as np
from scipy.io import wavfile


def median_f0(path, fmin=70.0, fmax=320.0):
    sr, y = wavfile.read(path)
    y = y.astype(np.float64) / 32768.0
    frame, hop = 640, 320
    f0s = []
    for i in range(0, len(y) - frame, hop):
        seg = y[i : i + frame]
        if np.sqrt((seg**2).mean()) < 0.02:  # skip silence/noise frames
            continue
        seg = seg - seg.mean()
        ac = np.correlate(seg, seg, "full")[frame - 1 :]
        ac /= ac[0] + 1e-12
        lo, hi = int(sr / fmax), int(sr / fmin)
        k = lo + np.argmax(ac[lo:hi])
        if ac[k] > 0.45:  # voicing confidence
            f0s.append(sr / k)
    return float(np.median(f0s)) if f0s else float("nan")


def pool_stats(files):
    f0s = [median_f0(f) for f in files]
    f0s = [f for f in f0s if np.isfinite(f)]
    return {
        "median_f0_hz": round(float(np.median(f0s)), 1),
        "iqr_hz": [round(float(np.percentile(f0s, q)), 1) for q in (25, 75)],
        "n_utts": len(f0s),
    }


def main():
    qroot, syn_dir, tgt = sys.argv[1], sys.argv[2], sys.argv[3]
    out = {
        "source_test": pool_stats(
            sorted(glob.glob(f"{qroot}/raw/english/test/*.wav"))[:12]
        ),
        "target_natural": pool_stats(
            sorted(glob.glob(f"{qroot}/raw/english/train/voice/{tgt}_*.wav"))[:12]
        ),
        "vc_output": pool_stats(
            sorted(glob.glob(f"{syn_dir}/2019/english/test/{tgt}_*.wav"))
        ),
    }
    print(json.dumps(out, indent=1))
    with open(f"{syn_dir}/vc_f0_check.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
