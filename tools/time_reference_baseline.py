"""Measure the reference's AR synthesis throughput on this host (CPU torch).

VERDICT r1 item #6: ``bench.py``'s ``vs_baseline`` used an *assumed*
reference throughput. This times the actual reference code — the per-sample
Python loop at ``/root/reference/wavenet_vocoder/wavenet.py:299-339``
(``incremental_forward``) at the flagship ``hps/vqwae.json`` decoder shapes
(20 layers / 2 stacks / 256 residual+gate+skip, cin 64, gin 32,
mu-law-quantize softmax sampling) — and records the measured samples/sec
into ``BASELINE_MEASURED.json`` for bench.py's denominator.

Run: python tools/time_reference_baseline.py  (CPU-only; ~1 min)
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main():
    sys.path.insert(0, "/root/reference")
    import torch

    torch.set_num_threads(max(1, torch.get_num_threads()))
    from wavenet_vocoder import WaveNet

    # hps/vqwae.json:24-44 decoder shapes; upsampling is a one-time pre-pass
    # (not part of the per-sample loop), so conditioning is passed already
    # at sample rate like the repeat path of synthesis.py:338-339.
    model = WaveNet(
        out_channels=256,
        layers=20,
        stacks=2,
        residual_channels=256,
        gate_channels=256,
        skip_out_channels=256,
        kernel_size=3,
        dropout=0.0,
        cin_channels=64,
        gin_channels=32,
        n_speakers=153,
        upsample_conditional_features=False,
        scalar_input=False,
        use_speaker_embedding=True,
    )
    model.eval()
    model.make_generation_fast_()

    B, warm, T = 1, 32, 256
    c = torch.randn(B, 64, warm + T)
    g = torch.zeros(B, dtype=torch.long)

    with torch.no_grad():
        model.incremental_forward(
            c=c[..., : warm], g=g, T=warm, softmax=True, quantize=True,
            tqdm=lambda x: x,
        )
        model.clear_buffer()
        t0 = time.perf_counter()
        model.incremental_forward(
            c=c, g=g, T=warm + T, softmax=True, quantize=True, tqdm=lambda x: x,
        )
        dt = time.perf_counter() - t0

    sps = (warm + T) * B / dt
    out = {
        "reference_incremental_samples_per_sec": round(sps, 2),
        "reference_incremental_audio_sec_per_sec": round(sps / 16000.0, 6),
        "batch": B,
        "steps_timed": warm + T,
        "host": "cpu torch " + torch.__version__,
        "source": "/root/reference/wavenet_vocoder/wavenet.py:299-339 via incremental_forward",
    }
    (REPO / "BASELINE_MEASURED.json").write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
