"""End-of-training quality evaluation for QUALITY.md.

Given a trained experiment dir (frozen config.json + checkpoints) and the
quality-corpus dumps, produces:

1. reconstruction quality: batched AR decodes (fused Pallas path) of dev
   and test utterances conditioned on their own MFCCs, scored against the
   ground-truth waveform with mel-spectrogram L1 and mel-cepstral
   distortion (MCD, dB) — the standard objective proxies for the
   challenge's human MOS/CER (reference publishes MOS 4.06 / CER 0.15,
   /root/reference/README.md:2);
2. training curves (loss / VQ perplexity) from metrics.jsonl -> PNG;
3. the full ZeroSpeech submission tree: ABX txt export + bitrate.json
   (CLI infer) and voice-conversion wavs (CLI synthesize).

Run: timeout 3600 python /root/repo/scripts/quality_eval.py <exp_dir> <quality_root>
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from wavenet_autoencoders_tpu import dsp
from wavenet_autoencoders_tpu.config import Config
from wavenet_autoencoders_tpu.data.manifest import Manifest
from wavenet_autoencoders_tpu.eval.synthesize import batch_wavegen
from wavenet_autoencoders_tpu.cli.main import _load_model


def mcd_db(mfcc_a: np.ndarray, mfcc_b: np.ndarray) -> float:
    """Mel-cepstral distortion in dB over c1..c12 (frame-aligned).

    ``dsp.mfcc`` cepstra come from the dB-scaled POWER mel spectrum
    (librosa convention); the classic MCD formula expects natural-log
    MAGNITUDE cepstra, so rescale by ln(10)/10 (dB -> ln) and 1/2
    (power -> magnitude) first — without this the reported values are
    inflated ~8.7x (rounds 1-4 published 400-700 'dB'). Values remain
    above classic SPTK-envelope MCD (~5-8 dB for good vocoders) because
    80-bin DCT cepstra keep spectral detail a smoothed envelope drops
    and the comparison is frame-locked (no DTW) on stochastically
    sampled audio; the mismatched-GT calibration row anchors the scale."""
    n = min(len(mfcc_a), len(mfcc_b))
    scale = np.log(10.0) / 10.0 / 2.0
    d = scale * (mfcc_a[:n, 1:13] - mfcc_b[:n, 1:13])
    return float((10.0 / np.log(10)) * np.mean(np.sqrt(2.0 * np.sum(d * d, axis=1))))


def mel_l1(cfg, wav_a: np.ndarray, wav_b: np.ndarray) -> float:
    n = min(len(wav_a), len(wav_b))
    ma = dsp.logmelspectrogram(wav_a[:n], cfg)
    mb = dsp.logmelspectrogram(wav_b[:n], cfg)
    return float(np.mean(np.abs(ma - mb)))


def reconstruction_metrics(
    cfg, model, params, state, dump_root, n_utts=12, out_dir=None,
    max_frames: int | None = None,
):
    man = Manifest.read(dump_root)
    utts = man.utterances[:n_utts]
    hop = cfg.get_hop_size()
    upf = int(np.prod(cfg.upsample_scales))
    rows = []
    for u in utts:
        wave_codes = np.load(u.path("wave"))
        feats = np.load(u.path("mfcc", norm=True)).astype(np.float32)
        if max_frames is not None:
            ds = 100 // cfg.frame_rate
            mf = (max_frames // ds) * ds
            feats = feats[:mf]
            wave_codes = wave_codes[: mf * hop]
        gt = dsp.inv_mulaw_quantize(
            wave_codes.astype(np.float32), cfg.quantize_channels - 1
        )
        g = u.speaker_id if u.speaker_id >= 0 else None
        wav = batch_wavegen(
            cfg, model, params, state, feats[None],
            None if g is None else np.array([g], np.int32),
            key=jax.random.PRNGKey(0),
        )[0]
        # the upsampler trims cin_pad latent frames each side: decoded
        # audio aligns with gt starting at cin_pad latent frames
        ds = 100 // cfg.frame_rate
        off = cfg.cin_pad * ds * hop if cfg.upsample_conditional_features else 0
        gt_a = gt[off : off + len(wav)]
        m_mcd = mcd_db(
            dsp.mfcc(gt_a, cfg).T, dsp.mfcc(wav[: len(gt_a)], cfg).T
        )
        m_l1 = mel_l1(cfg, gt_a, wav[: len(gt_a)])
        rows.append({"utt": u.prefix, "mcd_db": m_mcd, "mel_l1": m_l1,
                     "dur_sec": len(wav) / cfg.sample_rate})
        if out_dir is not None:
            Path(out_dir).mkdir(parents=True, exist_ok=True)
            name = Path(u.prefix.rstrip("/")).name
            dsp.save_wav(wav, Path(out_dir) / f"{name}_decoded.wav", cfg.sample_rate)
            dsp.save_wav(gt_a, Path(out_dir) / f"{name}_ref.wav", cfg.sample_rate)
        print(f"{u.prefix}: MCD {m_mcd:.2f} dB, mel-L1 {m_l1:.3f}", flush=True)
    _ = upf
    return rows


def plot_curves(exp_dir: Path, out_png: Path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    recs = [json.loads(l) for l in (exp_dir / "logs/metrics.jsonl").read_text().splitlines()]
    tr = [r for r in recs if r.get("phase") == "train_no_dev" and "loss" in r]
    dv = [r for r in recs if r.get("phase") == "dev" and "loss" in r]
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    axes[0].plot([r["step"] for r in tr], [r["loss"] for r in tr], lw=0.8, label="train")
    if dv:
        axes[0].plot([r["step"] for r in dv], [r["loss"] for r in dv], ".-", label="dev")
    axes[0].set_title("loss (CE, nats)"); axes[0].set_xlabel("step"); axes[0].legend()
    axes[1].plot([r["step"] for r in tr], [r["perplexity"] for r in tr], lw=0.8)
    axes[1].set_title("VQ codebook perplexity"); axes[1].set_xlabel("step")
    axes[2].plot([r["step"] for r in tr], [r["aux_loss"] for r in tr], lw=0.8)
    axes[2].set_title("VQ aux loss"); axes[2].set_xlabel("step")
    for ax in axes:
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    print(f"curves -> {out_png}")
    return tr, dv


def main():
    exp_dir = Path(sys.argv[1])
    qroot = Path(sys.argv[2])
    n_utts = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    max_frames = int(sys.argv[4]) if len(sys.argv) > 4 else None
    exp_dir = exp_dir.resolve()
    qroot = qroot.resolve()
    os.chdir(qroot)  # manifests carry quality-root-relative prefixes
    cfg = Config.load(exp_dir / "config.json")
    # "auto": EMA shadow only once warm (step >= 5/(1-decay)); a young
    # shadow is mostly random init (the round-4 stale-EMA eval bug).
    ckpt = os.environ.get("QE_CKPT", "checkpoint_latest.npz")
    model, params, state = _load_model(
        cfg, str(exp_dir / ckpt),
        use_ema={"auto": "auto", "1": True, "0": False}[os.environ.get("QE_EMA", "auto")],
    )

    out = {"exp": str(exp_dir)}
    tr, dv = plot_curves(exp_dir, exp_dir / "curves.png")
    out["train_loss_first"] = tr[0]["loss"] if tr else None
    out["train_loss_last"] = tr[-1]["loss"] if tr else None
    out["final_perplexity"] = tr[-1]["perplexity"] if tr else None
    if dv:
        out["dev_loss_last"] = dv[-1]["loss"]

    print("== reconstruction: dev ==")
    dev_rows = reconstruction_metrics(
        cfg, model, params, state, qroot / "dump/2019/english/dev",
        n_utts=n_utts, out_dir=exp_dir / "recon_dev", max_frames=max_frames,
    )
    print("== reconstruction: test ==")
    test_rows = reconstruction_metrics(
        cfg, model, params, state, qroot / "dump/2019/english/test",
        n_utts=n_utts, out_dir=exp_dir / "recon_test", max_frames=max_frames,
    )
    for name, rows in [("dev", dev_rows), ("test", test_rows)]:
        out[f"{name}_mcd_db_mean"] = float(np.mean([r["mcd_db"] for r in rows]))
        out[f"{name}_mel_l1_mean"] = float(np.mean([r["mel_l1"] for r in rows]))
    out["test_note"] = (
        "test speakers are UNSEEN (challenge setup): their speaker "
        "embeddings are untrained, so own-speaker test reconstruction is "
        "expected to be poor and is reported for completeness only. "
        "Fidelity is measured on dev (seen speakers); test-content "
        "quality is measured by the voice-conversion submission path "
        "(trained target voices), as in the reference."
    )

    # calibration floor/ceiling for the MCD scale used here (dsp.mfcc
    # cepstra): mismatched ground-truth pairs = "unrelated audio" ceiling
    man = Manifest.read(qroot / "dump/2019/english/test")
    gts = []
    for u in man.utterances[:6]:
        w = np.load(u.path("wave")).astype(np.float32)
        gts.append(dsp.inv_mulaw_quantize(w, cfg.quantize_channels - 1))
    mis = [
        mcd_db(dsp.mfcc(gts[i], cfg).T, dsp.mfcc(gts[(i + 1) % len(gts)], cfg).T)
        for i in range(len(gts))
    ]
    out["mcd_db_mismatched_gt_pairs"] = float(np.mean(mis))
    mis_l1 = [
        mel_l1(cfg, gts[i], gts[(i + 1) % len(gts)]) for i in range(len(gts))
    ]
    out["mel_l1_mismatched_gt_pairs"] = float(np.mean(mis_l1))
    (exp_dir / "quality_metrics.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
