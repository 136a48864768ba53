"""Assemble QUALITY.md §3 (results) from the quality-run artifacts.

Reads, from /root/repo/quality:
  exp/svqwae/quality_metrics.json   (scripts/quality_eval.py)
  exp/svqwae/logs/metrics.jsonl     (trainer)
  abx_step*/2019/english/abx_proxy.json + abx_final/... (scripts/abx_proxy.py)
  abx_*/2019/english/test ... bitrate.json              (CLI infer)
  submission validation result                          (CLI validate, run here)

Prints the markdown for §3 to stdout; paste/commit into QUALITY.md.
Usage: python scripts/quality_report.py [exp_rel] [abx_prefix]
  exp_rel    experiment dir relative to quality/ (default exp/svqwae_rf)
  abx_prefix prefix of the ABX export dirs (default abxC) — the script
             scans <prefix>_step*/ plus abx_final/
"""
from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import os
Q = Path(os.environ.get("QR_ROOT", "/root/repo/quality"))
EXP = Q / (sys.argv[1] if len(sys.argv) > 1 else "exp/svqwae_rf")
ABX_PREFIX = sys.argv[2] if len(sys.argv) > 2 else "abxC"


def _abx_dirs():
    """[(tag, dir)] in step order, final last."""
    pairs = sorted(
        ((int(d.name.split("step")[-1]), d)
         for d in Q.glob(f"{ABX_PREFIX}_step*") if d.is_dir()),
    )
    out = [(f"step{n}", d) for n, d in pairs]
    if (Q / "abx_final").is_dir():
        out.append(("final", Q / "abx_final"))
    return out


def _j(p):
    return json.loads(Path(p).read_text())


def main():
    qm = _j(EXP / "quality_metrics.json")
    recs = [json.loads(l) for l in (EXP / "logs/metrics.jsonl").read_text().splitlines()]
    tr = [r for r in recs if r.get("phase") == "train_no_dev" and "loss" in r]
    dv = [r for r in recs if r.get("phase") == "dev" and "loss" in r]

    out = []
    out.append("### 3.1 Convergence & codebook health\n")
    out.append(
        f"| | step 1 | step {tr[-1]['step']} (final) |\n|---|---|---|\n"
        f"| train CE (nats) | {tr[0]['loss']:.3f} | {tr[-1]['loss']:.3f} |\n"
        f"| dev CE (nats) | {dv[0]['loss']:.3f} (step {dv[0]['step']}) | {dv[-1]['loss']:.3f} |\n"
        f"| VQ aux loss | {tr[0].get('aux_loss', float('nan')):.4f} | {tr[-1].get('aux_loss', float('nan')):.4f} |\n"
        f"| codebook perplexity (Σ 2 slices, per batch) | {tr[0].get('perplexity', float('nan')):.1f} | {tr[-1].get('perplexity', float('nan')):.1f} |\n"
    )
    out.append("![curves](quality-curves.png)\n" if (Path("/root/repo") / "quality-curves.png").exists() else "")

    out.append("### 3.2 Reconstruction fidelity (AR decodes vs ground truth)\n")
    out.append(
        "| split | MCD (dB) | mel-L1 |\n|---|---|---|\n"
        f"| dev | {qm['dev_mcd_db_mean']:.2f} | {qm['dev_mel_l1_mean']:.3f} |\n"
        f"| test | {qm['test_mcd_db_mean']:.2f} | {qm['test_mel_l1_mean']:.3f} |\n"
        f"| mismatched-GT calibration (unrelated-audio ceiling) | "
        f"{qm['mcd_db_mismatched_gt_pairs']:.2f} | {qm['mel_l1_mismatched_gt_pairs']:.3f} |\n"
    )

    out.append("### 3.3 Representation discriminability (ABX proxy) & bitrate\n")
    rows = []
    base, base_src = None, None
    # in-training trajectory (scripts/track_abx.py snapshots, committed
    # JSON); filename is an argument — round-specific names like
    # abx_trajectory_r4.json would otherwise silently drop this section
    traj_name = sys.argv[3] if len(sys.argv) > 3 else None
    traj_p = (
        Q / traj_name if traj_name
        else next(iter(sorted(Q.glob("abx_trajectory_*.json"), reverse=True)), Q / "absent")
    )
    if traj_p.exists():
        traj = _j(traj_p)
        if traj.get("mfcc_baseline"):
            base, base_src = traj["mfcc_baseline"], traj_p.name
        for run, pts in traj.get("runs", {}).items():
            for pt in pts:
                a = pt.get("abx")
                if a is None:  # bitrate-only points are legal in the schema
                    continue
                tag = f"{run} @ step {pt['step']}" + (" (pre-VQ)" if pt.get("pre_vq") else "")
                rows.append(
                    f"| {tag} | {a['abx_across_speaker_err_pct']:.1f} | "
                    f"{a['abx_within_speaker_err_pct']:.1f} | "
                    f"{a.get('abx_dtw_across_speaker_err_pct', float('nan')):.1f} |"
                )
    for tag, d in _abx_dirs():
        p = d / "2019/english/abx_proxy.json"
        if p.exists():
            a = _j(p)["latents"]
            rows.append(
                f"| latents @ {tag} | {a['abx_across_speaker_err_pct']:.1f} | "
                f"{a['abx_within_speaker_err_pct']:.1f} | "
                f"{a.get('abx_dtw_across_speaker_err_pct', float('nan')):.1f} |"
            )
    if base is None:
        # fall back to an abx export dir's baseline only when the
        # trajectory file lacks one (its sampling may differ)
        for tag, d in reversed(_abx_dirs()):
            p = d / "2019/english/abx_proxy.json"
            if p.exists():
                base, base_src = _j(p)["mfcc_baseline"], f"{d.name} export"
                break
    out.append(
        "| representation | across-spk ABX err % | within-spk ABX err % | DTW across-spk % |\n|---|---|---|---|"
    )
    out.extend(rows)
    if base:
        out.append(
            f"| MFCC-39 baseline (challenge input feats; from {base_src}) | "
            f"{base['abx_across_speaker_err_pct']:.1f} | {base['abx_within_speaker_err_pct']:.1f} | "
            f"{base.get('abx_dtw_across_speaker_err_pct', float('nan')):.1f} |"
        )
    out.append("")
    if traj_p.exists():
        for run, pts in traj.get("runs", {}).items():
            with_b = [p for p in pts if "bitrate" in p]
            if with_b:
                b = with_b[-1]["bitrate"]
                out.append(
                    f"- bitrate {run} @ step {with_b[-1]['step']}: **{b['bitrate']:.1f} bits/s** "
                    f"({b['n_distinct']} distinct symbols over {b['n_frames']} frames)"
                )
    for tag, d in _abx_dirs():
        p = d / "bitrate.json"
        if p.exists():
            b = _j(p)
            out.append(
                f"- bitrate @ {tag}: **{b['bitrate']:.1f} bits/s** "
                f"({b['n_distinct']} distinct symbols over {b['n_frames']} frames)"
            )
    out.append("")

    out.append("### 3.4 Submission tree\n")
    r = subprocess.run(
        [sys.executable, "-m", "wavenet_autoencoders_tpu.cli.main", "validate",
         str(Q / "submission")],
        capture_output=True, text=True, cwd="/root/repo",
    )
    status = "PASS" if r.returncode == 0 else "FAIL"
    tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
    out.append(f"`cli validate quality/submission`: **{status}**\n```\n" + "\n".join(tail) + "\n```\n")

    print("\n".join(out))


if __name__ == "__main__":
    main()
