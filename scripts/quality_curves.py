"""Render the QUALITY.md curves figure: codebook perplexity and train CE
vs step for the rounds-4/5 runs against the round-3 collapsed regime.

Form: change-over-time -> line chart, one axis per panel (dataviz skill);
categorical palette = the skill's validated defaults in fixed slot order.
Usage: python scripts/quality_curves.py [out.png]
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

Q2 = Path("/root/repo/quality2")
OUT = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/root/repo/quality-curves-r5.png")

# validated categorical slots (light mode), fixed order
C1, C2, C3, C4, C5, C6 = (
    "#2a78d6", "#d95926", "#199e70", "#8250c4", "#c02f7a", "#8c8a84"
)
INK, MUTED = "#0b0b0b", "#52514e"

RUNS = [
    ("run D (r4) — reseed + warm-up", Q2 / "exp/svqwae_r4/logs/metrics.jsonl", C1),
    ("run E (r4) — + jitter from step 0", Q2 / "exp/svqwae_r4j/logs/metrics.jsonl", C2),
    ("run G (r5) — + jitter from step 3k", Q2 / "exp/svqwae_r5/logs/metrics.jsonl", C4),
    ("run H (r5) — 50 Hz latent, no jitter", Q2 / "exp/svqwae_r5_fr50/logs/metrics.jsonl", C5),
    ("round 3 — no levers (collapsed regime)", Q2 / "exp/svqwae_sharp/logs/metrics.jsonl", C6),
]
LOSS_ONLY_RUNS = [
    ("run F (r5) — IN-WAE (continuous)", Q2 / "exp/inwae_r5/logs/metrics.jsonl", C3),
]


def series(path, key):
    xs, ys = [], []
    if not path.exists():
        return xs, ys
    for line in path.read_text().splitlines():
        r = json.loads(line)
        if r.get("phase") == "train_no_dev" and key in r:
            xs.append(r["step"])
            ys.append(r[key])
    return xs, ys


def style(ax, title, ylab):
    ax.set_title(title, loc="left", fontsize=11, color=INK)
    ax.set_xlabel("training step", fontsize=9, color=MUTED)
    ax.set_ylabel(ylab, fontsize=9, color=MUTED)
    ax.grid(True, which="major", color="#e6e5e0", linewidth=0.6)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color("#c3c2b7")
    ax.tick_params(colors=MUTED, labelsize=8)


def main():
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 3.8), dpi=160)
    for name, path, color in RUNS:
        xs, ys = series(path, "perplexity")
        if xs:
            ax1.plot(xs, ys, color=color, linewidth=2, label=name)
            ax1.annotate(
                f"{ys[-1]:.0f}", (xs[-1], ys[-1]), textcoords="offset points",
                xytext=(4, 0), fontsize=8, color=MUTED,
            )
    ax1.set_yscale("log")
    ax1.axhline(4.0, color=MUTED, linewidth=0.8, linestyle=":")
    ax1.annotate("collapse floor (~4)", (0.02, 4.4), xycoords=("axes fraction", "data"),
                 fontsize=8, color=MUTED)
    style(ax1, "Codebook perplexity (sum of 2 slices, log scale)", "perplexity")
    ax1.legend(frameon=False, fontsize=8, loc="lower right", labelcolor=INK)

    for name, path, color in RUNS + LOSS_ONLY_RUNS:
        xs, ys = series(path, "loss")
        if xs:
            ax2.plot(xs, ys, color=color, linewidth=2, label=name)
    ax2.set_ylim(2.5, 4.5)
    style(ax2, "Train CE + VQ aux (nats)", "loss")
    ax2.legend(frameon=False, fontsize=8, loc="upper right", labelcolor=INK)

    fig.tight_layout()
    fig.savefig(OUT, facecolor="#fcfcfb")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
