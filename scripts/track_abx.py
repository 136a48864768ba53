"""One-shot ABX trajectory point: export latents (CPU) for a checkpoint
and score the ABX proxy against the corpus' ground-truth alignments.

Usage:
  python scripts/track_abx.py <qroot> <exp>/checkpoint_stepNNN.npz <tag> [--ema]

Writes <qroot>/abx_<tag>/ and prints the one-line scores. Raw weights by
default (the 0.9999 param-EMA is init-dominated at small step counts —
see QUALITY.md §4).
"""
import json
import os
import subprocess
import sys

qroot, ckpt, tag = sys.argv[1], sys.argv[2], sys.argv[3]
use_ema = "--ema" in sys.argv[4:]

env = dict(os.environ)
if not use_ema:
    env["QI_RAW"] = "1"
env["QI_ROOT"] = qroot

r = subprocess.run(
    [sys.executable, "/root/repo/scripts/run_quality_infer.py", ckpt, f"abx_{tag}"],
    env=env, capture_output=True, text=True)
for line in r.stdout.splitlines()[-2:]:
    print(line)
if r.returncode != 0:
    sys.exit(r.stderr[-2000:])
# latent rate from the experiment's frozen config — an IN-WAE at
# frame_rate 50 scored with the default 25 would misalign every segment
frame_rate = 25.0
cfg_p = os.path.join(os.path.dirname(os.path.join(qroot, ckpt)), "config.json")
if os.path.exists(cfg_p):
    frame_rate = float(json.load(open(cfg_p)).get("frame_rate", 25))
r2 = subprocess.run(
    [sys.executable, "/root/repo/scripts/abx_proxy.py",
     f"{qroot}/abx_{tag}/2019/english/test",
     f"{qroot}/raw/test_phone_labels.json",
     f"{qroot}/dump/2019/english/test",
     str(frame_rate)],
    capture_output=True, text=True)
# print the full scorer summary (latents line, MFCC-baseline line, JSON)
print(r2.stdout, end="")
if r2.returncode != 0:
    # a failed scorer must fail the trajectory point, not silently record a
    # missing sample
    print(r2.stderr[-2000:], file=sys.stderr)
    sys.exit(r2.returncode)
