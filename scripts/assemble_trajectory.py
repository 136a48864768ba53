"""Assemble abx_trajectory_<tag>.json from track_abx.py export dirs.

Merges every ``<qroot>/abx_<run>_step<NNN>/`` (abx_proxy.json +
bitrate.json, as written by scripts/track_abx.py) into the trajectory
schema consumed by scripts/quality_report.py:

    {"mfcc_baseline": {...},
     "runs": {"<run>": [{"step": N, "pre_vq": false,
                         "abx": {...}, "bitrate": {...}}, ...]}}

The MFCC baseline is taken from the LAST step's abx_proxy.json of the
first run (all dirs score the same triplet sampling, seed-fixed).

Usage: python scripts/assemble_trajectory.py <qroot> <out_name> <run>...
  e.g. python scripts/assemble_trajectory.py quality2 abx_trajectory_r5.json G inwae_r5
"""
from __future__ import annotations

import json
import re
import sys
from pathlib import Path


def main():
    qroot = Path(sys.argv[1])
    out_name = sys.argv[2]
    runs = sys.argv[3:]
    out = {"mfcc_baseline": None, "runs": {}}
    for run in runs:
        pts = []
        for d in sorted(qroot.glob(f"abx_{run}_step*")):
            m = re.search(r"step(\d+)$", d.name)
            if not m or not d.is_dir():
                continue
            proxy = d / "2019/english/abx_proxy.json"
            if not proxy.exists():
                print(f"skip {d.name}: no abx_proxy.json")
                continue
            scores = json.loads(proxy.read_text())
            pt = {"step": int(m.group(1)), "pre_vq": False,
                  "abx": scores["latents"]}
            br = d / "bitrate.json"
            if br.exists():
                pt["bitrate"] = json.loads(br.read_text())
            if out["mfcc_baseline"] is None and "mfcc_baseline" in scores:
                out["mfcc_baseline"] = scores["mfcc_baseline"]
            pts.append(pt)
        pts.sort(key=lambda p: p["step"])
        if pts:
            out["runs"][f"run_{run}"] = pts
    (qroot / out_name).write_text(json.dumps(out, indent=1))
    n = sum(len(v) for v in out["runs"].values())
    print(f"{qroot / out_name}: {n} points over {list(out['runs'])}")


if __name__ == "__main__":
    main()
