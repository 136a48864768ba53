"""CPU ABX export from a quality-run checkpoint (does not touch the TPU).

Usage: python scripts/run_quality_infer.py <ckpt.npz> <dst_rel_to_quality> [preset]

The preset defaults to the config.json sitting next to the checkpoint, so
the same script serves every quality experiment directory.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
os.chdir(os.environ.get("QI_ROOT", "/root/repo/quality"))

from wavenet_autoencoders_tpu.cli.main import main

ckpt, dst = sys.argv[1], sys.argv[2]
preset = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
    os.path.dirname(ckpt), "config.json")
args = [
    "infer", "--preset", preset,
    ckpt, "scp/2019/test_src_dst.json", dst, "--lan", "english",
]
if os.environ.get("QI_RAW"):  # score the raw weights, not the EMA sibling
    args.append("--no-use-ema")
main(args)
