"""Quality-run launcher: package import from /root/repo, cwd=quality/
(the manifests carry quality-relative dump prefixes). Auto-resumes from
checkpoint_latest.npz when present, so the watchdog can restart it after
an axon-tunnel stall."""
import os
import sys

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo/quality")
from wavenet_autoencoders_tpu.cli.main import main

args = [
    "train", "--preset", "svqwae",
    "--hparams",
    'checkpoint_interval=1000,train_eval_interval=1000000,'
    'test_eval_epoch_interval=1000000,dev_batch_size=6,dev_epoch_interval=25,'
    'lr_schedule_kwargs={"anneal_rate": 0.5, "anneal_interval": 20000}',
    "dump/2019/english/train_no_dev", "exp/svqwae",
    "--dev-dump-root", "dump/2019/english/dev",
    "--max-steps", "40000",
]
ckpt = "exp/svqwae/checkpoint_latest.npz"
if os.path.exists(ckpt):
    args += ["--checkpoint", ckpt]
main(args)
