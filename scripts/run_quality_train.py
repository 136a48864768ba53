"""Quality-run launcher: package import from /root/repo, cwd=quality/
(the manifests carry quality-relative dump prefixes). Auto-resumes from
checkpoint_latest.npz when present, so the watchdog can restart it after
an axon-tunnel stall.

Env overrides: QR_ROOT (working corpus dir, default /root/repo/quality),
QR_EXP (exp dir rel to QR_ROOT), QR_STEPS, QR_PRESET (bundled preset
name, default svqwae), QR_HP (extra "k=v,..." appended to the base
hparams)."""
import faulthandler
import os
import signal
import sys

# watchdog3 sends SIGUSR1 before killing a stalled trainer: dump every
# thread's Python stack into the log so the stall is diagnosable
faulthandler.register(signal.SIGUSR1, all_threads=True)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
os.chdir(os.environ.get("QR_ROOT", "/root/repo/quality"))
from wavenet_autoencoders_tpu.cli.main import main

exp = os.environ.get("QR_EXP", "exp/svqwae")
steps = os.environ.get("QR_STEPS", "40000")
preset = os.environ.get("QR_PRESET", "svqwae")
extra = os.environ.get("QR_HP", "")
anneal = int(int(steps) / 2)

hp = (
    "checkpoint_interval=1000,train_eval_interval=1000000,"
    "test_eval_epoch_interval=1000000,dev_batch_size=6,dev_epoch_interval=25,"
    'lr_schedule_kwargs={"anneal_rate": 0.5, "anneal_interval": %d}' % anneal
)
if extra:
    hp = hp + "," + extra

args = [
    "train", "--preset", preset,
    "--hparams", hp,
    "dump/2019/english/train_no_dev", exp,
    "--dev-dump-root", "dump/2019/english/dev",
    "--max-steps", steps,
]
ckpt = f"{exp}/checkpoint_latest.npz"
if os.path.exists(ckpt):
    args += ["--checkpoint", ckpt]
main(args)
