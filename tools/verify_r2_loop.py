"""Real-chip drive of the round-2 loop changes: multi-host-ready batch path,
full dev phase with epoch averages, jitted save_states, deterministic hooks.
Synthetic ZS2019 pipeline -> CLI train (2.5 epochs, dev root) -> assert the
metrics stream and qualitative dumps."""
import json
import os
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import numpy as np
from scipy.io import wavfile

from wavenet_autoencoders_tpu.cli.main import main as cli

SR = 16000
OVERRIDES = (
    "layers=4,stacks=2,residual_channels=8,gate_channels=12,skip_out_channels=8,"
    "encoder_hid=16,cin_channels=8,gin_channels=4,n_speakers=8,K=8,"
    "batch_size=2,dev_batch_size=1,max_time_steps=1280,checkpoint_interval=4,"
    "train_eval_interval=100,test_eval_epoch_interval=2,"
    "compute_dtype=float32,num_slices=2"
)

root = Path(tempfile.mkdtemp(prefix="verify_r2_"))
raw = root / "raw"
rng = np.random.default_rng(0)


def make_wav(path, dur, f0):
    t = np.arange(int(dur * SR)) / SR
    y = 0.4 * np.sin(2 * np.pi * f0 * t) + 0.02 * rng.standard_normal(len(t))
    y16 = (np.clip(y, -1, 1) * 32767).astype(np.int16)
    path.parent.mkdir(parents=True, exist_ok=True)
    wavfile.write(path, SR, y16)


for i in range(6):
    make_wav(raw / "english/train/unit" / f"S0{i%3:02d}_{1000+i}.wav", 0.5, 200 + 40 * i)
for i in range(2):
    make_wav(raw / "english/train/voice" / f"V00{i+1}_{2000+i}.wav", 0.5, 150 + 30 * i)
for i in range(2):
    make_wav(raw / "english/test" / f"S090_{3000+i}.wav", 0.4, 300 + 50 * i)

dump, scp = root / "dump/2019", root / "scp/2019"
cwd = os.getcwd()
os.chdir(root)
try:
    cli(["subset", "english", str(raw), str(dump) + "/", str(scp)])
finally:
    os.chdir(cwd)
sp2ind = scp / "2019_speaker2ind_english.json"
for split in ["train_no_dev", "test"]:
    cli([
        "preprocess", "--preset", "svqwae", "--hparams", OVERRIDES,
        str(scp / f"{split}_src_dst.json"), str(dump / "english" / split),
        str(sp2ind), "--num-workers", "1",
    ])

cli(["cmvn", "mfcc", str(root / "cmvn.npz"), str(scp / "train_no_dev_src_dst.json")])
for split in ["train_no_dev", "test"]:
    cli(["normalize", str(scp / f"{split}_src_dst.json"), "mfcc", str(root / "cmvn.npz")])

ckpt = root / "ckpt"
cli([
    "train", "--preset", "svqwae", "--hparams", OVERRIDES,
    str(dump / "english/train_no_dev"), str(ckpt),
    "--dev-dump-root", str(dump / "english/test"),
    "--max-steps", "10",
])

lines = [json.loads(l) for l in (ckpt / "logs/metrics.jsonl").read_text().splitlines()]
phases = {l["phase"] for l in lines}
print("phases seen:", sorted(phases))
assert {"train_no_dev", "train_no_dev_epoch", "dev", "dev_epoch"} <= phases, phases
dev_epochs = [l for l in lines if l["phase"] == "dev_epoch"]
assert len(dev_epochs) >= 2, dev_epochs  # full dev pass ran each epoch
for l in dev_epochs:
    assert np.isfinite(l["loss"]) and l["perplexity"] > 0
ep = [l for l in lines if l["phase"] == "train_no_dev_epoch"]
assert [l["step"] for l in ep] == list(range(1, len(ep) + 1))  # keyed by epoch
audio = list((ckpt / "intermediate/audio").glob("*.wav"))
assert len(audio) >= 2, audio  # jitted save_states dumped pred+target
ar_eval = list((ckpt / "intermediate/dev_eval").glob("*.wav"))
print(f"epoch avgs: {[round(l['loss'],3) for l in ep]}  dev avgs: "
      f"{[round(l['loss'],3) for l in dev_epochs]}  audio dumps: {len(audio)}  "
      f"dev AR evals: {len(ar_eval)}")
assert len(ar_eval) >= 2, ar_eval  # epoch 2 AR eval dumped pred+target wavs
# ---- ABX export with bitrate (real-chip encode) ----
dst = root / "abx"
cli([
    "infer", "--preset", "svqwae", "--hparams", OVERRIDES,
    str(ckpt / "checkpoint_latest.npz"), str(scp / "test_src_dst.json"), str(dst),
])
txts = list((dst / "2019/english/test").glob("*.txt"))
assert len(txts) == 2, txts
br = json.loads((dst / "bitrate.json").read_text())
assert br["n_frames"] > 0 and np.isfinite(br["bitrate"]), br
print(f"bitrate.json: {br}")

# ---- IN-model synthesis with AUTO tar_c selection ----
IN_OVR = OVERRIDES.replace("K=8,", "")
ckpt2 = root / "ckpt_inae"
cli([
    "train", "--preset", "inae", "--hparams", IN_OVR,
    str(dump / "english/train_no_dev"), str(ckpt2), "--max-steps", "2",
])
syn_list = root / "synthesis.txt"
man = (dump / "english/test/train.txt").read_text().splitlines()
utt = man[0].split("|")[0].rstrip("/").split("/")[-1]
syn_list.write_text(f"{utt} V001\n")
syn_dst = str(root / "syn") + "/"
cli([
    "synthesize", "--preset", "inae", "--hparams", IN_OVR,
    str(ckpt2 / "checkpoint_latest.npz"), str(dump / "english/test"),
    syn_dst, str(syn_list), str(sp2ind), "english",
])
wavs = list(Path(syn_dst, "2019/english/test").glob("V001_*.wav"))
assert len(wavs) == 1, wavs  # auto tar_c map was built from ../train_no_dev

shutil.rmtree(root)
print("VERIFY OK")
