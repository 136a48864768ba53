"""End-to-end micro-pipeline on synthetic data (SURVEY.md §4 test plan):
ZS2019-layout wavs -> subset -> preprocess -> CMVN -> normalize ->
micro-train -> ABX export -> voice-conversion synthesis, all through the
CLI entry points."""
import json
import os
from pathlib import Path

import numpy as np
import pytest
from scipy.io import wavfile

from wavenet_autoencoders_tpu.cli.main import main as cli

SR = 16000
OVERRIDES = (
    "layers=4,stacks=2,residual_channels=8,gate_channels=12,skip_out_channels=8,"
    "encoder_hid=16,cin_channels=8,gin_channels=4,n_speakers=8,K=8,"
    "batch_size=2,dev_batch_size=1,max_time_steps=1280,checkpoint_interval=4,"
    "compute_dtype=float32,num_slices=2"
)


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    root = tmp_path_factory.mktemp("zs2019")
    raw = root / "raw"
    # ZS2019 layout: <lan>/train/{unit,voice}/*.wav, <lan>/test/*.wav
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

    dump = root / "dump/2019"
    scp = root / "scp/2019"
    cwd = os.getcwd()
    os.chdir(root)  # speaker map written relative to cwd in reference
    try:
        cli(["subset", "english", str(raw), str(dump) + "/", str(scp)])
    finally:
        os.chdir(cwd)
    return {"root": root, "raw": raw, "dump": dump, "scp": scp}


def test_01_subset(pipeline):
    scp = pipeline["scp"]
    pairs = json.load(open(scp / "train_no_dev_src_dst.json"))
    assert len(pairs) == 8  # 1% of 8 rounds to 0 dev
    sp2ind = json.load(open(scp / "2019_speaker2ind_english.json"))
    assert set(sp2ind) == {"S000", "S001", "S002", "V001", "V002"}
    test_pairs = json.load(open(scp / "test_src_dst.json"))
    assert len(test_pairs) == 2


def test_02_preprocess_and_normalize(pipeline):
    scp, dump = pipeline["scp"], pipeline["dump"]
    sp2ind = scp / "2019_speaker2ind_english.json"
    for split in ["train_no_dev", "test"]:
        cli([
            "preprocess", "--preset", "svqwae", "--hparams", OVERRIDES,
            str(scp / f"{split}_src_dst.json"),
            str(dump / "english" / split),
            str(sp2ind),
            "--num-workers", "1",
        ])
    # manifest + npys exist and are aligned
    man = (dump / "english/train_no_dev/train.txt").read_text().splitlines()
    assert len(man) == 8
    prefix, n_frames, spk, _ = man[0].split("|")
    wave = np.load(prefix + "wave.npy")
    mfcc = np.load(prefix + "mfcc.npy")
    assert len(wave) == int(n_frames) * 160
    assert mfcc.shape == (int(n_frames), 39)
    assert int(spk) >= 0

    cli([
        "cmvn", "mfcc", str(pipeline["root"] / "cmvn.npz"),
        str(scp / "train_no_dev_src_dst.json"),
    ])
    for split in ["train_no_dev", "test"]:
        cli([
            "normalize", str(scp / f"{split}_src_dst.json"), "mfcc",
            str(pipeline["root"] / "cmvn.npz"),
        ])
    norm = np.load(prefix + "mfcc.norm.npy")
    assert norm.shape == mfcc.shape
    # normalized stats near 0/1 over the corpus
    alln = np.concatenate([
        np.load(l.split("|")[0] + "mfcc.norm.npy") for l in man
    ])
    assert np.abs(alln.mean(0)).max() < 0.2
    assert np.abs(alln.std(0) - 1).max() < 0.35


def test_03_train(pipeline):
    dump = pipeline["dump"] / "english/train_no_dev"
    ckpt = pipeline["root"] / "ckpt"
    cli([
        "train", "--preset", "svqwae", "--hparams", OVERRIDES,
        str(dump), str(ckpt), "--max-steps", "6",
    ])
    assert (ckpt / "config.json").exists()
    assert (ckpt / "checkpoint_latest.npz").exists()
    assert (ckpt / "checkpoint_latest_ema.npz").exists()
    logs = (ckpt / "logs/metrics.jsonl").read_text().splitlines()
    rec = json.loads(logs[-1])
    assert np.isfinite(rec["loss"]) and rec["step"] >= 1


def test_04_resume(pipeline):
    dump = pipeline["dump"] / "english/train_no_dev"
    ckpt = pipeline["root"] / "ckpt"
    cli([
        "train", "--preset", "svqwae", "--hparams", OVERRIDES,
        str(dump), str(ckpt),
        "--checkpoint", str(ckpt / "checkpoint_latest.npz"),
        "--max-steps", "8",
    ])
    logs = (ckpt / "logs/metrics.jsonl").read_text().splitlines()
    assert json.loads(logs[-1])["step"] >= 7


def test_05_infer_abx_export(pipeline):
    ckpt = pipeline["root"] / "ckpt"
    dst = pipeline["root"] / "abx"
    cli([
        "infer", "--preset", str(ckpt / "config.json"),
        str(ckpt / "checkpoint_latest.npz"),
        str(pipeline["scp"] / "test_src_dst.json"),
        str(dst),
    ])
    outs = sorted((dst / "2019/english/test").glob("*.txt"))
    assert len(outs) == 2
    rep = np.loadtxt(outs[0])
    assert rep.ndim == 2 and rep.shape[1] == 8  # cin_channels latent dim
    # 25 Hz latents: ~frames/4 rows
    src_frames = np.load(
        json.load(open(pipeline["scp"] / "test_src_dst.json"))[0][1] + "mfcc.norm.npy"
    ).shape[0]
    assert abs(rep.shape[0] - src_frames / 4) <= 2


def test_06_synthesize_voice_conversion(pipeline):
    root = pipeline["root"]
    ckpt = root / "ckpt"
    # synthesis list: convert test utt to speaker V001
    test_pairs = json.load(open(pipeline["scp"] / "test_src_dst.json"))
    utt_dir = Path(test_pairs[0][1])
    rel = utt_dir.relative_to(pipeline["dump"])  # english/test/S090_3000
    syn_list = root / "synthesis.txt"
    syn_list.write_text(f"{rel} V001\n")
    dst = root / "syn_out"
    cli([
        "synthesize", "--preset", str(ckpt / "config.json"),
        str(ckpt / "checkpoint_latest.npz"),
        str(pipeline["dump"]),
        str(dst) + "/",
        str(syn_list),
        str(pipeline["scp"] / "2019_speaker2ind_english.json"),
        "english",
    ])
    wavs = sorted((dst / "2019/english/test").glob("*.wav"))
    assert len(wavs) == 1 and wavs[0].name == "V001_3000.wav"
    sr, y = wavfile.read(wavs[0])
    assert sr == SR and len(y) > 1000

    # bucket-padded decode (--pad-frames-multiple): shared compiled shape,
    # wav cropped back to the exact unpadded length
    dst_p = root / "syn_out_padded"
    cli([
        "synthesize", "--preset", str(ckpt / "config.json"),
        str(ckpt / "checkpoint_latest.npz"),
        str(pipeline["dump"]),
        str(dst_p) + "/",
        str(syn_list),
        str(pipeline["scp"] / "2019_speaker2ind_english.json"),
        "english",
        "--pad-frames-multiple", "64",
    ])
    wavs_p = sorted((dst_p / "2019/english/test").glob("*.wav"))
    assert len(wavs_p) == 1
    _, y_p = wavfile.read(wavs_p[0])
    assert len(y_p) == len(y), (len(y_p), len(y))


def test_04b_nepochs_bounds_training(pipeline):
    """cfg.nepochs stops the loop like the reference's epoch-bounded loop
    (vqwae_train.py:801) even when max_train_steps is far away."""
    dump = pipeline["dump"] / "english/train_no_dev"
    ckpt = pipeline["root"] / "ckpt_nepochs"
    cli([
        "train", "--preset", "svqwae",
        "--hparams", OVERRIDES + ",nepochs=1,max_train_steps=100000",
        str(dump), str(ckpt),
    ])
    logs = (ckpt / "logs/metrics.jsonl").read_text().splitlines()
    steps = [json.loads(l)["step"] for l in logs if "loss" in json.loads(l)]
    # 8 utterances / batch 2 = 4 steps per epoch, 1 epoch allowed
    assert max(steps) == 4


def test_04b_collapse_abort_exits_3(pipeline):
    """The collapse monitor must abort with exit code 3 (distinct from a
    crash) when perplexity sits below the configured floor."""
    dump = pipeline["dump"] / "english/train_no_dev"
    ckpt = pipeline["root"] / "ckpt_collapse"
    with pytest.raises(SystemExit) as ei:
        cli([
            "train", "--preset", "svqwae",
            "--hparams", OVERRIDES + ",collapse_check_step=1,collapse_min_perplexity=1e9",
            str(dump), str(ckpt), "--max-steps", "6",
        ])
    assert ei.value.code == 3
    # monitor saved a checkpoint on the way out
    assert (ckpt / "checkpoint_latest.npz").exists()


def test_04c_train_with_reseed(pipeline):
    dump = pipeline["dump"] / "english/train_no_dev"
    ckpt = pipeline["root"] / "ckpt_reseed"
    cli([
        "train", "--preset", "svqwae",
        "--hparams", OVERRIDES + ",vq_reseed=true,vq_reseed_start=0,vq_warmup_steps=4",
        str(dump), str(ckpt), "--max-steps", "4",
    ])
    logs = (ckpt / "logs/metrics.jsonl").read_text().splitlines()
    rec = json.loads(logs[-1])
    assert "reseeded" in rec and np.isfinite(rec["loss"])


def test_04d_new_inae_preset_smoke(pipeline):
    """Bundled new_inae preset trains end-to-end (speaker encoder supplies
    the 64-d continuous global code; inference_2019.py:303-312 enumerates
    the model)."""
    dump = pipeline["dump"] / "english/train_no_dev"
    ckpt = pipeline["root"] / "ckpt_new_inae"
    cli([
        "train", "--preset", "new_inae", "--hparams",
        "layers=4,stacks=2,residual_channels=8,gate_channels=12,"
        "skip_out_channels=8,encoder_hid=16,cin_channels=8,n_speakers=8,"
        "batch_size=2,dev_batch_size=1,max_time_steps=1280,"
        "checkpoint_interval=4,compute_dtype=float32",
        str(dump), str(ckpt), "--max-steps", "2",
    ])
    assert (ckpt / "checkpoint_latest.npz").exists()
    cfgj = json.load(open(ckpt / "config.json"))
    assert cfgj["name"] == "new_inae"


def test_04e_sigterm_graceful_checkpoint(pipeline):
    """SIGTERM to a running trainer must save a checkpoint and exit 0 —
    the preemption-safe stop contract (SIGINT is ignored in background
    children of POSIX shells, so TERM is the watchdog's stop signal)."""
    import signal
    import subprocess
    import sys
    import time

    dump = pipeline["dump"] / "english/train_no_dev"
    ckpt = pipeline["root"] / "ckpt_sigterm"
    code = (
        "import sys; sys.path.insert(0, %r); "
        "from wavenet_autoencoders_tpu.cli.main import main; "
        "main(['train', '--preset', 'svqwae', '--hparams', %r, %r, %r,"
        " '--max-steps', '100000'])"
        % (
            str(Path(__file__).resolve().parents[1]),
            OVERRIDES + ",checkpoint_interval=1000000",
            str(dump), str(ckpt),
        )
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.Popen(
        [sys.executable, "-c", code], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    # wait for a completed step (metrics line written; the writer is
    # line-buffered) — the TERM handler registers before the step loop
    deadline = time.time() + 240
    started = False
    mpath = ckpt / "logs/metrics.jsonl"
    while time.time() < deadline:
        if mpath.exists() and mpath.stat().st_size > 0:
            started = True
            break
        if proc.poll() is not None:
            break
        time.sleep(2)
    assert started, proc.stdout.read()[-2000:] if proc.poll() is not None else "no metrics yet"
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=120)
    assert proc.returncode == 0, out[-2000:]
    assert "saving checkpoint before exit" in out
    assert (ckpt / "checkpoint_latest.npz").exists()
