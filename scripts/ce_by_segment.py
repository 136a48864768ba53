"""Teacher-forced CE split by ground-truth segment class (CPU).

Quantifies QUALITY.md's entropy-floor claim: on the synthetic corpus the
mu-law CE concentrates in stochastic regions (fricatives/aspiration),
while harmonic (vowel) regions are far more predictable. Uses the test
split, whose phone alignments the generator wrote.

Usage: QR_ROOT=<corpus-root> python scripts/ce_by_segment.py \
           <ckpt_rel_to_root> [n_utts]
QR_ROOT defaults to /root/repo/quality; the config is read from the
config.json next to the checkpoint (the frozen-config contract), so a
checkpoint from any experiment evaluates under its own hparams.
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")
os.chdir(os.environ.get("QR_ROOT", "/root/repo/quality"))

from wavenet_autoencoders_tpu.cli.main import _load_model
from wavenet_autoencoders_tpu.config import Config
from wavenet_autoencoders_tpu.data.manifest import Manifest

VOWELS = set("a e i o u ae ə ɔ".split())


def main():
    ckpt = sys.argv[1]
    n_utts = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg = Config.load(os.path.join(os.path.dirname(ckpt), "config.json"))
    model, params, state = _load_model(cfg, ckpt, use_ema=True)
    labels = json.load(open("raw/test_phone_labels.json"))
    man = Manifest.read("dump/2019/english/test")
    hop = cfg.get_hop_size()
    ds = 100 // cfg.frame_rate
    sr = cfg.sample_rate

    buckets = {"vowel": [], "fricative": [], "silence/other": []}
    for u in man.utterances[:n_utts]:
        name = u.prefix.rstrip("/").split("/")[-1]
        wave = np.load(u.path("wave"))
        feats = np.load(u.path("mfcc", norm=True)).astype(np.float32)
        nf = (len(feats) // ds) * ds
        feats = feats[:nf]
        T = nf * hop
        x = wave[:T].astype(np.int32)
        # test speakers are held out (speaker_id = -1): condition on an
        # arbitrary trained embedding — the segment-class CONTRAST is the
        # point here, and both classes share the mismatch
        g = jnp.asarray([max(u.speaker_id, 0)], jnp.int32)
        y, *_ = model.forward(
            params, state, jax.random.PRNGKey(0),
            jnp.asarray(x)[None], jnp.asarray(feats)[None], g, train=False,
        )
        # one-step-ahead: logits[t] predict x[t+1] (train/step.py convention)
        logp = jax.nn.log_softmax(np.asarray(y[0], np.float32), axis=-1)
        tgt = x[1:]
        ce = -np.take_along_axis(
            np.asarray(logp[: len(tgt)]), tgt[:, None], axis=1
        )[:, 0]
        # classify each sample by its segment
        cls = np.full(len(ce), 2)  # silence/other
        for ph, t0, t1 in labels.get(name, []):
            a, b = int(t0 * sr), min(int(t1 * sr), len(ce))
            cls[a:b] = 0 if ph in VOWELS else 1
        buckets["vowel"].append(ce[cls == 0])
        buckets["fricative"].append(ce[cls == 1])
        buckets["silence/other"].append(ce[cls == 2])
        print(f"{name}: CE {ce.mean():.3f}", flush=True)

    out = {}
    for k, v in buckets.items():
        allv = np.concatenate(v) if v else np.array([0.0])
        out[k] = {"ce_nats": round(float(allv.mean()), 3), "n_samples": int(len(allv))}
        print(f"{k:14s} CE {allv.mean():.3f} nats over {len(allv)} samples")
    json.dump(out, open("ce_by_segment.json", "w"), indent=2)


if __name__ == "__main__":
    main()
