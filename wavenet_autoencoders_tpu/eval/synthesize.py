"""Waveform synthesis / voice conversion (``synthesis.py`` parity).

- ``wavegen``: generate one utterance from conditioning features
  (``synthesis.py:295-396``) — but on TPU the AR loop is the jitted
  ``lax.scan`` decode, not a per-sample Python loop.
- ``batch_wavegen``: B utterances decoded in parallel
  (``synthesis.py:236-280``) — the TPU-native fast path (the scan's
  per-step matmuls grow from (1,C) to (B,C), filling the MXU).
- ``run_synthesis_list``: the voice-conversion driver over
  ``synthesis.txt`` pairs (source_utt, target_speaker) incl. the IN-model
  ``tar_c`` AdaIN path and the ZeroSpeech output layout
  ``dst/2019/<lan>/test/<V00x>_<fid>.wav`` (``synthesis.py:399-530``).
"""
from __future__ import annotations

import json
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from wavenet_autoencoders_tpu.config import Config
from wavenet_autoencoders_tpu import dsp


def _postprocess(cfg: Config, y_codes: np.ndarray) -> np.ndarray:
    """Codes/scalars -> float waveform (``synthesis.py:382-396``)."""
    mu = cfg.quantize_channels - 1
    if cfg.is_mulaw_quantize:
        wav = dsp.inv_mulaw_quantize(y_codes.astype(np.float32), mu)
    elif cfg.is_mulaw:
        wav = dsp.inv_mulaw(y_codes, mu)
    else:
        wav = y_codes
    if cfg.postprocess == "inv_preemphasis":
        wav = dsp.inv_preemphasis(wav, cfg.preemphasis_coef)
    if cfg.global_gain_scale > 0:
        wav = wav / cfg.global_gain_scale
    return np.asarray(wav, np.float32)


def _pad_frames(cfg: Config, c: np.ndarray) -> np.ndarray:
    """Pad frame count to a multiple of 100//frame_rate
    (``synthesis.py:486-490``)."""
    div = 100 // cfg.frame_rate
    if c.shape[0] % div != 0:
        pad = div - (c.shape[0] % div)
        c = np.pad(c, [(0, pad), (0, 0)], mode="constant")
    return c


def _use_pallas_decode(cfg: Config) -> bool:
    """The fused decode kernel covers both the mu-law-quantize path and the
    scalar (raw/mulaw + MoL/MoG) path on real TPUs (kernel_size 3)."""
    if cfg.kernel_size != 3:
        return False
    if str(cfg.extras.get("use_pallas_decode", "auto")) == "never":
        return False
    platform = jax.devices()[0].platform
    return platform not in ("cpu", "gpu")


def batch_wavegen(
    cfg: Config,
    model,
    params,
    state,
    c: np.ndarray,
    g: np.ndarray | None = None,
    tar_c: np.ndarray | None = None,
    key=None,
) -> np.ndarray:
    """c: (B, T', dim_in) feature frames -> (B, T) float waveforms."""
    key = jax.random.PRNGKey(0) if key is None else key
    c = _pad_frames_batch(cfg, c)
    tar_j = None if tar_c is None else jnp.asarray(tar_c)
    lat = model.encode(params, state, jnp.asarray(c), tar_c=tar_j)
    if cfg.upsample_conditional_features:
        # audio samples = (latent frames - 2*cin_pad context) * prod(scales)
        # (the upsampler trims the cin_pad indent, ops/upsample.py:64-71)
        T = (lat.shape[1] - 2 * cfg.cin_pad) * int(np.prod(cfg.upsample_scales))
    else:
        # no upsample net: the reference repeats conditioning by up_factor on
        # the host and sets length = frames * up_factor
        # (synthesis.py:335-339); the repeat itself happens on device in
        # WaveNet._align_conditioning. AE-family latents tick at frame_rate
        # Hz (up_factor samples per frame); plain vocoder conditioning ticks
        # at the hop rate.
        upf = cfg.up_factor if hasattr(model, "frame_rate") else cfg.get_hop_size()
        T = lat.shape[1] * upf
    if hasattr(model, "speaker_code"):
        # NewINAE: continuous speaker code from the target utterance
        # (or self, for reconstruction) replaces the id embedding
        src = tar_j if tar_j is not None else jnp.asarray(c)
        g = model.speaker_code(params, src)
    g = None if g is None else jnp.asarray(g)
    if _use_pallas_decode(cfg):
        codes, _logits = model.wavenet.decode_pallas(
            params["wavenet"], key, T, c=lat, g=g
        )
        codes = np.asarray(codes)
    else:
        y = model.wavenet.decode(
            params["wavenet"],
            key,
            T,
            c=lat,
            g=g,
            softmax=True,
            quantize=True,
            log_scale_min=cfg.log_scale_min,
        )
        y = np.asarray(y)
        if cfg.is_mulaw_quantize:
            codes = y.argmax(axis=-1)
        else:
            codes = y[..., 0]
    return np.stack([_postprocess(cfg, codes[i]) for i in range(codes.shape[0])])


def _pad_frames_batch(cfg, c):
    if c.ndim == 2:
        c = c[None]
    div = 100 // cfg.frame_rate
    if c.shape[1] % div != 0:
        pad = div - (c.shape[1] % div)
        c = np.pad(c, [(0, 0), (0, pad), (0, 0)], mode="constant")
    return c


def wavegen(
    cfg: Config,
    model,
    params,
    state,
    c: np.ndarray,
    g: int | None = None,
    tar_c: np.ndarray | None = None,
    key=None,
) -> np.ndarray:
    """Single-utterance generation; c: (T', dim_in). Returns (T,) float."""
    g_arr = None if g is None else np.array([g], np.int32)
    tc = None if tar_c is None else _pad_frames_batch(cfg, tar_c)
    y = batch_wavegen(cfg, model, params, state, c[None], g_arr, tar_c=tc, key=key)
    return y[0]


def build_tar_utt_map(
    train_dump_root: str, speakers, feat: str = "mfcc.norm"
) -> dict:
    """Auto-select one fixed target utterance per speaker for AdaIN tar_c,
    matching the reference's per-speaker fixed choice
    (``synthesis.py:500-519`` hardcodes e.g. V002_4290703572 from the
    train_no_dev dump) — here the lexicographically first ``<spk>_*``
    utterance dir with the feature present, which is deterministic across
    runs."""
    root = Path(train_dump_root)
    out = {}
    for spk in speakers:
        cands = sorted(
            d for d in root.glob(f"{spk}_*") if (d / f"{feat}.npy").exists()
        )
        if cands:
            out[spk] = str(cands[0] / f"{feat}.npy")
    return out


def run_synthesis_list(
    cfg: Config,
    model,
    params,
    state,
    dump_root: str,
    syn_list_path: str,
    speaker2ind_path: str,
    dst_dir: str,
    lan: str = "english",
    start_ind: int = 0,
    tar_utt_map: dict | None = None,
    key=None,
    batch: int = 4,
    train_dump_root: str | None = None,
    pad_multiple: int = 0,
):
    """Voice-conversion loop (``synthesis.py:473-529``).

    syn_list lines: "<utt_dir> <target_speaker>"; IN-family models
    additionally load a fixed target-speaker utterance (tar_utt_map:
    speaker -> mfcc.norm.npy path) for AdaIN re-styling
    (``synthesis.py:500-519``). When no map is given it is built
    automatically from the sibling ``train_no_dev`` dump dir (or
    ``train_dump_root``), like the reference's fixed per-speaker choices.

    ``pad_multiple`` (frames, 0 = exact lengths): bucket conditioning
    lengths up to a multiple so utterances share a handful of compiled
    decode programs instead of one per distinct length (each fresh T
    costs minutes of XLA compile on the fused kernel). Padding is
    edge-replication — real trailing frames, so IN-family per-utterance
    statistics shift far less than zero-padding — and the generated
    waveform is cropped back to the true length before writing.
    """
    lines = [l.strip() for l in open(syn_list_path) if l.strip()]
    sp2ind = json.load(open(speaker2ind_path))
    key = jax.random.PRNGKey(cfg.seed) if key is None else key
    needs_tar = cfg.name.lower() in ("inae", "inae1", "new_inae")
    if needs_tar and not tar_utt_map:
        root = (
            Path(train_dump_root)
            if train_dump_root
            else Path(dump_root).parent / "train_no_dev"
        )
        targets = {l.split()[1] for l in lines}
        tar_utt_map = build_tar_utt_map(root, sorted(targets))
        if tar_utt_map:
            print(f"auto tar_c map from {root}: {tar_utt_map}", flush=True)

    out_dir = Path(dst_dir) / "2019" / lan / "test"
    out_dir.mkdir(parents=True, exist_ok=True)

    # load + pad every item; group by exact padded frame count so batching
    # never alters per-utterance statistics (instance norm) or shapes
    items = []
    for i in range(start_ind, len(lines)):
        p, tar = lines[i].split()
        if lan == "surprise":
            p = "test/" + p
        fid = p.split("_")[1] if "_" in p else p
        feat_path = Path(dump_root) / p / "mfcc.norm.npy"
        if not feat_path.exists():
            raise FileNotFoundError(feat_path)
        c = _pad_frames(cfg, np.load(feat_path))
        true_frames = c.shape[0]
        if pad_multiple > 0 and c.shape[0] % pad_multiple != 0:
            pad = pad_multiple - (c.shape[0] % pad_multiple)
            c = np.pad(c, [(0, pad), (0, 0)], mode="edge")
        if tar not in sp2ind:
            raise KeyError(f"speaker {tar} not in {speaker2ind_path}")
        tar_c = None
        if needs_tar:
            if not tar_utt_map or tar not in tar_utt_map:
                raise KeyError(f"IN-model synthesis needs a tar_c utterance for {tar}")
            tar_c = np.load(tar_utt_map[tar])
        items.append((i, c, sp2ind[tar], tar, fid, tar_c, true_frames))

    groups: dict = {}
    for it in items:
        # IN-family: batch only items sharing the same tar_c source
        gk = (it[1].shape[0], None if it[5] is None else it[3])
        groups.setdefault(gk, []).append(it)

    # samples of audio per conditioning frame (crop-back factor)
    div = 100 // cfg.frame_rate
    if cfg.upsample_conditional_features:
        spf = int(np.prod(cfg.upsample_scales)) // div
    else:
        spf = cfg.up_factor // div if hasattr(model, "frame_rate") else cfg.get_hop_size()

    written = []
    for (_frames, _tarsp), group in groups.items():
        for j in range(0, len(group), max(batch, 1)):
            chunk = group[j : j + max(batch, 1)]
            c_b = np.stack([it[1] for it in chunk])
            g_b = np.array([it[2] for it in chunk], np.int32)
            tar_c = chunk[0][5]
            key, sub = jax.random.split(key)
            wavs = batch_wavegen(
                cfg, model, params, state, c_b, g_b,
                tar_c=None if tar_c is None else _pad_frames(cfg, tar_c)[None],
                key=sub,
            )
            for (i, _c, _sp, tar, fid, _tc, tf), wav in zip(chunk, wavs):
                dst = out_dir / f"{tar}_{fid}.wav"
                dsp.save_wav(wav[: tf * spf], dst, cfg.sample_rate)
                written.append(str(dst))
                print(f"ind {i} -> {dst}", flush=True)
    return written
