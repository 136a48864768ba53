"""Host-side dataset: lazy npy loading, length-bucketed sampling,
hop-aligned random cropping, fixed-shape batch assembly.

Replaces the nnmnkwii FileSourceDataset + sampler + collate stack
(``vqwae_train.py:163-552``). Differences are deliberate TPU-first choices:

- batches are FIXED shape (crop length = max_time_steps for every item;
  shorter utterances are filtered exactly like the reference,
  ``vqwae_train.py:207-212``), so the jitted train step compiles once;
- waveforms stay compact on host (int mu-law codes / float scalars), the
  device one-hots them (see train.step._prep_x);
- a small background thread prefetches batches to overlap host IO with
  device compute (the reference used DataLoader workers).
"""
from __future__ import annotations

import queue
import threading
from dataclasses import dataclass

import numpy as np

from wavenet_autoencoders_tpu.config import Config
from wavenet_autoencoders_tpu.data.manifest import Manifest
from wavenet_autoencoders_tpu.dsp.mulaw import mulaw_quantize


def ensure_divisible(length: int, divisible_by: int, lower: bool = True) -> int:
    """``vqwae_train.py:425-431``."""
    if length % divisible_by == 0:
        return length
    if lower:
        return length - length % divisible_by
    return length + (divisible_by - length % divisible_by)


class WaveDataset:
    """Pairs (wave, conditioning-features, speaker) from a dump dir.

    feat_type: 'mfcc' (autoencoders) or 'mel' (vocoder); norm selects the
    CMVN-normalized variant (``vqwae_train.py:193-197``).
    """

    def __init__(
        self,
        dump_root: str,
        cfg: Config,
        feat_type: str = "mfcc",
        norm: bool = True,
        speaker_id: int | None = None,
        min_length: int | None = None,
    ):
        self.cfg = cfg
        self.feat_type = feat_type
        self.norm = norm
        man = Manifest.read(dump_root)
        hop = cfg.get_hop_size()
        if min_length is None:
            if cfg.max_time_steps is not None:
                min_length = cfg.max_time_steps + 2 * cfg.cin_pad * hop
            else:
                min_length = 0
        utts = [u for u in man.utterances if u.n_frames * hop > min_length]
        if speaker_id is not None:
            utts = [u for u in utts if u.speaker_id == speaker_id]
        n_drop = len(man) - len(utts)
        if n_drop:
            print(f"{n_drop} short samples are omitted for training.")
        self.utterances = utts
        self.multi_speaker = man.multi_speaker and speaker_id is None

    def __len__(self):
        return len(self.utterances)

    @property
    def lengths(self) -> np.ndarray:
        return np.array([u.n_frames for u in self.utterances])

    def __getitem__(self, idx: int):
        u = self.utterances[idx]
        wave = np.load(u.path("wave"))
        feats = np.load(u.path(self.feat_type, norm=self.norm))
        g = u.speaker_id if self.multi_speaker else None
        return wave, feats, g


class LengthBucketSampler:
    """``PartialyRandomizedSimilarTimeLengthSampler``
    (``vqwae_train.py:249-295``): sort by length, shuffle inside groups of
    8*batch_size, permute the groups."""

    def __init__(self, lengths, batch_size: int, batch_group_size: int | None = None, seed: int = 0):
        self.sorted_indices = np.argsort(lengths)
        self.batch_size = batch_size
        if batch_group_size is None:
            batch_group_size = min(batch_size * 8, len(lengths))
            batch_group_size -= batch_group_size % batch_size
        self.batch_group_size = max(batch_group_size, batch_size)
        self.rng = np.random.default_rng(seed)

    def __iter__(self):
        idx = self.sorted_indices.copy()
        gs = self.batch_group_size
        bins = []
        for i in range(len(idx) // gs):
            group = idx[i * gs : (i + 1) * gs]
            self.rng.shuffle(group)
            bins.append(group)
        if bins:
            order = self.rng.permutation(len(bins))
            binned = np.concatenate([bins[i] for i in order])
        else:
            binned = np.array([], dtype=np.int64)
        tail = idx[len(binned):]
        self.rng.shuffle(tail)
        return iter(np.concatenate([binned, tail]).astype(int))

    def __len__(self):
        return len(self.sorted_indices)


@dataclass
class Collator:
    """Hop-aligned random crop + fixed-shape batch assembly
    (``vqwae_train.py:438-552``)."""

    cfg: Config
    seed: int = 0

    def __post_init__(self):
        self.rng = np.random.default_rng(self.seed)
        cfg = self.cfg
        hop = cfg.get_hop_size()
        if cfg.max_time_sec is not None:
            mts = int(cfg.max_time_sec * cfg.sample_rate)
        else:
            mts = cfg.max_time_steps
        assert mts is not None, "fixed-shape batching needs max_time_steps"
        self.max_steps = ensure_divisible(mts, hop, True)
        self.max_frames = self.max_steps // hop
        # latent frames must divide evenly into the encoder downsampling
        ds = 100 // cfg.frame_rate
        assert self.max_frames % ds == 0, (
            f"max_time_steps/hop={self.max_frames} not divisible by 100/frame_rate={ds}"
        )
        if not cfg.upsample_conditional_features:
            # no-upsampler training repeats frames to sample rate on device
            # (WaveNet._align_conditioning; reference repeats via
            # audio.adjust_time_resolution, vqwae_train.py:481). A cin_pad
            # context window cannot survive a plain repeat — the reference's
            # own no-upsampler configs require cin_pad=0 too (its forward
            # has no trim either, wavenet_vocoder/wavenet.py:195-199).
            assert cfg.cin_pad == 0, (
                "upsample_conditional_features=false requires cin_pad=0"
            )

    def __call__(self, items) -> dict:
        cfg = self.cfg
        hop = cfg.get_hop_size()
        cin_pad = cfg.cin_pad
        xs, cs, gs, lengths = [], [], [], []
        for wave, feats, g in items:
            # hop-aligned synchronized crop (vqwae_train.py:468-478)
            assert len(wave) == len(feats) * hop, "wave/frames misaligned"
            if len(feats) > self.max_frames + 2 * cin_pad:
                s = self.rng.integers(cin_pad, len(feats) - self.max_frames - cin_pad + 1)
            else:
                s = cin_pad
            ts = s * hop
            x = wave[ts : ts + self.max_steps]
            c = feats[s - cin_pad : s + self.max_frames + cin_pad]
            xs.append(x)
            cs.append(c)
            gs.append(-1 if g is None else g)
            lengths.append(len(x))

        x_b = np.stack(xs)
        c_b = np.stack(cs).astype(np.float32)
        batch = {
            "c": c_b,
            "lengths": np.array(lengths, np.int32),
        }
        if cfg.is_mulaw_quantize:
            batch["x"] = x_b.astype(np.int32)
            batch["y"] = x_b.astype(np.int32)[..., None]
        else:
            batch["x"] = x_b.astype(np.float32)
            batch["y"] = x_b.astype(np.float32)[..., None]
        if cfg.gin_channels > 0:
            batch["g"] = np.array(gs, np.int32)
        return batch

    @property
    def pad_value(self) -> int:
        # P.mulaw_quantize(0, 255) == 127 (vqwae_train.py:509)
        return int(mulaw_quantize(0, self.cfg.quantize_channels - 1))


# must match the per-item seed stride in native/dataload.cpp
# (wae_load_batch: seed + 0x517CC1B727220A95 * (i + 1)) — it lets a host
# load only its contiguous slice [s, s+n) of the global batch while
# reproducing the exact crops of a full-batch load, by shifting the batch
# seed by s strides.
_SEED_STRIDE = 0x517CC1B727220A95
_U64 = 1 << 64


def _native_batch(dataset: WaveDataset, cfg: Config, idxs, collate: Collator, seed: int):
    """Assemble one batch through the C++ loader (mmap + parallel crop);
    returns None if unavailable so the caller falls back to Python."""
    from wavenet_autoencoders_tpu.data import native

    if not cfg.is_mulaw_quantize or not native.available():
        return None
    utts = [dataset.utterances[i] for i in idxs]
    try:
        out = native.load_batch_native(
            [u.path("wave") for u in utts],
            [u.path(dataset.feat_type, norm=dataset.norm) for u in utts],
            collate.max_steps,
            cfg.get_hop_size(),
            cfg.cin_pad,
            cfg.dim_in if dataset.feat_type == "mfcc" else cfg.num_mels,
            seed,
        )
    except RuntimeError:
        # e.g. Fortran-order or exotic-dtype npy — Python path handles it
        return None
    if out is None:
        return None
    x, c = out
    batch = {
        "x": x,
        "y": x[..., None],
        "c": c,
        "lengths": np.full((len(utts),), collate.max_steps, np.int32),
    }
    if cfg.gin_channels > 0:
        batch["g"] = np.array(
            [(-1 if not dataset.multi_speaker else u.speaker_id) for u in utts], np.int32
        )
    return batch


def data_iterator(
    dataset: WaveDataset,
    cfg: Config,
    batch_size: int | None = None,
    seed: int = 0,
    prefetch: int = 3,
    epochs: int | None = None,
    use_native: bool = True,
    host_slice: tuple[int, int] | None = None,
    transform=None,
):
    """Yield collated batches forever (or for ``epochs``), with background
    prefetching. Uses the C++ mmap loader when available.

    host_slice=(start, size): multi-host mode — every host runs the same
    deterministic sampler over the GLOBAL batch (bit-identical to
    single-host numerics) and yields only its slice of it; the caller
    assembles the global device array via
    ``parallel.distributed.make_global_batch``. On the native-loader path
    each host reads ONLY its slice's npy files (per-item crop seeds are
    global-position based, so the crops are bit-identical to a full-batch
    load); the Python fallback still loads the full batch then slices
    (its crop RNG is consumed sequentially).

    transform: optional per-batch function applied INSIDE the prefetch
    thread — pass the device-put/shard function here so host→device
    transfer overlaps device compute (jax dispatch is thread-safe), the
    replacement for the reference DataLoader's ``pin_memory`` + async H2D
    (``vqwae_train.py:1045-1048``).
    """
    bs = batch_size or cfg.batch_size
    sampler = LengthBucketSampler(dataset.lengths, bs, seed=seed)
    collate = Collator(cfg, seed=seed)

    def gen():
        epoch = 0
        step = 0
        while epochs is None or epoch < epochs:
            buf = []
            for idx in sampler:
                buf.append(idx)
                if len(buf) == bs:
                    step += 1
                    base_seed = seed + step * 7919
                    b = None
                    if host_slice is not None:
                        s, n = host_slice
                        if use_native:
                            # per-host IO: read only this host's slice;
                            # shift the batch seed by s strides so item
                            # crops match the full-batch load bit-for-bit
                            b = _native_batch(
                                dataset, cfg, buf[s : s + n], collate,
                                (base_seed + _SEED_STRIDE * s) % _U64,
                            )
                        if b is None:  # fallback: full IO, then slice
                            b = collate([dataset[i] for i in buf])
                            b = {k: v[s : s + n] for k, v in b.items()}
                    else:
                        if use_native:
                            b = _native_batch(dataset, cfg, buf, collate, base_seed)
                        if b is None:
                            b = collate([dataset[i] for i in buf])
                    yield b
                    buf = []
            epoch += 1

    if prefetch <= 0:
        for b in gen():
            yield transform(b) if transform is not None else b
        return

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    _END = object()

    def worker():
        try:
            for b in gen():
                if transform is not None:
                    b = transform(b)
                q.put(b)
        finally:
            q.put(_END)

    th = threading.Thread(target=worker, daemon=True)
    th.start()
    while True:
        b = q.get()
        if b is _END:
            break
        yield b
