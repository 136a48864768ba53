"""ABX representation export (``inference_2019.py:229-325``).

Per test utterance: load ``<feat>.npy``, run ``model.encode`` and save the
latent as ``dst/2019/<lan>/test/<utt>.txt`` (one frame per row, '%.6f') —
the ZeroSpeech 2019 submission format consumed by
``zerospeech2020-evaluate``.

TPU-first difference: utterances are bucketed by padded length and encoded
in batches under jit (the reference encodes one by one); frames beyond each
utterance's true length are dropped before writing.
"""
from __future__ import annotations

import json
import os
from collections import defaultdict
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from wavenet_autoencoders_tpu.config import Config


def _out_path(base_dir: str, dst_dir: str) -> str:
    parts = [p for p in str(base_dir).split("/") if p]
    lan, fnm = parts[-3], parts[-1]
    return f"{dst_dir}/2019/{lan}/test/{fnm}.txt"


def export_representations(
    cfg: Config,
    model,
    params,
    state,
    scp_path: str,
    dst_dir: str,
    feat: str = "mfcc.norm",
    batch_size: int = 8,
    pad_multiple: int | None = None,
):
    """Encode every utterance in the scp json and write ABX txt files."""
    file_list = json.load(open(scp_path))
    ds = 100 // cfg.frame_rate if pad_multiple is None else pad_multiple

    # group utterances by padded frame length -> few jit specializations
    items = []
    for _src, base_dir in file_list:
        fp = Path(str(base_dir)) / f"{feat}.npy"
        if not fp.exists():
            raise FileNotFoundError(fp)
        x = np.load(fp)
        T = x.shape[0]
        Tp = ((T + ds - 1) // ds) * ds
        # bucket to 200-frame (2 s) granularity to bound compilations
        bucket = ((Tp + 199) // 200) * 200
        items.append((str(base_dir), x, T, bucket))

    buckets = defaultdict(list)
    for it in items:
        buckets[it[3]].append(it)

    @jax.jit
    def encode(c):
        return model.encode(params, state, c)

    n = 0
    for bucket, group in sorted(buckets.items()):
        for i in range(0, len(group), batch_size):
            chunk = group[i : i + batch_size]
            c = np.zeros((len(chunk), bucket, chunk[0][1].shape[1]), np.float32)
            for j, (_d, x, T, _b) in enumerate(chunk):
                c[j, :T] = x
            lat = np.asarray(encode(jnp.asarray(c)))
            for j, (base_dir, _x, T, _b) in enumerate(chunk):
                n_lat = min(lat.shape[1], -(-T // ds))  # ceil(T/ds)
                out = lat[j, :n_lat]
                path = _out_path(base_dir, dst_dir)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                np.savetxt(path, out, fmt="%.6f")
                n += 1
    print(f"exported {n} representations -> {dst_dir}")
    return n
