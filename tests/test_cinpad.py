"""cin_pad > 0 coverage (reference default ``hparams.py:70`` cin_pad=2).

The ConvInUpsampleNetwork consumes 2*cin_pad conditioning frames of context
(``/root/reference/wavenet_vocoder/upsample.py:69-85``): upsampled length is
(T' - 2*cin_pad) * prod(scales). These tests pin the default-T formulas in
``models/wae.py`` and the batch_wavegen path at cin_pad=2.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_autoencoders_tpu.config import load_preset
from wavenet_autoencoders_tpu.models import build_model
from wavenet_autoencoders_tpu.train import init_state, make_train_step


def vocoder_cfg(**over):
    cfg = load_preset("vocoder_raw")
    small = dict(
        layers=4,
        stacks=2,
        residual_channels=8,
        gate_channels=12,
        skip_out_channels=8,
        out_channels=6,  # 2 logistic mixtures
        cin_channels=5,
        cin_pad=2,
        gin_channels=-1,
        upsample_params={"upsample_scales": [2, 2]},
        hop_size=4,
        frame_rate=100,
        max_time_steps=32,
        compute_dtype="float32",
    )
    small.update(over)
    return cfg.replace(**small)


def test_vocoder_decode_default_T_cinpad2():
    cfg = vocoder_cfg()
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    F = 8  # audio frames; conditioning carries 2*cin_pad extra context frames
    c = jnp.asarray(np.random.default_rng(0).standard_normal((2, F + 4, 5)), jnp.float32)
    y = model.decode(params, jax.random.PRNGKey(1), c, T=None, log_scale_min=cfg.log_scale_min)
    assert y.shape == (2, F * 4, 1)
    assert np.isfinite(np.asarray(y)).all()


def test_vocoder_train_step_cinpad2():
    cfg = vocoder_cfg()
    model = build_model(cfg)
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, model, donate=False)
    rng = np.random.default_rng(1)
    F = 8
    T = F * 4
    batch = {
        "x": rng.uniform(-1, 1, (2, T)).astype(np.float32),
        "y": rng.uniform(-1, 1, (2, T, 1)).astype(np.float32),
        "c": rng.standard_normal((2, F + 4, 5)).astype(np.float32),
        "lengths": np.full((2,), T, np.int32),
    }
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_batch_wavegen_cinpad2():
    from wavenet_autoencoders_tpu.eval.synthesize import batch_wavegen

    cfg = vocoder_cfg()
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(3))
    F = 6
    c = np.random.default_rng(2).standard_normal((2, F + 4, 5)).astype(np.float32)
    wav = batch_wavegen(cfg, model, params, state, c, key=jax.random.PRNGKey(4))
    assert wav.shape == (2, F * 4)
    assert np.isfinite(wav).all()


def test_wae_decode_default_T_cinpad():
    """VQ-WAE latent conditioning with cin_pad=1: default T trims the
    2*cin_pad latent context frames (models/wae.py WAEBase.decode)."""
    from test_train import tiny_cfg

    cfg = tiny_cfg(cin_pad=1)
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(5))
    ds = 100 // cfg.frame_rate
    L = 6  # latent frames
    c = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, L * ds, cfg.dim_in)), jnp.float32
    )
    g = jnp.zeros((1,), jnp.int32)
    y = model.decode(params, jax.random.PRNGKey(6), c, g=g, T=None, state=state)
    prod = 4  # upsample scales [2, 2]
    assert y.shape == (1, (L - 2) * prod, cfg.out_channels)
    assert np.isfinite(np.asarray(y)).all()


def test_upsampler_length_contract_cinpad2():
    """conv_in_upsample output length == (T' - 2*cin_pad)*prod(scales)."""
    from wavenet_autoencoders_tpu.ops.upsample import (
        conv_in_upsample_apply,
        conv_in_upsample_init,
    )

    p = conv_in_upsample_init(jax.random.PRNGKey(7), 5, 2, (2, 2))
    c = jnp.asarray(np.random.default_rng(4).standard_normal((1, 12, 5)), jnp.float32)
    out = conv_in_upsample_apply(p, c, (2, 2))
    assert out.shape == (1, (12 - 4) * 4, 5)
