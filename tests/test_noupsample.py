"""No-upsampler conditioning path (VERDICT r2 item 5).

When ``upsample_conditional_features=false`` (the reference hparams.py:71
default) the reference repeats frame-rate conditioning to sample rate on
the host (``synthesis.py:335-339``; ``audio.adjust_time_resolution`` in the
training collate, ``vqwae_train.py:481``). Here the repeat happens on
device in ``WaveNet._align_conditioning`` so training, scan decode and
``batch_wavegen`` all work with the upsampler off.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_autoencoders_tpu.config import load_preset
from wavenet_autoencoders_tpu.data.dataset import Collator
from wavenet_autoencoders_tpu.eval.synthesize import wavegen
from wavenet_autoencoders_tpu.models import build_model
from wavenet_autoencoders_tpu.models.wavenet import WaveNet
from wavenet_autoencoders_tpu.train.step import init_state, make_train_step


def no_up_cfg(**over):
    cfg = load_preset("vqwae")
    small = dict(
        layers=4,
        stacks=2,
        residual_channels=8,
        gate_channels=12,
        skip_out_channels=8,
        encoder_hid=16,
        cin_channels=8,
        gin_channels=4,
        n_speakers=5,
        K=8,
        out_channels=16,
        quantize_channels=16,
        upsample_conditional_features=False,
        cin_pad=0,
        max_time_steps=32,
        hop_size=4,
        compute_dtype="float32",
    )
    small.update(over)
    return cfg.replace(**small)


def small_net(**over):
    kw = dict(
        out_channels=16,
        layers=4,
        stacks=2,
        residual_channels=8,
        gate_channels=12,
        skip_out_channels=8,
        cin_channels=8,
        upsample_conditional_features=False,
        cin_pad=0,
        dropout=0.0,
    )
    kw.update(over)
    return WaveNet(**kw)


def test_apply_repeat_matches_host_repeat():
    """On-device repeat == the reference's host-side adjust_time_resolution
    (nearest-neighbour frame repeat) followed by a normal forward."""
    net = small_net()
    params = net.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 16, (2, 32)), jnp.int32)
    c = jnp.asarray(rng.standard_normal((2, 8, 8)), jnp.float32)

    y_device = net.apply(params, x, c)  # repeat path: 8 frames -> 32
    c_host = jnp.repeat(c, 4, axis=1)  # adjust_time_resolution equivalent
    y_host = net.apply(params, x, c_host, upsampled=True)
    np.testing.assert_allclose(np.asarray(y_device), np.asarray(y_host))


def test_apply_rejects_nondivisible_T():
    net = small_net()
    params = net.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 30), jnp.int32)  # 30 not a multiple of 8 frames
    c = jnp.zeros((1, 8, 8), jnp.float32)
    with pytest.raises(AssertionError, match="repeat path"):
        net.apply(params, x, c)


def test_train_step_upsample_off():
    cfg = no_up_cfg()
    model = build_model(cfg)
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model)
    rng = np.random.default_rng(1)
    B, T = 2, 32
    # 32 mfcc frames -> encoder ds=4 -> 8 latent frames -> repeat x4 -> T=32
    batch = {
        "x": rng.integers(0, 16, (B, T)).astype(np.int32),
        "y": rng.integers(0, 16, (B, T, 1)).astype(np.int32),
        "c": rng.standard_normal((B, 32, cfg.dim_in)).astype(np.float32),
        "g": np.array([0, 1], np.int32),
        "lengths": np.full((B,), T, np.int32),
    }
    state, m = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
    state, m2 = step(state, batch, jax.random.PRNGKey(3))
    assert float(m2["loss"]) != float(m["loss"])  # params actually moved


def test_scan_decode_upsample_off():
    """WaveNet.decode with frame-rate conditioning: T from the repeat."""
    net = small_net()
    params = net.init(jax.random.PRNGKey(0))
    c = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8)), jnp.float32)
    y = net.decode(params, jax.random.PRNGKey(1), 32, c=c)
    assert y.shape == (2, 32, 16)
    assert np.allclose(np.asarray(y).sum(-1), 1.0)  # one-hot samples


def test_wavegen_upsample_off_end_to_end():
    """batch_wavegen derives T = latent_frames * up_factor when the
    upsampler is off (reference synthesis.py:335)."""
    cfg = no_up_cfg()
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    c = np.random.default_rng(0).standard_normal((8, cfg.dim_in)).astype(np.float32)
    wav = wavegen(cfg, model, params, state, c, g=1)
    # 8 mfcc frames -> 2 latent frames (ds=4) -> * up_factor (hop 4 * 4) = 32
    assert wav.shape == (32,)
    assert np.isfinite(wav).all()


def test_collator_requires_cin_pad_zero_without_upsampler():
    with pytest.raises(AssertionError, match="cin_pad=0"):
        Collator(no_up_cfg(cin_pad=2))
    Collator(no_up_cfg())  # cin_pad=0 constructs fine


def test_align_matches_dsp_adjust_time_resolution():
    """dsp.adjust_time_resolution's frame repeat (audio.py:68-91) is the
    exact semantics WaveNet._align_conditioning implements on device: a
    nearest-neighbour repeat of each frame `hop` times (the dsp variant
    additionally co-trims leading/trailing silence, which is a
    preprocessing concern)."""
    from wavenet_autoencoders_tpu.dsp.filters import adjust_time_resolution

    rng = np.random.default_rng(0)
    N, D, hop = 8, 5, 4
    feats = rng.standard_normal((N, D)).astype(np.float32)
    quantized = np.full(N * hop, 200, np.int64)  # non-silent everywhere
    q_t, feats_up = adjust_time_resolution(quantized, feats, silence_threshold=2)
    expect = np.repeat(feats, hop, axis=0)
    assert len(q_t) == len(feats_up)
    np.testing.assert_array_equal(feats_up, expect[: len(feats_up)])

    # and the device path produces that same repeat
    net = small_net(cin_channels=D)
    params = net.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.integers(0, 16, (1, N * hop)), jnp.int32)
    y_device = net.apply(params, x, jnp.asarray(feats)[None])
    y_host = net.apply(params, x, jnp.asarray(expect)[None], upsampled=True)
    np.testing.assert_allclose(np.asarray(y_device), np.asarray(y_host))
