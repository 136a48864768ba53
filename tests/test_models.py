import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_autoencoders_tpu.config import load_preset
from wavenet_autoencoders_tpu.models import build_model


def tiny_cfg(preset, **over):
    """Shrink a preset to CPU-test size while keeping its structure."""
    cfg = load_preset(preset)
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
        upsample_params={"upsample_scales": [2, 2]},
    )
    small.update(over)
    return cfg.replace(**small)


# hop equivalent of the tiny upsampler
UP = 4


def _data(cfg, B=2, frames=8):
    ds = 100 // cfg.frame_rate
    T = frames * UP
    key = jax.random.PRNGKey(0)
    x = jax.nn.one_hot(jax.random.randint(key, (B, T), 0, cfg.quantize_channels), cfg.quantize_channels)
    c = jax.random.normal(jax.random.PRNGKey(1), (B, frames * ds, cfg.dim_in))
    g = jnp.arange(B) % cfg.n_speakers
    return x, c, g


@pytest.mark.parametrize(
    "preset,over",
    [
        ("vqwae", {}),                                        # plain VQ
        ("svqwae", {}),                                       # sliced + IN
        ("svqwae", {"ema": True}),                            # sliced EMA
        ("vqwae", {"ema": True, "sliced": False}),            # plain EMA
        ("svqwae", {"use_K1": True, "K1": 4}),                # asymmetric SVQ
        ("svqwae", {"time_jitter": True}),                    # jitter
        ("svqwae", {"vq_drop": True, "drop_dim": 2}),         # VQ dropout
        ("svqwae", {"post_conv": True}),                      # post conv (hid=64)
        ("inae", {}),                                         # IN-WAE 50 Hz
        ("inae", {"name": "inae1"}),                          # per-block IN
        ("catae", {"num_slices": 4, "K": 8}),                 # Gumbel
        ("wvae", {}),                                         # continuous AE
    ],
)
def test_zoo_forward_encode(preset, over):
    cfg = tiny_cfg(preset, **over)
    if cfg.post_conv:
        # post_conv path uses hid=64 internally; shrink via cin_channels
        cfg = cfg.replace(cin_channels=8)
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(42))
    x, c, g = _data(cfg)
    y, aux, perp, new_state = model.forward(
        params, state, jax.random.PRNGKey(7), x, c, g, train=True
    )
    assert y.shape == (x.shape[0], x.shape[1], cfg.out_channels)
    assert np.isfinite(np.asarray(y)).all()
    assert np.isfinite(float(aux)) and np.isfinite(float(perp))

    lat = model.encode(params, state, c)
    ds = 100 // cfg.frame_rate
    assert lat.shape[1] == c.shape[1] // ds
    assert np.isfinite(np.asarray(lat)).all()


def test_new_inae_forward():
    cfg = tiny_cfg("inae", name="new_inae")
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    x, c, g = _data(cfg)
    y, aux, perp, _ = model.forward(params, state, jax.random.PRNGKey(1), x, c, None)
    assert y.shape == (x.shape[0], x.shape[1], cfg.out_channels)
    spk = model.speaker_code(params, c)
    assert spk.shape == (x.shape[0], 64)


def test_vocoder_forward():
    cfg = tiny_cfg("vocoder", cin_channels=39)
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    B, frames = 2, 8
    T = frames * UP
    x = jax.nn.one_hot(jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, 16), 16)
    c = jax.random.normal(jax.random.PRNGKey(2), (B, frames, 39))
    y, *_ = model.forward(params, state, jax.random.PRNGKey(3), x, c, None)
    assert y.shape == (B, T, 16)


def test_grads_flow_through_vqwae():
    cfg = tiny_cfg("svqwae")
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    x, c, g = _data(cfg)

    def loss_fn(p):
        y, aux, perp, _ = model.forward(p, state, jax.random.PRNGKey(1), x, c, g, train=True)
        tgt = jnp.argmax(x, -1)
        from wavenet_autoencoders_tpu.ops import masked_cross_entropy

        ce = masked_cross_entropy(y[:, :-1], tgt[:, 1:], jnp.ones_like(tgt[:, 1:], jnp.float32))
        return ce + aux

    grads = jax.grad(loss_fn)(params)
    # encoder gets gradient through the straight-through estimator
    g_enc = np.asarray(grads["encoder"]["blocks"][0]["w"])
    assert np.abs(g_enc).sum() > 0
    # codebook gets gradient through the codebook loss term
    g_cb = np.asarray(grads["vq"]["codebooks"][0])
    assert np.abs(g_cb).sum() > 0


def test_adain_encode_with_target_utterance():
    cfg = tiny_cfg("inae")
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    _, c, _ = _data(cfg)
    tar_c = jax.random.normal(jax.random.PRNGKey(9), c.shape) * 2.0 + 1.0
    z_plain = model.encode(params, state, c)
    z_styled = model.encode(params, state, c, tar_c=tar_c)
    assert z_plain.shape == z_styled.shape
    assert not np.allclose(np.asarray(z_plain), np.asarray(z_styled))


def test_vqwae_decode_tiny():
    cfg = tiny_cfg("vqwae")
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    _, c, g = _data(cfg, B=1, frames=4)
    T = 4 * UP
    y = model.decode(params, jax.random.PRNGKey(1), c, g=g[:1], T=T, state=state)
    assert y.shape == (1, T, cfg.out_channels)
    np.testing.assert_allclose(np.asarray(y).sum(-1), 1.0, atol=1e-5)


def test_vqwae_pre_vq_encode_is_continuous():
    """encode(pre_vq=True) returns the pre-quantization code: not equal to
    the quantized export, and instance-normed when ins_norm is on."""
    import jax
    import numpy as np
    from test_train import tiny_cfg
    from wavenet_autoencoders_tpu.models import build_model

    cfg = tiny_cfg(sliced=True, ins_norm=True)
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 16, cfg.dim_in))
    q = np.asarray(model.encode(params, state, c))
    z = np.asarray(model.encode(params, state, c, pre_vq=True))
    assert q.shape == z.shape
    assert not np.allclose(q, z)
    # per-utterance channel stats ~ (0, 1) after instance norm
    assert np.abs(z.mean(axis=1)).max() < 1e-4
    np.testing.assert_allclose(z.std(axis=1), 1.0, atol=5e-2)
