import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_autoencoders_tpu import ops
from wavenet_autoencoders_tpu.ops.conv import receptive_field_size


def test_receptive_field_reference_value():
    # hps/vqwae.json decoder: 20 layers, 2 stacks, k=3 -> 4093 samples
    # (BASELINE.md row 6)
    assert receptive_field_size(20, 2, 3) == 4093
    assert receptive_field_size(24, 4, 3) == (3 - 1) * 4 * (1 + 2 + 4 + 8 + 16 + 32) + 1


def test_conv1d_weight_norm_identity_at_init():
    # weight-norm decomposition must reproduce the original weight exactly
    key = jax.random.PRNGKey(0)
    p = ops.conv1d_init(key, 8, 16, 3)
    w = ops.conv1d_weight(p)
    # g = ||v|| at init => w == v
    np.testing.assert_allclose(np.asarray(w), np.asarray(p["v"]), rtol=1e-5)


def test_conv1d_causal_padding():
    key = jax.random.PRNGKey(1)
    p = ops.conv1d_init(key, 4, 4, 3)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 4))
    y = ops.causal_conv1d_apply(p, x, dilation=4)
    assert y.shape == (2, 16, 4)
    # causality: changing x[t0] must not affect y[:, :t0]
    x2 = x.at[:, 10, :].set(99.0)
    y2 = ops.causal_conv1d_apply(p, x2, dilation=4)
    np.testing.assert_allclose(np.asarray(y[:, :10]), np.asarray(y2[:, :10]), atol=1e-5)
    assert not np.allclose(np.asarray(y[:, 10:]), np.asarray(y2[:, 10:]))


def test_conv1d_matches_explicit_sum():
    # dilated causal conv == sum of shifted matmuls
    key = jax.random.PRNGKey(3)
    p = ops.conv1d_init(key, 3, 5, 3, bias=False)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 12, 3))
    d = 2
    y = ops.causal_conv1d_apply(p, x, dilation=d)
    w = np.asarray(ops.conv1d_weight(p))
    xp = np.pad(np.asarray(x), [(0, 0), (2 * d, 0), (0, 0)])
    man = (
        xp[:, :-2 * d or None][:, :12] @ w[0]
        + xp[:, d:][:, :12] @ w[1]
        + xp[:, 2 * d:][:, :12] @ w[2]
    )
    np.testing.assert_allclose(np.asarray(y), man, atol=1e-5)


def test_residual_glu_shapes_and_scaling():
    key = jax.random.PRNGKey(5)
    p = ops.residual_glu_init(key, 16, 32, 3, skip_out_channels=24, cin_channels=8, gin_channels=4)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 10, 16))
    c = jax.random.normal(jax.random.PRNGKey(7), (2, 10, 8))
    g = jax.random.normal(jax.random.PRNGKey(8), (2, 4))
    out, skip = ops.residual_glu_apply(p, x, c, g, dilation=2)
    assert out.shape == (2, 10, 16) and skip.shape == (2, 10, 24)


def test_embedding_init_std():
    p = ops.embedding_init(jax.random.PRNGKey(9), 1000, 64, std=0.1)
    assert abs(float(jnp.std(p["table"])) - 0.1) < 0.01


# ---------------- mixture ----------------


def test_mol_loss_discretization_sums_to_one():
    # For any params, total probability over the 256 discretized bins == 1
    key = jax.random.PRNGKey(10)
    y_hat = 0.5 * jax.random.normal(key, (1, 1, 30))  # 10 mixtures
    centers = (jnp.arange(256) / 127.5) - 1.0  # bin centers in [-1, 1]
    y = centers.reshape(1, 256, 1)
    y_hat_t = jnp.broadcast_to(y_hat, (1, 256, 30))
    nll = ops.discretized_mix_logistic_loss(y_hat_t, y, num_classes=256, reduce=False)
    total = float(jnp.sum(jnp.exp(-nll)))
    assert abs(total - 1.0) < 1e-3


def test_mol_sampler_statistics():
    # single mixture, known mean/scale: sample mean/std should match logistic
    mean, log_scale = 0.2, -3.0
    B, T = 1, 20000
    y = jnp.stack(
        [jnp.zeros((B, T)), jnp.full((B, T), mean), jnp.full((B, T), log_scale)], axis=-1
    )
    s = ops.sample_from_discretized_mix_logistic(jax.random.PRNGKey(11), y)
    samples = np.asarray(s).ravel()
    assert abs(samples.mean() - mean) < 0.01
    # logistic std = s * pi / sqrt(3)
    expected_std = np.exp(log_scale) * np.pi / np.sqrt(3)
    assert abs(samples.std() - expected_std) < 0.01


def test_mog_loss_matches_gaussian_nll():
    # C == 2 single-gaussian case: loss equals the analytic Normal NLL
    mean, log_scale = 0.1, -1.0
    y_hat = jnp.array([[[mean, log_scale]]])
    y = jnp.array([[[0.3]]])
    nll = float(ops.mix_gaussian_loss(y_hat, y, reduce=True))
    expected = -(-0.5 * np.log(2 * np.pi) - log_scale - 0.5 * ((0.3 - mean) / np.exp(log_scale)) ** 2)
    assert abs(nll - expected) < 1e-5


def test_mog_sampler_statistics():
    mean, log_scale = -0.1, -2.0
    y = jnp.stack([jnp.full((1, 20000), mean), jnp.full((1, 20000), log_scale)], axis=-1)
    s = np.asarray(ops.sample_from_mix_gaussian(jax.random.PRNGKey(12), y)).ravel()
    assert abs(s.mean() - mean) < 0.01
    assert abs(s.std() - np.exp(log_scale)) < 0.01


def test_log_sum_exp_stable():
    x = jnp.array([[1000.0, 1000.0]])
    v = float(ops.log_sum_exp(x)[0])
    assert np.isfinite(v)
    np.testing.assert_allclose(v, 1000.0 + np.log(2), rtol=1e-6)


# ---------------- masked losses ----------------


def test_sequence_mask():
    m = ops.sequence_mask(jnp.array([2, 4]), 5)
    np.testing.assert_array_equal(
        np.asarray(m), [[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]]
    )


def test_masked_ce_ignores_padding():
    logits = jax.random.normal(jax.random.PRNGKey(13), (2, 6, 10))
    targets = jnp.zeros((2, 6), jnp.int32)
    mask_full = jnp.ones((2, 6))
    mask_half = ops.sequence_mask(jnp.array([3, 3]), 6)
    l_full = ops.masked_cross_entropy(logits, targets, mask_full)
    l_half = ops.masked_cross_entropy(logits, targets, mask_half)
    # corrupt the padded region: masked loss must not change
    logits2 = logits.at[:, 3:, :].set(123.0)
    l_half2 = ops.masked_cross_entropy(logits2, targets, mask_half)
    np.testing.assert_allclose(float(l_half), float(l_half2), rtol=1e-6)
    assert not np.allclose(float(l_full), float(l_half))


# ---------------- upsampler ----------------


def test_upsample_network_scales_time():
    key = jax.random.PRNGKey(14)
    scales = (4, 4, 8, 5)  # hps/vqwae.json: 640x
    p = ops.upsample_network_init(key, scales)
    c = jax.random.normal(jax.random.PRNGKey(15), (2, 8, 6))
    y = ops.upsample_network_apply(p, c, scales)
    assert y.shape == (2, 8 * 640, 6)


def test_upsample_init_is_smoothing():
    # init weights = mean filter -> upsampling a constant stays constant
    scales = (2, 2)
    p = ops.upsample_network_init(jax.random.PRNGKey(16), scales)
    c = jnp.ones((1, 5, 3)) * 2.5
    y = ops.upsample_network_apply(p, c, scales)
    assert y.shape == (1, 20, 3)
    # zero-padded smoothing convs bleed ~2 taps per stage into the edges
    inner = np.asarray(y)[0, 8:-8]
    np.testing.assert_allclose(inner, 2.5, rtol=1e-5)


def test_conv_in_upsample_trims_context():
    cin_pad, scales = 2, (2, 2)
    p = ops.conv_in_upsample_init(jax.random.PRNGKey(17), 6, cin_pad, scales)
    c = jax.random.normal(jax.random.PRNGKey(18), (1, 12, 6))
    y = ops.conv_in_upsample_apply(p, c, scales)
    # (12 - 2*cin_pad) * 4 samples (upsample.py:69-85 semantics)
    assert y.shape == (1, (12 - 2 * cin_pad) * 4, 6)
