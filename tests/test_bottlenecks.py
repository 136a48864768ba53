import jax
import jax.numpy as jnp
import numpy as np

from wavenet_autoencoders_tpu.models import bottlenecks as bn


def test_vq_quantizes_to_codebook():
    p = bn.vq_init(jax.random.PRNGKey(0), K=8, D=4)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 4)) * 0.01
    q, loss, perp, idx = bn.vq_apply(p, z)
    assert q.shape == z.shape and idx.shape == (2, 5)
    # forward value equals the selected codes (straight-through identity)
    codes = np.asarray(p["codebook"])[np.asarray(idx)]
    np.testing.assert_allclose(np.asarray(q), codes, atol=1e-6)
    assert 1.0 <= float(perp) <= 8.0


def test_vq_nearest_neighbor_correct():
    p = {"codebook": jnp.array([[0.0, 0.0], [1.0, 1.0], [-1.0, -1.0]])}
    z = jnp.array([[[0.9, 1.1], [-0.05, 0.02], [-0.8, -1.2]]])
    _, _, _, idx = bn.vq_apply(p, z)
    np.testing.assert_array_equal(np.asarray(idx)[0], [1, 0, 2])


def test_vq_straight_through_gradient():
    p = bn.vq_init(jax.random.PRNGKey(2), K=8, D=4)

    def f(z):
        q, loss, _, _ = bn.vq_apply(p, z)
        return jnp.sum(q * 2.0)

    z = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 4))
    g = jax.grad(f)(z)
    # straight-through: dq/dz == I, so grad == 2 everywhere
    np.testing.assert_allclose(np.asarray(g), 2.0, atol=1e-6)


def test_vq_swapped_beta_loss():
    """The committed VectorQuantize multiplies β onto the CODEBOOK term
    (vector_quantization.py:41-43) — verify our plain VQ reproduces that."""
    p = {"codebook": jnp.array([[1.0, 1.0]])}  # single code
    z = jnp.zeros((1, 1, 2))
    _, loss, _, _ = bn.vq_apply(p, z, beta=0.25)
    # codebook term = mean((q - z)^2) = 1; commit term = 1
    # swapped form: 0.25 * 1 + 1 = 1.25
    np.testing.assert_allclose(float(loss), 1.25, atol=1e-6)


def test_sliced_vq_standard_beta_loss():
    """Sliced VQ uses the standard form: codebook + β·commit
    (vector_quantization.py:114-118) => 1 + 0.25."""
    p = {"codebooks": [jnp.array([[1.0]]), jnp.array([[1.0]])]}
    z = jnp.zeros((1, 1, 2))
    _, loss, _, _ = bn.sliced_vq_apply(p, z, beta=0.25)
    np.testing.assert_allclose(float(loss), 1.25, atol=1e-6)


def test_sliced_vq_slices_and_perplexity_sum():
    p = bn.sliced_vq_init(jax.random.PRNGKey(4), K=16, D=8, num_slices=2, K1=4)
    assert p["codebooks"][0].shape == (16, 4)
    assert p["codebooks"][1].shape == (4, 4)
    z = jax.random.normal(jax.random.PRNGKey(5), (3, 7, 8))
    q, loss, perp, idx = bn.sliced_vq_apply(p, z)
    assert q.shape == z.shape
    assert idx.shape == (3, 7, 2)
    # perplexity = perp1 + perp2 (vector_quantization.py:125-127)
    assert 2.0 <= float(perp) <= 20.0


def test_sliced_vq_num_slices_4():
    p = bn.sliced_vq_init(jax.random.PRNGKey(6), K=8, D=8, num_slices=4)
    z = jax.random.normal(jax.random.PRNGKey(7), (1, 5, 8))
    q, _, perp, idx = bn.sliced_vq_apply(p, z)
    assert q.shape == z.shape and idx.shape == (1, 5, 4)


def test_ema_updates_move_codebook_toward_data():
    st = bn.vq_ema_init(jax.random.PRNGKey(8), K=4, D=2)
    data = jnp.ones((4, 16, 2)) * 0.5  # all data at (0.5, 0.5)
    for _ in range(50):
        _, _, _, _, st = bn.vq_ema_apply(st, data, decay=0.8)
    cb = np.asarray(st["codebooks"][0])
    # the code capturing the data converges to the data mean
    d = np.min(np.linalg.norm(cb - 0.5, axis=1))
    assert d < 0.05


def test_ema_eval_mode_frozen():
    st = bn.vq_ema_init(jax.random.PRNGKey(9), K=4, D=2)
    z = jax.random.normal(jax.random.PRNGKey(10), (1, 8, 2))
    _, _, _, _, st2 = bn.vq_ema_apply(st, z, train=False)
    np.testing.assert_allclose(
        np.asarray(st["codebooks"][0]), np.asarray(st2["codebooks"][0])
    )


def test_ema_loss_is_commit_only():
    st = {"codebooks": [jnp.array([[1.0, 1.0]])],
          "cluster_size": [jnp.zeros(1)], "ema_w": [jnp.zeros((1, 2))]}
    z = jnp.zeros((1, 1, 2))
    _, loss, _, _, _ = bn.vq_ema_apply(st, z, beta=0.25, train=False)
    np.testing.assert_allclose(float(loss), 0.25, atol=1e-6)  # β·mean((q-z)²)


def test_gumbel_bottleneck():
    p = bn.gumbel_init(jax.random.PRNGKey(11), D=8, k=5, slices=4)
    z = jax.random.normal(jax.random.PRNGKey(12), (2, 6, 8))
    q, aux, perp, idx = bn.gumbel_apply(p, z, jax.random.PRNGKey(13), tau=0.5, train=True)
    assert q.shape == z.shape and idx.shape == (2, 6, 4)
    assert float(aux) == 0.0
    # eval mode is deterministic
    q1, *_ = bn.gumbel_apply(p, z, None, train=False)
    q2, *_ = bn.gumbel_apply(p, z, None, train=False)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2))


def test_gumbel_hard_straight_through():
    p = bn.gumbel_init(jax.random.PRNGKey(14), D=4, k=3, slices=2)
    z = jax.random.normal(jax.random.PRNGKey(15), (1, 4, 4))

    def f(zz):
        q, *_ = bn.gumbel_apply(p, zz, jax.random.PRNGKey(16), hard=True, train=True)
        return jnp.sum(q**2)

    g = jax.grad(f)(z)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_instance_norm_normalizes_per_channel():
    z = jax.random.normal(jax.random.PRNGKey(17), (2, 100, 4)) * 3 + 5
    y = np.asarray(bn.instance_norm(z))
    np.testing.assert_allclose(y.mean(axis=1), 0.0, atol=1e-4)
    np.testing.assert_allclose(y.std(axis=1), 1.0, atol=1e-2)


def test_adain_transfers_statistics():
    content = jax.random.normal(jax.random.PRNGKey(18), (1, 200, 4))
    style = jax.random.normal(jax.random.PRNGKey(19), (1, 200, 4)) * 2.0 + 3.0
    y = np.asarray(bn.adain(content, style))
    np.testing.assert_allclose(y.mean(axis=1), np.asarray(style).mean(axis=1), atol=0.05)
    np.testing.assert_allclose(y.std(axis=1), np.asarray(style).std(axis=1), atol=0.2)


def test_time_jitter_keeps_frame_set():
    z = jnp.arange(10, dtype=jnp.float32).reshape(1, 10, 1)
    y = np.asarray(bn.time_jitter(jax.random.PRNGKey(20), z, prob=0.3))[0, :, 0]
    # every output frame is a copy of a frame at distance <= 1
    orig = np.arange(10)
    assert np.all(np.abs(y - orig) <= 1)
    # with prob 0.3 each side, some frames moved (p(no move anywhere) ~ 0.4^10)
    assert np.any(y != orig)


def test_time_jitter_zero_prob_identity():
    z = jax.random.normal(jax.random.PRNGKey(21), (2, 8, 3))
    y = bn.time_jitter(jax.random.PRNGKey(22), z, prob=0.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(z))


def test_vq_dropout_zeroes_block():
    z = jnp.ones((2, 4, 8))
    y = np.asarray(bn.vq_dropout(jax.random.PRNGKey(23), z, drop_dim=2))
    for b in range(2):
        zeroed = np.where(y[b, 0] == 0)[0]
        assert len(zeroed) == 2
        assert zeroed[1] == zeroed[0] + 1  # contiguous
        # survivors rescaled by D/(D-drop)
        np.testing.assert_allclose(y[b][y[b] != 0], 8 / 6, rtol=1e-6)


def test_time_jitter_total_vs_per_side_probability():
    """per_side=True replaces ~2*prob of frames; per_side=False (Chorowski
    reading) replaces ~prob total (VERDICT r2 weak #6)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from wavenet_autoencoders_tpu.models import bottlenecks as bn

    T = 20000
    z = jnp.arange(T, dtype=jnp.float32)[None, :, None]
    key = jax.random.PRNGKey(0)
    for per_side, expect in [(True, 0.24), (False, 0.12)]:
        out = bn.time_jitter(key, z, prob=0.12, per_side=per_side)
        moved = float((np.asarray(out)[0, :, 0] != np.arange(T)).mean())
        assert abs(moved - expect) < 0.02, (per_side, moved)


def test_sliced_vq_commit_scale_weights_encoder_pull():
    """commit_scale scales ONLY the encoder-pull term mean((sg(q)-z)^2);
    the codebook term (beta-weighted) and the straight-through output are
    unchanged (reference parity at commit_scale=1)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from wavenet_autoencoders_tpu.models import bottlenecks as bn

    key = jax.random.PRNGKey(0)
    params = bn.sliced_vq_init(key, K=8, D=8, num_slices=2)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 8))
    q1, l1, p1, i1 = bn.sliced_vq_apply(params, z, beta=0.25, commit_scale=1.0)
    q0, l0, p0, i0 = bn.sliced_vq_apply(params, z, beta=0.25, commit_scale=0.0)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q0))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
    enc_pull = float(jnp.mean((jax.lax.stop_gradient(q1) - z) ** 2))
    np.testing.assert_allclose(float(l1 - l0), enc_pull, rtol=1e-5)
    # encoder gradient: at scale 0 the pull on z through the loss vanishes
    g1 = jax.grad(lambda z_: bn.sliced_vq_apply(params, z_, 0.25, 1.0)[1])(z)
    g0 = jax.grad(lambda z_: bn.sliced_vq_apply(params, z_, 0.25, 0.0)[1])(z)
    assert float(jnp.abs(g0).max()) < 1e-7
    assert float(jnp.abs(g1).max()) > 1e-4
