"""WaveNet with fused_glu=True matches the reference path end to end
(forward + train-step gradients)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from test_wavenet import tiny_wavenet


def test_fused_forward_matches_reference():
    net = tiny_wavenet()
    net_f = dataclasses.replace(net, fused_glu=True)
    params = net.init(jax.random.PRNGKey(0))
    B, T = 2, 20
    x = jax.nn.one_hot(jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, 16), 16)
    c = jax.random.normal(jax.random.PRNGKey(2), (B, T, 5))
    g = jnp.array([0, 3])
    y_ref = net.apply(params, x, c, g, upsampled=True)
    y_f = net_f.apply(params, x, c, g, upsampled=True)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref), atol=3e-5)


def test_fused_gradients_match_reference():
    net = tiny_wavenet()
    net_f = dataclasses.replace(net, fused_glu=True)
    params = net.init(jax.random.PRNGKey(3))
    B, T = 2, 16
    x = jax.nn.one_hot(jax.random.randint(jax.random.PRNGKey(4), (B, T), 0, 16), 16)
    c = jax.random.normal(jax.random.PRNGKey(5), (B, T, 5))
    g = jnp.array([1, 2])
    tgt = jax.random.randint(jax.random.PRNGKey(6), (B, T), 0, 16)

    def loss(n):
        def f(p):
            y = n.apply(p, x, c, g, upsampled=True)
            lp = jax.nn.log_softmax(y, -1)
            return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

        return f

    v_ref, g_ref = jax.value_and_grad(loss(net))(params)
    v_f, g_f = jax.value_and_grad(loss(net_f))(params)
    np.testing.assert_allclose(float(v_f), float(v_ref), rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_f = jax.tree_util.tree_leaves(g_f)
    for a, b in zip(flat_ref, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_fused_no_conditioning():
    net = tiny_wavenet(cin_channels=-1, gin_channels=-1, use_speaker_embedding=False)
    net_f = dataclasses.replace(net, fused_glu=True)
    params = net.init(jax.random.PRNGKey(7))
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 12, 16))
    np.testing.assert_allclose(
        np.asarray(net_f.apply(params, x)), np.asarray(net.apply(params, x)), atol=3e-5
    )
