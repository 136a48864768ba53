"""Fused GLU training layer vs the reference path: forward values AND
gradients (explicit VJP vs jax.grad of residual_glu_apply)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_autoencoders_tpu.kernels.glu_train import fused_glu_layer
from wavenet_autoencoders_tpu.ops.conv import conv1d_weight
from wavenet_autoencoders_tpu.ops.modules import residual_glu_apply, residual_glu_init


def setup(dilation=2, B=2, T=16, C=8, G=12, S=8, cin=5, gin=4, seed=0):
    key = jax.random.PRNGKey(seed)
    p = residual_glu_init(key, C, G, 3, skip_out_channels=S, cin_channels=cin, gin_channels=gin)
    ks = jax.random.split(jax.random.PRNGKey(seed + 1), 3)
    x = jax.random.normal(ks[0], (B, T, C))
    c = jax.random.normal(ks[1], (B, T, cin))
    g = jax.random.normal(ks[2], (B, gin))
    return p, x, c, g


def folded(p):
    return dict(
        wconv=conv1d_weight(p["conv"]),
        bconv=p["conv"]["b"],
        wc=conv1d_weight(p["cproj"])[0],
        wout=conv1d_weight(p["out"])[0],
        bout=p["out"]["b"],
        wskip=conv1d_weight(p["skip"])[0],
        bskip=p["skip"]["b"],
    )


@pytest.mark.parametrize("dilation", [1, 2, 4])
def test_forward_matches_reference(dilation):
    p, x, c, g = setup(dilation)
    w = folded(p)
    g_add = jnp.einsum("bj,jg->bg", g, conv1d_weight(p["gproj"])[0])
    out_ref, skip_ref = residual_glu_apply(p, x, c, g, dilation=dilation)
    out_k, skip_k = fused_glu_layer(
        x, c, g_add, w["wconv"], w["bconv"], w["wc"], w["wout"], w["bout"],
        w["wskip"], w["bskip"], dilation, True,
    )
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(skip_k), np.asarray(skip_ref), atol=2e-5)


@pytest.mark.parametrize("dilation", [1, 4])
def test_gradients_match_reference(dilation):
    p, x, c, g = setup(dilation)
    wg = conv1d_weight(p["gproj"])[0]

    def loss_ref(x, c, g, p):
        out, skip = residual_glu_apply(p, x, c, g, dilation=dilation)
        return jnp.sum(out**2) + jnp.sum(jnp.tanh(skip))

    def loss_k(x, c, g, p):
        w = folded(p)
        g_add = jnp.einsum("bj,jg->bg", g, conv1d_weight(p["gproj"])[0])
        out, skip = fused_glu_layer(
            x, c, g_add, w["wconv"], w["bconv"], w["wc"], w["wout"], w["bout"],
            w["wskip"], w["bskip"], dilation, True,
        )
        return jnp.sum(out**2) + jnp.sum(jnp.tanh(skip))

    v_ref = float(loss_ref(x, c, g, p))
    v_k = float(loss_k(x, c, g, p))
    assert abs(v_ref - v_k) < 1e-3 * max(1.0, abs(v_ref))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, c, g, p)
    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, c, g, p)
    for a, b, name in zip(gr, gk, ["dx", "dc", "dg"]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4, err_msg=name)

    # weight grads (through the weight-norm fold — exercises VJP composition)
    grp = jax.grad(lambda pp: loss_ref(x, c, g, pp))(p)
    gkp = jax.grad(lambda pp: loss_k(x, c, g, pp))(p)
    for path in [("conv", "v"), ("conv", "g"), ("conv", "b"),
                 ("out", "v"), ("out", "b"), ("skip", "v"), ("cproj", "v"), ("gproj", "v")]:
        a = grp[path[0]][path[1]]
        b = gkp[path[0]][path[1]]
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, err_msg=str(path)
        )


def test_no_conditioning_variant():
    p, x, _c, _g = setup()
    p2 = {k: v for k, v in p.items() if k not in ("cproj", "gproj")}
    w = folded(p)
    out_ref, skip_ref = residual_glu_apply(p2, x, None, None, dilation=2)
    out_k, skip_k = fused_glu_layer(
        x, None, None, w["wconv"], w["bconv"], None, w["wout"], w["bout"],
        w["wskip"], w["bskip"], 2, True,
    )
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(skip_k), np.asarray(skip_ref), atol=2e-5)
