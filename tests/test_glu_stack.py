"""Whole-stack fused GLU train kernel: forward + gradient parity against a
plain-JAX reference of the same math (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_autoencoders_tpu.kernels.glu_stack import fused_glu_stack

RS = float(np.sqrt(0.5))


def make_inputs(key, B=2, T=64, C=8, G=16, S=8, cin=4, L=4, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 16))
    G2 = G // 2
    mk = lambda *shape: 0.3 * jax.random.normal(next(ks), shape, jnp.float32)
    x = mk(B, T, C).astype(dtype)
    c = mk(B, T, cin)
    g_add = mk(B, L, G)
    w = dict(
        wconv=mk(L, 3, C, G), bconv=mk(L, G), wc=mk(L, cin, G),
        wout=mk(L, G2, C), bout=mk(L, C), wskip=mk(L, G2, S), bskip=mk(L, S),
    )
    return x, c, g_add, w


def ref_stack(x, c, g_add, w, dils):
    """Plain-JAX reference of the fused math (f32 throughout)."""
    L = w["wconv"].shape[0]
    G = w["wconv"].shape[-1]
    G2 = G // 2
    h = x.astype(jnp.float32)
    skips = 0.0
    for l in range(L):
        d = dils[l]
        hp = jnp.pad(h, ((0, 0), (2 * d, 0), (0, 0)))
        T = x.shape[1]
        ab = (
            jnp.einsum("btc,cg->btg", hp[:, :T], w["wconv"][l, 0])
            + jnp.einsum("btc,cg->btg", hp[:, d : d + T], w["wconv"][l, 1])
            + jnp.einsum("btc,cg->btg", hp[:, 2 * d : 2 * d + T], w["wconv"][l, 2])
            + w["bconv"][l]
        )
        ab = ab + jnp.einsum("btj,jg->btg", c, w["wc"][l]) + g_add[:, l][:, None, :]
        act = jnp.tanh(ab[..., :G2]) * jax.nn.sigmoid(ab[..., G2:])
        skips = skips + jnp.einsum("btg,gs->bts", act, w["wskip"][l]) + w["bskip"][l]
        out = jnp.einsum("btg,gc->btc", act, w["wout"][l]) + w["bout"][l]
        h = (out + h) * RS
    return skips


DILS = (1, 2, 4, 8)


def fused(x, c, g_add, w):
    return fused_glu_stack(
        x, c, g_add, w["wconv"], w["bconv"], w["wc"], w["wout"], w["bout"],
        w["wskip"], w["bskip"], DILS, True,
    )


def test_forward_parity_f32():
    x, c, g_add, w = make_inputs(jax.random.PRNGKey(0))
    got = fused(x, c, g_add, w)
    want = ref_stack(x, c, g_add, w, DILS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_gradient_parity_f32():
    x, c, g_add, w = make_inputs(jax.random.PRNGKey(1))
    probe = jax.random.normal(jax.random.PRNGKey(2), ref_stack(x, c, g_add, w, DILS).shape)

    def loss_fused(x, c, g_add, w):
        return jnp.sum(fused(x, c, g_add, w) * probe)

    def loss_ref(x, c, g_add, w):
        return jnp.sum(ref_stack(x, c, g_add, w, DILS) * probe)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, c, g_add, w)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, c, g_add, w)
    names = ["dx", "dc", "dg_add"]
    for name, a, b in zip(names, gf[:3], gr[:3]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4, err_msg=name
        )
    for k in gr[3]:
        np.testing.assert_allclose(
            np.asarray(gf[3][k]), np.asarray(gr[3][k]), atol=5e-5, rtol=5e-4,
            err_msg=k,
        )


def test_forward_parity_bf16():
    """bf16 storage mode: ab rounded to bf16, act derived from the stored
    value in both passes — forward matches a bf16-ized reference loosely."""
    x, c, g_add, w = make_inputs(jax.random.PRNGKey(3), dtype=jnp.bfloat16)
    got = fused(x, c, g_add, w)
    want = ref_stack(x.astype(jnp.float32), c, g_add, w, DILS)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=0.15, rtol=0.1
    )


def test_gradient_finite_bf16():
    x, c, g_add, w = make_inputs(jax.random.PRNGKey(4), dtype=jnp.bfloat16)

    def loss(x, w):
        return jnp.sum(fused(x, c, g_add, w).astype(jnp.float32) ** 2)

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
    assert np.isfinite(np.asarray(gx, np.float32)).all()
    for k, v in gw.items():
        assert np.isfinite(np.asarray(v, np.float32)).all(), k


def test_single_layer_and_no_cond():
    """L=1 edge (drain path) and the c=None / g_add=None branches."""
    x, c, g_add, w = make_inputs(jax.random.PRNGKey(5), L=1)
    w1 = {k: v[:1] if k != "wc" else v[:1] for k, v in w.items()}
    got = fused_glu_stack(
        x, None, None, w1["wconv"], w1["bconv"], None, w1["wout"], w1["bout"],
        w1["wskip"], w1["bskip"], (1,), True,
    )
    want = ref_stack(x, jnp.zeros_like(c), jnp.zeros_like(g_add)[:, :1], w1, (1,))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_wavenet_apply_fused_stack_parity():
    """Model-level: WaveNet.apply with fused_stack reproduces the plain
    path (f32), and the full train step runs with it."""
    from test_train import tiny_batch, tiny_cfg
    from wavenet_autoencoders_tpu.models import build_model
    from wavenet_autoencoders_tpu.train import init_state, make_train_step

    cfg = tiny_cfg()
    cfg_fused = tiny_cfg(fused_stack=True)
    model = build_model(cfg)
    model_fused = build_model(cfg_fused)
    params, _ = model.init(jax.random.PRNGKey(0))
    batch = tiny_batch(cfg)
    x = jnp.asarray(batch["x"])
    c = jnp.asarray(batch["c"][:, :, : cfg.dim_in])
    # encoder latent stands in for conditioning: use random (B,T',cin)
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 8, cfg.cin_channels))
    g = jnp.asarray(batch["g"])
    y0 = model.wavenet.apply(params["wavenet"], x, lat, g)
    y1 = model_fused.wavenet.apply(params["wavenet"], x, lat, g)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=5e-5, rtol=1e-4)

    state = init_state(cfg_fused, model_fused, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg_fused, model_fused, donate=False)
    state, m = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))

    # and gradient parity of the wavenet against the plain path
    def loss(params, model):
        y = model.wavenet.apply(params["wavenet"], x, lat, g, train=True)
        return jnp.mean(y.astype(jnp.float32) ** 2)

    g0 = jax.grad(loss)(params, model)
    g1 = jax.grad(loss)(params, model_fused)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(
        ("/".join(str(q) for q in p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(g1)
    )
    for p, v in flat0:
        key = "/".join(str(q) for q in p)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat1[key]), atol=1e-4, rtol=2e-3,
            err_msg=key,
        )
