import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_autoencoders_tpu.config import load_preset
from wavenet_autoencoders_tpu.models import build_model
from wavenet_autoencoders_tpu.train import init_state, make_train_step


def cfg_for(name, **over):
    cfg = load_preset("svqwae").replace(
        name=name, cin_channels=39, K=8, num_slices=4, encoder_hid=16,
        compute_dtype="float32", max_time_steps=1280,
    )
    return cfg.replace(**over)


@pytest.mark.parametrize("name,ds", [("model", 1), ("model2", 2), ("model4", 4)])
def test_mfcc_ae_shapes(name, ds):
    cfg = cfg_for(name)
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 39))
    z = model.encode(params, state, c)
    assert z.shape == (2, 16 // ds, 64)
    c_hat, aux, perp, _ = model.forward(params, state, jax.random.PRNGKey(2), None, c, None)
    assert c_hat.shape == c.shape


def test_cat_mfcc_ae():
    cfg = cfg_for("cat_ae", frame_rate=25)
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 39))
    z = model.encode(params, state, c)
    assert z.shape == (2, 4, 64)
    c_hat, aux, perp, _ = model.forward(params, state, jax.random.PRNGKey(2), None, c, None)
    assert c_hat.shape == c.shape and float(perp) > 0


def test_mfcc_ae_trains_with_mse():
    cfg = cfg_for("model2", batch_size=2)
    model = build_model(cfg)
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, model, donate=False)
    rng = np.random.default_rng(0)
    batch = {
        "x": rng.integers(0, 256, (2, 64)).astype(np.int32),
        "y": rng.integers(0, 256, (2, 64, 1)).astype(np.int32),
        "c": rng.standard_normal((2, 16, 39)).astype(np.float32),
        "lengths": np.full((2,), 64, np.int32),
    }
    losses = []
    for _ in range(20):
        state, m = step_fn(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m["recon_loss"]))
    assert losses[-1] < losses[0]
