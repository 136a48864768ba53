"""bf16-storage decode: teacher-forced logits close to f32 reference."""
import jax
import jax.numpy as jnp
import numpy as np

from wavenet_autoencoders_tpu.kernels.decode import (
    pack_decode_weights,
    precompute_g_add,
    wavenet_decode_pallas,
)
from test_decode_kernel import tiny_net


def test_bf16_storage_close_to_f32():
    net = tiny_net()
    params = net.init(jax.random.PRNGKey(0))
    B, T = 2, 12
    x_ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, 256)
    c = jax.random.normal(jax.random.PRNGKey(2), (B, T, 5))
    g = jnp.array([1, 3])
    y_ref = net.apply(params, jax.nn.one_hot(x_ids, 256), c, g, upsampled=True)

    packed = pack_decode_weights(net, params)
    g_add = precompute_g_add(net, params, g)
    _codes, logits = wavenet_decode_pallas(
        net, packed, T, seed=0, c_up=c, g_add=g_add, teach=x_ids,
        teacher=True, interpret=True, dtype_str="bfloat16",
    )
    # bf16 storage: expect small relative deviation on logits
    err = np.abs(np.asarray(logits) - np.asarray(y_ref))
    assert err.max() < 0.15, err.max()
    assert np.median(err) < 0.02
