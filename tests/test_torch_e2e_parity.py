"""End-to-end torch-checkpoint parity: build the ACTUAL reference modules
(`/root/reference/wavenet_vocoder/wavenet.py:63-216`,
`/root/reference/vqvae_model.py:52-84`) in-process, random-init them, export
``state_dict()``, convert with ``utils.torch_import``, and assert the JAX
model reproduces teacher-forced logits / ``encode()`` outputs on shared
inputs. This is the BASELINE.json "checkpoint parity" north star: it fails
if any layout / weight-norm / padding / upsampler detail drifts.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from wavenet_autoencoders_tpu.config import load_preset  # noqa: E402
from wavenet_autoencoders_tpu.models import build_model  # noqa: E402
from wavenet_autoencoders_tpu.utils import torch_import as ti  # noqa: E402

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

ref = pytest.importorskip(
    "wavenet_vocoder", reason="reference snapshot not mounted"
)


def _build_ref_wavenet(
    *,
    out_channels=256,
    gate_channels=256,
    cin_channels=64,
    cin_pad=0,
    upsample_scales=(4, 4, 8, 5),
    scalar_input=False,
    gin_channels=32,
    n_speakers=153,
):
    """Reference WaveNet exactly as ``vqwae_train.py:926-944`` builds it."""
    from wavenet_vocoder import WaveNet as TorchWaveNet

    up = {
        "upsample_scales": list(upsample_scales),
        "cin_channels": cin_channels,
        "cin_pad": cin_pad,
    }
    return TorchWaveNet(
        out_channels=out_channels,
        layers=20,
        stacks=2,
        residual_channels=256,
        gate_channels=gate_channels,
        skip_out_channels=256,
        cin_channels=cin_channels,
        gin_channels=gin_channels,
        n_speakers=n_speakers,
        dropout=0.0,
        kernel_size=3,
        upsample_conditional_features=True,
        upsample_net="ConvInUpsampleNetwork",
        upsample_params=up,
        scalar_input=scalar_input,
        use_speaker_embedding=True,
        output_distribution="Logistic",
        cin_pad=cin_pad,
    )


def _state_dict_np(m):
    return {k: v.detach().cpu().numpy() for k, v in m.state_dict().items()}


def _onehot_codes(rng, B, T, C=256):
    codes = rng.randint(0, C, size=(B, T))
    x = np.zeros((B, C, T), np.float32)
    np.put_along_axis(x, codes[:, None, :], 1.0, axis=1)
    return x


def test_vqvae_checkpoint_parity_e2e():
    """Committed VQVAE (hps/vqwae.json config): random torch init →
    state_dict → import → identical teacher-forced logits, vq loss,
    perplexity, and encode() output."""
    import vqvae_model

    torch.manual_seed(42)
    twn = _build_ref_wavenet()
    tm = vqvae_model.VQVAE(c_in=39, hid=64, K=256, wavenet=twn, encoder_hid=256)
    tm.eval()

    B, Tf = 2, 8  # 8 MFCC frames -> 2 latent frames -> 1280 samples
    T = Tf // 4 * 640
    rng = np.random.RandomState(0)
    x_np = _onehot_codes(rng, B, T)
    c_np = rng.randn(B, 39, Tf).astype(np.float32)
    g_np = rng.randint(0, 153, size=(B,))
    with torch.no_grad():
        y_t, vq_t, perp_t = tm(
            torch.from_numpy(x_np),
            torch.from_numpy(c_np),
            torch.from_numpy(g_np)[:, None],
        )
        enc_t = tm.encode(torch.from_numpy(c_np))

    cfg = load_preset("vqwae")
    model = build_model(cfg)
    params0, state = model.init(jax.random.PRNGKey(0))
    params = ti.import_vqvae(_state_dict_np(tm), n_layers=20)
    # the imported tree must be exactly the shape model.init produces
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params0
    )

    y_j, vq_j, perp_j, _ = model.forward(
        params,
        state,
        None,
        jnp.asarray(np.transpose(x_np, (0, 2, 1))),
        jnp.asarray(np.transpose(c_np, (0, 2, 1))),
        jnp.asarray(g_np),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(y_j),
        np.transpose(y_t.numpy(), (0, 2, 1)),
        atol=1e-4,
    )
    np.testing.assert_allclose(float(vq_j), float(vq_t), rtol=1e-5)
    np.testing.assert_allclose(float(perp_j), float(perp_t), rtol=1e-5)

    enc_j = model.encode(params, state, jnp.asarray(np.transpose(c_np, (0, 2, 1))))
    np.testing.assert_allclose(
        np.asarray(enc_j), np.transpose(enc_t.numpy(), (0, 2, 1)), atol=1e-5
    )


def test_vocoder_cinpad_checkpoint_parity_e2e():
    """Plain wavenet_vocoder with cin_pad=2 (the hparams.py:70 default) and
    gate_channels=368 (hps/hp.json): exercises the ConvInUpsampleNetwork
    context conv + indent trim and the non-square gate width."""
    torch.manual_seed(7)
    cin_pad = 2
    scales = (2, 4, 4, 5)  # hps/hp.json upsample_scales, prod=160
    twn = _build_ref_wavenet(
        gate_channels=368,
        cin_channels=39,
        cin_pad=cin_pad,
        upsample_scales=scales,
    )
    twn.eval()

    B, Tf = 2, 6  # frames WITHOUT pad; c carries Tf + 2*cin_pad frames
    T = Tf * int(np.prod(scales))
    rng = np.random.RandomState(1)
    x_np = _onehot_codes(rng, B, T)
    c_np = rng.randn(B, 39, Tf + 2 * cin_pad).astype(np.float32)
    g_np = rng.randint(0, 153, size=(B,))
    with torch.no_grad():
        y_t = twn(
            torch.from_numpy(x_np),
            torch.from_numpy(c_np),
            torch.from_numpy(g_np)[:, None],
        )

    cfg = load_preset("vocoder").parse(
        f'cin_pad={cin_pad},upsample_params={{"upsample_scales":[2,4,4,5]}}'
    )
    assert cfg.cin_pad == cin_pad and tuple(cfg.upsample_scales) == scales
    model = build_model(cfg)
    params0, state = model.init(jax.random.PRNGKey(0))
    sd = _state_dict_np(twn)
    params = {"wavenet": ti.import_wavenet(sd, 20, prefix="")}
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params0
    )

    y_j, _, _, _ = model.forward(
        params,
        state,
        None,
        jnp.asarray(np.transpose(x_np, (0, 2, 1))),
        jnp.asarray(np.transpose(c_np, (0, 2, 1))),
        jnp.asarray(g_np),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(y_j), np.transpose(y_t.numpy(), (0, 2, 1)), atol=1e-4
    )


def test_scalar_mol_checkpoint_parity_e2e():
    """Scalar-input MoL head (output_distribution=Logistic on raw audio):
    the reference's non-mulaw presets. Covers the 10-channel MoL parameter
    head and scalar first-conv layout."""
    torch.manual_seed(11)
    twn = _build_ref_wavenet(out_channels=30, cin_channels=39, scalar_input=True)
    twn.eval()

    B, Tf = 2, 4
    T = Tf * 640  # no encoder in front: c feeds the upsampler directly
    rng = np.random.RandomState(2)
    x_np = rng.uniform(-1, 1, size=(B, 1, T)).astype(np.float32)
    c_np = rng.randn(B, 39, Tf).astype(np.float32)
    g_np = rng.randint(0, 153, size=(B,))
    with torch.no_grad():
        y_t = twn(
            torch.from_numpy(x_np),
            torch.from_numpy(c_np),
            torch.from_numpy(g_np)[:, None],
        )

    cfg = load_preset("vqwae").parse(
        "name=wavenet_vocoder,input_type=raw,out_channels=30,cin_channels=39"
    )
    model = build_model(cfg)
    params0, state = model.init(jax.random.PRNGKey(0))
    params = {"wavenet": ti.import_wavenet(_state_dict_np(twn), 20, prefix="")}
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params0
    )

    # encoder side is not part of this model; condition on the same pre-VQ
    # features by feeding c through the wavenet's own upsampler
    y_j, _, _, _ = model.forward(
        params,
        state,
        None,
        jnp.asarray(np.transpose(x_np, (0, 2, 1))),
        jnp.asarray(np.transpose(c_np, (0, 2, 1))),
        jnp.asarray(g_np),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(y_j), np.transpose(y_t.numpy(), (0, 2, 1)), atol=1e-4
    )
