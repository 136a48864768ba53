"""Torch-checkpoint importer: layout + weight-norm numerics verified
against torch primitives (F.conv1d / weight_norm math), and tree-structure
compatibility with model.init."""
import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from wavenet_autoencoders_tpu.config import load_preset  # noqa: E402
from wavenet_autoencoders_tpu.models import build_model  # noqa: E402
from wavenet_autoencoders_tpu.ops.conv import (  # noqa: E402
    causal_conv1d_apply,
    conv1d_apply,
)
from wavenet_autoencoders_tpu.utils import torch_import as ti  # noqa: E402


def test_conv_layout_matches_torch():
    torch.manual_seed(0)
    Cout, Cin, K, d, T = 6, 4, 3, 4, 32
    w = torch.randn(Cout, Cin, K)
    b = torch.randn(Cout)
    x = torch.randn(1, Cin, T)
    # reference-style causal conv: symmetric pad (k-1)*d then truncate
    y_t = F.conv1d(x, w, b, padding=(K - 1) * d, dilation=d)[:, :, :T]

    p = {"w": ti._conv_w(w.numpy()), "b": b.numpy()}
    y_j = causal_conv1d_apply(p, np.transpose(x.numpy(), (0, 2, 1)), dilation=d)
    np.testing.assert_allclose(
        np.asarray(y_j), np.transpose(y_t.numpy(), (0, 2, 1)), atol=1e-5
    )


def test_weight_norm_fold_matches_torch():
    torch.manual_seed(1)
    conv = torch.nn.Conv1d(4, 6, 3, bias=True, padding=1)
    conv = torch.nn.utils.weight_norm(conv)
    sd = {k: v.detach().numpy() for k, v in conv.state_dict().items()}
    p = ti._wn_conv({"c.weight_g": sd["weight_g"], "c.weight_v": sd["weight_v"], "c.bias": sd["bias"]}, "c")

    x = torch.randn(2, 4, 16)
    y_t = conv(x)
    y_j = conv1d_apply(p, np.transpose(x.numpy(), (0, 2, 1)), padding=[(1, 1)])
    np.testing.assert_allclose(
        np.asarray(y_j), np.transpose(y_t.detach().numpy(), (0, 2, 1)), atol=1e-5
    )


def test_linear_layout_matches_torch():
    torch.manual_seed(2)
    lin = torch.nn.Linear(8, 3)
    x = torch.randn(5, 8)
    y_t = lin(x).detach().numpy()
    from wavenet_autoencoders_tpu.ops.conv import linear_apply

    p = {"w": ti._lin_w(lin.weight.detach().numpy()), "b": lin.bias.detach().numpy()}
    y_j = linear_apply(p, x.numpy())
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=1e-5)


def _fake_state_dict(cfg):
    """Synthetic reference-named state_dict with the right shapes for the
    committed VQVAE composition (encoder 10 blocks + plain VQ + wavenet)."""
    rng = np.random.default_rng(0)
    sd = {}

    def conv(prefix, cout, cin, k, wn=True, bias=True):
        if wn:
            v = rng.standard_normal((cout, cin, k)).astype(np.float32)
            sd[prefix + ".weight_g"] = np.linalg.norm(
                v.reshape(cout, -1), axis=1
            ).reshape(cout, 1, 1).astype(np.float32)
            sd[prefix + ".weight_v"] = v
        else:
            sd[prefix + ".weight"] = rng.standard_normal((cout, cin, k)).astype(np.float32)
        if bias:
            sd[prefix + ".bias"] = rng.standard_normal(cout).astype(np.float32)

    eh = cfg.encoder_hid
    specs = [(3, cfg.dim_in), (3, eh), (5, eh), (5, eh), (3, eh), (3, eh)] + [(1, eh)] * 4
    for i, (k, cin) in enumerate(specs):
        conv(f"encoder.net.{i}.conv", eh, cin, k, wn=False)
    sd["encoder.lin.weight"] = rng.standard_normal((cfg.cin_channels, eh)).astype(np.float32)
    sd["encoder.lin.bias"] = rng.standard_normal(cfg.cin_channels).astype(np.float32)
    sd["vq.embedding.weight"] = rng.standard_normal((cfg.K, cfg.cin_channels)).astype(np.float32)

    rc, gc, sc = cfg.residual_channels, cfg.gate_channels, cfg.skip_out_channels
    conv("wavenet.first_conv", rc, cfg.quantize_channels, 1)
    for i in range(cfg.layers):
        conv(f"wavenet.conv_layers.{i}.conv", gc, rc, cfg.kernel_size)
        conv(f"wavenet.conv_layers.{i}.conv1x1c", gc, cfg.cin_channels, 1, bias=False)
        conv(f"wavenet.conv_layers.{i}.conv1x1g", gc, cfg.gin_channels, 1, bias=False)
        conv(f"wavenet.conv_layers.{i}.conv1x1_out", rc, gc // 2, 1)
        conv(f"wavenet.conv_layers.{i}.conv1x1_skip", sc, gc // 2, 1)
    conv("wavenet.last_conv_layers.1", sc, sc, 1)
    conv("wavenet.last_conv_layers.3", cfg.out_channels, sc, 1)
    sd["wavenet.embed_speakers.weight"] = rng.standard_normal(
        (cfg.n_speakers, cfg.gin_channels)
    ).astype(np.float32)
    conv("wavenet.upsample_net.conv_in", cfg.cin_channels, cfg.cin_channels,
         2 * cfg.cin_pad + 1, wn=False, bias=False)
    for j, s in enumerate(cfg.upsample_scales):
        v = np.full((1, 1, 1, 2 * s + 1), 1.0 / (2 * s + 1), np.float32)
        sd[f"wavenet.upsample_net.upsample.up_layers.{2*j+1}.weight_g"] = np.array(
            [[[[np.linalg.norm(v)]]]], np.float32
        )
        sd[f"wavenet.upsample_net.upsample.up_layers.{2*j+1}.weight_v"] = v
    return sd


def test_import_vqvae_tree_matches_init():
    cfg = load_preset(
        "vqwae",
        "layers=4,stacks=2,residual_channels=8,gate_channels=12,skip_out_channels=8,"
        "encoder_hid=16,cin_channels=8,gin_channels=4,n_speakers=5,K=8,"
        "out_channels=16,quantize_channels=16",
    ).replace(upsample_params={"upsample_scales": [2, 2]})
    model = build_model(cfg)
    params, _ = model.init(jax.random.PRNGKey(0))

    sd = _fake_state_dict(cfg)
    imported = ti.import_vqvae(sd, n_layers=cfg.layers)

    # identical tree structure and shapes
    ref_flat = jax.tree_util.tree_flatten_with_path(params)[0]
    imp_flat = jax.tree_util.tree_flatten_with_path(imported)[0]
    ref_paths = {jax.tree_util.keystr(p): np.shape(l) for p, l in ref_flat}
    imp_paths = {jax.tree_util.keystr(p): np.shape(l) for p, l in imp_flat}
    assert ref_paths == imp_paths

    # and the imported params run
    x = jax.nn.one_hot(np.zeros((1, 16), np.int32), cfg.quantize_channels)
    c = np.random.default_rng(1).standard_normal((1, 16, 39)).astype(np.float32)
    g = np.array([0], np.int32)
    y, *_ = model.forward(imported, {}, jax.random.PRNGKey(1), x, c, g, train=False)
    assert np.isfinite(np.asarray(y)).all()
