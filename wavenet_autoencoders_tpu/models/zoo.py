"""Model-zoo builders: Config -> model instance.

Replaces the per-model ``build_*_model`` functions dispatched on
``hparams.name`` (``inference_2019.py:40-226,303-312``,
``synthesis.py:46-234,452-463``, ``vqwae_train.py:913-947``).
"""
from __future__ import annotations

from wavenet_autoencoders_tpu.config import Config
from wavenet_autoencoders_tpu.models.wae import (
    CatWAE,
    INWAE,
    NewINWAE,
    Vocoder,
    VQWAE,
    WVAE,
)
from wavenet_autoencoders_tpu.models.wavenet import WaveNet


def build_wavenet(cfg: Config, gin_channels=None, use_speaker_embedding=True) -> WaveNet:
    """The shared decoder ctor every builder uses (e.g.
    ``synthesis.py:59-77``)."""
    if cfg.is_mulaw_quantize and cfg.out_channels != cfg.quantize_channels:
        raise ValueError(
            "out_channels must equal quantize_channels for mulaw-quantize input"
        )
    return WaveNet(
        out_channels=cfg.out_channels,
        layers=cfg.layers,
        stacks=cfg.stacks,
        residual_channels=cfg.residual_channels,
        gate_channels=cfg.gate_channels,
        skip_out_channels=cfg.skip_out_channels,
        kernel_size=cfg.kernel_size,
        dropout=cfg.dropout,
        cin_channels=cfg.cin_channels,
        gin_channels=cfg.gin_channels if gin_channels is None else gin_channels,
        n_speakers=cfg.n_speakers,
        upsample_conditional_features=cfg.upsample_conditional_features,
        upsample_net=cfg.upsample_net,
        upsample_scales=tuple(cfg.upsample_scales),
        freq_axis_kernel_size=int(cfg.upsample_params.get("freq_axis_kernel_size", 1)),
        cin_pad=cfg.cin_pad,
        scalar_input=cfg.is_scalar_input,
        use_speaker_embedding=use_speaker_embedding,
        output_distribution=cfg.output_distribution,
        fused_stack=cfg.fused_stack,
    )


def build_model(cfg: Config):
    """Dispatch on cfg.name, mirroring the reference's model registry:
    wvae | vqvae | inae | inae1 | new_inae | catae | wavenet_vocoder."""
    name = cfg.name.lower()

    if name == "wavenet_vocoder":
        return Vocoder(wavenet=build_wavenet(cfg))

    if name == "wvae" or name == "ae":
        # AE(wavenet, c_in=39, hid=64, frame_rate) — synthesis.py:233
        return WVAE(
            wavenet=build_wavenet(cfg),
            c_in=cfg.dim_in,
            hid=cfg.cin_channels,
            frame_rate=cfg.frame_rate,
            encoder_hid=cfg.encoder_hid,
        )

    if name == "vqvae":
        # superset ctor — synthesis.py:196-199; post_conv selects hid=64
        # (synthesis.py:190-193)
        hid = 64 if cfg.post_conv else cfg.cin_channels
        K1 = cfg.K1 if (cfg.use_K1 and cfg.K1 not in (None, cfg.K)) else None
        return VQWAE(
            wavenet=build_wavenet(cfg),
            c_in=cfg.dim_in,
            hid=hid,
            frame_rate=cfg.frame_rate,
            encoder_hid=cfg.encoder_hid,
            K=cfg.K,
            K1=K1,
            num_slices=cfg.num_slices,
            beta=cfg.beta,
            commit_scale=cfg.vq_commit_scale,
            ema=cfg.ema,
            sliced=cfg.sliced,
            ins_norm=cfg.ins_norm,
            post_conv=cfg.post_conv,
            adain=cfg.adain,
            use_time_jitter=cfg.time_jitter,
            time_jitter_prob=cfg.time_jitter_prob,
            time_jitter_per_side=cfg.time_jitter_per_side,
            vq_drop=cfg.vq_drop,
            drop_dim=cfg.drop_dim,
            reseed=cfg.vq_reseed,
            reseed_thresh=cfg.vq_reseed_thresh,
            reseed_decay=cfg.vq_reseed_decay,
            reseed_start=cfg.vq_reseed_start,
        )

    if name in ("inae", "inae1"):
        # INAE(wavenet, c_in=39, hid=64, frame_rate, adain) — synthesis.py:147-149
        return INWAE(
            wavenet=build_wavenet(cfg),
            c_in=cfg.dim_in,
            hid=cfg.cin_channels,
            frame_rate=cfg.frame_rate,
            encoder_hid=cfg.encoder_hid,
            adain=cfg.adain,
            per_block_in=(name == "inae1"),
        )

    if name == "new_inae":
        # gin=64 continuous speaker code, no id embedding — synthesis.py:93-113
        return NewINWAE(
            wavenet=build_wavenet(cfg, gin_channels=64, use_speaker_embedding=False),
            c_in=cfg.dim_in,
            hid=cfg.cin_channels,
            frame_rate=cfg.frame_rate,
            encoder_hid=cfg.encoder_hid,
        )

    if name == "catae":
        # CatWavAE(tau=0.1, k=K, hard, slices=num_slices) — synthesis.py:78
        return CatWAE(
            wavenet=build_wavenet(cfg),
            c_in=cfg.dim_in,
            hid=cfg.cin_channels,
            frame_rate=cfg.frame_rate,
            encoder_hid=cfg.encoder_hid,
            k=cfg.K,
            tau=cfg.tau,
            hard=cfg.hard,
            slices=cfg.num_slices,
        )

    # MFCC-only feature-space AEs (build_autoencoder_model,
    # inference_2019.py:157-159): Model/Model2/Model4/CatAE with
    # ctor (c_in=cfg.cin_channels, hid=64)
    from wavenet_autoencoders_tpu.models.mfcc_ae import CatMfccAE, MfccAE

    feat_ae = {"model": 1, "ae_feat": 1, "model2": 2, "ae2": 2, "model4": 4, "ae4": 4}
    if name in feat_ae:
        return MfccAE(c_in=cfg.cin_channels, hid=64, downsample=feat_ae[name])
    if name in ("catae_feat", "cat_ae"):
        return CatMfccAE(
            c_in=cfg.cin_channels,
            hid=64,
            downsample=100 // cfg.frame_rate,
            k=cfg.K,
            tau=cfg.tau,
            hard=cfg.hard,
            slices=cfg.num_slices,
        )

    raise ValueError(f"unknown model name: {cfg.name}")
