from wavenet_autoencoders_tpu.models.wavenet import WaveNet, fold_weight_norm  # noqa: F401
from wavenet_autoencoders_tpu.models.encoder import Encoder, SpeakerEncoder  # noqa: F401
from wavenet_autoencoders_tpu.models.wae import (  # noqa: F401
    CatWAE,
    INWAE,
    NewINWAE,
    Vocoder,
    VQWAE,
    WVAE,
)
from wavenet_autoencoders_tpu.models.zoo import build_model, build_wavenet  # noqa: F401
