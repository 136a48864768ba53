"""wavenet_autoencoders_tpu — a TPU-native WaveNet-autoencoder framework.

A from-scratch JAX / XLA / Pallas re-design of the capability surface of
``MingjieChen/wavenet_autoencoders`` (ZeroSpeech 2020, arXiv:2008.06892):
unsupervised frame-level discrete speech representations with WaveNet
autoencoders (IN-WAE, SVQ-WAE and friends).

Layout (cf. reference layer map, /root/reference — SURVEY.md §1):

- ``config``   — typed config + JSON presets + "k=v" override grammar
                 (replaces hparams.py + tfcompat/hparam.py)
- ``dsp``      — host-side NumPy feature pipeline
                 (replaces librosa/nnmnkwii/scipy usage in audio.py)
- ``data``     — manifest, length-bucketed batching, hop-aligned cropping
                 (replaces the nnmnkwii dataset stack in vqwae_train.py)
- ``ops``      — pure-JAX NN ops: weight-normed convs, GLU blocks, mixture
                 losses/samplers, conditioning upsampler
                 (replaces wavenet_vocoder/{modules,conv,mixture,upsample}.py)
- ``models``   — WaveNet decoder, conv encoders, bottleneck family and the
                 autoencoder zoo (replaces vqvae_model.py,
                 vector_quantization.py and the gitignored autoencoders/)
- ``kernels``  — Pallas TPU kernels for the hot paths (AR decode step,
                 VQ nearest-neighbour search)
- ``parallel`` — mesh construction and shardings (replaces
                 torch.nn.parallel data-parallel workaround)
- ``train``    — jitted train step, LR schedules, EMA, checkpointing,
                 metrics (replaces vqwae_train.py internals)
- ``eval``     — ABX representation export + voice-conversion synthesis
                 (replaces inference_2019.py / synthesis.py)
- ``cli``      — entry points (replaces the docopt scripts + bin/*.sh)
"""

__version__ = "0.1.0"

from wavenet_autoencoders_tpu.config import Config, load_preset  # noqa: F401
