"""Host-side DSP feature pipeline (pure NumPy + scipy).

Self-provides every signal-processing capability the reference imports from
librosa / nnmnkwii.preprocessing / scipy (SURVEY.md §2.7):

- mu-law companding + quantization         (``mulaw``)
- pre-emphasis and its inverse             (``mulaw``)
- STFT, Slaney mel filterbank, DCT-II      (``stft``)
- espnet-style log-mel + MFCC(13)+Δ+ΔΔ     (``features``)
- FIR high-pass, silence trim, wav I/O     (``filters``)
- streaming CMVN statistics                (``cmvn``)

These run on the host as part of preprocessing (embarrassingly parallel per
utterance, reference ``preprocess_2019.py``); the model compute path is JAX.
"""
from wavenet_autoencoders_tpu.dsp.mulaw import (  # noqa: F401
    mulaw,
    inv_mulaw,
    mulaw_quantize,
    inv_mulaw_quantize,
    preemphasis,
    inv_preemphasis,
)
from wavenet_autoencoders_tpu.dsp.stft import (  # noqa: F401
    stft,
    hann_window,
    mel_filterbank,
    dct_matrix,
)
from wavenet_autoencoders_tpu.dsp.features import (  # noqa: F401
    logmelspectrogram,
    mfcc,
    delta,
)
from wavenet_autoencoders_tpu.dsp.filters import (  # noqa: F401
    low_cut_filter,
    trim_silence_db,
    start_and_end_indices,
    trim_quantized,
    load_wav,
    save_wav,
    adjust_time_resolution,
)
from wavenet_autoencoders_tpu.dsp.cmvn import CMVN  # noqa: F401
