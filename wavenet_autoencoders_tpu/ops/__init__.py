"""Pure-JAX NN ops — the TPU-native core NN library.

Replaces ``wavenet_vocoder/{conv,modules,mixture,upsample,util}.py``. All ops
are functional: ``init(key, ...) -> params`` / ``apply(params, x, ...) -> y``
pairs over plain pytrees, so they compose directly with jit / grad / pjit.

Layout convention: activations are channels-last ``(B, T, C)`` — the C axis
maps to TPU lanes and feeds the MXU as the contraction dim of every matmul,
unlike the reference's (B, C, T). Channel-first only appears at API edges
that mirror reference outputs (e.g. ``encode()`` exports).
"""
from wavenet_autoencoders_tpu.ops.conv import (  # noqa: F401
    conv1d_init,
    conv1d_apply,
    conv1d_weight,
    causal_conv1d_apply,
    plain_conv1d_init,
    linear_init,
    linear_apply,
)
from wavenet_autoencoders_tpu.ops.modules import (  # noqa: F401
    embedding_init,
    embedding_apply,
    residual_glu_init,
    residual_glu_apply,
    residual_glu_step,
)
from wavenet_autoencoders_tpu.ops.mixture import (  # noqa: F401
    log_sum_exp,
    discretized_mix_logistic_loss,
    sample_from_discretized_mix_logistic,
    mix_gaussian_loss,
    sample_from_mix_gaussian,
)
from wavenet_autoencoders_tpu.ops.losses import (  # noqa: F401
    sequence_mask,
    masked_cross_entropy,
    masked_mol_loss,
    masked_mog_loss,
)
from wavenet_autoencoders_tpu.ops.upsample import (  # noqa: F401
    upsample_network_init,
    upsample_network_apply,
    conv_in_upsample_init,
    conv_in_upsample_apply,
)
