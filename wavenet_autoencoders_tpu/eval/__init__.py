from wavenet_autoencoders_tpu.eval.infer import export_representations  # noqa: F401
from wavenet_autoencoders_tpu.eval.synthesize import (  # noqa: F401
    batch_wavegen,
    run_synthesis_list,
    wavegen,
)
