from wavenet_autoencoders_tpu.train.step import (  # noqa: F401
    TrainState,
    init_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from wavenet_autoencoders_tpu.train.schedule import get_schedule  # noqa: F401
from wavenet_autoencoders_tpu.train.checkpoint import (  # noqa: F401
    freeze_config,
    load_checkpoint,
    restore_parts,
    save_checkpoint,
)
from wavenet_autoencoders_tpu.train.metrics import MetricsWriter  # noqa: F401
from wavenet_autoencoders_tpu.train.loop import train  # noqa: F401
