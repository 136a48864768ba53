from wavenet_autoencoders_tpu.data.manifest import (  # noqa: F401
    Manifest,
    Utterance,
    write_manifest,
)
from wavenet_autoencoders_tpu.data.dataset import (  # noqa: F401
    WaveDataset,
    LengthBucketSampler,
    Collator,
    data_iterator,
)
