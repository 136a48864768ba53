#!/bin/bash
# resume training from the rolling latest checkpoint (bin/vqwae_resume.sh parity)
set -e
PRESET=${1:?preset}
DUMP=${2:?dump root}
CKPT=${3:?checkpoint dir}
python -m wavenet_autoencoders_tpu.cli.main train --preset "$CKPT/config.json" \
    "$DUMP" "$CKPT" --checkpoint "$CKPT/checkpoint_latest.npz"
