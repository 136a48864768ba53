#!/bin/bash
# train a model (reference bin/vqwae_train.sh / run_inae_train.sh parity)
# usage: bin/train.sh <preset> <dump_root> <ckpt_dir> [extra hparams]
set -e
PRESET=${1:?preset}
DUMP=${2:?dump root}
CKPT=${3:?checkpoint dir}
HP=${4:-}
python -m wavenet_autoencoders_tpu.cli.main train --preset $PRESET \
    ${HP:+--hparams "$HP"} "$DUMP" "$CKPT" --dev-dump-root "${DUMP%/*}/dev"
