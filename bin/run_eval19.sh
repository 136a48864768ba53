#!/bin/bash
# ZeroSpeech 2019 evaluation (reference bin/run_valid.sh + run_eval19.sh).
# The evaluator itself is the external bootphon/zerospeech2020 toolkit —
# out of scope to reimplement (SURVEY.md §2.7); this framework produces its
# exact input formats (ABX txt from bin/run_infer19.sh, wavs from
# bin/run_syn.sh).
set -e
SUBMISSION=${1:?submission dir}
OUT=${2:-res}
# structural/format pre-check (works offline)
python -m wavenet_autoencoders_tpu.cli.main validate "$SUBMISSION"
command -v zerospeech2020-validate >/dev/null || {
  echo "zerospeech2020 toolkit not installed (external dependency)"; exit 1; }
zerospeech2020-validate "$SUBMISSION"
mkdir -p "$OUT"
zerospeech2020-evaluate 2019 -j10 "$SUBMISSION" -o "$OUT/eval.json"
