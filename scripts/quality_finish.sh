#!/bin/bash
# Post-training quality evaluation runbook — run AFTER the trainer exits
# (quality/TRAIN_DONE exists or the process is gone). Produces everything
# QUALITY.md cites, on the real chip:
#   1. curves + reconstruction MCD/mel-L1 (+ wavs) from the EMA checkpoint
#   2. ABX txt export + bitrate.json (full submission representations)
#   3. ABX-proxy scores (latents vs MFCC baseline)
#   4. voice-conversion synthesis for the test list
#   5. offline submission validation
# Env: QF_EXP (exp dir under quality/, default exp/svqwae_jitter),
#      QF_UTTS / QF_FRAMES (reconstruction sample sizes).
set -ex
cd /root/repo
Q=${QF_ROOT:-/root/repo/quality}
EXPNAME=${QF_EXP:-exp/svqwae_jitter}
EXP=$Q/$EXPNAME
UTTS=${QF_UTTS:-6}
FRAMES=${QF_FRAMES:-400}

timeout 2400 python scripts/quality_eval.py $EXP $Q $UTTS $FRAMES 2>&1 | tail -40

# checkpoint_latest (not the _ema sibling): the CLI's use_ema="auto"
# picks EMA only once the shadow is warm (step >= 5/(1-decay)) — passing
# the _ema file outright re-creates the round-4 stale-shadow bug
timeout 1200 env QI_ROOT=$Q python scripts/run_quality_infer.py $EXPNAME/checkpoint_latest.npz abx_final 2>&1 | tail -4
timeout 900 python scripts/abx_proxy.py $Q/abx_final/2019/english/test $Q/raw/test_phone_labels.json $Q/dump/2019/english/test 2>&1 | tail -4

cd $Q
timeout 2400 python - <<EOF
import os, sys
sys.path.insert(0, "/root/repo")
os.chdir("$Q")
from wavenet_autoencoders_tpu.cli.main import main
main([
    "synthesize", "--preset", "$EXPNAME/config.json",
    "$EXPNAME/checkpoint_latest.npz",   # use_ema="auto" picks the warm shadow only
    "dump/2019/english/test", "syn_out", "raw/synthesis.txt",
    "scp/2019/2019_speaker2ind_english.json", "english",
    "--train-dump-root", "dump/2019/english/train_no_dev",
    "--batch", "16",
])
EOF
# merge the ABX txts + VC wavs into one submission tree and validate
mkdir -p submission/2019/english/test
cp abx_final/2019/english/test/*.txt submission/2019/english/test/
cp syn_out/2019/english/test/*.wav submission/2019/english/test/ || true
cd /root/repo
python -m wavenet_autoencoders_tpu.cli.main validate $Q/submission
echo QUALITY-FINISH-OK
