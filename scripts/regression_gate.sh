#!/usr/bin/env bash
# CI-of-record quality gate (VERDICT r4 next-round item 8): one command that
# machine-checks both quality regressions each round —
#
#  1. the walk40k sample-quality gate (SiFID / RMSE / diversity thresholds
#     via `cli.evaluate --check`, the upgraded form of the reference's only
#     real gate, test_motion_fid.py:106-124), and
#  2. the class-conditional CFG accuracy gate (`cli.cfg_eval
#     --check-accuracy`), which the reference could not express at all
#     (its transformer ignores y; its CFG sweep was eyeballed).
#
# Runs on whatever backend the environment provides (the TPU chip by
# default; serialize with other TPU jobs). Exit 0 == all gates PASS; the
# output is committed to the run log / BASELINE each round.
#
#   WALK_RUN=experiments/walk40k_r5 CFG_RUN=experiments/allclips12k_r5 \
#       bash scripts/regression_gate.sh
set -uo pipefail
cd "$(dirname "$0")/.."

WALK_RUN="${WALK_RUN:-experiments/walk40k_r4}"
CFG_RUN="${CFG_RUN:-experiments/allclips12k_r5}"
CFG_SCALE_MIN="${CFG_SCALE_MIN:-3.0:0.8}"
fail=0

echo "== gate 1: walk sample quality ($WALK_RUN) =="
python -m deepmimic_diffusion_mujoco_tpu.cli.evaluate \
    --run "$WALK_RUN" --gt data/motions/humanoid3d_walk.txt \
    --num 16 --reps 2 --rmse --ema \
    --check "sifid.mean<=0.8" \
    --check "rmse.min<=0.8" \
    --check "intra_diversity_gt_diff.mean<=6" \
    || fail=1

echo "== gate 2: CFG class accuracy ($CFG_RUN, gate $CFG_SCALE_MIN) =="
python -m deepmimic_diffusion_mujoco_tpu.cli.cfg_eval \
    --run "$CFG_RUN" --scales "${CFG_SCALE_MIN%%:*}" --num 8 \
    --check-accuracy "$CFG_SCALE_MIN" \
    --out "$CFG_RUN/cfg_gate.json" \
    || fail=1

if [ "$fail" -ne 0 ]; then
    echo "REGRESSION GATE: FAIL"
    exit 1
fi
echo "REGRESSION GATE: PASS"
