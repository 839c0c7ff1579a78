#!/bin/bash
# Single-suite LIBERO eval (experiments/robot/libero/eval_LIBERO.sh equivalent)
python -m roboticattack_tpu.cli.eval_libero \
    --task_suite_name libero_spatial \
    --num_trials_per_task 50 \
    --x 120 --y 160 \
    "$@"
