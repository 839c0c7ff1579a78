#!/bin/bash
# UADA (untargeted action discrepancy) patch attack — TPU-native launcher
current_dir=$(pwd)
python -m roboticattack_tpu.cli.attack \
    --attack uada \
    --maskidx 0,1,2,3,4,5,6 \
    --lr 2e-3 \
    --server "$current_dir" \
    --iter 2000 \
    --accumulate 1 \
    --bs 8 \
    --warmup 20 \
    --geometry true \
    --patch_size "3,50,50" \
    --wandb_project "false" \
    --innerLoop 50 \
    --dataset "bridge_orig" \
    "$@"
