#!/bin/bash
# UPA (untargeted position-aware) patch attack — TPU-native launcher
current_dir=$(pwd)
python -m roboticattack_tpu.cli.attack \
    --attack upa \
    --maskidx 0,1,2 \
    --lr 2e-3 \
    --server "$current_dir" \
    --iter 2000 \
    --bs 8 \
    --warmup 20 \
    --geometry true \
    --patch_size "3,50,50" \
    --alpha 0.8 \
    --belta 0.2 \
    --reverse_direction true \
    --innerLoop 50 \
    --dataset "bridge_orig" \
    "$@"
