#!/bin/bash
# TMA (targeted manipulation) patch attack — TPU-native launcher
# (reference scripts/run_TMA.sh flag surface; --checkpoint points at a local
# HF OpenVLA checkpoint dir; omit for random-weight smoke runs)
current_dir=$(pwd)
python -m roboticattack_tpu.cli.attack \
    --attack tma \
    --maskidx 0 \
    --lr 2e-3 \
    --server "$current_dir" \
    --iter 2000 \
    --accumulate 1 \
    --bs 8 \
    --warmup 20 \
    --tags tpu tma \
    --filterGripTrainTo1 false \
    --geometry true \
    --patch_size "3,50,50" \
    --wandb_project "false" \
    --innerLoop 50 \
    --dataset "libero_spatial" \
    --targetAction 0 \
    "$@"
