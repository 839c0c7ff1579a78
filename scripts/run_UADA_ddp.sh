#!/bin/bash
# Data-parallel UADA over all local devices — replaces the reference's
# `torchrun --nproc_per_node=N UADA_wrapper3_ddp.py` (README.md:107-126);
# the mesh shards batches and XLA supplies the gradient all-reduce.
# Add `--ddp_semantics exact` for torch-DDP's exact average-of-rank-gradients
# sync (shard_map) instead of the default GSPMD global-mean formulation.
current_dir=$(pwd)
python -m roboticattack_tpu.cli.attack \
    --attack uada \
    --data_parallel true \
    --maskidx 0,1,2,3,4,5,6 \
    --lr 2e-3 \
    --server "$current_dir" \
    --iter 2000 \
    --bs 8 \
    --warmup 20 \
    --geometry true \
    --patch_size "3,50,50" \
    --MSE_weights 5 \
    --innerLoop 50 \
    --dataset "bridge_orig" \
    "$@"
