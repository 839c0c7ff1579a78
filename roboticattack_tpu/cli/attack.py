"""Attack CLI: the reference wrapper flag surface over the TPU runner.

One entry point covers TMA_wrapper.py / UADA_wrapper.py / UPA_wrapper.py /
UADA_wrapper_ddp.py (the `--attack` flag replaces the four files; DDP is just
`--data_parallel` — same runner, batch sharded over the mesh).

Examples:
  python -m roboticattack_tpu.cli.attack --attack tma --maskidx 6 \
      --dataset bridge_orig --checkpoint /path/to/openvla-7b --iter 2000
  python -m roboticattack_tpu.cli.attack --attack uada --maskidx 0,1,2,3,4,5,6 \
      --model vla-tiny --dataset dummy --iter 20 --innerLoop 2 --bs 2
"""

from __future__ import annotations

import argparse
import os
import uuid

import numpy as np


def list_of_ints(arg: str):
    return list(map(int, arg.split(",")))


def str2bool(value):
    if isinstance(value, bool):
        return value
    if value.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if value.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native OpenVLA adversarial patch attacks")
    p.add_argument("--attack", default="tma",
                   choices=["tma", "uada", "upa", "upa_guide", "upa_negce"])
    # --- reference flag surface (TMA_wrapper.py:88-110 + variants) ---
    p.add_argument("--maskidx", default="0", type=list_of_ints)
    p.add_argument("--lr", default=2e-3, type=float)
    p.add_argument("--server", default=".", type=str, help="output root prefix")
    p.add_argument("--iter", default=2000, type=int)
    p.add_argument("--accumulate", default=1, type=int)
    p.add_argument("--bs", default=8, type=int)
    p.add_argument("--warmup", default=20, type=int)
    p.add_argument("--tags", nargs="+", default=["tpu"])
    p.add_argument("--filterGripTrainTo1", type=str2bool, nargs="?", default=False)
    p.add_argument("--geometry", type=str2bool, nargs="?", default=True)
    p.add_argument("--patch_size", default="3,50,50", type=list_of_ints)
    p.add_argument("--wandb_project", default="false", type=str)
    p.add_argument("--wandb_entity", default=None, type=str)
    p.add_argument("--innerLoop", default=50, type=int)
    p.add_argument("--dataset", default="bridge_orig", type=str)
    p.add_argument("--resize_patch", type=str2bool, default=False)
    p.add_argument("--targetAction", default=0, type=float)            # TMA
    p.add_argument("--reverse_direction", type=str2bool, default=True)  # UPA
    p.add_argument("--alpha", default=0.8, type=float)                  # UPA
    p.add_argument("--belta", default=0.2, type=float)                  # UPA (sic)
    p.add_argument("--MSE_weights", default=5.0, type=float)            # UADA DDP
    p.add_argument("--seed", default=42, type=int)
    # --- TPU-native additions ---
    p.add_argument("--model", default=None, type=str,
                   help="config name (e.g. openvla-7b, vla-tiny); inferred from --dataset if unset")
    p.add_argument("--checkpoint", default=None, type=str,
                   help="local HF OpenVLA checkpoint dir (safetensors) to convert & load")
    p.add_argument("--data_parallel", type=str2bool, default=False,
                   help="shard batches over all local devices (replaces torchrun DDP)")
    p.add_argument("--file_layer", default="tf", choices=["tf", "tfrecord", "native"],
                   help="'tf' = TFDS builder; 'tfrecord' = plain tf.data over "
                        "the TFDS on-disk shards (no tensorflow_datasets "
                        "needed); 'native' = the C++ reader (no TensorFlow on "
                        "the hot path; needs --stats_json)")
    p.add_argument("--stats_json", default=None, type=str,
                   help="dataset_statistics.json (reference schema: either "
                        "{dataset: stats} or a bare stats block) to use for "
                        "action normalization instead of computing from data")
    p.add_argument("--data_dir", default=None, type=str,
                   help="TFDS data root for real RLDS datasets")
    p.add_argument("--shuffle_buffer", default=100_000, type=int,
                   help="frame shuffle-buffer size (openvla_dataloader.py:101)")
    p.add_argument("--ddp_semantics", default="gspmd", choices=["gspmd", "exact"],
                   help="'gspmd' = global-mean loss (XLA collectives); 'exact' = "
                        "average-of-rank-gradients via shard_map, matching torch "
                        "DDP's all-reduce exactly (UADA_ddp.py:144-221)")
    p.add_argument("--eval_every", default=None, type=int)
    p.add_argument("--eval_batches", default=None, type=int)
    p.add_argument("--output", default=None, type=str, help="run dir (default run/<attack>/<uuid>)")
    p.add_argument("--profile", default=None, type=str,
                   help="write a jax.profiler trace of one training step to this dir")
    p.add_argument("--resume", default=None, type=str,
                   help="resume patch + optimizer state from a previous run dir")
    p.add_argument("--pad_to", default=32, type=int,
                   help="fixed text pad length (multimodal seq = 256 + pad_to). "
                        "32 -> seq 288 is the largest that fits the bs=8 7B attack "
                        "step in 16 GB HBM; raise only with more HBM or smaller bs")
    p.add_argument("--platform", default="default", choices=["default", "cpu"],
                   help="'cpu' forces the CPU backend from inside the process "
                        "(reliable even when the environment pins a TPU plugin "
                        "and ignores shell-level JAX_PLATFORMS overrides)")
    return p


def dataset_to_model(dataset: str) -> str:
    """TMA_wrapper.py:30-41 mapping."""
    if "bridge_orig" in dataset or dataset == "dummy":
        return "openvla-7b"
    for suite in ("libero_spatial", "libero_object", "libero_goal", "libero_10"):
        if suite in dataset:
            return f"openvla-7b-finetuned-{suite.replace('_', '-', 1).replace('libero-', 'libero-')}"
    raise ValueError(f"Invalid dataset {dataset}")


def resolve_objective(args) -> str:
    if args.attack == "upa" and not args.reverse_direction:
        return "upa_negce"
    return args.attack


def make_data(args, cfg, tokenizer=None, out_dir=None):
    """Train/val AttackBatch iterators for the requested dataset. Real-data
    runs also emit `<out_dir>/dataset_statistics.json` (the eval side's
    unnormalization source, openvla_utils.py:60-70 schema)."""
    from ..data import batch_iterator, dummy_frame_iterator

    if args.dataset == "dummy":
        from ..utils.prompting import WordStubTokenizer

        tok = tokenizer or WordStubTokenizer()
        image_size = cfg.dino.image_size
        train = batch_iterator(
            dummy_frame_iterator(tok, image_size=image_size, seed=args.seed),
            args.bs, pad_to=args.pad_to,
        )
        val = batch_iterator(
            dummy_frame_iterator(tok, image_size=image_size, seed=args.seed + 1),
            8, pad_to=args.pad_to,  # val bs fixed at 8 (openvla_dataloader.py:151)
        )
        return train, val, None
    from ..data.rlds import make_attack_iterators, save_reference_statistics

    stats = None
    if args.stats_json:
        import json

        with open(args.stats_json) as f:
            blob = json.load(f)
        # reference schema keys by dataset name; also accept a bare block
        stats = blob.get(args.dataset, blob if "action" in blob else None)
        if stats is None:
            raise SystemExit(
                f"--stats_json has no entry for '{args.dataset}' "
                f"(keys: {sorted(blob)})"
            )
    counters, stats_sink = {}, {}
    train, val = make_attack_iterators(
        args.dataset, args.bs, seed=args.seed, checkpoint=args.checkpoint,
        pad_to=args.pad_to, counters=counters, stats_sink=stats_sink,
        file_layer=args.file_layer, stats=stats, data_dir=args.data_dir,
        shuffle_buffer=args.shuffle_buffer, image_size=cfg.dino.image_size,
    )
    if out_dir and stats_sink:
        save_reference_statistics(
            stats_sink, os.path.join(out_dir, "dataset_statistics.json")
        )
    return train, val, counters


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from ..attacks.attacker import AttackConfig, OpenVLAAttacker
    from ..models import get_config, init_vla_params
    from ..models.convert import load_checkpoint_dir
    from ..parallel import make_mesh
    from ..utils.tracking import Tracker

    exp_id = str(uuid.uuid4())
    model_name = args.model or dataset_to_model(args.dataset)
    cfg = get_config(model_name)

    objective = resolve_objective(args)
    out_dir = args.output or os.path.join(args.server, "run", objective, exp_id)
    os.makedirs(out_dir, exist_ok=True)

    target = "".join(str(i) for i in args.maskidx)
    run_name = (
        f"{args.dataset}_{model_name}_GA{args.accumulate}_lr{args.lr:.0e}_iter{args.iter}"
        f"_warmup{args.warmup}_filterGripTrainTo1{args.filterGripTrainTo1}_target{target}"
        f"_inner_loop{args.innerLoop}_geometry{args.geometry}_patch_size{args.patch_size}"
        f"_seed{args.seed}-{exp_id}"
    )
    tracker = Tracker(
        out_dir, run_name=run_name, wandb_project=args.wandb_project,
        wandb_entity=args.wandb_entity, tags=args.tags,
        config=dict(iteration=args.iter, learning_rate=args.lr,
                    attack_target=args.maskidx, accumulate_steps=args.accumulate),
    )
    print(f"exp_id:{exp_id}\nrun dir: {out_dir}\nmodel: {model_name} ({cfg.name})")

    if args.checkpoint:
        params = load_checkpoint_dir(args.checkpoint, cfg)
        import jax.numpy as jnp

        params = jax.tree.map(lambda x: jnp.asarray(x, dtype=jnp.dtype(cfg.dtype)), params)
    else:
        if cfg.name.startswith("openvla"):
            print("WARNING: no --checkpoint given; using random weights (smoke mode)")
        # init under jit: eager init materializes fp32 intermediates (up to
        # ~6 GB for a single 7B weight stack) and fragments HBM
        params = jax.jit(lambda k: init_vla_params(k, cfg))(jax.random.key(args.seed))

    attack = AttackConfig(
        objective=objective,
        maskidx=args.maskidx,
        lr=args.lr,
        num_iter=args.iter,
        accumulate_steps=args.accumulate,
        batch_size=args.bs,
        warmup=args.warmup,
        filter_grip_train_to_1=args.filterGripTrainTo1,
        geometry=args.geometry,
        patch_size=args.patch_size,
        inner_loop=args.innerLoop,
        resize_patch=args.resize_patch,
        target_action=args.targetAction,
        mse_weight=args.MSE_weights,
        add_inverse_ce=not args.data_parallel,  # DDP variant drops +1/CE (UADA_ddp.py:204)
        upa_alpha=args.alpha,
        upa_beta=args.belta,
        eval_every=args.eval_every or (200 if args.data_parallel else 100),
        eval_batches=args.eval_batches or (1000 if objective == "uada" else 100),
        seed=args.seed,
        ddp_semantics=args.ddp_semantics if args.data_parallel else "gspmd",
    )

    mesh = make_mesh() if args.data_parallel else None
    train, val, data_counters = make_data(args, cfg, out_dir=out_dir)
    runner = OpenVLAAttacker(params, cfg, out_dir, attack, mesh=mesh, tracker=tracker,
                             data_counters=data_counters)
    result = runner.run(train, val, profile_dir=args.profile, resume_from=args.resume)
    print(f"Attack done! best {attack.objective} val metric: {result.best_metric:.6g}")
    print(f"patch artifacts under {out_dir}")
    return result


if __name__ == "__main__":
    main()
