"""Action-serving CLI: HTTP endpoint over the batched TPU decode.

  python -m roboticattack_tpu.cli.serve --checkpoint /path/to/openvla-7b \
      --quantize int8 --max_batch 16 --port 8000

Smoke (no checkpoint, tiny model, CPU):
  python -m roboticattack_tpu.cli.serve --model vla-tiny --platform cpu \
      --max_batch 4 --port 8000

Single-chip serving envelopes (one 15.75 GB v5e, BASELINE.md): bf16 bs<=4,
--quantize int8 bs<=16 (measured 21.1 actions/s), int4 + --kv_cache int8
for bs=32-class batches; --tp N spreads weights over N chips.
"""

from __future__ import annotations

import argparse

from ..utils.quant_args import (add_int4_kernel_flag, quantize_arg,
                                resolve_int4_kernel)
from .attack import str2bool


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="HTTP action-serving endpoint")
    p.add_argument("--checkpoint", default=None, type=str)
    p.add_argument("--model", default="openvla-7b", type=str)
    p.add_argument("--unnorm_key", default=None, type=str)
    p.add_argument("--center_crop", type=str2bool, default=False)
    p.add_argument("--host", default="127.0.0.1", type=str)
    p.add_argument("--port", default=8000, type=int)
    p.add_argument("--max_batch", default=8, type=int)
    p.add_argument("--max_wait_ms", default=5.0, type=float)
    p.add_argument("--quantize", default=None, type=quantize_arg,
                   help="int8 | w8a8 | int4 | int4:<group_size> (w8a8 = int8 "
                        "weights + int8 prefill activations; bare int4 "
                        "resolves the group size per-model)")
    p.add_argument("--kv_cache", default=None, choices=[None, "int8", "int4"])
    add_int4_kernel_flag(p)
    p.add_argument("--tp", default=1, type=int)
    p.add_argument("--dp", default=1, type=int,
                   help="data-parallel serving: batch rows (and the KV "
                        "cache) shard over a 'data' mesh axis; composes "
                        "with --tp as a dp x tp grid — the throughput axis "
                        "once weights fit per chip")
    p.add_argument("--visual_tokens", default=None, type=int,
                   help="keep only the k most salient patch tokens before "
                        "the LLM (LOSSY prefill/cache reduction — validate "
                        "accuracy on real weights before production)")
    p.add_argument("--drafts", action="store_true",
                   help="Jacobi self-speculative decode: clients send the "
                        "previous response's 'tokens' as 'draft_tokens' and "
                        "a correct draft runs the 6-step decode tail in one "
                        "weight stream (models/decode.py); responses carry "
                        "'tokens', /healthz adds verify-pass stats")
    p.add_argument("--no_warmup", action="store_true",
                   help="skip precompiling the bucket ladder at startup")
    # shell-env JAX_PLATFORMS is silently ignored on this box (CLAUDE.md);
    # this flag is the working override
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from ..eval.policy import load_policy
    from ..serving.http import ActionServer

    from ..parallel import make_serving_mesh
    from ..serving.batcher import default_buckets

    mesh = make_serving_mesh(tp=args.tp, dp=args.dp)
    if mesh is not None and args.dp > 1:
        bad = [b for b in default_buckets(args.max_batch) if b % args.dp]
        if bad:
            print(f"WARNING: --dp {args.dp} does not divide buckets {bad}; "
                  f"those batches serve replicated (no dp speedup)",
                  flush=True)
    if args.checkpoint is None and args.model == "openvla-7b":
        print("WARNING: no --checkpoint; random weights (smoke mode)")
    policy = load_policy(
        args.checkpoint, model_name=args.model, unnorm_key=args.unnorm_key,
        center_crop=args.center_crop, mesh=mesh, quantize=args.quantize,
        kv_cache=args.kv_cache, visual_tokens=args.visual_tokens,
        int4_kernel=resolve_int4_kernel(args.int4_kernel),
    )
    server = ActionServer(
        policy, host=args.host, port=args.port,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        drafts=args.drafts,
    )
    if not args.no_warmup:
        size = policy.cfg.dino.image_size
        print(f"warming up buckets {server.batcher.buckets} ...", flush=True)
        server.batcher.warmup(np.zeros((size, size, 3), np.uint8))
    host, port = server.address
    print(f"serving on http://{host}:{port}  (POST /act, GET /healthz)",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()


if __name__ == "__main__":
    main()
