"""The one `--quantize` grammar shared by every serving surface.

'int8' | 'w8a8' | 'int4' | 'int4:<group_size>' — parsed here so the four CLIs
(serve, eval_libero, eval_bridge, bench_decode) and `load_policy` agree, and
deliberately free of jax/model imports: robot hosts drive
`cli.eval_bridge --help` and config plumbing without paying the ~2 s
`eval.policy` import (the CLIs defer the heavy stack into main()).
"""

from __future__ import annotations

import argparse
from typing import Optional, Tuple


def parse_quantize(quantize: Optional[str]) -> Tuple[Optional[str], Optional[int]]:
    """'int8' | 'w8a8' | 'int4' | 'int4:<group_size>' | None ->
    (mode, group_size | None). group_size None = auto: VLAPolicy resolves it
    per-model via models.quant.int4_group_size_for (bare 'int4' must work on
    ANY zoo config, not just the ones 128 divides). 'w8a8' = int8 weights +
    dynamic per-token int8 PREFILL activations (the MXU's double-rate
    integer path; lossy — models/decode.py act_quant)."""
    if quantize is None:
        return None, None
    if quantize in ("int8", "w8a8", "int4"):
        return quantize, None
    if quantize.startswith("int4:"):
        try:
            gs = int(quantize.split(":", 1)[1])
        except ValueError:
            gs = 0
        if gs <= 0:
            raise ValueError(
                f"quantize={quantize!r}: group size must be a positive int"
            )
        return "int4", gs
    raise ValueError(
        f"quantize={quantize!r}; supported: 'int8', 'w8a8', 'int4', "
        f"'int4:<group_size>'"
    )


def resolve_quantize(
    quantize: Optional[str],
) -> Tuple[Optional[str], Optional[str], Optional[int]]:
    """parse_quantize plus the w8a8 split, in ONE place: ->
    (weights_mode | None, act_quant | None, group_size | None), where
    weights_mode is what quantize_decode_params takes ('int8' | 'int4') and
    act_quant is what greedy_decode_actions takes ('int8' for the w8a8
    prefill). Every surface that EXECUTES a --quantize value (VLAPolicy,
    bench_decode, the acceptance gate) resolves through here so a future
    mode can't be half-wired — silently serving weight-only while reporting
    w8a8."""
    mode, gs = parse_quantize(quantize)
    if mode == "w8a8":
        return "int8", "int8", gs
    return mode, None, gs


def parse_suffixes(
    suffixes,
    context: str = "",
    jacobi: bool = False,
    phases: bool = False,
    kernel: bool = False,
):
    """The once-each serving-lever suffix grammar shared by the acceptance
    gate's quant-mode strings (models/verify.py parse_quant_mode) and the
    sweep's config strings (scripts/serving_sweep.py parse_config):
    kv8|kv4 (KV-cache quantization), vt<k> (visual-token pruning), and —
    when enabled by the caller — jw|jc|js (warm/cold/correlated-stream
    drafts, `jacobi=True`), ph (prefill/tail phase attribution,
    `phases=True`), and qk (fused Pallas int4 dequant-matmul decode tail,
    ops/q4_matmul.py; `kernel=True`). ->
    (kv_cache | None, visual_tokens | None, jacobi_mode | None, ph: bool,
    qk: bool). One grammar so the next lever is wired everywhere at once
    instead of drifting across parsers."""
    kv = vt = jac = None
    ph = qk = False
    menu = ("kv8|kv4 / vt<k>" + (" / jw|jc|js" if jacobi else "")
            + (" / ph" if phases else "") + (" / qk" if kernel else ""))
    for s in suffixes:
        if s in ("kv8", "kv4") and kv is None:
            kv = {"kv8": "int8", "kv4": "int4"}[s]
        elif (s.startswith("vt") and s[2:].isdigit() and int(s[2:]) >= 1
              and vt is None):
            vt = int(s[2:])
        elif jacobi and s in ("jw", "jc", "js") and jac is None:
            jac = {"jw": "warm", "jc": "cold", "js": "stream"}[s]
        elif phases and s == "ph" and not ph:
            ph = True
        elif kernel and s == "qk" and not qk:
            qk = True
        else:
            raise ValueError(
                f"{context}unknown suffix {s!r} ({menu}, once each)"
            )
    return kv, vt, jac, ph, qk


def add_int4_kernel_flag(parser) -> None:
    """The one `--int4_kernel` flag shared by the serving CLIs (serve,
    eval_libero, eval_bridge; bench_decode predates it with identical
    semantics): auto|on|off -> resolve_int4_kernel maps to VLAPolicy's
    int4_kernel param (None = auto: engage the fused Pallas dequant-matmul
    decode tail, ops/q4_matmul.py, for single-device int4 serving on a TPU
    backend)."""
    parser.add_argument(
        "--int4_kernel", default="auto", choices=["auto", "on", "off"],
        help="fused Pallas int4 dequant-matmul decode tail "
             "(auto = single-device int4 on a TPU backend)",
    )


def resolve_int4_kernel(s: str):
    """'auto'|'on'|'off' -> None|True|False (VLAPolicy int4_kernel)."""
    return {"auto": None, "on": True, "off": False}[s]


def quantize_arg(s: str) -> str:
    """argparse `type=` validator for --quantize flags: fail at parse time
    with the grammar instead of deep inside policy construction.
    ArgumentTypeError (not ValueError) so argparse PRINTS the grammar
    message rather than swallowing it into 'invalid quantize_arg value'."""
    try:
        parse_quantize(s)
    except ValueError as e:
        raise argparse.ArgumentTypeError(str(e)) from None
    return s
