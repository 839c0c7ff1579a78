"""Offline tests for the real-checkpoint acceptance path
(models/verify.py + cli/verify_checkpoint.py) on tiny synthetic checkpoints
written in the released HF OpenVLA safetensors layout. On a machine with
egress, `python -m roboticattack_tpu.cli.verify_checkpoint --model openvla-7b`
runs the same three legs against the real weights."""

import json
import os

import numpy as np
import jax
import pytest

from roboticattack_tpu.models import VLA_TINY, init_vla_params
from roboticattack_tpu.models.verify import (
    expected_checkpoint_rules,
    manifest_report,
    parity_report,
    read_safetensors_headers,
    tma_smoke,
)

from test_convert_roundtrip import _full_state


def _write_checkpoint(tmp_path, sd=None, seed=0, two_shards=True):
    """Tiny checkpoint dir in the released layout: safetensors shards + index."""
    from safetensors.numpy import save_file

    if sd is None:
        params = jax.device_get(init_vla_params(jax.random.key(seed), VLA_TINY))
        sd = _full_state(params)
        # real DINOv2 checkpoints carry O(1) LayerScale values; the tiny init
        # uses timm's 1e-5, which deadens both residual branches and would
        # make parity insensitive to corrupted attention/MLP weights
        rng = np.random.default_rng(seed)
        for k in sd:
            if ".ls1." in k or ".ls2." in k:
                sd[k] = rng.uniform(0.1, 1.0, np.asarray(sd[k]).shape)
    sd = {k: np.ascontiguousarray(np.asarray(v, np.float32)) for k, v in sd.items()}
    keys = sorted(sd)
    half = len(keys) // 2 if two_shards else len(keys)
    shards = {
        "model-00001-of-00002.safetensors": keys[:half],
        "model-00002-of-00002.safetensors": keys[half:],
    }
    weight_map = {}
    for fname, ks in shards.items():
        if ks:
            save_file({k: sd[k] for k in ks}, str(tmp_path / fname))
            weight_map.update({k: fname for k in ks})
    with open(tmp_path / "model.safetensors.index.json", "w") as f:
        json.dump({"weight_map": weight_map}, f)
    return sd


def test_headers_match_written_tensors(tmp_path):
    sd = _write_checkpoint(tmp_path)
    headers = read_safetensors_headers(str(tmp_path))
    assert set(headers) == set(sd)
    for k, (dtype, shape) in headers.items():
        assert dtype == "F32" and shape == sd[k].shape, k


def test_manifest_accepts_faithful_checkpoint(tmp_path):
    _write_checkpoint(tmp_path)
    m = manifest_report(str(tmp_path), VLA_TINY)
    assert m.ok, (m.missing, m.shape_mismatches)
    assert m.n_tensors > 50
    assert m.dtypes == {"F32": m.n_tensors}
    # every golden rule found a tensor: nothing of the fixture is unconsumed
    assert m.unconsumed == []


def test_manifest_reports_all_missing_and_misshaped(tmp_path):
    params = jax.device_get(init_vla_params(jax.random.key(1), VLA_TINY))
    sd = _full_state(params)
    del sd["projector.fc2.bias"]
    del sd["language_model.model.layers.0.self_attn.q_proj.weight"]
    sd["vision_backbone.featurizer.blocks.0.attn.proj.weight"] = np.zeros(
        (3, 3), np.float32
    )
    _write_checkpoint(tmp_path, sd=sd)
    m = manifest_report(str(tmp_path), VLA_TINY)
    assert not m.ok
    assert any("projector.fc2.bias" in x for x in m.missing)
    assert any("layers.0.self_attn.q_proj" in x for x in m.missing)
    assert len(m.missing) == 2  # ALL missing tensors reported, not just one
    assert any("blocks.0.attn.proj.weight" in x for x in m.shape_mismatches)


def test_manifest_rule_count_scales_with_config():
    rules = expected_checkpoint_rules(VLA_TINY)
    names = [r.names[0] for r in rules]
    assert len(names) == len(set(names))
    # dead final ViT blocks are NOT required
    last_dino = f"vision_backbone.featurizer.blocks.{VLA_TINY.dino.depth - 1}."
    assert not any(n.startswith(last_dino) for n in names)
    assert sum(n.startswith("language_model.") for n in names) == (
        3 + 9 * VLA_TINY.llm.num_layers
    )


def test_parity_passes_on_faithful_checkpoint(tmp_path):
    sd = _write_checkpoint(tmp_path, seed=2)
    pr = parity_report(sd, VLA_TINY, seed=3)
    assert set(pr) == {"dino", "siglip", "projector", "llm", "full"}
    for name, d in pr.items():
        assert d["ok"], (name, d)
        assert d["max_rel"] < 5e-3, (name, d)


def test_parity_detects_corrupted_conversion(tmp_path):
    """A converter bug (here: a transposed attention projection in OUR
    pytree) must show up as a parity failure — torch side reads the raw
    checkpoint independently."""
    from roboticattack_tpu.models.convert import convert_state_dict

    sd = _write_checkpoint(tmp_path, seed=4)
    params = convert_state_dict(sd, VLA_TINY)
    blocks = dict(params["vision"]["dino"]["blocks"])
    blocks["proj_w"] = np.swapaxes(np.asarray(blocks["proj_w"]), 1, 2)
    params = dict(params)
    params["vision"] = dict(params["vision"])
    params["vision"]["dino"] = dict(params["vision"]["dino"])
    params["vision"]["dino"]["blocks"] = blocks
    pr = parity_report(sd, VLA_TINY, params=params, modules=("dino", "siglip"), seed=5)
    assert not pr["dino"]["ok"], pr["dino"]
    assert pr["siglip"]["ok"], pr["siglip"]  # untouched tower still passes


def test_tma_smoke_descends():
    params = init_vla_params(jax.random.key(6), VLA_TINY)
    sm = tma_smoke(params, VLA_TINY, iters=10, batch_size=2, lr=5e-2, seed=6)
    assert len(sm["losses"]) == 10 and all(np.isfinite(sm["losses"]))
    assert sm["decreased"], sm["losses"]
    assert sm["patch"].shape == (50, 50, 3)
    assert 0.0 <= sm["patch"].min() and sm["patch"].max() <= 1.0


def test_cli_end_to_end_accepts_and_writes_report(tmp_path):
    from roboticattack_tpu.cli.verify_checkpoint import main

    _write_checkpoint(tmp_path, seed=7)
    out = tmp_path / "verify_out"
    rc = main([
        "--model", "vla-tiny", "--checkpoint", str(tmp_path),
        "--output", str(out), "--smoke-iters", "6", "--parity-seq", "16",
    ])
    assert rc == 0
    report = json.loads((out / "verify_report.json").read_text())
    assert report["ok"] is True
    assert report["steps"]["manifest"]["ok"] is True
    assert all(d["ok"] for d in report["steps"]["parity"].values())
    assert report["steps"]["smoke"]["decreased"] is True
    assert os.path.exists(out / "smoke" / "patch.pt")


def test_cli_fails_fast_on_bad_manifest(tmp_path, capsys):
    from roboticattack_tpu.cli.verify_checkpoint import main

    params = jax.device_get(init_vla_params(jax.random.key(8), VLA_TINY))
    sd = _full_state(params)
    del sd["projector.fc1.weight"]
    _write_checkpoint(tmp_path, sd=sd)
    out = tmp_path / "verify_out"
    rc = main(["--model", "vla-tiny", "--checkpoint", str(tmp_path),
               "--output", str(out)])
    assert rc == 1
    report = json.loads((out / "verify_report.json").read_text())
    assert report["ok"] is False
    # parity/smoke never ran: manifest failure fails fast
    assert set(report["steps"]) == {"manifest"}
