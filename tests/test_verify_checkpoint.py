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
        # random tiny weights give near-uniform logits where int8 rounding
        # flips argmaxes — gate OFF here; gate LOGIC is pinned separately
        # (test_cli_quant_gate_rejects)
        "--quant-min-agreement", "0",
    ])
    assert rc == 0
    report = json.loads((out / "verify_report.json").read_text())
    assert report["ok"] is True
    assert report["steps"]["manifest"]["ok"] is True
    assert all(d["ok"] for d in report["steps"]["parity"].values())
    assert report["steps"]["smoke"]["decreased"] is True
    assert os.path.exists(out / "smoke" / "patch.pt")
    quant = report["steps"]["quant"]
    assert set(quant) == {"int8", "w8a8", "int4", "int8+kv8", "int4+kv4"}
    assert quant["int8"]["ok"] is True  # gate at 0.0
    for d in quant.values():
        assert 0.0 <= d["token_agreement"] <= 1.0
        assert 0.0 <= d["first_token_agreement"] <= 1.0


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


def test_clip_single_tower_parity(tmp_path):
    """The parity harness covers the zoo's CLIP-family VLMs: a single-tower
    pre-norm quick-GELU CLIP + 2-layer projector + Llama checkpoint (timm
    names, the layout prismatic_to_hf_names produces for zoo .pt dirs) passes
    tower/projector/llm/full parity, and a corrupted tower weight fails it."""
    from roboticattack_tpu.models import TINY_LLAMA
    from roboticattack_tpu.models.config import ViTConfig, VLAConfig
    from roboticattack_tpu.models.convert import convert_state_dict
    from test_convert_roundtrip import _t, _vit_state

    clip_cfg = ViTConfig(
        embed_dim=32, depth=3, num_heads=2, mlp_hidden=64, patch_size=14,
        image_size=56, use_cls_token=True, pre_norm=True, use_quick_gelu=True,
        ln_eps=1e-5,
    )
    cfg = VLAConfig(name="tiny-clip", dino=clip_cfg, siglip=None,
                    llm=TINY_LLAMA, dtype="float32")
    params = jax.device_get(init_vla_params(jax.random.key(12), cfg))

    sd = _vit_state(params["vision"]["dino"], "vision_backbone.featurizer.",
                    clip_cfg, use_ls=False)
    tower = params["vision"]["dino"]
    sd["vision_backbone.featurizer.norm_pre.weight"] = np.asarray(tower["norm_pre"]["scale"])
    sd["vision_backbone.featurizer.norm_pre.bias"] = np.asarray(tower["norm_pre"]["bias"])
    pj = params["projector"]
    for i in (1, 2):
        sd[f"projector.fc{i}.weight"] = _t(pj[f"fc{i}_w"])
        sd[f"projector.fc{i}.bias"] = np.asarray(pj[f"fc{i}_b"])
    llm = params["llm"]
    sd["language_model.model.embed_tokens.weight"] = np.asarray(llm["embed"])
    sd["language_model.model.norm.weight"] = np.asarray(llm["norm"])
    sd["language_model.lm_head.weight"] = _t(llm["lm_head"])
    L = llm["layers"]
    for i in range(TINY_LLAMA.num_layers):
        b = f"language_model.model.layers.{i}."
        sd[b + "input_layernorm.weight"] = np.asarray(L["attn_norm"][i])
        sd[b + "self_attn.q_proj.weight"] = _t(L["q_w"][i])
        sd[b + "self_attn.k_proj.weight"] = _t(L["k_w"][i])
        sd[b + "self_attn.v_proj.weight"] = _t(L["v_w"][i])
        sd[b + "self_attn.o_proj.weight"] = _t(L["o_w"][i])
        sd[b + "post_attention_layernorm.weight"] = np.asarray(L["mlp_norm"][i])
        sd[b + "mlp.gate_proj.weight"] = _t(L["gate_w"][i])
        sd[b + "mlp.up_proj.weight"] = _t(L["up_w"][i])
        sd[b + "mlp.down_proj.weight"] = _t(L["down_w"][i])
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}

    # the converter round-trips this layout (sanity for the fixture itself)
    restored = convert_state_dict(sd, cfg)
    np.testing.assert_array_equal(
        np.asarray(restored["vision"]["dino"]["patch_embed"]["kernel"]),
        np.asarray(tower["patch_embed"]["kernel"]),
    )

    pr = parity_report(sd, cfg, modules=("dino", "projector", "llm", "full"),
                       seq=16, seed=13)
    for name, d in pr.items():
        assert d["ok"], (name, d)

    # a conversion bug (transposed projection in OUR pytree; the torch side
    # reads the raw checkpoint independently) must be caught
    bad = dict(restored)
    bad["vision"] = {"dino": dict(restored["vision"]["dino"])}
    blocks = dict(bad["vision"]["dino"]["blocks"])
    blocks["proj_w"] = np.swapaxes(np.asarray(blocks["proj_w"]), 1, 2)
    bad["vision"]["dino"]["blocks"] = blocks
    pr_bad = parity_report(sd, cfg, params=bad, modules=("dino",), seed=13)
    assert not pr_bad["dino"]["ok"], pr_bad["dino"]


def test_manifest_covers_clip_single_tower():
    from roboticattack_tpu.models import TINY_LLAMA
    from roboticattack_tpu.models.config import ViTConfig, VLAConfig

    clip_cfg = ViTConfig(
        embed_dim=32, depth=3, num_heads=2, mlp_hidden=64, patch_size=14,
        image_size=56, use_cls_token=True, pre_norm=True, use_quick_gelu=True,
    )
    cfg = VLAConfig(name="tiny-clip", dino=clip_cfg, siglip=None, llm=TINY_LLAMA)
    names = [r.names[0] for r in expected_checkpoint_rules(cfg)]
    assert "vision_backbone.featurizer.norm_pre.weight" in names
    assert "vision_backbone.featurizer.cls_token" in names
    assert not any("patch_embed.proj.bias" in n for n in names)  # pre-norm: no bias
    assert "projector.fc1.weight" in names and not any("fc3" in n for n in names)


def test_cli_accepts_prismatic_pt_layout(tmp_path):
    """The acceptance CLI handles legacy prismatic .pt checkpoint dirs: the
    state is loaded through the rename shim, the manifest validates the
    renamed in-memory tensors, and all three legs pass."""
    import torch

    from roboticattack_tpu.cli.verify_checkpoint import main

    params = jax.device_get(init_vla_params(jax.random.key(20), VLA_TINY))
    hf_names = _full_state(params)
    rng = np.random.default_rng(20)
    for k in hf_names:
        if ".ls1." in k or ".ls2." in k:  # see _write_checkpoint note
            hf_names[k] = rng.uniform(0.1, 1.0, np.asarray(hf_names[k]).shape)
    inverse = {
        "vision_backbone.featurizer.": "vision_backbone.dino_featurizer.",
        "vision_backbone.fused_featurizer.": "vision_backbone.siglip_featurizer.",
        "projector.fc1.": "projector.projector.0.",
        "projector.fc2.": "projector.projector.2.",
        "projector.fc3.": "projector.projector.4.",
        "language_model.": "llm_backbone.llm.",
    }
    modules = {"vision_backbone": {}, "projector": {}, "llm_backbone": {}}
    for key, val in hf_names.items():
        for new, old in inverse.items():
            if key.startswith(new):
                key = old + key[len(new):]
                break
        module = key.split(".", 1)[0]
        modules[module][key.split(".", 1)[1]] = torch.from_numpy(
            np.ascontiguousarray(np.asarray(val, np.float32))
        )
    (tmp_path / "checkpoints").mkdir()
    torch.save({"model": modules}, tmp_path / "checkpoints" / "latest-checkpoint.pt")

    out = tmp_path / "verify_out"
    rc = main([
        "--model", "vla-tiny", "--checkpoint", str(tmp_path),
        "--output", str(out), "--smoke-iters", "6", "--parity-seq", "16",
        "--quant-min-agreement", "0",  # random weights; see the HF-layout test
    ])
    assert rc == 0
    report = json.loads((out / "verify_report.json").read_text())
    assert report["layout"] == "prismatic-pt"
    assert report["ok"] is True and report["steps"]["manifest"]["ok"] is True
    assert all(d["ok"] for d in report["steps"]["parity"].values())


def test_int4_group_size_selection():
    from roboticattack_tpu.models.verify import int4_group_size_for
    from roboticattack_tpu.parallel.evidence import evidence_7b_config

    assert int4_group_size_for(evidence_7b_config()) == 128
    assert int4_group_size_for(VLA_TINY) == 64  # tiny dims: 64/64/128
    # tp-aware: groups must also divide the PER-CHIP row-parallel
    # contractions (o_w/down_w) so bare int4 composes with TP
    assert int4_group_size_for(evidence_7b_config(), tp=2) == 128
    # 7B intermediate 11008/4 = 2752 = 64*43: gs=128 would straddle shards
    # at tp=4 — exactly what models/decode.py's guard rejects; auto -> 64
    assert int4_group_size_for(evidence_7b_config(), tp=4) == 64
    assert int4_group_size_for(VLA_TINY, tp=2) == 32  # 64/2=32 caps it


def test_quant_decode_report_structure():
    """The quant acceptance leg runs every default serving configuration
    and reports agreement stats; the gate applies only to gate_modes."""
    from roboticattack_tpu.models.verify import quant_decode_report

    params = jax.device_get(init_vla_params(jax.random.key(11), VLA_TINY))
    qr = quant_decode_report(
        params, VLA_TINY, n_batches=1, min_agreement=0.0,
    )
    assert set(qr) == {"int8", "w8a8", "int4", "int8+kv8", "int4+kv4"}
    assert "ok" in qr["int8"] and qr["int8"]["ok"] is True
    assert "ok" not in qr["int4"] and "ok" not in qr["int8+kv8"]
    assert "ok" not in qr["w8a8"]  # lossy — informational, not gated
    assert "ok" not in qr["int4+kv4"]
    for d in qr.values():
        assert 0.0 <= d["token_agreement"] <= 1.0
        assert d["n_tokens"] == 2 * 7
        assert np.isfinite(d["max_abs_action_delta"])


def test_quant_decode_report_qk_mode():
    """'int4+qk' drives the fused Pallas dequant-matmul decode tail through
    the gate (interpreted off-TPU — the REAL production call path), so the
    kernel's numerics are agreement-checkable on whatever weights production
    will serve (ops/q4_matmul.py; bit-level kernel-vs-XLA parity is pinned
    separately in test_q4_matmul.py)."""
    from roboticattack_tpu.models.verify import quant_decode_report

    params = jax.device_get(init_vla_params(jax.random.key(11), VLA_TINY))
    qr = quant_decode_report(
        params, VLA_TINY, n_batches=1, modes=("int4+qk",), min_agreement=0.0,
    )
    d = qr["int4+qk"]
    assert 0.0 <= d["token_agreement"] <= 1.0
    assert d["n_tokens"] == 2 * 7
    assert np.isfinite(d["max_abs_action_delta"])


def test_cli_quant_gate_rejects(tmp_path):
    """An unreachable agreement threshold must REJECT the checkpoint through
    the quant gate (and only through it — the other legs pass)."""
    from roboticattack_tpu.cli.verify_checkpoint import main

    _write_checkpoint(tmp_path, seed=12)
    out = tmp_path / "verify_out_q"
    rc = main([
        "--model", "vla-tiny", "--checkpoint", str(tmp_path),
        "--output", str(out), "--steps", "manifest,quant",
        "--quant-modes", "int8", "--quant-min-agreement", "1.01",
    ])
    assert rc == 1
    report = json.loads((out / "verify_report.json").read_text())
    assert report["ok"] is False
    assert report["steps"]["manifest"]["ok"] is True
    assert report["steps"]["quant"]["int8"]["ok"] is False


def test_parse_quant_mode_grammar():
    from roboticattack_tpu.models.verify import parse_quant_mode

    assert parse_quant_mode("int8") == ("int8", None, None, False)
    assert parse_quant_mode("w8a8") == ("w8a8", None, None, False)
    assert parse_quant_mode("w8a8+kv8+vt128") == ("w8a8", "int8", 128, False)
    assert parse_quant_mode("int4+kv8") == ("int4", "int8", None, False)
    assert parse_quant_mode("kv8") == (None, "int8", None, False)  # KV-only config
    assert parse_quant_mode("none+kv8") == (None, "int8", None, False)
    assert parse_quant_mode("int8+kv4") == ("int8", "int4", None, False)
    assert parse_quant_mode("kv4") == (None, "int4", None, False)  # KV-only config
    assert parse_quant_mode("int8+vt128") == ("int8", None, 128, False)
    assert parse_quant_mode("vt64") == (None, None, 64, False)    # prune-only config
    assert parse_quant_mode("int4+kv4+vt128") == ("int4", "int4", 128, False)
    assert parse_quant_mode("int4+qk") == ("int4", None, None, True)
    assert parse_quant_mode("int4+kv4+qk") == ("int4", "int4", None, True)
    with pytest.raises(ValueError, match="qk requires int4"):
        parse_quant_mode("int8+qk")  # kernel needs the packed-s4 layout
    with pytest.raises(ValueError, match="qk requires int4"):
        parse_quant_mode("kv8+qk")
    with pytest.raises(ValueError, match="weights"):
        parse_quant_mode("fp8")
    with pytest.raises(ValueError, match="suffix"):
        parse_quant_mode("int8+fp8kv")
    with pytest.raises(ValueError, match="suffix"):
        parse_quant_mode("int8+vt0")
    with pytest.raises(ValueError, match="suffix"):
        parse_quant_mode("int8+kv8+kv4")  # once each


def test_cli_rejects_bad_quant_mode_before_any_leg(tmp_path):
    """A typo'd --quant-modes must fail BEFORE manifest/parity/smoke run —
    not as a traceback after minutes of work."""
    from roboticattack_tpu.cli.verify_checkpoint import main

    _write_checkpoint(tmp_path, seed=13)
    with pytest.raises(ValueError, match="quant mode"):
        main([
            "--model", "vla-tiny", "--checkpoint", str(tmp_path),
            "--output", str(tmp_path / "o"), "--quant-modes", "fp8",
        ])
    assert not (tmp_path / "o" / "verify_report.json").exists()


def test_quant_report_vt_mode_is_the_pruning_ab():
    """'vt<k>' modes run the visual-token-pruning A/B the docs point users
    at: token agreement of the pruned decode vs full precision. keep-all is
    the identity -> agreement exactly 1.0; a heavy prune on the tiny model
    still produces a well-formed (ungated) entry."""
    from roboticattack_tpu.models.verify import quant_decode_report

    params = jax.device_get(init_vla_params(jax.random.key(13), VLA_TINY))
    qr = quant_decode_report(
        params, VLA_TINY, modes=("vt16", "vt8", "int8+vt8"),
        n_batches=1, min_agreement=0.0,
    )
    assert set(qr) == {"vt16", "vt8", "int8+vt8"}
    # 16 = the tiny model's full patch count -> bit-identical
    assert qr["vt16"]["token_agreement"] == 1.0
    assert qr["vt16"]["max_abs_action_delta"] == 0.0
    for m in ("vt8", "int8+vt8"):
        assert "ok" not in qr[m]  # informational, never gated by default
        assert 0.0 <= qr[m]["token_agreement"] <= 1.0


def test_cli_rejects_out_of_range_vt_before_any_leg(tmp_path):
    """vt<k> beyond the model's patch count must fail at startup (parser
    error), not raise mid-quant-leg after the expensive legs finished
    (models/decode.py bounds k to [1, num_patches]; vla-tiny has 16)."""
    from roboticattack_tpu.cli.verify_checkpoint import main

    _write_checkpoint(tmp_path, seed=17)
    with pytest.raises(SystemExit):
        main([
            "--model", "vla-tiny", "--checkpoint", str(tmp_path),
            "--output", str(tmp_path / "o"), "--quant-modes", "int8+vt999",
        ])
    assert not (tmp_path / "o" / "verify_report.json").exists()


def test_int4_group_size_rejects_nondividing_tp():
    """tp that doesn't divide the row-parallel contractions must raise (a
    floor-divided candidate list can degrade to gs=1 — per-element f32
    scales, a pytree LARGER than bf16 — with no error)."""
    from roboticattack_tpu.models.verify import int4_group_size_for

    with pytest.raises(ValueError, match="row-parallel"):
        int4_group_size_for(VLA_TINY, tp=3)


def test_quant_report_tp_changes_int4_group_size():
    """The gate quantizes int4 at the DEPLOYMENT group size (--quant-tp):
    vla-tiny tp=2 -> gs=32 instead of the tp=1 gs=64."""
    from roboticattack_tpu.models.verify import quant_decode_report

    params = jax.device_get(init_vla_params(jax.random.key(21), VLA_TINY))
    qr = quant_decode_report(
        params, VLA_TINY, modes=("int4",), n_batches=1, min_agreement=0.0,
        tp=2,
    )
    assert set(qr) == {"int4"}  # structure; gs=32 exercised without error
