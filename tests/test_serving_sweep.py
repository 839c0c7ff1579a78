"""Pure-logic tests for scripts/serving_sweep.py (config grammar + merge
durability). The measurement path itself is subprocess/TPU-bound and is
driven by the script's own CPU smoke (`--platform cpu --skip_probe`)."""

import importlib.util
import json
import os
import sys

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "serving_sweep",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "serving_sweep.py"),
)
sweep = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(sweep)


def test_parse_config_grammar():
    assert sweep.parse_config("bf16:1,4") == (
        "bf16", "bf16", None, None, None, "1,4", False, False
    )
    assert sweep.parse_config("int8:8") == ("int8", "int8", None, None, None, "8", False, False)
    assert sweep.parse_config("int4+kv8:16,32") == (
        "int4+kv8", "int4", "int8", None, None, "16,32", False, False
    )
    assert sweep.parse_config("int8+jw:1,8") == (
        "int8+jw", "int8", None, "warm", None, "1,8", False, False
    )
    assert sweep.parse_config("int4+kv8+jc:16") == (
        "int4+kv8+jc", "int4", "int8", "cold", None, "16", False, False
    )
    assert sweep.parse_config("int8+js:8") == (
        "int8+js", "int8", None, "stream", None, "8", False, False
    )
    assert sweep.parse_config("int4+kv4:32,48") == (
        "int4+kv4", "int4", "int4", None, None, "32,48", False, False
    )
    assert sweep.parse_config("int8+vt128:8,16") == (
        "int8+vt128", "int8", None, None, 128, "8,16", False, False
    )
    assert sweep.parse_config("w8a8:8,16") == (
        "w8a8", "w8a8", None, None, None, "8,16", False, False
    )
    assert sweep.parse_config("w8a8+vt128:16") == (
        "w8a8+vt128", "w8a8", None, None, 128, "16", False, False
    )
    assert sweep.parse_config("w8a8+ph:8") == (
        "w8a8+ph", "w8a8", None, None, None, "8", True, False
    )
    assert sweep.parse_config("int4+qk:1,8") == (
        "int4+qk", "int4", None, None, None, "1,8", False, True
    )
    assert sweep.parse_config("int4+kv4+qk:32") == (
        "int4+kv4+qk", "int4", "int4", None, None, "32", False, True
    )
    with pytest.raises(ValueError, match="qk requires int4"):
        sweep.parse_config("int8+qk:8")  # kernel is int4-layout-only
    with pytest.raises(ValueError, match="suffix"):
        sweep.parse_config("int8+ph+ph:1")  # once each
    with pytest.raises(ValueError, match="weights"):
        sweep.parse_config("fp8:1")
    with pytest.raises(ValueError, match="suffix"):
        sweep.parse_config("int4+fp8kv:1")
    with pytest.raises(ValueError, match="suffix"):
        sweep.parse_config("int8+jw+jc:1")  # once each
    with pytest.raises(ValueError, match="suffix"):
        sweep.parse_config("int8+kv8+kv8:1")
    with pytest.raises(ValueError, match="suffix"):
        sweep.parse_config("int8+vtx:1")  # non-numeric vt


def test_merge_keeps_prior_configs(tmp_path, monkeypatch):
    """A sweep re-run must overlay, not clobber: prior configs survive and
    the file is written after every config (partial-failure durability)."""
    out = tmp_path / "SERVING_EVIDENCE.json"
    out.write_text(json.dumps(
        {"configs": {"int8": {"status": "ok", "rows": [{"batch": 8}]}}}
    ))

    calls = []

    def fake_run(name, weights, kv, jacobi, vt, batches, iters, timeout_s,
                 platform=None, split_phases=False, int4_kernel=False):
        calls.append(name)
        return {"status": "ok", "rows": [{"batch": 1}]}

    monkeypatch.setattr(sweep, "run_config", fake_run)
    monkeypatch.setattr(
        sys, "argv",
        ["sweep", "--configs", "bf16:1", "--skip_probe", "--out", str(out)],
    )
    rc = sweep.main()
    assert rc == 0 and calls == ["bf16"]
    data = json.loads(out.read_text())
    assert set(data["configs"]) == {"int8", "bf16"}
    assert data["configs"]["int8"]["rows"] == [{"batch": 8}]
