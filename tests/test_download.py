"""Dataset download/extract machinery (training/download.py vs the
reference's preprocessing/download.py) — registry content, skip-if-exists,
zip extraction semantics, renames, and the OCR-VQA JPG conversion — all
offline via an injectable fetcher."""

import json
import zipfile
from pathlib import Path

import numpy as np
import pytest

from roboticattack_tpu.training.download import (
    DATASET_REGISTRY,
    convert_to_jpg,
    download_extract,
    download_with_progress,
    extract_with_progress,
)


def test_registry_matches_reference_structure():
    assert set(DATASET_REGISTRY) == {"llava-laion-cc-sbu-558k", "llava-v1.5-instruct"}
    align = DATASET_REGISTRY["llava-laion-cc-sbu-558k"]
    assert align[0]["name"] == "chat.json" and not align[0]["extract"]
    assert align[1]["name"] == "images" and align[1]["extract_type"] == "directory"
    instruct = DATASET_REGISTRY["llava-v1.5-instruct"]
    assert len(instruct) == 7  # mix json + 6 image sources
    assert {d["name"] for d in instruct} >= {"coco/train2017", "gqa/images",
                                             "ocr_vqa/images", "vg/VG_100K_2"}


def test_download_skips_existing(tmp_path):
    (tmp_path / "file.json").write_text("{}")
    calls = []
    out = download_with_progress(
        "http://example.com/file.json", tmp_path,
        fetch=lambda url, dest: calls.append(url),
    )
    assert out == tmp_path / "file.json" and calls == []


def test_extract_file_vs_directory(tmp_path):
    zdir = tmp_path / "z"
    zdir.mkdir()
    multi = tmp_path / "multi.zip"
    with zipfile.ZipFile(multi, "w") as zf:
        zf.writestr("d/a.txt", "a")
        zf.writestr("d/b.txt", "b")
    first = extract_with_progress(multi, zdir, "directory")
    assert first == zdir / "d" / "a.txt"
    assert (zdir / "d" / "b.txt").read_text() == "b"

    single = tmp_path / "one.zip"
    with zipfile.ZipFile(single, "w") as zf:
        zf.writestr("only.txt", "x")
    extract_with_progress(single, zdir, "file")
    with pytest.raises(AssertionError, match="> 1 member"):
        extract_with_progress(multi, zdir, "file")
    with pytest.raises(ValueError, match="not defined"):
        extract_with_progress(single, zdir, "weird")


def test_download_extract_end_to_end(tmp_path, monkeypatch):
    """Full component flow against a fake registry entry: fetch -> extract ->
    rename, and a second call is a no-op (skip-if-complete)."""
    from roboticattack_tpu.training import download as dl

    payload_zip = tmp_path / "payload.zip"
    with zipfile.ZipFile(payload_zip, "w") as zf:
        zf.writestr("raw_images/0.jpg", "jpegbytes")
        zf.writestr("raw_images/1.jpg", "jpegbytes")

    registry = {
        "fake-ds": [
            {"name": "meta.json", "extract": False,
             "url": "http://x/blob_meta.json", "do_rename": True},
            {"name": "nested/images", "extract": True, "extract_type": "directory",
             "url": "http://x/payload.zip", "do_rename": True},
        ]
    }
    monkeypatch.setattr(dl, "DATASET_REGISTRY", registry)

    fetched = []

    def fetch(url, dest):
        fetched.append(url)
        if url.endswith(".zip"):
            dest.write_bytes(payload_zip.read_bytes())
        else:
            dest.write_text(json.dumps({"ok": 1}))

    root = tmp_path / "root"
    out = dl.download_extract("fake-ds", root, fetch=fetch)
    assert out == root / "download" / "fake-ds"
    assert json.loads((out / "meta.json").read_text()) == {"ok": 1}
    assert (out / "nested" / "images" / "0.jpg").exists()
    assert (out / "nested" / "images" / "1.jpg").exists()

    dl.download_extract("fake-ds", root, fetch=fetch)  # all present -> no fetches
    assert len(fetched) == 2


def test_dataset_config_registry():
    """conf/datasets.py:20-133 equivalents: the 5 LLaVA dataset variants with
    the reference's component paths, registered as config-file choices."""
    from roboticattack_tpu.training.conf import DatasetConfig

    assert sorted(DatasetConfig.registered_choices()) == [
        "llava-lrv", "llava-lvis4v", "llava-lvis4v-lrv",
        "llava-multimodal", "llava-v15",
    ]
    v15 = DatasetConfig.get_choice_class("llava-v15")()
    assert v15.align_stage_components[0].endswith("chat.json")
    assert v15.finetune_stage_components[0].endswith("llava_v1_5_mix665k.json")
    lvis = DatasetConfig.get_choice_class("llava-lvis4v")()
    assert "lvis4v_mix888k" in lvis.finetune_stage_components[0]
    # components point where download_extract puts them
    assert v15.align_stage_components[0].startswith("download/llava-laion-cc-sbu-558k")


def test_convert_to_jpg(tmp_path):
    from PIL import Image

    rgb = np.zeros((8, 8, 3), np.uint8)
    Image.fromarray(rgb).save(tmp_path / "a.png")
    Image.fromarray(rgb).save(tmp_path / "b.gif")
    Image.fromarray(rgb).save(tmp_path / "c.jpg")
    convert_to_jpg(tmp_path)
    assert (tmp_path / "a.jpg").exists() and (tmp_path / "b.jpg").exists()
    (tmp_path / "weird.bmp").write_bytes(b"BM")
    with pytest.raises(ValueError, match="unexpected image format"):
        convert_to_jpg(tmp_path)
