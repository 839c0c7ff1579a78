"""Attack artifacts: patch checkpoints, adversarial PNG dumps, metric pickles.

Byte-compatible with the reference so patches are interchangeable in eval
(SURVEY.md §5 checkpoint/resume): `patch.pt` is a torch-saved float32 [3, H, W]
CPU tensor in [0, 1] (TMA.py:354), PNGs are the DINO-denormalized first three
channels (TMA.py:359-363), metric histories are plain pickles (TMA.py:454-468).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional

import numpy as np


def save_patch_pt(patch_hwc: np.ndarray, path: str) -> None:
    """Save [H, W, 3] float patch as the reference's [3, H, W] torch tensor."""
    import torch

    chw = np.transpose(np.asarray(patch_hwc, np.float32), (2, 0, 1)).copy()
    torch.save(torch.from_numpy(chw), path)


def load_patch(path: str) -> np.ndarray:
    """Load a patch from .pt (reference format, [3, H, W]) or .npy -> [H, W, 3]."""
    if path.endswith(".npy"):
        arr = np.load(path)
    else:
        import torch

        t = torch.load(path, map_location="cpu", weights_only=True)
        arr = t.float().numpy()
    if arr.ndim == 3 and arr.shape[0] == 3 and arr.shape[-1] != 3:
        arr = np.transpose(arr, (1, 2, 0))
    return np.clip(arr.astype(np.float32), 0.0, 1.0)


def save_patch_png(patch_hwc: np.ndarray, path: str) -> None:
    from PIL import Image

    u8 = (np.clip(patch_hwc, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(u8).save(path)


def save_adv_images(images_hwc: np.ndarray, directory: str) -> List[str]:
    """Dump patched frames (raw [B, H, W, 3] in [0, 1]) as <i>.png. The
    reference stores the DINO-denormalized first-3-channel view, which equals
    the raw composited frame; we dump the frame directly."""
    from PIL import Image

    os.makedirs(directory, exist_ok=True)
    paths = []
    for i, img in enumerate(np.asarray(images_hwc)):
        p = os.path.join(directory, f"{i}.png")
        # torchvision ToPILImage truncates; mirror that quantization
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(p)
        paths.append(p)
    return paths


def save_checkpoint(
    save_dir: str,
    tag: str,
    patch_hwc: np.ndarray,
    adv_images: Optional[np.ndarray] = None,
    extras: Optional[Dict[str, np.ndarray]] = None,
) -> str:
    """Write <save_dir>/<tag>/patch.pt (+ patch.png, val_related_data/)."""
    d = os.path.join(save_dir, tag)
    os.makedirs(d, exist_ok=True)
    save_patch_pt(patch_hwc, os.path.join(d, "patch.pt"))
    save_patch_png(patch_hwc, os.path.join(d, "patch.png"))
    np.save(os.path.join(d, "patch.npy"), np.asarray(patch_hwc, np.float32))
    if adv_images is not None or extras:
        vd = os.path.join(d, "val_related_data")
        os.makedirs(vd, exist_ok=True)
        if adv_images is not None:
            save_adv_images(adv_images, vd)
        for name, arr in (extras or {}).items():
            np.save(os.path.join(vd, f"{name}.npy"), np.asarray(arr))
    return d


def save_history_pickles(save_dir: str, histories: Dict[str, list]) -> None:
    os.makedirs(save_dir, exist_ok=True)
    for name, values in histories.items():
        with open(os.path.join(save_dir, f"{name}.pkl"), "wb") as f:
            pickle.dump(values, f)


def plot_loss_curve(loss_values: list, save_dir: str) -> Optional[str]:
    """loss_curve.png (TMA.py:65-80); skipped gracefully without matplotlib."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    os.makedirs(save_dir, exist_ok=True)
    plt.plot(range(len(loss_values)), loss_values, label="Target Loss")
    plt.title("Loss Plot")
    plt.xlabel("Iters")
    plt.ylabel("Loss")
    plt.legend(loc="best")
    out = os.path.join(save_dir, "loss_curve.png")
    plt.savefig(out)
    plt.clf()
    return out
