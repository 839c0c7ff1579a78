"""Evaluation-time image/prompt processing.

Parity targets:
  - PrismaticImageProcessor apply_transform (processing_prismatic.py:128-145):
    PIL bicubic resize w/ antialias to 224 (the center-crop is a no-op at the
    224->224 operating point) -> ToTensor scale -> dual normalization. On PIL
    inputs torchvision delegates to PIL's resize, so using PIL here is exact.
  - eval center-crop 0.9 + resize-back via tf.image.crop_and_resize
    (openvla_utils.py:81-124,135-155).
  - LIBERO frame extraction: 180-degree rotation + JPEG encode/decode round
    trip + lanczos3 resize (libero_utils.py:33-58).
"""

from __future__ import annotations



import numpy as np

from ..utils.constants import IMAGE_SIZE


def resize_bicubic_pil(image: np.ndarray, size: int = IMAGE_SIZE) -> np.ndarray:
    """uint8 HWC -> uint8 [size, size, 3] via PIL bicubic (training-transform
    parity for the PIL path)."""
    from PIL import Image

    pil = Image.fromarray(np.asarray(image, np.uint8)).convert("RGB")
    pil = pil.resize((size, size), Image.BICUBIC)
    return np.asarray(pil, np.uint8)


def center_crop_resize_tf(image: np.ndarray, crop_scale: float = 0.9) -> np.ndarray:
    """The reference's optional eval-time crop (openvla_utils.py:81-124):
    center-crop to sqrt(crop_scale) of each side, resize back to 224."""
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    img = tf.image.convert_image_dtype(tf.convert_to_tensor(np.asarray(image)), tf.float32)
    new_side = np.clip(np.sqrt(crop_scale), 0, 1)
    off = (1 - new_side) / 2
    boxes = tf.constant([[off, off, off + new_side, off + new_side]], tf.float32)
    out = tf.image.crop_and_resize(img[None], boxes, tf.constant([0]), (224, 224))[0]
    out = tf.clip_by_value(out, 0, 1)
    return tf.image.convert_image_dtype(out, tf.uint8, saturate=True).numpy()


def libero_frame(agentview_image: np.ndarray, resize_size: int = IMAGE_SIZE) -> np.ndarray:
    """LIBERO obs -> model-ready uint8 frame (libero_utils.py:33-58): rotate
    180, JPEG round-trip (training distribution), lanczos3 resize."""
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    img = agentview_image[::-1, ::-1]
    img = tf.image.encode_jpeg(img)
    img = tf.io.decode_image(img, expand_animations=False, dtype=tf.uint8)
    img = tf.image.resize(img, (resize_size, resize_size), method="lanczos3", antialias=True)
    return tf.cast(tf.clip_by_value(tf.round(img), 0, 255), tf.uint8).numpy()


def eval_prompt(task_label: str) -> str:
    """openvla_utils.py:163."""
    return f"In: What action should the robot take to {task_label.lower()}?\nOut:"


def quat2axisangle(quat) -> "np.ndarray":
    """Quaternion (x, y, z, w) -> exponential-map axis-angle
    (libero_utils.py:77-101, after robosuite's transform_utils)."""
    import math

    q = np.asarray(quat, np.float64).copy()
    # clip w to valid range to survive numerical drift
    q[3] = float(np.clip(q[3], -1.0, 1.0))
    den = math.sqrt(max(1.0 - q[3] * q[3], 0.0))
    if math.isclose(den, 0.0):
        return np.zeros(3)
    return (q[:3] * 2.0 * math.acos(q[3])) / den
