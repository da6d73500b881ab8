"""Image loading helpers shared by the dataset loaders (PIL-based)."""
from __future__ import annotations

import numpy as np
from PIL import Image


def load_rgba_white_composite(path, img_wh=None):
    """PNG RGBA -> white-composited float RGB [H*W, 3] plus alpha mask
    (the blend used by every reference loader, e.g.
    dataLoader/tensoIR_rotation_setting.py:125-130)."""
    img = Image.open(path)
    if img_wh is not None and tuple(img.size) != tuple(img_wh):
        img = img.resize(tuple(img_wh), Image.Resampling.LANCZOS)
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.stack([arr] * 3 + [np.ones_like(arr)], -1)
    if arr.shape[-1] == 3:
        alpha = np.ones(arr.shape[:2] + (1,), np.float32)
    else:
        alpha = arr[..., 3:4]
    rgb = arr[..., :3] * alpha + (1.0 - alpha)
    return rgb.reshape(-1, 3), (alpha.reshape(-1, 1) > 0)


def load_normal_png(path, img_wh=None):
    """normal.png -> unit normals [H*W, 3] with +z background
    (dataLoader/tensoIR_rotation_setting.py:221-235)."""
    img = Image.open(path)
    if img_wh is not None and tuple(img.size) != tuple(img_wh):
        img = img.resize(tuple(img_wh), Image.Resampling.NEAREST)
    arr = np.asarray(img, np.float32) / 255.0
    normal = (arr[..., :3] - 0.5) * 2.0
    if arr.shape[-1] >= 4:
        a = arr[..., 3:4]
        normal = normal * a + np.array([0.0, 0.0, 1.0]) * (1.0 - a)
    normal = normal / np.maximum(
        np.linalg.norm(normal, axis=-1, keepdims=True), 1e-8)
    return normal.reshape(-1, 3).astype(np.float32)


def save_png(path, img01):
    """float [H, W, 3] in [0,1] -> 8-bit PNG."""
    arr = np.clip(np.asarray(img01) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)
