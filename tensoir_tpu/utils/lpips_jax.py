"""LPIPS v0.1 (Zhang et al.) re-implemented in JAX — NHWC, TPU-friendly.

Re-implements what the reference gets from the `lpips` pip package
(/root/reference/utils.py:69-81: `lpips.LPIPS(net='alex'|'vgg',
version='0.1')(gt, im, normalize=True)`), so the eval suite can report
LPIPS without torch:

  1. `normalize=True`: inputs in [0, 1] are mapped to [-1, 1].
  2. ScalingLayer: (x - shift) / scale with the ImageNet-derived constants
     baked into lpips v0.1.
  3. Backbone taps: torchvision AlexNet features (relu1..relu5) or VGG16
     features (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3).
  4. Per tap: channel-unit-normalize (eps 1e-10), squared diff, learned
     non-negative 1x1 conv ("lin" head), spatial mean, sum over taps.

The trained weights are NOT redistributable inside this repo and no copy
exists in this offline image (verified: no torchvision/lpips/torch-hub
cache anywhere on disk — see BASELINE.md "LPIPS" note). The architecture
is therefore exercised by a golden test against an inline torch
re-implementation with RANDOM weights (tests/test_lpips.py), and
`rgb_lpips` computes real values as soon as a weights file is present:

  python scripts/convert_lpips_weights.py <torch-ckpt> lpips_alex.npz
  export TENSOIR_LPIPS_WEIGHTS=/path/to/lpips_alex.npz
"""
from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

# lpips/lpips.py ScalingLayer constants (v0.1)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision AlexNet `features`: (out_ch, kernel, stride, pad), tap after
# each ReLU; maxpool(3,2) before stages 2, 3 (indices into this list).
_ALEX_CONVS = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
               (256, 3, 1, 1), (256, 3, 1, 1)]
_ALEX_POOL_BEFORE = {1, 2}          # maxpool precedes these conv stages

# torchvision VGG16 `features` conv plan grouped by tap slice; maxpool(2,2)
# between groups. Taps: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3.
_VGG_GROUPS = [[64, 64], [128, 128], [256, 256, 256],
               [512, 512, 512], [512, 512, 512]]


def _conv2d(x, w, b, stride: int, pad: int):
    import jax.lax as lax
    # HIGHEST: the default TPU conv truncates operands to bf16 (CLAUDE.md);
    # torch-parity of the metric requires f32 accumulation through the
    # 5/13-layer backbone
    out = lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST)
    return out + b[None, None, None, :]


def _maxpool(x, k: int, s: int):
    import jax.lax as lax
    return lax.reduce_window(x, -np.inf, lax.max, (1, k, k, 1),
                             (1, s, s, 1), "VALID")


def _alex_taps(params: Dict[str, np.ndarray], x) -> List:
    import jax.numpy as jnp
    taps = []
    for i, (_, _, stride, pad) in enumerate(_ALEX_CONVS):
        if i in _ALEX_POOL_BEFORE:
            x = _maxpool(x, 3, 2)
        x = _conv2d(x, params[f"conv{i}_w"], params[f"conv{i}_b"],
                    stride, pad)
        x = jnp.maximum(x, 0.0)
        taps.append(x)
    return taps


def _vgg_taps(params: Dict[str, np.ndarray], x) -> List:
    import jax.numpy as jnp
    taps = []
    ci = 0
    for gi, group in enumerate(_VGG_GROUPS):
        if gi > 0:
            x = _maxpool(x, 2, 2)
        for _ in group:
            x = _conv2d(x, params[f"conv{ci}_w"], params[f"conv{ci}_b"],
                        1, 1)
            x = jnp.maximum(x, 0.0)
            ci += 1
        taps.append(x)
    return taps


def lpips_distance(params: Dict[str, np.ndarray], img0, img1,
                   net: str = "alex", normalize: bool = True):
    """LPIPS distance between two [H, W, 3] (or [N, H, W, 3]) images.

    `params`: dict of conv{i}_w [Kh,Kw,I,O] / conv{i}_b [O] backbone
    weights + lin{t}_w [C] non-negative per-channel head weights.
    """
    import jax.numpy as jnp
    x0 = jnp.asarray(img0, jnp.float32)
    x1 = jnp.asarray(img1, jnp.float32)
    if x0.ndim == 3:
        x0, x1 = x0[None], x1[None]
    if normalize:                      # [0,1] -> [-1,1] (lpips normalize=True)
        x0 = 2.0 * x0 - 1.0
        x1 = 2.0 * x1 - 1.0
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    x0 = (x0 - shift) / scale
    x1 = (x1 - shift) / scale

    tap_fn = _alex_taps if net == "alex" else _vgg_taps
    t0, t1 = tap_fn(params, x0), tap_fn(params, x1)

    total = 0.0
    for t, (f0, f1) in enumerate(zip(t0, t1)):
        # lpips.normalize_tensor: unit L2 across channels, eps OUTSIDE sqrt
        n0 = f0 / (jnp.sqrt(jnp.sum(f0 ** 2, -1, keepdims=True)) + 1e-10)
        n1 = f1 / (jnp.sqrt(jnp.sum(f1 ** 2, -1, keepdims=True)) + 1e-10)
        d = (n0 - n1) ** 2                                   # [N, h, w, C]
        w = jnp.asarray(params[f"lin{t}_w"])                 # [C]
        total = total + jnp.mean(jnp.sum(d * w, -1), axis=(1, 2))
    return total  # [N]


# ---------------------------------------------------------------- loading

_DEFAULT_PATHS = ("lpips_alex.npz", os.path.expanduser("~/.cache/tensoir/"
                                                       "lpips_alex.npz"))


def load_lpips_params(path: str):
    """Load converted LPIPS weights (npz written by
    scripts/convert_lpips_weights.py). Returns (params, net_name)."""
    z = np.load(path)
    params = {k: z[k] for k in z.files if k != "net"}
    net = str(z["net"]) if "net" in z.files else "alex"
    return params, net


def find_weights(net: str = "alex"):
    """Weights path from $TENSOIR_LPIPS_WEIGHTS or default locations;
    None when absent (the offline-image case). The env-var file (and any
    candidate) is only used for the net it was converted FOR — the npz
    carries a 'net' field — so a single exported alex file can't be fed
    to the vgg plan (KeyError) or silently produce wrong numbers."""
    cand = [os.environ.get("TENSOIR_LPIPS_WEIGHTS", "")]
    cand += [p.replace("alex", net) for p in _DEFAULT_PATHS]
    for p in cand:
        if p and os.path.exists(p):
            try:
                z = np.load(p)
                file_net = str(z["net"]) if "net" in z.files else "alex"
            except Exception:
                continue
            if file_net == net:
                return p
    return None
