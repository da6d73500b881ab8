"""Evaluation metrics (utils.py:8,93-139; renderer.py:455-470)."""
from __future__ import annotations

import numpy as np
import scipy.signal


def mse2psnr(mse: float) -> float:
    with np.errstate(divide="ignore"):  # mse == 0 -> inf, silently
        return float(-10.0 * np.log(mse) / np.log(10.0))


def psnr(img, gt) -> float:
    return mse2psnr(float(np.mean((np.asarray(img) - np.asarray(gt)) ** 2)))


def rgb_ssim(img0, img1, max_val=1.0, filter_size=11, filter_sigma=1.5,
             k1=0.01, k2=0.03, return_map=False):
    """mipnerf-derived SSIM (utils.py:93-139), numpy/scipy."""
    img0 = np.asarray(img0, np.float64)
    img1 = np.asarray(img1, np.float64)
    assert img0.ndim == 3 and img0.shape[-1] == 3 and img0.shape == img1.shape

    hw = filter_size // 2
    shift = (2 * hw - filter_size + 1) / 2
    f_i = ((np.arange(filter_size) - hw + shift) / filter_sigma) ** 2
    filt = np.exp(-0.5 * f_i)
    filt /= np.sum(filt)

    def convolve2d(z, f):
        return scipy.signal.convolve2d(z, f, mode="valid")

    def filt_fn(z):
        return np.stack([
            convolve2d(convolve2d(z[..., i], filt[:, None]), filt[None, :])
            for i in range(z.shape[-1])], -1)

    mu0 = filt_fn(img0)
    mu1 = filt_fn(img1)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    sigma00 = filt_fn(img0 ** 2) - mu00
    sigma11 = filt_fn(img1 ** 2) - mu11
    sigma01 = filt_fn(img0 * img1) - mu01
    sigma00 = np.maximum(0.0, sigma00)
    sigma11 = np.maximum(0.0, sigma11)
    sigma01 = np.sign(sigma01) * np.minimum(
        np.sqrt(sigma00 * sigma11), np.abs(sigma01))
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    numer = (2 * mu01 + c1) * (2 * sigma01 + c2)
    denom = (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
    ssim_map = numer / denom
    return ssim_map if return_map else float(np.mean(ssim_map))


def normal_mae_deg(pred, gt) -> float:
    """Mean angular error in degrees (renderer.py:470)."""
    dots = np.clip(np.sum(np.asarray(pred) * np.asarray(gt), axis=-1), -1, 1)
    return float(np.mean(np.arccos(dots)) * 180.0 / np.pi)


def rgb_lpips(gt, im, net_name="alex"):
    """LPIPS v0.1 (reference utils.py:69-81), via the native JAX port
    (utils/lpips_jax.py — golden-tested vs a live torch re-implementation).

    The trained AlexNet/VGG weights are not redistributable and absent
    from this offline image, so this returns None unless a converted
    weights file is found ($TENSOIR_LPIPS_WEIGHTS or ./lpips_<net>.npz;
    see scripts/convert_lpips_weights.py and the BASELINE.md LPIPS note).
    """
    from tensoir_tpu.utils import lpips_jax
    path = lpips_jax.find_weights(net_name)
    if path is None:
        return None
    key = f"_params_{net_name}"
    if not hasattr(rgb_lpips, key):
        setattr(rgb_lpips, key, lpips_jax.load_lpips_params(path)[0])
    params = getattr(rgb_lpips, key)
    d = lpips_jax.lpips_distance(params, np.asarray(gt, np.float32),
                                 np.asarray(im, np.float32), net=net_name,
                                 normalize=True)
    return float(np.asarray(d)[0])


def visualize_depth(depth, minmax=None):
    """Jet-colormapped depth (utils.py:11-31). Returns uint8 [H, W, 3]."""
    import cv2
    x = np.nan_to_num(np.asarray(depth))
    if minmax is None:
        pos = x[x > 0]
        mi = np.min(pos) if pos.size else 0.0
        ma = np.max(x)
    else:
        mi, ma = minmax
    x = (x - mi) / (ma - mi + 1e-8)
    x = (255 * np.clip(x, 0, 1)).astype(np.uint8)
    colored = cv2.applyColorMap(x, cv2.COLORMAP_JET)
    return cv2.cvtColor(colored, cv2.COLOR_BGR2RGB)
