"""Golden test: JAX LPIPS port vs an inline torch re-implementation.

The trained LPIPS weights are absent from this offline image (no
torchvision / lpips / torch-hub caches — see BASELINE.md), so correctness
is asserted ARCHITECTURALLY: build the exact lpips-v0.1 pipeline in torch
with RANDOM weights (torchvision AlexNet/VGG16 feature stacks + scaling
layer + unit-normalize + non-negative 1x1 lin heads + spatial mean,
lpips/lpips.py v0.1), export those weights through the same converter
users run (scripts/convert_lpips_weights.py), and assert allclose.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tensoir_tpu.utils.lpips_jax import (  # noqa: E402
    _SCALE, _SHIFT, lpips_distance)
import sys, os  # noqa: E402
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from convert_lpips_weights import convert_state_dict  # noqa: E402


def _torch_backbone(net):
    import torch.nn as nn
    if net == "alex":
        convs = [nn.Conv2d(3, 64, 11, 4, 2), nn.Conv2d(64, 192, 5, 1, 2),
                 nn.Conv2d(192, 384, 3, 1, 1), nn.Conv2d(384, 256, 3, 1, 1),
                 nn.Conv2d(256, 256, 3, 1, 1)]
        pool_before = {1, 2}
        pool = nn.MaxPool2d(3, 2)
    else:
        plan = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
                (256, 256), (256, 256), (256, 512), (512, 512), (512, 512),
                (512, 512), (512, 512), (512, 512)]
        convs = [nn.Conv2d(i, o, 3, 1, 1) for i, o in plan]
        pool_before = {2, 4, 7, 10}
        pool = nn.MaxPool2d(2, 2)
    return convs, pool_before, pool


def _torch_taps(convs, pool_before, pool, tap_after, x):
    taps = []
    for i, c in enumerate(convs):
        if i in pool_before:
            x = pool(x)
        x = torch.relu(c(x))
        if i in tap_after:
            taps.append(x)
    return taps


def _torch_lpips(net, convs, pool_before, pool, tap_after, lins, x0, x1):
    """lpips.LPIPS.forward with normalize=True, spatial=False (v0.1)."""
    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)
    outs = []
    for x in (x0, x1):
        x = 2.0 * x - 1.0
        x = (x - shift) / scale
        outs.append(_torch_taps(convs, pool_before, pool, tap_after, x))
    total = 0.0
    for (f0, f1), w in zip(zip(*outs), lins):
        n0 = f0 / (torch.sqrt((f0 ** 2).sum(1, keepdim=True)) + 1e-10)
        n1 = f1 / (torch.sqrt((f1 ** 2).sum(1, keepdim=True)) + 1e-10)
        d = (n0 - n1) ** 2
        total = total + (d * w.view(1, -1, 1, 1)).sum(1).mean((1, 2))
    return total


@pytest.mark.parametrize("net", ["alex", "vgg"])
def test_lpips_jax_matches_torch_arch(net):
    torch.manual_seed(0)
    convs, pool_before, pool = _torch_backbone(net)
    tap_after = (set(range(5)) if net == "alex"
                 else {1, 3, 6, 9, 12})
    n_taps = 5
    chans = ([64, 192, 384, 256, 256] if net == "alex"
             else [64, 128, 256, 512, 512])
    lins = [torch.rand(c) * 0.1 for c in chans]

    rng = np.random.default_rng(0)
    h = 64
    img0 = rng.uniform(0, 1, (h, h, 3)).astype(np.float32)
    img1 = np.clip(img0 + rng.normal(0, 0.1, (h, h, 3)), 0, 1).astype(
        np.float32)

    with torch.no_grad():
        x0 = torch.from_numpy(img0).permute(2, 0, 1)[None]
        x1 = torch.from_numpy(img1).permute(2, 0, 1)[None]
        ref = float(_torch_lpips(net, convs, pool_before, pool, tap_after,
                                 lins, x0, x1)[0])

    # export through the user-facing converter (lpips state_dict key names)
    sd = {}
    slice_layers = {"alex": [[0], [0], [0], [0], [0]],
                    "vgg": [[0, 2], [0, 2], [0, 2, 4], [0, 2, 4],
                            [0, 2, 4]]}[net]
    ci = 0
    for si, layers in enumerate(slice_layers):
        for li in layers:
            sd[f"net.slice{si+1}.{li}.weight"] = convs[ci].weight.detach()
            sd[f"net.slice{si+1}.{li}.bias"] = convs[ci].bias.detach()
            ci += 1
    for t in range(n_taps):
        sd[f"lin{t}.model.1.weight"] = lins[t].view(1, -1, 1, 1)
    params = convert_state_dict(
        {k: v.numpy() for k, v in sd.items()}, net)

    ours = float(np.asarray(lpips_distance(params, img0, img1, net=net))[0])
    assert abs(ours - ref) < 1e-4 * max(1.0, abs(ref)), (ours, ref)

    # identical images -> 0
    zero = float(np.asarray(lpips_distance(params, img0, img0, net=net))[0])
    assert abs(zero) < 1e-6


def test_rgb_lpips_uses_weights_file(tmp_path, monkeypatch):
    """rgb_lpips returns a float when a converted weights npz is present
    and None otherwise (the offline default)."""
    from tensoir_tpu.utils import metrics
    monkeypatch.delenv("TENSOIR_LPIPS_WEIGHTS", raising=False)
    # tiny random-weight alex file via the converter
    torch.manual_seed(1)
    convs, _, _ = _torch_backbone("alex")
    sd = {}
    for si, c in enumerate(convs):
        sd[f"net.slice{si+1}.0.weight"] = c.weight.detach().numpy()
        sd[f"net.slice{si+1}.0.bias"] = c.bias.detach().numpy()
    for t, ch in enumerate([64, 192, 384, 256, 256]):
        sd[f"lin{t}.model.1.weight"] = torch.rand(1, ch, 1, 1).numpy()
    params = convert_state_dict(sd, "alex")
    p = tmp_path / "lpips_alex.npz"
    np.savez(p, **params)

    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)

    if hasattr(metrics.rgb_lpips, "_params_alex"):
        delattr(metrics.rgb_lpips, "_params_alex")
    monkeypatch.setenv("TENSOIR_LPIPS_WEIGHTS", str(p))
    v = metrics.rgb_lpips(a, b, "alex")
    assert isinstance(v, float) and np.isfinite(v) and v > 0

    delattr(metrics.rgb_lpips, "_params_alex")
    monkeypatch.delenv("TENSOIR_LPIPS_WEIGHTS")
    empty = tmp_path / "empty"
    empty.mkdir()
    monkeypatch.chdir(empty)   # no ./lpips_alex.npz here
    assert metrics.rgb_lpips(a, b, "alex") is None
