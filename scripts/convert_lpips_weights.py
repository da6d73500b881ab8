"""Convert lpips-v0.1 torch weights into the npz tensoir_tpu reads.

Usage:
  python scripts/convert_lpips_weights.py <src> <out.npz> [--net alex|vgg]

<src> may be:
  - a torch-saved state_dict of `lpips.LPIPS(net=..., version='0.1')`
    (keys like `net.slice1.0.weight`, `lin0.model.1.weight`), or
  - "from-package": instantiate lpips.LPIPS live (needs the pip package
    + torchvision weights — NOT available in this offline image; provided
    for users running elsewhere).

Output keys (see tensoir_tpu/utils/lpips_jax.py): conv{i}_w [Kh,Kw,I,O]
(torch OIHW -> HWIO), conv{i}_b [O], lin{t}_w [C] (squeezed 1x1 conv,
clamped >= 0 as lpips does at eval), net.
"""
from __future__ import annotations

import argparse
import re

import numpy as np


def convert_state_dict(sd, net: str):
    out = {"net": np.asarray(net)}
    conv_ws, conv_bs, lin_ws = {}, {}, {}
    for k, v in sd.items():
        v = np.asarray(v, np.float32)
        m = re.match(r"net\.slice(\d+)\.(\d+)\.weight", k)
        if m:
            conv_ws[(int(m.group(1)), int(m.group(2)))] = v
            continue
        m = re.match(r"net\.slice(\d+)\.(\d+)\.bias", k)
        if m:
            conv_bs[(int(m.group(1)), int(m.group(2)))] = v
            continue
        m = re.match(r"lin(\d+)\.model\.(\d+)\.weight", k)
        if m:
            lin_ws[int(m.group(1))] = v
    ci = 0
    for key in sorted(conv_ws):
        w = conv_ws[key]
        out[f"conv{ci}_w"] = np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
        out[f"conv{ci}_b"] = conv_bs[key]
        ci += 1
    for t in sorted(lin_ws):
        out[f"lin{t}_w"] = np.maximum(lin_ws[t].reshape(-1), 0.0)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("out")
    ap.add_argument("--net", default="alex", choices=["alex", "vgg"])
    args = ap.parse_args()

    import torch
    if args.src == "from-package":
        import lpips
        sd = lpips.LPIPS(net=args.net, version="0.1").state_dict()
    else:
        sd = torch.load(args.src, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    out = convert_state_dict({k: v.numpy() if hasattr(v, "numpy") else v
                              for k, v in sd.items()}, args.net)
    np.savez(args.out, **out)
    n_conv = sum(1 for k in out if k.endswith("_w") and k.startswith("conv"))
    print(f"wrote {args.out}: {n_conv} convs, "
          f"{sum(1 for k in out if k.startswith('lin'))} lin heads")


if __name__ == "__main__":
    main()
