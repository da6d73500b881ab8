"""Standalone mesh export (scripts/export_mesh.py equivalent).

Usage: python scripts/export_mesh.py --ckpt log/.../ckpt_final.npz
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--level", type=float, default=0.005)
    args = parser.parse_args(argv)

    from tensoir_tpu.utils.platform import apply_platform_override
    apply_platform_override()

    from tensoir_tpu.models.field import grid_size_of
    from tensoir_tpu.models.lifecycle import dense_alpha
    from tensoir_tpu.utils.ckpt import load_checkpoint
    from tensoir_tpu.utils.mesh_export import export_mesh_from_alpha

    fcfg, params, scene, _ = load_checkpoint(args.ckpt)
    alpha = dense_alpha(fcfg, params, scene, grid_size_of(params))
    import os
    root, ext = os.path.splitext(args.ckpt)
    out = (root if ext == ".npz" else args.ckpt) + ".ply"
    verts, faces = export_mesh_from_alpha(alpha, np.asarray(scene["aabb"]),
                                          out, level=args.level)
    print(f"mesh written to {out}: {len(verts)} verts, {len(faces)} faces")


if __name__ == "__main__":
    main()
