"""On-chip verification: eval suite fast march vs exact march.

Loads a trained demo checkpoint, runs `evaluation_iter` twice on the same
test views — once with the reference-exact full secondary march
(renderer.py:225-250 protocol) and once with `fast_march=True` (the
canonical quality-gated window/compaction/bake config) — and prints both
metric dicts plus deltas. Adoption criterion (VERDICT r2 item 7): PSNR
unchanged to reported precision.

  nohup python scripts/verify_eval_fast.py <ckpt.npz> > /tmp/eval_fast.log &
"""
from __future__ import annotations

import json
import sys
import time


def main():
    from tensoir_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    from tensoir_tpu.utils.compile_cache import enable as _cc
    _cc()

    from tensoir_tpu.data.synthetic import SyntheticShadowDataset
    from tensoir_tpu.models.field import grid_size_of
    from tensoir_tpu.models.lifecycle import cal_n_samples
    from tensoir_tpu.render.eval import evaluation_iter
    from tensoir_tpu.utils.ckpt import load_checkpoint

    ckpt = sys.argv[1]
    n_views = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    img = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    fcfg, params, scene, _ = load_checkpoint(ckpt)
    ds = SyntheticShadowDataset(split="test", n_views=n_views,
                                img_wh=(img, img))
    n_samples = min(1_000_000, cal_n_samples(grid_size_of(params), 0.5))

    results = {}
    for mode, fast in (("exact", False), ("fast", True)):
        t0 = time.time()
        r = evaluation_iter(
            fcfg, params, scene, ds, n_samples=n_samples,
            save_path=None, n_vis=n_views, compute_extra_metrics=False,
            second_n_sample=96, secondary_tile=32768, fast_march=fast)
        r["wall_s"] = round(time.time() - t0, 1)
        results[mode] = r
        print(json.dumps({"mode": mode, **{k: round(float(v), 4)
                                           for k, v in r.items()}}),
              flush=True)
    deltas = {k: round(float(results["fast"][k]) - float(results["exact"][k]), 4)
              for k in results["exact"] if k in results["fast"]}
    print(json.dumps({"mode": "delta(fast-exact)", **deltas}), flush=True)


if __name__ == "__main__":
    main()
