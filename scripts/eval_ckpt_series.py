"""Metric trajectory across a training run's saved checkpoints.

Evaluates each checkpoint with the SAME exact-march protocol
(reference renderer.py:225-250 semantics, no fast-march shortcuts) on a
fixed set of test views and prints one JSON line per checkpoint —
psnr_nvs / psnr_nvs_brdf / normal MAE / albedo PSNR — so late-training
quality drift (e.g. the 20k flagship's normal-MAE regression vs its 5k
sibling) can be localized in iteration time instead of guessed at.

  nohup python scripts/eval_ckpt_series.py ckptA.npz ckptB.npz ... \
      > /tmp/ckpt_series.log &

Optional env: SERIES_VIEWS (default 4), SERIES_IMG (default 128).
"""
from __future__ import annotations

import json
import os
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

    n_views = int(os.environ.get("SERIES_VIEWS", "4"))
    img = int(os.environ.get("SERIES_IMG", "128"))
    ds = SyntheticShadowDataset(split="test", n_views=n_views,
                                img_wh=(img, img))

    for ckpt in sys.argv[1:]:
        try:
            fcfg, params, scene, extra = load_checkpoint(ckpt)
        except Exception as e:  # one missing ckpt must not kill the series
            print(json.dumps({"ckpt": os.path.basename(ckpt),
                              "skipped": str(e)}), flush=True)
            continue
        n_samples = min(1_000_000, cal_n_samples(grid_size_of(params), 0.5))
        t0 = time.time()
        r = evaluation_iter(
            fcfg, params, scene, ds, n_samples=n_samples,
            save_path=None, n_vis=n_views, compute_extra_metrics=False,
            second_n_sample=96, secondary_tile=32768, fast_march=False)
        out = {"ckpt": os.path.basename(ckpt),
               "iteration": int(extra.get("iteration", -1))
               if isinstance(extra, dict) else -1,
               **{k: round(float(v), 4) for k, v in r.items()},
               "wall_s": round(time.time() - t0, 1)}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
