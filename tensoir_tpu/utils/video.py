"""Video export with codec fallback.

The reference writes fps-24 mp4s via imageio/ffmpeg
(scripts/relight_importance.py:292-339, renderer.py:338-341). This image may
lack an mp4 codec, so every writer falls back to animated GIF (PIL backend,
always available) and, failing that, skips with a note rather than aborting
an hours-long eval at the artifact step.
"""
from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import numpy as np


def write_videos(out_dir: str, videos: Sequence[Tuple[str, List]],
                 fps: int = 24, tag: str = "video") -> None:
    """Write each (name, [uint8 HxWxC frames]) as <out_dir>/<name>.mp4,
    falling back to .gif if no mp4 codec is available."""
    import imageio.v2 as imageio

    videos = [(n, f) for n, f in videos if f]
    if not videos:
        return
    os.makedirs(out_dir, exist_ok=True)
    try:
        for name, frames in videos:
            imageio.mimsave(os.path.join(out_dir, f"{name}.mp4"),
                            np.stack(frames), fps=fps, quality=8)
    except Exception as e:  # no mp4 codec in this environment
        print(f"[{tag}] mp4 export unavailable ({e}); writing GIFs")
        try:
            for name, frames in videos:
                imageio.mimsave(os.path.join(out_dir, f"{name}.gif"),
                                np.stack(frames), format="GIF",
                                duration=1000 // fps, loop=0)
        except Exception as e2:
            print(f"[{tag}] gif export skipped: {e2}")
