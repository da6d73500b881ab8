"""Checkpoint save/load.

Follows the reference's kwargs-carrying pattern (tensorBase_rotated_lights.py:
646-692: checkpoint = model kwargs + state_dict + bit-packed alpha mask) so
eval scripts can rebuild the model from the checkpoint alone, but stores a
JAX pytree in a single .npz + JSON header instead of torch.save pickles —
no `eval()` of CLI strings (the reference does `eval(args.model_name)`,
train_tensoIR.py:164).
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional, Tuple

import numpy as np

from tensoir_tpu.models.field import FieldConfig

_HEADER_KEY = "__tensoir_header__"


def _flatten(tree: Dict, prefix: str, out: Dict[str, np.ndarray]):
    for k, v in tree.items():
        key = f"{prefix}/{k}"
        if isinstance(v, dict):
            _flatten(v, key, out)
        else:
            out[key] = np.asarray(v)


def save_checkpoint(path: str, cfg: FieldConfig, params: Dict, scene: Dict,
                    extra: Optional[Dict[str, Any]] = None,
                    opt_state: Any = None,
                    rng_key: Optional[np.ndarray] = None):
    """`opt_state`/`rng_key` are optional full-train-state payload (beyond
    the reference's weights-only checkpoint): optimizer-state leaves are
    stored by flatten order and restored into a freshly-initialized state of
    identical structure (see `restore_opt_state`)."""
    arrays: Dict[str, np.ndarray] = {}
    _flatten(params, "params", arrays)
    if opt_state is not None:
        import jax
        leaves = jax.tree_util.tree_leaves(opt_state)
        for i, leaf in enumerate(leaves):
            arrays[f"opt/{i:05d}"] = np.asarray(leaf)
    if rng_key is not None:
        arrays["train/rng_key"] = np.asarray(rng_key)

    scene_np = {k: np.asarray(v) for k, v in scene.items()}
    scene_np.pop("alpha_volume_packed", None)  # derived; rebuilt on load
    alpha = scene_np.pop("alpha_volume")
    alpha_bool = alpha > 0.5
    arrays["alpha/packed"] = np.packbits(alpha_bool.reshape(-1))
    arrays["alpha/shape"] = np.asarray(alpha_bool.shape, np.int64)
    for k, v in scene_np.items():
        arrays[f"scene/{k}"] = v

    header = {
        "config": dataclasses.asdict(cfg),
        "extra": extra or {},
        "version": 1,
    }
    arrays[_HEADER_KEY] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str) -> Tuple[FieldConfig, Dict, Dict, Dict]:
    """Returns (cfg, params, scene, extra)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz",
                   allow_pickle=False)
    header = json.loads(bytes(data[_HEADER_KEY]).decode())
    cfg_d = header["config"]
    for key in ("density_n_comp", "app_n_comp", "light_rotations", "near_far"):
        if key in cfg_d and isinstance(cfg_d[key], list):
            cfg_d[key] = tuple(cfg_d[key])
    cfg = FieldConfig(**cfg_d)

    params: Dict = {}
    scene: Dict = {}
    opt_leaves: Dict[int, np.ndarray] = {}
    for key in data.files:
        if key == _HEADER_KEY:
            continue
        parts = key.split("/")
        if parts[0] == "params":
            node = params
            for p in parts[1:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = data[key]
        elif parts[0] == "scene":
            scene[parts[1]] = data[key]
        elif parts[0] == "opt":
            opt_leaves[int(parts[1])] = data[key]
        elif key == "train/rng_key":
            pass  # surfaced below

    shape = tuple(int(s) for s in data["alpha/shape"])
    n = int(np.prod(shape))
    alpha = np.unpackbits(data["alpha/packed"])[:n].reshape(shape)
    scene["alpha_volume"] = alpha.astype(np.float32)

    import jax.numpy as jnp
    from tensoir_tpu.models.field import pack_corner_volume
    scene["alpha_volume_packed"] = np.asarray(
        pack_corner_volume(jnp.asarray(scene["alpha_volume"])))
    params = {k: (jnp.asarray(v) if not isinstance(v, dict)
                  else {kk: jnp.asarray(vv) for kk, vv in v.items()})
              for k, v in params.items()}
    scene = {k: jnp.asarray(v) for k, v in scene.items()}
    extra = dict(header["extra"])
    if opt_leaves:
        extra["opt_leaves"] = [opt_leaves[i] for i in sorted(opt_leaves)]
    if "train/rng_key" in data.files:
        extra["rng_key"] = data["train/rng_key"]
    return cfg, params, scene, extra


def restore_opt_state(template_opt_state: Any, leaves) -> Any:
    """Rebuild an optimizer state from saved leaves: `template_opt_state`
    must be a freshly-initialized state for the same params/optimizer (its
    tree structure defines the layout). Returns the template unchanged if
    the leaf count differs (e.g. optimizer definition changed)."""
    import jax
    import jax.numpy as jnp
    treedef = jax.tree_util.tree_structure(template_opt_state)
    flat = jax.tree_util.tree_leaves(template_opt_state)
    if len(flat) != len(leaves):
        return template_opt_state
    cast = [jnp.asarray(l, dtype=f.dtype) if hasattr(f, "dtype") else l
            for l, f in zip(leaves, flat)]
    return jax.tree_util.tree_unflatten(treedef, cast)
