"""Shading MLPs as parameter pytrees + apply functions.

Mirrors the reference decoder zoo (tensorBase_rotated_lights.py:122-340):
  * MLPRender_Fea   — radiance RGB from (feature, viewdir) + PEs, sigmoid.
  * MLPRender_PE    — radiance from (feature, viewdir) + PE(pts)+PE(view).
  * MLPRender       — radiance from (feature, viewdir) + PE(view).
  * MLPBRDF_PEandFeature — (feature, pts) + PEs -> outc (4 = albedo+roughness
    with sigmoid, or 3 = normal with tanh).
  * MLPNormal_normal_and_PExyz — (pts, normal, feature) + PEs -> 3, tanh
    (residue normal prediction).

All are 3-layer 128-wide ReLU nets. Init matches torch.nn.Linear defaults
(kaiming-uniform == U(±1/sqrt(fan_in)) for both W and b) with the final bias
zeroed (reference: `constant_(mlp[-1].bias, 0)`).

TPU notes: inputs are concatenated once and hit the MXU as [P, in] x [in, 128]
matmuls with `preferred_element_type=float32`; optionally computed in bf16.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from tensoir_tpu.ops.pe import positional_encoding


def _linear_init(key, fan_in: int, fan_out: int, zero_bias: bool = False):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), minval=-bound, maxval=bound)
    if zero_bias:
        b = jnp.zeros((fan_out,))
    else:
        b = jax.random.uniform(kb, (fan_out,), minval=-bound, maxval=bound)
    return w.astype(jnp.float32), b.astype(jnp.float32)


def init_mlp(key, in_dim: int, hidden: int, out_dim: int) -> Dict[str, jax.Array]:
    k1, k2, k3 = jax.random.split(key, 3)
    w1, b1 = _linear_init(k1, in_dim, hidden)
    w2, b2 = _linear_init(k2, hidden, hidden)
    w3, b3 = _linear_init(k3, hidden, out_dim, zero_bias=True)
    return {"w1": w1, "b1": b1, "w2": w2, "b2": b2, "w3": w3, "b3": b3}


def apply_mlp(params: Dict[str, jax.Array], x: jax.Array,
              compute_dtype=jnp.float32) -> jax.Array:
    # precision HIGHEST on the f32 path: the TPU default silently rounds
    # f32 matmul OPERANDS to bf16 (CLAUDE.md: measured 3.6e-2 abs err) —
    # preferred_element_type alone only fixes the accumulator. The bf16
    # compute path keeps the default (operands are already bf16).
    prec = (jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    x = x.astype(compute_dtype)
    h = jax.nn.relu(
        jnp.dot(x, params["w1"].astype(compute_dtype),
                preferred_element_type=jnp.float32,
                precision=prec) + params["b1"])
    h = jax.nn.relu(
        jnp.dot(h.astype(compute_dtype), params["w2"].astype(compute_dtype),
                preferred_element_type=jnp.float32,
                precision=prec) + params["b2"])
    out = jnp.dot(h.astype(compute_dtype), params["w3"].astype(compute_dtype),
                  preferred_element_type=jnp.float32,
                  precision=prec) + params["b3"]
    return out


# ---- input assembly per decoder flavor -------------------------------------

def render_fea_in_dim(app_dim: int, view_pe: int, fea_pe: int) -> int:
    # MLPRender_Fea (tensorBase_rotated_lights.py:126)
    return 2 * view_pe * 3 + 2 * fea_pe * app_dim + 3 + app_dim


def render_fea_inputs(features, viewdirs, view_pe: int, fea_pe: int):
    parts = [features, viewdirs]
    if fea_pe > 0:
        parts.append(positional_encoding(features, fea_pe))
    if view_pe > 0:
        parts.append(positional_encoding(viewdirs, view_pe))
    return jnp.concatenate(parts, axis=-1)


def render_pe_in_dim(app_dim: int, view_pe: int, pos_pe: int) -> int:
    # MLPRender_PE. NOTE a latent reference bug: its ctor counts raw pts
    # (in_mlpC = (3+2*viewpe*3)+(3+2*pospe*3)+inChanel,
    # tensorBase_rotated_lights.py:295) but its forward concatenates only
    # [features, viewdirs, PE(pts), PE(view)] (:306-311) — 3 fewer dims, so
    # the reference crashes if shadingMode=MLP_PE is ever selected. We
    # implement the forward's actual behavior.
    return (3 + 2 * view_pe * 3) + (2 * pos_pe * 3) + app_dim


def render_pe_inputs(pts, features, viewdirs, view_pe: int, pos_pe: int):
    parts = [features, viewdirs]
    if pos_pe > 0:
        parts.append(positional_encoding(pts, pos_pe))
    if view_pe > 0:
        parts.append(positional_encoding(viewdirs, view_pe))
    return jnp.concatenate(parts, axis=-1)


def render_plain_in_dim(app_dim: int, view_pe: int) -> int:
    # MLPRender (tensorBase_rotated_lights.py:322)
    return (3 + 2 * view_pe * 3) + app_dim


def render_plain_inputs(features, viewdirs, view_pe: int):
    parts = [features, viewdirs]
    if view_pe > 0:
        parts.append(positional_encoding(viewdirs, view_pe))
    return jnp.concatenate(parts, axis=-1)


def brdf_pe_fea_in_dim(app_dim: int, pos_pe: int, fea_pe: int) -> int:
    # MLPBRDF_PEandFeature (tensorBase_rotated_lights.py:186)
    return 2 * pos_pe * 3 + 2 * fea_pe * app_dim + 3 + app_dim


def brdf_pe_fea_inputs(pts, features, pos_pe: int, fea_pe: int):
    parts = [features, pts]
    if fea_pe > 0:
        parts.append(positional_encoding(features, fea_pe))
    if pos_pe > 0:
        parts.append(positional_encoding(pts, pos_pe))
    return jnp.concatenate(parts, axis=-1)


def normal_residue_in_dim(app_dim: int, pos_pe: int, fea_pe: int) -> int:
    # MLPNormal_normal_and_PExyz (tensorBase_rotated_lights.py:240)
    return 2 * pos_pe * 3 + 2 * fea_pe * app_dim + 3 + app_dim + 3


def normal_residue_inputs(pts, normal, features, pos_pe: int, fea_pe: int):
    parts = [pts, normal, features]
    if fea_pe > 0:
        parts.append(positional_encoding(features, fea_pe))
    if pos_pe > 0:
        parts.append(positional_encoding(pts, pos_pe))
    return jnp.concatenate(parts, axis=-1)
