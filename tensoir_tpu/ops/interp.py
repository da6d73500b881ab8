"""Grid interpolation primitives (TPU-friendly gathers, channels-last).

These replace every `F.grid_sample` call in the reference:

* 2-D bilinear on VM planes / 1-D linear on VM lines with
  ``align_corners=True`` semantics (reference tensoRF_rotated_lights.py:104-107
  and the hand-written twice-differentiable sampler relight_utils.py:57-107).
* 3-D trilinear on the alpha-mask volume (tensorBase_rotated_lights.py:114).
* 2-D bilinear on lat-long environment maps with either corner convention
  (tensorBase_rotated_lights.py:605 uses align_corners=False,
  relight_utils.py:203 uses align_corners=True).

Design notes (TPU):
- Arrays are stored **channels-last** (``[H, W, C]`` / ``[D, C]``) so one
  gathered index fetches a C-length lane-contiguous row — the natural layout
  for XLA's TPU gather. The reference's NCHW layouts would gather strided
  scalars instead.
- Everything is built from `jnp.take` on flattened spatial indices + lerp
  weights, which is twice differentiable w.r.t. both the grid values and the
  sample coordinates by construction (JAX composes `grad` through gather and
  multiply). That gives us the second-order path the reference needed a
  custom sampler for (derived normals: tensorBase_rotated_lights.py:839-856).
- Out-of-range coordinates are border-clamped. In-domain this matches the
  reference exactly (its coordinates are pre-normalized into [-1,1]); the
  reference's zero-padding only differs outside the domain, where samples are
  masked anyway.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord, size: int, align_corners: bool):
    """Map [-1, 1] -> pixel coordinates (PyTorch grid_sample conventions)."""
    size_f = jnp.asarray(size, coord.dtype)
    if align_corners:
        return (coord + 1.0) * 0.5 * (size_f - 1.0)
    return ((coord + 1.0) * size_f - 1.0) * 0.5


def lerp_line(line: jax.Array, z: jax.Array, align_corners: bool = True) -> jax.Array:
    """Linear interpolation on a 1-D factor line.

    Args:
      line: [D, C] factor values (channels-last).
      z:    [...,] normalized coords in [-1, 1].
    Returns: [..., C].
    """
    D = line.shape[0]
    iz = _unnormalize(z, D, align_corners)
    iz0 = jnp.clip(jnp.floor(iz), 0, D - 1)
    iz1 = jnp.clip(iz0 + 1, 0, D - 1)
    w1 = iz - iz0
    w0 = 1.0 - w1
    v0 = jnp.take(line, iz0.astype(jnp.int32), axis=0)
    v1 = jnp.take(line, iz1.astype(jnp.int32), axis=0)
    return v0 * w0[..., None] + v1 * w1[..., None]


def bilerp_plane(plane: jax.Array, x: jax.Array, y: jax.Array,
                 align_corners: bool = True, padding: str = "border") -> jax.Array:
    """Bilinear interpolation on a 2-D factor plane.

    Args:
      plane: [H, W, C] (channels-last; reference keeps [1, C, H, W]).
      x: [...,] normalized coords in [-1, 1] along W.
      y: [...,] normalized coords in [-1, 1] along H.
      padding: "border" (clamp) or "zeros" (PyTorch grid_sample default;
        needed for exact parity of the env-map lookup at the lat-long poles,
        tensorBase_rotated_lights.py:605).
    Returns: [..., C].
    """
    H, W, C = plane.shape
    ix = _unnormalize(x, W, align_corners)
    iy = _unnormalize(y, H, align_corners)

    ix0f = jnp.floor(ix)
    iy0f = jnp.floor(iy)

    # corner weights (linear in ix, iy => twice differentiable w.r.t. coords)
    wx1 = ix - ix0f
    wy1 = iy - iy0f
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    flat = plane.reshape(H * W, C)

    def corner(iyf, ixf, w):
        iyc = jnp.clip(iyf, 0, H - 1).astype(jnp.int32)
        ixc = jnp.clip(ixf, 0, W - 1).astype(jnp.int32)
        v = jnp.take(flat, iyc * W + ixc, axis=0)
        if padding == "zeros":
            inb = ((ixf >= 0) & (ixf <= W - 1) & (iyf >= 0) & (iyf <= H - 1))
            w = w * inb.astype(w.dtype)
        return v * w[..., None]

    return (corner(iy0f, ix0f, wy0 * wx0)
            + corner(iy0f, ix0f + 1, wy0 * wx1)
            + corner(iy0f + 1, ix0f, wy1 * wx0)
            + corner(iy0f + 1, ix0f + 1, wy1 * wx1))


def trilerp_volume(vol: jax.Array, coords: jax.Array,
                   align_corners: bool = True) -> jax.Array:
    """Trilinear interpolation on a 3-D volume.

    Follows PyTorch's 3-D grid_sample index convention used by the alpha mask
    (tensorBase_rotated_lights.py:112-116): for a volume stored [D, H, W] the
    sample coordinate is (x, y, z) = (W-axis, H-axis, D-axis).

    Args:
      vol: [D, H, W] (single channel) or [D, H, W, C].
      coords: [..., 3] normalized (x, y, z) in [-1, 1].
    Returns: [...] or [..., C].
    """
    squeeze = vol.ndim == 3
    if squeeze:
        vol = vol[..., None]
    D, H, W, C = vol.shape
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    ix = _unnormalize(x, W, align_corners)
    iy = _unnormalize(y, H, align_corners)
    iz = _unnormalize(z, D, align_corners)

    ix0 = jnp.clip(jnp.floor(ix), 0, W - 1)
    iy0 = jnp.clip(jnp.floor(iy), 0, H - 1)
    iz0 = jnp.clip(jnp.floor(iz), 0, D - 1)
    ix1 = jnp.clip(ix0 + 1, 0, W - 1)
    iy1 = jnp.clip(iy0 + 1, 0, H - 1)
    iz1 = jnp.clip(iz0 + 1, 0, D - 1)

    wx1, wy1, wz1 = ix - ix0, iy - iy0, iz - iz0
    wx0, wy0, wz0 = 1.0 - wx1, 1.0 - wy1, 1.0 - wz1

    flat = vol.reshape(D * H * W, C)

    def take(izp, iyp, ixp):
        idx = (izp.astype(jnp.int32) * H + iyp.astype(jnp.int32)) * W + ixp.astype(jnp.int32)
        return jnp.take(flat, idx, axis=0)

    out = (take(iz0, iy0, ix0) * (wz0 * wy0 * wx0)[..., None]
           + take(iz0, iy0, ix1) * (wz0 * wy0 * wx1)[..., None]
           + take(iz0, iy1, ix0) * (wz0 * wy1 * wx0)[..., None]
           + take(iz0, iy1, ix1) * (wz0 * wy1 * wx1)[..., None]
           + take(iz1, iy0, ix0) * (wz1 * wy0 * wx0)[..., None]
           + take(iz1, iy0, ix1) * (wz1 * wy0 * wx1)[..., None]
           + take(iz1, iy1, ix0) * (wz1 * wy1 * wx0)[..., None]
           + take(iz1, iy1, ix1) * (wz1 * wy1 * wx1)[..., None])
    return out[..., 0] if squeeze else out


def bilerp_image_nchw_like(image_hwc: jax.Array, x: jax.Array, y: jax.Array,
                           align_corners: bool) -> jax.Array:
    """Bilinear lookup on an [H, W, C] image with either corner convention.

    Used for lat-long environment-map queries; the reference uses
    align_corners=False for the learned env map (tensorBase_rotated_lights.py:605)
    and align_corners=True for held-out HDR maps (relight_utils.py:203).
    """
    return bilerp_plane(image_hwc, x, y, align_corners=align_corners)


def resize_bilinear_align_corners(grid: jax.Array, out_hw) -> jax.Array:
    """Bilinear resize with align_corners=True on the leading 2 spatial dims.

    Matches `F.interpolate(..., mode='bilinear', align_corners=True)` used for
    coarse-to-fine factor upsampling (tensoRF_rotated_lights.py:226-239).

    Args:
      grid: [H, W, C].
      out_hw: (H_new, W_new).
    Returns: [H_new, W_new, C].
    """
    H, W, _ = grid.shape
    Hn, Wn = int(out_hw[0]), int(out_hw[1])
    # target sample positions in normalized [-1, 1] under align_corners=True
    ys = jnp.linspace(-1.0, 1.0, Hn) if Hn > 1 else jnp.zeros((1,))
    xs = jnp.linspace(-1.0, 1.0, Wn) if Wn > 1 else jnp.zeros((1,))
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return bilerp_plane(grid, xx, yy, align_corners=True)


def resize_line_align_corners(line: jax.Array, out_d: int) -> jax.Array:
    """[D, C] -> [D_new, C] linear resize, align_corners=True."""
    D, _ = line.shape
    zs = jnp.linspace(-1.0, 1.0, int(out_d)) if out_d > 1 else jnp.zeros((1,))
    return lerp_line(line, zs, align_corners=True)


def bilerp_plane_packed(plane: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Bilinear plane interpolation via ONE corner-packed row gather.

    Equivalent to `bilerp_plane(..., align_corners=True, padding="border")`
    for coords in [-1, 1] (the VM factor case: coordinates are normalized
    into the AABB before the query, tensoRF_rotated_lights.py:95-110), but
    gathers a single [4C] row from a corner-packed [(H-1)(W-1), 4C] table
    instead of four [C] rows. TPU gathers and their VJP scatters are
    row-count-bound with row width nearly free (measured: 786k-row
    scatter-add of 16- and 64-wide rows both 40 ms), so this cuts both the
    forward gather and the backward scatter-add cost ~4x. The pack itself is
    slice+concat whose VJP is dense pad+add — no extra scatter.

    Twice differentiable w.r.t. coords and grid, like bilerp_plane.
    """
    H, W, C = plane.shape
    packed = jnp.concatenate([plane[:-1, :-1], plane[:-1, 1:],
                              plane[1:, :-1], plane[1:, 1:]], -1)
    packed = packed.reshape((H - 1) * (W - 1), 4 * C)
    ix = _unnormalize(x, W, True)
    iy = _unnormalize(y, H, True)
    ix0 = jnp.clip(jnp.floor(ix), 0, W - 2)
    iy0 = jnp.clip(jnp.floor(iy), 0, H - 2)
    # clamping the weights (not just the indices) preserves border-clamp
    # semantics at the cell level for out-of-range coords
    wx1 = jnp.clip(ix - ix0, 0.0, 1.0)[..., None]
    wy1 = jnp.clip(iy - iy0, 0.0, 1.0)[..., None]
    rows = jnp.take(packed, (iy0 * (W - 1) + ix0).astype(jnp.int32), axis=0)
    v00, v01, v10, v11 = jnp.split(rows, 4, axis=-1)
    return ((1.0 - wy1) * ((1.0 - wx1) * v00 + wx1 * v01)
            + wy1 * ((1.0 - wx1) * v10 + wx1 * v11))


def bilerp_plane_group_packed(plane: jax.Array, x: jax.Array,
                              y: jax.Array) -> jax.Array:
    """Bilinear plane interpolation for GROUPS of nearby samples via ONE
    16-corner block-row gather per group.

    Exact (same math as `bilerp_plane_packed`) whenever every sample in a
    group lies within a 3x3-cell block, i.e. the group's per-axis position
    span (g-1)*step is <= 2 cells so per-sample cell indices differ <= 2
    per axis (at g=4 that means step_ratio <= 2/3; `render_rays` enforces
    (g-1)*step_ratio <= 2 statically and the train loop re-checks against
    live grid units). TPU gathers and their VJP scatters are row-COUNT-bound with row
    width nearly free (CLAUDE.md measurements), so one [16C] block row per
    group replaces g [4C] rows: ~g x fewer rows on both the forward gather
    and the backward scatter-add — the grouped-march trick
    (field.bake_pair_packed_sigma_grid) applied to the LIVE differentiable
    factors instead of a baked no-grad table.

    Args:
      plane: [H, W, C] (H, W >= 4).
      x, y: [..., g] normalized coords in [-1, 1]; the trailing axis is the
        group dimension (members must be spatially adjacent as above).
    Returns: [..., g, C].

    Twice differentiable w.r.t. coords and grid (weights are linear in the
    clipped fractional offsets; block selection uses stop-gradient floors,
    exactly like the per-sample packed variant).
    """
    H, W, C = plane.shape
    # 16 shifted slices -> [(H-3), (W-3), 16C]; VJP is dense pad+add
    packed = jnp.concatenate(
        [plane[dy:H - 3 + dy, dx:W - 3 + dx]
         for dy in range(4) for dx in range(4)], -1)
    packed = packed.reshape((H - 3) * (W - 3), 16 * C)
    ix = _unnormalize(x, W, True)
    iy = _unnormalize(y, H, True)
    ix0 = jnp.clip(jnp.floor(ix), 0, W - 2)
    iy0 = jnp.clip(jnp.floor(iy), 0, H - 2)
    # block origin: min cell over the group, clipped so corners bx..bx+3 fit
    bx = jnp.clip(jnp.min(ix0, axis=-1), 0, W - 4)             # [...]
    by = jnp.clip(jnp.min(iy0, axis=-1), 0, H - 4)
    rows = jnp.take(packed,
                    (by * (W - 3) + bx).astype(jnp.int32), axis=0)
    rows = rows.reshape(*rows.shape[:-1], 4, 4, C)             # [..., dy, dx, C]
    # per-sample offset within the block (0..2) + bilinear corner weights
    ox = ix0 - bx[..., None]                                   # [..., g]
    oy = iy0 - by[..., None]
    wx1 = jnp.clip(ix - ix0, 0.0, 1.0)
    wy1 = jnp.clip(iy - iy0, 0.0, 1.0)
    iota = jnp.arange(4, dtype=plane.dtype)
    Wx = (jnp.where(iota == ox[..., None], 1.0 - wx1[..., None], 0.0)
          + jnp.where(iota == ox[..., None] + 1.0, wx1[..., None], 0.0))
    Wy = (jnp.where(iota == oy[..., None], 1.0 - wy1[..., None], 0.0)
          + jnp.where(iota == oy[..., None] + 1.0, wy1[..., None], 0.0))
    # [..., g, 4]x[..., g, 4] -> weights over the 16 block corners; contract
    # with the gathered block in f32 (HIGHEST: interp weights, CLAUDE.md)
    return jnp.einsum("...ga,...gb,...abc->...gc", Wy, Wx, rows,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)


def lerp_line_matmul(line: jax.Array, z: jax.Array) -> jax.Array:
    """Linear line interpolation as a dense one-hot matmul (no gather).

    Equivalent to `lerp_line(..., align_corners=True)` for z in [-1, 1].
    The two-tap interpolation matrix M [N, D] (rows: 1-w at iz0, w at
    iz0+1) is contracted with the line on the MXU; the VJP w.r.t. the line
    is M^T @ g — another matmul — so the backward pass has NO scatter-add
    (line gathers/scatters were ~40 ms per 786k rows; the matmul streams
    [N, D] once at memory bandwidth). Precision HIGHEST keeps f32 weights
    exact (default TPU matmul truncates to bf16: 3.6e-2 abs error measured).

    Twice differentiable w.r.t. z (M is linear in the clamped fractional
    weight) and w.r.t. the line values.
    """
    D, C = line.shape
    iz = _unnormalize(z, D, True)
    iz0 = jnp.clip(jnp.floor(iz), 0, D - 2)
    w1 = jnp.clip(iz - iz0, 0.0, 1.0)
    iota = jnp.arange(D, dtype=line.dtype)
    M = (jnp.where(iota == iz0[..., None], 1.0 - w1[..., None], 0.0)
         + jnp.where(iota == iz0[..., None] + 1.0, w1[..., None], 0.0))
    return jnp.dot(M, line, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
