"""Per-step FLOP/byte/gather-row accounting -> MFU + HBM utilization.

The reference publishes no throughput or utilization numbers (BASELINE.md);
its hot loops are the secondary visibility march (relight_utils.py:777-834)
and the primary field forward (tensorBase_rotated_lights.py:868-1036). This
module grounds bench.py's rays/s in hardware terms three ways:

1. **XLA compiled cost analysis** (`compiled_cost`): flops / bytes accessed
   of the exact program executed, post-fusion, straight from
   `jitted.lower(...).compile().cost_analysis()`. No hand model can be more
   honest about what the chip was asked to do.
2. **Chip peaks** (`device_peaks`): per-`device_kind` peak bf16 matmul
   FLOP/s and HBM bandwidth (public TPU specs), giving
   `mfu = flops / (t * peak_flops)` and
   `hbm_util = bytes / (t * peak_bw)`.
3. **Analytic gather-row model** (`gather_rows_per_step`): this workload is
   gather/scatter ROW-COUNT bound, not FLOP or bandwidth bound (measured:
   XLA TPU gathers plateau at ~84M rows/s regardless of row width;
   scatter-add at ~11-20M rows/s — CLAUDE.md). The row model, built from
   the same static knobs bench.py passes to the step, predicts step time as
   sum(rows / measured_rate) and yields `row_budget_util` = predicted /
   measured step time — the "speed-of-light" fraction for THIS design on
   THIS chip. MFU is reported for completeness but a volumetric
   inverse-renderer is not a matmul workload; row_budget_util is the honest
   utilization headline.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

# Public per-chip peaks: device_kind substring -> (bf16 FLOP/s, HBM B/s).
# Sources: cloud.google.com/tpu/docs system-architecture tables (v4/v5e/
# v5p/v6e); values are per chip.
TPU_PEAKS = {
    # order matters: first substring match wins (most specific first)
    "v6e": (918e12, 1640e9),
    "v6": (918e12, 1640e9),
    "v5p": (459e12, 2765e9),
    "v5litepod": (197e12, 819e9),
    "v5lite": (197e12, 819e9),   # v5e reports device_kind "TPU v5 lite"
    "v5e": (197e12, 819e9),
    "v4": (275e12, 1228e9),
}
DEFAULT_PEAKS = ("v5e (assumed)", 197e12, 819e9)

# Measured XLA row rates on 1x v5e through the axon tunnel (CLAUDE.md,
# scalar-synced isolated ablations, round 1-2). Rows/s, width-independent,
# but table-SIZE dependent: ~84M rows/s for small tables, ~71M at a ~33MB
# coarse bake (field.py:_bake_masked_dense measurement note), ~46M at a
# 127MB table.
GATHER_ROWS_PER_S = 84e6          # small tables (<~20MB)
# microbench anchors for mid/large tables, retained as recorded
# measurements (the in-step march term is priced by the trace-measured
# rate below, which beat these wide-row plateaus on narrow bf16 rows)
GATHER_ROWS_PER_S_MID = 71e6     # ~20-100MB tables (128^3 bf16 bake)
GATHER_ROWS_PER_S_BIG = 46e6     # >~100MB tables
SCATTER_ROWS_PER_S = 15e6        # add-scatter VJP, mid of 11-20M band
# In-step XProf SELF-time measurement (r3, log/trace_r3 via
# scripts/analyze_trace.py): the window-march gathers on the corner-packed
# bf16 sigma bake run at ~250M rows/s — narrow bf16 rows beat the
# wide-row microbench plateau above. Used for the march term; the
# microbench anchors stay for the wide-row paths.
MARCH_GATHER_ROWS_PER_S = 250e6


def device_peaks(device) -> Tuple[str, float, float]:
    """(label, peak_bf16_flops, peak_hbm_bytes_per_s) for a jax device."""
    kind = (getattr(device, "device_kind", "") or "").lower()
    for key, (fl, bw) in TPU_PEAKS.items():
        if key in kind.replace(" ", "").replace("-", ""):
            return kind, fl, bw
    return DEFAULT_PEAKS


def compiled_cost(jitted_fn, *args, **kwargs) -> Optional[Dict[str, float]]:
    """flops / bytes-accessed of the compiled executable, or None.

    Uses AOT lower+compile on the already-jitted fn (hits the compile
    cache when the same signature was already traced). Returns None when
    the backend does not expose a cost analysis (some plugin backends).
    """
    try:
        analysis = jitted_fn.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        if not analysis:
            return None
        return {
            "flops": float(analysis.get("flops", 0.0)),
            "bytes_accessed": float(analysis.get("bytes accessed", 0.0)),
        }
    except Exception:
        return None


@dataclass(frozen=True)
class StepRows:
    """Analytic gather/scatter row counts for one training step."""
    gather_rows: float           # small-table gather rows (fwd, no-grad ok)
    window_rows: float           # fine-march rows on the big baked table
    window_table_bytes: float    # size of the baked sigma table (reported
    # for context; the march term is priced at the trace-measured
    # MARCH_GATHER_ROWS_PER_S, which was rate-insensitive to this size)
    scatter_rows: float          # VJP scatter-add rows (differentiable path)
    breakdown: Dict[str, float]

    def predicted_step_s(self) -> float:
        return (self.gather_rows / GATHER_ROWS_PER_S
                + self.window_rows / MARCH_GATHER_ROWS_PER_S
                + self.scatter_rows / SCATTER_ROWS_PER_S)


def gather_rows_per_step(
    *,
    batch: int,
    n_samples: int,
    march_cap: int,
    march_group: int,
    app_cap: int,
    relight_cap: int,
    n_dirs: int,
    compact_frac: float,
    tile: int,
    window: int,
    prepass_n: int,
    second_app_cap: int = 16,
    app_pair_frac: float = 0.0,
    app_bake: bool = True,
    bake_reso: int = 128,
    bake_bytes_per_val: int = 2,   # the packed sigma bake is bf16
) -> StepRows:
    """Dominant gather/scatter row counts of one train step.

    Mirrors the static-shape design (render/primary.py, render/secondary.py):
    every term below is a take()/take_along_axis row count (row WIDTH is
    free on TPU — CLAUDE.md measurements), split by whether its VJP needs a
    scatter-add (differentiable primary path) or not (the stop_gradient'ed
    secondary pass and occupancy masks).
    """
    g = max(march_group, 1)
    b = {}

    # --- primary (differentiable) ---
    culled = 0 < march_cap < n_samples
    cap_eff = march_cap if culled else n_samples
    if culled:
        # occupancy-mask nearest test, dense over the march (no-grad)
        b["primary_mask_march"] = batch * n_samples
    else:  # dense march: no selection pass, but the trilinear mask is dense
        b["primary_mask_march"] = 0
    # density factors on the (possibly culled) samples: 3 packed plane rows
    # per sample (grouped: one 16-corner block row per group of g)
    prim_density = batch * (cap_eff // g) * 3
    b["primary_density_fwd"] = prim_density
    # trilinear alpha-mask check on the marched samples (no-grad)
    b["primary_mask_exact"] = batch * cap_eff
    # appearance + intrinsic + jittered intrinsic on app_cap samples:
    # 3 plane rows each for rad / intr / intr_jittered
    prim_app = batch * app_cap * 3 * 3
    b["primary_app_fwd"] = prim_app
    # VJP: one scatter-add row per differentiable gather row
    scatter = prim_density + prim_app
    b["primary_vjp_scatter"] = scatter

    # --- secondary (stop_gradient) ---
    total_pairs = relight_cap * n_dirs
    if 0.0 < compact_frac < 1.0:
        marched = -(-int(total_pairs * compact_frac) // tile) * tile
        pair_cap = tile // 2
    else:
        marched = total_pairs
        pair_cap = tile // 4
    if app_pair_frac > 0.0:
        # explicit per-tile app pair cap (secondary.py app stage;
        # the r3/r4 acap row cut)
        pair_cap = int(tile * app_pair_frac)
    n_tiles = -(-marched // tile)
    b["secondary_prepass"] = marched * prepass_n
    b["secondary_window_march"] = marched * window
    app_pairs = n_tiles * pair_cap
    b["secondary_app"] = app_pairs * second_app_cap * (1 if app_bake else 3)

    # the window march gathers from the corner-packed sigma bake — a table
    # big enough ((reso-1)^3 x 8 values) to sit in the measured mid/big-
    # table gather-rate regime; everything else reads small tables
    window_rows = float(b["secondary_window_march"])
    table_bytes = float((bake_reso - 1) ** 3 * 8 * bake_bytes_per_val)
    small = (b["primary_mask_march"] + b["primary_mask_exact"]
             + b["secondary_prepass"] + b["secondary_app"]
             + prim_density + prim_app)
    return StepRows(gather_rows=float(small),
                    window_rows=window_rows,
                    window_table_bytes=table_bytes,
                    scatter_rows=float(scatter),
                    breakdown={k: float(v) for k, v in b.items()})


def utilization(flops: Optional[float], bytes_accessed: Optional[float],
                step_s: float, device) -> Dict[str, float]:
    """mfu / hbm_util for a measured step time on a given device."""
    label, peak_fl, peak_bw = device_peaks(device)
    out = {"chip": label, "peak_bf16_flops": peak_fl, "peak_hbm_Bps": peak_bw}
    if flops is not None and step_s > 0:
        out["flops_per_step"] = flops
        out["mfu"] = flops / (step_s * peak_fl)
    if bytes_accessed is not None and step_s > 0:
        out["bytes_per_step"] = bytes_accessed
        out["hbm_util"] = bytes_accessed / (step_s * peak_bw)
    return out
