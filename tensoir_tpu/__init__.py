"""tensoir_tpu — a TPU-native (JAX/XLA) inverse-rendering framework.

The compute path is XLA-native: the workload is gather/scatter row-count
bound (BASELINE.md rooflines), and XLA's in-step scatters already run near
the measured hardware plateau. A validated Pallas scatter-add kernel exists
in the wings (`scripts/bench_pallas_scatter.py`, 99M rows/s microbenched)
should a row-bound stage ever dominate again.

A from-scratch re-design of the capabilities of TensoIR (CVPR 2023,
"Tensorial Inverse Rendering") for TPU hardware:

* VM-decomposed (plane + line) density/appearance tensor fields sampled along
  marched rays, with channels-last layouts that map gathers and the basis
  matmul onto the TPU's memory system and MXU.
* Alpha-composited volume integration, MLP shading for radiance /
  normals / albedo / roughness, and a physically-based relighting path
  (secondary visibility rays + environment-light integral) — all under `jit`
  with static shapes (dense masked compute + fixed-capacity top-k compaction
  instead of the reference's boolean-mask dynamic shapes).
* Multi-chip execution via `jax.sharding.Mesh` + `jit` shardings: ray batches
  (primary and the much larger secondary visibility batches) sharded over the
  data axis, factor tensors and MLPs replicated, gradient psum over ICI.

Reference behavior is documented against Haian-Jin/TensoIR (file:line cites in
docstrings); the implementation is original and TPU-first.
"""

__version__ = "0.1.0"

from tensoir_tpu.config import TensoIRConfig, load_config  # noqa: F401
