"""Multi-chip / multi-host parallel layer (SURVEY.md §2c).

The reference's only parallelism is rayon fork-join on one node [dep
Cargo.lock:2223]; the TPU-native equivalents here are:

* MSM: points/scalars sharded over the device mesh ("dp" axis); each device
  runs local Pippenger bucket accumulation, the per-device partial sums are
  all-gathered (one point each — O(devices) bytes) and tree-reduced.  ICI
  traffic is constant-size regardless of n.
* NTT: expressed as the single-chip program with input/output sharding
  constraints; XLA's SPMD partitioner inserts the all-to-all/collective
  permutes for the cross-device butterfly stages (the scaling-book recipe:
  annotate shardings, let the compiler place collectives).
* Witness/quotient pointwise algebra: embarrassingly row-parallel — plain
  sharding annotations, no manual collectives.
"""
from .context import active_mesh, prover_mesh
from .mesh import default_mesh, make_mesh
from .msm_sharded import msm_sharded, msm_sharded_affine
from .ntt_sharded import ntt_sharded
