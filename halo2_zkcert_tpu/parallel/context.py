"""Prover mesh context: route the ACTUAL proving pipeline over a device mesh.

Usage:
    with prover_mesh(make_mesh(8)):
        proof = create_proof(params, pk, witness, instances, transcript)

While active, the hot O(n) prover stages consult `active_mesh()`:
  * KZG commits (plonk.kzg._commit_batch) run the per-column MSM through
    `msm_sharded` — local Pippenger per device + all-gathered partials;
  * the quotient pipeline's batched NTT conversions (plonk.prover) pin row
    shardings on their inputs so XLA's SPMD partitioner places the
    cross-device butterfly exchanges (collective permutes over ICI).

All arithmetic is exact modular math, so the sharded proof is BYTE-IDENTICAL
to the single-device proof (asserted by __graft_entry__.dryrun_multichip).
The reference's analog is rayon's thread-count-invariant `best_multiexp`/
`best_fft` [dep Cargo.lock:1320]; the mesh axis replaces the thread pool.
"""
from __future__ import annotations

from contextlib import contextmanager

_ACTIVE: list = []


@contextmanager
def prover_mesh(mesh, axis: str = "d"):
    """Activate `mesh` for every create_proof/commit inside the block."""
    _ACTIVE.append((mesh, axis))
    try:
        yield mesh
    finally:
        _ACTIVE.pop()


def active_mesh():
    """-> (mesh, axis) or (None, None)."""
    if _ACTIVE:
        return _ACTIVE[-1]
    return None, None
