"""Prover mesh context: route the ACTUAL proving pipeline over a device mesh.

Usage:
    with prover_mesh(make_mesh(8)):
        proof = create_proof(params, pk, witness, instances, transcript)

While active, the hot O(n) prover stages consult `active_mesh()`:
  * KZG commits (plonk.kzg `_commit_batch` / `commit_many*`) run the
    per-column MSM through `msm_sharded` — local Pippenger per device +
    all-gathered partials;
  * the quotient pipeline's batched NTT conversions (plonk.prover) pin row
    shardings on their inputs so XLA's SPMD partitioner places the
    cross-device butterfly exchanges (collective permutes over ICI).

All arithmetic is exact modular math, so the sharded proof is BYTE-IDENTICAL
to the single-device proof — asserted by `tests/test_parallel.py::
test_sharded_proof_bytes_match` and by `__graft_entry__.dryrun_multichip`,
both of which run `create_proof` inside `prover_mesh` on the virtual CPU
mesh and compare against the single-device proof bytes.
The reference's analog is rayon's thread-count-invariant `best_multiexp`/
`best_fft` [dep Cargo.lock:1320]; the mesh axis replaces the thread pool.

The active mesh is tracked in a `contextvars.ContextVar`, so concurrent
provers in different threads/tasks each see their own mesh.
"""
from __future__ import annotations

import contextvars
from contextlib import contextmanager

_ACTIVE: contextvars.ContextVar[tuple | None] = contextvars.ContextVar(
    "h2t_prover_mesh", default=None)


@contextmanager
def prover_mesh(mesh, axis: str = "d"):
    """Activate `mesh` for every create_proof/commit inside the block."""
    token = _ACTIVE.set((mesh, axis))
    try:
        yield mesh
    finally:
        _ACTIVE.reset(token)


def active_mesh():
    """-> (mesh, axis) or (None, None)."""
    cur = _ACTIVE.get()
    if cur is not None:
        return cur
    return None, None
