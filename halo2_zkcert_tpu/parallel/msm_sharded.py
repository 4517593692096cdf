"""Device-sharded Pippenger MSM.

Reference behavior: halo2_proofs `best_multiexp` splits scalars across CPU
cores and adds the partial results [dep Cargo.lock:1320].  TPU-native: the
point/scalar axis is sharded over the mesh; each device computes its full
local MSM (buckets + windows + Horner on-chip, zero communication), then the
D per-device Jacobian partials are all-gathered (3*NLIMBS ints each) and
folded.  Communication: O(D) — independent of n.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import curve, limbs, msm


def msm_sharded(points_affine: jnp.ndarray, scalars: jnp.ndarray,
                mesh: Mesh, axis: str = "d"):
    """points (N, 2, NL), scalars (N, W); N divisible by mesh size.

    Returns the Jacobian result replicated on all devices.
    """

    def local(points, scalars):
        acc = msm.msm_jacobian(points, scalars)          # tuple of (NL,)
        stacked = jnp.stack(acc)                         # (3, NL)
        allp = jax.lax.all_gather(stacked, axis)         # (D, 3, NL)
        # rolled scan over the device axis: ONE add body in the compiled
        # program (a static unroll inlines D of them — slow compiles), with
        # the carry init derived from data so it inherits shard_map's
        # varying-axes type (a replicated literal init fails vma typing)
        z = allp[0, 0] * 0
        ident = (z, z.at[..., 0].set(1), z)

        def body(acc, p):
            return curve.add(acc, (p[0], p[1], p[2])), 0

        out, _ = jax.lax.scan(body, ident, allp)
        return jnp.stack(out)

    # check_vma=False: the result IS replicated (every device folds the same
    # all_gathered partials), but the rolled scan's carry defeats shard_map's
    # replication inference (it can prove a static unroll, not a loop carry).
    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis), P(axis)),
                   out_specs=P(), check_vma=False)   # replicated result
    res = fn(points_affine, scalars)
    return (res[0], res[1], res[2])


def msm_sharded_affine(points_affine, scalars, mesh, axis: str = "d"):
    acc = msm_sharded(points_affine, scalars, mesh, axis)
    batched = tuple(c[None] for c in acc)
    return curve.to_affine(batched)[0]
