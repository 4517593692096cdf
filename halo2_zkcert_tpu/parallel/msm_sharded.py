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
from jax.experimental.shard_map import shard_map

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

        def body(i, a):
            p = (allp[i, 0], allp[i, 1], allp[i, 2])
            return curve.add(a, p)

        out = jax.lax.fori_loop(0, allp.shape[0], body, curve.identity(()))
        return jnp.stack(out)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis), P(axis)),
                   out_specs=P())   # replicated result
    res = fn(points_affine, scalars)
    return (res[0], res[1], res[2])


def msm_sharded_affine(points_affine, scalars, mesh, axis: str = "d"):
    acc = msm_sharded(points_affine, scalars, mesh, axis)
    batched = tuple(c[None] for c in acc)
    return curve.to_affine(batched)[0]
