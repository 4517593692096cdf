"""Device-sharded NTT via XLA SPMD partitioning.

The radix-2 butterfly network is expressed once (ops.ntt) as a pure array
program; here we only pin the data sharding (rows split over the mesh) and
let the SPMD partitioner place the cross-device exchanges for the stages
whose butterfly partners live on other devices (all-to-all / collective
permutes over ICI).  This is the scaling-book recipe — annotate, don't
hand-schedule.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import ntt


def ntt_sharded(a: jnp.ndarray, k: int, mesh: Mesh, axis: str = "d",
                inverse: bool = False) -> jnp.ndarray:
    """a: (2^k, NL) sharded (or shardable) on rows; result sharded on rows."""
    shard = NamedSharding(mesh, P(axis))
    a = jax.device_put(a, shard)
    fn = ntt.intt if inverse else ntt.ntt

    @partial(jax.jit, out_shardings=shard)
    def run(x):
        return fn(x, k)

    return run(a)
