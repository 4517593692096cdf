"""Sharded-prover scaling measurement on the virtual CPU mesh.

Groundwork for the BASELINE.md north star (>=70% weak-scaling at agg k=22
across hosts): runs the SAME fixed workload — the sharded MSM + sharded
NTT/quotient step from `__graft_entry__.dryrun_multichip` — at 1/2/4/8
virtual devices and reports parallel efficiency.  On a virtual CPU mesh
all "devices" share one socket, so absolute times mean little; the value
is (a) the collectives compile+execute at every width and (b) the
efficiency trend as the collective/compute ratio grows.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
       python tools/weak_scaling.py [--k 14]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if len(jax.devices()) < 8:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/h2t_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=14,
                    help="rows per WORKLOAD (fixed across widths: weak "
                         "scaling over a shared-socket mesh measures "
                         "overhead, so the TOTAL work stays constant)")
    ap.add_argument("--widths", default="1,2,4,8")
    args = ap.parse_args()

    from __graft_entry__ import _example_data
    from halo2_zkcert_tpu.ops import frops, ntt
    from halo2_zkcert_tpu.parallel import make_mesh, msm_sharded

    k = args.k
    points, scalars = _example_data(k)
    results = {}
    for w in [int(x) for x in args.widths.split(",")]:
        mesh = make_mesh(w)
        shard = NamedSharding(mesh, P("d"))
        pts = jax.device_put(points, NamedSharding(mesh, P("d", None, None)))
        scl = jax.device_put(scalars, shard)

        def msm_step():
            acc = msm_sharded(pts, scl, mesh)
            jax.block_until_ready(acc[0])

        @jax.jit
        def poly_step(x):
            c = ntt.intt(x, k)
            v = ntt.coset_ntt(c, k, 7)
            v = frops.mul(v, v)
            return ntt.coset_intt(v, k, 7)

        pfn = jax.jit(poly_step, in_shardings=shard, out_shardings=shard)

        def ntt_step():
            jax.block_until_ready(pfn(scl))

        for fn in (msm_step, ntt_step):
            fn()                                  # compile
        t = {}
        for name, fn in (("msm", msm_step), ("ntt", ntt_step)):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            t[name] = best
        results[w] = t
        print(f"devices={w}: msm {t['msm']*1000:.0f} ms, "
              f"ntt {t['ntt']*1000:.0f} ms", flush=True)

    base = results[min(results)]
    table = {}
    for w, t in results.items():
        # fixed total work: ideal sharded time = t1 (shared socket), so
        # efficiency here is overhead ratio t1/tw (≈1.0 = collectives free)
        table[w] = {name: round(base[name] / t[name], 3) for name in t}
    print(json.dumps({"k": k, "times_s": {str(w): results[w]
                                          for w in results},
                      "efficiency_vs_1dev": {str(w): table[w]
                                             for w in table}}))


if __name__ == "__main__":
    main()
