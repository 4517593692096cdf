"""First MULTI-PROCESS run of the framework (VERDICT r4 item 7).

Two OS processes, each owning 4 virtual CPU devices, join one 8-device
mesh via `jax.distributed.initialize` (Gloo collectives over localhost —
the DCN stand-in; on real pods the same program rides ICI/DCN).  Both
processes execute the same SPMD host program:

  1. sharded-MSM commitment step (`parallel.msm_sharded`): per-process
     local Pippenger partials, cross-process all-gather, identical
     replicated accumulator on every process — checked against the
     host oracle;
  2. the FULL toy-circuit `create_proof` inside `prover_mesh(mesh)` —
     the same byte-identity contract the single-process virtual mesh
     asserts (tests/test_parallel.py): the 2-process proof must equal
     the committed single-device proof bytes.

Reference analog: none — the reference is single-process shared-memory
rayon (SURVEY.md §2c); this is the `jax.distributed` path BASELINE.md's
north star asks for.

Usage:  python tools/multiprocess_prove.py            # spawns both ranks
        python tools/multiprocess_prove.py --rank N   # one rank (internal)
"""
import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COORD = "127.0.0.1:9921"
NPROC = 2
LOCAL_DEVS = 4


def run_rank(rank: int) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVS}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=COORD,
                               num_processes=NPROC, process_id=rank)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from __graft_entry__ import _example_data
    from halo2_zkcert_tpu.ops import limbs
    from halo2_zkcert_tpu.parallel import msm_sharded_affine, prover_mesh
    from halo2_zkcert_tpu.utils import refcrypto as rc

    devs = jax.devices()
    assert len(devs) == NPROC * LOCAL_DEVS, devs
    mesh = Mesh(np.asarray(devs).reshape(-1), ("d",))
    log = (lambda m: print(f"[rank {rank}] {m}", flush=True))
    log(f"{len(devs)} global devices over {NPROC} processes")

    # -- 1: sharded MSM across processes vs host oracle -----------------
    k = 10
    points, scalars = _example_data(k)
    pts_host, scal_host = np.asarray(points), np.asarray(scalars)
    points = jax.device_put(points, NamedSharding(mesh, P("d", None, None)))
    scalars = jax.device_put(scalars, NamedSharding(mesh, P("d")))
    acc = msm_sharded_affine(points, scalars, mesh)
    got = tuple(np.asarray(c) for c in acc)      # replicated -> addressable
    ex, ey = rc.g1_msm(
        [(int(limbs.limbs_to_int(pts_host[i, 0])),
          int(limbs.limbs_to_int(pts_host[i, 1]))) for i in range(1 << k)],
        [int(limbs.limbs_to_int(scal_host[i])) % rc.FR
         for i in range(1 << k)])
    gx = int(limbs.limbs_to_int(got[0])) % rc.FQ
    gy = int(limbs.limbs_to_int(got[1])) % rc.FQ
    assert (gx, gy) == (ex, ey), "cross-process MSM != host oracle"
    log("sharded MSM over 2 processes == host oracle")

    # -- 2: full toy create_proof on the 2-process mesh -----------------
    from halo2_zkcert_tpu.ops.field import Fr
    from halo2_zkcert_tpu.plonk import (ADVICE, INSTANCE, CircuitData,
                                        Column, ConstraintSystem,
                                        create_proof, keygen, setup,
                                        verify_proof)
    from halo2_zkcert_tpu.transcript import PoseidonTranscript

    K = 6
    N = 1 << K
    cs = ConstraintSystem()
    q = cs.fixed_column()
    tbl = cs.fixed_column()
    a = cs.advice_column()
    b = cs.advice_column()
    c = cs.advice_column()
    pi = cs.instance_column()
    cs.create_gate("mul_add", q * (a * b + a - c))
    cs.add_lookup("a_in_table", [(a, tbl)])
    for col in (Column(ADVICE, a.index), Column(ADVICE, b.index),
                Column(ADVICE, c.index), Column(INSTANCE, pi.index)):
        cs.enable_permutation(col)
    fixed = np.array([[1 if i < 32 else 0 for i in range(N)],
                      [i % 16 for i in range(N)]], dtype=object)
    a_vals = [i % 16 for i in range(N)]
    b_vals = [(i * 3) % 16 for i in range(N)]
    b_vals[7] = a_vals[2]
    c_vals = [(a_vals[i] * b_vals[i] + a_vals[i]) % rc.FR for i in range(N)]
    data = CircuitData(
        cs=cs, k=K, fixed=fixed,
        copies=[((ADVICE, c.index, 1), (INSTANCE, pi.index, 0)),
                ((ADVICE, a.index, 2), (ADVICE, b.index, 7))],
        num_instance=[1])
    advice = jnp.stack([Fr.from_ints(v) for v in (a_vals, b_vals, c_vals)])
    instances = [[c_vals[1]]]
    params = setup(K)
    pk = keygen(params, data)
    single = create_proof(params, pk, advice, instances,
                          PoseidonTranscript())
    log(f"single-process proof: {len(single)} bytes")
    with prover_mesh(mesh):
        multi = create_proof(params, pk, advice, instances,
                             PoseidonTranscript())
    assert multi == single, "2-process proof bytes differ from single!"
    assert verify_proof(params, pk.vk, instances, multi, PoseidonTranscript)
    log("2-process sharded proof is BYTE-IDENTICAL to single-process "
        "and verifies")
    print(f"RANK{rank}_OK", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=None)
    args = ap.parse_args()
    if args.rank is not None:
        run_rank(args.rank)
        return
    t0 = time.time()
    logs = [f"/tmp/h2t_mp_rank{r}.log" for r in range(NPROC)]
    procs = []
    for r in range(NPROC):
        f = open(logs[r], "w")          # stream: survives a timeout kill
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--rank", str(r)],
            stdout=f, stderr=subprocess.STDOUT, text=True))
    outs = []
    for r, p in enumerate(procs):
        p.wait()
        with open(logs[r]) as f:
            outs.append(f.read())
    ok = all(p.returncode == 0 for p in procs) and \
        all(f"RANK{r}_OK" in outs[r] for r in range(NPROC))
    for r, o in enumerate(outs):
        for line in o.splitlines():
            if "[Gloo]" not in line and "WARNING" not in line:
                print(line)
    print(f"multiprocess_prove: {'OK' if ok else 'FAILED'} "
          f"in {time.time() - t0:.1f}s")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
