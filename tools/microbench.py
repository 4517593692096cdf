"""Component microbenchmarks for the prover hot path (one TPU chip).

Usage: python tools/microbench.py [msm|ntt|scan|sort|all]

Every timing fetch-syncs (the axon tunnel's block_until_ready is async —
see tests/conftest.py); first call per shape compiles, so each component
is timed on its second run.
"""
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/h2t_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import jax.numpy as jnp
import numpy as np

from halo2_zkcert_tpu.ops import limbs, msm_fb, ntt
from halo2_zkcert_tpu.ops.field import Fr

NL = limbs.NLIMBS


def sync(x):
    if isinstance(x, tuple):
        x = x[0]
    return np.asarray(x).ravel()[:1]


def timed(name, fn, *args, reps=1):
    fn(*args)  # compile
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"  {name:42s} {dt*1e3:9.1f} ms")
    return dt


def bench_msm(k=17):
    n = 1 << k
    rng = np.random.default_rng(0)
    print(f"MSM components (n=2^{k}, wbits=16, GROUP=2):")
    import os
    d = os.environ.get("PARAMS_DIR", "./params")
    from halo2_zkcert_tpu.plonk.kzg import gen_srs
    params = gen_srs(k)
    fb = params.fixed_base(lagrange=True)
    cols = jnp.asarray(rng.integers(0, 256, size=(2, n, NL), dtype=np.int32))

    G = 2
    d2 = msm_fb._digits(cols.reshape(G * n, NL), fb.wbits)
    timed("digits (2 cols)", lambda c: msm_fb._digits(c, fb.wbits),
          cols.reshape(G * n, NL))
    dd = d2.reshape(G, n, fb.nwin).transpose(0, 2, 1).reshape(G, -1)
    sync(dd)

    total = dd.shape[1]
    Bc = max(total // msm_fb.CHUNK, 1)
    chunk = total // Bc
    dflat = dd.reshape(G * Bc, chunk)

    timed("argsort (G*Bc, chunk)", jax.jit(lambda d: jnp.argsort(d, axis=1)),
          dflat)
    order = jnp.argsort(dflat, axis=1)
    sync(order)

    rows1 = jnp.arange(total, dtype=jnp.int32).reshape(Bc, chunk)
    rows = jnp.tile(rows1, (G, 1))
    idx = jnp.take_along_axis(rows, order, axis=1)
    sync(idx)

    def gather(tf, ix):
        return tf[ix].astype(jnp.int32)

    timed("table gather", jax.jit(gather), fb.table_flat, idx)
    pts = jax.jit(gather)(fb.table_flat, idx)
    sync(pts)

    from halo2_zkcert_tpu.ops import curve, scan as scanmod

    def scan_only(pts):
        x, y = pts[..., 0, :], pts[..., 1, :]
        one = jnp.zeros_like(x).at[..., 0].set(1)
        local, off, C = scanmod.prefix_scan_batched_local(
            curve.add, lambda: curve.identity((1,)), (x, y, one),
            combine_first=lambda p, c: curve.add_mixed(p, (c[0], c[1])))
        return local[0]

    timed("prefix scan (mixed adds)", jax.jit(scan_only), pts)

    timed("full buckets program", lambda t, d: msm_fb._buckets_cols(
        t, d, fb.wbits), fb.table_flat, dd)
    buckets = msm_fb._buckets_cols(fb.table_flat, dd, fb.wbits)
    sync(buckets)
    timed("combine buckets", lambda b: msm_fb._combine_buckets_cols(
        b, fb.wbits), buckets)
    timed("msm_many end-to-end (2 cols)", fb.msm_many, cols)


def bench_fieldops(k=19):
    n = 1 << k
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(0, 256, size=(n, NL), dtype=np.int32))
    b = jnp.asarray(rng.integers(0, 256, size=(n, NL), dtype=np.int32))
    from halo2_zkcert_tpu.ops import pallas_limbs as pl_
    print(f"field ops (batch 2^{k}):")
    timed("fused_mul", lambda x, y: pl_.fused_mul(x, y, limbs_mod()), a, b)
    timed("fused_add", lambda x, y: pl_.fused_add(x, y, limbs_mod()), a, b)
    from halo2_zkcert_tpu.ops import curve
    P = (a, b, jnp.zeros_like(a).at[..., 0].set(1))
    timed("fused point add (proj)", lambda p: curve.add(p, p), P)
    timed("fused point add (mixed)", lambda p: curve.add_mixed(p, (p[0], p[1])), P)


def limbs_mod():
    from halo2_zkcert_tpu.ops.field import FQ
    return FQ.modulus


def bench_ntt():
    rng = np.random.default_rng(2)
    for k, cols in ((17, 8), (19, 8)):
        n = 1 << k
        a = jnp.asarray(rng.integers(0, 256, size=(n, cols, NL),
                                     dtype=np.int32))
        print(f"NTT (2^{k} x {cols} cols):")
        timed("ntt", lambda x: ntt.ntt(x, k), a)
        timed("intt", lambda x: ntt.intt(x, k), a)


def bench_scan(k=17):
    n = 1 << k
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.integers(0, 256, size=(n, NL), dtype=np.int32))
    from halo2_zkcert_tpu.ops import frops
    print(f"Fr scans (2^{k}):")
    timed("prefix_product", frops.prefix_product, a)
    timed("batch_inv", frops.batch_inv, a)
    m = jnp.asarray(rng.integers(0, 256, size=(n, NL), dtype=np.int32))
    timed("affine_scan", frops.affine_scan, m, a)


def bench_sort(k=17):
    n = 1 << k
    rng = np.random.default_rng(4)
    from halo2_zkcert_tpu.ops import frops
    a = jnp.asarray(rng.integers(0, 256, size=(n, NL), dtype=np.int32))
    s = jnp.asarray(rng.integers(0, 2, size=(n, NL), dtype=np.int32))
    print(f"lookup permute (2^{k}):")
    usable = n - 10
    timed("lookup_permute_device",
          lambda x, y: frops.lookup_permute_device(x, y, usable)[0], a, a)


def bench_mxu():
    """Raw MXU throughput: s8xs8->s32 and bf16->f32 matmuls at the
    ntt_mxu.py operand shapes — validates the int8 MXU lowering."""
    rng = np.random.default_rng(0)
    for dt, pe, label in ((jnp.int8, jnp.int32, "s8xs8->s32"),
                          (jnp.bfloat16, jnp.float32, "bf16->f32 ")):
        m, k, n = 8448, 4352, 8192
        a = jnp.asarray(rng.integers(-100, 100, size=(m, k)), dtype=dt)
        b = jnp.asarray(rng.integers(-100, 100, size=(k, n)), dtype=dt)

        @jax.jit
        def mm(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())), preferred_element_type=pe)

        t = timed(f"matmul {label} ({m}x{k}x{n})", mm, a, b)
        print(f"  {'':42s} {2*m*k*n/t/1e12:9.2f} Tops/s")


def bench_ntt_mxu():
    from halo2_zkcert_tpu.ops import ntt_mxu
    rng = np.random.default_rng(2)
    for k, cols in ((17, 8), (19, 8)):
        n = 1 << k
        a = jnp.asarray(rng.integers(0, 256, size=(n, cols, NL),
                                     dtype=np.int32))
        print(f"MXU NTT (2^{k} x {cols} cols):")
        timed("ntt_mxu", lambda x: ntt_mxu.ntt(x, k), a)
        timed("intt_mxu", lambda x: ntt_mxu.intt(x, k), a)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "mxu"):
        bench_mxu()
    if which in ("all", "ntt_mxu"):
        bench_ntt_mxu()
    if which in ("all", "field"):
        bench_fieldops()
    if which in ("all", "msm"):
        bench_msm()
    if which in ("all", "ntt"):
        bench_ntt()
    if which in ("all", "scan"):
        bench_scan()
    if which in ("all", "sort"):
        bench_sort()
