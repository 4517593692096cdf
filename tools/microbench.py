"""Microbenchmarks for the prover's hot primitives on the live backend.

Usage: python tools/microbench.py [rtt] [scan] [msm] [ntt] [gp]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/h2t_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import jax.numpy as jnp
import numpy as np


def t(fn, *args, reps=3, fetch=lambda r: np.asarray(r)[..., :1]):
    fetch(fn(*args))                       # warm/compile
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_rtt():
    x = jnp.ones((8, 128))
    f = jax.jit(lambda x: x + 1)
    print(f"rtt tiny-op+fetch: {t(f, x, reps=10)*1000:.1f} ms", flush=True)
    y = jnp.ones((1 << 17, 33), jnp.int32)
    g = jax.jit(lambda y: y * 2)
    print(f"17MB op+fetch: {t(g, y, reps=3)*1000:.1f} ms", flush=True)
    h = jax.jit(lambda y: (y * 2).sum())
    dt = t(h, y, reps=3, fetch=lambda r: np.asarray(r))
    print(f"17MB op, scalar fetch: {dt*1000:.1f} ms", flush=True)


def bench_scan():
    from halo2_zkcert_tpu.ops import frops, scan as scanmod
    from halo2_zkcert_tpu.ops import limbs
    rng = np.random.default_rng(0)
    for k in (16, 17):
        a = jnp.asarray(rng.integers(0, 255, size=(1 << k, limbs.NLIMBS),
                                     dtype=np.int32))
        dt = t(frops.prefix_product, a)
        print(f"prefix_product 2^{k} (grid): {dt*1000:.1f} ms", flush=True)
        ks = jax.jit(lambda x: scanmod._ks_scan(
            frops._mul1, frops._one1, (x,))[0])
        dt = t(ks, a)
        print(f"prefix_product 2^{k} (KS):   {dt*1000:.1f} ms", flush=True)
        dt = t(frops.batch_inv, a)
        print(f"batch_inv 2^{k}:            {dt*1000:.1f} ms", flush=True)
        b = jnp.asarray(rng.integers(0, 255, size=(3, 1 << k, limbs.NLIMBS),
                                     dtype=np.int32))
        dt = t(frops.prefix_product_batched, b)
        print(f"prefix_product_batched 3x2^{k}: {dt*1000:.1f} ms", flush=True)


def bench_msm():
    from halo2_zkcert_tpu.ops import limbs, msm_fb
    from halo2_zkcert_tpu.plonk import gen_srs
    params = gen_srs(17)
    fb = params.fixed_base(lagrange=True)
    rng = np.random.default_rng(1)
    col = jnp.asarray(rng.integers(0, 256, size=(1, 1 << 17, limbs.NLIMBS),
                                   dtype=np.int32))
    col2 = jnp.asarray(rng.integers(0, 256, size=(2, 1 << 17, limbs.NLIMBS),
                                    dtype=np.int32))
    dt = t(fb.msm_many, col, fetch=lambda r: np.asarray(r[0, 0, :1]))
    print(f"fb msm 1 col 2^17: {dt*1000:.1f} ms", flush=True)
    dt = t(fb.msm_many, col2, fetch=lambda r: np.asarray(r[0, 0, :1]))
    print(f"fb msm 2 cols 2^17: {dt*1000:.1f} ms", flush=True)

    # substages for one group of 2
    wbits = fb.wbits
    grp = col2
    d_fn = jax.jit(lambda g: msm_fb._digits(
        g.reshape(2 * fb.n, limbs.NLIMBS), wbits).reshape(
            2, fb.n, fb.nwin).transpose(0, 2, 1).reshape(2, -1))
    dt = t(d_fn, grp, fetch=lambda r: np.asarray(r[:, :1]))
    print(f"  digits: {dt*1000:.1f} ms", flush=True)
    d = d_fn(grp)
    rows = fb._rows_full()

    dt = t(lambda dd: msm_fb._buckets_cols(fb.table_flat, dd, rows, wbits),
           d, fetch=lambda r: np.asarray(r[0][0, 0, :1]))
    print(f"  buckets(sort+gather+scan+extract): {dt*1000:.1f} ms",
          flush=True)
    buckets = msm_fb._buckets_cols(fb.table_flat, d, rows, wbits)
    dt = t(lambda b: msm_fb._combine_buckets_cols(b, wbits), buckets,
           fetch=lambda r: np.asarray(r[0, 0, :1]))
    print(f"  combine: {dt*1000:.1f} ms", flush=True)

    # sort alone
    G, total = d.shape
    Bc = max(total // msm_fb.CHUNK, 1)
    chunk = total // Bc
    srt = jax.jit(lambda dd: jnp.argsort(dd.reshape(G * Bc, chunk), axis=1))
    dt = t(srt, d, fetch=lambda r: np.asarray(r[:, :1]))
    print(f"  argsort {G*Bc}x{chunk}: {dt*1000:.1f} ms", flush=True)
    order = srt(d)
    rows_b = jnp.broadcast_to(rows, (G, total)).reshape(G * Bc, chunk)
    gat = jax.jit(lambda o: fb.table_flat[
        jnp.take_along_axis(rows_b, o, axis=1)].astype(jnp.int32))
    dt = t(gat, order, fetch=lambda r: np.asarray(r[0, :1, 0, :1]))
    print(f"  gather points: {dt*1000:.1f} ms", flush=True)
    pts_s = gat(order)
    import functools
    from halo2_zkcert_tpu.ops import scan as scanmod, curve
    def scan_only(pts):
        x, y = pts[..., 0, :], pts[..., 1, :]
        one = jnp.zeros_like(x).at[..., 0].set(1)
        local, off, C = scanmod.prefix_scan_batched_local(
            curve.add, lambda: curve.identity((1,)), (x, y, one),
            combine_first=lambda p, c: curve.add_mixed(p, (c[0], c[1])))
        return local[0]
    dt = t(jax.jit(scan_only), pts_s, fetch=lambda r: np.asarray(r[0, :1, :1]))
    print(f"  scan only: {dt*1000:.1f} ms", flush=True)

    # bounded-column commit (V-style 16-bit)
    dt = t(lambda c: fb.msm_many_bounded(c, 16, (1 << 17) - 30), col,
           fetch=lambda r: np.asarray(r[0, 0, :1]))
    print(f"fb msm bounded(16b) 1 col: {dt*1000:.1f} ms", flush=True)


def bench_ntt():
    from halo2_zkcert_tpu.ops import limbs, ntt, ntt_mxu
    rng = np.random.default_rng(2)
    for k, m in ((17, 8), (19, 8)):
        a = jnp.asarray(rng.integers(0, 256, size=(1 << k, m, limbs.NLIMBS),
                                     dtype=np.int32))
        tf = lambda r: np.asarray(r[:1, :1, :1])
        dt = t(lambda x: ntt_mxu.ntt(x, k), a, fetch=tf)
        print(f"ntt_mxu 2^{k} x{m}: {dt*1000:.1f} ms", flush=True)
        dt = t(lambda x: ntt.ntt(x, k), a, fetch=tf)   # via _mxu_wanted
        print(f"ntt(dispatch) 2^{k} x{m}: {dt*1000:.1f} ms", flush=True)
        f = jax.jit(lambda x: ntt._ntt_impl(
            x, *ntt._device_tables(k, False), k, False))
        dt = t(f, a, fetch=tf)
        print(f"ntt radix2(jit) 2^{k} x{m}: {dt*1000:.1f} ms", flush=True)


def bench_gp():
    """Grand-product build: per-column vs batched (miscompile probe)."""
    from halo2_zkcert_tpu.ops import frops, limbs
    NL = limbs.NLIMBS
    rng = np.random.default_rng(3)
    n, m = 1 << 17, 3
    nums = jnp.asarray(rng.integers(0, 255, size=(m, n, NL), dtype=np.int32))
    dens = jnp.asarray(rng.integers(1, 255, size=(m, n, NL), dtype=np.int32))

    def percol(nums, dens):
        one_row = jnp.zeros((1, NL), jnp.int32).at[0, 0].set(1)
        outs = []
        for i in range(m):
            ratio = frops.mul(nums[i], frops.batch_inv(dens[i]))
            sh = jnp.concatenate([one_row, ratio[:-1]], axis=0)
            outs.append(frops.prefix_product(sh))
        return jnp.stack(outs)

    def batched(nums, dens):
        den_inv = frops.batch_inv(dens.reshape(m * n, NL)).reshape(m, n, NL)
        ratios = frops.mul(nums, den_inv)
        ones = jnp.zeros((m, 1, NL), jnp.int32).at[:, 0, 0].set(1)
        shifted = jnp.concatenate([ones, ratios[:, :-1]], axis=1)
        return frops.prefix_product_batched(shifted)

    dt = t(percol, nums, dens, fetch=lambda r: np.asarray(r[0, :1]))
    print(f"grand-products per-col (m=3, 2^17): {dt*1000:.1f} ms", flush=True)
    dt = t(batched, nums, dens, fetch=lambda r: np.asarray(r[0, :1]))
    print(f"grand-products batched (m=3, 2^17): {dt*1000:.1f} ms", flush=True)
    # correctness cross-check (the round-2 miscompile detector)
    a = np.asarray(percol(nums, dens))
    b = np.asarray(batched(nums, dens))
    from halo2_zkcert_tpu.utils import refcrypto as rc
    bad = 0
    for i in range(m):
        for r in range(0, n, 7919):
            va = limbs.limbs_to_int(a[i, r]) % rc.FR
            vb = limbs.limbs_to_int(b[i, r]) % rc.FR
            if va != vb:
                bad += 1
    print(f"batched-vs-percol mismatches (sampled): {bad}", flush=True)





def bench_gather():
    """Point-table gather layouts: the bucket pipeline gathers 4.4M rows of
    66 contiguous bytes (267 ms measured ~ 1 GB/s effective). Probe
    whether row padding / dtype changes the gather's lowering."""
    rng = np.random.default_rng(9)
    T = 17 * (1 << 17)
    n = 1 << 20                          # gathered rows per call
    idx = jnp.asarray(rng.integers(0, T, size=(n,), dtype=np.int32))
    tf = lambda r: np.asarray(r[:1, :1])
    for tag, tbl in (
        ("u8 (T,66)", jnp.asarray(rng.integers(0, 255, (T, 66), np.uint8),
                                  dtype=jnp.uint8)),
        ("u8 (T,128)pad", jnp.asarray(
            rng.integers(0, 255, (T, 128), np.uint8), dtype=jnp.uint8)),
        ("i32 (T,66)", jnp.asarray(rng.integers(0, 255, (T, 66), np.int32))),
        ("i32 (T,72)pad", jnp.asarray(
            rng.integers(0, 255, (T, 72), np.int32))),
    ):
        g1 = jax.jit(lambda t, i: t[i])
        dt = t(g1, tbl, idx, fetch=tf)
        print(f"gather {tag} [idx]: {dt*1000:.1f} ms "
              f"({tbl[0].nbytes * n / dt / 1e9:.1f} GB/s)", flush=True)
        g2 = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        dt = t(g2, tbl, idx, fetch=tf)
        print(f"gather {tag} take : {dt*1000:.1f} ms", flush=True)
    # gather fused into a consumer (sum) — does fusion change lowering?
    tbl = jnp.asarray(rng.integers(0, 255, (T, 66), np.uint8),
                      dtype=jnp.uint8)
    g3 = jax.jit(lambda t, i: t[i].astype(jnp.int32).sum(axis=0))
    dt = t(g3, tbl, idx, fetch=lambda r: np.asarray(r[:1]))
    print(f"gather u8(T,66) + consume: {dt*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["rtt", "scan", "msm", "ntt", "gp"]
    for name in which:
        print(f"--- {name} ---", flush=True)
        globals()[f"bench_{name}"]()
