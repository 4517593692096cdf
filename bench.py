"""Benchmark entry: prints ONE JSON line for the driver.

Primary metric: RSA k=17 end-to-end proof time (the reference's headline
row: 1.813 s on c6a.48xlarge, BASELINE.md).  `vs_baseline` is the speedup
factor baseline_seconds / our_seconds (>1 = faster than the reference).

Hardening (round-5, after BENCH_r04 rc=124):
  - a watchdog thread guarantees ONE JSON line before `BENCH_BUDGET_S`
    (default 1450 s) no matter where the main thread is stuck (TPU tunnel
    init, a jit compile, keygen) — it prints the best measurement made so
    far and exits;
  - the cheap kernel metric is measured FIRST so a usable fallback exists
    within ~2 min of backend init;
  - the full-prove path reuses the committed `build/rsa_1.pk` (the
    x509 rsa_1 link IS the reference benchmark workload, README.md:48)
    when its cs digest matches, so the driver run pays no keygen.
"""
# persistent per-platform compile cache (compiles are minutes on this host)
import json
import os
import sys
import threading
import time

_T0 = time.time()
_BUDGET = float(os.environ.get("BENCH_BUDGET_S", "1450"))
_STATE = {"fallback": None, "done": False}


def _emit(result):
    _STATE["done"] = True
    print(json.dumps(result), flush=True)


def _watchdog():
    while True:
        left = _BUDGET - (time.time() - _T0)
        if _STATE["done"]:
            return
        if left <= 0:
            break
        time.sleep(min(left, 5.0))
    if _STATE["done"]:
        return
    result = _STATE["fallback"] or {
        "metric": "bench_incomplete", "value": 0.0, "unit": "s",
        "vs_baseline": 0.0,
        "detail": {"reason": "budget exhausted before any measurement "
                             "(TPU init or compile hang)"}}
    result.setdefault("detail", {})["watchdog"] = True
    _STATE["done"] = True
    print(json.dumps(result), flush=True)
    sys.stdout.flush()
    os._exit(0)


threading.Thread(target=_watchdog, daemon=True).start()

import jax as _jax  # noqa: E402  (after watchdog start: import can hang on tunnel)
_jax.config.update("jax_compilation_cache_dir", "/tmp/h2t_jax_cache_tpu")
_jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

REPO = os.path.dirname(os.path.abspath(__file__))


def bench_kernels():
    """MSM(2^17) + NTT(2^17) wall time -> composite ops/s per chip."""
    import numpy as np
    import jax.numpy as jnp
    from halo2_zkcert_tpu.ops import limbs, ntt
    from halo2_zkcert_tpu.plonk.kzg import commit_many_lagrange
    from halo2_zkcert_tpu.plonk import gen_srs

    os.environ.setdefault("PARAMS_DIR", os.path.join(REPO, "params"))
    params = gen_srs(17)
    rng = np.random.default_rng(7)
    col = jnp.asarray(rng.integers(0, 256, size=(1, 1 << 17, limbs.NLIMBS),
                                   dtype=np.int32))
    commit_many_lagrange(params, col)         # warm (compile)
    t1 = time.perf_counter()
    commit_many_lagrange(params, col)
    t_msm = time.perf_counter() - t1
    poly = col[0]
    np.asarray(ntt.ntt(poly, 17))[:1]         # warm
    t1 = time.perf_counter()
    np.asarray(ntt.ntt(poly, 17))[:1]
    t_ntt = time.perf_counter() - t1
    ops = (1 << 17) / t_msm + (1 << 17) / t_ntt
    return {"metric": "msm17_ntt17_ops_per_s", "value": round(ops, 1),
            "unit": "ops/s",
            "vs_baseline": 0.0,
            "detail": {"msm_2e17_s": round(t_msm, 3),
                       "ntt_2e17_s": round(t_ntt, 3)}}, \
           {"msm_2e17_ops_per_s": round((1 << 17) / t_msm, 1),
            "ntt_2e17_ops_per_s": round((1 << 17) / t_ntt, 1),
            "msm_2e17_s": round(t_msm, 3), "ntt_2e17_s": round(t_ntt, 3)}


def bench_rsa_prove(kern_detail):
    """Full RSA k=17 proof (2048-bit link, leaf cert signed by the
    intermediate — the reference's `prove-rsa` benchmark, README.md:46-48)."""
    import hashlib
    from halo2_zkcert_tpu.cert import (extract_public_key,
                                       extract_tbs_and_sig, parse_pem)
    from halo2_zkcert_tpu.circuits.rsa import RsaCircuit
    from halo2_zkcert_tpu.plonk import create_proof, gen_srs, verify_proof
    from halo2_zkcert_tpu.sdk import gen_pk
    from halo2_zkcert_tpu.transcript import PoseidonTranscript

    def load(name):
        with open(os.path.join(REPO, "testdata", name), "rb") as f:
            return parse_pem(f.read())

    inter, leaf = load("example_cert_2.pem"), load("example_cert_3.pem")
    circuit = RsaCircuit(extract_public_key(inter), k=17)
    params = gen_srs(17)
    # primary pk: the committed x509 rsa_1 link pk (exactly this circuit).
    # gen_pk adopts the live cs when digests match; on digest drift it
    # falls back to a tagged cache then fresh keygen (watchdog-protected).
    pk_path = os.path.join(REPO, "build", "rsa_1.pk")
    if not os.path.exists(pk_path + ".npz"):
        pk_path = None
    pk = gen_pk(params, circuit.data, pk_path)
    if pk.vk.cs.digest_bytes() != circuit.data.cs.digest_bytes():
        print("# bench: cached pk digest drift -> fresh keygen",
              file=sys.stderr)
        pk = gen_pk(params, circuit.data, None)
    tbs, sig = extract_tbs_and_sig(leaf)
    digest = hashlib.sha256(tbs).digest()
    witness_fn, instances = circuit.witness(sig, digest)
    # warm-up proof (compiles every kernel)
    proof = create_proof(params, pk, witness_fn, instances,
                         PoseidonTranscript())
    assert verify_proof(params, pk.vk, instances, proof, PoseidonTranscript)
    t0 = time.perf_counter()
    witness_fn, instances = circuit.witness(sig, digest)
    create_proof(params, pk, witness_fn, instances, PoseidonTranscript())
    dt = time.perf_counter() - t0

    from halo2_zkcert_tpu.plonk import prover as _prover
    baseline = 1.813  # c6a.48xlarge, README.md:48
    return {"metric": "rsa_k17_prove_s", "value": round(dt, 3), "unit": "s",
            "vs_baseline": round(baseline / dt, 3),
            "detail": {**kern_detail,
                       "stages_s": dict(_prover.LAST_STAGE_TIMES)}}


def main():
    mode = os.environ.get("BENCH_MODE", "auto")
    kern_detail = {}
    try:
        fallback, kern_detail = bench_kernels()
        _STATE["fallback"] = fallback
    except Exception:
        import traceback
        traceback.print_exc(file=sys.stderr)
    result = None
    if mode in ("auto", "rsa"):
        try:
            result = bench_rsa_prove(kern_detail)
        except Exception as e:  # pragma: no cover
            if mode == "rsa":
                raise
            import traceback
            traceback.print_exc(file=sys.stderr)
            print(f"# rsa bench failed, falling back: {e!r}", file=sys.stderr)
            # drop traceback-pinned device arrays (OOMed the fallback in r2)
            import gc
            sys.last_traceback = None
            e.__traceback__ = None
            gc.collect()
            import jax
            jax.clear_caches()
            gc.collect()
    if result is None:
        result = _STATE["fallback"]
    if result is None:
        result, _ = bench_kernels()
    _emit(result)


if __name__ == "__main__":
    main()
