"""Iteration harness for the RSA k=17 headline bench (BASELINE.md).

Caches pk/SRS on disk so repeated runs skip the ~15 min keygen; prints the
same per-stage H2T_PROFILE ticks as create_proof plus wall times for a
warm-up (compile) proof and N timed proofs.

Usage:  python tools/profile_rsa.py [--timed N] [--skip-warm-verify]
"""
import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/h2t_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timed", type=int, default=1)
    ap.add_argument("--skip-warm-verify", action="store_true")
    ap.add_argument("--k", type=int, default=17)
    args = ap.parse_args()

    os.environ.setdefault("H2T_PROFILE", "1")

    from tests.chainutil import generate_chain
    from halo2_zkcert_tpu.cert import extract_tbs_and_sig, parse_pem
    from halo2_zkcert_tpu.circuits.rsa import RsaCircuit
    from halo2_zkcert_tpu.plonk import create_proof, gen_srs, verify_proof
    from halo2_zkcert_tpu.sdk import gen_pk
    from halo2_zkcert_tpu.transcript import PoseidonTranscript

    t0 = time.perf_counter()
    pems = generate_chain()
    inter, leaf = parse_pem(pems[1]), parse_pem(pems[2])
    circuit = RsaCircuit(inter.modulus, k=args.k)
    print(f"[setup] circuit build: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    params = gen_srs(args.k)
    print(f"[setup] srs: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    import hashlib as _hl
    tag = _hl.blake2b(circuit.data.cs.digest_bytes(),
                      digest_size=6).hexdigest()
    pk = gen_pk(params, circuit.data, f"/tmp/h2t_profile_rsa_pk_{tag}")
    print(f"[setup] pk (cached {tag}): {time.perf_counter() - t0:.1f}s",
          flush=True)

    tbs, sig = extract_tbs_and_sig(leaf)
    digest = hashlib.sha256(tbs).digest()

    t0 = time.perf_counter()
    witness_fn, instances = circuit.witness(sig, digest)
    print(f"[setup] witness: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    proof = create_proof(params, pk, witness_fn, instances,
                         PoseidonTranscript())
    print(f"[warm] proof: {time.perf_counter() - t0:.1f}s", flush=True)
    if not args.skip_warm_verify:
        t0 = time.perf_counter()
        ok = verify_proof(params, pk.vk, instances, proof, PoseidonTranscript)
        print(f"[warm] verify: {ok} {time.perf_counter() - t0:.1f}s",
              flush=True)
        assert ok

    for i in range(args.timed):
        t0 = time.perf_counter()
        witness_fn, instances = circuit.witness(sig, digest)
        t_wit = time.perf_counter() - t0
        t0 = time.perf_counter()
        create_proof(params, pk, witness_fn, instances, PoseidonTranscript())
        dt = time.perf_counter() - t0
        print(f"[timed {i}] witness {t_wit:.3f}s  prove {dt:.3f}s", flush=True)


if __name__ == "__main__":
    main()
