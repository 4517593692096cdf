"""End-to-end X.509 aggregation driver (VERDICT item 2).

Reproduces the reference's `x509_aggregation.rs:17-112` flow on TPU:
  1. four inner snarks over the bundled Let's Encrypt chain
     (testdata/example_cert_{1,2,3}.pem):
       rsa_1: leaf(cert_3) signed by intermediate(cert_2)   k=17 (2048-bit)
       sha_1: SHA256(TBS(cert_3))                           k=min_k
       rsa_2: intermediate(cert_2) signed by root(cert_1)   k=17 (4096-bit)
       sha_2: SHA256(TBS(cert_2))                           k=min_k
  2. X509VerifierAggregationCircuit over the four snarks -> keygen ->
     prove -> verify_aggregated (outer PLONK + deferred pairing).

Artifacts land in ./build (CLI-compatible stems).  The aggregation k is
configurable (--agg-k): the reference needs k=22 with halo2-base packing;
this framework's wider lane packing fits k=20-21 (docs/AGGREGATION_DESIGN.md)
— smaller domain, faster prover, same statement.

Usage: python tools/run_x509_agg.py [--agg-k 21] [--lanes 8] [--skip-inner]
"""
import argparse
import hashlib
import json
import os
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/h2t_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agg-k", type=int, default=21)
    ap.add_argument("--lanes", type=int, default=8)
    ap.add_argument("--na", type=int, default=2)
    ap.add_argument("--universal", action="store_true",
                    help="witness inner vks (VerifierUniversality::Full)")
    ap.add_argument("--skip-inner", action="store_true",
                    help="reuse ./build/*.proof from a previous run")
    ap.add_argument("--only-inner", action="store_true",
                    help="stop after the four inner snarks")
    ap.add_argument("--certs", default=os.path.join(REPO, "testdata"))
    args = ap.parse_args()

    os.makedirs("build", exist_ok=True)
    os.environ.setdefault("PARAMS_DIR", os.path.join(REPO, "params"))

    from halo2_zkcert_tpu import sdk
    from halo2_zkcert_tpu.cert import (extract_public_key,
                                       extract_tbs_and_sig, parse_pem)
    from halo2_zkcert_tpu.plonk import gen_srs

    def load(name):
        with open(os.path.join(args.certs, name), "rb") as f:
            return parse_pem(f.read())

    root, inter, leaf = (load(f"example_cert_{i}.pem") for i in (1, 2, 3))

    stems = ["rsa_1", "sha256_1", "rsa_2", "sha256_2"]
    timings = {}

    if not args.skip_inner:
        from halo2_zkcert_tpu.circuits.rsa import RsaCircuit
        from halo2_zkcert_tpu.circuits.sha256 import Sha256Circuit, min_k

        for stem, verify_cert, issuer in (("rsa_1", leaf, inter),
                                          ("rsa_2", inter, root)):
            t0 = time.time()
            log(f"{stem}: circuit + keygen (k=17, "
                f"{issuer.modulus.bit_length()}-bit modulus)")
            circuit = RsaCircuit(extract_public_key(issuer), k=17)
            params = gen_srs(17)
            pk = sdk.gen_pk(params, circuit.data, f"build/{stem}.pk")
            tbs, sig = extract_tbs_and_sig(verify_cert)
            digest = hashlib.sha256(tbs).digest()
            witness_fn, instances = circuit.witness(sig, digest)
            log(f"{stem}: proving")
            sdk.gen_snark(params, pk, witness_fn, instances,
                          f"build/{stem}.proof")
            timings[stem] = round(time.time() - t0, 1)
            log(f"{stem}: done in {timings[stem]}s")

        for stem, cert in (("sha256_1", leaf), ("sha256_2", inter)):
            t0 = time.time()
            k = min_k(len(cert.tbs))
            log(f"{stem}: circuit + keygen (k={k}, tbs={len(cert.tbs)}B)")
            circuit = Sha256Circuit.build(len(cert.tbs), k)
            params = gen_srs(k)
            pk = sdk.gen_pk(params, circuit.data, f"build/{stem}.pk")
            advice, instances = circuit.witness(cert.tbs)
            log(f"{stem}: proving")
            sdk.gen_snark(params, pk, advice, instances,
                          f"build/{stem}.proof")
            timings[stem] = round(time.time() - t0, 1)
            log(f"{stem}: done in {timings[stem]}s")

    if args.only_inner:
        with open("build/x509_inner_timings.json", "w") as f:
            json.dump(timings, f, indent=1)
        log(f"inner snarks done: {json.dumps(timings)}")
        return

    from halo2_zkcert_tpu.circuits.aggregation import (InnerSnark,
                                                       verify_aggregated)
    from halo2_zkcert_tpu.circuits.x509_agg import (
        X509VerifierAggregationCircuit)
    from halo2_zkcert_tpu.transcript import PoseidonTranscript

    snarks = []
    for stem in stems:
        s = sdk.Snark.read(f"build/{stem}.proof")
        snarks.append(InnerSnark(vk=s.vk, instances=s.instances,
                                 proof=s.proof))

    t0 = time.time()
    log(f"agg: building circuit (k={args.agg_k}, lanes={args.lanes})")
    circuit = X509VerifierAggregationCircuit(
        snarks, k=args.agg_k, lanes=args.lanes, na=args.na,
        universal=args.universal)
    rep = circuit.rows_report()
    log(f"agg rows: {rep}")
    timings["agg_build"] = round(time.time() - t0, 1)

    t0 = time.time()
    params = gen_srs(args.agg_k)
    timings["agg_srs"] = round(time.time() - t0, 1)
    log(f"agg: srs ready ({timings['agg_srs']}s); keygen")

    t0 = time.time()
    pk = sdk.gen_pk(params, circuit.data, "build/x509_agg.pk")
    timings["agg_keygen"] = round(time.time() - t0, 1)
    log(f"agg: keygen done ({timings['agg_keygen']}s); proving")

    t0 = time.time()
    witness_fn, instances = circuit.witness()
    snark = sdk.gen_snark(params, pk, witness_fn, instances,
                          "build/x509_agg.proof")
    timings["agg_prove"] = round(time.time() - t0, 1)
    log(f"agg: proof done ({timings['agg_prove']}s); verifying")

    assert verify_aggregated(params, pk.vk, instances, snark.proof,
                             PoseidonTranscript), "aggregated verify failed"
    log("agg: verify_aggregated OK (outer PLONK + deferred pairing)")
    timings["ok"] = True
    with open("build/x509_agg_timings.json", "w") as f:
        json.dump(timings, f, indent=1)
    log(json.dumps(timings))


if __name__ == "__main__":
    main()
