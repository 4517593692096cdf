"""Command-line interface — parity with the reference's 11 subcommands
(`/root/reference/src/bin/cli.rs:31-212`).

Defaults mirror the reference where meaningful (build dir ./build, params
dir ./params via $PARAMS_DIR, cert paths ./certs/cert_{i}.pem).  The two
SHA-256 flavors are distinct circuits, as in the reference: `*-zkevm-*`
drives the bit-plane circuit (circuits/sha256.py, the zkevm-hashes role)
and `*-unoptimized-*` the gate-level builder circuit
(circuits/sha256_gate.py, the halo2-sha256-unoptimized role,
helpers.rs:174-199).
"""
from __future__ import annotations

import argparse
import hashlib
import os
import sys


def _add_agg_shape(p):
    """Aggregation packing shape (docs/AGGREGATION_DESIGN.md): k=21 with
    8 tape lanes and 4 builder advice columns fits the 4-snark statement
    (the reference uses k=22 with halo2-base packing, cli.rs:394)."""
    p.add_argument("--lanes", type=int, default=8)
    p.add_argument("--na", type=int, default=4)
    p.add_argument("--universal", action="store_true",
                   help="witness the inner vks (VerifierUniversality::Full, "
                        "reference lib.rs:47): one agg pk serves differing "
                        "inner vks; exposes a vk-binding digest instance")


def _add_common(p, k_default: int):
    p.add_argument("--k", type=int, default=k_default)
    p.add_argument("--build-dir", default="./build")
    p.add_argument("--params-path", default=os.environ.get("PARAMS_DIR", "./params"))


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="halo2-zkcert-tpu",
        description="TPU-native zk proving for X.509 certificate chains")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("download-tls-certs",
                       help="fetch a domain's TLS chain as PEM files (cli.rs:34)")
    p.add_argument("--domain", required=True)
    p.add_argument("--certs-path", default="./certs")

    p = sub.add_parser("gen-params", help="generate/cache the KZG SRS (cli.rs:44)")
    _add_common(p, 17)

    p = sub.add_parser("gen-rsa-keys", help="RSA circuit keygen (cli.rs:52)")
    _add_common(p, 17)
    p.add_argument("--verify-cert-path", default="./certs/cert_3.pem")
    p.add_argument("--issuer-cert-path", default="./certs/cert_2.pem")
    p.add_argument("--pk-path", default="./build/rsa.pk")

    p = sub.add_parser("prove-rsa", help="RSA circuit proof (cli.rs:96)")
    _add_common(p, 17)
    p.add_argument("--verify-cert-path", default="./certs/cert_3.pem")
    p.add_argument("--issuer-cert-path", default="./certs/cert_2.pem")
    p.add_argument("--pk-path", default="./build/rsa.pk")
    p.add_argument("--proof-path", default="./build/rsa.proof")

    for name, helpmsg, stem in (
            ("gen-zkevm-sha256-keys", "SHA256 bit circuit keygen (cli.rs:80)",
             "zkevm_sha256"),
            ("gen-unoptimized-sha256-keys",
             "gate-level SHA256 keygen (cli.rs:66)", "unoptimized_sha256")):
        p = sub.add_parser(name, help=helpmsg)
        _add_common(p, 0)
        p.add_argument("--cert-path", default="./certs/cert_3.pem")
        p.add_argument("--pk-path", default=f"./build/{stem}.pk")

    for name, helpmsg, stem in (
            ("prove-zkevm-sha256", "SHA256 bit circuit proof (cli.rs:128)",
             "zkevm_sha256"),
            ("prove-unoptimized-sha256",
             "gate-level SHA256 proof (cli.rs:112)", "unoptimized_sha256")):
        p = sub.add_parser(name, help=helpmsg)
        _add_common(p, 0)
        p.add_argument("--cert-path", default="./certs/cert_3.pem")
        p.add_argument("--pk-path", default=f"./build/{stem}.pk")
        p.add_argument("--proof-path", default=f"./build/{stem}.proof")

    p = sub.add_parser("gen-x509-agg-keys", help="aggregation keygen (cli.rs:144)")
    _add_common(p, 22)
    p.add_argument("--snarks", nargs=4, metavar="PROOF",
                   default=["./build/rsa_1.proof", "./build/sha256_1.proof",
                            "./build/rsa_2.proof", "./build/sha256_2.proof"])
    p.add_argument("--pk-path", default="./build/x509_agg.pk")
    _add_agg_shape(p)

    p = sub.add_parser("gen-x509-agg-proof", help="aggregation proof (cli.rs:166)")
    _add_common(p, 22)
    p.add_argument("--snarks", nargs=4, metavar="PROOF",
                   default=["./build/rsa_1.proof", "./build/sha256_1.proof",
                            "./build/rsa_2.proof", "./build/sha256_2.proof"])
    p.add_argument("--pk-path", default="./build/x509_agg.pk")
    p.add_argument("--proof-path", default="./build/x509_agg.proof")
    _add_agg_shape(p)

    p = sub.add_parser("gen-x509-agg-evm-proof",
                       help="aggregation EVM proof + verifier (cli.rs:188)")
    _add_common(p, 22)
    p.add_argument("--snarks", nargs=4, metavar="PROOF",
                   default=["./build/rsa_1.proof", "./build/sha256_1.proof",
                            "./build/rsa_2.proof", "./build/sha256_2.proof"])
    p.add_argument("--pk-path", default="./build/x509_agg.pk")
    p.add_argument("--proof-path", default="./build/x509_agg_evm.proof")
    p.add_argument("--sol-path", default="./X509AggregationVerifierFinal.sol")
    _add_agg_shape(p)
    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)
    os.environ.setdefault("PARAMS_DIR", getattr(args, "params_path", "./params"))
    if hasattr(args, "build_dir"):
        os.makedirs(args.build_dir, exist_ok=True)

    if args.cmd == "download-tls-certs":
        from .cert import download_tls_certs_from_domain
        paths = download_tls_certs_from_domain(args.domain, args.certs_path)
        print("\n".join(paths))
        return

    from .plonk import gen_srs

    if args.cmd == "gen-params":
        params = gen_srs(args.k, args.params_path)
        print(f"srs k={params.k} cached in {args.params_path}")
        return

    from .cert import extract_public_key, extract_tbs_and_sig, parse_pem
    from . import sdk

    def load(path):
        with open(path, "rb") as f:
            return parse_pem(f.read())

    if args.cmd in ("gen-rsa-keys", "prove-rsa"):
        from .circuits.rsa import RsaCircuit
        verify_cert = load(args.verify_cert_path)
        issuer = load(args.issuer_cert_path)
        circuit = RsaCircuit(extract_public_key(issuer), k=args.k)
        params = gen_srs(args.k, args.params_path)
        pk = sdk.gen_pk(params, circuit.data, args.pk_path)
        if args.cmd == "gen-rsa-keys":
            print(f"rsa pk written to {args.pk_path}")
            return
        tbs, sig = extract_tbs_and_sig(verify_cert)
        digest = hashlib.sha256(tbs).digest()
        witness_fn, instances = circuit.witness(sig, digest)
        RsaCircuit.validate_instances(instances)   # byte-range is host-side
        sdk.gen_snark(params, pk, witness_fn, instances, args.proof_path)
        print(f"rsa snark written to {args.proof_path}")
        return

    if "unoptimized-sha256" in args.cmd:
        from .circuits.sha256_gate import Sha256GateCircuit
        cert = load(args.cert_path)
        k = args.k or 19                      # reference README.md:24
        circuit = Sha256GateCircuit(cert.tbs, k)
        params = gen_srs(k, args.params_path)
        pk = sdk.gen_pk(params, circuit.data, args.pk_path)
        if args.cmd.endswith("keys"):
            print(f"unoptimized sha256 pk written to {args.pk_path}")
            return
        sdk.gen_snark(params, pk, circuit.advice, circuit.instances,
                      args.proof_path)
        print(f"unoptimized sha256 snark written to {args.proof_path}")
        return

    if "sha256" in args.cmd:
        from .circuits.sha256 import Sha256Circuit, min_k
        cert = load(args.cert_path)
        k = args.k or min_k(len(cert.tbs))
        circuit = Sha256Circuit.build(len(cert.tbs), k)
        params = gen_srs(k, args.params_path)
        pk = sdk.gen_pk(params, circuit.data, args.pk_path)
        if args.cmd.endswith("keys"):
            print(f"sha256 pk written to {args.pk_path}")
            return
        advice, instances = circuit.witness(cert.tbs)
        sdk.gen_snark(params, pk, advice, instances, args.proof_path)
        print(f"sha256 snark written to {args.proof_path}")
        return

    if args.cmd.startswith("gen-x509-agg"):
        from .circuits.aggregation import InnerSnark, verify_aggregated
        from .circuits.x509_agg import X509VerifierAggregationCircuit
        snarks = []
        for path in args.snarks:
            s = sdk.Snark.read(path)
            snarks.append(InnerSnark(vk=s.vk, instances=s.instances,
                                     proof=s.proof))
        params = gen_srs(args.k, args.params_path)
        circuit = X509VerifierAggregationCircuit(
            snarks, k=args.k, lanes=args.lanes, na=args.na,
            universal=args.universal)
        rep = circuit.rows_report()
        print(f"agg circuit: tape rows {rep['tape_rows']}, "
              f"builder cells {rep['builder_cells']}, usable {rep['usable']}")
        pk = sdk.gen_pk(params, circuit.data, args.pk_path)
        if args.cmd == "gen-x509-agg-keys":
            print(f"x509 agg pk written to {args.pk_path}")
            return
        witness_fn, instances = circuit.witness()
        if args.cmd == "gen-x509-agg-proof":
            snark = sdk.gen_snark(params, pk, witness_fn, instances,
                                  args.proof_path)
            from .transcript import PoseidonTranscript
            assert verify_aggregated(params, pk.vk, instances, snark.proof,
                                     PoseidonTranscript), \
                "aggregated accumulator pairing failed"
            print(f"x509 agg snark written to {args.proof_path}")
            return
        # gen-x509-agg-evm-proof
        sol = sdk.gen_evm_verifier(params, pk.vk,
                                   [len(c) for c in instances],
                                   args.sol_path,
                                   name="X509AggregationVerifierFinal")
        proof = sdk.gen_evm_proof(params, pk, witness_fn, instances,
                                  args.proof_path)
        assert sdk.evm_verify(params, pk.vk, instances, proof)
        print(f"x509 agg evm proof written to {args.proof_path}; "
              f"verifier at {args.sol_path}")
        return

    raise SystemExit(f"unknown command {args.cmd}")


if __name__ == "__main__":
    main()
