"""SDK layer: snark/pk/vk artifacts + one-call keygen/prove helpers.

Reference behavior: `snark-verifier-sdk` (Cargo.lock:2714 [dep]) —
`Snark {protocol, instances, proof}` with bincode persistence, `gen_pk` /
`read_pk` with `.vk` sidecars, `gen_snark_shplonk` (prove + self-verify).
Artifact-file checkpointing makes the pipeline resumable (SURVEY.md §5).

Formats are this framework's own (documented below), not bincode-compatible;
every stage persists, mirroring the reference's ./build layout (cli.rs:247,
cli.rs:320).
"""
from __future__ import annotations

import io
import json
import os
from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from .plonk import BlindingRng, CircuitData, ProvingKey, VerifyingKey
from .plonk import create_proof as _create_proof
from .plonk import keygen as _keygen
from .plonk import verify_proof as _verify_proof
from .plonk.kzg import ParamsKZG
from .transcript import PoseidonTranscript
from .utils import refcrypto as rc


@dataclass
class Snark:
    """Proof + its verification context (reference `Snark`, read/written at
    cli.rs:320/386-389)."""
    vk: VerifyingKey
    instances: list
    proof: bytes

    def write(self, path: str) -> None:
        blob = {
            "version": 2,
            "vk": _vk_to_dict(self.vk),
            "instances": [[int(v) for v in col] for col in self.instances],
            "proof": self.proof.hex(),
        }
        with open(path, "w") as f:
            json.dump(blob, f)

    @staticmethod
    def read(path: str) -> "Snark":
        with open(path) as f:
            blob = json.load(f)
        return Snark(vk=_vk_from_dict(blob["vk"]),
                     instances=[[int(v) for v in col]
                                for col in blob["instances"]],
                     proof=bytes.fromhex(blob["proof"]))


def _vk_to_dict(vk: VerifyingKey) -> dict:
    return {
        "k": vk.k,
        "num_instance": vk.num_instance,
        "accumulator_indices": vk.accumulator_indices,
        "fixed_commitments": [[x, y] for (x, y) in vk.fixed_commitments],
        "permutation_commitments": [[x, y] for (x, y)
                                    in vk.permutation_commitments],
        # structural encoding (ConstraintSystem.to_dict) — no pickle:
        # snark/vk files may come from untrusted parties
        "cs": vk.cs.to_dict(),
    }


def _vk_from_dict(d: dict) -> VerifyingKey:
    acc = d.get("accumulator_indices")
    if isinstance(d["cs"], str):
        raise ValueError(
            "legacy pickle-format vk artifact; regenerate it (or convert "
            "with tools/migrate_artifacts.py) — pickle loading was removed")
    from .plonk.cs import ConstraintSystem
    return VerifyingKey(
        k=d["k"], cs=ConstraintSystem.from_dict(d["cs"]),
        fixed_commitments=[(int(x), int(y)) for x, y in d["fixed_commitments"]],
        permutation_commitments=[(int(x), int(y)) for x, y
                                 in d["permutation_commitments"]],
        num_instance=list(d["num_instance"]),
        accumulator_indices=[(int(c), int(r)) for c, r in acc]
        if acc else None,
    )


def write_vk(vk: VerifyingKey, path: str) -> None:
    with open(path, "w") as f:
        json.dump(_vk_to_dict(vk), f)


def read_vk(path: str) -> VerifyingKey:
    with open(path) as f:
        return _vk_from_dict(json.load(f))


def write_pk(pk: ProvingKey, path: str,
             cache_digest: bytes | None = None) -> None:
    """pk = vk sidecar (json) + device arrays (npz)."""
    d = _vk_to_dict(pk.vk)
    if cache_digest is not None:
        d["cache_digest"] = cache_digest.hex()
    with open(path + ".vk", "w") as f:
        json.dump(d, f)
    np.savez_compressed(
        path,
        fixed_lagrange=np.asarray(pk.fixed_lagrange),
        fixed_coeff=np.asarray(pk.fixed_coeff),
        sigma_lagrange=np.asarray(pk.sigma_lagrange),
        sigma_coeff=np.asarray(pk.sigma_coeff),
    )


def read_pk(path: str) -> ProvingKey:
    vk = read_vk(path + ".vk")
    # allow_pickle=False: pk files are plain numeric arrays (the retired
    # sigma_values object entry in old files is simply never accessed)
    z = np.load(path if path.endswith(".npz") else path + ".npz",
                allow_pickle=False)
    pk = ProvingKey(
        vk=vk,
        fixed_lagrange=jnp.asarray(z["fixed_lagrange"]),
        # coeff forms stay host-side numpy: their only consumer is the
        # quotient's one-time (per pk) conversion pipeline, which uploads
        # what it needs — keeping GBs resident on big domains is wasted HBM
        fixed_coeff=np.asarray(z["fixed_coeff"]),
        sigma_lagrange=jnp.asarray(z["sigma_lagrange"]),
        sigma_coeff=np.asarray(z["sigma_coeff"]),
    )
    # host mirror for the prover's big-domain stash/restore (free here —
    # the arrays are already host-resident from the npz)
    pk.__dict__["_host_mirror"] = {
        "fixed_lagrange": np.asarray(z["fixed_lagrange"]),
        "sigma_lagrange": np.asarray(z["sigma_lagrange"]),
        "fixed_coeff": np.asarray(z["fixed_coeff"]),
        "sigma_coeff": np.asarray(z["sigma_coeff"]),
    }
    return pk


def gen_pk(params: ParamsKZG, data: CircuitData,
           path: str | None = None) -> ProvingKey:
    """keygen + optional persistence (reference `gen_pk`, cli.rs:247)."""
    pk = None
    want = data.cache_digest_bytes()
    if path and os.path.exists(path + ".npz"):
        with open(path + ".vk") as f:
            sidecar = json.load(f)
        stored = sidecar.get("cache_digest")
        if stored is not None:
            valid = bytes.fromhex(stored) == want
        else:
            # legacy sidecar (no cache digest): fall back to structural
            # equality, then retrofit the strong digest for next time
            valid = (_vk_from_dict(sidecar).cs.digest_bytes()
                     == data.cs.digest_bytes())
        if valid:
            pk = read_pk(path)
            # adopt the LIVE constraint system: prover-only hints (lookup
            # max_bits, expression identity for the fused quotient) don't
            # serialize, and the digest proves equality
            pk.vk.cs = data.cs
            if stored is None:
                sidecar["cache_digest"] = want.hex()
                with open(path + ".vk", "w") as f:
                    json.dump(sidecar, f)
        else:
            import sys
            print(f"# gen_pk: cached pk at {path} no longer matches the "
                  "circuit (cache digest drift) -> re-keygen + overwrite",
                  file=sys.stderr)
    if pk is None:
        pk = _keygen(params, data)
        if path:
            write_pk(pk, path, cache_digest=want)
    # quotient_custom is a closure — never serialized; re-graft from the
    # freshly built CircuitData so cached pks keep the fast quotient path
    if data.quotient_custom is not None:
        pk.__dict__["quotient_custom"] = data.quotient_custom
    return pk


def gen_snark(params: ParamsKZG, pk: ProvingKey, witness, instances,
              path: str | None = None,
              transcript_cls=PoseidonTranscript,
              rng: BlindingRng | None = None) -> Snark:
    """Prove + self-verify + persist (reference `gen_snark_shplonk`)."""
    proof = _create_proof(params, pk, witness, instances,
                          transcript_cls(), rng=rng)
    assert _verify_proof(params, pk.vk, instances, proof, transcript_cls), \
        "self-verification failed"
    snark = Snark(vk=pk.vk, instances=instances, proof=proof)
    if path:
        snark.write(path)
    return snark


def verify_snark(params: ParamsKZG, snark: Snark,
                 transcript_cls=PoseidonTranscript) -> bool:
    return _verify_proof(params, snark.vk, snark.instances, snark.proof,
                         transcript_cls)


def gen_evm_proof(params: ParamsKZG, pk: ProvingKey, witness, instances,
                  path: str | None = None,
                  rng: BlindingRng | None = None) -> bytes:
    """Keccak-transcript proof for on-chain verification (reference
    `gen_evm_proof_shplonk`, cli.rs:519)."""
    from .transcript import KeccakTranscript
    proof = _create_proof(params, pk, witness, instances,
                          KeccakTranscript(), rng=rng)
    assert _verify_proof(params, pk.vk, instances, proof, KeccakTranscript)
    if path:
        with open(path, "wb") as f:
            f.write(proof)
    return proof


def gen_evm_verifier(params: ParamsKZG, vk: VerifyingKey,
                     num_instance_rows: list, sol_path: str | None = None,
                     name: str = "Halo2TpuVerifier") -> str:
    """Emit the Solidity verifier artifact (reference
    `gen_evm_verifier_shplonk`, cli.rs:512-517)."""
    from .evm import gen_evm_verifier as _gen
    return _gen(params, vk, num_instance_rows, sol_path, name)


def evm_verify(params: ParamsKZG, vk: VerifyingKey, instances,
               proof: bytes) -> bool:
    """Deploy the generated verifier bytecode into the in-process EVM and
    call it with `instances ++ proof` calldata (reference `evm_verify`
    deploys into revm, cli.rs:524; interp.Evm plays revm's role)."""
    from .evm import evm_verify_bytecode
    accepted, _gas = evm_verify_bytecode(params, vk, instances, proof)
    return accepted
