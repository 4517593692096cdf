"""EVM verifier path: IR executor must agree with the native verifier on
EVM-flavored (Keccak) proofs; the Solidity artifact must render."""
import pytest

from halo2_zkcert_tpu.evm import build_verifier_ir, execute_ir, gen_evm_verifier
from halo2_zkcert_tpu.plonk import create_proof, keygen, setup, verify_proof
from halo2_zkcert_tpu.transcript import KeccakTranscript
from halo2_zkcert_tpu.utils import refcrypto as rc
from tests.test_plonk_e2e import build_toy

pytestmark = pytest.mark.slow  # proving/mock at circuit scale; fast tier = -m 'not slow'



@pytest.fixture(scope="module")
def evm_setup():
    data, advice, instances = build_toy()
    params = setup(data.k)
    pk = keygen(params, data)
    proof = create_proof(params, pk, advice, instances, KeccakTranscript())
    assert verify_proof(params, pk.vk, instances, proof, KeccakTranscript)
    return data, instances, params, pk, proof


def test_ir_executor_accepts_valid(evm_setup):
    data, instances, params, pk, proof = evm_setup
    ops, proof_len = build_verifier_ir(pk.vk, [len(c) for c in instances])
    assert proof_len == len(proof)
    assert execute_ir(ops, instances, proof, params)


def test_ir_executor_rejects(evm_setup):
    data, instances, params, pk, proof = evm_setup
    ops, _ = build_verifier_ir(pk.vk, [len(c) for c in instances])
    bad_inst = [[(instances[0][0] + 1) % rc.FR]]
    assert not execute_ir(ops, bad_inst, proof, params)
    tampered = bytearray(proof)
    tampered[-1] ^= 1
    assert not execute_ir(ops, instances, bytes(tampered), params)


def test_bytecode_evm_accepts_valid(evm_setup):
    """Deploy the assembled verifier into the in-process EVM and call it
    (the reference's revm path, cli.rs:524)."""
    from halo2_zkcert_tpu.evm import evm_verify_bytecode
    data, instances, params, pk, proof = evm_setup
    accepted, gas = evm_verify_bytecode(params, pk.vk, instances, proof)
    assert accepted
    assert gas > 100_000              # pairing + ecMuls actually ran


def test_bytecode_evm_rejects(evm_setup):
    from halo2_zkcert_tpu.evm import evm_verify_bytecode
    data, instances, params, pk, proof = evm_setup
    bad_inst = [[(instances[0][0] + 1) % rc.FR] + list(instances[0][1:])]
    accepted, _ = evm_verify_bytecode(params, pk.vk, bad_inst, proof)
    assert not accepted
    tampered = bytearray(proof)
    tampered[-1] ^= 1
    accepted, _ = evm_verify_bytecode(params, pk.vk, instances,
                                      bytes(tampered))
    assert not accepted
    # truncated calldata must revert, not be read as zeros
    accepted, _ = evm_verify_bytecode(params, pk.vk, instances, proof[:-32])
    assert not accepted


def test_bytecode_matches_ir_executor(evm_setup):
    """The assembled contract and the IR executor are two backends of one
    program — they must agree bit-for-bit on accept/reject."""
    from halo2_zkcert_tpu.evm import (build_verifier_ir, evm_verify_bytecode,
                                      execute_ir)
    data, instances, params, pk, proof = evm_setup
    ops, _ = build_verifier_ir(pk.vk, [len(c) for c in instances])
    for mutate in (None, 0, len(proof) // 2, len(proof) - 1):
        p = bytearray(proof)
        if mutate is not None:
            p[mutate] ^= 1
        p = bytes(p)
        ir_ok = execute_ir(ops, instances, p, params)
        evm_ok, _ = evm_verify_bytecode(params, pk.vk, instances, p)
        assert ir_ok == evm_ok, f"backends disagree at mutate={mutate}"


def test_deployment_roundtrip(evm_setup):
    from halo2_zkcert_tpu.evm import Evm, gen_evm_verifier_bytecode
    data, instances, params, pk, proof = evm_setup
    art = gen_evm_verifier_bytecode(params, pk.vk,
                                    [len(c) for c in instances])
    evm = Evm()
    res = evm.deploy(art["deploy"])
    assert res.success and res.output == art["runtime"]


def test_solidity_renders(evm_setup, tmp_path):
    data, instances, params, pk, proof = evm_setup
    path = tmp_path / "Verifier.sol"
    src = gen_evm_verifier(params, pk.vk, [len(c) for c in instances],
                           str(path), name="ToyVerifier")
    assert path.exists()
    for marker in ("contract ToyVerifier", "staticcall(gas(), 0x08",
                   "function verify", f"proof.length == {len(proof)}"):
        assert marker in src
