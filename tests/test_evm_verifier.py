"""EVM verifier path: IR executor must agree with the native verifier on
EVM-flavored (Keccak) proofs; the Solidity artifact must render."""
import pytest

from halo2_zkcert_tpu.evm import build_verifier_ir, execute_ir, gen_evm_verifier
from halo2_zkcert_tpu.plonk import create_proof, keygen, setup, verify_proof
from halo2_zkcert_tpu.transcript import KeccakTranscript
from halo2_zkcert_tpu.utils import refcrypto as rc
from tests.test_plonk_e2e import build_toy


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


def test_solidity_renders(evm_setup, tmp_path):
    data, instances, params, pk, proof = evm_setup
    path = tmp_path / "Verifier.sol"
    src = gen_evm_verifier(params, pk.vk, [len(c) for c in instances],
                           str(path), name="ToyVerifier")
    assert path.exists()
    for marker in ("contract ToyVerifier", "staticcall(gas(), 0x08",
                   "function verify", f"proof.length == {len(proof)}"):
        assert marker in src
