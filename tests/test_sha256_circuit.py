"""SHA-256 bit-plane circuit: mock satisfaction + end-to-end proof.

Parity target: reference zkevm SHA256 circuit tests (SURVEY.md §4;
vanilla_aggregation.rs:102-117 — whose hardcoded vector is stale, so we
check against hashlib ground truth instead, as SURVEY.md §4 prescribes).
"""
import hashlib

import pytest

from halo2_zkcert_tpu.circuits.sha256 import Sha256Circuit, min_k, num_blocks
from halo2_zkcert_tpu.plonk import create_proof, keygen, run_mock, setup, verify_proof
from halo2_zkcert_tpu.transcript import PoseidonTranscript

pytestmark = pytest.mark.slow  # proving/mock at circuit scale; fast tier = -m 'not slow'


MSG = b"halo2-zkcert-tpu: sha256 circuit test vector!!"  # 46 bytes, 1 block


def test_block_count():
    assert num_blocks(0) == 1
    assert num_blocks(55) == 1
    assert num_blocks(56) == 2
    assert num_blocks(64) == 2
    assert num_blocks(970) == 16  # cert_3 TBS length (SURVEY.md §4)


@pytest.fixture(scope="module")
def circuit():
    return Sha256Circuit.build(len(MSG))


def test_witness_instances_match_hashlib(circuit):
    _, instances = circuit.witness(MSG)
    digest = hashlib.sha256(MSG).digest()
    assert instances[0][0] == int.from_bytes(digest[16:], "big")   # lo
    assert instances[0][1] == int.from_bytes(digest[:16], "big")   # hi


def test_mock_satisfied(circuit):
    advice, instances = circuit.witness(MSG)
    assert run_mock(circuit.data, advice, instances) == []


def test_mock_rejects_wrong_message_structure(circuit):
    # witness for a different message of same length fails the instance copy
    other = bytes([b ^ 1 for b in MSG])
    advice, _ = circuit.witness(other)
    _, instances = circuit.witness(MSG)
    fails = run_mock(circuit.data, advice, instances, raise_on_failure=False)
    assert fails  # copy constraint to instance must break


def test_prove_verify(circuit):
    advice, instances = circuit.witness(MSG)
    params = setup(circuit.data.k)
    pk = keygen(params, circuit.data)
    proof = create_proof(params, pk, advice, instances, PoseidonTranscript())
    assert verify_proof(params, pk.vk, instances, proof, PoseidonTranscript)
    # wrong digest must not verify
    bad = [[instances[0][0] ^ 1, instances[0][1]]]
    assert not verify_proof(params, pk.vk, bad, proof, PoseidonTranscript)
