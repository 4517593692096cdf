"""RSA signature-verification circuit tests against the generated chain.

Parity target: reference `test_generate_rsa_2048` / `_4096`
(vanilla_aggregation.rs:119-143 — MockProver at k=16/17 on the cert chain).
Full proving of the k=17 config is exercised in the benchmark / e2e paths
(it is the headline workload, BASELINE.md).
"""
import hashlib

import pytest

from halo2_zkcert_tpu.cert import extract_public_key, extract_tbs_and_sig, parse_pem
from halo2_zkcert_tpu.circuits.rsa import NUM_SQUARINGS, RsaCircuit
from halo2_zkcert_tpu.plonk import run_mock
from tests.chainutil import generate_chain

pytestmark = pytest.mark.slow  # proving/mock at circuit scale; fast tier = -m 'not slow'



@pytest.fixture(scope="module")
def chain():
    return [parse_pem(p) for p in generate_chain()]


def test_structure_2048(chain):
    root, inter, leaf = chain
    c = RsaCircuit(inter.modulus, k=17)
    assert c.L == 128
    assert c.rows_used < (1 << 17)
    assert c.cs.num_advice == 2 and c.cs.num_instance == 1
    assert c.cs.num_challenges == 1


def test_mock_2048(chain):
    """Leaf signed by intermediate (RSA-2048), like reference k=16 test."""
    root, inter, leaf = chain
    circuit = RsaCircuit(inter.modulus, k=17)
    tbs, sig = extract_tbs_and_sig(leaf)
    assert circuit.verify_host(sig, tbs)
    digest = hashlib.sha256(tbs).digest()
    witness_fn, instances = circuit.witness(sig, digest)
    assert instances[0] == list(digest)
    assert run_mock(circuit.data, witness_fn, instances) == []


def test_mock_rejects_bad_signature(chain):
    root, inter, leaf = chain
    circuit = RsaCircuit(inter.modulus, k=17)
    tbs, sig = extract_tbs_and_sig(leaf)
    digest = hashlib.sha256(tbs).digest()
    # witness generation itself must fail for a forged signature (the final
    # z == EM assertion), like halo2-rsa's in-circuit validity bit
    with pytest.raises(AssertionError):
        circuit.witness(sig + 1, digest)


def test_mock_rejects_wrong_digest_instances(chain):
    root, inter, leaf = chain
    circuit = RsaCircuit(inter.modulus, k=17)
    tbs, sig = extract_tbs_and_sig(leaf)
    digest = hashlib.sha256(tbs).digest()
    witness_fn, instances = circuit.witness(sig, digest)
    bad = [list(instances[0])]
    bad[0][0] ^= 1
    fails = run_mock(circuit.data, witness_fn, bad, raise_on_failure=False)
    assert fails  # instance copy constraint must break


def test_mock_4096(chain):
    """Intermediate signed by RSA-4096 root, like reference k=17 test."""
    root, inter, leaf = chain
    circuit = RsaCircuit(root.modulus, k=17)
    assert circuit.L == 256
    tbs, sig = extract_tbs_and_sig(inter)
    digest = hashlib.sha256(tbs).digest()
    witness_fn, instances = circuit.witness(sig, digest)
    assert run_mock(circuit.data, witness_fn, instances) == []
