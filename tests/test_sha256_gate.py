"""Gate-level (unoptimized) SHA-256 circuit tests.

Parity target: halo2-sha256-unoptimized usage in the reference
(helpers.rs:174-199; 32 digest-byte instances)."""
import hashlib

import pytest

from halo2_zkcert_tpu.circuits.sha256_gate import Sha256GateCircuit
from halo2_zkcert_tpu.plonk import run_mock

pytestmark = pytest.mark.slow  # proving/mock at circuit scale; fast tier = -m 'not slow'


MSG = b"unoptimized sha256 over the vertical gate"


@pytest.fixture(scope="module")
def circuit():
    return Sha256GateCircuit(MSG, k=19)


def test_instances_match_hashlib(circuit):
    digest = hashlib.sha256(MSG).digest()
    assert circuit.instances[0] == list(digest)


def test_mock_satisfied(circuit):
    assert run_mock(circuit.data, circuit.advice, circuit.instances) == []


def test_mock_rejects_wrong_digest(circuit):
    bad = [list(circuit.instances[0])]
    bad[0][0] ^= 1
    fails = run_mock(circuit.data, circuit.advice, bad,
                     raise_on_failure=False)
    assert fails
