"""GateBuilder (halo2-base equivalent) tests: trace packing, range checks,
constants, instances — mock-checked and proven end-to-end at k=8."""
import pytest

from halo2_zkcert_tpu.builder import GateBuilder
from halo2_zkcert_tpu.plonk import create_proof, keygen, run_mock, setup, verify_proof
from halo2_zkcert_tpu.transcript import PoseidonTranscript
from halo2_zkcert_tpu.utils import refcrypto as rc


def build_sample(x_val: int = 12, y_val: int = 45):
    gb = GateBuilder(lookup_bits=7)
    x = gb.witness(x_val)
    y = gb.witness(y_val)
    z = gb.mul_add(x, y, gb.constant(5))       # 5 + x*y
    w = gb.sub(z, x)
    gb.range_check(w, 14)                      # 2 chunks of 7 bits
    b = gb.is_zero(gb.sub(x, y))
    gb.assert_const(b, 0 if x_val != y_val else 1)
    acc = gb.inner_product([x, y, z], [y, z, w])
    gb.expose_public(acc)
    gb.expose_public(w)
    return gb, (x_val, y_val)


def expected_publics(x, y):
    z = (5 + x * y) % rc.FR
    w = (z - x) % rc.FR
    acc = (x * y + y * z + z * w) % rc.FR
    return [acc, w]


def test_values_and_params():
    gb, (x, y) = build_sample()
    data, advice, instances = gb.finalize(8)
    assert instances[0] == expected_publics(x, y)
    cfg = gb.calculate_params(8)
    assert cfg["num_advice"] >= 1 and cfg["num_lookup_advice"] >= 1


def test_mock_satisfied():
    gb, _ = build_sample()
    data, advice, instances = gb.finalize(8)
    assert run_mock(data, advice, instances) == []


def test_mock_rejects_wrong_instance():
    gb, _ = build_sample()
    data, advice, instances = gb.finalize(8)
    bad = [list(instances[0])]
    bad[0][0] = (bad[0][0] + 1) % rc.FR
    assert run_mock(data, advice, bad, raise_on_failure=False)


def test_range_check_violation_detected():
    gb = GateBuilder(lookup_bits=7)
    x = gb.witness((1 << 14) + 3)   # too big for 14 bits
    gb.range_check(x, 14)
    data, advice, instances = gb.finalize(8)
    assert run_mock(data, advice, instances, raise_on_failure=False)


def test_multi_column_packing():
    gb = GateBuilder(lookup_bits=7)
    acc = gb.witness(1)
    for i in range(200):                       # ~800 cells -> 4+ columns at k=8
        acc = gb.mul_add(acc, gb.constant(3), gb.constant(i))
    gb.expose_public(acc)
    data, advice, instances = gb.finalize(8)
    assert data.cs.num_advice >= 2
    assert run_mock(data, advice, instances) == []


def test_prove_verify():
    gb, _ = build_sample()
    data, advice, instances = gb.finalize(8)
    params = setup(8)
    pk = keygen(params, data)
    proof = create_proof(params, pk, advice, instances, PoseidonTranscript())
    assert verify_proof(params, pk.vk, instances, proof, PoseidonTranscript)
    bad = [list(instances[0])]
    bad[0][1] = (bad[0][1] + 1) % rc.FR
    assert not verify_proof(params, pk.vk, bad, proof, PoseidonTranscript)
