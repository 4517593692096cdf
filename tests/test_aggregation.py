"""Aggregation circuit: in-circuit verification of a real inner proof.

Parity target: reference `test_aggregation_split_zkevm_sha256_rsa`
(vanilla_aggregation.rs:16-99) at toy scale — one tiny inner snark,
mock-checked aggregation (full agg proving is exercised by the CLI / bench
paths; MockProver is the reference's own unit-test backend, SURVEY.md §4).
"""
import pytest

from halo2_zkcert_tpu.builder import GateBuilder
from halo2_zkcert_tpu.circuits.aggregation import (
    AggregationCircuit, InnerSnark, decode_accumulator)
from halo2_zkcert_tpu.plonk import create_proof, keygen, run_mock, setup, verify_proof
from halo2_zkcert_tpu.transcript import PoseidonTranscript
from halo2_zkcert_tpu.utils import refcrypto as rc

pytestmark = pytest.mark.slow  # proving/mock at circuit scale; fast tier = -m 'not slow'



def _toy_inner_snark(k: int = 6) -> InnerSnark:
    """Tiny builder circuit: proves knowledge of x with x^3 + x == 10 for
    public 10 (x = 2 is a witness)."""
    gb = GateBuilder()
    x = gb.witness(2)
    x3 = gb.mul(gb.square(x), x)
    out = gb.add(x3, x)
    gb.expose_public(out)
    data, advice, instances = gb.finalize(
        k, {"k": k, "num_advice": 1, "num_lookup_advice": 0,
            "lookup_bits": 16})
    params = setup(k)
    pk = keygen(params, data)
    proof = create_proof(params, pk, advice, instances, PoseidonTranscript())
    assert verify_proof(params, pk.vk, instances, proof, PoseidonTranscript)
    return InnerSnark(vk=pk.vk, instances=instances, proof=proof), params


@pytest.fixture(scope="module")
def inner():
    return _toy_inner_snark()


def test_aggregation_mock(inner):
    snark, params = inner
    agg = AggregationCircuit([snark], k=19, lanes=4, na=2, nl=1)
    rep = agg.rows_report()
    assert max(rep["tape_rows"]) <= rep["usable"], rep
    witness_fn, instances = agg.witness()
    assert len(instances[0]) == 8
    fails = run_mock(agg.data, witness_fn, instances, raise_on_failure=False)
    assert fails == [], fails[:5]

    # the exposed accumulator satisfies the deferred pairing
    (lhs, rhs) = decode_accumulator(instances)
    assert rc.pairing_check([
        (lhs, params.s_g2),
        (rc.g1_to_affine(rc.g1_neg(rc.g1_from_affine(rhs))), params.g2),
    ])


def test_aggregation_rejects_tampered_inner_proof(inner):
    snark, _ = inner
    bad = bytearray(snark.proof)
    bad[40] ^= 1
    tampered = InnerSnark(vk=snark.vk, instances=snark.instances,
                          proof=bytes(bad))
    # in-circuit replay computes an accumulator, but the deferred pairing
    # must fail (witness generation itself may also fail on decompression)
    try:
        agg = AggregationCircuit([tampered], k=19, lanes=4, na=2, nl=1)
    except (AssertionError, ValueError):
        return
    _, params = inner
    _, instances = agg.witness()
    (lhs, rhs) = decode_accumulator(instances)
    assert not rc.pairing_check([
        (lhs, params.s_g2),
        (rc.g1_to_affine(rc.g1_neg(rc.g1_from_affine(rhs))), params.g2),
    ])


def _toy_inner_snark_const(c: int, k: int = 6):
    """Same SHAPE as _toy_inner_snark but with a fixed constant `c` mixed
    in: x^3 + x + c == public.  Different c -> different vk (different
    fixed commitment), identical circuit structure."""
    gb = GateBuilder()
    x = gb.witness(2)
    x3 = gb.mul(gb.square(x), x)
    out = gb.add(gb.add_const(x, c), x3)
    gb.expose_public(out)
    data, advice, instances = gb.finalize(
        k, {"k": k, "num_advice": 1, "num_lookup_advice": 0,
            "lookup_bits": 16})
    params = setup(k)
    pk = keygen(params, data)
    proof = create_proof(params, pk, advice, instances, PoseidonTranscript())
    assert verify_proof(params, pk.vk, instances, proof, PoseidonTranscript)
    return InnerSnark(vk=pk.vk, instances=instances, proof=proof), params


def test_universal_aggregation_one_key_two_vks():
    """VerifierUniversality::Full parity (reference lib.rs:47): with
    universal=True the inner vk is witnessed, so ONE aggregation circuit
    shape (hence one agg pk) serves different inner vks of the same inner
    circuit shape; the exposed vk digest distinguishes the statements."""
    from halo2_zkcert_tpu.circuits.aggregation import vk_binding_digest

    snark_a, params = _toy_inner_snark_const(5)
    snark_b, _ = _toy_inner_snark_const(7)
    assert snark_a.vk.digest_bytes() != snark_b.vk.digest_bytes()

    agg_a = AggregationCircuit([snark_a], k=19, lanes=4, na=2, nl=1,
                               universal=True)
    agg_b = AggregationCircuit([snark_b], k=19, lanes=4, na=2, nl=1,
                               universal=True)
    # identical circuit shape -> identical keys (the whole point)
    assert agg_a.composed._fp == agg_b.composed._fp

    for agg, snark in ((agg_a, snark_a), (agg_b, snark_b)):
        witness_fn, instances = agg.witness()
        assert len(instances[0]) == 9
        assert int(instances[0][8]) == vk_binding_digest([snark.vk])
        # mock against agg_a's DATA for both (one pk serves both)
        fails = run_mock(agg_a.data, witness_fn, instances,
                         raise_on_failure=False)
        assert fails == [], fails[:5]
        (lhs, rhs) = decode_accumulator(instances)
        assert rc.pairing_check([
            (lhs, params.s_g2),
            (rc.g1_to_affine(rc.g1_neg(rc.g1_from_affine(rhs))), params.g2),
        ])
    assert vk_binding_digest([snark_a.vk]) != vk_binding_digest([snark_b.vk])
