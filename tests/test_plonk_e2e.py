"""End-to-end PLONK pipeline test on a toy circuit (k=6).

Exercises every prover feature at once: a degree-3 custom gate, a lookup
(range-check style), copy constraints between advice cells and to an
instance column, blinding, quotient, SHPLONK multiopen, and the final KZG
pairing check — prover and verifier must agree; tampering must fail.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from halo2_zkcert_tpu.ops.field import Fr
from halo2_zkcert_tpu.plonk import (
    ADVICE, INSTANCE, CircuitData, Column, ConstraintSystem, create_proof,
    keygen, run_mock, setup, verify_proof,
)
from halo2_zkcert_tpu.transcript import KeccakTranscript, PoseidonTranscript
from halo2_zkcert_tpu.utils import refcrypto as rc

pytestmark = pytest.mark.slow  # proving/mock at circuit scale; fast tier = -m 'not slow'


K = 6
N = 1 << K


def build_toy():
    cs = ConstraintSystem()
    q = cs.fixed_column()        # gate selector
    tbl = cs.fixed_column()      # lookup table column (values 0..15)
    a = cs.advice_column()
    b = cs.advice_column()
    c = cs.advice_column()
    pi = cs.instance_column()
    cs.create_gate("mul_add", q * (a * b + a - c))
    cs.add_lookup("a_in_table", [(a, tbl)])
    for col in (Column(ADVICE, a.index), Column(ADVICE, b.index),
                Column(ADVICE, c.index), Column(INSTANCE, pi.index)):
        cs.enable_permutation(col)

    q_vals = [1 if i < 32 else 0 for i in range(N)]
    tbl_vals = [i % 16 for i in range(N)]
    fixed = np.array([q_vals, tbl_vals], dtype=object)

    usable = cs.usable_rows(N)
    a_vals = [i % 16 for i in range(N)]
    b_vals = [(i * 3) % 16 for i in range(N)]
    c_vals = [(a_vals[i] * b_vals[i] + a_vals[i]) % rc.FR for i in range(N)]
    # make the copy constraints true: a[2] == b[7] (both set to 2)
    b_vals[7] = a_vals[2]
    c_vals[7] = (a_vals[7] * b_vals[7] + a_vals[7]) % rc.FR
    instances = [[c_vals[1]]]

    copies = [
        ((ADVICE, c.index, 1), (INSTANCE, pi.index, 0)),
        ((ADVICE, a.index, 2), (ADVICE, b.index, 7)),
    ]
    data = CircuitData(cs=cs, k=K, fixed=fixed, copies=copies,
                       num_instance=[1])
    advice = jnp.stack([Fr.from_ints(a_vals), Fr.from_ints(b_vals),
                        Fr.from_ints(c_vals)])
    assert usable > 32
    return data, advice, instances


@pytest.fixture(scope="module")
def toy():
    data, advice, instances = build_toy()
    params = setup(K)
    pk = keygen(params, data)
    return data, advice, instances, params, pk


def test_mock_satisfied(toy):
    data, advice, instances, _, _ = toy
    assert run_mock(data, advice, instances) == []


def test_mock_catches_bad_witness(toy):
    data, advice, instances, _, _ = toy
    bad = advice.at[2, 1].set(Fr.from_ints([999])[0])  # break c[1]
    fails = run_mock(data, bad, instances, raise_on_failure=False)
    assert fails


def test_prove_and_verify_poseidon(toy):
    data, advice, instances, params, pk = toy
    proof = create_proof(params, pk, advice, instances, PoseidonTranscript())
    assert isinstance(proof, bytes) and len(proof) > 0
    assert verify_proof(params, pk.vk, instances, proof, PoseidonTranscript)


def test_verify_rejects_wrong_instance(toy):
    data, advice, instances, params, pk = toy
    proof = create_proof(params, pk, advice, instances, PoseidonTranscript())
    bad_inst = [[(instances[0][0] + 1) % rc.FR]]
    assert not verify_proof(params, pk.vk, bad_inst, proof, PoseidonTranscript)


def test_verify_rejects_tampered_proof(toy):
    data, advice, instances, params, pk = toy
    proof = bytearray(
        create_proof(params, pk, advice, instances, PoseidonTranscript()))
    # flip a low bit of some scalar in the middle of the proof
    proof[len(proof) // 2] ^= 1
    try:
        ok = verify_proof(params, pk.vk, instances, bytes(proof),
                          PoseidonTranscript)
    except ValueError:
        ok = False  # deserialization rejected the tampered point/scalar
    assert not ok


def test_prove_and_verify_keccak(toy):
    """The EVM-flavored transcript drives the same pipeline."""
    data, advice, instances, params, pk = toy
    proof = create_proof(params, pk, advice, instances, KeccakTranscript())
    assert verify_proof(params, pk.vk, instances, proof, KeccakTranscript)


def test_loader_core_verifier_agrees(toy):
    """verify_core(NativeLoader) must agree with the standalone verifier."""
    from halo2_zkcert_tpu.plonk.verifier_core import verify_proof_core
    data, advice, instances, params, pk = toy
    proof = create_proof(params, pk, advice, instances, PoseidonTranscript())
    assert verify_proof_core(params, pk.vk, instances, proof, PoseidonTranscript)
    bad = [[(instances[0][0] + 1) % rc.FR]]
    assert not verify_proof_core(params, pk.vk, bad, proof, PoseidonTranscript)


def test_fused_gp_matches_streaming_bytes(toy, monkeypatch, capsys):
    """The fused grand-product program (prover._gp_fn, small domains) and
    the streaming per-column pipeline (forced via H2T_SELFCHECK=3) must
    produce byte-identical proofs — same math, same blinding draw order."""
    data, advice, instances, params, pk = toy
    fused = create_proof(params, pk, advice, instances, PoseidonTranscript())
    monkeypatch.setenv("H2T_SELFCHECK", "3")
    streamed = create_proof(params, pk, advice, instances,
                            PoseidonTranscript())
    out = capsys.readouterr().out
    assert "VIOLATED" not in out
    assert fused == streamed


def test_fused_multiopen_matches_eager_bytes(toy, monkeypatch):
    """The two fused multiopen programs (shplonk._fused_open_progs) and the
    dispatch-per-op path (H2T_MULTIOPEN=eager) must produce byte-identical
    proofs."""
    data, advice, instances, params, pk = toy
    fused = create_proof(params, pk, advice, instances, PoseidonTranscript())
    monkeypatch.setenv("H2T_MULTIOPEN", "eager")
    eager = create_proof(params, pk, advice, instances, PoseidonTranscript())
    assert fused == eager


def test_coset_quotient_with_stash_matches_bytes(toy, monkeypatch):
    """Force the big-circuit configuration on the toy: coset-separated
    quotient (H2T_EXT_BUDGET_BYTES=1), u8 column residency + witness
    stash-to-host during the coset loop (H2T_U8_MIN_N=1).  Proof bytes
    must match the default one-shot pipeline (exact arithmetic; identical
    piece polynomials; blinding order unchanged)."""
    data, advice, instances, params, pk = toy
    base = create_proof(params, pk, advice, instances, PoseidonTranscript())
    monkeypatch.setenv("H2T_EXT_BUDGET_BYTES", "1")
    monkeypatch.setenv("H2T_U8_MIN_N", "1")
    pk.__dict__.pop("_quotient_prog", None)   # re-select the coset pipeline
    forced = create_proof(params, pk, advice, instances, PoseidonTranscript())
    pk.__dict__.pop("_quotient_prog", None)
    assert forced == base
    assert verify_proof(params, pk.vk, instances, forced, PoseidonTranscript)
