"""Bigint tape + ECC gadget: constraint satisfaction & soundness probes.

Parity target: halo2-ecc's fp/ecc chip test coverage [dep Cargo.lock:1199]
(non-native mul/add correctness, EC group law, MSM vs host reference) on
the challenge-based tape design (docs/AGGREGATION_DESIGN.md).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from halo2_zkcert_tpu.circuits.composed import ComposedCircuit
from halo2_zkcert_tpu.circuits.ecc_gadget import EccGadget
from halo2_zkcert_tpu.plonk import run_mock
from halo2_zkcert_tpu.utils import refcrypto as rc

pytestmark = pytest.mark.slow  # proving/mock at circuit scale; fast tier = -m 'not slow'


A_VAL = 0x1234567890ABCDEF1234567890ABCDEF1234567890ABCDEF1234567890ABCD
B_VAL = 0xFEDCBA0987654321FEDCBA0987654321FEDCBA0987654321FEDCBA09876543


def _mock(circ: ComposedCircuit, tamper=None, expect_fail=False):
    witness_fn, instances = circ.witness()
    if tamper is None:
        fails = run_mock(circ.data, witness_fn, instances,
                         raise_on_failure=False)
    else:
        # materialize all phases, then corrupt
        from halo2_zkcert_tpu.plonk.mock import mock_challenges
        ch = mock_challenges(circ.cs)
        cols = [None] * circ.cs.num_advice
        for phase in range(circ.cs.num_phases):
            avail = {i: ch[i] for i in range(circ.cs.num_challenges)
                     if circ.cs.challenge_phases[i] < phase}
            for i, v in witness_fn(phase, avail).items():
                cols[i] = v
        adv = jnp.stack(cols)
        adv = tamper(adv)
        fails = run_mock(circ.data, adv, instances, raise_on_failure=False)
    if expect_fail:
        assert fails, "tampered witness must violate constraints"
    else:
        assert fails == [], f"unexpected failures: {fails[:5]}"


def test_mulmod_lincomb_mock():
    def program(gb, tape):
        a = tape.witness_elem(A_VAL)
        b = tape.witness_elem(B_VAL)
        z = tape.mulmod(a, b)
        assert z.value == A_VAL * B_VAL % rc.FQ
        s = tape.add(a, b)
        d = tape.sub(a, b)
        assert d.value % rc.FQ == (A_VAL - B_VAL) % rc.FQ
        r = tape.reduce(d)
        assert r.value == (A_VAL - B_VAL) % rc.FQ
        tape.assert_eq_mod(s, tape.constant_elem((A_VAL + B_VAL) % rc.FQ))
        w = tape.mulmod(z, s)
        tape.assert_eq_mod(
            w, tape.constant_elem(
                (A_VAL * B_VAL % rc.FQ) * ((A_VAL + B_VAL) % rc.FQ) % rc.FQ))

    circ = ComposedCircuit(program, k=17)
    _mock(circ)


def test_tampered_limb_fails():
    def program(gb, tape):
        a = tape.witness_elem(A_VAL)
        b = tape.witness_elem(B_VAL)
        tape.mulmod(a, b)

    circ = ComposedCircuit(program, k=17)

    def tamper(adv):
        # flip one V-lane limb inside the first witnessed ('w') region
        reg = next(r for r in circ._pass0.tape.regions if r.kind == "w")
        v_col = circ.v_indices[reg.lane]
        return adv.at[v_col, reg.start + 2, 0].add(1)

    _mock(circ, tamper=tamper, expect_fail=True)


def test_ec_add_double_mock():
    g = rc.G1_GEN
    g2 = rc.g1_to_affine(rc.g1_double(rc.g1_from_affine(g)))
    g3 = rc.g1_to_affine(rc.g1_add(rc.g1_from_affine(g),
                                   rc.g1_from_affine(g2)))

    def program(gb, tape):
        ecc = EccGadget(tape)
        p = ecc.witness_point(g)
        q = ecc.witness_point(g2)
        s = ecc.add(p, q)
        assert s.value == g3
        d = ecc.double(p)
        assert d.value == g2
        # pin results against constants (closes the loop in-circuit)
        tape.assert_eq_mod(s.x, tape.constant_elem(g3[0]))
        tape.assert_eq_mod(s.y, tape.constant_elem(g3[1]))
        tape.assert_eq_mod(d.x, tape.constant_elem(g2[0]))

    circ = ComposedCircuit(program, k=17)
    _mock(circ)


def test_msm_small_mock():
    g = rc.g1_from_affine(rc.G1_GEN)
    p1 = rc.g1_to_affine(rc.g1_mul(g, 7))
    p2 = rc.g1_to_affine(rc.g1_mul(g, 11))
    s1, s2 = 0xBEEF, 0x1234
    expect = rc.g1_to_affine(rc.g1_mul(g, (7 * s1 + 11 * s2) % rc.FR))

    def program(gb, tape):
        ecc = EccGadget(tape)
        a = ecc.witness_point(p1)
        b = ecc.witness_point(p2)
        out = ecc.msm([a, b], [gb.witness(s1), gb.witness(s2)], nbits=16)
        assert out.value == expect
        tape.assert_eq_mod(out.x, tape.constant_elem(expect[0]))
        tape.assert_eq_mod(out.y, tape.constant_elem(expect[1]))

    circ = ComposedCircuit(program, k=17, lanes=2, na=2)
    rep = circ.rows_report()
    assert max(rep["tape_rows"]) <= rep["usable"]
    _mock(circ)
