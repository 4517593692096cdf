"""Composed circuits: GateBuilder trace + BigintTape lanes in ONE
ConstraintSystem — the assembly layer for the aggregation circuit
(docs/AGGREGATION_DESIGN.md).

Reference analog: halo2-base's `BaseCircuitBuilder` packing multiple chip
regions into one circuit [dep Cargo.lock:1135].  TPU-first difference: the
composed circuit is still a *static* CircuitData + vectorized advice
arrays; the builder/tape record pass is pure host bookkeeping.

Two-pass witness protocol (the tape's phase-1 Horner evals depend on the
challenge tau, which only exists mid-proof):
  * build pass (keygen + phase-0 witness): run the program with a fixed
    dummy tau — structure and all phase-0 (V-lane) values are
    tau-independent;
  * phase-1 pass: re-run the program with the real squeezed tau; emit the
    A-lane and builder columns.  A structure fingerprint asserts the two
    passes laid out identically.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..builder import GateBuilder
from ..ops import limbs
from ..utils import refcrypto as rc
from ..plonk import CircuitData, ConstraintSystem
from .bigint_tape import BigintTape

# deterministic dummy challenge for structure/keygen passes
DUMMY_TAU = int.from_bytes(rc.blake2b(b"h2t-dummy-tau", 32), "little") % rc.FR


@dataclass
class _Pass:
    gb: GateBuilder
    tape: BigintTape
    instances: list


class ComposedCircuit:
    """program(gb, tape) records the circuit; this class wires it up.

    The program must be deterministic in structure (op counts, constants,
    region shapes) across tau values — only cell VALUES may differ.
    """

    def __init__(self, program, k: int, lanes: int = 1, na: int = 1,
                 nl: int = 1, modulus: int = rc.FQ, lookup_bits: int = 16):
        self.program = program
        self.k = k
        self.lanes = lanes
        self.na, self.nl = na, nl
        self.modulus = modulus
        self.lookup_bits = lookup_bits
        self._build()

    def _run(self, tau: int) -> _Pass:
        gb = GateBuilder(lookup_bits=self.lookup_bits)
        tape = BigintTape(gb, tau, self.modulus, self.lanes)
        self.program(gb, tape)
        return _Pass(gb, tape, [list(gb.values[i] for i in gb.instance_cells)]
                     if gb.instance_cells else [])

    @staticmethod
    def fingerprint(p: _Pass) -> tuple:
        return (len(p.gb.values), tuple(p.gb.gate_rows),
                tuple(p.gb.copies), tuple(v for _, v in p.gb.const_cells),
                tuple(p.gb.range_checked), tuple(p.gb.instance_cells),
                tuple((r.kind, r.lane, r.length) for r in p.tape.regions),
                tuple(p.tape._limb_copies))

    def _build(self) -> None:
        p = self._run(DUMMY_TAU)
        self._fp = self.fingerprint(p)
        cs = ConstraintSystem()
        tau = cs.challenge(phase=0)
        tcols = p.tape.register(cs, tau)
        bcols = p.gb.register(cs, self.na, self.nl, phase=1,
                              table=tcols["table"])
        n = 1 << self.k
        p.tape.layout(cs, n)

        fixed = np.zeros((cs.num_fixed, n), dtype=object)
        fixed[:] = 0
        packed = p.gb.pack(cs, bcols, n)
        for ci, r, v in packed["fixed"]:
            fixed[ci][r] = v
        v_vals, a_vals, tape_copies = p.tape.materialize(
            cs, tcols, n, packed["placement"], bcols["adv"], fixed)
        copies = packed["copies"] + tape_copies
        num_inst = ([len(p.gb.instance_cells)] if p.gb.instance_cells else [])
        self.data = CircuitData(cs=cs, k=self.k, fixed=fixed, copies=copies,
                                num_instance=num_inst)
        self.cs = cs
        self._tcols, self._bcols = tcols, bcols
        self._pass0 = p
        # column index groups for the witness fn
        self.v_indices = [c.index for c in tcols["v_cols"]]
        self.a_indices = [c.index for c in tcols["a_cols"]]
        self.b_indices = [c.index for c in bcols["adv"] + bcols["lk_adv"]]
        self._v_vals0 = v_vals

    def rows_report(self) -> dict:
        return {"tape_rows": self._pass0.tape.rows_used(),
                "builder_cells": len(self._pass0.gb.values),
                "usable": self.cs.usable_rows(1 << self.k)}

    # ---- witness --------------------------------------------------------------

    def witness(self):
        """-> (witness_fn, instances) for create_proof / run_mock."""
        n = 1 << self.k
        instances = self._pass0.instances

        def to_limbs(vals) -> jnp.ndarray:
            return jnp.asarray(limbs.ints_to_limbs(
                [int(v) % rc.FR for v in vals], limbs.NLIMBS))

        def witness_fn(phase: int, challenges: dict):
            if phase == 0:
                return {i: to_limbs(self._v_vals0[j])
                        for j, i in enumerate(self.v_indices)}
            tau = challenges[0]
            p = self._run(tau)
            assert self.fingerprint(p) == self._fp, \
                "tau-dependent circuit structure (program bug)"
            p.tape.layout(self.cs, n)
            packed = p.gb.pack(self.cs, self._bcols, n)
            fixed_scratch = np.zeros_like(self.data.fixed)
            v_vals, a_vals, _ = p.tape.materialize(
                self.cs, self._tcols, n, packed["placement"],
                self._bcols["adv"], fixed_scratch)
            for j in range(len(self.v_indices)):
                assert list(v_vals[j]) == list(self._v_vals0[j]), \
                    "phase-0 values changed with tau (program bug)"
            out = {i: to_limbs(a_vals[j])
                   for j, i in enumerate(self.a_indices)}
            for j, i in enumerate(self.b_indices):
                out[i] = to_limbs(packed["advice"][j])
            return out

        return witness_fn, instances
