"""Vertical-gate trace builder — the halo2-base equivalent (SURVEY.md §7
step 6; reference: `BaseCircuitBuilder`/`GateChip`/`RangeChip`, halo2-base
[dep] Cargo.lock:1135).

A circuit is recorded as a flat *trace* of cells over one virtual column
with the single vertical gate

    q[i] * (v[i] + v[i+1] * v[i+2] - v[i+3]) = 0

(each arithmetic op appends 4 cells [acc_in, a, b, out]; reused values are
linked with copy constraints, like halo2-base's Existing/Witness cells).
`finalize()` packs the virtual trace into `num_advice` physical columns
(halo2-base break-point packing: a gate never straddles a column boundary),
pins constants by copy against a shared fixed column, routes range-checked
cells into lookup-advice columns checked against a `lookup_bits` table, and
auto-sizes the column count for a target k (`calculate_params`, reference
helpers.rs:169-171 [dep]).

Values are computed eagerly (host ints) while recording, so one code path
serves both structure building (keygen) and witness generation (proving).
NOTE(perf): for big traces the op tape can be replayed as a vectorized
device program — tracked optimization, not needed for correctness.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from .ops import limbs
from .utils import refcrypto as rc
from .plonk import ADVICE, FIXED, INSTANCE, CircuitData, Column, ConstraintSystem
from .plonk import expression as ex

P = rc.FR


@dataclass(frozen=True)
class Cell:
    """Handle to a virtual-trace position."""
    index: int
    value: int


class GateBuilder:
    def __init__(self, lookup_bits: int = 16):
        self.values: list = []
        self.gate_rows: list = []       # trace offsets where the gate fires
        self.copies: list = []          # (idx_a, idx_b)
        self.constants: dict = {}       # value -> trace index (first pin)
        self.const_cells: list = []     # (trace idx, value) needing fixed pin
        self.range_checked: list = []   # trace idx (must be < 2^lookup_bits)
        self.lookup_bits = lookup_bits
        self.instance_cells: list = []

    # ---- raw trace ops -------------------------------------------------------

    def _push(self, v: int) -> int:
        self.values.append(v % P)
        return len(self.values) - 1

    def witness(self, v: int) -> Cell:
        return Cell(self._push(v), v % P)

    def constant(self, c: int) -> Cell:
        c %= P
        if c in self.constants:
            return Cell(self.constants[c], c)
        i = self._push(c)
        self.constants[c] = i
        self.const_cells.append((i, c))
        return Cell(i, c)

    def _gate(self, a: Cell, b: Cell, c: Cell, out_val: int) -> Cell:
        base = len(self.values)
        for cell in (a, b, c):
            idx = self._push(cell.value)
            self.copies.append((cell.index, idx))
        out = self._push(out_val)
        self.gate_rows.append(base)
        return Cell(out, out_val % P)

    # ---- arithmetic (halo2-base GateInstructions parity) ----------------------

    def add(self, a: Cell, b: Cell) -> Cell:
        return self._gate(a, b, self.constant(1), a.value + b.value)

    def sub(self, a: Cell, b: Cell) -> Cell:
        return self._gate(a, b, self.constant(P - 1), a.value - b.value)

    def mul(self, a: Cell, b: Cell) -> Cell:
        return self._gate(self.constant(0), a, b, a.value * b.value)

    def mul_add(self, a: Cell, b: Cell, c: Cell) -> Cell:
        """c + a*b in one row."""
        return self._gate(c, a, b, c.value + a.value * b.value)

    def neg(self, a: Cell) -> Cell:
        return self.mul(a, self.constant(P - 1))

    def square(self, a: Cell) -> Cell:
        return self.mul(a, a)

    def add_const(self, a: Cell, c: int) -> Cell:
        return self.add(a, self.constant(c))

    def mul_const(self, a: Cell, c: int) -> Cell:
        return self.mul(a, self.constant(c))

    def inner_product(self, xs: list, ys: list) -> Cell:
        acc = self.mul(xs[0], ys[0])
        for x, y in zip(xs[1:], ys[1:]):
            acc = self.mul_add(x, y, acc)
        return acc

    def horner(self, coeffs_msb_first: list, x: Cell) -> Cell:
        acc = coeffs_msb_first[0]
        for c in coeffs_msb_first[1:]:
            acc = self.mul_add(acc, x, c)
        return acc

    def pow5(self, a: Cell) -> Cell:
        a2 = self.square(a)
        a4 = self.square(a2)
        return self.mul(a4, a)

    def assert_equal(self, a: Cell, b: Cell) -> None:
        self.copies.append((a.index, b.index))

    def assert_const(self, a: Cell, c: int) -> None:
        self.assert_equal(a, self.constant(c))

    def assert_bit(self, a: Cell) -> None:
        self.assert_equal(self.square(a), a)

    def select(self, cond: Cell, a: Cell, b: Cell) -> Cell:
        """cond ? a : b (cond must be a constrained bit)."""
        d = self.sub(a, b)
        return self.mul_add(cond, d, b)

    def is_zero(self, a: Cell) -> Cell:
        inv = self.witness(rc.finv(a.value, P))
        out = self.witness(1 if a.value % P == 0 else 0)
        self.assert_const(self.mul_add(a, inv, out), 1)
        self.assert_const(self.mul(a, out), 0)
        return out

    def range_check(self, a: Cell, bits: int) -> None:
        """Decompose into lookup_bits chunks looked up against the table."""
        lb = self.lookup_bits
        if bits <= lb:
            if bits == lb:
                self.range_checked.append(a.index)
            else:
                # tight check: a << (lb-bits) must also be a table entry
                sh = self.mul_const(a, 1 << (lb - bits))
                self.range_checked.append(a.index)
                self.range_checked.append(sh.index)
            return
        nchunks = (bits + lb - 1) // lb
        v = a.value
        chunks = []
        for i in range(nchunks):
            cbits = min(lb, bits - i * lb)
            cv = (v >> (i * lb)) & ((1 << cbits) - 1)
            c = self.witness(cv)
            self.range_checked.append(c.index)
            if cbits < lb:
                sh = self.mul_const(c, 1 << (lb - cbits))
                self.range_checked.append(sh.index)
            chunks.append(c)
        acc = chunks[-1]
        for i in range(nchunks - 2, -1, -1):
            acc = self.mul_add(acc, self.constant(1 << lb), chunks[i])
        self.assert_equal(acc, a)

    def expose_public(self, a: Cell) -> None:
        self.instance_cells.append(a.index)

    # ---- packing ---------------------------------------------------------------

    def calculate_params(self, k: int, minimum_rows: int = 10) -> dict:
        usable = (1 << k) - minimum_rows - 10
        num_advice = max(1, -(-len(self.values) // usable))
        num_lookup = max(1, -(-len(self.range_checked) // usable)) \
            if self.range_checked else 0
        return {"k": k, "num_advice": num_advice,
                "num_lookup_advice": num_lookup,
                "lookup_bits": self.lookup_bits}

    def register(self, cs: ConstraintSystem, na: int, nl: int,
                 phase: int = 0, table=None):
        """Register this trace's columns/gates/lookups into `cs` (shared-CS
        composition — the aggregation circuit packs builder columns next to
        bigint-tape columns; reference analog: halo2-base phase columns
        inside one ConstraintSystem [dep]).

        Returns a dict of column handles. `table` is an existing 2^lookup_bits
        range-table fixed column to share (created here if None and nl > 0).
        """
        adv = [cs.advice_column(phase=phase) for _ in range(na)]
        lk_adv = [cs.advice_column(phase=phase) for _ in range(nl)]
        inst = cs.instance_column() if self.instance_cells else None
        selectors = [cs.fixed_column() for _ in range(na)]
        f_const = cs.fixed_column()
        if nl and table is None:
            table = cs.fixed_column()
            for_table_fill = True
        else:
            for_table_fill = False

        for j, col in enumerate(adv):
            A = lambda r, cj=col: ex.Advice(cj.index, r, phase=phase)
            cs.create_gate(f"vgate{col.index}",
                           selectors[j] * (A(0) + A(1) * A(2) - A(3)))
        for col in lk_adv:
            # max_bits: prover hint (bounded-window commits + 1-word sort
            # keys); lookup-advice values are copies of range-checked cells
            cs.add_lookup(f"range{col.index}",
                          [(ex.Advice(col.index, phase=phase), table)],
                          max_bits=self.lookup_bits)
        for col in adv + lk_adv:
            cs.enable_permutation(Column(ADVICE, col.index))
        cs.enable_permutation(Column(FIXED, f_const.index))
        if inst is not None:
            cs.enable_permutation(Column(INSTANCE, inst.index))
        return {"adv": adv, "lk_adv": lk_adv, "inst": inst,
                "selectors": selectors, "f_const": f_const, "table": table,
                "fill_table": for_table_fill}

    def finalize(self, k: int, params: dict | None = None):
        """-> (CircuitData, advice_array, instances).

        Layout: advice columns A_0..A_{na-1} (each with its own selector
        fixed column), lookup-advice columns, one constants fixed column
        (copy-pinned), one table fixed column.
        """
        cfg = params or self.calculate_params(k)
        n = 1 << k
        na, nl = cfg["num_advice"], cfg["num_lookup_advice"]
        if self.range_checked:
            assert self.lookup_bits <= k - 1, "table must fit the column"

        cs = ConstraintSystem()
        cols = self.register(cs, na, nl)
        adv, lk_adv, inst = cols["adv"], cols["lk_adv"], cols["inst"]
        selectors, f_const, table = (cols["selectors"], cols["f_const"],
                                     cols["table"])

        usable = cs.usable_rows(n)
        packed = self.pack(cs, cols, n)
        fixed = np.zeros((cs.num_fixed, n), dtype=object)
        for ci, r, v in packed["fixed"]:
            fixed[ci][r] = v
        if table is not None:
            for r in range(1 << self.lookup_bits):
                fixed[table.index][r] = r

        data = CircuitData(cs=cs, k=k, fixed=fixed, copies=packed["copies"],
                           num_instance=[len(self.instance_cells)]
                           if inst is not None else [])
        total_adv = na + nl
        adv_vals = packed["advice"]
        arr = np.zeros((total_adv, n, limbs.NLIMBS), dtype=np.int32)
        for j in range(total_adv):
            arr[j] = limbs.ints_to_limbs(list(adv_vals[j]), limbs.NLIMBS)
        return data, jnp.asarray(arr), packed["instances"]

    def pack(self, cs: ConstraintSystem, cols: dict, n: int):
        """Place the virtual trace into the registered columns.

        Returns {placement, advice (object array, registered-cols only),
        fixed [(col,row,val)], copies [CircuitData format], instances}.
        Shared-CS callers merge these into their own arrays.
        """
        adv, lk_adv, inst = cols["adv"], cols["lk_adv"], cols["inst"]
        selectors, f_const = cols["selectors"], cols["f_const"]
        na, nl = len(adv), len(lk_adv)
        usable = cs.usable_rows(n)
        placement: dict = {}
        gate_set = set(self.gate_rows)
        col_i, row = 0, 0
        for idx in range(len(self.values)):
            if (idx in gate_set and row + 4 > usable) or row >= usable:
                col_i += 1
                row = 0
            assert col_i < na, \
                f"trace needs more columns: {len(self.values)} cells, n={n}"
            placement[idx] = (col_i, row)
            row += 1

        fixed = []
        for g in self.gate_rows:
            cj, r = placement[g]
            fixed.append((selectors[cj].index, r, 1))
        const_rows: dict = {}
        for i, (idx, val) in enumerate(self.const_cells):
            assert i < usable, "too many distinct constants"
            fixed.append((f_const.index, i, val))
            const_rows[idx] = i

        total_adv = na + nl
        adv_vals = np.zeros((total_adv, n), dtype=object)
        adv_vals[:] = 0
        for idx, (cj, r) in placement.items():
            adv_vals[cj][r] = self.values[idx]

        copies = []
        for a_idx, b_idx in self.copies:
            ca, ra = placement[a_idx]
            cb, rb = placement[b_idx]
            copies.append(((ADVICE, adv[ca].index, ra),
                           (ADVICE, adv[cb].index, rb)))
        for idx, fr_row in const_rows.items():
            cj, r = placement[idx]
            copies.append(((ADVICE, adv[cj].index, r),
                           (FIXED, f_const.index, fr_row)))
        lk_cursor = 0
        for idx in self.range_checked:
            cj, r = placement[idx]
            lcol = lk_cursor // usable
            lrow = lk_cursor % usable
            assert lcol < nl, "need more lookup-advice columns"
            adv_vals[na + lcol][lrow] = self.values[idx]
            copies.append(((ADVICE, adv[cj].index, r),
                           (ADVICE, lk_adv[lcol].index, lrow)))
            lk_cursor += 1
        instances = []
        if inst is not None:
            vals = []
            for i, idx in enumerate(self.instance_cells):
                cj, r = placement[idx]
                copies.append(((ADVICE, adv[cj].index, r),
                               (INSTANCE, inst.index, i)))
                vals.append(self.values[idx])
            instances = [vals]
        return {"placement": placement, "advice": adv_vals, "fixed": fixed,
                "copies": copies, "instances": instances}
