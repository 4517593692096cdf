"""MockProver: constraint satisfaction check without proving.

Reference behavior: halo2_proofs `MockProver` (axiom fork [dep]
Cargo.lock:1320; SURVEY.md §4 "fake backend"): evaluates every gate,
lookup and copy constraint directly over the witness table.

Device-vectorized: gate expressions evaluate over the full Lagrange domain
in one shot; failures are reported with (gate, row) coordinates.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import frops, limbs
from ..ops.field import FR, Fr
from ..utils import refcrypto as rc
from . import expression as ex
from .assignment import CircuitData
from .cs import ADVICE, FIXED, INSTANCE


class MockFailure(AssertionError):
    pass


def mock_challenges(csys) -> dict:
    """Deterministic pseudo-random challenges for MockProver runs (the
    real ones are transcript-derived; for constraint checking any
    unpredictable-to-the-circuit value works)."""
    out = {}
    for i in range(csys.num_challenges):
        d = rc.blake2b(b"mock-challenge" + i.to_bytes(4, "little"), 64)
        out[i] = rc.fr_from_u512_le(d[:32], d[32:])
    return out


def run_mock(data: CircuitData, advice, instances: list,
             raise_on_failure: bool = True) -> list:
    """Returns a list of failure strings (empty == satisfied).

    `advice` is an (num_advice, n, NL) array or a per-phase callable (same
    contract as create_proof); challenges are `mock_challenges`.
    """
    csys = data.cs
    n = data.n
    usable = csys.usable_rows(n)
    failures = []

    challenges = mock_challenges(csys)
    if callable(advice):
        cols: list = [None] * csys.num_advice
        for phase in range(csys.num_phases):
            # challenges of earlier phases are available (halo2 semantics)
            ch = {i: challenges[i] for i in range(csys.num_challenges)
                  if csys.challenge_phases[i] < phase}
            for i, colv in advice(phase, ch).items():
                cols[i] = colv
        advice = jnp.stack(cols)

    fixed = data.fixed_limbs()
    inst = [Fr.from_ints(list(col) + [0] * (n - len(col))) for col in instances]
    while len(inst) < csys.num_instance:
        inst.append(Fr.from_ints([0] * n))

    # Row-chunked evaluation: a deep gate forest evaluated eagerly over the
    # full column height allocates one (n, NL) temporary per expression node
    # — the aggregation tape at k=19 exhausted the 16 GB of v5e HBM that
    # way.  Rotations wrap, so a chunk's leaves are gathered with modular
    # row indices from the full columns; everything downstream is (C, NL).
    CHUNK = min(n, 1 << 16)

    def leaf_eval(e, off, length):
        idx = (jnp.arange(off, off + length)) % n

        def rot_take(col, r):
            return jnp.take(col, (idx + r) % n, axis=0)

        return ex.evaluate(
            e,
            constant=lambda v: jnp.broadcast_to(
                Fr.from_ints([v % rc.FR])[0][None], (length, limbs.NLIMBS)),
            fixed=lambda i, r: rot_take(fixed[i], r),
            advice=lambda i, r: rot_take(advice[i], r),
            instance=lambda i, r: rot_take(inst[i], r),
            challenge=lambda i: jnp.broadcast_to(
                Fr.from_ints([challenges[i]])[0][None],
                (length, limbs.NLIMBS)),
            add=frops.add, mul=frops.mul,
            scale=lambda a, s: frops.mul(a, jnp.broadcast_to(
                Fr.from_ints([s % rc.FR])[0][None],
                (a.shape[0], limbs.NLIMBS))),
        )

    def eval_rows(e, upto):
        """Evaluate expression over rows [0, upto) in bounded chunks,
        fetching each chunk to host (the fetch doubles as the in-flight
        memory barrier)."""
        outs = []
        for off in range(0, upto, CHUNK):
            length = min(CHUNK, upto - off)
            outs.append(np.asarray(leaf_eval(e, off, length)))
        return np.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]

    # gates vanish on every usable row
    for name, g in csys.gates:
        bad_count = 0
        for off in range(0, usable, CHUNK):
            length = min(CHUNK, usable - off)
            vals = leaf_eval(g, off, length)
            zero = np.asarray(limbs.is_zero(FR, vals))
            bad = np.where(~zero)[0]
            for row in bad[:5 - bad_count]:
                failures.append(
                    f"gate '{name}' not satisfied at row {off + int(row)}")
            bad_count += len(bad)
            if bad_count >= 5:
                break

    # lookups: every (theta-free) input tuple appears in the table tuple set
    for lk in csys.lookups:
        in_cols = [Fr.to_ints(eval_rows(p[0], usable)) for p in lk.pairs]
        tb_cols = [Fr.to_ints(eval_rows(p[1], usable)) for p in lk.pairs]
        table = set(tuple(int(c[r]) for c in tb_cols) for r in range(usable))
        for r in range(usable):
            tup = tuple(int(c[r]) for c in in_cols)
            if tup not in table:
                failures.append(
                    f"lookup '{lk.name}' failure at row {r}: {tup} not in table")
                break

    # copy constraints
    cols = {}

    def col_ints(kind, idx):
        key = (kind, idx)
        if key not in cols:
            src = {FIXED: fixed, ADVICE: advice}.get(kind)
            arr = inst[idx] if kind == INSTANCE else src[idx]
            cols[key] = np.asarray(Fr.to_ints(arr))
        return cols[key]

    for (a, b) in data.copies:
        va = int(col_ints(a[0], a[1])[a[2]])
        vb = int(col_ints(b[0], b[1])[b[2]])
        if va != vb:
            failures.append(f"copy constraint violated: {a}={va} != {b}={vb}")

    if failures and raise_on_failure:
        raise MockFailure("\n".join(failures[:20]))
    return failures
