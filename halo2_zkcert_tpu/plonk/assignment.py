"""Concrete circuit data: fixed columns, equality constraints, witness hooks.

In this framework a circuit is compiled (host-side, once) into:
  * a `ConstraintSystem` (static gates/lookups/permutation metadata),
  * fixed-column value arrays,
  * the equality-constraint (copy) list,
  * a witness program: inputs -> advice arrays (vectorized JAX).

This replaces the reference's trait-object `Circuit::synthesize` machinery
(halo2_proofs [dep] Cargo.lock:1320) with flat arrays — the TPU-first
"batch pipeline over flat arrays" design from SURVEY.md §7.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np
import jax.numpy as jnp

from ..ops import limbs
from ..utils import refcrypto as rc
from .cs import ADVICE, DELTA, FIXED, INSTANCE, Column, ConstraintSystem


@dataclass
class CircuitData:
    """Static circuit description + fixed assignment (the keygen input)."""
    cs: ConstraintSystem
    k: int
    # (num_fixed, n) object/int64 numpy of field values (host ints; converted
    # to limbs lazily) — fixed columns are built host-side once at keygen.
    fixed: np.ndarray
    # equality constraints: ((kind, col, row), (kind, col, row))
    copies: list = field(default_factory=list)
    # per instance column, how many leading rows carry public values
    num_instance: list = field(default_factory=list)
    # optional vectorized gate evaluator for the quotient pass (pure JAX,
    # fn(ctx) -> [gate values] aligned with cs.gates; see prover._QuotientCtx).
    # Not serialized — sdk.gen_pk re-grafts it onto loaded proving keys.
    quotient_custom: Callable | None = None
    # aggregation circuits: [(col, row)] of the 8 accumulator limb instances
    accumulator_indices: list | None = None

    @property
    def n(self) -> int:
        return 1 << self.k

    def cache_digest_bytes(self) -> bytes:
        """Digest for pk-cache validation (sdk.gen_pk).

        cs.digest_bytes() covers circuit STRUCTURE only — two circuits can
        share a cs but differ in fixed-column values or the copy list (e.g.
        a different baked constant), which changes the pk.  Hashing every
        fixed value is minutes of host Python at k=20, so fixed columns and
        copies are hashed by deterministic SAMPLE (all columns, strided
        rows + head/tail).  Collision-resistant against accidental drift
        (the cache is a local trust boundary, not an adversarial one).
        """
        h = rc  # alias for brevity
        parts = [self.cs.digest_bytes(),
                 f"k={self.k};ninst={self.num_instance};"
                 f"acc={self.accumulator_indices}".encode()]
        n = self.n
        step = max(1, n // 2048)
        rows = sorted(set(range(0, n, step)) | set(range(min(64, n)))
                      | set(range(max(0, n - 64), n)))
        for col in self.fixed:
            parts.append(b"|col|")
            parts.extend((int(col[r]) % rc.FR).to_bytes(32, "little")
                         for r in rows)
        cp = self.copies
        parts.append(f"ncopies={len(cp)}".encode())
        cstep = max(1, len(cp) // 4096)
        sample = list(cp[:256]) + list(cp[-256:]) + list(cp[::cstep])
        parts.append(repr(sample).encode())
        return h.blake2b(b"".join(parts), 32, persona=b"h2t-pkcache")

    def fixed_limbs(self) -> jnp.ndarray:
        """(num_fixed, n, NLIMBS) device array of the fixed columns —
        canonical-u8 (values are reduced host-side, so limbs are bytes;
        big circuits' 50+ fixed columns must not burn 4x HBM as int32).
        Consumers upcast inside their programs."""
        cols = [limbs.ints_to_limbs([int(v) % rc.FR for v in col], limbs.NLIMBS)
                for col in self.fixed]
        if not cols:
            return jnp.zeros((0, self.n, limbs.NLIMBS), jnp.uint8)
        return jnp.asarray(np.stack(cols).astype(np.uint8))


def permutation_mapping(data: CircuitData) -> np.ndarray:
    """Build the sigma mapping from the copy list.

    Returns `mapping` of shape (num_perm_columns, n, 2) where
    mapping[c, r] = (c', r'): the next cell in the cycle containing (c, r)
    (identity for unconstrained cells).  Cells are identified by their
    position in cs.permutation_columns.

    Reference behavior: halo2_proofs permutation::keygen::Assembly [dep] —
    same cycle semantics, different (but equivalent) cycle orientation.
    """
    csys = data.cs
    n = data.n
    cols = csys.permutation_columns
    col_pos = {(c.kind, c.index): i for i, c in enumerate(cols)}
    m = len(cols)
    # union-find over m*n cells
    parent = np.arange(m * n, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def cell_id(kind: str, col: int, row: int) -> int:
        pos = col_pos.get((kind, col))
        if pos is None:
            raise ValueError(f"column ({kind},{col}) not enabled for permutation")
        assert 0 <= row < n
        return pos * n + row

    pairs = [(cell_id(*a), cell_id(*b)) for a, b in data.copies]
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    # group members per root, then orient each group as one cycle
    groups: dict = {}
    seen = set()
    for a, b in pairs:
        for x in (a, b):
            if x not in seen:
                seen.add(x)
                groups.setdefault(find(x), []).append(x)
    mapping = np.stack(
        [np.tile(np.arange(m, dtype=np.int64)[:, None], (1, n)).reshape(m, n),
         np.tile(np.arange(n, dtype=np.int64)[None, :], (m, 1))], axis=-1)
    for members in groups.values():
        if len(members) < 2:
            continue
        for i, x in enumerate(members):
            y = members[(i + 1) % len(members)]
            mapping[x // n, x % n] = (y // n, y % n)
    return mapping


def sigma_values(data: CircuitData) -> np.ndarray:
    """Sigma polynomials as value tables: (m, n) object array of Fr ints.

    sigma_c(row) = delta^{c'} * omega^{row'} where (c', r') = mapping[c, r].
    """
    from .domain import Domain
    mapping = permutation_mapping(data)
    m, n = mapping.shape[:2]
    dom = Domain(data.k, data.cs.quotient_degree)
    omega_pows = np.empty(n, dtype=object)
    acc = 1
    for i in range(n):
        omega_pows[i] = acc
        acc = acc * dom.omega % rc.FR
    delta_pows = [pow(DELTA, c, rc.FR) for c in range(m)]
    out = np.empty((m, n), dtype=object)
    for c in range(m):
        cc = mapping[c, :, 0]
        rr = mapping[c, :, 1]
        for r in range(n):
            out[c, r] = delta_pows[cc[r]] * omega_pows[rr[r]] % rc.FR
    return out


# ---------------------------------------------------------------------------
# Deterministic blinding RNG (SURVEY.md §5: reference uses OsRng; we use a
# seeded stream for cross-host determinism + reproducible debugging)
# ---------------------------------------------------------------------------

class BlindingRng:
    def __init__(self, seed: bytes = b"halo2-zkcert-tpu-blinding"):
        self.seed = seed
        self.ctr = 0

    def next_fr(self) -> int:
        d = rc.blake2b(self.seed + self.ctr.to_bytes(8, "little"), 64)
        self.ctr += 1
        return rc.fr_from_u512_le(d[:32], d[32:])

    def fill(self, count: int) -> list:
        return [self.next_fr() for _ in range(count)]

    def fill_limbs(self, count: int) -> np.ndarray:
        """Bulk blinding draw as RESIDENT limb rows: (count, NLIMBS) int32.

        The per-row blake2b stream (`fill`) costs ~0.6 s of host Python at
        n=2^17 — on the prover's critical path for the vanishing random
        poly.  Bulk draws instead expand ONE blake2b-derived key through a
        counter-based Philox stream (numpy-specified, platform/version
        deterministic) into 256-bit values; a 256-bit value is already in
        the resident limb class (< 2^259) and uniform mod r up to a
        ~2^-127 bias, so no reduction pass is needed.  Advances `ctr` so
        interleaved scalar draws stay distinct."""
        from ..ops import limbs as limb_ops
        d = rc.blake2b(self.seed + b"|bulk|" + self.ctr.to_bytes(8, "little"),
                       16)
        self.ctr += count
        key = np.frombuffer(d, dtype="<u8")   # 2 x u64 Philox key
        gen = np.random.Generator(np.random.Philox(key=key))
        raw = gen.integers(0, 256, size=(count, 32), dtype=np.uint8)
        out = np.zeros((count, limb_ops.NLIMBS), dtype=np.int32)
        out[:, :32] = raw
        return out
