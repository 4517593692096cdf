"""Verifying/proving key generation.

Reference behavior: halo2_proofs `keygen_vk` / `keygen_pk` (axiom fork [dep]
Cargo.lock:1320; call stack SURVEY.md §3.1): commit fixed columns and
permutation sigma polynomials, precompute extended-domain tables.

Hot loops (fixed-column MSMs, extended NTTs) run on device through
ops.msm / ops.ntt; cycle assembly and vk hashing stay on host.
"""
from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import numpy as np
import jax.numpy as jnp

from ..ops import frops, limbs
from ..ops.field import Fr
from ..utils import refcrypto as rc
from .assignment import CircuitData
from .cs import ConstraintSystem
from .domain import Domain
from .kzg import ParamsKZG


@dataclass
class VerifyingKey:
    k: int
    cs: ConstraintSystem
    fixed_commitments: list          # [(x, y)]
    permutation_commitments: list    # [(x, y)] sigma commitments
    num_instance: list
    # aggregation circuits: [(col, row)] of the 8 exposed accumulator limbs
    # (reference: CircuitExt::accumulator_indices, lib.rs:137-139)
    accumulator_indices: list | None = None

    @property
    def n(self) -> int:
        return 1 << self.k

    def domain(self) -> Domain:
        return Domain(self.k, self.cs.quotient_degree)

    def transcript_repr(self) -> int:
        """Canonical vk hash absorbed at the start of every transcript
        (reference: vk.hash_into / blake2b pinned-vk hash [dep])."""
        h = rc.blake2b(self.digest_bytes(), 64, persona=b"Halo2-Verify-Key")
        return rc.fr_from_u512_le(h[:32], h[32:])

    def digest_bytes(self) -> bytes:
        parts = [f"vk:v1;k={self.k};ninst={self.num_instance}".encode(),
                 self.cs.digest_bytes()]
        for (x, y) in self.fixed_commitments + self.permutation_commitments:
            parts.append(rc.fe_to_bytes_le(x) + rc.fe_to_bytes_le(y))
        return b"|".join(parts)


@dataclass
class ProvingKey:
    vk: VerifyingKey
    # device arrays
    fixed_lagrange: jnp.ndarray      # (num_fixed, n, NL)
    fixed_coeff: jnp.ndarray         # (num_fixed, n, NL)
    sigma_lagrange: jnp.ndarray      # (m, n, NL)
    sigma_coeff: jnp.ndarray         # (m, n, NL)
    # retired host table (Z building reads sigma_lagrange); kept as a field
    # so old call sites destructure cleanly — always empty
    sigma_values: np.ndarray = dc_field(
        default_factory=lambda: np.zeros((0, 0), dtype=object))

    def domain(self) -> Domain:
        return self.vk.domain()


def keygen(params: ParamsKZG, data: CircuitData) -> ProvingKey:
    assert params.k == data.k, "SRS size must match circuit k"
    dom = Domain(data.k, data.cs.quotient_degree)
    n = data.n

    from .kzg import commit_many_lagrange
    from .prover import _lag2coeff_batch

    import os as _kos
    import time as _ktime
    _kprof = bool(_kos.environ.get("H2T_PROFILE"))
    _kt = [_ktime.perf_counter()]

    def _ktick(stage):
        if _kprof:
            now = _ktime.perf_counter()
            print(f"  [keygen] {stage}: {now - _kt[0]:.3f}s", flush=True)
            _kt[0] = now

    # build (or load) the fixed-base commit tables FIRST, while HBM is
    # empty — the one-time table build transients plus a big circuit's
    # resident pk columns together exceeded 16 GB at k=20
    from .kzg import _fb_wanted
    if _fb_wanted(params.n):
        params.fixed_base(lagrange=True)
    _ktick("fb tables")

    fixed_lag = data.fixed_limbs()
    num_fixed = fixed_lag.shape[0]
    _ktick("fixed limbs")
    # sigma columns ON DEVICE: sigma_c(r) = delta^{c'} * omega^{r'} is two
    # power-table gathers + one mul — the host object-int version cost
    # ~60 s of Python at k=17.  The host value table (pk.sigma_values) had
    # no consumers (Z building reads sigma_lagrange) and is retired.
    from .assignment import permutation_mapping
    from .cs import DELTA
    mapping = permutation_mapping(data)
    m = mapping.shape[0]
    _ktick("permutation mapping")
    if m:
        om = frops.powers(Fr.from_ints([dom.omega])[0], n)
        delta_pows = Fr.from_ints([pow(DELTA, c, rc.FR) for c in range(m)])
        from .prover import _u8_rep
        chunks = []
        for off in range(0, m, 2):     # bound transient int32 memory
            rr = jnp.asarray(mapping[off:off + 2, :, 1], jnp.int32)
            cc = jnp.asarray(mapping[off:off + 2, :, 0], jnp.int32)
            sig = frops.mul(jnp.take(om, rr, axis=0),
                            jnp.take(delta_pows, cc, axis=0))
            chunks.append(_u8_rep(sig))
            np.asarray(chunks[-1][0, :1, :1])
        sigma_lag = jnp.concatenate(chunks, axis=0) if len(chunks) > 1 \
            else chunks[0]
    else:
        sigma_lag = jnp.zeros((0, n, limbs.NLIMBS), jnp.uint8)
    _ktick("sigma columns")

    # pk columns are stored as U8 byte representatives: a column at k=21
    # is 277 MB as int32 limb rows but 69 MB as u8 — the aggregation
    # circuit's 54 fixed + 23 sigma columns (x lagrange+coeff) simply do
    # not fit 16 GB HBM as int32.  Consumers upcast inside their programs
    # (free: the u8 HBM read is the win; limb kernels compute in f32/int32
    # regardless).  fixed_lag is byte-exact by construction (fixed_limbs).
    # fixed and sigma processed as SEPARATE stacks: concatenating them
    # duplicated ~3 GB of u8 columns on a chip already carrying the fb
    # table + accumulating coeff outputs (OOM at k=20)
    from .prover import _convert_u8, _group_for
    fixed_commitments = commit_many_lagrange(params, fixed_lag) \
        if num_fixed else []
    perm_commitments = commit_many_lagrange(params, sigma_lag) \
        if sigma_lag.shape[0] else []
    _ktick("commits")

    def _coeff(cols):
        if not cols.shape[0]:
            return jnp.zeros((0, n, limbs.NLIMBS), jnp.uint8)
        return _convert_u8(cols, lambda grp: _lag2coeff_batch(grp, data.k),
                           _group_for(n))

    fixed_coeff = _coeff(fixed_lag)
    sigma_coeff = _coeff(sigma_lag)
    _ktick("lag2coeff+u8")

    vk = VerifyingKey(
        k=data.k, cs=data.cs,
        fixed_commitments=fixed_commitments,
        permutation_commitments=perm_commitments,
        num_instance=list(data.num_instance),
        accumulator_indices=data.accumulator_indices,
    )
    pk = ProvingKey(
        vk=vk,
        fixed_lagrange=fixed_lag, fixed_coeff=fixed_coeff,
        sigma_lagrange=sigma_lag, sigma_coeff=sigma_coeff,
    )
    if data.quotient_custom is not None:
        pk.__dict__["quotient_custom"] = data.quotient_custom
    return pk
