"""Pallas-fused quotient pointwise evaluator.

Reference behavior: halo2_proofs evaluates the full gate/lookup/permutation
constraint expression over the extended coset, pointwise, then divides by
Z_H (axiom fork `create_proof` quotient stage [dep] Cargo.lock:1320;
SURVEY.md §3.2 "quotient hot loop").

The XLA formulation (prover.py `pointwise`) materializes every field-op
temporary in HBM: with ~70 field muls over the 4n extended domain that is
tens of GB of traffic per proof — measured ~66 s at k=17 and OOM-prone.
This module lowers the whole forest into ONE Pallas kernel: leaves are
pre-rotated limb-major planes, every intermediate lives in VMEM, HBM
traffic collapses to (read each leaf once + write h once).

Rotations become plane selection: rot(col, r) over the extended domain is
a roll by r*stride rows, materialized OUTSIDE the kernel by `jnp.roll`
(cheap bandwidth op) — one plane per distinct (column, rotation) leaf.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import limbs, pallas_limbs as PL
from ..utils import refcrypto as rc
from . import expression as ex
from .cs import ADVICE, DELTA, FIXED, INSTANCE

NL = limbs.NLIMBS
ROWS = PL.ROWS
LANES = PL.LANES

# leaf tags
F, A, I = "f", "a", "i"
SIGMA, PERMZ, LKZ, LKA, LKS = "sigma", "permz", "lkz", "lka", "lks"
AUX = "aux"            # l0 / llast / lblind / ident / zh_inv


class QuotientPlan:
    """Static lowering plan: ordered leaf planes + constant pool + the
    kernel body builder.  Built once per proving key."""

    def __init__(self, csys):
        self.csys = csys
        self.leaves: list = []          # ordered unique (tag, idx, rot)
        self.leaf_ix: dict = {}
        self.consts: list = []          # distinct field constants
        self.const_ix: dict = {}

    def leaf(self, tag, idx=0, rot=0) -> int:
        key = (tag, idx, rot)
        if key not in self.leaf_ix:
            self.leaf_ix[key] = len(self.leaves)
            self.leaves.append(key)
        return self.leaf_ix[key]

    def const(self, v: int) -> int:
        v = v % rc.FR
        if v not in self.const_ix:
            self.const_ix[v] = len(self.consts)
            self.consts.append(v)
        return self.const_ix[v]

    # ---- plan the forest ---------------------------------------------------

    def build(self, num_chunks: int, chunk_len: int, perm_cols, u_row: int):
        cs = self.csys
        self.nch = 4 + cs.num_challenges      # theta, beta, gamma, y, user

        def walk(e):
            if isinstance(e, ex.Constant):
                self.const(e.value)
            elif isinstance(e, ex.Fixed):
                self.leaf(F, e.index, e.rotation)
            elif isinstance(e, ex.Advice):
                self.leaf(A, e.index, e.rotation)
            elif isinstance(e, ex.Instance):
                self.leaf(I, e.index, e.rotation)
            elif isinstance(e, (ex.Sum, ex.Product)):
                walk(e.a)
                walk(e.b)
            elif isinstance(e, ex.Scaled):
                walk(e.a)
                if not (0 <= e.scalar < (1 << 12) or e.scalar == -1):
                    self.const(e.scalar)

        for _, g in cs.gates:
            walk(g)
        for lk in cs.lookups:
            for p_in, p_tab in lk.pairs:
                walk(p_in)
                walk(p_tab)

        for li in range(len(cs.lookups)):
            self.leaf(LKZ, li, 0)
            self.leaf(LKZ, li, 1)
            self.leaf(LKA, li, 0)
            self.leaf(LKA, li, -1)
            self.leaf(LKS, li, 0)

        if num_chunks:
            for c in range(num_chunks):
                self.leaf(PERMZ, c, 0)
                self.leaf(PERMZ, c, 1)
                if c + 1 < num_chunks:
                    self.leaf(PERMZ, c, u_row)
            for gpos, col in enumerate(perm_cols):
                self.leaf(SIGMA, gpos, 0)
                tag = {ADVICE: A, INSTANCE: I, FIXED: F}[col.kind]
                self.leaf(tag, col.index, 0)
                self.const(pow(DELTA, gpos, rc.FR))

        for name in ("l0", "llast", "lblind", "ident", "zh_inv"):
            self.leaf(AUX, name, 0)
        self.num_chunks = num_chunks
        self.chunk_len = chunk_len
        self.perm_cols = perm_cols
        self.u_row = u_row
        return self


def make_kernel(plan: QuotientPlan):
    """Returns kernel(*plane_refs, *chal_refs, out_ref) evaluating the
    whole constraint forest on one (ROWS, LANES) tile.  Field constants
    are baked in as vector literals (a 3-D constant-pool block crashed the
    Mosaic compiler); runtime challenges arrive as replicated 2-D planes."""
    cs = plan.csys
    nleaves = len(plan.leaves)
    nconst = len(plan.consts)

    def kernel(*refs):
        fold_ref, mxu_ref, pad_ref = refs[0], refs[1], refs[2]
        plane_refs = refs[3:3 + nleaves]
        ch_refs = refs[3 + nleaves:3 + nleaves + plan.nch]
        const_refs = refs[3 + nleaves + plan.nch:
                          3 + nleaves + plan.nch + nconst]
        out_ref = refs[3 + nleaves + plan.nch + nconst]

        mul, add, sub, small, fin = PL._mk_ops(fold_ref[:], mxu_ref[:],
                                               pad_ref[:])
        T = out_ref.shape[1]

        ones_plane = jnp.zeros((ROWS, T), jnp.float32) + 1.0

        def bcast(block):
            # (ROWS, 128) replicated block -> (ROWS, T).  The multiply
            # MATERIALIZES the lane broadcast: a lazily-broadcast value fed
            # into the conv's sublane slice later would need a broadcast in
            # both sublanes and lanes, which Mosaic cannot lower.
            return block[:, :1] * ones_plane

        def chal(i):
            return bcast(ch_refs[i][:])

        def constv(ix):
            return bcast(const_refs[ix][:])

        def leafv(tag, idx=0, rot=0):
            return plane_refs[plan.leaf_ix[(tag, idx, rot)]][:]

        zero = jnp.zeros((ROWS, T), jnp.float32)

        def neg(a):
            return sub(zero, a)

        cache: dict = {}

        def go(e):
            hit = cache.get(e)
            if hit is not None:
                return hit
            if isinstance(e, ex.Constant):
                v = constv(plan.const_ix[e.value % rc.FR])
            elif isinstance(e, ex.Fixed):
                v = leafv(F, e.index, e.rotation)
            elif isinstance(e, ex.Advice):
                v = leafv(A, e.index, e.rotation)
            elif isinstance(e, ex.Instance):
                v = leafv(I, e.index, e.rotation)
            elif isinstance(e, ex.Challenge):
                v = chal(4 + e.index)
            elif isinstance(e, ex.Sum):
                v = add(go(e.a), go(e.b))
            elif isinstance(e, ex.Product):
                v = mul(go(e.a), go(e.b))
            elif isinstance(e, ex.Scaled):
                if e.scalar == -1:
                    v = neg(go(e.a))
                elif 0 <= e.scalar < (1 << 12):
                    v = small(go(e.a), e.scalar)
                else:
                    v = mul(go(e.a), constv(plan.const_ix[e.scalar % rc.FR]))
            else:
                raise TypeError(e)
            cache[e] = v
            return v

        theta_e, beta_e, gamma_e, y_e = (chal(i) for i in range(4))
        # limb-0 == 1 plane; .at[].set lowers to scatter (no Mosaic support)
        row_ix = jax.lax.broadcasted_iota(jnp.int32, (ROWS, T), 0)
        one = jnp.where(row_ix == 0, 1.0, 0.0)
        l0 = leafv(AUX, "l0")
        llast = leafv(AUX, "llast")
        lblind = leafv(AUX, "lblind")
        active = sub(one, add(llast, lblind))

        h = None

        def acc(term):
            nonlocal h
            h = term if h is None else add(mul(h, y_e), term)

        for _, g in cs.gates:
            acc(go(g))

        if plan.num_chunks:
            permz = [leafv(PERMZ, c, 0) for c in range(plan.num_chunks)]
            permz_next = [leafv(PERMZ, c, 1) for c in range(plan.num_chunks)]
            acc(mul(l0, sub(one, permz[0])))
            acc(mul(llast, sub(mul(permz[-1], permz[-1]), permz[-1])))
            for c in range(1, plan.num_chunks):
                acc(mul(l0, sub(permz[c],
                                leafv(PERMZ, c - 1, plan.u_row))))
            ident = leafv(AUX, "ident")
            for ci in range(plan.num_chunks):
                chunk = plan.perm_cols[ci * plan.chunk_len:
                                       (ci + 1) * plan.chunk_len]
                left = permz_next[ci]
                right = permz[ci]
                for pos, col in enumerate(chunk):
                    gpos = ci * plan.chunk_len + pos
                    tag = {ADVICE: A, INSTANCE: I, FIXED: F}[col.kind]
                    v = leafv(tag, col.index, 0)
                    sig = leafv(SIGMA, gpos, 0)
                    left = mul(left, add(add(v, mul(sig, beta_e)), gamma_e))
                    dg = constv(plan.const_ix[pow(DELTA, gpos, rc.FR)])
                    right = mul(right, add(add(
                        v, mul(ident, mul(beta_e, dg))), gamma_e))
                acc(mul(active, sub(left, right)))

        for li, lk in enumerate(cs.lookups):
            z = leafv(LKZ, li, 0)
            z_next = leafv(LKZ, li, 1)
            a_p = leafv(LKA, li, 0)
            a_prev = leafv(LKA, li, -1)
            s_p = leafv(LKS, li, 0)
            a_comp = None
            for p_in, _ in lk.pairs:
                v = go(p_in)
                a_comp = v if a_comp is None else add(mul(a_comp, theta_e), v)
            s_comp = None
            for _, p_tab in lk.pairs:
                v = go(p_tab)
                s_comp = v if s_comp is None else add(mul(s_comp, theta_e), v)
            acc(mul(l0, sub(one, z)))
            acc(mul(llast, sub(mul(z, z), z)))
            lhs = mul(mul(z_next, add(a_p, beta_e)), add(s_p, gamma_e))
            rhs = mul(mul(z, add(a_comp, beta_e)), add(s_comp, gamma_e))
            acc(mul(active, sub(lhs, rhs)))
            acc(mul(l0, sub(a_p, s_p)))
            acc(mul(mul(active, sub(a_p, s_p)), sub(a_p, a_prev)))

        out_ref[:] = fin(mul(h, leafv(AUX, "zh_inv")))

    return kernel


# smaller lane tile than the limb kernels: the forest's VMEM working set
# (cached subexpression planes) rides on top of the ~40 leaf blocks
QLANES = 128


def _to_plane(arr_int32: jnp.ndarray) -> jnp.ndarray:
    """(ext_n, NL) int32 -> (ROWS, ext_n) f32 limb-major plane."""
    x = arr_int32.astype(jnp.float32).T
    return jnp.pad(x, ((0, ROWS - NL), (0, 0)))


class QuotientPallas:
    """Callable quotient evaluator bound to one proving key."""

    def __init__(self, pk, dom, aux_ext: dict, fixed_ext, sigma_ext):
        csys = pk.vk.cs
        bf = csys.blinding_factors()
        u_row = dom.n - bf - 1
        chunk_len = csys.permutation_chunk_len()
        perm_cols = csys.permutation_columns
        num_chunks = -(-len(perm_cols) // chunk_len) if perm_cols else 0
        self.plan = QuotientPlan(csys).build(num_chunks, chunk_len,
                                             perm_cols, u_row)
        self.kernel = make_kernel(self.plan)
        self.dom = dom
        self.csys = csys
        self.stride = dom.extended_n // dom.n
        # static planes (per pk): fixed / sigma / aux, pre-rotated
        self.static_planes = {}
        for (tag, idx, rot) in self.plan.leaves:
            if tag == F:
                self.static_planes[(tag, idx, rot)] = _to_plane(
                    jnp.roll(fixed_ext[idx], -rot * self.stride, axis=0))
            elif tag == SIGMA:
                self.static_planes[(tag, idx, rot)] = _to_plane(sigma_ext[idx])
            elif tag == AUX:
                self.static_planes[(tag, idx, rot)] = _to_plane(aux_ext[idx])
        self.static_list = tuple(self.static_planes[key]
                                 for key in self.plan.leaves
                                 if key[0] in (F, SIGMA, AUX))
        self._jfn = None

    def _build_jfn(self):
        plan = self.plan
        csys = self.csys
        ext_n = self.dom.extended_n
        na = csys.num_advice
        stride = self.stride
        kernel = self.kernel
        fold, fold_mxu, pad_c = PL._consts(rc.FR)

        def jfn(col_ext, permz_ext, lkz_ext, lka_ext, lks_ext, chal,
                static_list):
            planes = []
            si = iter(static_list)
            for (tag, idx, rot) in plan.leaves:
                if tag in (F, SIGMA, AUX):
                    planes.append(next(si))
                    continue
                src = {A: lambda: col_ext[idx],
                       I: lambda: col_ext[na + idx],
                       PERMZ: lambda: permz_ext[idx],
                       LKZ: lambda: lkz_ext[idx],
                       LKA: lambda: lka_ext[idx],
                       LKS: lambda: lks_ext[idx]}[tag]()
                if rot:
                    src = jnp.roll(src, -rot * stride, axis=0)
                planes.append(_to_plane(src))

            # challenges -> one replicated (ROWS, 128) plane each
            chf = chal.astype(jnp.float32)               # (nch, NL)
            chf = jnp.pad(chf, ((0, 0), (0, ROWS - NL)))
            ch_planes = [jnp.broadcast_to(chf[i][:, None], (ROWS, 128))
                         for i in range(plan.nch)]
            const_planes = [jnp.broadcast_to(c[:, None], (ROWS, 128))
                            for c in const_cols]

            grid = ext_n // QLANES
            pspec = pl.BlockSpec((ROWS, QLANES), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
            cspec = pl.BlockSpec((ROWS, 32), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
            mxuspec = pl.BlockSpec((32, PL._MXU_K), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
            padspec = pl.BlockSpec((ROWS,), lambda i: (0,),
                                   memory_space=pltpu.VMEM)
            chspec = pl.BlockSpec((ROWS, 128), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
            out = pl.pallas_call(
                kernel,
                grid=(grid,),
                in_specs=[cspec, mxuspec, padspec] + [pspec] * len(planes)
                         + [chspec] * (plan.nch + len(const_cols)),
                out_specs=pspec,
                out_shape=jax.ShapeDtypeStruct((ROWS, ext_n), jnp.float32),
                interpret=PL._INTERPRET,
            )(fold, fold_mxu, pad_c, *planes, *ch_planes, *const_planes)
            return out[:NL].T.astype(jnp.int32)

        # per-pk constant columns (ROWS,) f32, passed as replicated planes
        const_cols = []
        for v in plan.consts:
            col = np.zeros(ROWS, np.float32)
            col[:NL] = np.asarray(limbs.int_to_limbs(v, NL), np.float32)
            const_cols.append(jnp.asarray(col))

        return jax.jit(jfn)

    def __call__(self, col_ext, permz_ext, lkz_ext, lka_ext, lks_ext, chal):
        """Inputs as in prover.pointwise; returns (ext_n, NL) int32 h."""
        if self._jfn is None:
            self._jfn = self._build_jfn()
        return self._jfn(col_ext, permz_ext, lkz_ext, lka_ext, lks_ext,
                         chal, self.static_list)
