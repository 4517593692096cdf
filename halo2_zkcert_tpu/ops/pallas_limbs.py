"""Pallas-fused limb arithmetic: field mul and the full RCB16 point add.

Why a kernel at all: the XLA path lowers each field mul to an unrolled
33-step shift-add with HBM-materialized temporaries between the 12 muls of a
point add — measured ~67 ms for a 2^17 add batch, ~50x above the VPU
roofline.  Fusing one whole group-law add into a single kernel keeps every
intermediate in VMEM: HBM traffic drops to the 9 input/output coordinate
planes (~1.2 KB/point).

Layout (pallas_guide.md "Tiling Constraints"): limb-major blocks — limbs on
the sublane axis (33 -> padded 40 rows), batch on the lane axis (128-lane
tiles).  Batch-major (N, 33) would waste 74% of every lane tile.

Arithmetic is pure f32 on the VPU (TPUs have no fast int32 multiply):
  * conv:   33 shift-add FMA steps; products and per-coefficient sums stay
            < 2^23 (f32-exact).
  * carry:  hi = floor(x * 2^-8) — exact below 2^24.
  * fold:   rows >= 32 fold down with limbs(2^(8(32+j)) mod p) by shift-add
            broadcast (40 FMA steps); inputs are carried first so every
            product is <= 511*255 and sums < 2^23.
Bounds mirror ops/limbs.py `partial_reduce` (carry3 -> fold -> ... chain);
outputs are in the same resident class (33 limbs <= 511, value < 2^259).

Reference behavior being accelerated: halo2curves' native Montgomery field
[dep Cargo.lock:1359] under halo2_proofs' `best_multiexp` [dep
Cargo.lock:1320]; the group law is RCB16 (eprint 2015/1060 Alg 7), identical
to ops/curve.py.
"""
from __future__ import annotations

import os
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limbs

NL = limbs.NLIMBS          # 33
ROWS = 40                  # padded limb rows (= FieldSpec.FOLD_ROWS)
LANES = 512                # batch lanes per block (4 lane-tiles)

_INV256 = np.float32(1.0 / 256.0)


def _carry(x, passes: int = 3):
    """Carry-relaxation passes; keeps values in-place (ROWS, B).

    Convergence: one pass maps limb bound M -> 255 + M/256, so
    M <= 640 needs 1 pass, M <= 66K needs 2, M <= 16M needs 3 to reach
    the relaxed-class bound (~320)."""
    for _ in range(passes):
        hi = jnp.floor(x * _INV256)
        lo = x - hi * 256.0
        x = lo + jnp.concatenate(
            [jnp.zeros_like(hi[:1]), hi[:-1]], axis=0)
    return x


def _carry3(x):
    return _carry(x, 3)


def _fold(x, fold_rows, nrows: int):
    """Fold rows 32..32+nrows-1 down mod p (shift-add broadcast; fold_rows
    (40, 32) f32 constant).  Input limbs <= 511 (f32-exact products).
    Output (ROWS, B) with rows >= 32 zero."""
    zeros_hi = jnp.zeros_like(x[:ROWS - 32])
    acc = jnp.concatenate([x[:32], zeros_hi], axis=0)
    for j in range(nrows):
        src = 32 + j
        if src >= x.shape[0]:
            break
        contrib = x[src:src + 1] * fold_rows[j][:, None]        # (32, B)
        acc = acc + jnp.concatenate([contrib, zeros_hi], axis=0)
    return acc


# In-kernel LAZY arithmetic: values live in a RELAXED class — nonzero rows
# 0..34 (the kernel planes have 40), limbs <= ~320 — and only `finalize`
# brings them back to the resident class (rows >= 33 zero) at kernel
# output boundaries.  Bounds (all f32-exact, < 2^24):
#   conv:     35 rows x 320^2 products -> coeffs <= 3.6M
#   carry3 of <= 16M coeffs converges to limbs <= ~260 (3 halving passes)
#   fold:     40 rows x 320 x 255 sums <= 3.3M
#   add:      a + b <= 640 -> carry3 -> <= ~258
#   sub:      a + (pad_wide - b); pad digits in [768, 2047] >= any relaxed
#             limb, so every limb stays nonnegative; carry3 -> <= ~260
#   small(k<2^12): 320 * 4095 <= 1.4M -> carry3
# Versus the earlier always-resident ops this removes the 3-round
# fold/carry pipeline from every add/sub/small (~4x cheaper) and two
# rounds from every mul — the dominant cost in the RCB16 group law.
_CONV_ROWS = 35

# MXU fold (the mul reduction): the conv's high rows 32..69 byte-split into
# three <=255 planes and folded mod p by ONE (32, 128) x (128, B) matmul.
# Both matmul operands are integers <= 255 — exactly bf16-representable —
# so the default single-pass bf16 MXU matmul with f32 accumulation is EXACT
# (products <= 255^2, sums over 114 terms <= 7.4M < 2^24).  This replaces
# the 38-step shift-add fold + one 80-row carry sweep of the earlier
# reduction (~40% of every mul's VPU work) with one MXU pass.
_MXU_K = 128          # padded contraction dim (3 x 38 byte planes + zeros)


def _reduce_mul(x, fold_mxu):
    """conv output (rows 0..68 of a (2*ROWS, B) buf) -> relaxed class
    (ROWS, B) via the MXU byte-fold.

    Worst-case coefficients: fused_mul feeds two RESIDENT-class operands
    (limbs <= 511), so conv coeffs reach 33*511^2 ~ 8.6M and lo+folded
    ~ 14.8M — still f32-exact (< 2^24) and within carry3 convergence
    (16M), but the margin to the 2^24 ceiling is thin; relaxed-class
    operands (<= 320) give the more comfortable 3.6M."""
    B = x.shape[1]
    lo = x[:32]
    hi = x[32:70]                                        # (38, B) <= 3.6M
    q0 = jnp.floor(hi * _INV256)
    b0 = hi - q0 * 256.0                                 # <= 255
    b2 = jnp.floor(q0 * _INV256)                         # <= 54
    b1 = q0 - b2 * 256.0                                 # <= 255
    xs = jnp.concatenate(
        [b0, b1, b2, jnp.zeros((_MXU_K - 114, B), jnp.float32)], axis=0)
    folded = jax.lax.dot_general(
        fold_mxu, xs, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (32, B) <= 7.4M
    acc = jnp.concatenate(
        [lo + folded, jnp.zeros((ROWS - 32, B), jnp.float32)], axis=0)
    return _carry3(acc)                                  # limbs <= ~258


# conv strategy: "shift" = 35 sublane-shifted FMA steps (VPU; the shifts
# are cross-sublane permutes); "mxu" = outer product (VPU) + one constant
# one-hot matmul on the MXU.  The one-hot side is 0/1 (bf16-exact, lo
# part identically zero), the outer side f32 <= 320^2; per-coefficient
# sums <= 35 * 320^2 ~ 3.6M < 2^24, so the f32 MXU pass is exact.
_CONV_MODE = os.environ.get("H2T_CONV", "shift")


def _conv_onehot_mxu():
    """(2*ROWS, _CONV_ROWS * ROWS) one-hot: row l sums outer[(i, j)] with
    i + j == l.  Built in-kernel from iota (Mosaic kernels cannot capture
    array constants — TPU_NOTES.md); the compiler hoists it."""
    shape = (2 * ROWS, _CONV_ROWS * ROWS)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return ((c_ids // ROWS + c_ids % ROWS) == l_ids).astype(jnp.float32)


def _mk_ops(fold_rows, fold_mxu, pad_wide):
    """In-kernel field ops over (ROWS, B) f32 planes (relaxed class).

    Returns (mul, add, sub, small, finalize); `finalize` must be applied
    before storing to an output ref (host-side code slices rows < 33)."""

    def mul_shift(a, b):
        B = a.shape[1]
        acc = jnp.zeros((2 * ROWS, B), jnp.float32)
        for i in range(_CONV_ROWS):
            term = a[i:i + 1] * b                                # (40, B)
            acc = acc + jnp.pad(term, ((i, 2 * ROWS - ROWS - i), (0, 0)))
        return _reduce_mul(acc, fold_mxu)

    def mul_mxu(a, b):
        B = a.shape[1]
        # outer[(i, j), n] = a[i, n] * b[j, n]   (VPU broadcasts)
        outer = jnp.concatenate(
            [a[i:i + 1] * b for i in range(_CONV_ROWS)], axis=0)
        acc = jax.lax.dot_general(
            _conv_onehot_mxu(), outer,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                  # (80, B)
        return _reduce_mul(acc, fold_mxu)

    mul = mul_mxu if _CONV_MODE == "mxu" else mul_shift

    def add(a, b):
        # carry-only, ONE pass.  Worst case is RESIDENT kernel inputs
        # (limbs <= 511): a + b <= 1022 -> one pass -> <= 259; relaxed
        # operands (<= 320) give sum <= 640 -> <= 257.  Rows 33/34
        # accumulate <= 1 carry per add, so only pathological >10^2-long
        # pure-add chains (none exist: every gate/group-law chain passes
        # through mul/sub/small, which fold) could push a carry past the
        # conv window
        return _carry(a + b, 1)

    def sub(a, b):
        # the pad's top digit lands in row 34 and carries into row 35;
        # fold rows 32..35 back down so the row invariant holds.
        # Bounds: a + pad - b <= 2367 -> carry2 -> <= 265; fold4 adds
        # <= 4*265*255 ~ 270K -> carry2 -> <= 261.
        x = _carry(a + (pad_wide[:, None] - b), 2)
        return _carry(_fold(x, fold_rows, 4), 2)

    def small(a, k):
        # k < 2^12: a*k <= 1.4M -> carry3 -> <= 261; fold4 -> carry2
        x = _carry(a * np.float32(k), 3)
        return _carry(_fold(x, fold_rows, 4), 2)

    def finalize(x):
        # x <= ~320 rows 0..34 -> fold4 <= 327K -> carry2 <= 260 ->
        # fold3 <= 199K -> carry2 <= 259, rows >= 33 zero (resident)
        x = _fold(x, fold_rows, 4)
        x = _carry(x, 2)
        x = _fold(x, fold_rows, 3)
        return _carry(x, 2)

    return mul, add, sub, small, finalize


B3 = 9


def _rcb16_add_kernel(fold_ref, mxu_ref, pad_ref, x1_ref, y1_ref, z1_ref,
                      x2_ref, y2_ref, z2_ref, ox_ref, oy_ref, oz_ref):
    """Complete projective add (RCB16 Alg 7, a=0, b3=9): 12M straight-line,
    everything in VMEM."""
    mul, add, sub, small, fin = _mk_ops(fold_ref[:], mxu_ref[:], pad_ref[:])
    X1, Y1, Z1 = x1_ref[:], y1_ref[:], z1_ref[:]
    X2, Y2, Z2 = x2_ref[:], y2_ref[:], z2_ref[:]
    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = mul(add(X1, Y1), add(X2, Y2))
    t3 = sub(t3, add(t0, t1))
    t4 = mul(add(Y1, Z1), add(Y2, Z2))
    t4 = sub(t4, add(t1, t2))
    X3 = mul(add(X1, Z1), add(X2, Z2))
    Y3 = sub(X3, add(t0, t2))
    t0 = small(t0, 3)
    t2 = small(t2, B3)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = small(Y3, B3)
    X3o = sub(mul(t3, t1), mul(t4, Y3))
    Y3o = add(mul(t1, Z3), mul(Y3, t0))
    Z3o = add(mul(Z3, t4), mul(t0, t3))
    ox_ref[:] = fin(X3o)
    oy_ref[:] = fin(Y3o)
    oz_ref[:] = fin(Z3o)


def _rcb16_madd_kernel(fold_ref, mxu_ref, pad_ref, x1_ref, y1_ref, z1_ref,
                       x2_ref, y2_ref, ox_ref, oy_ref, oz_ref):
    """Mixed projective+affine add (RCB16 Alg 8 specialization of Alg 7
    with Z2=1): 11M — complete for every P as long as Q is affine (not the
    identity; MSM table points never are)."""
    mul, add, sub, small, fin = _mk_ops(fold_ref[:], mxu_ref[:], pad_ref[:])
    X1, Y1, Z1 = x1_ref[:], y1_ref[:], z1_ref[:]
    X2, Y2 = x2_ref[:], y2_ref[:]
    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t3 = mul(add(X1, Y1), add(X2, Y2))
    t3 = sub(t3, add(t0, t1))                    # X1Y2 + X2Y1
    t4 = add(mul(X2, Z1), X1)                    # X1Z2 + X2Z1
    t5 = add(mul(Y2, Z1), Y1)                    # Y1Z2 + Y2Z1
    t0 = small(t0, 3)
    t2 = small(Z1, B3)                           # b3 Z1Z2
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = small(t4, B3)
    X3o = sub(mul(t3, t1), mul(t5, Y3))
    Y3o = add(mul(t1, Z3), mul(Y3, t0))
    Z3o = add(mul(Z3, t5), mul(t0, t3))
    ox_ref[:] = fin(X3o)
    oy_ref[:] = fin(Y3o)
    oz_ref[:] = fin(Z3o)


def _mul_kernel(fold_ref, mxu_ref, pad_ref, a_ref, b_ref, o_ref):
    mul, _, _, _, fin = _mk_ops(fold_ref[:], mxu_ref[:], pad_ref[:])
    o_ref[:] = fin(mul(a_ref[:], b_ref[:]))


def _add_kernel(fold_ref, mxu_ref, pad_ref, a_ref, b_ref, o_ref):
    _, add, _, _, fin = _mk_ops(fold_ref[:], mxu_ref[:], pad_ref[:])
    o_ref[:] = fin(add(a_ref[:], b_ref[:]))


def _sub_kernel(fold_ref, mxu_ref, pad_ref, a_ref, b_ref, o_ref):
    _, _, sub, _, fin = _mk_ops(fold_ref[:], mxu_ref[:], pad_ref[:])
    o_ref[:] = fin(sub(a_ref[:], b_ref[:]))


def _rcb16_dbl_kernel(fold_ref, mxu_ref, pad_ref, x_ref, y_ref, z_ref,
                      ox_ref, oy_ref, oz_ref):
    """Complete projective double (RCB16 Alg 9, a=0, b3=9): 6M+2S."""
    mul, add, sub, small, fin = _mk_ops(fold_ref[:], mxu_ref[:], pad_ref[:])
    X, Y, Z = x_ref[:], y_ref[:], z_ref[:]
    t0 = mul(Y, Y)
    Z3 = small(t0, 8)
    t1 = mul(Y, Z)
    t2 = small(mul(Z, Z), B3)
    X3 = mul(t2, Z3)
    Y3 = add(t0, t2)
    Z3 = mul(t1, Z3)
    t2 = small(t2, 3)
    t0 = sub(t0, t2)
    Y3 = mul(t0, Y3)
    Y3 = add(X3, Y3)
    t1 = mul(X, Y)
    X3 = small(mul(t0, t1), 2)
    ox_ref[:] = fin(X3)
    oy_ref[:] = fin(Y3)
    oz_ref[:] = fin(Z3)


@lru_cache(maxsize=1)
def _supported():
    from .field import FQ, FR
    return {FQ.modulus, FR.modulus}


def __getattr__(name):
    if name == "SUPPORTED_MODULI":
        return _supported()
    raise AttributeError(name)


@lru_cache(maxsize=4)
def _consts(modulus: int):
    from .field import FQ, FR
    spec = FQ if modulus == FQ.modulus else FR
    fold = np.zeros((ROWS, 32), np.float32)
    fold[:spec.FOLD_ROWS] = spec.fold_mat.astype(np.float32)
    # MXU byte-fold matrix: column k*38+j folds byte k of conv row 32+j,
    # i.e. the limbs of 2^(8*(32+j+k)) mod p = fold_mat[j+k] (j+k <= 39).
    mxu = np.zeros((32, _MXU_K), np.float32)
    for k in range(3):
        for j in range(38):
            mxu[:, k * 38 + j] = spec.fold_mat[j + k].astype(np.float32)
    pad = np.zeros(ROWS, np.float32)
    wide = spec.sub_pad_wide()
    pad[:len(wide)] = wide.astype(np.float32)
    with jax.ensure_compile_time_eval():
        return jnp.asarray(fold), jnp.asarray(mxu), jnp.asarray(pad)


def _to_planes(arr):
    """(N, NL) int32 -> (ROWS, N) f32 limb-major planes."""
    x = arr.astype(jnp.float32).T                                # (NL, N)
    return jnp.pad(x, ((0, ROWS - NL), (0, 0)))


def _from_planes(x):
    """(ROWS, N) f32 -> (N, NL) int32."""
    return x[:NL].T.astype(jnp.int32)


def _pad_lanes(x, n):
    pad = (-n) % LANES
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x, n + pad


_INTERPRET = bool(os.environ.get("H2T_PALLAS_INTERPRET"))


def _const_specs():
    return [
        pl.BlockSpec((ROWS, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((32, _MXU_K), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ROWS,), lambda i: (0,), memory_space=pltpu.VMEM),
    ]


@partial(jax.jit, static_argnames=("modulus",))
def fused_point_add(P, Q, modulus: int):
    """Batched RCB16 add: P, Q tuples of (N, NL) int32 -> same."""
    consts = _consts(modulus)
    n = P[0].shape[0]
    planes = [_pad_lanes(_to_planes(c), n)[0] for c in (*P, *Q)]
    npad = planes[0].shape[1]
    grid = npad // LANES
    spec = pl.BlockSpec((ROWS, LANES), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _rcb16_add_kernel,
        grid=(grid,),
        in_specs=_const_specs() + [spec] * 6,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((ROWS, npad), jnp.float32)] * 3,
        interpret=_INTERPRET,
    )(*consts, *planes)
    return tuple(_from_planes(o)[:n] for o in out)


@partial(jax.jit, static_argnames=("modulus",))
def fused_point_add_mixed(P, Q_affine, modulus: int):
    """Batched RCB16 mixed add: P projective tuple of (N, NL) int32,
    Q_affine = (x, y) tuple of (N, NL) int32 with Z == 1 implied."""
    consts = _consts(modulus)
    n = P[0].shape[0]
    planes = [_pad_lanes(_to_planes(c), n)[0] for c in (*P, *Q_affine)]
    npad = planes[0].shape[1]
    grid = npad // LANES
    spec = pl.BlockSpec((ROWS, LANES), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _rcb16_madd_kernel,
        grid=(grid,),
        in_specs=_const_specs() + [spec] * 5,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((ROWS, npad), jnp.float32)] * 3,
        interpret=_INTERPRET,
    )(*consts, *planes)
    return tuple(_from_planes(o)[:n] for o in out)


def _binary_call(kernel, a, b, modulus: int):
    """Shared driver for elementwise binary field kernels on (N, NL)."""
    consts = _consts(modulus)
    n = a.shape[0]
    ap, npad = _pad_lanes(_to_planes(a), n)
    bp, _ = _pad_lanes(_to_planes(b), n)
    grid = npad // LANES
    spec = pl.BlockSpec((ROWS, LANES), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=_const_specs() + [spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((ROWS, npad), jnp.float32),
        interpret=_INTERPRET,
    )(*consts, ap, bp)
    return _from_planes(out)[:n]


@partial(jax.jit, static_argnames=("modulus",))
def fused_mul(a, b, modulus: int):
    """Batched field mul: (N, NL) x (N, NL) int32 -> (N, NL) resident."""
    return _binary_call(_mul_kernel, a, b, modulus)


@partial(jax.jit, static_argnames=("modulus",))
def fused_add(a, b, modulus: int):
    return _binary_call(_add_kernel, a, b, modulus)


@partial(jax.jit, static_argnames=("modulus",))
def fused_sub(a, b, modulus: int):
    return _binary_call(_sub_kernel, a, b, modulus)


@partial(jax.jit, static_argnames=("modulus",))
def fused_point_double(P, modulus: int):
    """Batched RCB16 double: P tuple of (N, NL) int32 -> same."""
    consts = _consts(modulus)
    n = P[0].shape[0]
    planes = [_pad_lanes(_to_planes(c), n)[0] for c in P]
    npad = planes[0].shape[1]
    grid = npad // LANES
    spec = pl.BlockSpec((ROWS, LANES), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _rcb16_dbl_kernel,
        grid=(grid,),
        in_specs=_const_specs() + [spec] * 3,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((ROWS, npad), jnp.float32)] * 3,
        interpret=_INTERPRET,
    )(*consts, *planes)
    return tuple(_from_planes(o)[:n] for o in out)


# ---------------------------------------------------------------------------
# Fused in-VMEM prefix scan under the mixed group law (MSM bucket scan)
# ---------------------------------------------------------------------------
#
# The grid scan's level-1 pass (ops/scan.py) dispatches C-1 sequential
# Pallas adds, each re-reading its operand columns from HBM.  This kernel
# runs the WHOLE level-1 scan in one pallas_call: a row tile's C affine
# points sit in VMEM, the running projective accumulator never leaves
# vregs/VMEM, and the prefixes stream out once.  Work is identical
# (C-1 mixed adds per row); the ~60 per-step dispatch+slice overheads and
# the inter-step HBM round trips disappear.

SCAN_C = 64                # elements scanned per row (matches scan._C)
SCAN_LANES = 128           # row tile per grid step (VMEM budget ~7 MB)


def _madd_ops(ops, X1, Y1, Z1, X2, Y2):
    """RCB16 Alg-8 mixed add body on plane values; returns UNfinalized."""
    mul, add, sub, small, fin = ops
    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t3 = mul(add(X1, Y1), add(X2, Y2))
    t3 = sub(t3, add(t0, t1))                    # X1Y2 + X2Y1
    t4 = add(mul(X2, Z1), X1)                    # X1Z2 + X2Z1
    t5 = add(mul(Y2, Z1), Y1)                    # Y1Z2 + Y2Z1
    t0 = small(t0, 3)
    t2 = small(Z1, B3)                           # b3 Z1Z2
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = small(t4, B3)
    X3o = sub(mul(t3, t1), mul(t5, Y3))
    Y3o = add(mul(t1, Z3), mul(Y3, t0))
    Z3o = add(mul(Z3, t5), mul(t0, t3))
    return fin(X3o), fin(Y3o), fin(Z3o)


def _scan_madd_kernel(fold_ref, mxu_ref, pad_ref, x_ref, y_ref,
                      ox_ref, oy_ref, oz_ref):
    """Inclusive prefix scan along axis 1 (C) of affine points under the
    mixed add; blocks are (ROWS, C, SCAN_LANES) row tiles."""
    ops = _mk_ops(fold_ref[:], mxu_ref[:], pad_ref[:])
    ax = x_ref[:, 0, :]
    ay = y_ref[:, 0, :]
    # Z = 1 plane built from iota (no scatter in Mosaic lowering)
    az = (jax.lax.broadcasted_iota(jnp.int32, ax.shape, 0) == 0) \
        .astype(jnp.float32)
    ox_ref[:, 0, :] = ax
    oy_ref[:, 0, :] = ay
    oz_ref[:, 0, :] = az

    def body(j, acc):
        nx, ny, nz = _madd_ops(ops, *acc, x_ref[:, j, :], y_ref[:, j, :])
        ox_ref[:, j, :] = nx
        oy_ref[:, j, :] = ny
        oz_ref[:, j, :] = nz
        return (nx, ny, nz)

    jax.lax.fori_loop(1, x_ref.shape[1], body, (ax, ay, az),
                      unroll=False)


@partial(jax.jit, static_argnames=("modulus",))
def fused_scan_madd(xa, ya, modulus: int):
    """xa, ya: (Rtot, C, NL) int32 affine coords (table points, never the
    identity), each length-C row scanned independently left-to-right.
    Returns (X, Y, Z) local inclusive prefixes, same shape, resident."""
    consts = _consts(modulus)
    Rtot, C = xa.shape[0], xa.shape[1]

    def planes(a):
        x = a.astype(jnp.float32).transpose(2, 1, 0)      # (NL, C, Rtot)
        return jnp.pad(x, ((0, ROWS - NL), (0, 0),
                           (0, (-Rtot) % SCAN_LANES)))

    xp, yp = planes(xa), planes(ya)
    Rp = xp.shape[2]
    grid = Rp // SCAN_LANES
    spec = pl.BlockSpec((ROWS, C, SCAN_LANES), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _scan_madd_kernel,
        grid=(grid,),
        in_specs=_const_specs() + [spec, spec],
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((ROWS, C, Rp), jnp.float32)] * 3,
        interpret=_INTERPRET,
    )(*consts, xp, yp)
    return tuple(o[:NL, :, :Rtot].transpose(2, 1, 0).astype(jnp.int32)
                 for o in out)
