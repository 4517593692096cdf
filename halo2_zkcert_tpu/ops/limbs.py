"""Limb-plane big-integer arithmetic for TPU.

Design (TPU-first, cf. SURVEY.md §7 step 1):

* A field element is a vector of ``L = 33`` limbs in radix ``2^8``, least
  significant first, stored as ``int32``.  8-bit limbs keep every partial
  product of a schoolbook convolution exactly representable in int32 *and*
  float32 (``33 * 511 * 511 < 2^24``), so the hot multiply can run on either
  the VPU (int32) or the MXU (f32) without 64-bit integer emulation — TPUs
  have no native u64 path (reference does 4x64-bit Montgomery mul on CPU,
  halo2curves [dep] Cargo.lock:1359; that design does not map to TPU).

* Representation is *lazy* (redundant): a "normalized" element has limbs
  ``<= 511`` and value ``< 2^259`` — NOT canonical.  Arithmetic closes over
  this class; values are only brought to canonical form (``< p``, limbs
  ``<= 255``, 32 limbs) at serialization / transcript / equality boundaries.

* Modular reduction is fold-based, not Montgomery: high limbs (position
  >= 32) are folded down with a precomputed matrix ``FOLD[j] =
  limbs(2^(8*(32+j)) mod p)`` — a tiny matmul — interleaved with 3-pass
  carry relaxation.  A few rounds converge to the normalized class.

All functions operate on arrays of shape ``(..., W)`` (trailing limb axis)
and are jit/vmap/shard_map friendly (static shapes, no data-dependent
control flow).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

LIMB_BITS = 8
LIMB_MASK = (1 << LIMB_BITS) - 1
NLIMBS = 33          # resident width: 264 bits capacity > 259-bit invariant
CANON_LIMBS = 32     # canonical width for a 254-bit modulus


def int_to_limbs(x: int, width: int = NLIMBS) -> np.ndarray:
    """Python int -> little-endian 8-bit limb vector (int32 numpy).

    With radix-256 limbs this IS the little-endian byte expansion, so it
    rides CPython's C-level int.to_bytes instead of a Python digit loop.
    """
    assert x >= 0
    return np.frombuffer(x.to_bytes(width, "little"),
                         dtype=np.uint8).astype(np.int32)


def limbs_to_int(a) -> int:
    """Limb vector (any laziness) -> Python int."""
    a = np.asarray(a)
    if a.dtype == np.int32 and a.size and (a >= 0).all() and (a <= 255).all():
        return int.from_bytes(a.astype(np.uint8).tobytes(), "little")
    return sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(a.tolist()))


def ints_to_limbs(xs, width: int = NLIMBS) -> np.ndarray:
    """Batch version: list of ints -> (N, width) int32 via one bytes blob."""
    blob = b"".join(int(x).to_bytes(width, "little") for x in xs)
    return np.frombuffer(blob, dtype=np.uint8).reshape(
        len(xs), width).astype(np.int32)


@dataclass(frozen=True)
class FieldSpec:
    """Static per-field data consumed by the limb kernels."""
    name: str
    modulus: int
    p_limbs: np.ndarray          # (32,) canonical limbs of p
    fold_mat: np.ndarray         # (FOLD_ROWS, 32) limbs of 2^(8*(32+j)) mod p
    sub_pad: np.ndarray          # (NLIMBS,) multiple of p with all limbs >= 512
    r_inv: int                   # unused placeholder for API parity
    FOLD_ROWS: int = 40

    @staticmethod
    def make(name: str, modulus: int, fold_rows: int = 40) -> "FieldSpec":
        p_limbs = int_to_limbs(modulus, CANON_LIMBS)
        fold = np.stack([
            int_to_limbs(pow(2, LIMB_BITS * (CANON_LIMBS + j), modulus), CANON_LIMBS)
            for j in range(fold_rows)
        ])
        return FieldSpec(
            name=name, modulus=modulus, p_limbs=p_limbs, fold_mat=fold,
            sub_pad=_pad_multiple(name, modulus, NLIMBS, 512),
            r_inv=0, FOLD_ROWS=fold_rows,
        )

    def sub_pad_wide(self) -> np.ndarray:
        """(35,) pad for the Pallas kernels' RELAXED limb class (rows up
        to 34, limbs up to ~320 after carry-only adds): a multiple of p
        with every digit in [768, 2047]."""
        return _pad_multiple(self.name, self.modulus, NLIMBS + 2, 768)


def _pad_multiple(name: str, modulus: int, width: int, lo: int) -> np.ndarray:
    """A multiple of `modulus` whose `width` base-256 digits all lie in
    [lo, 2047]: enables branch-free limbwise subtraction (a + pad - b
    stays nonnegative per limb for b with limbs <= lo). Greedy digits."""
    target_lo = sum(lo << (LIMB_BITS * i) for i in range(width))
    k = -(-target_lo // modulus) + 1
    v = modulus * k
    digits = np.zeros(width, dtype=np.int64)
    rem = v
    for i in range(width - 1, -1, -1):
        base = 1 << (LIMB_BITS * i)
        lo_rest = sum(lo << (LIMB_BITS * jj) for jj in range(i))
        hi_rest = sum(2047 << (LIMB_BITS * jj) for jj in range(i))
        d = max(lo, min(2047, (rem - lo_rest) // base))
        while d * base + hi_rest < rem:
            d += 1
        digits[i] = d
        rem -= d * base
        assert lo <= d <= 2047, (name, i, d)
    assert rem == 0
    assert sum(int(d) << (LIMB_BITS * i) for i, d in enumerate(digits)) == v
    return digits.astype(np.int32)


def _shift_up(x: jnp.ndarray) -> jnp.ndarray:
    """Shift limbs up one position (multiply by 2^8), same width, drop top."""
    pad = [(0, 0)] * (x.ndim - 1) + [(1, 0)]
    return jnp.pad(x, pad)[..., :-1]


def carry_pass(x: jnp.ndarray, passes: int = 3, width: int | None = None) -> jnp.ndarray:
    """Relax lazy limbs: after `passes` rounds, nonnegative limbs are < 512.

    Extends width so top carries are not dropped. Input limbs must be
    nonnegative and < 2^24 (so carries < 2^16).
    """
    if width is None:
        width = x.shape[-1] + 3
    if width > x.shape[-1]:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, width - x.shape[-1])]
        x = jnp.pad(x, pad)
    for _ in range(passes):
        lo = x & LIMB_MASK
        hi = x >> LIMB_BITS
        x = lo + _shift_up(hi)
    return x


@lru_cache(maxsize=16)
def _conv_onehot(La: int, Lb: int) -> np.ndarray:
    """Constant scatter tensor T[i, j, k] = 1 iff i + j == k."""
    t = np.zeros((La, Lb, La + Lb), dtype=np.int32)
    for i in range(La):
        for j in range(Lb):
            t[i, j, i + j] = 1
    return t


def conv_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook convolution of limb vectors: (..., La) x (..., Lb) -> (..., La+Lb).

    Requires limbs <= 511 so coefficients stay < 2^24 (f32/int32-exact).
    Formulated as outer-product then constant one-hot matmul: 3 HLO ops
    (vs a 33-step dynamic-update-slice chain, which exploded XLA compile
    times inside scan/loop bodies). The contraction runs in f32 — exact
    below 2^24 and MXU-eligible; int32 dot_generals fall off the MXU and
    were ~5x slower on v5e. Uses raw dot_general, not einsum — opt_einsum
    path search at trace time dominated graph-build time.
    """
    # NOTE(perf): this was a dense (La*Lb, La+Lb) one-hot dot_general —
    # which does La*Lb*(La+Lb) ~ 72k MACs per element on the slow int32
    # matmul path to select 1089 products.  The shift-add form below does
    # the 1089 multiplies + adds directly on the VPU (La fused
    # multiply-accumulate slices); measured ~10x faster inside the MSM.
    # (An f32/Precision.HIGHEST MXU variant was also tried — exact, but
    # the 6-pass lowering OOMed the TPU compile helper on big graphs.)
    La, Lb = a.shape[-1], b.shape[-1]
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    pad_cfg = [(0, 0)] * len(shape)
    # all arithmetic in f32: TPU VPUs have no full-rate int32 multiply
    # (integer muls lower to a slow emulation path), while f32 FMA is
    # native.  Exact: products <= 511*511 and per-coefficient sums
    # <= 33*511^2 < 2^24 stay below the f32 integer-exact range.
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    acc = None
    # left-deep accumulation ON PURPOSE: a balanced tree keeps O(La) padded
    # (..., La+Lb) temporaries live at once, which blew past HBM on the
    # extended-domain quotient graphs (38G requested at k=17); the linear
    # chain lets XLA free each term immediately.
    for i in range(La):
        prod = af[..., i:i + 1] * bf        # (..., Lb)
        term = jnp.pad(jnp.broadcast_to(prod, shape + (Lb,)),
                       pad_cfg + [(i, La - i)])
        acc = term if acc is None else acc + term
    return acc.astype(jnp.int32)


def fold_once(spec_fold: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Fold limbs >= 32 down mod p: returns (..., 32) lazy coefficients.

    x: (..., W) with W > 32, limbs <= 511.
    Result coefficients <= 511 + (W-32)*511*255 — int32/f32-exact for W <= 67.
    """
    W = x.shape[-1]
    low, high = x[..., :CANON_LIMBS], x[..., CANON_LIMBS:]
    # f32 dot on the MXU: int32 dot_generals fall off the MXU entirely.
    # Precision.HIGH (3-pass bf16x3) is exact here because the fold matrix
    # side is integer <= 255 — exactly bf16-representable, so the dropped
    # lo*lo pass is identically zero; partial products <= 511*255 and sums
    # < 2^24 stay f32-exact.
    folded = jax.lax.dot_general(
        high.astype(jnp.float32), spec_fold.astype(jnp.float32)[: W - CANON_LIMBS],
        dimension_numbers=(((high.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGH,
        preferred_element_type=jnp.float32).astype(jnp.int32)
    return low + folded


def partial_reduce(spec: FieldSpec, x: jnp.ndarray, rounds: int = 5) -> jnp.ndarray:
    """Bring any lazy value (coeffs < 2^24, any width) into the resident class:

    (..., NLIMBS) with limbs <= 511 (limb 32 small), value < ~2^259,
    congruent to x mod p. Pure vector ops; no data-dependent control flow.
    """
    fold = jnp.asarray(spec.fold_mat)
    x = carry_pass(x)
    for _ in range(rounds):
        if x.shape[-1] <= CANON_LIMBS:
            break
        x = fold_once(fold, x)
        x = carry_pass(x, width=x.shape[-1] + 3)
    # after convergence limbs >= NLIMBS are zero; slice to resident width
    return x[..., :NLIMBS]


import os as _os

_PALLAS_MIN = 128
_pallas_env = _os.environ.get("H2T_PALLAS", "auto")


def _pallas_route(spec: FieldSpec, a, b, which: str):
    """Dispatch an elementwise binary field op to the fused Pallas kernel
    when profitable: TPU backend (or H2T_PALLAS=1), BN254 Fq/Fr, resident
    (..., NLIMBS) operands, batch >= _PALLAS_MIN.  Returns None to fall
    back to the XLA path.  One kernel shape serves every batch size (lanes
    pad to the block width), which also keeps XLA graph sizes small inside
    scans/loops."""
    if _pallas_env == "0":
        return None
    if _pallas_env != "1" and jax.default_backend() != "tpu":
        return None
    if a.shape[-1] != NLIMBS or b.shape[-1] != NLIMBS:
        return None
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    n = int(np.prod(shape)) if shape else 1
    if n < _PALLAS_MIN:
        return None
    from . import pallas_limbs
    if spec.modulus not in pallas_limbs.SUPPORTED_MODULI:
        return None
    af = jnp.broadcast_to(a, shape + (NLIMBS,)).reshape(-1, NLIMBS)
    bf = jnp.broadcast_to(b, shape + (NLIMBS,)).reshape(-1, NLIMBS)
    fn = {"mul": pallas_limbs.fused_mul, "add": pallas_limbs.fused_add,
          "sub": pallas_limbs.fused_sub}[which]
    return fn(af, bf, spec.modulus).reshape(shape + (NLIMBS,))


def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Modular add on resident values (u8-canonical storage upcasts here —
    a u8+u8 sum would wrap at 256)."""
    out = _pallas_route(spec, a, b, "add")
    if out is not None:
        return out
    if a.dtype != jnp.int32:
        a = a.astype(jnp.int32)
    if b.dtype != jnp.int32:
        b = b.astype(jnp.int32)
    return partial_reduce(spec, a + b, rounds=3)


def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Modular subtract: a + (K*p - b), branch-free and nonnegative limbwise."""
    out = _pallas_route(spec, a, b, "sub")
    if out is not None:
        return out
    pad = jnp.asarray(spec.sub_pad)
    return partial_reduce(spec, a + (pad - b), rounds=3)


def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    pad = jnp.asarray(spec.sub_pad)
    return partial_reduce(spec, pad - a, rounds=3)


def mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Modular multiply on resident values."""
    out = _pallas_route(spec, a, b, "mul")
    if out is not None:
        return out
    prod = conv_mul(a, b)
    return partial_reduce(spec, prod, rounds=6)


def mul_small(spec: FieldSpec, a: jnp.ndarray, k: int) -> jnp.ndarray:
    """Multiply by a small constant (k < 2^13).

    f32 multiply (exact: 511 * 2^13 < 2^24); int32 muls are slow on the VPU.
    """
    prod = (a.astype(jnp.float32) * jnp.float32(k)).astype(jnp.int32)
    return partial_reduce(spec, prod, rounds=3)


def sqr(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mul(spec, a, a)


def _table_carry(x: jnp.ndarray) -> jnp.ndarray:
    """Exact carry propagation via parallel-prefix carry-table composition.

    Input limbs must be in [0, 510+2] so carries are in {0, 1, 2}. Each limb
    contributes a 3-entry carry transfer table; tables compose associatively
    (Kogge-Stone), so `lax.associative_scan` resolves all carries in
    O(log W) vector steps — no sequential ripple, no dynamic-update-slices.
    Output: (..., W+1) canonical digits in [0, 255].
    """
    # transfer tables: t[..., i, c] = carry out of limb i given carry-in c
    t = jnp.stack([(x + c) >> LIMB_BITS for c in range(3)], axis=-1)

    def compose(f, g):
        # apply f (lower limbs) first, then g: out[c] = g[f[c]].  Selects,
        # not take_along_axis — XLA pads that gather to (…,8,128) tiles per
        # index (42x expansion: a 2M-point batch asked for 16 GB of HBM)
        g0, g1, g2 = g[..., 0:1], g[..., 1:2], g[..., 2:3]
        return jnp.where(f == 0, g0, jnp.where(f == 1, g1, g2))

    composed = jax.lax.associative_scan(compose, t, axis=-2)
    carry_out = composed[..., 0]                     # (..., W): carry out of i
    zeros = jnp.zeros_like(carry_out[..., :1])
    carry_in = jnp.concatenate([zeros, carry_out], axis=-1)  # (..., W+1)
    xpad = jnp.concatenate([x, jnp.zeros_like(x[..., :1])], axis=-1)
    return (xpad + carry_in) & LIMB_MASK


def exact_digits(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Any lazy value -> exact canonical base-256 digits (..., NLIMBS+1).

    The value is untouched mod nothing — this is plain integer carrying;
    result is the unique digit expansion of the (resident-reduced) integer.
    """
    x = partial_reduce(spec, a)
    return _table_carry(x)


def _lex_ge(x: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """x >= m lexicographically; both canonical digit arrays, same width."""
    diff = x - m
    nz = diff != 0
    W = x.shape[-1]
    first_nz_rev = jnp.argmax(nz[..., ::-1], axis=-1)
    ms_idx = W - 1 - first_nz_rev
    ms_val = jnp.take_along_axis(diff, ms_idx[..., None], axis=-1)[..., 0]
    return jnp.where(jnp.any(nz, axis=-1), ms_val > 0, True)


def canonical(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Exact canonical form: (..., 32) limbs <= 255, value < p.

    Binary compare-subtract from 32p down to p; subtraction is done as
    two's-complement addition + table carry (all vectorized selects).
    Only used at boundaries (serialization / equality / transcript).
    """
    x = exact_digits(spec, a)                        # (..., W) W = NLIMBS+1
    W = x.shape[-1]
    for shift in (5, 4, 3, 2, 1, 0):
        m = int_to_limbs(spec.modulus << shift, W)
        comp = jnp.asarray(int_to_limbs((1 << (LIMB_BITS * W)) - (spec.modulus << shift), W))
        ge = _lex_ge(x, jnp.asarray(m))
        sub = _table_carry(x + comp)[..., :W]        # drop the 2^(8W) overflow
        x = jnp.where(ge[..., None], sub, x)
    return x[..., :CANON_LIMBS]


def canonical_pad(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Canonical value padded back to resident width (..., NLIMBS)."""
    c = canonical(spec, a)
    return jnp.pad(c, [(0, 0)] * (c.ndim - 1) + [(0, NLIMBS - CANON_LIMBS)])


_KP_MAX = 64  # resident values are < 2^259 < 64p — see partial_reduce


@lru_cache(maxsize=8)
def _kp_tables(modulus: int):
    """Digit table of k*p for k < 64 and their 24-bit low keys (distinct)."""
    digits = np.stack([int_to_limbs(k * modulus, NLIMBS + 1) for k in range(_KP_MAX)])
    keys = np.asarray([(k * modulus) & 0xFFFFFF for k in range(_KP_MAX)], dtype=np.int32)
    assert len(set(keys.tolist())) == _KP_MAX, "24-bit key collision in k*p table"
    return digits.astype(np.int32), keys


def is_zero(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """v == 0 mod p, cheaply: a resident value is < 64p, so it is zero iff
    its exact digits match one of the 64 precomputed multiples of p.
    The 24-bit low key selects the unique candidate; one full compare
    verifies it. No compare-subtract chain needed."""
    digits_tbl, keys = _kp_tables(spec.modulus)
    x = exact_digits(spec, a)                         # (..., NLIMBS+1)
    v24 = x[..., 0] + (x[..., 1] << 8) + (x[..., 2] << 16)
    hit = v24[..., None] == jnp.asarray(keys)         # (..., 64)
    k_hat = jnp.argmax(hit, axis=-1)
    candidate = jnp.asarray(digits_tbl)[k_hat]        # (..., NLIMBS+1)
    return jnp.any(hit, axis=-1) & jnp.all(x == candidate, axis=-1)


def eq(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(canonical(spec, a) == canonical(spec, b), axis=-1)


def pow_const(spec: FieldSpec, a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e for a fixed Python-int exponent.

    Uses a `lax.fori_loop` over exponent bits (LSB-first) so the traced graph
    stays O(one multiply) — unrolling 254 squarings would explode compile
    time. Compiler-friendly: static trip count, no data-dependent shapes.
    """
    if e == 0:
        return jnp.zeros(a.shape, jnp.int32).at[..., 0].set(1)
    # tiny batches: tile up to the Pallas width so each loop iteration is
    # 2 fused kernels instead of ~100 tiny XLA ops (a single-element
    # Fermat inversion measured ~13 s at batch=1, ~40 ms tiled)
    shape = a.shape
    n = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    if n < _PALLAS_MIN and _pallas_env != "0" \
            and (jax.default_backend() == "tpu" or _pallas_env == "1"):
        flat = a.reshape(-1, NLIMBS)
        reps = -(-_PALLAS_MIN // n)
        tiled = jnp.tile(flat, (reps, 1))
        return pow_const(spec, tiled, e)[:n].reshape(shape)
    nbits = e.bit_length()
    bits = jnp.asarray([(e >> i) & 1 for i in range(nbits)], dtype=jnp.int32)
    one = jnp.zeros(a.shape, jnp.int32).at[..., 0].set(1)

    def body(i, state):
        result, base = state
        new_result = jnp.where(bits[i] == 1, mul(spec, result, base), result)
        return new_result, sqr(spec, base)

    result, _ = jax.lax.fori_loop(0, nbits, body, (one, a))
    return result


def inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Batched modular inverse via Fermat: a^(p-2). 0 -> 0 (ff convention)."""
    return pow_const(spec, a, spec.modulus - 2)


def zeros_like_limbs(shape) -> jnp.ndarray:
    return jnp.zeros(tuple(shape) + (NLIMBS,), dtype=jnp.int32)


def const_limbs(spec: FieldSpec, value: int, shape=()) -> jnp.ndarray:
    """Broadcast a Python-int constant to (..., NLIMBS) limbs."""
    v = jnp.asarray(int_to_limbs(value % spec.modulus, NLIMBS))
    return jnp.broadcast_to(v, tuple(shape) + (NLIMBS,))
