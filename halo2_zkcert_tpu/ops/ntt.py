"""Number-theoretic transform over BN254 Fr limb arrays.

TPU-first design (SURVEY.md §7 step 2; reference behavior: halo2_proofs
`best_fft`, axiom fork [dep] Cargo.lock:1320 — rayon parallel radix-2; here
the parallelism is the vector lane axis instead of threads):

* iterative radix-2 decimation-in-time over the row axis of an ``(N, L)``
  limb array; the initial bit-reversal is a single static-permutation gather
  (XLA fuses it); every stage is one batched field mul + add/sub — no
  data-dependent control flow, fully jit-able.
* twiddle factors are precomputed host-side as limb arrays and closed over
  per ``(k, inverse)`` — they are compile-time constants to XLA.
* the *mathematical* result (standard DFT: ``X[i] = sum_j a[j] w^{ij}``)
  matches halo2's `best_fft` semantics; internal ordering is free to differ
  since only polynomial values/commitments reach the transcript.

Multi-chip sharding of the first ``log2(n_dev)`` stages lives in
``parallel/ntt_sharded.py``.
"""
from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import refcrypto as rc
from . import limbs
from .field import FR, Fr


def _bitrev_perm(k: int) -> np.ndarray:
    n = 1 << k
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


@lru_cache(maxsize=64)
def _stage_twiddles(k: int, inverse: bool) -> tuple:
    """Per-stage twiddle limb arrays: stage s has (2^s, L) factors w_{2m}^j."""
    w_n = rc.fr_root_of_unity(k)
    if inverse:
        w_n = pow(w_n, rc.FR - 2, rc.FR)
    out = []
    for s in range(k):
        m = 1 << s
        w_2m = pow(w_n, 1 << (k - s - 1), rc.FR)  # order-2m root
        tw = limbs.ints_to_limbs(
            [pow(w_2m, j, rc.FR) for j in range(m)], limbs.NLIMBS)
        out.append(tw)
    return tuple(out)


@lru_cache(maxsize=64)
def _n_inv_limbs(k: int) -> np.ndarray:
    return limbs.int_to_limbs(pow(1 << k, rc.FR - 2, rc.FR), limbs.NLIMBS)


@partial(jax.jit, static_argnums=(4, 5))
def _ntt_impl(a, perm, tws, n_inv, k: int, inverse: bool) -> jnp.ndarray:
    """Twiddles/permutation arrive as *arguments*, not baked constants:
    at k=20 the tables are >100 MB and would otherwise bloat the HLO."""
    n = 1 << k
    x = jnp.take(a, perm, axis=0)
    L = x.shape[-1]
    rest = x.shape[1:]
    for s in range(k):
        m = 1 << s
        x = x.reshape((n // (2 * m), 2, m) + rest)
        e, o = x[:, 0], x[:, 1]
        tw = tws[s].reshape((1, m) + (1,) * (len(rest) - 1) + (L,))
        t = limbs.mul(FR, o, tw)
        x = jnp.stack([limbs.add(FR, e, t), limbs.sub(FR, e, t)], axis=1)
    x = x.reshape((n,) + rest)
    if inverse:
        x = limbs.mul(FR, x, n_inv.reshape((1,) * len(rest) + (limbs.NLIMBS,)))
    return x


@lru_cache(maxsize=32)
def _device_tables(k: int, inverse: bool):
    # ensure_compile_time_eval: this cache may be populated from inside a
    # jit trace (the prover's batched conversion programs); without it the
    # cached arrays would be leaked tracers.
    with jax.ensure_compile_time_eval():
        perm = jnp.asarray(_bitrev_perm(k))
        tws = tuple(jnp.asarray(t) for t in _stage_twiddles(k, inverse))
        n_inv = jnp.asarray(_n_inv_limbs(k))
    return perm, tws, n_inv


import os as _os

_MXU_MIN_K = 11
_mxu_env = _os.environ.get("H2T_NTT_MXU", "auto")


def _mxu_wanted(a, k: int) -> bool:
    """Whether to route eager transforms through the MXU four-step
    (ops/ntt_mxu).  DEFAULT OFF since round 4: measured on the v5e, the
    jitted radix-2 butterflies beat the four-step at prover sizes
    (2^17 x 8 cols: 226 ms vs 341 ms; 2^19 x 8: 1042 ms vs 1307 ms —
    tools/microbench.py ntt); the four-step's transposes and
    carry-relaxation passes outweigh its MXU matmuls.  H2T_NTT_MXU=1
    forces it on (bit-equality tests keep covering it).

    Only outside jit traces either way: the MXU path passes its constant
    tables as program arguments (they may not be baked into an enclosing
    HLO), so a traced call falls back to the radix-2 butterflies."""
    if _mxu_env != "1" or isinstance(a, jax.core.Tracer):
        return False
    from ..parallel.context import active_mesh
    mesh, _ = active_mesh()
    if mesh is not None and mesh.size > 1:
        # sharded-prover path: the eager MXU dispatch would bypass the
        # mesh-pinned sharding annotations (parallel/context.py) and run a
        # single-device combination no byte-identity test exercises
        # (ADVICE r3); the jitted radix-2 path shards under SPMD instead.
        return False
    return True


def ntt(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """Forward NTT: values X[i] = sum_j a[j] w^(ij) over rows of (2^k, ..., L)."""
    if _mxu_wanted(a, k):
        from . import ntt_mxu
        return ntt_mxu.ntt(a, k)
    perm, tws, n_inv = _device_tables(k, False)
    return _ntt_impl(a, perm, tws, n_inv, k, False)


def intt(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inverse NTT (includes the 1/N scaling)."""
    if _mxu_wanted(a, k):
        from . import ntt_mxu
        return ntt_mxu.intt(a, k)
    perm, tws, n_inv = _device_tables(k, True)
    return _ntt_impl(a, perm, tws, n_inv, k, True)


@lru_cache(maxsize=64)
def _power_table(base: int, n: int) -> np.ndarray:
    vals, acc = [], 1
    for _ in range(n):
        vals.append(acc)
        acc = acc * base % rc.FR
    return limbs.ints_to_limbs(vals, limbs.NLIMBS)


@partial(jax.jit, static_argnums=())
def _scale_impl(a: jnp.ndarray, tbl: jnp.ndarray) -> jnp.ndarray:
    shape = (tbl.shape[0],) + (1,) * (a.ndim - 2) + (limbs.NLIMBS,)
    return limbs.mul(FR, a, tbl.reshape(shape))


def scale_by_powers(a: jnp.ndarray, base: int, n: int) -> jnp.ndarray:
    """a[i] *= base^i — used for coset (extended-domain) evaluation."""
    return _scale_impl(a, jnp.asarray(_power_table(base, n)))


def coset_ntt(a: jnp.ndarray, k: int, g: int) -> jnp.ndarray:
    """Evaluate the polynomial with coefficients `a` on the coset g*H."""
    if _mxu_wanted(a, k):
        from . import ntt_mxu
        return ntt_mxu.coset_ntt(a, k, g)   # g^j folds into the matrices
    return ntt(scale_by_powers(a, g, 1 << k), k)


def coset_intt(a: jnp.ndarray, k: int, g: int) -> jnp.ndarray:
    """Interpolate from values on coset g*H back to coefficients."""
    if _mxu_wanted(a, k):
        from . import ntt_mxu
        return ntt_mxu.coset_intt(a, k, g)
    g_inv = pow(g, rc.FR - 2, rc.FR)
    return scale_by_powers(intt(a, k), g_inv, 1 << k)
