"""BN254 field instances (Fr, Fq) on the limb-plane kernels.

Thin convenience layer binding `ops.limbs` to the two BN254 fields used by
the proving stack (reference: halo2curves axiom fork [dep], Cargo.lock:1359).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import refcrypto as rc
from . import limbs
from .limbs import FieldSpec, NLIMBS, CANON_LIMBS

FR = FieldSpec.make("Fr", rc.FR)
FQ = FieldSpec.make("Fq", rc.FQ)


class F:
    """Namespace of field ops bound to one FieldSpec (used as Fr.add(...)).

    Public ops are jit-wrapped at construction: callers get compiled+cached
    kernels whether or not they are already inside a jit trace.
    """

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.modulus = spec.modulus
        self.add = jax.jit(partial(limbs.add, spec))
        self.sub = jax.jit(partial(limbs.sub, spec))
        self.neg = jax.jit(partial(limbs.neg, spec))
        self.mul = jax.jit(partial(limbs.mul, spec))
        self.sqr = jax.jit(partial(limbs.sqr, spec))
        self.inv = jax.jit(partial(limbs.inv, spec))
        self.canonical = jax.jit(partial(limbs.canonical, spec))
        self.eq = jax.jit(partial(limbs.eq, spec))
        self.is_zero = jax.jit(partial(limbs.is_zero, spec))
        self.mul_small = jax.jit(partial(limbs.mul_small, spec), static_argnums=1)
        self.pow_const = jax.jit(partial(limbs.pow_const, spec), static_argnums=1)

    def const(self, value, shape=()):
        return limbs.const_limbs(self.spec, value, shape)

    def zeros(self, shape=()):
        return limbs.zeros_like_limbs(shape)

    def from_ints(self, xs):
        """Host: iterable of Python ints -> (N, NLIMBS) device-ready array."""
        return jnp.asarray(limbs.ints_to_limbs([x % self.modulus for x in xs]))

    def to_ints(self, a):
        """Host: (..., W) limb array -> numpy object array of Python ints
        (canonical, mod p).  Canonicalizes on device, then converts each
        row with one `int.from_bytes` — ~100x faster than per-limb sums."""
        arr = np.asarray(self.canonical(jnp.asarray(a))).astype(np.uint8)
        flat = arr.reshape(-1, arr.shape[-1])
        vals = [int.from_bytes(flat[i].tobytes(), "little")
                for i in range(flat.shape[0])]
        return np.array(vals, dtype=object).reshape(arr.shape[:-1])


Fr = F(FR)
Fq = F(FQ)
