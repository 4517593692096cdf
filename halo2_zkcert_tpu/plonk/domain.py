"""Evaluation domain for PLONK polynomial arithmetic.

Mirrors halo2_proofs `EvaluationDomain` (axiom fork [dep] Cargo.lock:1320):
a 2^k multiplicative subgroup H = <omega> of Fr*, an extended domain of size
2^extended_k on the coset g_coset * H_ext (g_coset = ZETA, a cube root of
unity times the generator — here simply the multiplicative generator raised
so cosets are disjoint), and the vanishing polynomial Z_H(X) = X^n - 1.

Device data (twiddles etc.) lives in ops.ntt; this class holds the host-side
scalars (omega, its powers/inverses) and the coset logic.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property, lru_cache

import jax.numpy as jnp
import numpy as np

from ..ops import frops, limbs, ntt
from ..ops.field import Fr
from ..utils import refcrypto as rc


@dataclass(frozen=True)
class Domain:
    k: int
    quotient_degree: int  # max gate degree - 1; extension factor rounded up

    @cached_property
    def n(self) -> int:
        return 1 << self.k

    @cached_property
    def extended_k(self) -> int:
        need = self.n * max(self.quotient_degree, 1)
        ek = self.k
        while (1 << ek) < need:
            ek += 1
        return ek

    @cached_property
    def extended_n(self) -> int:
        return 1 << self.extended_k

    @cached_property
    def omega(self) -> int:
        return rc.fr_root_of_unity(self.k)

    @cached_property
    def omega_inv(self) -> int:
        return rc.finv(self.omega, rc.FR)

    @cached_property
    def extended_omega(self) -> int:
        return rc.fr_root_of_unity(self.extended_k)

    # Coset generator for the extended domain.  halo2 uses ZETA (a primitive
    # cube root of unity) scaled; any element not in H_ext works — we use the
    # field's multiplicative generator (7), whose order doesn't divide 2^ek.
    G_COSET: int = rc.FR_GENERATOR

    @cached_property
    def g_coset_inv(self) -> int:
        return rc.finv(self.G_COSET, rc.FR)

    # ---- host scalar helpers -------------------------------------------------

    def rotate_omega(self, x: int, rotation: int) -> int:
        """x * omega^rotation (rotation may be negative)."""
        if rotation >= 0:
            return x * pow(self.omega, rotation, rc.FR) % rc.FR
        return x * pow(self.omega_inv, -rotation, rc.FR) % rc.FR

    def l_i_range(self, x: int, xn: int, idxs) -> list:
        """Evaluate Lagrange basis polys L_i(x) for i in idxs (host ints).

        L_i(x) = (omega^i / n) * (x^n - 1) / (x - omega^i).
        """
        out = []
        zh = (xn - 1) % rc.FR
        n_inv = rc.finv(self.n, rc.FR)
        for i in idxs:
            wi = pow(self.omega, i % self.n, rc.FR)
            denom = (x - wi) % rc.FR
            out.append(zh * wi % rc.FR * n_inv % rc.FR * rc.finv(denom, rc.FR) % rc.FR)
        return out

    # ---- device transforms ---------------------------------------------------

    def lagrange_to_coeff(self, values: jnp.ndarray) -> jnp.ndarray:
        """Values on H -> monomial coefficients (inverse NTT)."""
        return ntt.intt(values, self.k)

    def coeff_to_lagrange(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        return ntt.ntt(coeffs, self.k)

    def coeff_to_extended(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """Monomial coeffs (n rows) -> values on the extended coset domain."""
        pad = self.extended_n - coeffs.shape[0]
        if pad:
            coeffs = jnp.concatenate(
                [coeffs, jnp.zeros((pad, limbs.NLIMBS), jnp.int32)], axis=0)
        return ntt.coset_ntt(coeffs, self.extended_k, self.G_COSET)

    def extended_to_coeff(self, values: jnp.ndarray) -> jnp.ndarray:
        """Values on the extended coset -> monomial coeffs (length extended_n)."""
        return ntt.coset_intt(values, self.extended_k, self.G_COSET)

    @cached_property
    def zh_inv_extended(self) -> np.ndarray:
        """1 / Z_H(coset point) over the extended domain, host-precomputed.

        Z_H((g w_ext^j)^...) = g^n * w_ext^(n j) - 1, periodic with period
        extended_n / n; returns the full (extended_n,) int array of inverses
        as limb rows (cached per domain).
        """
        period = self.extended_n // self.n
        g_n = pow(self.G_COSET, self.n, rc.FR)
        w_n = pow(self.extended_omega, self.n, rc.FR)
        vals = []
        acc = g_n
        for _ in range(period):
            vals.append(rc.finv((acc - 1) % rc.FR, rc.FR))
            acc = acc * w_n % rc.FR
        tiled = np.tile(limbs.ints_to_limbs(vals, limbs.NLIMBS), (self.n, 1))
        return tiled

    def divide_by_vanishing(self, extended_values: jnp.ndarray) -> jnp.ndarray:
        """Pointwise h = numerator / Z_H on the extended coset domain."""
        return frops.mul(extended_values, jnp.asarray(self.zh_inv_extended))

    @cached_property
    def omega_pows_device(self) -> jnp.ndarray:
        """(n, NLIMBS) device table [1, omega, omega^2, ...] — shared by
        barycentric evaluation and values-domain SHPLONK."""
        return jnp.asarray(ntt._power_table(self.omega, self.n))

    def bary_scale(self, x: int) -> int:
        """(x^n - 1) / n — the shared barycentric weight scale for x."""
        return (pow(x, self.n, rc.FR) - 1) % rc.FR \
            * rc.finv(self.n, rc.FR) % rc.FR


@lru_cache(maxsize=16)
def domain(k: int, quotient_degree: int) -> Domain:
    return Domain(k, quotient_degree)
