"""SHPLONK (BDFG21) batched multi-point opening.

Reference behavior: halo2_proofs `poly/kzg/multiopen/shplonk` (axiom fork
[dep] Cargo.lock:1320; SURVEY.md §3.2 final stage).  Protocol:

  prover                                   transcript
  ------                                   ----------
  (evals already written)                  y  = squeeze   (combine within set)
  h_i = Σ_j y^j (p_ij - r_ij) / Z_{S_i}    v  = squeeze   (combine across sets)
  H   = Σ_i v^i h_i                        write [H]
                                           u  = squeeze
  L   = Z⁻¹_{T∖S_0}(u)·[ Σ_i v^i Z_{T∖S_i}(u)(P_i - R_i(u)) − Z_T(u)·H ]
  W'  = L / (X − u)                        write [W']

  verify: e([W'], [s]₂) · e(−u[W'] − [L], [1]₂) == 1

Rotation sets S_i group polynomials by the exact set of points they are
opened at; r_ij / R_i are the degree-<|S_i>| interpolations of the claimed
evals.  Polynomial arithmetic (combination, divisions) runs on device; the
per-set scalar math (interpolation, vanishing evals) is host ints.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..ops import frops, limbs
from ..ops.field import Fr
from ..utils import refcrypto as rc

NL = limbs.NLIMBS


@dataclass
class ProverQuery:
    poly: jnp.ndarray     # (n, NL) LAGRANGE VALUES over the domain H
    point: int            # opening point (Fr int)
    eval: int             # claimed evaluation (Fr int) — must equal poly(point)
    name: str = ""        # stable identity: queries of the same poly share it


@dataclass
class VerifierQuery:
    commitment: tuple     # (x, y) affine G1, or ("scaled", [(comm, scalar)...])
    point: int
    eval: int
    name: str = ""


def _group_rotation_sets(queries):
    """Group queries by polynomial, then polys by their point-set.

    Returns an ordered list of sets: each = (points_tuple, [poly entries]),
    where each poly entry is (name, per-point data dict point->query).
    Ordering: by first appearance in the query list (both sets and polys) —
    the canonical order both sides derive independently.
    """
    by_poly: dict = {}
    poly_order: list = []
    for q in queries:
        key = q.name
        if key not in by_poly:
            by_poly[key] = {}
            poly_order.append(key)
        assert q.point not in by_poly[key], f"duplicate query {key}@{q.point}"
        by_poly[key][q.point] = q
    sets: dict = {}
    set_order: list = []
    for key in poly_order:
        pts = tuple(sorted(by_poly[key].keys()))
        if pts not in sets:
            sets[pts] = []
            set_order.append(pts)
        sets[pts].append((key, by_poly[key]))
    return [(pts, sets[pts]) for pts in set_order]


def _lagrange_interpolate(points, evals):
    """Coefficients of the unique degree-<len poly through (points, evals)."""
    m = len(points)
    coeffs = [0] * m
    for i in range(m):
        # basis poly prod_{j!=i} (X - x_j) / (x_i - x_j)
        denom = 1
        basis = [1]
        for j in range(m):
            if j == i:
                continue
            denom = denom * (points[i] - points[j]) % rc.FR
            new = [0] * (len(basis) + 1)
            for d, c in enumerate(basis):
                new[d + 1] = (new[d + 1] + c) % rc.FR
                new[d] = (new[d] - c * points[j]) % rc.FR
            basis = new
        scale = evals[i] * rc.finv(denom, rc.FR) % rc.FR
        for d, c in enumerate(basis):
            coeffs[d] = (coeffs[d] + c * scale) % rc.FR
    return coeffs


def _eval_poly_host(coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % rc.FR
    return acc


def _vanishing_eval(points, u):
    acc = 1
    for p in points:
        acc = acc * ((u - p) % rc.FR) % rc.FR
    return acc


def _axpy(acc, poly, scalar: int):
    """acc + scalar*poly on device coefficient arrays (auto length-match)."""
    s = jnp.broadcast_to(Fr.from_ints([scalar])[0][None], poly.shape)
    term = frops.mul(poly, s)
    if acc is None:
        return term
    if acc.shape[0] < term.shape[0]:
        acc = jnp.pad(acc, ((0, term.shape[0] - acc.shape[0]), (0, 0)))
    elif term.shape[0] < acc.shape[0]:
        term = jnp.pad(term, ((0, acc.shape[0] - term.shape[0]), (0, 0)))
    return frops.add(acc, term)


_FUSED_PROGS: dict = {}


def _fused_open_progs(n: int, npts: tuple, npolys: tuple, maxd: int):
    """Two jitted programs for the whole multiopen device math (structure
    is static per circuit): `fh(polys, ypow, vpow, Rc, zpts, omega) ->
    (H, P-stack)` and `fw(P, H, omega, wscal, ru, zt_neg, zdiff0_inv, u)
    -> W`.  The eager loops issued ~60 small dispatches between squeezes
    — pure tunnel latency (same disease the grand-product stage had)."""
    key = (n, npts, npolys, maxd)
    cached = _FUSED_PROGS.get(key)
    if cached is not None:
        return cached
    import jax

    S = len(npts)

    def bcr(row):
        return jnp.broadcast_to(row[None].astype(jnp.int32), (n, NL))

    def fh(polys, ypow, vpow, Rc, zpts, omega):
        pwd = [None] * max(maxd, 1)
        pwd[0] = None                       # omega^0 == 1: skip the mul
        for d in range(1, maxd):
            pwd[d] = omega if d == 1 else frops.mul(pwd[d - 1], omega)
        zs = []
        Ps = []
        for i in range(S):
            P = None
            for j in range(npolys[i]):
                term = frops.mul(polys[i][j].astype(jnp.int32),
                                 bcr(ypow[j])) if j else \
                    polys[i][j].astype(jnp.int32)
                P = term if P is None else frops.add(P, term)
            Ps.append(P)
            z = None
            for t in range(npts[i]):
                zt = frops.sub(omega, bcr(zpts[i, t]))
                z = zt if z is None else frops.mul(z, zt)
            zs.append(z)
        zinv = frops.batch_inv(
            jnp.concatenate(zs, axis=0)).reshape(S, n, NL)
        H = None
        for i in range(S):
            r_vals = bcr(Rc[i, 0])
            for d in range(1, npts[i]):
                r_vals = frops.add(r_vals, frops.mul(pwd[d], bcr(Rc[i, d])))
            h = frops.mul(frops.sub(Ps[i], r_vals), zinv[i])
            h = frops.mul(h, bcr(vpow[i])) if i else h
            H = h if H is None else frops.add(H, h)
        return H, tuple(Ps)

    def fw(Ps, H, omega, wscal, ru, zt_neg, zdiff0_inv, u):
        L = None
        for i in range(S):
            term = frops.mul(frops.sub(Ps[i], bcr(ru[i])), bcr(wscal[i]))
            L = term if L is None else frops.add(L, term)
        L = frops.add(L, frops.mul(H, bcr(zt_neg)))
        L = frops.mul(L, bcr(zdiff0_inv))
        return frops.mul(L, frops.batch_inv(frops.sub(omega, bcr(u))))

    progs = (jax.jit(fh), jax.jit(fw))
    _FUSED_PROGS[key] = progs
    return progs


def open_shplonk(params, queries, transcript, dom):
    """Prover side: runs the y/v/H/u/W' protocol on `transcript`.

    TPU-first reformulation: all polynomial arithmetic happens in the
    LAGRANGE VALUES domain (queries carry values over H).  The divisions
    by Z_{S_i}(X) and (X - u) become pointwise multiplications by
    batched inverses — the vanishing points (transcript challenges and
    their omega-rotations) are never in H, so Z never vanishes on the
    domain.  [H] and [W'] are committed straight from values via the
    Lagrange SRS; the resulting polynomials (and hence the proof bytes)
    are mathematically identical to the reference's coefficient-domain
    computation (halo2_proofs shplonk prover [dep] Cargo.lock:1320),
    without any iNTT or sequential synthetic-division scans.  The device
    math runs as TWO fused programs (one per transcript round); set
    H2T_MULTIOPEN=eager for the dispatch-per-op reference path (byte-
    identical, tested).
    """
    import os as _os
    if _os.environ.get("H2T_MULTIOPEN") == "eager" or \
            dom.n >= int(_os.environ.get("H2T_U8_MIN_N", 1 << 19)):
        # big domains: the dispatch-per-op path keeps per-intermediate
        # residency bounded (the fused programs give XLA scheduling
        # freedom over ~100 upcasted int32 columns — k=20 HBM risk);
        # latency fusion only matters at bench scale anyway
        return _open_shplonk_eager(params, queries, transcript, dom)
    rsets = _group_rotation_sets(queries)
    super_points = []
    for pts, _ in rsets:
        for p in pts:
            if p not in super_points:
                super_points.append(p)

    y = transcript.squeeze_challenge()

    # host scalar glue: per-set interpolations R_i of the y-combined evals
    combined_meta = []          # (pts, [polys], R coeffs)
    for pts, polys in rsets:
        evs = [0] * len(pts)
        yk = 1
        parr = []
        for name, qmap in polys:
            parr.append(qmap[pts[0]].poly)
            for t, p in enumerate(pts):
                evs[t] = (evs[t] + yk * qmap[p].eval) % rc.FR
            yk = yk * y % rc.FR
        R = _lagrange_interpolate(list(pts), evs)
        combined_meta.append((pts, parr, R))

    v = transcript.squeeze_challenge()

    n = dom.n
    S = len(combined_meta)
    npts = tuple(len(pts) for pts, _, _ in combined_meta)
    npolys = tuple(len(parr) for _, parr, _ in combined_meta)
    maxd = max(npts)
    maxp = max(npolys)
    fh, fw = _fused_open_progs(n, npts, npolys, maxd)

    ypow_l = [1] * maxp
    for j in range(1, maxp):
        ypow_l[j] = ypow_l[j - 1] * y % rc.FR
    vpow_l = [1] * S
    for i in range(1, S):
        vpow_l[i] = vpow_l[i - 1] * v % rc.FR
    Rc = [[0] * maxd for _ in range(S)]
    zpts = [[0] * maxd for _ in range(S)]
    for i, (pts, _, R) in enumerate(combined_meta):
        for d, c in enumerate(R):
            Rc[i][d] = c
        for t, p in enumerate(pts):
            zpts[i][t] = p
    # ONE host->device upload for every proof-dependent scalar
    flat = (ypow_l + vpow_l + [c for row in Rc for c in row]
            + [p for row in zpts for p in row])
    dev = Fr.from_ints(flat)
    ypow = dev[:maxp]
    vpow = dev[maxp:maxp + S]
    off = maxp + S
    Rc_d = dev[off:off + S * maxd].reshape(S, maxd, NL)
    off += S * maxd
    zpts_d = dev[off:off + S * maxd].reshape(S, maxd, NL)

    omega_pows = dom.omega_pows_device
    H, Ps = fh(tuple(tuple(parr) for _, parr, _ in combined_meta),
               ypow, vpow, Rc_d, zpts_d, omega_pows)
    h_commit = params.commit_lagrange(H)
    transcript.write_point(h_commit)

    u = transcript.squeeze_challenge()

    zt_eval = _vanishing_eval(super_points, u)
    wscal_l, ru_l = [], []
    z_diff_0 = None
    for i, (pts, _, R) in enumerate(combined_meta):
        diff_pts = [p for p in super_points if p not in pts]
        z_i = _vanishing_eval(diff_pts, u)
        if z_diff_0 is None:
            z_diff_0 = z_i
        wscal_l.append(vpow_l[i] * z_i % rc.FR)
        ru_l.append(_eval_poly_host(R, u))
    flat2 = (wscal_l + ru_l
             + [(-zt_eval) % rc.FR, rc.finv(z_diff_0, rc.FR), u])
    dev2 = Fr.from_ints(flat2)
    W = fw(Ps, H, omega_pows, dev2[:S], dev2[S:2 * S],
           dev2[2 * S], dev2[2 * S + 1], dev2[2 * S + 2])
    w_commit = params.commit_lagrange(W)
    transcript.write_point(w_commit)


def _open_shplonk_eager(params, queries, transcript, dom):
    """Dispatch-per-op reference path (H2T_MULTIOPEN=eager)."""
    rsets = _group_rotation_sets(queries)
    super_points = []
    for pts, _ in rsets:
        for p in pts:
            if p not in super_points:
                super_points.append(p)

    y = transcript.squeeze_challenge()

    # Per set: P_i = sum_j y^j p_ij (values) ; R_i = interp(points, evals)
    combined = []
    for pts, polys in rsets:
        P = None
        yk = 1
        evs = [0] * len(pts)
        for name, qmap in polys:
            P = _axpy(P, qmap[pts[0]].poly, yk)
            for t, p in enumerate(pts):
                evs[t] = (evs[t] + yk * qmap[p].eval) % rc.FR
            yk = yk * y % rc.FR
        R = _lagrange_interpolate(list(pts), evs)
        combined.append((pts, P, R))

    v = transcript.squeeze_challenge()

    n = dom.n
    omega_pows = dom.omega_pows_device              # (n, NL)

    def bc(c: int):
        return jnp.broadcast_to(Fr.from_ints([c % rc.FR])[0][None],
                                (n, NL))

    # omega power planes for evaluating the (deg < |S_i|) R_i over H
    maxd = max(len(pts) for pts, _, _ in combined)
    pwd = [None] * maxd
    if maxd > 0:
        pwd[0] = bc(1)
    if maxd > 1:
        pwd[1] = omega_pows
    for d in range(2, maxd):
        pwd[d] = frops.mul(pwd[d - 1], omega_pows)

    # Z_{S_i}(omega^j) = prod_z (omega^j - z); one batched inversion
    zvals = []
    for pts, _, _ in combined:
        z = None
        for zpt in pts:
            t = frops.sub(omega_pows, bc(zpt))
            z = t if z is None else frops.mul(z, t)
        zvals.append(z)
    zinv = frops.batch_inv(jnp.concatenate(zvals, axis=0)) \
        .reshape(len(combined), n, NL)

    # h_i = (P_i - R_i) * Z_i^{-1} pointwise; H = sum v^i h_i
    H = None
    vk_pow = 1
    for i, (pts, P, R) in enumerate(combined):
        r_vals = None
        for d, c in enumerate(R):
            term = frops.mul(pwd[d], bc(c)) if d > 0 else bc(c)
            r_vals = term if r_vals is None else frops.add(r_vals, term)
        h = frops.mul(frops.sub(P, r_vals), zinv[i])
        H = _axpy(H, h, vk_pow)
        vk_pow = vk_pow * v % rc.FR
    h_commit = params.commit_lagrange(H)
    transcript.write_point(h_commit)

    u = transcript.squeeze_challenge()

    zt_eval = _vanishing_eval(super_points, u)
    L = None
    vk_pow = 1
    z_diff_0 = None
    for pts, P, R in combined:
        diff_pts = [p for p in super_points if p not in pts]
        z_i = _vanishing_eval(diff_pts, u)
        if z_diff_0 is None:
            z_diff_0 = z_i
        r_u = _eval_poly_host(R, u)
        term = frops.sub(P, bc(r_u))
        L = _axpy(L, term, vk_pow * z_i % rc.FR)
        vk_pow = vk_pow * v % rc.FR
    L = _axpy(L, H, (-zt_eval) % rc.FR)
    L = _scale(L, rc.finv(z_diff_0, rc.FR))
    # W' = L / (X - u): pointwise division over H (u not in H)
    W = frops.mul(L, frops.batch_inv(frops.sub(omega_pows, bc(u))))
    w_commit = params.commit_lagrange(W)
    transcript.write_point(w_commit)


def _scale(poly, scalar: int):
    s = jnp.broadcast_to(Fr.from_ints([scalar])[0][None], poly.shape)
    return frops.mul(poly, s)


def verify_shplonk(params, queries, transcript) -> bool:
    """Verifier side: reads [H], [W'], does the pairing check (host)."""
    rsets = _group_rotation_sets(queries)
    super_points = []
    for pts, _ in rsets:
        for p in pts:
            if p not in super_points:
                super_points.append(p)

    y = transcript.squeeze_challenge()
    # combined commitments [P_i] and eval interpolations
    combined = []
    for pts, polys in rsets:
        P = rc.G1_IDENTITY
        yk = 1
        evs = [0] * len(pts)
        for name, qmap in polys:
            P = rc.g1_add(P, _commitment_mul(qmap[pts[0]].commitment, yk))
            for t, p in enumerate(pts):
                evs[t] = (evs[t] + yk * qmap[p].eval) % rc.FR
            yk = yk * y % rc.FR
        R = _lagrange_interpolate(list(pts), evs)
        combined.append((pts, P, R))

    v = transcript.squeeze_challenge()
    h_commit = transcript.read_point()
    u = transcript.squeeze_challenge()

    zt_eval = _vanishing_eval(super_points, u)
    L = rc.G1_IDENTITY
    const_acc = 0      # accumulated scalar multiplied by G (from R_i(u) terms)
    vk_pow = 1
    z_diff_0 = None
    for pts, P, R in combined:
        diff_pts = [p for p in super_points if p not in pts]
        z_i = _vanishing_eval(diff_pts, u)
        if z_diff_0 is None:
            z_diff_0 = z_i
        r_u = _eval_poly_host(R, u)
        w = vk_pow * z_i % rc.FR
        L = rc.g1_add(L, rc.g1_mul(P, w))   # P is Jacobian
        const_acc = (const_acc + w * r_u) % rc.FR
        vk_pow = vk_pow * v % rc.FR
    # subtract const_acc * G and zt_eval * H
    L = rc.g1_add(L, rc.g1_mul(rc.g1_from_affine(rc.G1_GEN), (-const_acc) % rc.FR))
    L = rc.g1_add(L, rc.g1_mul(rc.g1_from_affine(h_commit), (-zt_eval) % rc.FR))
    L = rc.g1_mul(L, rc.finv(z_diff_0, rc.FR))

    w_commit = transcript.read_point()
    # e([W'], [s]2) * e(-u[W'] - [L], [1]2) == 1
    lhs = rc.g1_to_affine(
        rc.g1_add(rc.g1_mul(rc.g1_from_affine(w_commit), u), L))
    return rc.pairing_check([
        (w_commit, params.s_g2),
        (rc.g1_to_affine(rc.g1_neg(rc.g1_from_affine(lhs))), params.g2),
    ])


def _commitment_mul(commitment, scalar: int):
    """Affine commitment (or lazy scaled-sum form) times scalar -> Jacobian."""
    if isinstance(commitment, tuple) and len(commitment) == 2 \
            and isinstance(commitment[0], int):
        return rc.g1_mul(rc.g1_from_affine(commitment), scalar)
    # lazy form: ("msm", [(affine_pt, coeff), ...])
    tag, terms = commitment
    assert tag == "msm"
    acc = rc.G1_IDENTITY
    for pt, c in terms:
        acc = rc.g1_add(acc, rc.g1_mul(rc.g1_from_affine(pt), c * scalar % rc.FR))
    return acc
