"""PLONKish prover: the create_proof pipeline of SURVEY.md §3.2.

Reference behavior: halo2_proofs `create_proof` (axiom fork [dep]
Cargo.lock:1320): phase advice commits -> lookup permute/commit ->
permutation & lookup grand products -> vanishing random poly -> quotient on
the extended coset -> evals at x -> SHPLONK multiopen.

TPU mapping: every O(n) step is a batched device op (MSM commits, NTTs,
prefix-product scans, pointwise limb algebra); the Fiat-Shamir transcript
and per-poly scalar glue stay host-side.  The boundary between transcript
rounds and device programs follows SURVEY.md §3.2's note: each round
triggers fused device work, then a host squeeze.
"""
from __future__ import annotations

import os as _os

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax.numpy as jnp

from ..ops import frops, limbs, ntt
from ..ops.field import Fr
from ..utils import refcrypto as rc
from . import expression as ex
from .assignment import BlindingRng
from .cs import ADVICE, DELTA, FIXED, INSTANCE
from .domain import Domain
from .keygen import ProvingKey
from .kzg import ParamsKZG, commit_many, commit_many_lagrange
from .shplonk import ProverQuery, open_shplonk

NL = limbs.NLIMBS

# Per-stage wall times of the LAST create_proof call (seconds) — consumed
# by bench.py's detail line (SURVEY §5 metrics: per-stage artifact).
LAST_STAGE_TIMES: dict = {}


def _to_int(arr) -> int:
    return int(limbs.limbs_to_int(np.asarray(arr)) % rc.FR)


def _fr(x: int):
    return Fr.from_ints([x])[0]


def _bcast(x: int, n: int):
    return jnp.broadcast_to(_fr(x)[None], (n, NL))


def instance_lagrange(vals: list, n: int) -> jnp.ndarray:
    padded = list(vals) + [0] * (n - len(vals))
    return Fr.from_ints(padded)


def _commit_mixed(params: ParamsKZG, cols: list, bits: list,
                  blind_lo: int) -> list:
    """Commit columns with per-column value-bit hints, preserving order.

    Columns with a bound (bits[i] != None) go through the bounded-window
    fixed-base path grouped by bound; the rest through the full path."""
    pts = [None] * len(cols)
    full = [i for i, b in enumerate(bits) if b is None]
    if full:
        for i, pt in zip(full, commit_many_lagrange(
                params, [cols[i] for i in full])):
            pts[i] = pt
    groups: dict = {}
    for i, b in enumerate(bits):
        if b is not None:
            groups.setdefault(b, []).append(i)
    for b, idxs in groups.items():
        for i, pt in zip(idxs, commit_many_lagrange(
                params, [cols[i] for i in idxs], value_bits=b,
                blind_lo=blind_lo)):
            pts[i] = pt
    return pts


def _compress(exprs, theta: int, leaf_eval) -> jnp.ndarray:
    """theta-fold: acc = acc * theta + value (halo2 lookup compression)."""
    acc = None
    for e in exprs:
        v = leaf_eval(e)
        if acc is None:
            acc = v
        else:
            acc = frops.add(frops.mul(acc, _bcast(theta, acc.shape[0])), v)
    return acc


def _eval_expr_lagrange(e: ex.Expr, n: int, advice, fixed, instance, challenges):
    """Evaluate an expression over the original Lagrange domain (device)."""
    return ex.evaluate(
        e,
        constant=lambda v: _bcast(v % rc.FR, n),
        fixed=lambda i, r: jnp.roll(fixed[i], -r, axis=0),
        advice=lambda i, r: jnp.roll(advice[i], -r, axis=0),
        instance=lambda i, r: jnp.roll(instance[i], -r, axis=0),
        challenge=lambda i: _bcast(challenges[i], n),
        add=frops.add, mul=frops.mul,
        scale=lambda a, s: frops.mul(a, _bcast(s % rc.FR, a.shape[0])),
    )


def create_proof(params: ParamsKZG, pk: ProvingKey, witness,
                 instances: list, transcript, rng: BlindingRng | None = None):
    """witness: either an (num_advice, n, NL) Lagrange-basis array (single
    phase) or a callable `witness(phase: int, challenges: dict) -> dict
    {col_index: (n, NL) array}` producing that phase's advice columns
    (halo2 multi-phase create_proof semantics [dep]);
    instances: list (per instance column) of lists of Fr ints."""
    import time as _time
    _prof = bool(_os.environ.get("H2T_PROFILE"))
    _t0 = _time.perf_counter()
    LAST_STAGE_TIMES.clear()

    def _tick(stage):
        nonlocal _t0
        t = _time.perf_counter()
        LAST_STAGE_TIMES[stage] = round(t - _t0, 3)
        if _prof:
            print(f"  [prove] {stage}: {t - _t0:.3f}s", flush=True)
        _t0 = t

    rng = rng or BlindingRng()
    vk = pk.vk
    csys = vk.cs
    dom = pk.domain()
    n, ext_n = dom.n, dom.extended_n
    bf = csys.blinding_factors()
    u_row = n - bf - 1            # l_last row / last active row

    # big domains: committed witness columns are canonicalized to u8 right
    # after their commitment leaves for the transcript — at k=20 the
    # aggregation circuit's ~50 witness/Z columns cost ~7 GB as int32 vs
    # ~1.8 GB as u8, and every later consumer (quotient conversion, evals,
    # SHPLONK) upcasts in-program anyway
    _shrink = n >= int(_os.environ.get("H2T_U8_MIN_N", 1 << 19))

    def _post_commit(col):
        return _to_u8(col[None])[0] if _shrink else col

    # -- 0: vk & instances into transcript ------------------------------------
    transcript.common_scalar(vk.transcript_repr())
    for col in instances:
        for v in col:
            transcript.common_scalar(v)

    inst_lag = [instance_lagrange(col, n) for col in instances]
    if _shrink:
        # canonical byte limbs by construction — store u8
        inst_lag = [c.astype(jnp.uint8) for c in inst_lag]

    # -- 1: per-phase: blind & commit advice, squeeze phase challenges ---------
    if callable(witness):
        witness_fn = witness
    else:
        witness_fn = lambda phase, ch: (
            {i: witness[i] for i in range(csys.num_advice)} if phase == 0 else {})
    _p2 = bool(_os.environ.get("H2T_PROFILE2"))
    advice_cols: list = [None] * csys.num_advice
    challenges: dict = {}
    for phase in range(csys.num_phases):
        _tw = _time.perf_counter()
        phase_cols = witness_fn(phase, dict(challenges))
        if _p2:
            print(f"    [phase{phase}] witness_fn: "
                  f"{_time.perf_counter() - _tw:.3f}s", flush=True)
        expected = [i for i in range(csys.num_advice)
                    if csys.advice_phases[i] == phase]
        assert sorted(phase_cols.keys()) == expected, \
            f"phase {phase}: witness must supply columns {expected}"
        batch = []
        for i in expected:
            col = phase_cols[i]
            blinds = Fr.from_ints(rng.fill(bf + 1))
            col = col.at[u_row:].set(blinds)
            # u8 BEFORE committing: the commitment of a byte representative
            # is the same group element, and the u8 batch avoids stacking
            # GBs of int32 columns on big domains
            col = _post_commit(col)
            advice_cols[i] = col
            batch.append(col)
            phase_cols[i] = None    # free the int32 original eagerly
        phase_cols = None
        bits = [csys.advice_value_bits.get(i) for i in expected]
        for pt in _commit_mixed(params, batch, bits, u_row):
            transcript.write_point(pt)
        for ci, cp in enumerate(csys.challenge_phases):
            if cp == phase:
                challenges[ci] = transcript.squeeze_challenge()

    _tick("phase commits")
    theta = transcript.squeeze_challenge()

    # -- 2: lookups: compress, permute, commit ---------------------------------
    leaf = lambda e: _eval_expr_lagrange(e, n, advice_cols, pk.fixed_lagrange,
                                         inst_lag, challenges)
    lookups = []
    lk_batch = []
    lk_bits = []
    for lk in csys.lookups:
        a_comp = _compress([p[0] for p in lk.pairs], theta, leaf)
        s_comp = _compress([p[1] for p in lk.pairs], theta, leaf)
        # device-side permutation: sorting/matching never leaves the chip
        # (fetching the columns costs ~0.7 s/17MB over the remote tunnel)
        a_arr, s_arr, ok = frops.lookup_permute_device(a_comp, s_comp, u_row,
                                                       lk.max_bits)
        if not bool(ok):
            raise ValueError(f"lookup '{lk.name}' failure: input not in table")
        a_arr = a_arr.at[u_row:].set(Fr.from_ints(rng.fill(bf + 1)))
        s_arr = s_arr.at[u_row:].set(Fr.from_ints(rng.fill(bf + 1)))
        a_arr, s_arr = _post_commit(a_arr), _post_commit(s_arr)
        lk_batch += [a_arr, s_arr]
        lk_bits += [lk.max_bits, lk.max_bits]
        # compressed a/s shrink too (consumed by the grand products and
        # selfchecks as mod-r values only)
        lookups.append(dict(a=_post_commit(a_comp), s=_post_commit(s_comp),
                            a_perm=a_arr, s_perm=s_arr))
    for pt in _commit_mixed(params, lk_batch, lk_bits, u_row):
        transcript.write_point(pt)

    _tick("lookup permute+commit")
    beta = transcript.squeeze_challenge()
    gamma = transcript.squeeze_challenge()

    # -- 3: permutation grand products ------------------------------------------
    perm_cols = csys.permutation_columns
    chunk_len = csys.permutation_chunk_len()
    chunks = [perm_cols[i:i + chunk_len] for i in range(0, len(perm_cols), chunk_len)]

    def col_lagrange(col):
        return {FIXED: pk.fixed_lagrange, ADVICE: advice_cols,
                INSTANCE: inst_lag}[col.kind][col.index]

    # All grand products (permutation chunks + lookups) share ONE batched
    # inversion and ONE batched prefix scan — the reference computes each Z
    # column independently [dep]; the columns are independent up to the
    # permutation chunk chaining, which is restored afterwards by scaling
    # each chunk's unit scan with the previous chunk's boundary value.
    omega_pows = dom.omega_pows_device
    beta_l, gamma_l = _bcast(beta, n), _bcast(gamma, n)

    def _gp_perm(ci, chunk):
        num = None
        den = None
        for pos_in_chunk, col in enumerate(chunk):
            gpos = ci * chunk_len + pos_in_chunk
            v = col_lagrange(col)
            ident = frops.mul(omega_pows,
                              _bcast(beta * pow(DELTA, gpos, rc.FR) % rc.FR, n))
            t_num = frops.add(frops.add(v, ident), gamma_l)
            sig = pk.sigma_lagrange[gpos]
            t_den = frops.add(frops.add(v, frops.mul(sig, beta_l)), gamma_l)
            num = t_num if num is None else frops.mul(num, t_num)
            den = t_den if den is None else frops.mul(den, t_den)
        return num, den

    def _gp_lookup(lkd):
        return (frops.mul(frops.add(lkd["a"], beta_l),
                          frops.add(lkd["s"], gamma_l)),
                frops.mul(frops.add(lkd["a_perm"], beta_l),
                          frops.add(lkd["s_perm"], gamma_l)))

    # Small domains: the WHOLE stage (every chunk Z + lookup Z, chaining,
    # blinding) fuses into ONE jitted device program (_gp_fn) — at k=17 the
    # streamed per-column pipelines cost ~3 s of pure dispatch latency over
    # the remote TPU tunnel for ~2 columns of actual math.  Big domains
    # (H2T_U8_MIN_N) keep the streaming pass: num/den/unit for a column are
    # freed before the next column starts — materializing all ~21 triples
    # at once cost ~9 GB at k=20.  (The round-2 "batched" variant is gone:
    # its wrong-Z defect was the non-power-of-two grid-scan input, now
    # impossible at the primitive — docs/DEBUG_R3_VERIFY_REGRESSION.md.)
    # Blinding draw order matches the reference two-loop structure (chunks
    # first, then lookups) in both paths — proof bytes are identical.
    _sc3 = _os.environ.get("H2T_SELFCHECK") == "3"
    sc3_ops = [] if _sc3 else None
    one_row = jnp.zeros((1, NL), jnp.int32).at[0, 0].set(1)

    if not _shrink and not _sc3:
        gp_run = _gp_fn(pk)
        perm_vals = tuple(col_lagrange(c) for chunk in chunks for c in chunk)
        lk_quads = tuple(x for lkd in lookups
                         for x in (lkd["a"], lkd["s"],
                                   lkd["a_perm"], lkd["s_perm"]))
        blinds = tuple(Fr.from_ints(rng.fill(bf))
                       for _ in range(len(chunks) + len(lookups)))
        outs = gp_run(perm_vals, pk.sigma_lagrange, omega_pows,
                      _fr(beta), _fr(gamma), lk_quads, blinds)
        perm_zs = list(outs[:len(chunks)])
        z_batch = list(outs)
        for li, lkd in enumerate(lookups):
            lkd["z"] = outs[len(chunks) + li]
    else:
        def _unit_of(num, den):
            ratio = frops.mul(num, frops.batch_inv(den))
            if _sc3:
                sc3_ops.append((num, den))
            return frops.prefix_product(
                jnp.concatenate([one_row, ratio[:-1]], axis=0))

        perm_zs = []
        start = _fr(1)             # device scalar — chunk chaining, no fetch
        for ci, chunk in enumerate(chunks):
            unit = _unit_of(*_gp_perm(ci, chunk))
            z = unit if ci == 0 else frops.mul(
                unit, jnp.broadcast_to(start[None], (n, NL)))
            unit = None
            start = z[u_row]
            z = z.at[n - bf:].set(Fr.from_ints(rng.fill(bf)))
            z = _post_commit(z)
            perm_zs.append(z)

        # -- 4: lookup grand products --------------------------------------------
        z_batch = list(perm_zs)
        for li, lkd in enumerate(lookups):
            z = _unit_of(*_gp_lookup(lkd))
            z = z.at[n - bf:].set(Fr.from_ints(rng.fill(bf)))
            z = _post_commit(z)
            z_batch.append(z)
            lkd["z"] = z

    if _os.environ.get("H2T_SELFCHECK") == "3":
        # level 3: validate the grand-product recurrences over H (mock
        # checks gates/lookups/copies but NOT the prover-built Z columns)
        from ..ops.field import FR as _FRS

        def allzero(arr, upto, what):
            ok = bool(jnp.all(limbs.is_zero(_FRS, arr[:upto])))
            print(f"  [selfcheck3] {what}: {'OK' if ok else 'VIOLATED'}",
                  flush=True)

        for ci in range(len(chunks)):
            z = perm_zs[ci]
            num_ci, den_ci = sc3_ops[ci]
            resid = frops.sub(frops.mul(jnp.roll(z, -1, axis=0), den_ci),
                              frops.mul(z, num_ci))
            allzero(resid, u_row, f"perm_z{ci} recurrence")
            if ci:
                allzero(frops.sub(perm_zs[ci][:1],
                                  perm_zs[ci - 1][u_row:u_row + 1]), 1,
                        f"perm_z{ci} chain start")
        one_row = jnp.zeros((1, NL), jnp.int32).at[0, 0].set(1)
        allzero(frops.sub(perm_zs[-1][u_row:u_row + 1], one_row), 1,
                "perm_z last == 1 at u_row")
        for li, lkd in enumerate(lookups):
            z = lkd["z"]
            resid = frops.sub(
                frops.mul(jnp.roll(z, -1, axis=0),
                          frops.mul(frops.add(lkd["a_perm"], beta_l),
                                    frops.add(lkd["s_perm"], gamma_l))),
                frops.mul(z, frops.mul(frops.add(lkd["a"], beta_l),
                                       frops.add(lkd["s"], gamma_l))))
            allzero(resid, u_row, f"lookup{li}_z recurrence")

    # -- 5: vanishing random poly — defined by its (uniform) VALUES over H
    # and committed through the Lagrange SRS in the same batch as the
    # grand-product columns (one device program fewer on the critical path)
    random_vals = jnp.asarray(rng.fill_limbs(n).astype(
        np.uint8 if _shrink else np.int32))           # bytes by construction
    z_batch.append(random_vals)
    for pt in commit_many_lagrange(params, z_batch):
        transcript.write_point(pt)

    _tick("grand products+random")
    y = transcript.squeeze_challenge()

    # -- 6: quotient — ONE fused device program per circuit (cached on pk).
    # The expression forest is traced once into a single XLA program; at k=17
    # the eager path issued thousands of small dispatches (compile+latency
    # dominated on the remote tunnel / 1-core host).
    qfn = _quotient_fn(pk)
    chal_list = [theta, beta, gamma, y] + [challenges[i]
                                           for i in range(csys.num_challenges)]
    chal = jnp.stack([_fr(c) for c in chal_list])

    if _shrink:
        # the LAGRANGE commit table (1.2 GB) is idle through the quotient
        # and its h commits run on the MONOMIAL table; drop it for
        # headroom — the multiopen's commit_lagrange reloads it lazily
        # from the disk cache
        params.__dict__.pop("_fb_lagrange", None)
        # fixed/sigma LAGRANGE pk columns (~3 GB at the aggregation scale)
        # are also idle through the quotient (the coset pipeline reads the
        # COEFF forms); stash to a host mirror and restore before the
        # evals/multiopen
        mirror = pk.__dict__.get("_host_mirror")
        if mirror is None:
            mirror = {}
            pk.__dict__["_host_mirror"] = mirror
        for nm in ("fixed_lagrange", "sigma_lagrange",
                   "fixed_coeff", "sigma_coeff"):
            arr = getattr(pk, nm)
            if arr is not None:
                mirror.setdefault(nm, np.asarray(arr))
        pk.fixed_lagrange = None
        pk.sigma_lagrange = None
        # the coeff arrays stay HOST-resident permanently: the coset
        # quotient uploads one column at a time (they have no other
        # consumers)
        pk.fixed_coeff = None
        pk.sigma_coeff = None
        # WITNESS lagrange columns (advice + Zs + lookup permuted columns,
        # ~2.9 GB at the k=20 aggregation) are likewise idle through the
        # coset quotient (it consumes only its own coeff staging): stash
        # them to host the moment the staging pass completes (callback
        # from _quotient_fn_coset) and restore before the evals.  The
        # compressed lookup a/s columns have NO post-quotient consumers at
        # all — freed outright.  (Two k=20 OOMs landed in the coset loop
        # with these resident.)
        wit_stash: dict = {}
        if not _os.environ.get("H2T_SELFCHECK"):
            def _stash_witness():
                for lkd in lookups:
                    lkd["a"] = lkd["s"] = None
                wit_stash["advice"] = [np.asarray(c) for c in advice_cols]
                for i in range(len(advice_cols)):
                    advice_cols[i] = None
                wit_stash["permz"] = [np.asarray(c) for c in perm_zs]
                for i in range(len(perm_zs)):
                    perm_zs[i] = None
                for key in ("z", "a_perm", "s_perm"):
                    wit_stash[key] = [np.asarray(d[key]) for d in lookups]
                    for d in lookups:
                        d[key] = None
            pk.__dict__["_on_coeff_staged"] = _stash_witness
    # column LISTS, not stacks: the quotient run stacks (one-shot mode) or
    # converts per column (coset mode); pre-stacking duplicated ~2.4 GB of
    # columns that must ALSO stay alive for the evals/multiopen
    h_pieces_stack = qfn(
        list(advice_cols), list(inst_lag), list(perm_zs),
        [d["z"] for d in lookups], [d["a_perm"] for d in lookups],
        [d["s_perm"] for d in lookups], chal)
    num_pieces = csys.quotient_degree
    h_pieces = [h_pieces_stack[i] for i in range(num_pieces)]
    for pt in commit_many(params, h_pieces_stack):
        transcript.write_point(pt)
    if _shrink:
        # the monomial table served its only consumers (the h commits)
        params.__dict__.pop("_fb_monomial", None)
        pk.__dict__.pop("_on_coeff_staged", None)
        mirror = pk.__dict__["_host_mirror"]
        pk.fixed_lagrange = jnp.asarray(mirror["fixed_lagrange"])
        pk.sigma_lagrange = jnp.asarray(mirror["sigma_lagrange"])
        if wit_stash:
            for i, h in enumerate(wit_stash["advice"]):
                advice_cols[i] = jnp.asarray(h)
            for i, h in enumerate(wit_stash["permz"]):
                perm_zs[i] = jnp.asarray(h)
            for key in ("z", "a_perm", "s_perm"):
                for d, h in zip(lookups, wit_stash[key]):
                    d[key] = jnp.asarray(h)
            wit_stash.clear()

    _tick("quotient+commit")
    x = transcript.squeeze_challenge()
    xn = pow(x, n, rc.FR)

    # collapsed h for the multiopen: sum_i x^{n i} h_i
    h_collapsed = None
    xni = 1
    for piece in h_pieces:
        term = frops.mul(piece, _bcast(xni, n))
        h_collapsed = term if h_collapsed is None else frops.add(h_collapsed, term)
        xni = xni * xn % rc.FR

    # -- 7: evaluations — barycentric, straight from the LAGRANGE VALUES
    # already on device (no coefficient conversion; the only poly that
    # lives in coefficient form is collapsed h: ONE forward NTT).
    values = {}
    for i in range(csys.num_advice):
        values[f"advice{i}"] = advice_cols[i]
    for i in range(csys.num_fixed):
        values[f"fixed{i}"] = pk.fixed_lagrange[i]
    for c in range(len(chunks)):
        values[f"perm_z{c}"] = perm_zs[c]
    for gpos in range(pk.sigma_lagrange.shape[0]):
        values[f"sigma{gpos}"] = pk.sigma_lagrange[gpos]
    for li in range(len(lookups)):
        values[f"lookup{li}_z"] = lookups[li]["z"]
        values[f"lookup{li}_a"] = lookups[li]["a_perm"]
        values[f"lookup{li}_s"] = lookups[li]["s_perm"]
    values["random"] = random_vals
    values["h"] = dom.coeff_to_lagrange(h_collapsed)

    x_next = dom.rotate_omega(x, 1)
    x_prev = dom.rotate_omega(x, -1)
    x_last = dom.rotate_omega(x, u_row)   # omega^u x (== rotation -(bf+1))

    # batch every (poly, point) evaluation into ONE device program + fetch
    pairs: list = []
    seen: set = set()

    def need(name, point):
        if (name, point) not in seen:
            seen.add((name, point))
            pairs.append((name, point))

    for (i, r) in csys.advice_queries:
        need(f"advice{i}", dom.rotate_omega(x, r))
    for (i, r) in csys.fixed_queries:
        need(f"fixed{i}", dom.rotate_omega(x, r))
    need("random", x)
    for gpos in range(pk.sigma_lagrange.shape[0]):
        need(f"sigma{gpos}", x)
    for c in range(len(chunks)):
        need(f"perm_z{c}", x)
        need(f"perm_z{c}", x_next)
        if c != len(chunks) - 1:
            need(f"perm_z{c}", x_last)
    for li in range(len(lookups)):
        need(f"lookup{li}_z", x)
        need(f"lookup{li}_z", x_next)
        need(f"lookup{li}_a", x)
        need(f"lookup{li}_a", x_prev)
        need(f"lookup{li}_s", x)
    need("h", x)

    if _os.environ.get("H2T_EVAL_MODE") == "coeff":
        # bisect/fallback path: round-1-style evaluation from coefficient
        # forms (one batched iNTT over the queried columns + Horner)
        names = []
        for nm, _ in pairs:
            if nm not in names:
                names.append(nm)
        coeff_stack = _lag2coeff_batch(
            jnp.stack([values[nm] for nm in names]), dom.k)
        cidx = {nm: i for i, nm in enumerate(names)}
        polys_stack = jnp.stack([coeff_stack[cidx[nm]] for nm, _ in pairs])
        xs_stack = jnp.stack([_fr(pt) for _, pt in pairs])
        res = np.asarray(frops.poly_eval_many(polys_stack, xs_stack))
    else:
        points = []
        for _, pt in pairs:
            if pt not in points:
                points.append(pt)
        xs_stack = jnp.stack([_fr(pt) for pt in points])
        scales = jnp.stack([_fr(dom.bary_scale(pt)) for pt in points])
        weights = frops.bary_weights(dom.omega_pows_device, xs_stack, scales)
        # chunked: big circuits query 100+ columns; an unchunked
        # (q, n, NL) int32 stack at k>=20 is tens of GB
        eval_grp = max(1, int(_os.environ.get("H2T_EVAL_GROUP_BYTES",
                                              2 << 30)) // (n * 4 * NL))
        res_parts = []
        for off in range(0, len(pairs), eval_grp):
            chunk_pairs = pairs[off:off + eval_grp]
            vals_stack = jnp.stack([values[nm] for nm, _ in chunk_pairs])
            widx = jnp.asarray([points.index(pt) for _, pt in chunk_pairs],
                               jnp.int32)
            res_parts.append(np.asarray(
                frops.eval_lagrange_many(vals_stack, weights, widx)))
        res = np.concatenate(res_parts, axis=0)
    evals = {pair: int(limbs.limbs_to_int(res[i]) % rc.FR)
             for i, pair in enumerate(pairs)}

    def ev(name, point: int) -> int:
        return evals[(name, point)]

    # canonical eval write order (documented in verifier.py to match)
    for (i, r) in csys.advice_queries:
        transcript.write_scalar(ev(f"advice{i}", dom.rotate_omega(x, r)))
    for (i, r) in csys.fixed_queries:
        transcript.write_scalar(ev(f"fixed{i}", dom.rotate_omega(x, r)))
    transcript.write_scalar(ev("random", x))
    for gpos in range(pk.sigma_lagrange.shape[0]):
        transcript.write_scalar(ev(f"sigma{gpos}", x))
    for c in range(len(chunks)):
        transcript.write_scalar(ev(f"perm_z{c}", x))
        transcript.write_scalar(ev(f"perm_z{c}", x_next))
    for c in range(len(chunks) - 1):
        transcript.write_scalar(ev(f"perm_z{c}", x_last))
    for li in range(len(lookups)):
        transcript.write_scalar(ev(f"lookup{li}_z", x))
        transcript.write_scalar(ev(f"lookup{li}_z", x_next))
        transcript.write_scalar(ev(f"lookup{li}_a", x))
        transcript.write_scalar(ev(f"lookup{li}_a", x_prev))
        transcript.write_scalar(ev(f"lookup{li}_s", x))

    _tick("evals")
    _sc = _os.environ.get("H2T_SELFCHECK")
    if _sc:
        _selfcheck_quotient_identity(csys, dom, instances, evals, challenges,
                                     theta, beta, gamma, y, x, xn, len(chunks),
                                     chunk_len, u_row, n)
    if _sc == "2":
        # level 2: host-oracle cross-evals (slow; splits barycentric-eval
        # defects from quotient-pipeline defects)
        def host_bary(vals_arr, pt):
            v = np.asarray(vals_arr)
            scale = dom.bary_scale(pt)
            wi, acc = 1, 0
            for i in range(n):
                vi = int(limbs.limbs_to_int(v[i])) % rc.FR
                if vi:
                    acc = (acc + vi * wi % rc.FR
                           * rc.finv((pt - wi) % rc.FR, rc.FR)) % rc.FR
                wi = wi * dom.omega % rc.FR
            return acc * scale % rc.FR

        def host_horner(coeff_arr, pt):
            c = np.asarray(coeff_arr)
            acc = 0
            for i in range(c.shape[0] - 1, -1, -1):
                acc = (acc * pt + int(limbs.limbs_to_int(c[i]))) % rc.FR
            return acc

        for nm in ("advice0", "sigma0", "h"):
            got = evals[(nm, x)]
            want = host_bary(values[nm], x)
            print(f"  [selfcheck2] bary({nm}, x): "
                  f"{'OK' if got == want else f'MISMATCH got {got:#x} want {want:#x}'}",
                  flush=True)
        hh = host_horner(h_collapsed, x)
        print(f"  [selfcheck2] horner(h_collapsed, x) "
              f"{'== ' if hh == evals[('h', x)] else '!= '}bary(h values); "
              f"horner={hh:#x}", flush=True)
    # -- 8: multiopen -----------------------------------------------------------------
    queries = []

    def q(name, point):
        queries.append(ProverQuery(poly=values[name], point=point,
                                   eval=ev(name, point), name=name))

    for (i, r) in csys.advice_queries:
        q(f"advice{i}", dom.rotate_omega(x, r))
    for c in range(len(chunks)):
        q(f"perm_z{c}", x)
        q(f"perm_z{c}", x_next)
        if c != len(chunks) - 1:
            q(f"perm_z{c}", x_last)
    for li in range(len(lookups)):
        q(f"lookup{li}_z", x)
        q(f"lookup{li}_z", x_next)
        q(f"lookup{li}_a", x)
        q(f"lookup{li}_a", x_prev)
        q(f"lookup{li}_s", x)
    for (i, r) in csys.fixed_queries:
        q(f"fixed{i}", dom.rotate_omega(x, r))
    for gpos in range(pk.sigma_lagrange.shape[0]):
        q(f"sigma{gpos}", x)
    q("random", x)
    q("h", x)

    open_shplonk(params, queries, transcript, dom)
    _tick("multiopen")
    return transcript.finalize()


def _selfcheck_quotient_identity(csys, dom, instances, evals, challenges,
                                 theta, beta, gamma, y, x, xn, num_chunks,
                                 chunk_len, u_row, n):
    """Paranoid-mode localizer (H2T_SELFCHECK=1): recompute the verifier's
    expected h(x) from the claimed evals and compare against the prover's
    own h(x).  A mismatch means the WITNESS/QUOTIENT/EVAL pipeline is
    inconsistent; a match (with verification still failing) means a
    COMMITMENT or multiopen defect.  Mirrors verifier.py's identity."""
    from .verifier import _barycentric_eval

    def ev(name, point):
        return evals[(name, point)]

    adv_map = {q: ev(f"advice{q[0]}", dom.rotate_omega(x, q[1]))
               for q in csys.advice_queries}
    fix_map = {q: ev(f"fixed{q[0]}", dom.rotate_omega(x, q[1]))
               for q in csys.fixed_queries}

    def instance_eval(i, rot):
        return _barycentric_eval(instances[i], n, dom.omega,
                                 dom.rotate_omega(x, rot))

    def eval_expr(e):
        return ex.evaluate(
            e,
            constant=lambda v: v % rc.FR,
            fixed=lambda i, r: fix_map[(i, r)],
            advice=lambda i, r: adv_map[(i, r)],
            instance=instance_eval,
            challenge=lambda i: challenges[i],
            add=lambda a, b: (a + b) % rc.FR,
            mul=lambda a, b: a * b % rc.FR,
            scale=lambda a, s: a * s % rc.FR,
        )

    x_next = dom.rotate_omega(x, 1)
    x_prev = dom.rotate_omega(x, -1)
    x_last = dom.rotate_omega(x, u_row)
    l0 = dom.l_i_range(x, xn, [0])[0]
    l_last = dom.l_i_range(x, xn, [u_row])[0]
    l_blind = sum(dom.l_i_range(x, xn, range(u_row + 1, n))) % rc.FR
    active = (1 - l_last - l_blind) % rc.FR

    exprs = []
    for name, g in csys.gates:
        exprs.append(eval_expr(g))
    if num_chunks:
        exprs.append(l0 * (1 - ev("perm_z0", x)) % rc.FR)
        zl = ev(f"perm_z{num_chunks - 1}", x)
        exprs.append(l_last * (zl * zl % rc.FR - zl) % rc.FR)
        for c in range(1, num_chunks):
            exprs.append(l0 * (ev(f"perm_z{c}", x)
                               - ev(f"perm_z{c - 1}", x_last)) % rc.FR)
        from .cs import ADVICE as _A, FIXED as _F
        for ci in range(num_chunks):
            chunk = csys.permutation_columns[
                ci * chunk_len:(ci + 1) * chunk_len]
            left = ev(f"perm_z{ci}", x_next)
            right = ev(f"perm_z{ci}", x)
            for pos, col in enumerate(chunk):
                gpos = ci * chunk_len + pos
                if col.kind == _A:
                    v = adv_map[(col.index, 0)]
                elif col.kind == _F:
                    v = fix_map[(col.index, 0)]
                else:
                    v = instance_eval(col.index, 0)
                sig = ev(f"sigma{gpos}", x)
                left = left * ((v + beta * sig + gamma) % rc.FR) % rc.FR
                right = right * ((v + beta * pow(DELTA, gpos, rc.FR) % rc.FR
                                  * x + gamma) % rc.FR) % rc.FR
            exprs.append(active * ((left - right) % rc.FR) % rc.FR)
    for li, lk in enumerate(csys.lookups):
        a_comp = 0
        for p_in, _ in lk.pairs:
            a_comp = (a_comp * theta + eval_expr(p_in)) % rc.FR
        s_comp = 0
        for _, p_tab in lk.pairs:
            s_comp = (s_comp * theta + eval_expr(p_tab)) % rc.FR
        z, zn = ev(f"lookup{li}_z", x), ev(f"lookup{li}_z", x_next)
        a_, ap = ev(f"lookup{li}_a", x), ev(f"lookup{li}_a", x_prev)
        s_ = ev(f"lookup{li}_s", x)
        exprs.append(l0 * (1 - z) % rc.FR)
        exprs.append(l_last * (z * z % rc.FR - z) % rc.FR)
        lhs = zn * ((a_ + beta) % rc.FR) % rc.FR * ((s_ + gamma) % rc.FR) % rc.FR
        rhs = z * ((a_comp + beta) % rc.FR) % rc.FR \
            * ((s_comp + gamma) % rc.FR) % rc.FR
        exprs.append(active * ((lhs - rhs) % rc.FR) % rc.FR)
        exprs.append(l0 * ((a_ - s_) % rc.FR) % rc.FR)
        exprs.append(active * ((a_ - s_) % rc.FR) * ((a_ - ap) % rc.FR) % rc.FR)

    h_eval = 0
    for e in exprs:
        h_eval = (h_eval * y + e) % rc.FR
    expected_h = h_eval * rc.finv((xn - 1) % rc.FR, rc.FR) % rc.FR
    got_h = ev("h", x)
    if expected_h != got_h:
        print(f"  [selfcheck] QUOTIENT IDENTITY MISMATCH at x: "
              f"expected {expected_h:#x} got {got_h:#x}", flush=True)
    else:
        print("  [selfcheck] quotient identity at x: OK", flush=True)


# ---------------------------------------------------------------------------
# quotient pipeline: batched NTT conversions + ONE fused pointwise program
# ---------------------------------------------------------------------------
#
# Design note (perf): inlining the NTTs into one mega-program made XLA
# compile times explode (each of ~35 column conversions re-inlined a k-stage
# butterfly network).  Instead the conversions are 3 batched NTT dispatches
# (columns vectorized on axis 1 — one compiled NTT per shape serves every
# column), and only the gate/argument *pointwise* forest is fused.

import jax


@partial(jax.jit, static_argnums=1)
def _lag2coeff_jit(cols: jnp.ndarray, k: int) -> jnp.ndarray:
    return ntt.intt(jnp.moveaxis(cols, 0, 1), k).swapaxes(0, 1)


@partial(jax.jit, static_argnums=(1, 2))
def _coeff2ext_jit(cols: jnp.ndarray, ext_k: int, g: int) -> jnp.ndarray:
    C, n, _ = cols.shape
    ext_n = 1 << ext_k
    from ..ops.field import FR as FRS
    x = jnp.moveaxis(cols, 0, 1)                       # (n, C, NL)
    x = jnp.pad(x, ((0, ext_n - n), (0, 0), (0, 0)))
    gpw = frops.powers(Fr.from_ints([g])[0], ext_n)    # (ext_n, NL)
    x = limbs.mul(FRS, x, gpw[:, None, :])
    return jnp.moveaxis(ntt.ntt(x, ext_k), 1, 0)


# Column-group cap for the batched domain conversions.  One program shape
# per (group, k) keeps compiles bounded AND caps live HBM — an unbounded
# column batch at the 4n extended domain asked for 38G at k=17.  8 columns
# x 2^19 ext rows x 132 B = 550 MB live per program: fine on 16G HBM, and
# half the NTT dispatches of the earlier group=4.
_NTT_GROUP = 8


def _group_for(out_rows: int, group=None) -> int:
    """Columns per conversion program, scaled down for big domains so the
    live working set stays bounded (k>=19 aggregation domains would blow
    HBM at the fixed group of 8).  At 2^20+ rows the radix-2 NTT's conv
    temporaries on a multi-column group exceeded HBM alongside a big
    circuit's resident pk columns — single-column programs there."""
    if group is not None:
        return group
    if out_rows >= (1 << 20):
        return 1
    budget = int(_os.environ.get("H2T_NTT_GROUP_BYTES", 600 << 20))
    return max(1, min(_NTT_GROUP, budget // (out_rows * 4 * NL)))


def _chunk_cols(fn, cols, group=_NTT_GROUP):
    m = cols.shape[0]
    if m == 0:
        return cols
    from ..parallel.context import active_mesh
    mesh, axis = active_mesh()
    if mesh is not None and mesh.size > 1 and cols.shape[1] % mesh.size == 0:
        # sharded prover path: rows split over the mesh; XLA SPMD places the
        # cross-device butterfly exchanges inside the jitted NTT programs
        from jax.sharding import NamedSharding, PartitionSpec as P
        cols = jax.device_put(
            cols, NamedSharding(mesh, P(None, axis, None)))
    # balanced groups: ceil-split so no program carries phantom zero
    # columns (10 cols at group=8 used to run as 8+8-with-6-pad — 25%
    # wasted NTT work at the extended domain; now 5+5).  Column counts are
    # per-circuit constants, so the shapes stay stable across proofs.
    n_prog = -(-m // group)
    per = -(-m // n_prog)
    outs = []
    for off in range(0, m, per):
        c = cols[off:off + per]
        pad = per - c.shape[0]
        if pad:
            c = jnp.concatenate(
                [c, jnp.zeros((pad,) + c.shape[1:], c.dtype)], axis=0)
        out = fn(c)
        outs.append(out if pad == 0 else out[:per - pad])
        np.asarray(outs[-1][0, :1, :1])   # host fetch: bound in-flight mem
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def _lag2coeff_batch(cols: jnp.ndarray, k: int) -> jnp.ndarray:
    """(C, n, NL) Lagrange columns -> monomial coeffs, group-chunked iNTTs.

    On TPU the transform dispatches to the MXU four-step (ops/ntt_mxu) —
    eagerly, outside the jitted radix-2 wrapper, so its constant DFT
    matrices stay program ARGUMENTS (see ntt._mxu_wanted)."""
    g = _group_for(1 << k)
    if ntt._mxu_wanted(cols, k):
        from ..ops import ntt_mxu
        return _chunk_cols(
            lambda c: jnp.swapaxes(ntt_mxu.intt(jnp.moveaxis(c, 0, 1), k),
                                   0, 1), cols, group=g)
    return _chunk_cols(lambda c: _lag2coeff_jit(c, k), cols, group=g)


def _coeff2ext_batch(cols: jnp.ndarray, ext_k: int, g: int) -> jnp.ndarray:
    """(C, n, NL) coeffs -> (C, ext_n, NL) coset values, group-chunked."""
    grp = _group_for(1 << ext_k)
    if ntt._mxu_wanted(cols, ext_k):
        from ..ops import ntt_mxu
        ext_n = 1 << ext_k

        def conv(c):
            x = jnp.moveaxis(c, 0, 1)                     # (n, C, NL)
            x = jnp.pad(x, ((0, ext_n - x.shape[0]), (0, 0), (0, 0)))
            return jnp.moveaxis(ntt_mxu.coset_ntt(x, ext_k, g), 1, 0)

        return _chunk_cols(conv, cols, group=grp)
    return _chunk_cols(lambda c: _coeff2ext_jit(c, ext_k, g), cols, group=grp)


@partial(jax.jit, static_argnums=(1, 2, 3))
def _ext2coeff_pieces(values: jnp.ndarray, ext_k: int, g_inv: int,
                      piece_shape: tuple) -> jnp.ndarray:
    """(ext_n, NL) coset values -> (qd, n, NL) quotient pieces."""
    from ..ops.field import FR as FRS
    qd, n = piece_shape
    hc = ntt.intt(values, ext_k)
    gpi = frops.powers(Fr.from_ints([g_inv])[0], 1 << ext_k)
    h_coeffs = limbs.mul(FRS, hc, gpi)
    return jnp.stack([h_coeffs[i * n:(i + 1) * n] for i in range(qd)])


def _oracle_quotient_window(pk, dom, col_ext, permz_ext, lkz_ext, lka_ext,
                            lks_ext, fixed_ext, sigma_ext, l0_ext, llast_ext,
                            lblind_ext, ident_ext, zh_inv, chal, h_values,
                            s: int = 17, W: int = 8):
    """H2T_SELFCHECK=4: recompute h over a small extended-domain row window
    with PYTHON-INT arithmetic straight from the (fetched) extended leaf
    planes — an exact oracle for the fused pointwise evaluator + Z_H
    division, independent of Pallas/XLA numerics."""
    csys = pk.vk.cs
    n, ext_n = dom.n, dom.extended_n
    stride = ext_n // n
    bf = csys.blinding_factors()
    u_row = n - bf - 1
    chunk_len = csys.permutation_chunk_len()
    perm_cols = csys.permutation_columns
    chunks = [perm_cols[i:i + chunk_len]
              for i in range(0, len(perm_cols), chunk_len)]
    na = csys.num_advice
    idx = np.arange(s, s + W)

    chal_np = np.asarray(chal)
    chal_i = [int(limbs.limbs_to_int(chal_np[i])) % rc.FR
              for i in range(chal_np.shape[0])]
    theta_i, beta_i, gamma_i, y_i = chal_i[:4]

    def fetch(arr, r=0):
        rows = (idx + r * stride) % ext_n
        a = np.asarray(jnp.take(arr, jnp.asarray(rows), axis=0))
        return [int(limbs.limbs_to_int(a[i])) % rc.FR for i in range(W)]

    def ew(op, a, b):
        return [op(x, y) % rc.FR for x, y in zip(a, b)]

    fadd = lambda a, b: ew(lambda x, y: x + y, a, b)
    fsub = lambda a, b: ew(lambda x, y: x - y, a, b)
    fmul = lambda a, b: ew(lambda x, y: x * y, a, b)
    bc = lambda v: [v % rc.FR] * W

    def ext_leaf(e):
        return ex.evaluate(
            e,
            constant=lambda v: bc(v),
            fixed=lambda i, r: fetch(fixed_ext[i], r),
            advice=lambda i, r: fetch(col_ext[i], r),
            instance=lambda i, r: fetch(col_ext[na + i], r),
            challenge=lambda i: bc(chal_i[4 + i]),
            add=fadd, mul=fmul,
            scale=lambda a, sc: fmul(a, bc(sc)),
        )

    l0_v, llast_v, lblind_v = (fetch(x) for x in (l0_ext, llast_ext,
                                                  lblind_ext))
    ident_v = fetch(ident_ext)
    one_v = bc(1)
    active_v = fsub(one_v, fadd(llast_v, lblind_v))

    h = None

    def acc(term):
        nonlocal h
        h = term if h is None else fadd(fmul(h, bc(y_i)), term)

    for _, g in csys.gates:
        acc(ext_leaf(g))
    if chunks:
        pz = [fetch(permz_ext[c]) for c in range(len(chunks))]
        pz_next = [fetch(permz_ext[c], 1) for c in range(len(chunks))]
        acc(fmul(l0_v, fsub(one_v, pz[0])))
        acc(fmul(llast_v, fsub(fmul(pz[-1], pz[-1]), pz[-1])))
        for c in range(1, len(chunks)):
            acc(fmul(l0_v, fsub(pz[c], fetch(permz_ext[c - 1], u_row))))
        for ci, chunk in enumerate(chunks):
            left, right = pz_next[ci], pz[ci]
            for pos, col in enumerate(chunk):
                gpos = ci * chunk_len + pos
                if col.kind == ADVICE:
                    v = fetch(col_ext[col.index])
                elif col.kind == INSTANCE:
                    v = fetch(col_ext[na + col.index])
                else:
                    v = fetch(fixed_ext[col.index])
                sig = fetch(sigma_ext[gpos])
                left = fmul(left, fadd(fadd(v, fmul(sig, bc(beta_i))),
                                       bc(gamma_i)))
                right = fmul(right, fadd(fadd(
                    v, fmul(ident_v,
                            bc(beta_i * pow(DELTA, gpos, rc.FR)))),
                    bc(gamma_i)))
            acc(fmul(active_v, fsub(left, right)))
    for li, lk in enumerate(csys.lookups):
        z_v, a_v, s_v = (fetch(x[li]) for x in (lkz_ext, lka_ext, lks_ext))
        zn_v = fetch(lkz_ext[li], 1)
        ap_v = fetch(lka_ext[li], -1)
        a_comp = None
        for p_in, _ in lk.pairs:
            v = ext_leaf(p_in)
            a_comp = v if a_comp is None else fadd(fmul(a_comp, bc(theta_i)),
                                                   v)
        s_comp = None
        for _, p_tab in lk.pairs:
            v = ext_leaf(p_tab)
            s_comp = v if s_comp is None else fadd(fmul(s_comp, bc(theta_i)),
                                                   v)
        acc(fmul(l0_v, fsub(one_v, z_v)))
        acc(fmul(llast_v, fsub(fmul(z_v, z_v), z_v)))
        lhs = fmul(fmul(zn_v, fadd(a_v, bc(beta_i))), fadd(s_v, bc(gamma_i)))
        rhs = fmul(fmul(z_v, fadd(a_comp, bc(beta_i))),
                   fadd(s_comp, bc(gamma_i)))
        acc(fmul(active_v, fsub(lhs, rhs)))
        acc(fmul(l0_v, fsub(a_v, s_v)))
        acc(fmul(fmul(active_v, fsub(a_v, s_v)), fsub(a_v, ap_v)))

    want = fmul(h, fetch(jnp.asarray(zh_inv)))
    got = fetch(h_values)
    bad = [i for i in range(W) if want[i] != got[i]]
    if bad:
        print(f"  [selfcheck4] QUOTIENT WINDOW MISMATCH rows {s}+{bad}: "
              f"want {want[bad[0]]:#x} got {got[bad[0]]:#x}", flush=True)
    else:
        print(f"  [selfcheck4] quotient window rows [{s},{s + W}): OK",
              flush=True)

    if _os.environ.get("H2T_SELFCHECK") == "5":
        # level 5: spot-check the Lagrange->extended CONVERSION of one
        # column: col_ext[0] row s must equal the barycentric eval of the
        # original Lagrange column at g*w_ext^s (host, exact)
        print("  [selfcheck5] (conversion spot-check runs in create_proof)",
              flush=True)


class _QuotientCtx:
    """Leaf context handed to circuit-supplied quotient evaluators
    (CircuitData.quotient_custom): stacked extended-coset columns plus the
    row-rotation stride.  Evaluators run inside the fused jitted pointwise
    program and must be pure JAX."""

    def __init__(self, col_ext, fixed_ext, stride, chal):
        self.col_ext = col_ext      # (num_advice + num_instance, ext_n, NL)
        self.fixed_ext = fixed_ext  # (num_fixed, ext_n, NL)
        self.stride = stride
        self.chal = chal

    def rot(self, arr, r: int):
        """Row rotation on (..., ext_n, NL) arrays."""
        return jnp.roll(arr, -r * self.stride, axis=-2)


def _make_pointwise(csys, pk, rows: int, stride: int):
    """Factory for the fused pointwise quotient evaluator over `rows`
    domain points with rotation stride `stride` (ext domain: stride =
    ext_n/n; coset-separated mode: stride = 1 on one size-n coset)."""
    from ..ops.field import FR as FRS

    bf = csys.blinding_factors()
    dom = pk.domain()
    u_row = dom.n - bf - 1
    chunk_len = csys.permutation_chunk_len()
    perm_cols = csys.permutation_columns
    chunks = [perm_cols[i:i + chunk_len]
              for i in range(0, len(perm_cols), chunk_len)]

    def lc(v: int):
        return jnp.asarray(limbs.int_to_limbs(v % rc.FR, NL))

    def pointwise(col_ext, permz_ext, lkz_ext, lka_ext, lks_ext, chal,
                  fixed_ext, sigma_ext, l0_ext, llast_ext, lblind_ext,
                  ident_ext, zh_inv):
        """col_ext: (na+ni, rows, NL) — advice then instance columns."""
        def bc(v):
            return jnp.broadcast_to(v[None], (rows, NL))

        theta_e, beta_e, gamma_e, y_e = (bc(chal[i]) for i in range(4))
        fadd = lambda a, b: limbs.add(FRS, a, b)
        fsub = lambda a, b: limbs.sub(FRS, a, b)
        fmul = lambda a, b: limbs.mul(FRS, a, b)

        def rot(arr, r):
            return jnp.roll(arr, -r * stride, axis=0)

        na = csys.num_advice

        def ext_leaf(e):
            return ex.evaluate(
                e,
                constant=lambda v: bc(lc(v)),
                fixed=lambda i, r: rot(fixed_ext[i], r),
                advice=lambda i, r: rot(col_ext[i], r),
                instance=lambda i, r: rot(col_ext[na + i], r),
                challenge=lambda i: bc(chal[4 + i]),
                add=fadd, mul=fmul,
                scale=lambda a, s: fmul(a, bc(lc(s))),
            )

        one_ext = bc(lc(1))
        active_ext = fsub(one_ext, fadd(llast_ext, lblind_ext))

        h = None

        def acc(term):
            nonlocal h
            h = term if h is None else fadd(fmul(h, y_e), term)

        custom = pk.__dict__.get("quotient_custom")
        if custom is not None:
            ctx = _QuotientCtx(col_ext=col_ext, fixed_ext=fixed_ext,
                               stride=stride, chal=chal)
            vals = custom(ctx)
            assert len(vals) == len(csys.gates), \
                "custom evaluator must cover every gate, in order"
            for v in vals:
                acc(v)
        else:
            for _, g in csys.gates:
                acc(ext_leaf(g))

        if chunks:
            acc(fmul(l0_ext, fsub(one_ext, permz_ext[0])))
            acc(fmul(llast_ext,
                     fsub(fmul(permz_ext[-1], permz_ext[-1]), permz_ext[-1])))
            for c in range(1, len(chunks)):
                acc(fmul(l0_ext,
                         fsub(permz_ext[c], rot(permz_ext[c - 1], u_row))))
            for ci, chunk in enumerate(chunks):
                left = rot(permz_ext[ci], 1)
                right = permz_ext[ci]
                for pos_in_chunk, col in enumerate(chunk):
                    gpos = ci * chunk_len + pos_in_chunk
                    if col.kind == ADVICE:
                        v = col_ext[col.index]
                    elif col.kind == INSTANCE:
                        v = col_ext[na + col.index]
                    else:
                        v = fixed_ext[col.index]
                    left = fmul(left, fadd(fadd(
                        v, fmul(sigma_ext[gpos], beta_e)), gamma_e))
                    right = fmul(right, fadd(fadd(
                        v, fmul(ident_ext,
                                fmul(beta_e, bc(lc(pow(DELTA, gpos, rc.FR)))))),
                        gamma_e))
                acc(fmul(active_ext, fsub(left, right)))

        for li, lk in enumerate(csys.lookups):
            z_ext, a_ext, s_ext = lkz_ext[li], lka_ext[li], lks_ext[li]
            a_comp = None
            for p_in, _ in lk.pairs:
                v = ext_leaf(p_in)
                a_comp = v if a_comp is None else fadd(fmul(a_comp, theta_e), v)
            s_comp = None
            for _, p_tab in lk.pairs:
                v = ext_leaf(p_tab)
                s_comp = v if s_comp is None else fadd(fmul(s_comp, theta_e), v)
            acc(fmul(l0_ext, fsub(one_ext, z_ext)))
            acc(fmul(llast_ext, fsub(fmul(z_ext, z_ext), z_ext)))
            lhs = fmul(fmul(rot(z_ext, 1), fadd(a_ext, beta_e)),
                       fadd(s_ext, gamma_e))
            rhs = fmul(fmul(z_ext, fadd(a_comp, beta_e)),
                       fadd(s_comp, gamma_e))
            acc(fmul(active_ext, fsub(lhs, rhs)))
            acc(fmul(l0_ext, fsub(a_ext, s_ext)))
            acc(fmul(fmul(active_ext, fsub(a_ext, s_ext)),
                     fsub(a_ext, rot(a_ext, -1))))

        return fmul(h, zh_inv)

    return pointwise


# Above this many bytes of int32 extended-domain residency (live columns x
# ext_n x NL x 4), the quotient switches to the COSET-SEPARATED pipeline:
# every rotation in the constraint forest is a multiple of the coset
# stride, so the extended evaluation factors into `stride` INDEPENDENT
# size-n coset passes — HBM stays bounded by one coset's working set
# regardless of k.  (The aggregation circuit at k>=20 carries 50+ fixed +
# 20+ sigma columns: materializing them on the 4n extended domain as int32
# wants ~85 GB on a 16 GB chip.)
def _ext_budget() -> int:
    # read per call so tests/tools can retune without re-importing
    return int(_os.environ.get("H2T_EXT_BUDGET_BYTES", 2 << 30))


@partial(jax.jit, static_argnums=(1, 2))
def _coeff2coset_jit(cols: jnp.ndarray, k: int, g: int) -> jnp.ndarray:
    """(C, n, NL) coeffs -> values on the size-n coset g*H (same domain
    size — the coset-separated quotient's conversion unit)."""
    from ..ops.field import FR as FRS
    x = jnp.moveaxis(cols.astype(jnp.int32), 0, 1)        # (n, C, NL)
    gpw = frops.powers(Fr.from_ints([g % rc.FR])[0], x.shape[0])
    x = limbs.mul(FRS, x, gpw[:, None, :])
    return jnp.moveaxis(ntt.ntt(x, k), 1, 0)


@jax.jit
def _u8_rep(cols: jnp.ndarray) -> jnp.ndarray:
    """Resident limb rows -> byte-digit representative, u8.

    exact_digits of a resident value (< 2^259) fits NLIMBS bytes (264
    bits), so the slice is lossless; this is a REPRESENTATIVE (same value
    mod r), not the canonical form — all consumers are mod-r arithmetic.
    Much lighter than canonical(): one carry-table scan vs six
    compare-subtract rounds (which OOMed at 2^20-row groups)."""
    from ..ops.field import FR as FRS
    d = limbs.exact_digits(FRS, cols.astype(jnp.int32))
    return d[..., :limbs.NLIMBS].astype(jnp.uint8)


def _to_u8(cols: jnp.ndarray, group: int = 2) -> jnp.ndarray:
    """Columns -> u8 byte-representative storage in bounded chunks."""
    if cols.shape[0] == 0 or cols.dtype == jnp.uint8:
        return cols.astype(jnp.uint8)
    outs = []
    for off in range(0, cols.shape[0], group):
        outs.append(_u8_rep(cols[off:off + group]))
        np.asarray(outs[-1][0, :1, :1])
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def _convert_u8(cols, fn, group: int):
    """Apply a group-wise conversion and canonicalize each group's output
    to u8 BEFORE the next group runs — the int32 outputs of a wide column
    batch must never be live all at once (80 cols at 2^20 = 11 GB)."""
    m = cols.shape[0]
    if m == 0:
        return jnp.zeros(cols.shape, jnp.uint8)
    outs = []
    for off in range(0, m, group):
        c = cols[off:off + group]
        outs.append(_to_u8(fn(c)))
        np.asarray(outs[-1][0, :1, :1])
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def _quotient_fn_coset(pk: ProvingKey):
    """Coset-separated quotient: bounded-HBM pipeline for big circuits.

    Every rotation in the pointwise forest is a multiple of the coset
    stride (rot(arr, r) rolls by r*stride rows), so the extended-domain
    evaluation FACTORS over the `stride` interleaved cosets g_c*H
    (g_c = g*w_ext^c): each coset is one size-n conversion + one size-n
    pointwise pass with stride-1 rotations.  Z_H is CONSTANT per coset
    (Z_H(g_c w^t) = g_c^n - 1), and the quotient pieces come back from the
    per-coset values with one batched size-n iNTT + a stride x stride
    inverse-DFT combine:

        b_c[d]   = iNTT_n(h_c)[d] = sum_j a_{d+jn} g_c^{d+jn}
        b'_c[d]  = b_c[d] g_c^{-d} = sum_j (a_{d+jn} s^j) zeta^{cj}
        a_{d+jn} = s^{-j} / stride * sum_c zeta^{-cj} b'_c[d]

    with s = g^n, zeta = w_ext^n (a primitive stride-th root).  All
    converted columns are staged CANONICAL-U8; nothing ext_n-sized is ever
    materialized.  Same transcript bytes as the one-shot path (exact
    arithmetic; piece polynomials are identical)."""
    csys = pk.vk.cs
    dom = pk.domain()
    n, ext_n = dom.n, dom.extended_n
    bf = csys.blinding_factors()
    u_row = n - bf - 1
    qd = csys.quotient_degree
    stride = ext_n // n
    k = dom.k

    def lc(v: int):
        return jnp.asarray(limbs.int_to_limbs(v % rc.FR, NL))

    # per-pk small precomputations
    basis = np.zeros((3, n, NL), np.int32)
    basis[0, 0, 0] = 1
    basis[1, u_row, 0] = 1
    basis[2, u_row + 1:, 0] = 1
    basis_coeff = _lag2coeff_batch(jnp.asarray(basis), k)

    g_cosets = [dom.G_COSET * pow(dom.extended_omega, c, rc.FR) % rc.FR
                for c in range(stride)]
    s_pow = pow(dom.G_COSET, n, rc.FR)
    zeta = pow(dom.extended_omega, n, rc.FR)
    inv_stride = rc.finv(stride, rc.FR)

    pointwise = _make_pointwise(csys, pk, n, 1)
    pointwise_jit = jax.jit(pointwise)

    def conv_list(cols, g_c):
        """Per-column coset conversion -> LIST of (1, n, NL) u8 arrays.

        No concatenation anywhere: every multi-GB concat doubled its
        operand's footprint at exactly the wrong moment.  The jitted
        pointwise indexes the lists directly (lists are pytree args)."""
        out = []
        for i in range(cols.shape[0]):
            out.append(_u8_rep(_coeff2coset_jit(cols[i:i + 1], k, g_c))[0])
            np.asarray(out[-1][:1, :1])
        return out

    def run(adv_lag, inst_lag, permz_lag, lk_z, lk_a, lk_s, chal):
        import time as _time
        _p2 = bool(_os.environ.get("H2T_PROFILE2"))
        _t = [_time.perf_counter()]

        def _tick2(stage):
            if _p2:
                now = _time.perf_counter()
                print(f"    [quot/coset] {stage}: {now - _t[0]:.3f}s",
                      flush=True)
                _t[0] = now

        # sources arrive as LISTS of single columns — convert one column
        # at a time; everything stays a LIST of single-column arrays
        sources = [adv_lag, inst_lag, permz_lag, lk_z, lk_a, lk_s]
        counts = [len(x) for x in sources]
        coeff_cols = []
        for src in sources:
            for col in src:
                coeff_cols.append(_u8_rep(_lag2coeff_batch(col[None], k))[0])
                np.asarray(coeff_cols[-1][:1, :1])
        # the lagrange inputs are never read again here: drop this frame's
        # references and let the caller stash its own to host (HBM headroom
        # for the coset loop — see create_proof's _stash_witness)
        for src in sources:
            src.clear()
        cb = pk.__dict__.pop("_on_coeff_staged", None)
        if cb is not None:
            cb()
        _tick2(f"lag2coeff+u8 x{sum(counts)}")

        mirror = pk.__dict__.get("_host_mirror", {})
        fixed_src = pk.fixed_coeff if pk.fixed_coeff is not None \
            else mirror["fixed_coeff"]
        sigma_src = pk.sigma_coeff if pk.sigma_coeff is not None \
            else mirror["sigma_coeff"]
        h_cosets = []
        for c, g_c in enumerate(g_cosets):
            fresh = []
            for col in coeff_cols:
                fresh.append(_u8_rep(_coeff2coset_jit(col[None], k, g_c))[0])
                np.asarray(fresh[-1][:1, :1])
            fixed_c = conv_list(fixed_src, g_c)
            sigma_c = conv_list(sigma_src, g_c)
            aux_c = _chunk_cols(
                lambda grp: _coeff2coset_jit(grp, k, g_c), basis_coeff,
                group=3)
            ident_c = frops.mul(
                frops.powers(lc(dom.omega), n),
                jnp.broadcast_to(lc(g_c)[None], (n, NL)))
            zh_c = (pow(g_c, n, rc.FR) - 1) % rc.FR
            zh_inv_c = jnp.broadcast_to(
                lc(rc.finv(zh_c, rc.FR))[None], (n, NL))
            o = 0
            parts = []
            for m in counts:
                parts.append(fresh[o:o + m])
                o += m
            adv_c, inst_c, permz_c, lkz_c, lka_c, lks_c = parts
            col_c = adv_c + inst_c                     # list concat (views)
            h_c = pointwise_jit(col_c, permz_c, lkz_c, lka_c, lks_c, chal,
                                fixed_c, sigma_c, aux_c[0], aux_c[1],
                                aux_c[2], ident_c, zh_inv_c)
            np.asarray(h_c[:1, :1])       # bound in-flight memory
            fresh = fixed_c = sigma_c = parts = None
            # canonical u8 while parked (int32 h values are 4x; the piece
            # recombination below upcasts inside its own programs)
            h_cosets.append(_to_u8(h_c[None])[0])
            h_c = None
            _tick2(f"coset {c}")

        # pieces: batched size-n iNTT + per-coset g_c^{-d} scale + the
        # stride x stride inverse DFT across cosets
        hstack = jnp.stack(h_cosets, axis=1)              # (n, stride, NL)
        b = ntt.intt(hstack, k)                           # (n, stride, NL)
        bp = []
        for c, g_c in enumerate(g_cosets):
            ginv = rc.finv(g_c, rc.FR)
            bp.append(frops.mul(b[:, c], frops.powers(lc(ginv), n)))
        pieces = []
        s_inv_j = 1
        for j in range(qd):
            accp = None
            for c in range(stride):
                w = pow(zeta, (-c * j) % stride, rc.FR) * inv_stride % rc.FR
                term = frops.mul(bp[c], jnp.broadcast_to(lc(w)[None],
                                                         (n, NL)))
                accp = term if accp is None else frops.add(accp, term)
            accp = frops.mul(accp, jnp.broadcast_to(lc(s_inv_j)[None],
                                                    (n, NL)))
            pieces.append(accp)
            s_inv_j = s_inv_j * rc.finv(s_pow, rc.FR) % rc.FR
        out = jnp.stack(pieces)
        _tick2("piece combine")
        return out

    return run


def _gp_fn(pk: ProvingKey):
    """ONE fused device program for the whole grand-product stage (small
    domains): every permutation-chunk Z (with cross-chunk chaining, the
    reference's halo2 permutation argument [dep]) and every lookup Z,
    including blinding-row writes.  Returns `run(perm_vals, sigma,
    omega_pows, beta_row, gamma_row, lk_quads, blinds) -> tuple of Z
    columns` (chunks first, then lookups — commit order)."""
    cached = pk.__dict__.get("_gp_prog")
    if cached is not None:
        return cached

    csys = pk.vk.cs
    dom = pk.domain()
    n = dom.n
    bf = csys.blinding_factors()
    u_row = n - bf - 1
    chunk_len = csys.permutation_chunk_len()
    perm_cols = csys.permutation_columns
    chunks = [perm_cols[i:i + chunk_len]
              for i in range(0, len(perm_cols), chunk_len)]
    num_lk = len(csys.lookups)

    def run(perm_vals, sigma, omega_pows, beta_row, gamma_row,
            lk_quads, blinds):
        beta_l = jnp.broadcast_to(beta_row[None], (n, NL))
        gamma_l = jnp.broadcast_to(gamma_row[None], (n, NL))
        one = jnp.zeros((1, NL), jnp.int32).at[0, 0].set(1)
        ob = frops.mul(omega_pows, beta_l)

        def unit_of(num, den):
            ratio = frops.mul(num, frops.batch_inv(den))
            return frops.prefix_product(
                jnp.concatenate([one, ratio[:-1]], axis=0))

        outs = []
        start = None
        vi = 0
        for ci, chunk in enumerate(chunks):
            num = den = None
            for pos in range(len(chunk)):
                gpos = ci * chunk_len + pos
                v = perm_vals[vi].astype(jnp.int32)
                vi += 1
                dconst = jnp.broadcast_to(jnp.asarray(
                    limbs.int_to_limbs(pow(DELTA, gpos, rc.FR), NL),
                    jnp.int32)[None], (n, NL))
                t_num = frops.add(frops.add(v, frops.mul(ob, dconst)),
                                  gamma_l)
                t_den = frops.add(
                    frops.add(v, frops.mul(sigma[gpos].astype(jnp.int32),
                                           beta_l)), gamma_l)
                num = t_num if num is None else frops.mul(num, t_num)
                den = t_den if den is None else frops.mul(den, t_den)
            z = unit_of(num, den)
            if start is not None:
                z = frops.mul(z, jnp.broadcast_to(start[None], (n, NL)))
            start = z[u_row]
            outs.append(z.at[n - bf:].set(blinds[len(outs)]))
        for li in range(num_lk):
            a, s, ap, sp = (x.astype(jnp.int32)
                            for x in lk_quads[4 * li:4 * li + 4])
            num = frops.mul(frops.add(a, beta_l), frops.add(s, gamma_l))
            den = frops.mul(frops.add(ap, beta_l), frops.add(sp, gamma_l))
            z = unit_of(num, den)
            outs.append(z.at[n - bf:].set(blinds[len(outs)]))
        return tuple(outs)

    run_jit = jax.jit(run)
    pk.__dict__["_gp_prog"] = run_jit
    return run_jit


def _quotient_fn(pk: ProvingKey):
    """Returns `run(advice_lag, inst_lag, permz_lag, lk_z, lk_a, lk_s, chal)
    -> h_pieces` (evals/multiopen consume Lagrange values directly, so the
    intermediate coefficient forms never leave this pipeline).

    Internally: 2 batched NTT programs for the conversions + one fused
    jitted pointwise program for the whole constraint forest — or the
    coset-separated pipeline when the extended residency exceeds
    H2T_EXT_BUDGET_BYTES (see _quotient_fn_coset).
    """
    cached = pk.__dict__.get("_quotient_prog")
    if cached is not None:
        return cached

    from ..ops.field import FR as FRS

    csys = pk.vk.cs
    dom = pk.domain()
    n, ext_n = dom.n, dom.extended_n
    bf = csys.blinding_factors()
    u_row = n - bf - 1
    chunk_len = csys.permutation_chunk_len()
    perm_cols = csys.permutation_columns
    chunks = [perm_cols[i:i + chunk_len]
              for i in range(0, len(perm_cols), chunk_len)]
    num_lk = len(csys.lookups)
    qd = csys.quotient_degree

    live_cols = (csys.num_advice + csys.num_instance + csys.num_fixed
                 + len(perm_cols) + len(chunks) + 3 * num_lk + 4)
    if live_cols * ext_n * NL * 4 > _ext_budget():
        run = _quotient_fn_coset(pk)
        pk.__dict__["_quotient_prog"] = run
        return run

    stride = ext_n // n

    def lc(v: int):
        return jnp.asarray(limbs.int_to_limbs(v % rc.FR, NL))

    # ---- one-time per-pk precomputations (device arrays) ----
    fixed_ext = _coeff2ext_batch(pk.fixed_coeff, dom.extended_k, dom.G_COSET) \
        if pk.fixed_coeff.shape[0] else jnp.zeros((0, ext_n, NL), jnp.int32)
    sigma_ext = _coeff2ext_batch(pk.sigma_coeff, dom.extended_k, dom.G_COSET) \
        if pk.sigma_coeff.shape[0] else jnp.zeros((0, ext_n, NL), jnp.int32)
    basis = np.zeros((3, n, NL), np.int32)
    basis[0, 0, 0] = 1
    basis[1, u_row, 0] = 1
    basis[2, u_row + 1:, 0] = 1
    basis_ext = _coeff2ext_batch(
        _lag2coeff_batch(jnp.asarray(basis), dom.k), dom.extended_k,
        dom.G_COSET)
    l0_ext_c, llast_ext_c, lblind_ext_c = (basis_ext[i] for i in range(3))
    ident_ext_c = frops.mul(
        frops.powers(lc(dom.extended_omega), ext_n),
        jnp.broadcast_to(lc(dom.G_COSET)[None], (ext_n, NL)))
    zh_inv = jnp.asarray(dom.zh_inv_extended)

    pointwise = _make_pointwise(csys, pk, ext_n, stride)
    pointwise_jit = jax.jit(pointwise)

    # Pallas-fused pointwise program (generic expression forests): keeps
    # every intermediate in VMEM — the XLA path above materializes each of
    # ~70 ext-domain field ops in HBM (tens of GB of traffic, OOM at k=17).
    qp = None
    if pk.__dict__.get("quotient_custom") is None:
        from ..ops.curve import _pallas_wanted
        if _pallas_wanted():
            from .quotient_pallas import QuotientPallas
            aux = {"l0": l0_ext_c, "llast": llast_ext_c,
                   "lblind": lblind_ext_c, "ident": ident_ext_c,
                   "zh_inv": zh_inv}
            qp = QuotientPallas(pk, dom, aux, fixed_ext, sigma_ext)

    def run(adv_lag, inst_lag, permz_lag, lk_z, lk_a, lk_s, chal):
        import time as _time
        _p2 = bool(_os.environ.get("H2T_PROFILE2"))
        _t = [_time.perf_counter()]

        def _tick2(stage, sync=None):
            if _p2:
                if sync is not None:
                    np.asarray(sync[0, :1, :1] if sync.ndim == 3
                               else sync[:1, :1])
                now = _time.perf_counter()
                print(f"    [quot] {stage}: {now - _t[0]:.3f}s", flush=True)
                _t[0] = now

        def _stack(arrs):
            if len(arrs):
                return jnp.stack([c.astype(jnp.int32) for c in arrs])
            return jnp.zeros((0, n, NL), jnp.int32)

        # batched conversions (3 NTT dispatches for everything fresh);
        # columns arrive as lists (see create_proof)
        lag_all = jnp.concatenate(
            [_stack(x) for x in (adv_lag, inst_lag, permz_lag,
                                 lk_z, lk_a, lk_s)], axis=0)
        coeff_all = _lag2coeff_batch(lag_all, dom.k)
        _tick2(f"lag2coeff x{int(lag_all.shape[0])}", coeff_all)
        ext_all = _coeff2ext_batch(coeff_all, dom.extended_k, dom.G_COSET)
        _tick2(f"coeff2ext x{int(coeff_all.shape[0])}", ext_all)
        na, ni = len(adv_lag), len(inst_lag)
        nz, nl_ = len(permz_lag), len(lk_z)
        o = 0
        col_ext = ext_all[:na + ni]; o = na + ni
        permz_ext = ext_all[o:o + nz]; o += nz
        lkz_ext = ext_all[o:o + nl_]; o += nl_
        lka_ext = ext_all[o:o + nl_]; o += nl_
        lks_ext = ext_all[o:o + nl_]

        if qp is not None:
            h_values = qp(col_ext, permz_ext, lkz_ext, lka_ext, lks_ext,
                          chal)
        else:
            h_values = pointwise_jit(col_ext, permz_ext, lkz_ext, lka_ext,
                                     lks_ext, chal, fixed_ext, sigma_ext,
                                     l0_ext_c, llast_ext_c, lblind_ext_c,
                                     ident_ext_c, zh_inv)
        _tick2("pointwise", h_values)
        if _os.environ.get("H2T_SELFCHECK") in ("4", "5") \
                and pk.__dict__.get("quotient_custom") is None:
            _oracle_quotient_window(
                pk, dom, col_ext, permz_ext, lkz_ext, lka_ext, lks_ext,
                fixed_ext, sigma_ext, l0_ext_c, llast_ext_c, lblind_ext_c,
                ident_ext_c, zh_inv, chal, h_values)
        if ntt._mxu_wanted(h_values, dom.extended_k):
            from ..ops import ntt_mxu
            h_coeffs = ntt_mxu.coset_intt(h_values, dom.extended_k,
                                          dom.G_COSET)
            out = jnp.stack([h_coeffs[i * n:(i + 1) * n]
                             for i in range(qd)])
            _tick2("h coset_intt", out)
            return out
        out = _ext2coeff_pieces(h_values, dom.extended_k,
                                dom.g_coset_inv, (qd, n))
        _tick2("h coset_intt", out)
        return out

    pk.__dict__["_quotient_prog"] = run
    return run
