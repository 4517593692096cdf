"""KZG commitment parameters (SRS) over BN254.

Reference behavior: halo2_proofs `ParamsKZG` + halo2-base `gen_srs` cache
(axiom forks [dep] Cargo.lock:1320/1135; SURVEY.md §5 "checkpoint/resume").

TPU-native SRS generation: powers of tau on device (log-depth scan), then
g[i] = tau^i * G as a windowed fixed-base multiexp — a tiny host-built table
of 32x256 base multiples, gathered per point and combined with 32 batched
complete Jacobian adds.  No per-point scalar-mul loops.

Artifact format (`$PARAMS_DIR/kzg_bn254_{k}.srs`): our own layout —
  magic b"H2TPUSRS" | k:u32 LE | tau-commitments:
  g       n * 64 bytes  (x || y, 32-byte LE each, canonical affine)
  g_lagrange n * 64 bytes
  g2, s_g2:  2 * 128 bytes (Fq2 x.c0 x.c1 y.c0 y.c1, 32-byte LE)
NOTE(interop): differs from halo2's serde layout; conversion tooling can be
added without touching callers (only this module reads/writes the format).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import curve, frops, limbs, msm
from ..ops.field import Fr
from ..utils import refcrypto as rc

MAGIC = b"H2TPUSRS"

# Deterministic default tau (test SRS): reference halo2-base gen_srs builds a
# deterministic test SRS the same way [dep]; production would load a
# ceremony SRS through the same file format.
DEFAULT_TAU_SEED = b"halo2-zkcert-tpu-test-srs"


def _default_tau() -> int:
    d = rc.blake2b(DEFAULT_TAU_SEED, 64)
    return rc.fr_from_u512_le(d[:32], d[32:])


@lru_cache(maxsize=1)
def _window_table_cache(tau_unused: int = 0):
    """Host-built fixed-base table T[w, d] = (d * 2^(8w)) * G1, affine.

    32 windows x 256 digits = 8192 points; ~8.5k group ops in Python.
    """
    table = np.zeros((32, 256, 2, limbs.NLIMBS), dtype=np.int32)
    base = rc.g1_from_affine(rc.G1_GEN)
    for w in range(32):
        acc = rc.G1_IDENTITY
        for d in range(256):
            if d > 0:
                acc = rc.g1_add(acc, base)
            x, y = rc.g1_to_affine(acc)
            table[w, d, 0] = limbs.int_to_limbs(x, limbs.NLIMBS)
            table[w, d, 1] = limbs.int_to_limbs(y, limbs.NLIMBS)
        # base for next window: 2^8 * current base
        for _ in range(8):
            base = rc.g1_double(base)
    return table


from functools import partial as _partial


@jax.jit
def _digits_of(scalars_limbs):
    return msm.scalars_to_digits(scalars_limbs)


@jax.jit
def _fbm_chunk(table: jnp.ndarray, digits: jnp.ndarray) -> jnp.ndarray:
    """One chunk of the windowed fixed-base multiexp: (c, 32) digits ->
    (c, 2, NL) affine points.  Fully fused on device."""
    acc = curve.identity((digits.shape[0],))
    for w in range(32):
        pts = table[w][digits[:, w]]                  # (c, 2, NL) gather
        acc = curve.add(acc, curve.from_affine(pts))
    return curve.to_affine(acc)


def fixed_base_msm(scalars_limbs: jnp.ndarray, chunk: int = 1 << 16) -> np.ndarray:
    """g[i] = scalars[i] * G1 for a batch of scalars, returned affine (N,2,NL).

    Windowed table gather + 32 batched complete adds per chunk (jitted).
    """
    table = jnp.asarray(_window_table_cache())
    n = scalars_limbs.shape[0]
    out = np.zeros((n, 2, limbs.NLIMBS), dtype=np.int32)
    digits_all = _digits_of(scalars_limbs)
    for off in range(0, n, chunk):
        digits = digits_all[off:off + chunk]          # (c, 32)
        out[off:off + chunk] = np.asarray(_fbm_chunk(table, digits))
    return out


@dataclass
class ParamsKZG:
    k: int
    g: np.ndarray            # (n, 2, NL) monomial-basis SRS, affine limbs
    g_lagrange: np.ndarray   # (n, 2, NL) Lagrange-basis SRS
    g2: tuple                # ((x.c0, x.c1), (y.c0, y.c1)) ints
    s_g2: tuple

    @property
    def n(self) -> int:
        return 1 << self.k

    # ---- commitments ---------------------------------------------------------

    def commit(self, coeffs: jnp.ndarray):
        """MSM over the monomial SRS; returns affine (x, y) Python ints.

        Routed through the batched kernel (m=1) so the prover compiles a
        single MSM program family."""
        return commit_many(self, coeffs[None])[0]

    def commit_lagrange(self, values: jnp.ndarray):
        return commit_many_lagrange(self, values[None])[0]

    def fixed_base(self, lagrange: bool):
        """Lazily built flat-Pippenger tables for one SRS basis
        (ops/msm_fb.py); cached on the params object AND on disk next to
        the SRS file (PARAMS_DIR artifact pattern, SURVEY.md §5)."""
        from ..ops.msm_fb import FixedBaseMsm
        attr = "_fb_lagrange" if lagrange else "_fb_monomial"
        fb = self.__dict__.get(attr)
        if fb is None:
            base = self.g_lagrange if lagrange else self.g
            d = os.environ.get("PARAMS_DIR", "./params")
            tag = "lag" if lagrange else "mono"
            cache = os.path.join(d, f"kzg_bn254_{self.k}.fbtab16_{tag}.npy") \
                if os.path.isdir(d) else None
            fb = FixedBaseMsm(jnp.asarray(base), cache_path=cache)
            self.__dict__[attr] = fb
        return fb

    # ---- serialization -------------------------------------------------------

    def write(self, path: str) -> None:
        with open(path, "wb") as f:
            f.write(MAGIC)
            f.write(int(self.k).to_bytes(4, "little"))
            for arr in (self.g, self.g_lagrange):
                f.write(_points_to_bytes(arr))
            for pt in (self.g2, self.s_g2):
                (x0, x1), (y0, y1) = pt
                for v in (x0, x1, y0, y1):
                    f.write(rc.fe_to_bytes_le(v))

    @staticmethod
    def read(path: str) -> "ParamsKZG":
        with open(path, "rb") as f:
            assert f.read(8) == MAGIC, "bad srs magic"
            k = int.from_bytes(f.read(4), "little")
            n = 1 << k
            g = _points_from_bytes(f.read(64 * n), n)
            gl = _points_from_bytes(f.read(64 * n), n)
            pts = []
            for _ in range(2):
                vs = [rc.fe_from_bytes_le(f.read(32)) for _ in range(4)]
                pts.append(((vs[0], vs[1]), (vs[2], vs[3])))
            return ParamsKZG(k, g, gl, pts[0], pts[1])

    def downsize(self, k: int) -> "ParamsKZG":
        """Params for a smaller domain from the same tau (truncate monomial
        basis; recompute Lagrange basis via iNTT relation on device)."""
        assert k <= self.k
        if k == self.k:
            return self
        # L_i(tau) G over the smaller domain cannot be sliced from the larger
        # Lagrange basis; recompute from monomial SRS: lagrange = iNTT-matrix
        # applied to g — equivalently commit_lagrange(e_i).  Cheapest correct
        # route without tau: g_lagrange[i] = MSM(g[:n], L_i coeffs) — O(n^2).
        # Instead regenerate from stored tau is unavailable; so persist per-k
        # files like the reference does (gen_srs caches per k). Raise to make
        # the contract explicit.
        raise NotImplementedError("per-k SRS files are generated independently; "
                                  "use gen_srs(k) (mirrors reference PARAMS_DIR cache)")


def _affine_to_ints(aff: np.ndarray):
    x = limbs.limbs_to_int(aff[0]) % rc.FQ
    y = limbs.limbs_to_int(aff[1]) % rc.FQ
    return (x, y)


def _points_to_bytes(arr: np.ndarray) -> bytes:
    n = arr.shape[0]
    out = bytearray()
    for i in range(n):
        x = limbs.limbs_to_int(arr[i, 0])
        y = limbs.limbs_to_int(arr[i, 1])
        out += rc.fe_to_bytes_le(x) + rc.fe_to_bytes_le(y)
    return bytes(out)


def _points_from_bytes(raw: bytes, n: int) -> np.ndarray:
    arr = np.zeros((n, 2, limbs.NLIMBS), dtype=np.int32)
    for i in range(n):
        x = rc.fe_from_bytes_le(raw[64 * i:64 * i + 32])
        y = rc.fe_from_bytes_le(raw[64 * i + 32:64 * i + 64])
        arr[i, 0] = limbs.int_to_limbs(x, limbs.NLIMBS)
        arr[i, 1] = limbs.int_to_limbs(y, limbs.NLIMBS)
    return arr


def _setup_host(k: int, tau: int) -> ParamsKZG:
    """Host-side SRS for small k (tests): avoids compiling the device
    fixed-base-multiexp graph for tiny domains."""
    n = 1 << k
    from .domain import Domain
    dom = Domain(k, 1)
    g_pts, tau_i = [], 1
    for _ in range(n):
        g_pts.append(rc.g1_to_affine(rc.g1_mul(rc.g1_from_affine(rc.G1_GEN),
                                               tau_i)))
        tau_i = tau_i * tau % rc.FR
    zh = (pow(tau, n, rc.FR) - 1) % rc.FR
    n_inv = rc.finv(n, rc.FR)
    gl_pts = []
    wi = 1
    for i in range(n):
        li = zh * wi % rc.FR * n_inv % rc.FR \
            * rc.finv((tau - wi) % rc.FR, rc.FR) % rc.FR
        gl_pts.append(rc.g1_to_affine(rc.g1_mul(rc.g1_from_affine(rc.G1_GEN),
                                                li)))
        wi = wi * dom.omega % rc.FR
    g = np.zeros((n, 2, limbs.NLIMBS), np.int32)
    gl = np.zeros((n, 2, limbs.NLIMBS), np.int32)
    for i in range(n):
        g[i, 0] = limbs.int_to_limbs(g_pts[i][0], limbs.NLIMBS)
        g[i, 1] = limbs.int_to_limbs(g_pts[i][1], limbs.NLIMBS)
        gl[i, 0] = limbs.int_to_limbs(gl_pts[i][0], limbs.NLIMBS)
        gl[i, 1] = limbs.int_to_limbs(gl_pts[i][1], limbs.NLIMBS)
    g2 = (rc.G2_GEN_X, rc.G2_GEN_Y)
    return ParamsKZG(k, g, gl, g2, rc.g2_mul_affine(g2, tau))


def _setup_native(k: int, tau: int) -> ParamsKZG:
    """SRS via the native runtime (native/hostmath.cpp): windowed fixed-base
    G1 batches + Montgomery scalar batches.  ~12k points/s on this host vs
    ~30 min for the k=17 device path (the device is better spent proving)."""
    from .. import native
    from .domain import Domain
    n = 1 << k
    g_pts = native.g1_srs(rc.G1_GEN, tau, n)
    dom = Domain(k, 1)
    zh = (pow(tau, n, rc.FR) - 1) % rc.FR
    n_inv = rc.finv(n, rc.FR)
    omega_pows = native.f_powers(native.FR_ID, dom.omega, n)
    denom_inv = native.f_inv_batch(
        native.FR_ID, [(tau - w) % rc.FR for w in omega_pows])
    scale = zh * n_inv % rc.FR
    li = native.f_mul_batch(native.FR_ID,
                            [w * scale % rc.FR for w in omega_pows],
                            denom_inv)
    gl_pts = native.g1_fixed_base_many(rc.G1_GEN, li)

    def pack(pts):
        blob = b"".join(int(x).to_bytes(limbs.NLIMBS, "little") +
                        int(y).to_bytes(limbs.NLIMBS, "little")
                        for x, y in pts)
        return np.frombuffer(blob, dtype=np.uint8).astype(np.int32).reshape(
            n, 2, limbs.NLIMBS)

    g2 = (rc.G2_GEN_X, rc.G2_GEN_Y)
    return ParamsKZG(k, pack(g_pts), pack(gl_pts), g2,
                     rc.g2_mul_affine(g2, tau))


def setup(k: int, tau: int | None = None) -> ParamsKZG:
    """Generate the SRS for degree 2^k (native host runtime when present,
    else device fixed-base multiexp; tiny k stays on the Python oracle)."""
    if tau is None:
        tau = _default_tau()
    from .. import native
    if k > 6 and native.AVAILABLE:
        return _setup_native(k, tau)
    if k <= 10:
        return _setup_host(k, tau)
    n = 1 << k
    # powers of tau on device
    tau_l = Fr.from_ints([tau])[0]
    pw = frops.powers(tau_l, n)                       # (n, NL)
    g = fixed_base_msm(pw)
    # Lagrange basis: L_i(tau) = omega^i (tau^n - 1) / (n (tau - omega^i))
    from .domain import Domain
    dom = Domain(k, 1)
    omega = dom.omega
    zh = (pow(tau, n, rc.FR) - 1) % rc.FR
    n_inv = rc.finv(n, rc.FR)
    omega_pows = frops.powers(Fr.from_ints([omega])[0], n)      # omega^i
    tau_bc = jnp.broadcast_to(Fr.from_ints([tau])[0][None], (n, limbs.NLIMBS))
    denom = frops.sub(tau_bc, omega_pows)                        # tau - omega^i
    denom_inv = frops.batch_inv(denom)
    scale = Fr.from_ints([zh * n_inv % rc.FR])[0]
    li = frops.mul(frops.mul(omega_pows, denom_inv),
                   jnp.broadcast_to(scale[None], (n, limbs.NLIMBS)))
    g_lagrange = fixed_base_msm(li)
    g2 = (rc.G2_GEN_X, rc.G2_GEN_Y)
    s_g2 = rc.g2_mul_affine(g2, tau)
    return ParamsKZG(k, g, g_lagrange, g2, s_g2)


def gen_srs(k: int, params_dir: str | None = None) -> ParamsKZG:
    """Read-or-create cached SRS, mirroring reference `gen_srs` (cli.rs:234
    [dep halo2-base utils::fs]; cache at $PARAMS_DIR/kzg_bn254_{k}.srs)."""
    d = params_dir or os.environ.get("PARAMS_DIR", "./params")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"kzg_bn254_{k}.srs")
    if os.path.exists(path):
        return ParamsKZG.read(path)
    params = setup(k)
    params.write(path)
    return params


def _affine_batch_to_ints(aff: np.ndarray) -> list:
    out = []
    for i in range(aff.shape[0]):
        out.append((limbs.limbs_to_int(aff[i, 0]) % rc.FQ,
                    limbs.limbs_to_int(aff[i, 1]) % rc.FQ))
    return out


@jax.jit
def _to_affine_batch(stacked):
    """(m, 3, NL) Jacobian accumulators -> (m, 2, NL) affine."""
    return curve.to_affine((stacked[:, 0], stacked[:, 1], stacked[:, 2]))


# Fixed-base (flat Pippenger) commit path: table precompute pays off on
# real hardware at prover sizes; tiny test domains keep the variable-base
# kernels (H2T_FB_MSM=1/0 forces either way).
_FB_MIN_N = 4096
_fb_env = os.environ.get("H2T_FB_MSM", "auto")


def _fb_wanted(n: int) -> bool:
    if _fb_env == "0":
        return False
    if _fb_env == "1":
        return True
    return jax.default_backend() == "tpu" and n >= _FB_MIN_N


def _fb_commit(fb, cols, value_bits=None, blind_lo=None) -> list:
    if not isinstance(cols, jnp.ndarray):
        if not len(cols):
            return []
        cols = jnp.stack(list(cols))
    if cols.shape[0] == 0:
        return []
    if os.environ.get("H2T_FB_BOUNDED") == "0":   # debug kill switch
        value_bits = None
    if value_bits is not None and blind_lo is not None:
        accs = fb.msm_many_bounded(cols, value_bits, blind_lo)
    else:
        accs = fb.msm_many(cols)                    # (m, 3, NL) projective
    aff = np.asarray(_to_affine_batch(accs))
    return _affine_batch_to_ints(aff)


def _commit_batch(base: jnp.ndarray, cols, group: int = 1) -> list:
    """Async msm_jacobian dispatches (bounded pipeline) + ONE batched
    affine fetch.

    Dispatches pipeline so the tunnel round-trip is paid once, but only
    `group` MSM programs may be in flight at a time: each program's
    bucket/window temporaries are hundreds of MB at n=2^17, and an
    unbounded pipeline of ~20 column commits crashed the TPU worker
    (device OOM).  A tiny per-group fetch (~25 ms) bounds live memory.
    The lax.map-wrapped batch variant is no alternative — it OOMed the
    COMPILE helper at n=2^17.
    """
    if not isinstance(cols, jnp.ndarray):
        if not len(cols):
            return []
        cols = jnp.stack(list(cols))
    m = cols.shape[0]
    if m == 0:
        return []
    from ..parallel.context import active_mesh
    mesh, axis = active_mesh()
    if mesh is not None and base.shape[0] % mesh.size == 0 and mesh.size > 1:
        # sharded prover path: points/scalars split over the mesh axis,
        # per-device Pippenger partials all-gathered (parallel.msm_sharded).
        # Same `group`-bounded host fetch as the single-device loop below:
        # each MSM program's bucket/window temporaries are hundreds of MB
        # per device at prover sizes, so the in-flight pipeline must stay
        # bounded here too (an unbounded pipeline OOMed at n=2^17).
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.msm_sharded import msm_sharded
        base_sh = jax.device_put(base, NamedSharding(mesh, P(axis, None, None)))
        accs = []
        for i in range(m):
            col = jax.device_put(cols[i], NamedSharding(mesh, P(axis, None)))
            accs.append(jnp.stack(msm_sharded(base_sh, col, mesh, axis)))
            if (i + 1) % group == 0 and i + 1 < m:
                np.asarray(accs[-1][0, :1])   # host fetch = real barrier
        # the all-gathered accumulators are REPLICATED on the global mesh:
        # host-fetch them (legal for fully-replicated arrays even when the
        # mesh spans processes — a device_put onto one local device is not)
        # and run the tiny affine normalization on the default device
        aff = np.asarray(_to_affine_batch(jnp.asarray(
            np.stack([np.asarray(a) for a in accs]))))
        return _affine_batch_to_ints(aff)
    accs = []
    for i in range(m):
        accs.append(jnp.stack(msm.msm_jacobian(base, cols[i])))
        if (i + 1) % group == 0 and i + 1 < m:
            np.asarray(accs[-1][0, :1])   # host fetch = real barrier
    aff = np.asarray(_to_affine_batch(jnp.stack(accs)))
    return _affine_batch_to_ints(aff)


def _mesh_active() -> bool:
    """True when a prover mesh with >1 device is active: the commit layer
    then prefers the sharded variable-base path over the single-device
    fixed-base tables, so `prover_mesh` is honored on every backend (the
    fb tables are per-device; sharding them is a later-round project)."""
    from ..parallel.context import active_mesh
    mesh, _ = active_mesh()
    return mesh is not None and mesh.size > 1


def _commit_timer(tag, m, fn):
    if not os.environ.get("H2T_PROFILE2"):
        return fn()
    import time as _time
    t0 = _time.perf_counter()
    out = fn()
    print(f"    [commit] {tag} x{m}: {_time.perf_counter() - t0:.3f}s",
          flush=True)
    return out


def commit_many_lagrange(params: ParamsKZG, cols, value_bits=None,
                         blind_lo=None) -> list:
    """Batch-commit Lagrange columns (reference: per-column commit loop
    [dep]; here per-point fetches are collapsed into one).

    value_bits/blind_lo: optional bound hint — rows < blind_lo are
    < 2^value_bits, so the fixed-base path only does
    ceil(value_bits/wbits) windows of bucket work per row."""
    m = cols.shape[0] if isinstance(cols, jnp.ndarray) else len(cols)
    if _fb_wanted(params.n) and not _mesh_active():
        return _commit_timer(
            f"lag fb vb={value_bits}", m,
            lambda: _fb_commit(params.fixed_base(lagrange=True), cols,
                               value_bits, blind_lo))
    return _commit_timer(
        "lag vb", m,
        lambda: _commit_batch(jnp.asarray(params.g_lagrange), cols))


def commit_many(params: ParamsKZG, polys) -> list:
    """Batch-commit monomial-basis polys (same length)."""
    if not isinstance(polys, jnp.ndarray):
        if not len(polys):
            return []
        polys = jnp.stack(list(polys))
    if polys.shape[0] == 0:
        return []
    deg = polys.shape[1]
    m = polys.shape[0]
    if deg == params.n and _fb_wanted(params.n) and not _mesh_active():
        return _commit_timer(
            "mono fb", m,
            lambda: _fb_commit(params.fixed_base(lagrange=False), polys))
    return _commit_timer(
        "mono vb", m,
        lambda: _commit_batch(jnp.asarray(params.g[:deg]), polys))
