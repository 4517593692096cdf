"""Sharded-kernel correctness: sharded == unsharded on a virtual CPU mesh.

Reference analog: halo2_proofs' rayon-parallel `best_multiexp`/`best_fft`
produce identical results regardless of thread count [dep Cargo.lock:1320].
Here the mesh axis plays the thread role (SURVEY.md §2c): these tests pin
an 8-virtual-device CPU mesh (conftest sets
--xla_force_host_platform_device_count=8) and assert the sharded paths are
bit-identical to the single-device kernels, and that the MSM path really
lowers to a collective (all-gather) rather than a gather-to-host.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from halo2_zkcert_tpu.ops import curve, limbs, msm, ntt
from halo2_zkcert_tpu.parallel import make_mesh, msm_sharded, ntt_sharded
from halo2_zkcert_tpu.utils import refcrypto as rc

NL = limbs.NLIMBS

pytestmark = pytest.mark.slow  # CPU-mesh compiles dominate (no AOT cache)

# These tests place data on CPU devices, but the Pallas TPU kernels key off
# jax.default_backend() — on a TPU host they would try to lower TPU kernels
# for CPU-committed inputs and error out.  Run them only when the whole
# process is on CPU (HALO2_TESTS_ON_CPU=1, as the driver's dryrun does).
if jax.default_backend() != "cpu":
    pytestmark = [pytest.mark.slow,
                  pytest.mark.skip(reason="needs CPU backend "
                                   "(HALO2_TESTS_ON_CPU=1); Pallas kernels "
                                   "key off jax.default_backend()")]


@pytest.fixture(scope="module")
def cpu_mesh():
    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("needs >=4 virtual CPU devices")
    return Mesh(np.array(devs[:4]), ("d",))


def _example_points_scalars(n: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    scal = rng.integers(0, 255, size=(n, NL), dtype=np.int32)
    pts = np.zeros((n, 2, NL), dtype=np.int32)
    p = rc.g1_from_affine(rc.G1_GEN)
    for i in range(n):
        x, y = rc.g1_to_affine(p)
        pts[i, 0] = limbs.int_to_limbs(x, NL)
        pts[i, 1] = limbs.int_to_limbs(y, NL)
        p = rc.g1_add(p, rc.g1_from_affine(rc.G1_GEN))
    return pts, scal


def _jac_to_affine_ints(acc):
    aff = np.asarray(curve.to_affine(tuple(c[None] for c in acc)))[0]
    return (int(limbs.limbs_to_int(aff[0]) % rc.FQ),
            int(limbs.limbs_to_int(aff[1]) % rc.FQ))


def test_msm_sharded_matches_single(cpu_mesh):
    n = 64
    pts_np, scal_np = _example_points_scalars(n)
    cpu0 = jax.devices("cpu")[0]
    pts1 = jax.device_put(pts_np, cpu0)
    scal1 = jax.device_put(scal_np, cpu0)
    single = _jac_to_affine_ints(msm.msm_jacobian(pts1, scal1))

    pts = jax.device_put(pts_np, NamedSharding(cpu_mesh, P("d", None, None)))
    scal = jax.device_put(scal_np, NamedSharding(cpu_mesh, P("d", None)))
    sharded = _jac_to_affine_ints(msm_sharded(pts, scal, cpu_mesh))
    assert sharded == single

    # oracle cross-check: the answer is the true multiexp
    want = rc.G1_IDENTITY
    for i in range(n):
        s = int(limbs.limbs_to_int(scal_np[i]) % rc.FR)
        x = int(limbs.limbs_to_int(pts_np[i, 0]))
        y = int(limbs.limbs_to_int(pts_np[i, 1]))
        want = rc.g1_add(want, rc.g1_mul(rc.g1_from_affine((x, y)), s))
    assert rc.g1_to_affine(want) == single


def test_msm_sharded_lowers_to_collective(cpu_mesh):
    """The cross-device combine must be an all-gather, not a host gather."""
    n = 32
    pts_np, scal_np = _example_points_scalars(n, seed=9)
    pts = jax.device_put(pts_np, NamedSharding(cpu_mesh, P("d", None, None)))
    scal = jax.device_put(scal_np, NamedSharding(cpu_mesh, P("d", None)))

    def run(p, s):
        return jnp.stack(msm_sharded(p, s, cpu_mesh))

    txt = jax.jit(run).lower(pts, scal).compile().as_text()
    assert "all-gather" in txt or "all-reduce" in txt, \
        "sharded MSM lost its collective"


def test_sharded_proof_bytes_match(cpu_mesh):
    """THE sharded-prover contract: create_proof under prover_mesh produces
    byte-identical output to the single-device proof (reference analog:
    rayon `best_multiexp` is thread-count-invariant [dep Cargo.lock:1320]).
    Routes the toy k=6 circuit's commits through msm_sharded and the NTT
    conversions through mesh-pinned shardings (parallel/context.py)."""
    from halo2_zkcert_tpu.parallel import prover_mesh
    from halo2_zkcert_tpu.plonk import create_proof, keygen, setup
    from halo2_zkcert_tpu.transcript import PoseidonTranscript
    from tests.test_plonk_e2e import build_toy

    data, advice, instances = build_toy()
    params = setup(6)
    pk = keygen(params, data)
    single = create_proof(params, pk, advice, instances,
                          PoseidonTranscript())
    with prover_mesh(cpu_mesh):
        sharded = create_proof(params, pk, advice, instances,
                               PoseidonTranscript())
    assert sharded == single


def test_ntt_sharded_matches_single(cpu_mesh):
    k = 8
    n = 1 << k
    rng = np.random.default_rng(3)
    a_np = rng.integers(0, 255, size=(n, NL), dtype=np.int32)
    cpu0 = jax.devices("cpu")[0]
    single = np.asarray(ntt.ntt(jax.device_put(a_np, cpu0), k))

    out = np.asarray(ntt_sharded(jax.device_put(a_np, cpu0), k, cpu_mesh))
    assert (out == single).all()

    # inverse round-trips under sharding too
    back = np.asarray(ntt_sharded(jnp.asarray(out), k, cpu_mesh,
                                  inverse=True))
    a_can = np.asarray(ntt.intt(ntt.ntt(jax.device_put(a_np, cpu0), k), k))
    assert (back == a_can).all()
