"""X.509 4-snark aggregation end-to-end artifact checks.

Parity target: reference integration test `x509_aggregation.rs:17-112`
(4 inner snarks over the bundled chain -> aggregation -> verify).  The
multi-hour proving pipeline runs via `tools/run_x509_agg.py` (TPU); this
test validates the COMMITTED artifacts it produces — inner snarks verify,
the aggregation proof verifies (outer PLONK + deferred pairing), and the
digest linking holds between the RSA byte instances and the SHA u128
instances.
"""
import json
import os

import pytest

from halo2_zkcert_tpu import sdk
from halo2_zkcert_tpu.circuits.aggregation import (decode_accumulator,
                                                   verify_aggregated)
from halo2_zkcert_tpu.plonk import gen_srs
from halo2_zkcert_tpu.transcript import PoseidonTranscript

pytestmark = pytest.mark.slow

BUILD = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "build")
STEMS = ["rsa_1", "sha256_1", "rsa_2", "sha256_2"]


def _need(path):
    if not os.path.exists(path):
        pytest.skip(f"artifact missing (run tools/run_x509_agg.py): {path}")
    return path


def test_inner_snarks_verify():
    for stem in STEMS:
        snark = sdk.Snark.read(_need(os.path.join(BUILD, f"{stem}.proof")))
        params = gen_srs(snark.vk.k)
        assert sdk.verify_snark(params, snark), stem


def test_digest_linking_instances():
    """rsa digest bytes must pack to the sha [lo, hi] u128 instances
    (x509_agg.link_x509 constrains exactly this in-circuit)."""
    for rsa_stem, sha_stem in (("rsa_1", "sha256_1"), ("rsa_2", "sha256_2")):
        rsa = sdk.Snark.read(_need(os.path.join(BUILD, f"{rsa_stem}.proof")))
        sha = sdk.Snark.read(_need(os.path.join(BUILD, f"{sha_stem}.proof")))
        digest = [int(v) for v in rsa.instances[0][:32]]
        hi = sum(digest[i] << (8 * (15 - i)) for i in range(16))
        lo = sum(digest[i + 16] << (8 * (15 - i)) for i in range(16))
        assert int(sha.instances[0][0]) == lo, rsa_stem
        assert int(sha.instances[0][1]) == hi, rsa_stem


def test_aggregated_proof_verifies():
    snark = sdk.Snark.read(_need(os.path.join(BUILD, "x509_agg.proof")))
    params = gen_srs(snark.vk.k)
    assert verify_aggregated(params, snark.vk, snark.instances, snark.proof,
                             PoseidonTranscript)
    lhs, rhs = decode_accumulator(snark.instances)
    assert lhs != (0, 0) and rhs != (0, 0)
    t = os.path.join(BUILD, "x509_agg_timings.json")
    if os.path.exists(t):
        with open(t) as f:
            timings = json.load(f)
        assert timings.get("ok") is True
