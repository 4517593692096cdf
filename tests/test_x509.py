"""X.509 parsing + PKCS#1 v1.5 host-oracle tests against `cryptography`."""
import hashlib

import pytest

from halo2_zkcert_tpu.cert import (
    extract_public_key, extract_tbs_and_sig, parse_pem,
    pkcs1v15_sha256_em, verify_pkcs1v15_sha256,
)
from tests.chainutil import generate_chain


@pytest.fixture(scope="module")
def chain():
    pems = generate_chain()
    return [parse_pem(p) for p in pems]


def test_parse_moduli_sizes(chain):
    root, inter, leaf = chain
    assert root.modulus.bit_length() == 4096
    assert inter.modulus.bit_length() == 2048
    assert leaf.modulus.bit_length() == 2048
    assert all(c.exponent == 65537 for c in chain)


def test_tbs_matches_cryptography(chain):
    from cryptography import x509 as cx509
    pems = generate_chain()
    for cert, pem in zip(chain, pems):
        ref = cx509.load_pem_x509_certificate(pem)
        assert cert.tbs == ref.tbs_certificate_bytes
        assert cert.signature == int.from_bytes(ref.signature, "big")


def test_chain_signatures_verify(chain):
    root, inter, leaf = chain
    # leaf signed by intermediate; intermediate by root; root self-signed
    for cert, issuer in ((leaf, inter), (inter, root), (root, root)):
        tbs, sig = extract_tbs_and_sig(cert)
        n = extract_public_key(issuer)
        assert verify_pkcs1v15_sha256(tbs, sig, n)


def test_verify_rejects_wrong_issuer(chain):
    root, inter, leaf = chain
    tbs, sig = extract_tbs_and_sig(leaf)
    assert not verify_pkcs1v15_sha256(tbs, sig, extract_public_key(root))


def test_em_structure(chain):
    root, inter, leaf = chain
    em = pow(leaf.signature, 65537, inter.modulus)
    digest = hashlib.sha256(leaf.tbs).digest()
    assert em == pkcs1v15_sha256_em(digest, 256)
    raw = em.to_bytes(256, "big")
    assert raw[:2] == b"\x00\x01" and raw[2] == 0xFF
    assert raw.endswith(digest)
