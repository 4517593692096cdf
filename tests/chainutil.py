"""Test fixture: generate an RSA X.509 chain shaped like the reference's
bundled Let's Encrypt chain (SURVEY.md §0): RSA-4096 self-signed root ->
RSA-2048 intermediate -> RSA-2048 leaf, all PKCS#1-v1.5/SHA-256.

Generated fresh (not copied from /root/reference/certs) so fixtures are
self-contained; cached on disk per test session.
"""
from __future__ import annotations

import datetime
import os

from cryptography import x509
from cryptography.hazmat.primitives import hashes, serialization
from cryptography.hazmat.primitives.asymmetric import rsa
from cryptography.x509.oid import NameOID

CACHE = "/tmp/halo2_zkcert_tpu_test_chain"


def _name(cn: str):
    return x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, cn)])


def _mk_cert(subject_cn, issuer_cn, subject_key, issuer_key, days=3650):
    now = datetime.datetime(2026, 1, 1)
    builder = (
        x509.CertificateBuilder()
        .subject_name(_name(subject_cn))
        .issuer_name(_name(issuer_cn))
        .public_key(subject_key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now)
        .not_valid_after(now + datetime.timedelta(days=days))
    )
    return builder.sign(issuer_key, hashes.SHA256())


def generate_chain(cache_dir: str = CACHE):
    """Returns [root_pem, intermediate_pem, leaf_pem] bytes (cert_1..3)."""
    paths = [os.path.join(cache_dir, f"cert_{i}.pem") for i in (1, 2, 3)]
    if all(os.path.exists(p) for p in paths):
        return [open(p, "rb").read() for p in paths]
    root_key = rsa.generate_private_key(public_exponent=65537, key_size=4096)
    int_key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    leaf_key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    root = _mk_cert("TPU Test Root", "TPU Test Root", root_key, root_key)
    inter = _mk_cert("TPU Test Intermediate", "TPU Test Root", int_key, root_key)
    leaf = _mk_cert("tpu-test-leaf.example", "TPU Test Intermediate",
                    leaf_key, int_key, days=90)
    pems = [c.public_bytes(serialization.Encoding.PEM)
            for c in (root, inter, leaf)]
    os.makedirs(cache_dir, exist_ok=True)
    for p, pem in zip(paths, pems):
        with open(p, "wb") as f:
            f.write(pem)
    return pems
