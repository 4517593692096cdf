"""Real Let's Encrypt chain fixtures (copies of the reference's certs/
example_cert_{1,2,3}.pem — ISRG Root X1, R3 intermediate, axiom.xyz leaf).

Ground-truth vectors from SURVEY.md §4: TBS lengths 855/770/970 and
SHA256(TBS) digests cross-checked via PKCS#1 v1.5 signature recovery.
"""
import hashlib
import os

import pytest

from halo2_zkcert_tpu.cert import (extract_tbs_and_sig, parse_pem,
                                   verify_pkcs1v15_sha256)

HERE = os.path.join(os.path.dirname(__file__), "..", "testdata")

TBS_LEN = {1: 855, 2: 770, 3: 970}
TBS_SHA = {
    1: "3f0411ede9c4477057d57e57883b1f205b20cdc0f3263129b1ee0269a2678f63",
    2: "444ebd67bb83f8807b3921e938ac9178b882bd50aadb11231f044cf5f08df7ce",
    3: "0b01b4160200a87e5a914c5eb7ab566c3944e530c8504d2b5c512b4fd9a83aec",
}
KEY_BITS = {1: 4096, 2: 2048, 3: 2048}


def _load(i: int):
    with open(os.path.join(HERE, f"example_cert_{i}.pem"), "rb") as f:
        return parse_pem(f.read())


def test_tbs_ground_truth():
    for i in (1, 2, 3):
        cert = _load(i)
        tbs, _sig = extract_tbs_and_sig(cert)
        assert len(tbs) == TBS_LEN[i]
        assert hashlib.sha256(tbs).hexdigest() == TBS_SHA[i]
        assert cert.modulus.bit_length() == KEY_BITS[i]


def test_chain_signatures_verify():
    """cert_3 signed by cert_2's key; cert_2 by cert_1's; cert_1 self-signed
    (root is trusted, not verified, in the reference — README.md:5 — but its
    self-signature is still a valid 4096-bit vector)."""
    root, inter, leaf = _load(1), _load(2), _load(3)
    for subject, issuer in ((leaf, inter), (inter, root), (root, root)):
        tbs, sig = extract_tbs_and_sig(subject)
        assert verify_pkcs1v15_sha256(tbs, sig, issuer.modulus), \
            "chain signature failed"


def test_tampered_signature_rejected():
    inter, leaf = _load(2), _load(3)
    tbs, sig = extract_tbs_and_sig(leaf)
    assert not verify_pkcs1v15_sha256(tbs, sig + 1, inter.modulus)
    assert not verify_pkcs1v15_sha256(tbs + b"x", sig, inter.modulus)
