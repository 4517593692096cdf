"""X.509 certificate handling (layer L6 of SURVEY.md §1).

Reference behavior: `helpers.rs:33-95` — TLS chain download, PEM -> X509
parsing, extraction of (TBS bytes, signature) from the verified cert and the
RSA modulus from the issuer cert.  The reference uses `x509-parser` +
`openssl` [dep]; here a minimal self-contained DER walker (stdlib only) does
the three extractions the proving pipeline needs.
"""
from .x509 import (
    Certificate,
    download_tls_certs_from_domain,
    extract_public_key,
    extract_tbs_and_sig,
    parse_pem,
    pkcs1v15_sha256_em,
    verify_pkcs1v15_sha256,
)
