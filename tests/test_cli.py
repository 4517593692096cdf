"""CLI smoke tests (CPU-cheap paths only).

The full per-subcommand pipelines (k=17 RSA, k>=11 SHA-256, aggregation)
run on hardware via the same sdk entry points exercised by the heavier
tests; here we cover the reference's CLI surface itself (11 subcommands,
cli.rs:31-212): parser completeness, PARAMS_DIR plumbing and the
gen-params artifact (cli.rs:44/223-234).
"""
import os

import pytest

from halo2_zkcert_tpu import cli

SUBCOMMANDS = [
    "download-tls-certs", "gen-params", "gen-rsa-keys",
    "gen-unoptimized-sha256-keys", "gen-zkevm-sha256-keys", "prove-rsa",
    "prove-unoptimized-sha256", "prove-zkevm-sha256", "gen-x509-agg-keys",
    "gen-x509-agg-proof", "gen-x509-agg-evm-proof",
]


def test_parser_covers_reference_subcommands():
    parser = cli.build_parser()
    sub = next(a for a in parser._actions
               if a.__class__.__name__ == "_SubParsersAction")
    for name in SUBCOMMANDS:
        assert name in sub.choices, name


def test_gen_params_writes_srs_cache(tmp_path, monkeypatch, capsys):
    monkeypatch.delenv("PARAMS_DIR", raising=False)
    cli.main(["gen-params", "--k", "6", "--params-path", str(tmp_path)])
    out = capsys.readouterr().out
    assert "srs k=6" in out
    path = tmp_path / "kzg_bn254_6.srs"
    assert path.exists()
    # second call reads the cache (same file, no rewrite)
    mtime = path.stat().st_mtime_ns
    cli.main(["gen-params", "--k", "6", "--params-path", str(tmp_path)])
    assert path.stat().st_mtime_ns == mtime


def test_unknown_command_rejected():
    with pytest.raises(SystemExit):
        cli.main(["frobnicate"])


@pytest.mark.slow
def test_prove_zkevm_sha256_end_to_end(tmp_path, monkeypatch, capsys):
    """Full CLI proving path (keygen -> prove -> self-verified snark) over a
    real certificate fixture — reference `prove-zkevm-sha256` (cli.rs:128).
    Uses the repo-level params cache (SRS gen at fresh k is expensive)."""
    import os
    repo_params = os.path.join(os.path.dirname(__file__), "..", "params")
    monkeypatch.setenv("PARAMS_DIR", repo_params)
    build = tmp_path / "build"
    cert = os.path.join(os.path.dirname(__file__), "..", "testdata",
                        "example_cert_3.pem")
    cli.main(["prove-zkevm-sha256", "--cert-path", cert,
              "--build-dir", str(build),
              "--pk-path", str(build / "zkevm_sha256.pk"),
              "--proof-path", str(build / "zkevm_sha256.proof"),
              "--params-path", repo_params, "--k", "0"])
    out = capsys.readouterr().out
    assert "snark written" in out
    assert (build / "zkevm_sha256.proof").exists()
    # the snark artifact round-trips and carries the right instance shape
    from halo2_zkcert_tpu import sdk
    s = sdk.Snark.read(str(build / "zkevm_sha256.proof"))
    assert len(s.instances[0]) == 2          # lo/hi u128 digest halves
