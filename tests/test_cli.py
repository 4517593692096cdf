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
