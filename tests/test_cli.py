"""CLI surface tests (reference argv parity, main.cpp:19-30)."""

import pytest

from cubez_tpu.cli import main


def test_cli_serial_solve(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    rc = main(["16", "16", "16", "sor2sma", "2000", "1.5", "--impl", "jnp"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Iterative Method = sor2sma" in out
    assert "Error max" in out
    hist = (tmp_path / "sor2sma.txt").read_text().splitlines()
    assert hist[0] == "Itration      Residual"
    assert len(hist) > 10


def test_cli_dist_with_warmup_and_profile(tmp_path, monkeypatch, capsys):
    # gdv positional args trigger the distributed path (mpirun analog);
    # --warmup must warm the DIST executable too; --profile writes the
    # measured multi-row report
    monkeypatch.chdir(tmp_path)
    rc = main([
        "16", "16", "16", "jacobi", "500", "0.8", "2", "2", "2",
        "--warmup", "--impl", "jnp", "--profile",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "mesh division" in out
    assert (tmp_path / "jacobi.txt").exists()
    prof = (tmp_path / "profiling.txt").read_text()
    assert "halo_exchange" in prof and "COMM" in prof


def test_cli_pbicgstab_precond(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    rc = main(["16", "16", "16", "pbicgstab", "100", "1.1", "sor2sma",
               "--impl", "jnp"])
    assert rc == 0
    assert "Preconditioner = sor2sma" in capsys.readouterr().out


def test_cli_rejects_bad_trailing_args(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = main(["16", "16", "16", "jacobi", "10", "0.8", "2", "2"])
    assert rc == 2
