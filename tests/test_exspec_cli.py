"""Standalone exspec CLI (tools/exspec.py): the reference's second
binary — rebuild spectra/light curves from the packet dumps of a
finished run and match the in-driver spectra."""

import os
import subprocess
import sys

import numpy as np

from artis_tpu import SimConfig, Simulation, make_toy_1d_model

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_exspec_cli_matches_driver(tmp_path):
    cfg = SimConfig(npkts=800, ntimesteps=4, tmin_days=2.0,
                    tmax_days=12.0, ftstep=4, opacity_case=0,
                    grey_op=0.2, seed=9)
    model = make_toy_1d_model(nshells=8, mni56_msun=0.3, tmin=cfg.tmin)
    out = str(tmp_path)
    sim = Simulation(model, cfg, out_dir=out)
    sim.run(verbose=False, checkpoint=False)

    driver_lc = np.loadtxt(tmp_path / "light_curve.out")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "exspec.py"), out,
         "--tmin-days", "2.0", "--tmax-days", "12.0",
         "--ntimesteps", "4"],
        capture_output=True, text=True, env=env, timeout=300)
    assert res.returncode == 0, res.stderr
    assert "escaped r-packets" in res.stdout

    cli_lc = np.loadtxt(tmp_path / "light_curve.out")
    # the driver's file carries a second gamma-deposition block
    # (light_curve.cc:23-29); the UVOIR block must match the CLI's
    n = len(cli_lc)
    # identical time grid and luminosities (same packets, same binning)
    np.testing.assert_allclose(cli_lc[:, 0], driver_lc[:n, 0],
                               rtol=1e-6)
    np.testing.assert_allclose(cli_lc[:, 1], driver_lc[:n, 1],
                               rtol=1e-5)
    assert (tmp_path / "spec.out").exists()

    # multi-rank ingestion (exspec.cc:142-204 loops over
    # packets00_RRRR.out for every rank): the same packets split over
    # two rank files must reproduce the single-file spectra exactly
    multi = tmp_path / "multi"
    multi.mkdir()
    with open(tmp_path / "packets00_0000.out") as f:
        lines = [ln for ln in f if ln.strip()
                 and not ln.lstrip().startswith("#")]
    (multi / "packets00_0000.out").write_text("".join(lines[0::2]))
    (multi / "packets00_0001.out").write_text("".join(lines[1::2]))
    res2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "exspec.py"),
         str(multi), "--tmin-days", "2.0", "--tmax-days", "12.0",
         "--ntimesteps", "4"],
        capture_output=True, text=True, env=env, timeout=300)
    assert res2.returncode == 0, res2.stderr
    lc2 = np.loadtxt(multi / "light_curve.out")
    np.testing.assert_allclose(lc2[:, 1], cli_lc[:, 1], rtol=1e-6)
