"""Parse the reference's bundled test fixtures with the artis_tpu
readers and assert the column conventions match grid.cc:1228-1601 /
input.cc:1874-2143.

Fixtures (read-only): /root/reference/tests/*_inputfiles/.
"""

import lzma
import os

import numpy as np
import pytest

from artis_tpu.config import read_input_txt
from artis_tpu.model import read_1d_model, read_abundances

REF = "/root/reference/tests"
DAY = 86400.0


@pytest.fixture(scope="module")
def classic_dir():
    d = os.path.join(REF, "classicmode_inputfiles")
    if not os.path.isdir(d):
        pytest.skip("reference fixtures not available")
    return d


def test_classicmode_input_txt(classic_dir):
    cfg = read_input_txt(os.path.join(classic_dir, "input-newrun.txt"))
    # line-by-line values from classicmode_inputfiles/input-newrun.txt
    assert cfg.seed == 1281360349
    assert cfg.ntimesteps == 50
    assert cfg.itstep == 0 and cfg.ftstep == 36
    assert cfg.tmin_days == pytest.approx(3.0)
    assert cfg.tmax_days == pytest.approx(30.0)
    assert cfg.opacity_case == 4
    # grey-approximation controls (input.cc:2030-2052)
    assert cfg.cell_is_optically_thick == pytest.approx(8.0)
    assert cfg.num_grey_timesteps == 999
    assert cfg.num_lte_timesteps == 5


def test_classicmode_model(classic_dir):
    m = read_1d_model(os.path.join(classic_dir, "model.txt"), tmin=3.0 * DAY)
    assert m.ncells == 78
    assert m.t_model == pytest.approx(0.976 * DAY)
    # outermost shell velocity (last row col 2, km/s -> cm/s)
    assert m.vmax == pytest.approx(2.975e9, rel=1e-3)
    # densities are scaled from t_model to tmin by (t_model/tmin)^3
    # (grid.cc:1302); row 1 has log10(rho) = -8.3927954
    rho0_tmodel = 10.0 ** -8.3927954
    assert m.rho[0] == pytest.approx(
        rho0_tmodel * (0.976 / 3.0) ** 3, rel=1e-5)
    # DDC10 row 1: X_Fegroup ~ 0.9992, X_Ni56 ~ 0.0199
    assert m.ffegrp[0] == pytest.approx(0.99919952, rel=1e-6)
    nt = m.nuclide_table
    assert m.initradioabund[0, nt.index(28, 56)] == pytest.approx(
        1.9892595e-02, rel=1e-6)
    assert m.initradioabund[0, nt.index(27, 56)] == pytest.approx(
        2.4065662e-03, rel=1e-6)
    # interior mass fractions bounded
    assert (m.initradioabund >= 0).all()
    assert (m.initradioabund.sum(axis=1) <= 1.0 + 1e-6).all()


def test_classicmode_abundances(classic_dir):
    ab = read_abundances(os.path.join(classic_dir, "abundances.txt"), 78)
    assert ab.shape == (78, 30)
    assert (ab >= 0).all()
    # mass fractions sum to ~1 in every shell (abundances.txt holds
    # all Z=1..30 elemental fractions, grid.cc:530-580)
    np.testing.assert_allclose(ab.sum(axis=1), 1.0, rtol=2e-2)
    # inner shells are Fe-group dominated in DDC10
    assert ab[0, 25] + ab[0, 26] + ab[0, 27] > 0.5


def test_nebularonezone_model():
    d = os.path.join(REF, "nebularonezone_inputfiles")
    if not os.path.isdir(d):
        pytest.skip("reference fixtures not available")
    cfg = read_input_txt(os.path.join(d, "input-newrun.txt"))
    m = read_1d_model(os.path.join(d, "model.txt"),
                      tmin=cfg.tmin_days * DAY)
    assert m.ncells == 1
    assert m.t_model == pytest.approx(0.000231481 * DAY)
    assert m.vmax == pytest.approx(7.205e8, rel=1e-3)
    nt = m.nuclide_table
    assert m.initradioabund[0, nt.index(28, 56)] == pytest.approx(
        0.88848, rel=1e-4)


def test_kilonova_model(tmp_path):
    d = os.path.join(REF, "kilonova_inputfiles")
    if not os.path.isdir(d):
        pytest.skip("reference fixtures not available")
    raw = lzma.open(os.path.join(d, "model.txt.xz")).read()
    p = tmp_path / "model.txt"
    p.write_bytes(raw)
    cfg = read_input_txt(os.path.join(d, "input-newrun.txt"))
    m = read_1d_model(str(p), tmin=cfg.tmin_days * DAY)
    assert m.ncells == 25
    assert m.t_model == pytest.approx(0.05 * DAY)
    assert m.vmax == pytest.approx(1.43150575e10, rel=1e-3)
    # row 3 (first shell with non-negligible radioactivity):
    # X_Ni56 = 3.8742199818332774e-05 per the header-mapped column
    nt = m.nuclide_table
    assert m.initradioabund[2, nt.index(28, 56)] == pytest.approx(
        3.8742199818332774e-05, rel=1e-6)
    assert (m.initradioabund.sum(axis=1) <= 1.0 + 1e-6).all()
    ab = read_abundances(os.path.join(d, "abundances.txt"), 25)
    assert ab.shape == (25, 30)
