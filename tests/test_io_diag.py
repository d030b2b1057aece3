"""Tests for I/O (cbin, checkpoint), diagnostics and param utilities."""

import os

import numpy as np

from pyc2ray_tpu.io import (save_cbin, read_cbin, save_checkpoint,
                            load_checkpoint, latest_checkpoint)
from pyc2ray_tpu.io.cbin import DensityFile, XfracFile
from pyc2ray_tpu.diagnostics import photon_budget
from pyc2ray_tpu.utils.other_utils import get_redshifts_from_output


def test_cbin_roundtrip(tmp_path):
    data = np.random.RandomState(0).rand(8, 8, 8)
    fn = str(tmp_path / "x.dat")
    save_cbin(fn, data, bits=64, order="F")
    back = read_cbin(fn, bits=64, order="F")
    np.testing.assert_array_equal(back, data)
    save_cbin(fn, data, bits=32, order="F")
    back32 = read_cbin(fn, bits=32, order="F")
    np.testing.assert_allclose(back32, data, rtol=1e-6)


def test_density_file(tmp_path):
    rho = np.random.RandomState(1).rand(6, 6, 6).astype(np.float32)
    fn = str(tmp_path / "8.000n_all.dat")
    with open(fn, "wb") as f:
        np.asarray([6, 6, 6], dtype=np.int32).tofile(f)
        rho.flatten(order="F").tofile(f)
    df = DensityFile(fn)
    assert df.mesh == (6, 6, 6)
    np.testing.assert_allclose(df.cgs_density, rho, rtol=1e-6)


def test_xfrac_file_fortran_records(tmp_path):
    """Fortran unformatted layout with record markers."""
    x = np.random.RandomState(2).rand(4, 4, 4)
    fn = str(tmp_path / "xfrac.bin")
    with open(fn, "wb") as f:
        np.asarray([12], dtype=np.int32).tofile(f)
        np.asarray([4, 4, 4], dtype=np.int32).tofile(f)
        np.asarray([12], dtype=np.int32).tofile(f)
        n = x.size * 8
        np.asarray([n], dtype=np.int32).tofile(f)
        x.flatten(order="F").tofile(f)
        np.asarray([n], dtype=np.int32).tofile(f)
    xf = XfracFile(fn)
    assert xf.mesh == (4, 4, 4)
    np.testing.assert_array_equal(xf.xi, x)


def test_checkpoint_roundtrip(tmp_path):
    d = str(tmp_path)
    xh = np.random.RandomState(3).rand(4, 4, 4)
    p1 = save_checkpoint(d, 9.0, xh, xh * 2, xh * 3, 1e15, 9.0)
    p2 = save_checkpoint(d, 8.5, xh, xh * 2, xh * 3, 2e15, 8.5)
    assert latest_checkpoint(d) == p2
    state = load_checkpoint(p1)
    np.testing.assert_array_equal(state["xh"], xh)
    assert float(state["time"]) == 1e15


def test_redshift_scan(tmp_path):
    for z in (9.0, 8.5, 8.0):
        open(str(tmp_path / f"xfrac_{z:.3f}.pkl"), "w").close()
    zs = get_redshifts_from_output(str(tmp_path))
    np.testing.assert_allclose(zs, [9.0, 8.5, 8.0])


def test_photon_budget():
    N = 8
    ndens = 1e-3 * np.ones((N, N, N))
    xh = np.zeros((N, N, N))
    phi = np.ones((N, N, N)) * 1e-12
    dr = 1e21
    out = photon_budget(phi, ndens, xh, np.array([1.0]), dr)
    expected_abs = 1e-12 * 1e-3 * N ** 3 * 1e63
    np.testing.assert_allclose(out["absorbed_per_s"], expected_abs)
    assert out["emitted_per_s"] == 1e48


def test_params_class(tmp_path):
    from pyc2ray_tpu.utils.paramutils import Params
    import shutil
    src = os.path.join(os.path.dirname(__file__), "..", "examples",
                       "single_source_test", "parameters.yml")
    p = Params(src, Nmesh=64)
    assert p.N == 64
    assert abs(p.temph0 - 13.598 / 8.617e-05) < 1e-6
    assert p.cosmology.Om0 == 0.27


def test_checkpoint_he_and_temp_roundtrip(tmp_path):
    """Full-state checkpoints carry the beyond-reference channels."""
    d = str(tmp_path)
    xh = np.random.RandomState(0).rand(4, 4, 4)
    p = save_checkpoint(d, 9.0, xh, xh * 2, xh * 3, 1e15, 9.0,
                        temp=xh * 1e4, xhe1=xh * 0.1, xhe2=xh * 0.01)
    state = load_checkpoint(p)
    np.testing.assert_array_equal(state["temp"], xh * 1e4)
    np.testing.assert_array_equal(state["xhe1"], xh * 0.1)
    np.testing.assert_array_equal(state["xhe2"], xh * 0.01)
