"""Model-layer tests: YAML-driven simulation classes end to end (small)."""

import os
import shutil

import numpy as np
import pytest

import pyc2ray_tpu as pc2r

PARAMS_SRC = os.path.join(os.path.dirname(__file__), "..", "examples",
                          "single_source_test", "parameters.yml")


def _setup(tmp_path, engine="flat", numtau=300):
    params = open(PARAMS_SRC).read()
    params = params.replace("NumTau: 2000", f"NumTau: {numtau}")
    params = params.replace("results_basename: ./results/",
                            f"results_basename: {tmp_path}/")
    params = params.replace("engine", "engine")  # no-op placeholder
    params += f"\n"
    params = params.replace("dtype: float64",
                            f"dtype: float64\n  engine: {engine}")
    pfile = str(tmp_path / "parameters.yml")
    with open(pfile, "w") as f:
        f.write(params)
    return pfile


@pytest.mark.parametrize("engine", ["flat", "cheb"])
def test_c2ray_test_sim_evolves(tmp_path, engine):
    N = 16
    pfile = _setup(tmp_path, engine)
    sim = pc2r.C2Ray_Test(pfile, N, use_gpu=True)
    sim.ndens = 1e-3 * np.ones((N, N, N))
    srcpos = np.array([[N // 2], [N // 2], [N // 2]], dtype=float)
    srcflux = np.array([10.0])
    zreds = sim.generate_redshift_array(2, 1e6)
    dt = sim.set_timestep(zreds[0], zreds[1], 2)
    xh0_mean = sim.xh.mean()
    sim.evolve3D(dt, srcflux, srcpos)
    assert sim.xh.mean() > xh0_mean
    assert np.all(np.isfinite(sim.phi_ion))
    assert sim.phi_ion.max() > 0
    # outputs & redshift bookkeeping
    sim.write_output(sim.zred)
    files = os.listdir(tmp_path)
    assert any(f.startswith("xfrac") for f in files)


def test_engines_agree_through_model(tmp_path):
    """flat (tables) and cheb (spectral bins) engines agree through the
    full model stack to bin-quadrature accuracy."""
    N = 12
    results = {}
    for engine in ("flat", "cheb"):
        d = tmp_path / engine
        d.mkdir()
        pfile = _setup(d, engine, numtau=2000)
        sim = pc2r.C2Ray_Test(pfile, N, use_gpu=True)
        sim.ndens = 2e-3 * np.ones((N, N, N))
        srcpos = np.array([[N // 2], [N // 2], [N // 2]], dtype=float)
        srcflux = np.array([5.0])
        phi = sim.do_raytracing(srcflux, srcpos)
        results[engine] = np.asarray(phi)
    rel = np.abs(results["cheb"] - results["flat"]) \
        / np.maximum(results["flat"], 1e-300)
    # The dominant residual is the TABLE's piecewise-log-linear
    # interpolation error, which grows like (tau * dlogtau * ln10)^2 for
    # optically thick cells (this test medium has tau ~ 45 per cell);
    # the spectral bins evaluate the exponentials exactly (1.5e-6
    # quadrature error). ~1e-3-level agreement is the expected envelope.
    assert rel.max() < 1e-2
    assert np.median(rel) < 3e-3
