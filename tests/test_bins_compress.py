"""Sum-of-exponentials bin compression (radiation/bins_compress.py).

The compressed bins must reproduce the band transmission F and thin
function G of the input bins to the target uniform relative error —
which bounds the error of EVERY rate the engine can produce (the
absorbed fraction is the integral of G; see the module docstring) — and
conserve the band-integrated photon rate (the photon budget).
"""

import numpy as np
import pytest

from pyc2ray_tpu.radiation.blackbody import BlackBodySource
from pyc2ray_tpu.radiation.spectral_bins import make_spectral_bins
from pyc2ray_tpu.radiation.bins_compress import (compress_bins,
                                                 compression_error)

FMIN = 3.288e15


def _bb_bins(panels=4, nodes=8, grey=False):
    src = BlackBodySource(5e4, grey, FMIN, 2.8)
    return make_spectral_bins(src, FMIN, 40 * FMIN,
                              panels=panels, nodes=nodes)


def test_compression_meets_target_and_shrinks():
    bins = _bb_bins()
    c = compress_bins(bins, target_rel=1e-3, cache=False)
    assert c.num_bins < bins.num_bins
    assert compression_error(bins, c) <= 1e-3
    # photon budget: total band rate conserved well below the target
    assert np.isclose(np.sum(c.w_photo), np.sum(bins.w_photo),
                      rtol=1e-4)
    assert np.isclose(np.sum(c.w_heat), np.sum(bins.w_heat), rtol=1e-3)
    # physical bins: positive weights, positive decay rates
    assert np.all(c.w_photo >= 0) and np.all(c.s > 0)


def test_grey_collapses_to_single_exact_node():
    bins = _bb_bins(grey=True)
    c = compress_bins(bins, target_rel=1e-3, cache=False)
    assert c.num_bins == 1
    assert np.isclose(np.sum(c.w_photo), np.sum(bins.w_photo), rtol=1e-12)
    # single-node compression of a grey set is exact at any tau
    assert compression_error(bins, c) < 1e-12


def test_disk_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("PYC2RAY_TPU_COMPILE_CACHE", str(tmp_path))
    bins = _bb_bins()
    c1 = compress_bins(bins, target_rel=1e-3)
    c2 = compress_bins(bins, target_rel=1e-3)   # cache hit
    np.testing.assert_array_equal(c1.s, c2.s)
    np.testing.assert_array_equal(c1.w_photo, c2.w_photo)
    assert list(tmp_path.glob("bins/*.npz"))


def test_engine_rates_match_within_target():
    import jax.numpy as jnp
    from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer

    bins = _bb_bins()
    c = compress_bins(bins, target_rel=1e-3, cache=False)
    N, R, ns = 24, 5.0, 12
    rng = np.random.default_rng(3)
    nd = (1e-4 * (1 + 0.3 * rng.random((N,) * 3))).astype(np.float32)
    xh = (1e-3 * rng.random((N,) * 3)).astype(np.float32)
    pos = rng.integers(0, N, (ns, 3))
    flux = 10 ** rng.uniform(0, 2, ns)
    phis = {}
    for name, b in (("ref", bins), ("cmp", c)):
        eng = ChebRaytracer(N, R, 6.30e-18, b, batch_size=4)
        phis[name] = np.asarray(
            eng.trace(nd, xh, pos, flux, 6.7e22)).ravel()
    ref, cmp_ = phis["ref"], phis["cmp"]
    scale = np.abs(ref).max()
    rel = np.abs(cmp_ - ref) / np.maximum(np.abs(ref), 1e-9 * scale)
    # per-cell rates agree within a few times the compression target
    assert rel.max() < 5e-3