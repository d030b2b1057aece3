"""Accuracy of He spectral-bin configs vs a dense reference.

Quantity tested: the per-species absorbed-photon integrals used by
HeRaytracer._rates_he (raytrace_he.py:132-149) —

    acc_s = dcol_s * sum_e w_e se[s,e] exp(-tau_in_e) (-expm1(-dtau_e)) / dtau_e

over random per-species ingoing columns (threshold tau spanning
1e-6..1e4 per species) and slab thicknesses, plus the heating
integrals. The reference config is panels_per_band=16, nodes=16
(768 bins). Worst-case relative error is taken where the dense rate is
non-negligible: > 1e-12 of the LARGEST reference rate of that species
over the sample (rates below that are zero photons in practice — the
same negligible-rate philosophy as bins_acc.py, expressed per species
because the three channels span different magnitudes).
"""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np
from pyc2ray_tpu.radiation import BlackBodySource
from pyc2ray_tpu.radiation.helium import (make_spectral_bins_he, HE_EDGES_EV,
                                          SIGMA_TH)
from pyc2ray_tpu.constants import ev2fr

fmin = ev2fr * HE_EDGES_EV[0]


def rates(heb, cdin, dcol):
    """cdin, dcol: (n, 3) columns [cm^-2]. Returns (acc (n,3), heat (n,3))."""
    se = heb.s * np.asarray(SIGMA_TH)[:, None]          # (3, E)
    tau_in = cdin @ se                                   # (n, E)
    dtau = dcol @ se
    core = np.exp(-tau_in) * (-np.expm1(-dtau))
    inv = core / np.maximum(dtau, 1e-300)
    wv = inv @ (heb.w_photo[None] * se).T                # (n, 3)
    wh = np.stack([inv @ (heb.w_heat[sp] * se[sp]) for sp in range(3)], 1)
    return dcol * wv, dcol * wh


def sample_columns(rng, n):
    """Random per-species columns with threshold tau in [1e-6, 1e4]."""
    tau = 10 ** rng.uniform(-6, 4, size=(n, 3))
    cd = tau / np.asarray(SIGMA_TH)
    # slab thickness: fraction of the ingoing column, spanning thin->thick
    frac = 10 ** rng.uniform(-6, 0, size=(n, 3))
    return cd, cd * frac


def main():
    rng = np.random.default_rng(0)
    cdin, dcol = sample_columns(rng, 20000)
    # include zero ingoing column rows (source cells) and single-species rows
    cdin[:100] = 0.0
    for sp in range(3):
        cdin[100 + sp * 100:100 + (sp + 1) * 100,
             [s for s in range(3) if s != sp]] = 0.0

    bb = BlackBodySource(5e4, False, fmin, 2.8)
    ref = make_spectral_bins_he(bb, panels_per_band=16, nodes=16)
    Ar, Hr = rates(ref, cdin, dcol)
    # negligible-rate mask: > 1e-12 of the species' largest sampled rate
    mA = Ar > 1e-12 * np.max(Ar, axis=0, keepdims=True)
    mH = Hr > 1e-12 * np.max(Hr, axis=0, keepdims=True)

    for (p, n) in [(2, 4), (3, 4), (2, 8), (3, 6), (4, 6), (3, 8), (4, 8),
                   (6, 8), (8, 8)]:
        b = make_spectral_bins_he(bb, panels_per_band=p, nodes=n)
        A, H = rates(b, cdin, dcol)
        eA = np.max(np.abs(A[mA] / Ar[mA] - 1))
        eH = np.max(np.abs(H[mH] / Hr[mH] - 1))
        print(f"panels={p} nodes={n} bins={3*p*n:3d}  "
              f"relerr photo={eA:.2e} heat={eH:.2e}")


if __name__ == "__main__":
    main()
