"""Accuracy of spectral-bin configs vs a 16x16 reference; context: the
reference's NumTau=2000 log-linear table interpolation error."""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np
from pyc2ray_tpu.radiation import BlackBodySource
from pyc2ray_tpu.radiation.spectral_bins import make_spectral_bins, bins_thick, bins_thin
from pyc2ray_tpu.constants import ev2fr

fmin, fmax = ev2fr * 13.598, 10 * ev2fr * 54.416
tau = np.logspace(-8, 4, 400)
tau = np.concatenate([[0.0], tau])

ref = make_spectral_bins(BlackBodySource(5e4, False, fmin, 2.8), fmin, fmax,
                         panels=16, nodes=16)
Lr = bins_thick(ref, tau); Tr = bins_thin(ref, tau)

for (p, n) in [(2,4),(3,4),(4,4),(2,8),(3,6),(4,6),(3,8),(4,8),(6,6),(6,8),(8,8)]:
    b = make_spectral_bins(BlackBodySource(5e4, False, fmin, 2.8), fmin, fmax,
                           panels=p, nodes=n)
    L = bins_thick(b, tau); T = bins_thin(b, tau)
    # relative error where the rate is non-negligible (rates below ~1e-10
    # of S_star are zero photons in practice)
    m = Lr > 1e-12
    eL = np.max(np.abs(L[m]/Lr[m]-1)); eT = np.max(np.abs(T[m]/Tr[m]-1))
    # also error on the DIFFERENCE form used in rates: exp(-ti s)*(-expm1(-dt s))
    print(f"panels={p} nodes={n} bins={p*n:3d}  relerr thick={eL:.2e} thin={eT:.2e}")

# context: table interpolation error of the reference's NumTau=2000 table
from pyc2ray_tpu.radiation import make_tau_table
taut, dlog = make_tau_table(-20, 4, 2000)
Lt = bins_thick(ref, taut)
# interpolate at midpoints in log tau, compare with direct eval
mid = np.sqrt(taut[1:-1] * taut[2:])
il = np.interp(np.log10(mid), np.log10(taut[1:]), Lt[1:])
Ld = bins_thick(ref, mid)
m = Ld > 1e-12
print(f"reference-style 2000-pt log-linear table midpoint relerr: "
      f"{np.max(np.abs(il[m]/Ld[m]-1)):.2e}")
