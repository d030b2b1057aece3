"""Plot helpers (equivalent of reference visualization/common.py:3-47)."""

import numpy as np

__all__ = ["xfrac_plot", "resid_plot"]


def xfrac_plot(xfrac_slice, ax, cmap="jet", interp="none", vmin=None,
               vmax=None):
    """Plot an ionized-fraction slice in log scale."""
    im = ax.imshow(np.log10(np.maximum(xfrac_slice, 1e-20)), origin="lower",
                   cmap=cmap, interpolation=interp, vmin=vmin, vmax=vmax)
    ax.set_title("Ionized fraction (log)")
    return im


def resid_plot(a_slice, b_slice, ax, cmap="bwr", interp="none"):
    """Plot the relative residual between two slices."""
    resid = (a_slice - b_slice) / np.maximum(np.abs(b_slice), 1e-30)
    vmax = np.abs(resid).max()
    im = ax.imshow(resid, origin="lower", cmap=cmap, interpolation=interp,
                   vmin=-vmax, vmax=vmax)
    ax.set_title("Relative residual")
    return im
