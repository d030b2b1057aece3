"""ctypes loader for the native C++ components (native/c2ray_native.cpp).

Provides:
* ``build_geometry_tables_native`` — fast octahedral table builder
* ``oracle_sweep_native`` — sequential C2Ray-faithful raytrace oracle
* ``chemistry_global_native`` — sequential chemistry oracle

The library is built with ``make -C native`` (plain g++, C ABI, no
pybind11). If the shared object is absent, ``load_native()`` attempts to
build it once; all callers fall back to the pure-Python/numpy paths when
unavailable (mirroring the reference's soft ASORA fallback,
pyc2ray/load_extensions.py:30-47).
"""

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["load_native", "native_available", "build_geometry_tables_native",
           "oracle_sweep_native", "chemistry_global_native"]

_LIB = None
_TRIED = False

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO_PATH = os.path.join(_REPO_ROOT, "native", "libc2ray_native.so")

_i32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")


def load_native():
    """Load (building if needed) the native library; returns None if
    unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(["make", "-C", os.path.dirname(_SO_PATH)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    lib.build_geometry_tables.restype = ctypes.c_int64
    lib.build_geometry_tables.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
        _i32p, _i32p, _f64p, _f64p, _f64p, _f64p, _i32p, _i32p]
    lib.oracle_sweep.restype = None
    lib.oracle_sweep.argtypes = [
        ctypes.c_int32, ctypes.c_int32, _i32p, _f64p, _f64p, _f64p,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_int32,
        _f64p, _f64p, _f64p, _f64p,
        ctypes.c_int32, ctypes.c_double, ctypes.c_double,
        _f64p, _f64p, _f64p]
    lib.chemistry_global.restype = ctypes.c_int64
    lib.chemistry_global.argtypes = [
        ctypes.c_int64, ctypes.c_double, _f64p, _f64p, _f64p, _f64p, _f64p,
        _f64p, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double]
    _LIB = lib
    return _LIB


def native_available():
    return load_native() is not None


def build_geometry_tables_native(N, max_q):
    """Build octahedral traversal tables in C++; returns the same tuple of
    arrays the numpy builder produces (unpadded), or None if unavailable."""
    lib = load_native()
    if lib is None:
        return None
    last_r = N // 2 - 1 + (N % 2)
    last_l = -(N // 2)
    lo, hi = max(last_l, -max_q), min(last_r, max_q)
    capacity = (hi - lo + 1) ** 3
    offsets = np.empty((3, capacity), dtype=np.int32)
    nbr = np.empty((4, capacity), dtype=np.int32)
    sw = np.empty((4, capacity), dtype=np.float64)
    path = np.empty(capacity, dtype=np.float64)
    diag = np.empty(capacity, dtype=np.float64)
    dist2 = np.empty(capacity, dtype=np.float64)
    shell_start = np.empty(max_q + 2, dtype=np.int32)
    shell_size = np.empty(max_q + 1, dtype=np.int32)
    C = lib.build_geometry_tables(N, max_q, capacity, offsets, nbr, sw,
                                  path, diag, dist2, shell_start, shell_size)
    if C < 0:
        raise RuntimeError(f"native geometry builder failed (code {C})")
    C = int(C)
    return (offsets[:, :C], nbr[:, :C], sw[:, :C], path[:C], diag[:C],
            dist2[:C], shell_start, shell_size)


def oracle_sweep_native(ndens, xh_av, src_pos, src_flux, dr, sig,
                        r_max_lls, tables=None, grey=False):
    """C++ sequential oracle raytrace; same contract as
    oracle.c2ray_ref.oracle_raytrace (returns phi_ion, phi_heat,
    coldensh of the last source)."""
    lib = load_native()
    if lib is None:
        return None
    N = ndens.shape[0]
    ndens_c = np.ascontiguousarray(ndens, dtype=np.float64)
    xh_c = np.ascontiguousarray(xh_av, dtype=np.float64)
    pos_c = np.ascontiguousarray(src_pos, dtype=np.int32)
    flux_c = np.ascontiguousarray(src_flux, dtype=np.float64)
    phi = np.zeros_like(ndens_c)
    heat = np.zeros_like(ndens_c)
    cdh = np.zeros_like(ndens_c)
    if grey:
        z = np.zeros(1)
        thin = thick = hthin = hthick = z
        num_tau, minlogtau, dlogtau = 0, 0.0, 1.0
    else:
        thin, thick, hthin, hthick, minlogtau, dlogtau = tables
        thin = np.ascontiguousarray(thin)
        thick = np.ascontiguousarray(thick)
        hthin = np.ascontiguousarray(hthin)
        hthick = np.ascontiguousarray(hthick)
        num_tau = thin.shape[0] - 1
    lib.oracle_sweep(N, pos_c.shape[0], pos_c, flux_c,
                     ndens_c.ravel(), xh_c.ravel(), dr, sig, r_max_lls,
                     1 if grey else 0, thin, thick, hthin, hthick,
                     num_tau, minlogtau, dlogtau,
                     phi.ravel(), heat.ravel(), cdh.ravel())
    return phi, heat, cdh


def chemistry_global_native(dt, ndens, temp, xh, xh_av, phi_ion,
                            bh00, albpow, colh0, temph0, abu_c):
    """C++ sequential chemistry pass; same contract as
    oracle_chemistry_global (returns xh_intermed, xh_av, conv_flag)."""
    lib = load_native()
    if lib is None:
        return None
    shape = np.asarray(xh).shape
    nd = np.ascontiguousarray(ndens, dtype=np.float64).ravel()
    tp = np.ascontiguousarray(temp, dtype=np.float64).ravel()
    x0 = np.ascontiguousarray(xh, dtype=np.float64).ravel()
    xav = np.ascontiguousarray(xh_av, dtype=np.float64).ravel().copy()
    xi = x0.copy()
    phi = np.ascontiguousarray(phi_ion, dtype=np.float64).ravel()
    cf = lib.chemistry_global(x0.size, dt, nd, tp, x0, xav, xi, phi,
                              bh00, albpow, colh0, temph0, abu_c)
    return xi.reshape(shape), xav.reshape(shape), int(cf)
