"""Diagnostics & observability.

The reference's observability is wall-clock prints and subbox/photon-loss
tallies (SURVEY.md section 5; evolve.py:174-211, raytracing.f90:540-551).
Here:

* ``photon_budget`` — global photon-conservation check: total ionizations/s
  implied by the rate grid vs the total source emission rate. The analog of
  the reference's photon-loss statistic, but exact and grid-global (races
  cannot occur under XLA, so conservation is the meaningful invariant to
  monitor — SURVEY.md section 5 "race detection").
* ``stage_timer`` — context manager timing a device computation with
  ``block_until_ready``, optionally appending to a log.
* ``trace_annotated`` — wraps a callable in a jax.profiler TraceAnnotation
  so stages show up in TPU profiles.
"""

import contextlib
import time

import numpy as np
import jax

from .constants import S_STAR_REF
from .utils.logutils import printlog

__all__ = ["photon_budget", "stage_timer", "trace_annotated",
           "profile_trace", "device_op_times"]


def photon_budget(phi_ion, ndens, xh_av, src_flux, dr):
    """Photon-conservation summary.

    Returns a dict with emitted and absorbed photon rates and the loss
    fraction. ``absorbed = sum(Gamma * nHI) * dr^3`` (the inverse of the
    photon-conserving division, raytracing.f90:531).

    Sign convention: ``loss = 1 - absorbed/emitted``. Truncated rays
    (LLS cutoff, adaptive radii) make it positive; a small NEGATIVE
    value with the spectral-bin engines is the bin quadrature's rate
    bias (absorbed integral slightly over-estimated, bounded by the
    bins' accuracy target — ~1e-3 at the production 14-node
    compression), not a conservation violation: the table-exact flat
    engine logs machine-zero loss on the same fields.
    """
    phi = np.asarray(phi_ion, dtype=np.float64)
    nHI = (np.asarray(ndens, dtype=np.float64)
           * (1.0 - np.asarray(xh_av, dtype=np.float64)))
    absorbed = float((phi * nHI).sum() * float(dr) ** 3)
    emitted = float(np.asarray(src_flux, dtype=np.float64).sum() * S_STAR_REF)
    loss = 1.0 - absorbed / emitted if emitted > 0 else 0.0
    return {"emitted_per_s": emitted, "absorbed_per_s": absorbed,
            "loss_fraction": loss}


@contextlib.contextmanager
def stage_timer(name, logfile=None, quiet=False):
    """Time a device stage with an honest completion barrier.

    Put the stage's result array(s) into the yielded dict under "sync":

        with stage_timer("Raytracing", log) as st:
            phi = trace(...)
            st["sync"] = phi

    At exit one scalar is fetched from every array in st["sync"] — on
    this TPU stack ``block_until_ready`` can return at dispatch time
    (docs/TPU_PERFORMANCE_NOTES.md), so a data-dependent fetch is the
    only reliable barrier. Without a "sync" entry the timing is
    dispatch-only and the log says so.
    """
    from .evolve_loop import force
    t0 = time.time()
    result = {}
    try:
        yield result
    finally:
        synced = "sync" in result
        if synced:
            force(result["sync"])
        result["seconds"] = time.time() - t0
        tag = "" if synced else " (dispatch only — no sync array given)"
        printlog(f"{name} took {result['seconds']:.3f} s.{tag}",
                 logfile, quiet)


def trace_annotated(name, fn):
    """Wrap fn so calls appear as named ranges in jax profiler traces."""
    def wrapped(*args, **kwargs):
        with jax.profiler.TraceAnnotation(name):
            return fn(*args, **kwargs)
    return wrapped


@contextlib.contextmanager
def profile_trace(outdir):
    """Capture a device profile of the enclosed block into ``outdir``.

    Thin wrapper over ``jax.profiler.trace`` that forces completion of
    the block's results through a data dependency (pass the result
    array(s) back via the yielded dict's "sync" key, like stage_timer),
    so the capture actually contains the device work::

        with profile_trace("/tmp/prof") as p:
            phi, _ = rt.trace_batches(...)
            p["sync"] = phi
        times = device_op_times("/tmp/prof")

    Analyze with ``device_op_times`` (per-HLO-op device totals) or
    TensorBoard.
    """
    from .evolve_loop import force
    result = {}
    with jax.profiler.trace(str(outdir)):
        yield result
        if "sync" in result:
            force(result["sync"])


def device_op_times(outdir, top=None):
    """Aggregate per-op device times (ms) from a ``profile_trace``
    capture. Returns {op_name: ms} sorted descending. Parses the
    xplane protobuf directly (tensorflow protos), so it works headless
    without TensorBoard."""
    import glob
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    agg = {}
    for f in glob.glob(str(outdir) + "/**/*.xplane.pb", recursive=True):
        xs = xplane_pb2.XSpace()
        with open(f, "rb") as fh:
            xs.ParseFromString(fh.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            ev_names = plane.event_metadata
            for line in plane.lines:
                for ev in line.events:
                    name = ev_names[ev.metadata_id].name
                    agg[name] = agg.get(name, 0.0) + ev.duration_ps / 1e9
    items = sorted(agg.items(), key=lambda kv: -kv[1])
    return dict(items[:top] if top else items)
