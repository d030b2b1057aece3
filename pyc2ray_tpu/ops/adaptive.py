"""Adaptive per-source raytracing radii — the TPU answer to subboxes.

The reference's CPU raytracer grows a cubic subbox around each source
until the photon loss drops below loss_fraction (raytracing.f90:183-226,
#ifdef USE_SUBBOX) — a data-dependent loop that cannot exist under XLA's
static shapes. The TPU-native equivalent is STATIC BUCKETING: sources
are assigned a raytracing radius from their flux via the Stromgren
scaling

    r_S = (3 F S* / (4 pi alpha_B <n>^2 C)) ^ (1/3)          [cm]
    R_src = clip(safety * r_S / dr, R_min, R_max)            [cells]

and binned into a small set of engines with fixed radii (geometry/kernel
compiled per radius). Sweep + rate cost scales with R^3 per source, so
for a realistic EoR catalog spanning ~3 decades of halo flux this cuts
the dominant-bucket work by ~an order of magnitude vs tracing every
source at R_max, while the per-iteration photon-loss log in the evolve
loop (evolve_loop.run_convergence_loop) quantifies the truncation
exactly — the same photon-loss bookkeeping the reference prints for its
subboxes (reference evolve.py:202) — and warns when it exceeds
Raytracing.loss_fraction.

The truncation error is controlled: beyond ~r_S the medium is neutral
and the remaining photon flux decays exponentially with tau; safety=2
keeps the truncated fraction below the reference's default
loss_fraction=1e-2 in uniform-medium tests (tests/test_adaptive.py).

The mean density entering the Stromgren policy is derived from the
density grid actually being traced (passed by the evolve loop /
prepare_sources), NOT from a constructor-time constant — a stale
assumed density on a denser grid would silently shrink every radius.
"""

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from .raytrace_cheb import ChebRaytracer

__all__ = ["stromgren_radius_cells", "AdaptiveRaytracer",
           "AdaptiveBatches"]


def stromgren_radius_cells(flux, dr, avg_dens, alpha_B=2.59e-13,
                           clumping=1.0, s_star=1e48):
    """Stromgren radius in cell units for normalized source flux."""
    flux = np.asarray(flux, dtype=np.float64)
    r_cm = (3.0 * flux * s_star
            / (4.0 * np.pi * alpha_B * clumping * avg_dens ** 2)) ** (1 / 3)
    return r_cm / dr


class AdaptiveBatches(NamedTuple):
    """Per-bucket prepared sources (the adaptive engine's 'pos_b')."""
    pos: tuple        # per-bucket (nb, B, 3) int32 device arrays
    flux: tuple       # per-bucket (nb, B) device arrays
    counts: tuple     # per-bucket source counts (host ints)
    avg_dens: float   # mean density the bucketing used (for the log)


class AdaptiveRaytracer:
    """Multi-engine raytracer with flux-dependent per-source radii.

    Uniform engine API (prepare_sources / trace_batches / trace), so
    evolve3D drives it exactly like a fixed-radius engine. ``radii`` are
    the bucket radii in cells (ascending); each source uses the smallest
    bucket with R_bucket >= its clipped Stromgren radius * safety.
    """

    needs_flux_bucketing = True

    def __init__(self, N, R_max_LLS, sig, bins, radii=None, batch_size=8,
                 dtype=jnp.float32, use_pallas=False, safety=2.0,
                 alpha_B=2.59e-13, R_min=4.0, do_heating=False,
                 accumulate="auto", window_size=None):
        self.N = int(N)
        self.R_max = float(R_max_LLS)
        self.safety = float(safety)
        self.alpha_B = float(alpha_B)
        self.R_min = float(R_min)
        self.do_heating = bool(do_heating)
        if radii is None:
            # geometric ladder: R_max, R_max/2, R_max/4 (>= R_min)
            radii = []
            r = float(min(R_max_LLS, N))
            while r >= max(R_min, 4.0) and len(radii) < 4:
                radii.append(r)
                r /= 2.0
            if not radii:
                # R_max below the minimum bucket (e.g. a sub-cell LLS
                # horizon on a coarse grid): one bucket at R_max,
                # degrading to a plain fixed-radius engine
                radii = [float(min(R_max_LLS, N))]
            radii = sorted(radii)
        self.radii = [float(r) for r in radii]

        def bucket_batch(r):
            # Small-R buckets in window-accumulate mode amortize their
            # per-batch fixed costs (window RMW pair, placement einsums)
            # over more sources. B=16 measured best at R=8 and R=12 on
            # v5e (larger batches lose packing fill faster than they
            # gain amortization).
            if accumulate == "scan" or r > 12.0:
                return batch_size
            return max(batch_size, 16)

        self.engines = [
            ChebRaytracer(N, r, sig, bins, batch_size=bucket_batch(r),
                          dtype=dtype, use_pallas=use_pallas,
                          do_heating=do_heating, accumulate=accumulate,
                          window_size=window_size)
            for r in self.radii]
        self.dtype = dtype
        self.config = self.engines[-1].config

    def assign_buckets(self, src_flux, dr, avg_dens):
        """Bucket index per source from the Stromgren policy."""
        r_s = stromgren_radius_cells(src_flux, float(dr), float(avg_dens),
                                     self.alpha_B)
        r_need = np.clip(self.safety * r_s, self.R_min, self.R_max)
        idx = np.searchsorted(np.asarray(self.radii), r_need - 1e-9)
        return np.minimum(idx, len(self.radii) - 1)

    # -- uniform engine API --------------------------------------------
    def prepare_sources(self, src_pos, src_flux, dr=None, avg_dens=None):
        """Bucket sources and stage per-bucket batches.

        Returns (AdaptiveBatches, None) so callers can treat the result
        as an opaque (pos_b, flux_b) pair. ``dr`` [cm] and ``avg_dens``
        [cm^-3] feed the Stromgren policy; avg_dens should be the mean
        of the density grid being traced (the evolve loop passes it).
        """
        if dr is None or avg_dens is None:
            raise ValueError(
                "AdaptiveRaytracer.prepare_sources needs dr and avg_dens "
                "(the mean of the traced density grid) for the Stromgren "
                "bucketing policy")
        src_pos = np.asarray(src_pos)
        src_flux = np.asarray(src_flux)
        buckets = self.assign_buckets(src_flux, dr, avg_dens)
        pos_t, flux_t, counts = [], [], []
        for k, eng in enumerate(self.engines):
            sel = np.nonzero(buckets == k)[0]
            counts.append(int(sel.size))
            if sel.size == 0:
                pos_t.append(None)
                flux_t.append(None)
                continue
            pos_b, flux_b = eng.prepare_sources(src_pos[sel], src_flux[sel])
            pos_t.append(pos_b)
            flux_t.append(flux_b)
        return AdaptiveBatches(tuple(pos_t), tuple(flux_t), tuple(counts),
                               float(avg_dens)), None

    def describe_buckets(self, batches: AdaptiveBatches):
        pairs = ", ".join(f"R={r:g}: {c}" for r, c
                          in zip(self.radii, batches.counts))
        return (f"Adaptive radii (Stromgren policy, <n> = "
                f"{batches.avg_dens:.3e} cm^-3, safety = {self.safety:g}): "
                f"{pairs} sources")

    def trace_batches(self, nd, xh, batches: AdaptiveBatches, _flux, dr):
        """Device-level trace over all buckets; flat-grid IO like
        ChebRaytracer.trace_batches. Gamma (and heat, with do_heating)
        summed over buckets."""
        phi = None
        heat = None
        for eng, pos_b, flux_b in zip(self.engines, batches.pos,
                                      batches.flux):
            if pos_b is None:
                continue
            p, h = eng.trace_batches(nd, xh, pos_b, flux_b, dr)
            phi = p if phi is None else phi + p
            if self.do_heating:
                heat = h if heat is None else heat + h
        if phi is None:
            phi = jnp.zeros(self.N ** 3, self.dtype)
            heat = jnp.zeros(self.N ** 3, self.dtype) \
                if self.do_heating else None
        return phi, heat

    # -- multi-chip (bucket-major) API ---------------------------------
    @property
    def tables(self):
        """Per-bucket engine tables as one pytree (flows through the
        jit/shard_map signature like a single engine's ChebTables)."""
        return tuple(eng.tables for eng in self.engines)

    def shard_trace(self, tb, nd_flat, xh_flat, pos_b, flux_b, dr):
        """Per-shard bucket-MAJOR trace body for shard_map.

        ``pos_b``/``flux_b`` are per-bucket tuples staged by
        parallel.source_parallel.prepare_sources_sharded: every bucket is
        padded to a whole number of batches per device (zero-flux
        padding), so all devices sweep the SAME radius bucket in lockstep
        — per-device batches never fragment across radii, which is what
        made naive source sharding of the adaptive engine lose its
        batching (docs/PARITY.md, round-3 capability hole). The caller
        psums the returned local Gamma over the mesh axes."""
        phi = None
        heat = None
        for eng, tbk, pk, fk in zip(self.engines, tb, pos_b, flux_b):
            p, h = eng.shard_trace(tbk, nd_flat, xh_flat, pk, fk, dr)
            phi = p if phi is None else phi + p
            if self.do_heating:
                heat = h if heat is None else heat + h
        return phi, heat

    def trace(self, ndens, xh_av, src_pos, src_flux, dr, avg_dens=None,
              stats=False):
        """Public API: Gamma over all buckets; optionally bucket stats.

        Fields are converted to device arrays ONCE (jnp.asarray directly:
        np.asarray on a device-resident field would pull it to the host
        at ~0.05 GB/s on this platform and re-upload it).
        """
        nd = jnp.asarray(ndens, self.dtype).reshape(-1)
        xh = jnp.asarray(xh_av, self.dtype).reshape(-1)
        if avg_dens is None:
            avg_dens = float(jnp.mean(nd))
        batches, _ = self.prepare_sources(src_pos, src_flux, dr=float(dr),
                                          avg_dens=avg_dens)
        dr_d = jnp.asarray(dr, self.dtype)
        phi, heat = self.trace_batches(nd, xh, batches, None, dr_d)
        phi = phi.reshape((self.N,) * 3)
        if stats:
            return phi, {"bucket_radii": self.radii,
                         "bucket_counts": list(batches.counts),
                         "avg_dens": batches.avg_dens}
        if self.do_heating:
            return phi, heat.reshape((self.N,) * 3)
        return phi
