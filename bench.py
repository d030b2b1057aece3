"""Benchmark: raytrace+chemistry throughput on one TPU chip.

Reproduces the reference's raytracing-benchmark methodology
(test/paper_tests/raytracing_benchmark/run_test.py:45-113): N^3 grid,
Ns sources at random positions, octahedron radius R, timing normalized as
t / (Ns * 4/3 pi R^3) seconds per cell-update per source — the quantity
the ASORA paper's Figure 8 reports in ns/cell on a P100.

Engine: the Chebyshev-face sweep as a monolithic Pallas kernel
(ops/pallas_sweep.py) with black-body spectral-bin rates, float32, plus
the on-device chemistry pass.

Timing note: on this TPU stack ``block_until_ready`` does not reliably
block, so every measurement is closed by fetching a scalar from the
result (forces completion through the data dependency).

Prints ONE JSON line:
  {"metric": "raytrace+chem Mcell-updates/s/chip@256^3", "value": ...,
   "unit": "Mcell/s", "vs_baseline": ...}

vs_baseline compares the raytrace-only ns/cell against ASORA's converged
P100 floor of 3.156 ns/cell-update. That number is read off the
reference repository's own copy of the paper's Figure 8
(/root/reference/fig/scaling.jpg): the dashed converged floor is
annotated "3.156 ns" on the axis 3t/(Ns 4 pi R^3) [s] — identical to
this bench's normalization t / (Ns * 4/3 pi R^3) — measured on an
NVIDIA Tesla P100 (the axis subtitle names the GPU). The floor is
reached for Ns >~ 1e3 (R=30 curve converges at Ns ~ 1e3), so the bench
measures in that converged regime; vs_baseline = 3.156 / ours_ns.
"""

import json
import sys
import time

import numpy as np

# ASORA P100 converged floor, annotated in the paper's Figure 8 shipped
# with the reference (fig/scaling.jpg, dashed line "3.156 ns")
BASELINE_NS_PER_CELL = 3.156


def main():
    import jax
    import jax.numpy as jnp
    from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer
    from pyc2ray_tpu.ops.chemistry import ChemistryParams, global_pass
    from pyc2ray_tpu.radiation import BlackBodySource
    from pyc2ray_tpu.radiation.spectral_bins import make_spectral_bins
    from pyc2ray_tpu.constants import ev2fr

    N = 256
    R = 30.0
    NS = 2048   # converged regime of the paper's Figure-8 floor (Ns >~ 1e3)
    BATCH = 8   # measured optimum of the r02 batch sweep (1/2/4/8/16/32/64
                # -> 2.30/1.86/1.84/1.80/1.91/2.08/2.31 ns/cell; the TPU
                # plateaus far below the P100's M=56)
    NREPS = 3
    dtype = jnp.float32

    fmin, fmax = ev2fr * 13.598, 10 * ev2fr * 54.416
    # production bins: a dense 768-bin quadrature compressed to a ~14
    # node sum-of-exponentials at 1e-3 uniform relative error on the
    # band (F, G) functions (radiation/bins_compress.py) — both ~16x
    # MORE accurate than the legacy 32-bin default (2.5e-4 vs 4.0e-3 vs
    # dense; the reference's NumTau=2000 table sits at 7.3e-3) and
    # ~2.3x fewer exp evaluations in the exp-roofline-bound rate pass,
    # which dominates at this config (no rates subbox at Dc=64)
    from pyc2ray_tpu.radiation.bins_compress import compress_bins
    dense = make_spectral_bins(BlackBodySource(5e4, False, fmin, 2.8),
                               fmin, fmax, panels=48, nodes=16)
    bins = compress_bins(dense, target_rel=1e-3)
    rt = ChebRaytracer(N, R, 6.30e-18, bins, batch_size=BATCH, dtype=dtype,
                       use_pallas=True)
    chem = ChemistryParams(bh00=2.59e-13, albpow=-0.7,
                           colh0=1.3e-8 * 0.83 / (13.598 ** 2),
                           temph0=13.598 / 8.617e-05, abu_c=7.1e-7)

    rng = np.random.RandomState(100)
    pos_b, flux_b = rt.prepare_sources(
        rng.randint(0, N, size=(NS, 3)), np.ones(NS))
    ndens = jnp.asarray(1e-3 * np.ones(N ** 3), dtype)
    temp = jnp.asarray(1e4 * np.ones(N ** 3), dtype)
    xh = jnp.asarray(1.2e-3 * np.ones(N ** 3), dtype)
    dr = jnp.asarray(6.7e20, dtype)
    dt = jnp.asarray(3.15e13, dtype)

    def sync(x):
        return float(jnp.ravel(x)[0])

    # --- raytrace-only -------------------------------------------------
    t0 = time.time()
    phi, _ = rt.trace_batches(ndens, xh, pos_b, flux_b, dr)
    sync(phi)
    compile_s = time.time() - t0
    tr = []
    for _ in range(NREPS):
        t0 = time.time()
        phi, _ = rt.trace_batches(ndens, xh, pos_b, flux_b, dr)
        sync(phi)
        tr.append(time.time() - t0)
    t_ray = min(tr)

    # --- chemistry -----------------------------------------------------
    xi, xa, cf = global_pass(dt, ndens, temp, xh, xh, phi, chem)
    sync(xi)
    tc = []
    for _ in range(NREPS):
        t0 = time.time()
        xi, xa, cf = global_pass(dt, ndens, temp, xh, xh, phi, chem)
        sync(xi)
        tc.append(time.time() - t0)
    t_chem = min(tc)
    t_full = t_ray + t_chem

    cells_per_src = 4.0 / 3.0 * np.pi * R ** 3
    updates = NS * cells_per_src
    ns_per_cell_ray = 1e9 * t_ray / updates
    mcell_full = updates / t_full / 1e6
    mcell_ray = updates / t_ray / 1e6

    # --- single-chip roofline accounting --------------------------------
    # Grounds the ns/cell number against the CHIP, not just the 2015 P100
    # anchor. Per batch the pipeline's irreducible work is:
    #   HBM bytes: kernel streams (geometry slices + 2 nhi planes/face/
    #     shell + 1 stack plane out), the fold's stack->box pass, the
    #     rate pass (cd + nhi in, phi out), the 4 nhi box layouts and the
    #     per-source accumulate RMW — counted from the static shapes.
    #   VPU transcendentals: K exp + K expm1 per swept cell (the rate
    #     pass; the sweep's weight math is mul/add-bound).
    # Stage lower bounds: traffic / HBM spec BW and exps / measured exp
    # ceiling; their SUM is the no-overlap device floor (stages are
    # dependent, so floors add rather than max).
    g = rt.geom
    Dc, R1, G = g.Dc, g.r_max + 1, rt.lane_pack
    fb = 4  # f32
    nb = -(-NS // BATCH)
    kernel_bytes = (3 * R1 * 8 * Dc * 2 * G * Dc       # geometry slices
                    + 6 * R1 * BATCH * Dc * Dc          # nhi face planes
                    + 3 * BATCH * R1 * Dc * 2 * Dc      # stacks out
                    ) * fb
    fold_bytes = (3 * BATCH * R1 * Dc * 2 * Dc          # stacks in
                  + BATCH * Dc ** 3) * fb               # box out
    Ds = rt.Ds
    rates_bytes = 3 * BATCH * Ds ** 3 * fb              # cd+nhi in, phi out
    stage_bytes = (kernel_bytes + fold_bytes + rates_bytes
                   + 4 * BATCH * Dc ** 3 * fb           # nhi layouts
                   + 2 * BATCH * Ds ** 3 * fb)          # accumulate RMW
    exps = 2 * BATCH * Ds ** 3 * bins.num_bins          # exp + expm1
    HBM_BW = 819e9          # v5e HBM spec
    EXP_RATE = 1.2e11       # measured v5e transcendental ceiling
    t_bw = nb * stage_bytes / HBM_BW
    t_exp = nb * exps / EXP_RATE
    floor_ns = 1e9 * (t_bw + t_exp) / updates
    roofline = {
        "model_bytes_per_batch": stage_bytes,
        "model_exps_per_batch": exps,
        "effective_HBM_GBps": round(nb * stage_bytes / t_ray / 1e9, 1),
        "HBM_spec_GBps": 819,
        "hbm_utilization": round(nb * stage_bytes / t_ray / HBM_BW, 3),
        "exp_per_s": round(nb * exps / t_ray / 1e9, 1),
        "device_floor_ns_per_cell": round(floor_ns, 3),
        "fraction_of_device_floor": round(floor_ns / ns_per_cell_ray, 3),
    }

    detail = {
        "N": N, "R": R, "num_src": NS, "batch": BATCH, "dtype": "float32",
        "engine": f"pallas chebyshev-face sweep + compressed spectral "
                  f"bins ({bins.num_bins})",
        "t_raytrace_s": round(t_ray, 4), "t_chemistry_s": round(t_chem, 4),
        "compile_s": round(compile_s, 1),
        "ns_per_cell_update_raytrace": round(ns_per_cell_ray, 3),
        "Mcell_per_s_raytrace": round(mcell_ray, 1),
        "roofline": roofline,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(detail), file=sys.stderr)
    print(json.dumps({
        "metric": "raytrace+chem Mcell-updates/s/chip@256^3",
        "value": round(mcell_full, 1),
        "unit": "Mcell/s",
        "vs_baseline": round(BASELINE_NS_PER_CELL / ns_per_cell_ray, 3),
    }))


if __name__ == "__main__":
    main()
