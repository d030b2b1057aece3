"""Benchmark: raytrace+chemistry throughput on one TPU chip.

Reproduces the reference's raytracing-benchmark methodology
(test/paper_tests/raytracing_benchmark/run_test.py:45-113): N^3 grid,
Ns sources at random positions, octahedron radius R, timing normalized as
t / (Ns * 4/3 pi R^3) seconds per cell-update per source — the quantity the
ASORA paper's Figure 8 reports in ns/cell on a P100.

Prints ONE JSON line:
  {"metric": "raytrace+chem Mcell-updates/s/chip@256^3", "value": ...,
   "unit": "Mcell/s", "vs_baseline": ...}

vs_baseline compares the raytrace-only ns/cell against ASORA's converged
P100 floor. The reference repo stores no number (BASELINE.md: "harness +
formula only"); we use 2.0 ns/cell-update as the documented anchor estimate
for the P100 floor, so vs_baseline = 2.0 / ours_ns.
"""

import json
import sys
import time

import numpy as np

BASELINE_NS_PER_CELL = 2.0  # assumed ASORA P100 converged floor (see above)


def main():
    import jax
    import jax.numpy as jnp
    from pyc2ray_tpu.ops.raytrace import RaytraceConfig, Raytracer
    from pyc2ray_tpu.ops.chemistry import ChemistryParams, global_pass
    from pyc2ray_tpu.radiation import make_tau_table, BlackBodySource
    from pyc2ray_tpu.constants import ev2fr

    N = 256
    R = 30.0
    NS = 1024
    BATCH = 8
    NREPS = 3
    dtype = jnp.float32

    # radiation tables (NumTau=2000, production config point)
    tau, dlogtau = make_tau_table(-20.0, 4.0, 2000)
    bb = BlackBodySource(5e4, False, ev2fr * 13.598, 2.8)
    thin, thick = bb.make_photo_table(tau, ev2fr * 13.598,
                                      10 * ev2fr * 54.416, 1e48)

    cfg = RaytraceConfig(N=N, R_max_LLS=R, sig=6.30e-18, batch_size=BATCH,
                         dtype=dtype)
    rt = Raytracer(cfg, thin, thick, -20.0, dlogtau)
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

    def full_step(nd, tp, x0, xav, pb, fb, dt_, dr_):
        phi, _ = rt._trace_impl(nd, xav, pb, fb, dr_)
        xi, xa, cf = global_pass(dt_, nd, tp, x0, xav, phi, chem)
        return xi, xa, phi, cf

    step_jit = jax.jit(full_step)

    # warmup (compile)
    t0 = time.time()
    out = step_jit(ndens, temp, xh, xh, pos_b, flux_b, dt, dr)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    # raytrace-only timing
    tr = []
    for _ in range(NREPS):
        t0 = time.time()
        phi, _ = rt._trace_jit(ndens, xh, pos_b, flux_b, dr)
        phi.block_until_ready()
        tr.append(time.time() - t0)
    t_ray = min(tr)

    # full step timing (raytrace + chemistry)
    tf = []
    for _ in range(NREPS):
        t0 = time.time()
        out = step_jit(ndens, temp, xh, xh, pos_b, flux_b, dt, dr)
        jax.block_until_ready(out)
        tf.append(time.time() - t0)
    t_full = min(tf)

    cells_per_src = 4.0 / 3.0 * np.pi * R ** 3
    updates = NS * cells_per_src
    ns_per_cell_ray = 1e9 * t_ray / updates
    mcell_full = updates / t_full / 1e6
    mcell_ray = updates / t_ray / 1e6

    detail = {
        "N": N, "R": R, "num_src": NS, "batch": BATCH,
        "dtype": "float32",
        "t_raytrace_s": round(t_ray, 4), "t_full_step_s": round(t_full, 4),
        "compile_s": round(compile_s, 1),
        "ns_per_cell_update_raytrace": round(ns_per_cell_ray, 4),
        "Mcell_per_s_raytrace": round(mcell_ray, 1),
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
