"""HLO traffic measurement for the 512^3-class domain step.

Lowers the FULL domain-decomposed (raytrace + chemistry) step with
abstract arguments on a virtual (pi, pj, pk) CPU mesh and sums the bytes
moved through stablehlo.collective_permute — the halo exchange — per
chip per convergence iteration. Extends the 8-chip HLO guarantee
(tests/test_domain.py::test_domain_traffic_512_class_production_scale)
to arbitrary mesh sizes; the 64-chip row of the weak-scaling table in
docs/TPU_PERFORMANCE_NOTES.md is produced by:

  XLA_FLAGS=--xla_force_host_platform_device_count=64 JAX_PLATFORMS=cpu \
  PYTHONPATH=/root/repo python scratch/domain_traffic.py 512 31 4 4 4

Prints one JSON line: measured bytes/chip/iter, the analytic halo
model, and the reference's replicated Reduce+Bcast volume (2 N^3 f64,
reference evolve.py:433-437).
"""

import json
import re
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def measure(N, R, pi, pj, pk, batch=8):
    from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer
    from pyc2ray_tpu.ops.raytrace_box import grey_bins
    from pyc2ray_tpu.ops.chemistry import ChemistryParams
    from pyc2ray_tpu.parallel import make_domain_mesh, DomainDecomposition

    chem = ChemistryParams(bh00=2.59e-13, albpow=-0.7,
                           colh0=1.3e-8 * 0.83 / (13.598 ** 2),
                           temph0=13.598 / 8.617e-05, abu_c=7.1e-7)
    eng = ChebRaytracer(N, R, 6.30e-18, grey_bins(), batch_size=batch,
                        dtype=jnp.float32)
    dd = DomainDecomposition(eng, make_domain_mesh(pi, pj, pk))
    rng = np.random.RandomState(11)
    srcs = dd.prepare_sources(rng.randint(0, N, (64, 3)), np.ones(64))
    step = dd.make_step(chem, srcs)

    f = jax.ShapeDtypeStruct((N, N, N), jnp.float32)
    sds = lambda t: jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), jnp.asarray(x).dtype),
        t)
    s0 = jax.ShapeDtypeStruct((), jnp.float32)
    txt = step._jitted.lower(sds(step._tables), f, f, f, f,
                             *sds(step._srcs), s0, s0).as_text()

    tot = 0
    for m in re.finditer(
            r"stablehlo\.collective_permute.*?tensor<([0-9x]+)xf(32|64)>",
            txt):
        n = 1
        for d in m.group(1).split("x"):
            n *= int(d)
        tot += n * (4 if m.group(2) == "32" else 8)

    h = dd.hlo + dd.hhi
    Li, Lj, Lk = dd.Li, dd.Lj, dd.Lk
    model = 2 * h * (Lj * Lk + (Li + h) * Lk + (Li + h) * (Lj + h)) * 4
    assert not re.search(r"all_gather.*tensor<%dx%dx%d" % (N, N, N), txt)
    assert not re.search(r"all_reduce.*tensor<%dx%dx%d" % (N, N, N), txt)
    return {"N": N, "R": R, "mesh": [pi, pj, pk],
            "chips": pi * pj * pk, "halo": h, "L": [Li, Lj, Lk],
            "measured_bytes_per_chip_iter": tot,
            "model_bytes_per_chip_iter": model,
            "measured_MB": round(tot / 1e6, 1),
            "reference_reduce_bcast_MB": round(2 * N ** 3 * 8 / 1e6, 1)}


if __name__ == "__main__":
    N, R, pi, pj, pk = (int(float(a)) for a in sys.argv[1:6])
    out = measure(N, float(R), pi, pj, pk)
    assert out["measured_bytes_per_chip_iter"] == \
        out["model_bytes_per_chip_iter"], out
    print(json.dumps(out))
