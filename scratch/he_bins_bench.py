"""He trace wall time vs bin count at the small-box probe config."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax.numpy as jnp
    from pyc2ray_tpu.radiation import BlackBodySource
    from pyc2ray_tpu.radiation.helium import (make_spectral_bins_he,
                                              HE_EDGES_EV)
    from pyc2ray_tpu.ops.raytrace_he import HeRaytracer
    from pyc2ray_tpu.constants import ev2fr

    N, R, ns = 128, 8.0, 5000
    rng = np.random.default_rng(4)
    nd = (1e-4 * (1 + 0.2 * rng.random((N, N, N)))).astype(np.float32)
    xh = (1e-3 * rng.random((N, N, N))).astype(np.float32)
    y1 = (1e-3 * rng.random((N, N, N))).astype(np.float32)
    y2 = (1e-4 * rng.random((N, N, N))).astype(np.float32)
    pos = rng.integers(0, N, (ns, 3))
    flux = 10 ** rng.uniform(0, 2, ns)
    bb = BlackBodySource(1e5, False, ev2fr * HE_EDGES_EV[0], 2.8)

    cells = ns * 4.0 / 3.0 * np.pi * R ** 3
    sums = {}
    for panels, nodes in [(6, 8), (4, 8), (3, 8)]:
        bins = make_spectral_bins_he(bb, panels_per_band=panels, nodes=nodes)
        eng = HeRaytracer(N, R, bins, 0.074, batch_size=16, use_pallas=True,
                          accumulate="auto")
        # production path: pre-packed sources + device fields, like the
        # evolve loops (trace() would re-pay 0.4 s host packing per call)
        pb, fb = eng.prepare_sources(pos, flux)
        args = [jnp.asarray(a) for a in (nd, xh, y1, y2)]
        drd = jnp.asarray(6.7e22, jnp.float32)
        out = eng.trace_batches(*args, pb, fb, drd)
        _ = float(jnp.sum(out[0]))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            out = eng.trace_batches(*args, pb, fb, drd)
            s = [float(jnp.sum(o)) for o in out]
            best = min(best, time.time() - t0)
        sums[(panels, nodes)] = s
        print(f"panels={panels} nodes={nodes} bins={3*panels*nodes:3d}  "
              f"{best*1e3:7.1f} ms  {best/cells*1e9:6.2f} ns/cell  "
              f"sumG_HI={s[0]:.6e}")
    ref = sums[(6, 8)]
    for k, s in sums.items():
        dev = max(abs(a / b - 1) for a, b in zip(s, ref))
        print(f"{k}: max channel-sum rel dev vs 144 bins = {dev:.2e}")


if __name__ == "__main__":
    main()
