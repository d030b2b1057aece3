"""Per-op device profile of the He trace at the small-box config."""
import glob, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np


def run(mode="window", B=16):
    import jax, jax.numpy as jnp
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
    bins = make_spectral_bins_he(bb, panels_per_band=4, nodes=8)
    eng = HeRaytracer(N, R, bins, 0.074, batch_size=B, use_pallas=True,
                      accumulate=mode)
    out = eng.trace(nd, xh, y1, y2, pos, flux, 6.7e22)
    s = float(jnp.sum(out[0]))
    t0 = time.time()
    out = eng.trace(nd, xh, y1, y2, pos, flux, 6.7e22)
    s = float(jnp.sum(out[0]))
    print("warm:", time.time() - t0, file=sys.stderr)
    outdir = "/root/repo/scratch/trace_out"
    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        out = eng.trace(nd, xh, y1, y2, pos, flux, 6.7e22)
        s = float(jnp.sum(out[0]))


def parse():
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    files = glob.glob("/root/repo/scratch/trace_out/**/*.xplane.pb",
                      recursive=True)
    for f in files:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(f, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            ev_names = plane.event_metadata
            agg = {}
            for line in plane.lines:
                for ev in line.events:
                    name = ev_names[ev.metadata_id].name
                    agg[name] = agg.get(name, 0.0) + ev.duration_ps / 1e9
            for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
                print(f"  {ms:9.3f} ms  {name[:120]}")


if __name__ == "__main__":
    if "parse" not in sys.argv:
        run()
    parse()
