"""Profile the window-accumulate trace at the small-box production
config; dump per-op device times."""
import glob, os, sys, time
import numpy as np


def run(mode, B):
    import jax, jax.numpy as jnp
    from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer
    from pyc2ray_tpu.radiation import BlackBodySource
    from pyc2ray_tpu.radiation.spectral_bins import make_spectral_bins
    from pyc2ray_tpu.constants import ev2fr

    N, R, NS = 250, 8.0, 20000
    dtype = jnp.float32
    fmin, fmax = ev2fr * 13.598, 10 * ev2fr * 54.416
    bins = make_spectral_bins(BlackBodySource(5e4, False, fmin, 2.8),
                              fmin, fmax, panels=4, nodes=8)
    rt = ChebRaytracer(N, R, 6.30e-18, bins, batch_size=B, dtype=dtype,
                       use_pallas=True, accumulate=mode)
    rng = np.random.default_rng(42)
    pos_b, flux_b = rt.prepare_sources(
        rng.integers(0, N, (NS, 3)), 10 ** rng.uniform(0, 2, NS))
    print("nb:", getattr(pos_b, "pos", pos_b).shape, file=sys.stderr)
    ndens = jnp.asarray(1e-4 * np.ones(N ** 3), dtype)
    xh = jnp.asarray(1.2e-3 * np.ones(N ** 3), dtype)
    dr = jnp.asarray(6.7e22, dtype)

    def sync(x):
        return float(jnp.ravel(x)[0])

    phi, _ = rt.trace_batches(ndens, xh, pos_b, flux_b, dr)
    sync(phi)
    t0 = time.time()
    phi, _ = rt.trace_batches(ndens, xh, pos_b, flux_b, dr)
    sync(phi)
    print("warm run:", time.time() - t0, "s", file=sys.stderr)

    outdir = "/root/repo/scratch/trace_out"
    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        phi, _ = rt.trace_batches(ndens, xh, pos_b, flux_b, dr)
        sync(phi)
    print("traced", file=sys.stderr)


def parse():
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    files = glob.glob("/root/repo/scratch/trace_out/**/*.xplane.pb",
                      recursive=True)
    for f in files:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(f, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            print("== plane:", plane.name)
            ev_names = plane.event_metadata
            agg = {}
            for line in plane.lines:
                for ev in line.events:
                    name = ev_names[ev.metadata_id].name
                    agg[name] = agg.get(name, 0.0) + ev.duration_ps / 1e9
            tot = sum(agg.values())
            for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:45]:
                print(f"  {ms:9.3f} ms  {name[:140]}")
            print(f"  total (sum of events, overlaps possible): {tot:.2f} ms")


if __name__ == "__main__":
    if "parse" not in sys.argv:
        mode = sys.argv[1] if len(sys.argv) > 1 else "window"
        B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
        run(mode, B)
    parse()
