"""Profile trace_batches at the bench config; dump per-op device times."""
import glob, gzip, os, sys, time
import numpy as np

def run():
    import jax, jax.numpy as jnp
    from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer
    from pyc2ray_tpu.radiation import BlackBodySource
    from pyc2ray_tpu.radiation.spectral_bins import make_spectral_bins
    from pyc2ray_tpu.constants import ev2fr

    N, R, NS, BATCH = 256, 30.0, 512, 16
    dtype = jnp.float32
    fmin, fmax = ev2fr * 13.598, 10 * ev2fr * 54.416
    bins = make_spectral_bins(BlackBodySource(5e4, False, fmin, 2.8),
                              fmin, fmax, panels=4, nodes=8)
    rt = ChebRaytracer(N, R, 6.30e-18, bins, batch_size=BATCH, dtype=dtype,
                       use_pallas=True)
    rng = np.random.RandomState(100)
    pos_b, flux_b = rt.prepare_sources(rng.randint(0, N, size=(NS, 3)), np.ones(NS))
    ndens = jnp.asarray(1e-3 * np.ones(N ** 3), dtype)
    xh = jnp.asarray(1.2e-3 * np.ones(N ** 3), dtype)
    dr = jnp.asarray(6.7e20, dtype)

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
    files = glob.glob("/root/repo/scratch/trace_out/**/*.xplane.pb", recursive=True)
    print("xplane files:", files, file=sys.stderr)
    for f in files:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(f, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            print("== plane:", plane.name)
            ev_names = plane.event_metadata
            # aggregate durations by event name across all lines
            agg = {}
            for line in plane.lines:
                for ev in line.events:
                    name = ev_names[ev.metadata_id].name
                    agg[name] = agg.get(name, 0.0) + ev.duration_ps / 1e9  # ms
            tot = sum(agg.values())
            for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:60]:
                print(f"  {ms:9.3f} ms  {name[:140]}")
            print(f"  total (sum of events, overlaps possible): {tot:.2f} ms")

if __name__ == "__main__":
    if "parse" not in sys.argv:
        run()
    parse()
