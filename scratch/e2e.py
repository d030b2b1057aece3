"""Quick end-to-end raytrace timing at bench config with knobs."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

def main(panels=8, nodes=8, batch=16, use_pallas=True, fuse=False, nreps=3):
    import jax, jax.numpy as jnp
    from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer
    from pyc2ray_tpu.radiation import BlackBodySource
    from pyc2ray_tpu.radiation.spectral_bins import make_spectral_bins
    from pyc2ray_tpu.constants import ev2fr
    N, R, NS = 256, 30.0, 512
    dtype = jnp.float32
    fmin, fmax = ev2fr * 13.598, 10 * ev2fr * 54.416
    bins = make_spectral_bins(BlackBodySource(5e4, False, fmin, 2.8),
                              fmin, fmax, panels=panels, nodes=nodes)
    rt = ChebRaytracer(N, R, 6.30e-18, bins, batch_size=batch, dtype=dtype,
                       use_pallas=use_pallas, fuse_rates=fuse)
    rng = np.random.RandomState(100)
    pos_b, flux_b = rt.prepare_sources(rng.randint(0, N, size=(NS, 3)), np.ones(NS))
    ndens = jnp.asarray(1e-3 * np.ones(N ** 3), dtype)
    xh = jnp.asarray(1.2e-3 * np.ones(N ** 3), dtype)
    dr = jnp.asarray(6.7e20, dtype)
    def sync(x): return float(jnp.ravel(x)[0])
    t0=time.time(); phi,_ = rt.trace_batches(ndens, xh, pos_b, flux_b, dr); sync(phi)
    comp = time.time()-t0
    ts=[]
    for _ in range(nreps):
        t0=time.time(); phi,_ = rt.trace_batches(ndens, xh, pos_b, flux_b, dr); sync(phi)
        ts.append(time.time()-t0)
    t=min(ts)
    upd = NS*4/3*np.pi*R**3
    print(f"bins={panels*nodes} B={batch} pallas={use_pallas} fuse={fuse}: "
          f"{t*1e3:.1f} ms = {1e9*t/upd:.3f} ns/cell  (compile {comp:.0f}s) "
          f"phisum={float(jnp.sum(phi)):.6e}")

if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--panels", type=int, default=8)
    p.add_argument("--nodes", type=int, default=8)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--fuse", action="store_true")
    p.add_argument("--noPallas", action="store_true")
    a = p.parse_args()
    main(a.panels, a.nodes, a.batch, not a.noPallas, a.fuse)
