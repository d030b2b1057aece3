"""DUS pair cost vs target buffer size."""
import time, numpy as np, jax, jax.numpy as jnp
from jax import lax
nit = 300
rng = np.random.default_rng(0)
def timed(fn, *args):
    f = jax.jit(fn)
    r = f(*args); float(jnp.ravel(r)[0])
    ts = []
    for _ in range(3):
        t0 = time.time(); r = f(*args); float(jnp.ravel(r)[0])
        ts.append(time.time() - t0)
    return min(ts) / nit * 1e6
for P, W in ((273, 56), (273, 40), (96, 40), (64, 40), (48, 40), (128, 56)):
    offs = jnp.asarray(rng.integers(0, P - W + 1, (nit, 3)), jnp.int32)
    win = jnp.ones((W, W, W), jnp.float32)
    def flat3d(acc, offs=offs, win=win, W=W):
        def body(a, o):
            cur = lax.dynamic_slice(a, (o[0], o[1], o[2]), (W, W, W))
            return lax.dynamic_update_slice(a, cur + win, (o[0], o[1], o[2])), None
        return lax.scan(body, acc, offs)[0]
    print(f"P={P:4d} W={W}: {timed(flat3d, jnp.zeros((P,P,P), jnp.float32)):8.1f} us/iter", flush=True)
