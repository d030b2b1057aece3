"""DUS fixed-cost probe: unaligned 3D window RMW vs brick-aligned RMW."""
import time, numpy as np, jax, jax.numpy as jnp
from jax import lax

P, W, NB = 273, 56, 8
nit = 300

def timed(fn, *args):
    f = jax.jit(fn)
    r = f(*args); float(jnp.ravel(r)[0])
    ts = []
    for _ in range(3):
        t0 = time.time(); r = f(*args); float(jnp.ravel(r)[0])
        ts.append(time.time() - t0)
    return min(ts) / nit * 1e6

rng = np.random.default_rng(0)
offs = jnp.asarray(rng.integers(0, P - W, (nit, 3)), jnp.int32)
bidx = jnp.asarray(rng.integers(0, NB, (nit, 3)), jnp.int32)
win = jnp.ones((W, W, W), jnp.float32)

def flat3d(acc):
    def body(a, o):
        cur = lax.dynamic_slice(a, (o[0], o[1], o[2]), (W, W, W))
        return lax.dynamic_update_slice(a, cur + win, (o[0], o[1], o[2])), None
    return lax.scan(body, acc, offs)[0]

def brick(acc):
    z = jnp.zeros((), jnp.int32)
    def body(a, o):
        st = (o[0], o[1], o[2], z, z, z)
        cur = lax.dynamic_slice(a, st, (1, 1, 1, W, W, W))
        return lax.dynamic_update_slice(a, cur + win[None, None, None], st), None
    return lax.scan(body, acc, bidx)[0]

def brickflat(acc):
    # bricks flattened to (NB^3, W^3): 1 region, 2D dynamic index
    z = jnp.zeros((), jnp.int32)
    wf = win.reshape(1, -1)
    def body(a, o):
        i = (o[0] * NB + o[1]) * NB + o[2]
        st = (i, z)
        cur = lax.dynamic_slice(a, st, (1, W * W * W))
        return lax.dynamic_update_slice(a, cur + wf, st), None
    return lax.scan(body, acc, bidx)[0]

print("flat 3d unaligned :", timed(flat3d, jnp.zeros((P, P, P), jnp.float32)), "us/iter")
print("brick 6d          :", timed(brick, jnp.zeros((NB, NB, NB, W, W, W), jnp.float32)), "us/iter")
print("brick flat 2d     :", timed(brickflat, jnp.zeros((NB**3, W**3), jnp.float32)), "us/iter")
