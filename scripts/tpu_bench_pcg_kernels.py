"""Microbench the blocked-PCG K1/K2 kernels standalone on the TPU at
north-star internal dims: per-call cost via back-to-back lax.scan chains,
vs the bandwidth floor. Usage: [X Y Z] [bx]"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from blub_tpu.core.types import CELL_AIR, CELL_FLUID, CELL_SOLID
from blub_tpu.ops.pallas_pcg_blocked import _k1_call, _k2_call, _pick_bx
from blub_tpu.sim.pressure import diag_coefficients

argv = [a for a in sys.argv[1:]]
X, Y, Z = (int(v) for v in (argv[:3] or (128, 128, 256)))
N = 50

mk = np.full((X, Y, Z), CELL_AIR, np.int32)
mk[0], mk[-1] = CELL_SOLID, CELL_SOLID
mk[:, 0], mk[:, -1] = CELL_SOLID, CELL_SOLID
mk[:, :, 0], mk[:, :, -1] = CELL_SOLID, CELL_SOLID
mk[1 : X // 2, 1 : (2 * Y) // 3, 1:-1] = CELL_FLUID
mk = jnp.asarray(mk)
fluid = mk == CELL_FLUID
diag = diag_coefficients(mk)
dsafe = jnp.where(diag > 0.0, diag, 1.0)
fi = jnp.where(fluid, 1.0 / dsafe, 0.0)
rng = np.random.default_rng(0)
r0 = jnp.where(fluid, jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32)), 0.0)

bx = int(argv[3]) if len(argv) > 3 else _pick_bx(X, Y, Z)
print(f"grid=({X},{Y},{Z}) bx={bx} nb={X//bx}", flush=True)
beta = jnp.ones((1,), jnp.float32) * 0.5
alpha = jnp.ones((1,), jnp.float32) * 0.01


def timeit(tag, fn, *args):
    t0 = time.time()
    out = fn(*args)
    s = float(jax.device_get(jnp.sum(out[0][0, 0])))
    t1 = time.time()
    out = fn(*args)
    s = float(jax.device_get(jnp.sum(out[0][0, 0])))
    t2 = time.time()
    print(f"{tag}: {(t2-t1)/N*1000:.3f} ms/call (compile {t1-t0:.0f}s, chk {s:.3g})", flush=True)


@jax.jit
def k1_chain(z, s):
    def body(c, _):
        z, s = c
        snew, As, dots = _k1_call(beta, z, s, diag.astype(jnp.float32), bx=bx, interpret=False)
        return (jnp.where(fluid, As, 0.0) * 1e-3, snew), None

    c, _ = jax.lax.scan(body, (z, s), jnp.arange(N))
    return c


@jax.jit
def k2_chain(r):
    def body(c, _):
        r = c
        p, rn, zn, tiles = _k2_call(alpha, r, r, r, r, fi, bx=bx, interpret=False)
        return rn + 1e-6 * zn, None

    c, _ = jax.lax.scan(body, r, jnp.arange(N))
    return (c,)


timeit("k1", k1_chain, r0, r0)
timeit("k2", k2_chain, r0)
print("done", flush=True)
