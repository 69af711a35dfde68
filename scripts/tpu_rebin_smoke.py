"""TPU smoke + timing for the Pallas rebin kernel vs the XLA rebin.

Usage: python scripts/tpu_rebin_smoke.py [X Y Z K]
"""

import sys
import time

import dataclasses
import numpy as np

import jax
import jax.numpy as jnp

from blub_tpu.core.seeding import add_fluid_cube
from blub_tpu.ops.pallas_rebin import rebin_slot_major, supports
from blub_tpu.sim import table as T
from blub_tpu.sim.slot_major import from_table, to_table

G = tuple(int(v) for v in (sys.argv[1:4] or (64, 32, 32)))
K = int(sys.argv[4]) if len(sys.argv) > 4 else 16

print(f"grid={G} K={K} supports={supports(G, K, 2)}", flush=True)

pos = add_fluid_cube(G, (1, 1, 1), (G[0] // 2, G[1] // 2, G[2] - 1), 10**9)
tab = T.from_positions(pos, G, K)
rng = np.random.default_rng(0)
move = (rng.random(np.asarray(tab.pos).shape) * 2 - 1).astype(np.float32) * 1.9
newpos = np.clip(
    np.asarray(tab.pos) + move * np.asarray(tab.valid)[..., None],
    1.001,
    np.asarray(G, np.float32) - 1.001,
)
tab = dataclasses.replace(tab, pos=jnp.asarray(newpos))
print(f"particles={int(jax.device_get(tab.num_particles()))}", flush=True)

sm = from_table(tab)
f_kernel = jax.jit(lambda s: rebin_slot_major(s, 2))
f_xla = jax.jit(lambda t: T.rebin(t, max_shift=2))

t0 = time.time()
out_k = f_kernel(sm)
lost_k = int(jax.device_get(out_k.lost))
print(f"kernel compile+run {time.time()-t0:.1f}s lost={lost_k}", flush=True)

t0 = time.time()
out_x = f_xla(tab)
lost_x = int(jax.device_get(out_x.lost))
print(f"xla    compile+run {time.time()-t0:.1f}s lost={lost_x}", flush=True)

# correctness: multiset of valid position rows must match
def cell_multiset(t):
    import collections

    pos = np.asarray(jax.device_get(t.pos))
    valid = np.asarray(jax.device_get(t.valid))
    out = collections.Counter()
    for x, y, z, k in np.argwhere(valid):
        out[(x, y, z, pos[x, y, z, k].tobytes())] += 1
    return out


a = cell_multiset(out_x)
b = cell_multiset(to_table(out_k))
print(f"multiset match: {a == b} (ref={sum(a.values())} kernel={sum(b.values())})", flush=True)

# timing loops (sync via scalar fetch; donate nothing, reuse inputs)
N = 10
t0 = time.time()
for _ in range(N):
    o = f_kernel(sm)
int(jax.device_get(o.lost))
tk = (time.time() - t0) / N
t0 = time.time()
for _ in range(N):
    o = f_xla(tab)
int(jax.device_get(o.lost))
tx = (time.time() - t0) / N
print(f"kernel {tk*1e3:.1f} ms/rebin   xla {tx*1e3:.1f} ms/rebin   speedup {tx/tk:.1f}x", flush=True)
