"""TPU smoke + timing for the Pallas advect/correct kernels vs the slot-major
XLA ports.

Usage: python scripts/tpu_advect_smoke.py [X Y Z K] [--solids]
"""

import sys
import time

import dataclasses
import numpy as np

import jax
import jax.numpy as jnp

from blub_tpu.core.seeding import add_fluid_cube
from blub_tpu.ops.pallas_advect import advect_sm_pallas, correct_sm_pallas, supports
from blub_tpu.sim import table as T
from blub_tpu.sim.dense_transfer import marker_from_table
from blub_tpu.sim.slot_major import from_table, to_table
from blub_tpu.sim.sm_phases import advect_slot_major, correct_slot_major

args = [a for a in sys.argv[1:] if not a.startswith("--")]
G = tuple(int(v) for v in (args[:3] or (64, 32, 32)))
K = int(args[3]) if len(args) > 3 else 16
with_solids = "--solids" in sys.argv

print(f"grid={G} K={K} solids={with_solids} supports={supports(G, K)}", flush=True)

pos = add_fluid_cube(G, (1, 1, 1), (G[0] // 2, G[1] // 2, G[2] - 1), 10**9)
tab = T.from_positions(pos, G, K)
rng = np.random.default_rng(0)
tab = dataclasses.replace(
    tab,
    vel=jnp.asarray(rng.standard_normal(np.asarray(tab.vel).shape).astype(np.float32) * 5),
)
print(f"particles={int(jax.device_get(tab.num_particles()))}", flush=True)

vel = tuple(jnp.asarray(rng.standard_normal(G).astype(np.float32) * 20) for _ in range(3))
if with_solids:
    occ_np = np.zeros(G, np.float32)
    occ_np[G[0] // 3 : G[0] // 2, 2 : G[1] // 3, G[2] // 3 : G[2] // 2] = 1.0
    sv_np = np.zeros(G + (3,), np.float32)
    sv_np[occ_np > 0] = (12.0, 4.0, -2.0)
    occ, sv = jnp.asarray(occ_np), jnp.asarray(sv_np)
else:
    occ, sv = None, None

marker = marker_from_table(tab, occ)
change = tuple(v * 0.0005 for v in vel)
sm = from_table(tab)
dt = 1.0 / 120.0

f_k = jax.jit(lambda s: advect_sm_pallas(s, vel, occ, sv, dt).posq)
f_o = jax.jit(lambda s: advect_slot_major(s, vel, occ, sv, dt).posq)
fc_k = jax.jit(lambda s: correct_sm_pallas(s, change, marker).posq)
fc_o = jax.jit(lambda s: correct_slot_major(s, change, marker).posq)

for name, f in (("advect kernel", f_k), ("advect xla", f_o),
                ("correct kernel", fc_k), ("correct xla", fc_o)):
    t0 = time.time()
    out = f(sm)
    float(jax.device_get(out[0, 0, 1, 1, 1]))
    print(f"{name}: compile+run {time.time()-t0:.1f}s", flush=True)

a = np.asarray(jax.device_get(f_o(sm)))
b = np.asarray(jax.device_get(f_k(sm)))
err = np.max(np.abs(a - b))
print(f"advect pos max abs diff: {err:.2e}", flush=True)
ca = np.asarray(jax.device_get(fc_o(sm)))
cb = np.asarray(jax.device_get(fc_k(sm)))
cerr = np.max(np.abs(ca - cb))
print(f"correct pos max abs diff: {cerr:.2e}", flush=True)

N = 10
for name, f in (("advect kernel", f_k), ("advect xla", f_o),
                ("correct kernel", fc_k), ("correct xla", fc_o)):
    t0 = time.time()
    for _ in range(N):
        o = f(sm)
    float(jax.device_get(o[0, 0, 1, 1, 1]))
    print(f"{name}: {(time.time()-t0)/N*1e3:.1f} ms", flush=True)
