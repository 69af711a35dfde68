"""Per-phase profile of the slot-major step on TPU. Usage: [X Y Z K]"""

import sys

from blub_tpu.core.seeding import add_fluid_cube
from blub_tpu.core.types import SimParams
from blub_tpu.runtime.profiler import profile_step_sm
from blub_tpu.sim.step_dense import make_dense_state

G = tuple(int(v) for v in (sys.argv[1:4] or (128, 64, 64)))
K = int(sys.argv[4]) if len(sys.argv) > 4 else 16

pos = add_fluid_cube(G, (1, 1, 1), (G[0] // 2, G[1] // 2, G[2] - 1), 10**9)
params = SimParams(
    grid_dim=G, dt=1.0 / 120.0, gravity_grid=(0.0, -981.0, 0.0), num_particles=pos.shape[0]
)
state = make_dense_state(params, pos, capacity=K, layout="sm")
print(f"grid={G} K={K} particles={pos.shape[0]}", flush=True)
means, timer = profile_step_sm(params, state, repeats=3)
print(timer.report(), flush=True)
