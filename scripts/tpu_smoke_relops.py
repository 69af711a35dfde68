"""Mosaic support smoke for the 16-bit fixed-point position ops (round 5).

The rel16 posq layout (sim/slot_major.py) needs, inside Pallas kernels:
  - jnp.round (round-half-even) on f32 vregs
  - i32 <-> f32 converts
  - arithmetic right shift, left shift, and masks on i32 vregs
  - select on bit-pattern payloads

This compiles a tiny kernel exercising the exact op sequence (encode ->
pack -> unpack -> decode) and checks the round-trip + rounding mode on the
real chip. Runs in seconds; meant to run BEFORE committing kernel rewrites.

Usage: python -u scripts/tpu_smoke_relops.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import blub_tpu  # noqa: F401 (compile cache)

    def kern(pos_ref, cell_ref, out_ref, rt_ref):
        pos = pos_ref[...]
        cell = cell_ref[...]
        # encode: r = round((pos - cell - 1) * 8192) as i32
        r = jnp.round((pos - cell - 1.0) * 8192.0)
        ri = r.astype(jnp.int32)
        rj = ri  # pretend second axis
        packed = (ri << 16) | (rj & 0xFFFF)
        pf = jax.lax.bitcast_convert_type(packed, jnp.float32)
        # transport via select (bit-exact)
        pf = jnp.where(pos > -1e9, pf, 0.0)
        b = jax.lax.bitcast_convert_type(pf, jnp.int32)
        rx = b >> 16
        ry = (b << 16) >> 16
        out_ref[...] = rx.astype(jnp.float32)
        # decode round-trip
        rt_ref[...] = cell + 1.0 + ry.astype(jnp.float32) * (2.0**-13)

    shape = (8, 128)
    rng = np.random.default_rng(0)
    cell = rng.integers(0, 500, shape).astype(np.float32)
    pos = cell + 1.0 + (rng.random(shape).astype(np.float32) * 7.0 - 3.5)

    f = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
        ],
    )
    rx, rt = f(jnp.asarray(pos), jnp.asarray(cell))
    rx = np.asarray(jax.device_get(rx))
    rt = np.asarray(jax.device_get(rt))

    want_r = np.round((pos - cell - 1.0).astype(np.float32) * 8192.0)
    want_rt = cell + 1.0 + want_r * np.float32(2.0**-13)
    assert np.array_equal(rx, want_r), (rx[:2, :4], want_r[:2, :4])
    assert np.array_equal(rt, want_rt.astype(np.float32)), "decode mismatch"
    # rounding mode: half-even at exact .5 boundaries
    ties = np.float32(0.5) * np.float32(2.0**-13) + np.float32(1.0)
    cells0 = np.zeros(shape, np.float32)
    posx = np.full(shape, ties, np.float32)
    rx2, _ = f(jnp.asarray(posx), jnp.asarray(cells0))
    rx2 = np.asarray(jax.device_get(rx2))
    assert np.array_equal(rx2, np.round(np.float32(0.5)) * np.ones(shape)), rx2[0, :4]
    print("RELOPS OK (round/shifts/converts/select all lower + match numpy)")


if __name__ == "__main__":
    main()
