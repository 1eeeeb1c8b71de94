"""Microbench: does the row-loop lane-select scheme amortize with
taller query tiles?

The grouped kernels issue one ``take_along_axis`` per table row per
[8, 128] query tile (ops/grouped._row_select).  The per-query rate
measured end-to-end (~0.37G lookups/s at 1M x 96) is ~7x below the
scheme's microbenched peak (~2.5G/s in ops/local_gather, which
amortizes each row broadcast over [256, 128] queries).  If the
per-take FIXED cost (instruction issue, gather setup) dominates at
[8, 128], processing S sublanes per program should approach S/8 x the
rate; if the VPU ALU work dominates, rates should match.

Run SOLO on the chip: python tools/exp_rowsel_shape.py
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = 144            # table rows (the grouped kernels' R_ROWS)
    ZW = 128
    NQ = 1 << 20       # total queries per point-pass
    KK = 16            # points (passes over the same queries)

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.uniform(0, 1, (R, ZW)).astype(np.float32))
    rows = jnp.asarray(rng.integers(0, R, NQ), jnp.int32)
    lanes = jnp.asarray(rng.integers(0, ZW, NQ), jnp.int32)

    def make(S):
        nt = NQ // (S * 128)

        def kern(row_ref, lane_ref, tab_ref, out_ref, *, kk):
            def point(_k, acc):
                row = row_ref[...]
                lane = lane_ref[...]

                def body(b, d):
                    blk = tab_ref[pl.ds(b * 16, 16), :]
                    for j in range(16):
                        rowb = jnp.broadcast_to(blk[j:j + 1, :], row.shape)
                        v = jnp.take_along_axis(rowb, lane, axis=1)
                        d = jnp.where(row == b * 16 + j, v, d)
                    return d

                d = jax.lax.fori_loop(0, R // 16, body,
                                      jnp.zeros(row.shape, jnp.float32))
                return acc + d

            out_ref[...] = jax.lax.fori_loop(
                0, kk, point, jnp.zeros(row_ref.shape, jnp.float32))

        f = pl.pallas_call(
            partial(kern, kk=KK),
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((S, 128), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S, 128), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, ZW), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((S, 128), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NQ // 128, 128), jnp.float32),
        )
        r2 = rows.reshape(NQ // 128, 128)
        l2 = lanes.reshape(NQ // 128, 128)
        return jax.jit(lambda: f(r2, l2, tab))

    for S in (8, 16, 32, 64):
        f = make(S)
        out = f()
        _ = float(np.asarray(out[0, 0]))           # compile+warm
        t0 = time.monotonic()
        iters = 5
        for _ in range(iters):
            out = f()
        _ = float(np.asarray(out[0, 0]))
        dt = (time.monotonic() - t0) / iters
        rate = NQ * KK / dt
        print(f"S={S:3d}: {dt*1e3:8.2f} ms  {rate/1e9:6.2f} G lookups/s",
              flush=True)


if __name__ == "__main__":
    main()
