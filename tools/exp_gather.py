"""On-chip gather-primitive microbenchmarks (design experiments).

Everything hot in this framework is gather-bound (BENCH_NOTES.md): XLA's
TPU gather lowering retires ~117M gather-ops/s regardless of table size,
dtype, or locality.  This script measures what the alternatives actually
deliver on the real chip:

  A. XLA flat gather, uint8 table (re-confirm baseline)
  B. XLA flat gather, uint16 table (pair-packing: 2 cells per op)
  C. Pallas lane-dim take_along_axis, f32 [R,128] (VPU gather rate)
  D. Pallas wide-lane take_along_axis, f32 table [R,512], idx [R,128]
  E. Pallas two-stage gather from a shared 1024-entry table
     (8 lane-gathers + selects per [8,128] query vreg)
  F. Pallas lane take_along_axis on uint8 (risky)
  G. Pallas sublane (axis=0) take_along_axis retest (known to crash —
     runs last, isolated)

Timing through the axon relay: block_until_ready lies, so every
experiment chains iterations through a scalar offset and fetches the
final scalar (see CLAUDE.md / bench.py).
"""

import functools
import sys
import time

import numpy as np


def log(msg):
    print(msg, flush=True)


def run_chain(name, step, state, iters=4):
    """step: jitted (off, *const) -> off. Chains through `off`."""
    t0 = time.monotonic()
    off = step(state)
    _ = float(np.asarray(off))
    log(f"  [{name}] compile+first: {time.monotonic() - t0:.1f}s")
    t0 = time.monotonic()
    o = off
    for _ in range(iters):
        o = step(o)
    _ = float(np.asarray(o))
    dt = (time.monotonic() - t0) / iters
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    Q = 1 << 24                       # 16M queries
    R, L = Q // 128, 128

    # ---------- A: XLA u8 flat gather ----------
    T = 1 << 22
    tab_u8 = jnp.asarray(rng.integers(0, 255, T, dtype=np.uint8))
    idx_flat = jnp.asarray(rng.integers(0, T, Q, dtype=np.int32))

    def xla_gather(off, tab, idx, mask):
        i = (idx + off) & mask
        out = jnp.take(tab, i, axis=0)
        return out[:8].astype(jnp.int32).sum()

    try:
        f = jax.jit(functools.partial(
            xla_gather, tab=tab_u8, idx=idx_flat, mask=T - 1))
        dt = run_chain("A:xla-u8", f, jnp.int32(0))
        log(f"A xla u8 gather: {dt*1e3:.1f} ms -> {Q/dt/1e6:.0f} M ops/s")
    except Exception as e:
        log(f"A FAILED: {type(e).__name__}: {e}")

    # ---------- B: XLA u16 flat gather (pair packing) ----------
    tab_u16 = jnp.asarray(rng.integers(0, 1 << 16, T, dtype=np.uint16))
    try:
        f = jax.jit(functools.partial(
            xla_gather, tab=tab_u16, idx=idx_flat, mask=T - 1))
        dt = run_chain("B:xla-u16", f, jnp.int32(0))
        log(f"B xla u16 gather: {dt*1e3:.1f} ms -> {Q/dt/1e6:.0f} M ops/s "
            f"(= {2*Q/dt/1e6:.0f} M cells/s packed)")
    except Exception as e:
        log(f"B FAILED: {type(e).__name__}: {e}")

    # ---------- C: Pallas lane take_along_axis f32 ----------
    BR = 256
    tab2 = jnp.asarray(rng.standard_normal((R, L)), jnp.float32)
    idx2 = jnp.asarray(rng.integers(0, L, (R, L), dtype=np.int32))

    def lane_kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

    def pallas_lane(off, tab, idx):
        i = (idx + off) % L
        out = pl.pallas_call(
            lane_kernel,
            out_shape=jax.ShapeDtypeStruct((R, L), tab.dtype),
            grid=(R // BR,),
            in_specs=[
                pl.BlockSpec((BR, L), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BR, L), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BR, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(tab, i)
        return out[0, :8].astype(jnp.int32).sum()

    try:
        f = jax.jit(functools.partial(pallas_lane, tab=tab2, idx=idx2))
        dt = run_chain("C:pl-lane-f32", f, jnp.int32(0))
        log(f"C pallas lane f32: {dt*1e3:.1f} ms -> {Q/dt/1e6:.0f} M ops/s")
    except Exception as e:
        log(f"C FAILED: {type(e).__name__}: {e}")

    # ---------- D: Pallas wide-lane table [R, 512] ----------
    W = 512
    RW = Q // 128
    tab_w = jnp.asarray(rng.standard_normal((RW, W)), jnp.float32)
    idx_w = jnp.asarray(rng.integers(0, W, (RW, 128), dtype=np.int32))

    def wide_kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

    def pallas_wide(off, tab, idx):
        i = (idx + off) % W
        out = pl.pallas_call(
            wide_kernel,
            out_shape=jax.ShapeDtypeStruct((RW, 128), tab.dtype),
            grid=(RW // 128,),
            in_specs=[
                pl.BlockSpec((128, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((128, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(tab, i)
        return out[0, :8].astype(jnp.int32).sum()

    try:
        f = jax.jit(functools.partial(pallas_wide, tab=tab_w, idx=idx_w))
        dt = run_chain("D:pl-wide512", f, jnp.int32(0))
        log(f"D pallas wide-lane 512: {dt*1e3:.1f} ms -> {Q/dt/1e6:.0f} M ops/s")
    except Exception as e:
        log(f"D FAILED: {type(e).__name__}: {e}")

    # ---------- E: Pallas two-stage shared 1024-entry table ----------
    tab_s = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
    BR2 = 512

    def twostage_kernel(tab_ref, idx_ref, out_ref):
        t = tab_ref[:]                       # [8, 128]
        ii = idx_ref[:]                      # [BR2, 128] in [0, 1024)
        lane = ii & 127
        sub = ii >> 7
        out = jnp.zeros(ii.shape, jnp.float32)
        for s in range(8):
            rowb = jnp.broadcast_to(t[s, :][None, :], ii.shape)
            v = jnp.take_along_axis(rowb, lane, axis=1)
            out = jnp.where(sub == s, v, out)
        out_ref[:] = out

    def pallas_two(off, tab, idx):
        i = (idx + off) % 1024
        out = pl.pallas_call(
            twostage_kernel,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            grid=(R // BR2,),
            in_specs=[
                pl.BlockSpec((8, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BR2, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BR2, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(tab, i)
        return out[0, :8].astype(jnp.int32).sum()

    idx_s = jnp.asarray(rng.integers(0, 1024, (R, 128), dtype=np.int32))
    try:
        f = jax.jit(functools.partial(pallas_two, tab=tab_s, idx=idx_s))
        dt = run_chain("E:pl-two-stage", f, jnp.int32(0))
        log(f"E pallas two-stage 1k-table: {dt*1e3:.1f} ms -> "
            f"{Q/dt/1e6:.0f} M ops/s")
    except Exception as e:
        log(f"E FAILED: {type(e).__name__}: {e}")

    # ---------- F: Pallas lane take_along_axis uint8 ----------
    tab_u = jnp.asarray(rng.integers(0, 255, (R, L), dtype=np.uint8))

    def lane_kernel_u8(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

    def pallas_lane_u8(off, tab, idx):
        i = (idx + off) % L
        out = pl.pallas_call(
            lane_kernel_u8,
            out_shape=jax.ShapeDtypeStruct((R, L), jnp.uint8),
            grid=(R // BR,),
            in_specs=[
                pl.BlockSpec((BR, L), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BR, L), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BR, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(tab, i)
        return out[0, :8].astype(jnp.int32).sum()

    try:
        f = jax.jit(functools.partial(pallas_lane_u8, tab=tab_u, idx=idx2))
        dt = run_chain("F:pl-lane-u8", f, jnp.int32(0))
        log(f"F pallas lane u8: {dt*1e3:.1f} ms -> {Q/dt/1e6:.0f} M ops/s")
    except Exception as e:
        log(f"F FAILED: {type(e).__name__}: {e}")

    # ---------- G: sublane gather retest (crashes historically) ----------
    if "--risky" in sys.argv:
        def sub_kernel(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

        def pallas_sub(off, tab, idx):
            i = (idx + off) % 128
            out = pl.pallas_call(
                sub_kernel,
                out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
                in_specs=[
                    pl.BlockSpec((128, 128), memory_space=pltpu.VMEM),
                    pl.BlockSpec((128, 128), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((128, 128), memory_space=pltpu.VMEM),
            )(tab, i)
            return out[0, :8].astype(jnp.int32).sum()

        t_small = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)
        i_small = jnp.asarray(
            rng.integers(0, 128, (128, 128), dtype=np.int32))
        try:
            f = jax.jit(functools.partial(pallas_sub, tab=t_small,
                                          idx=i_small))
            dt = run_chain("G:pl-sublane", f, jnp.int32(0))
            log(f"G pallas sublane: {dt*1e3:.3f} ms (worked!)")
        except Exception as e:
            log(f"G FAILED: {type(e).__name__}: {e}")

    log("done")


if __name__ == "__main__":
    main()
