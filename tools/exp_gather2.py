"""Chip experiment: can Mosaic do a full 2D (row+lane) gather, and how fast?

Formulations tested on a [128,128] f32 VMEM table, 16M queries:
  A. XLA baseline: jnp.take from 16k-entry table
  B. Pallas fancy-index tab[r, l]
  C. Pallas take_along_axis axis=0 (sublane)
  D. Pallas transpose trick: lane-gather T^T by row idx, transpose, lane-gather
  E. Pallas row-loop select (current local_score scheme), R=128
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import __graft_entry__ as ge
ge._enable_compile_cache()

Q = 1 << 24
BQ = 512
nb = Q // (BQ * 128)
rng = np.random.default_rng(0)
tab_np = rng.random((128, 128), np.float32)
idx_np = rng.integers(0, 128 * 128, (nb, BQ, 128), dtype=np.int32)
tab = jnp.asarray(tab_np)
idx = jnp.asarray(idx_np)

def timeit(name, fn, *a):
    try:
        out = fn(*a)
        s = float(np.asarray(out if out.ndim == 0 else out.ravel()[0]))
        t0 = time.monotonic()
        reps = 5
        o = a
        acc = None
        for i in range(reps):
            out = fn(*a)
            s += float(np.asarray(out.ravel()[0]))  # force fetch each rep (chains? no)
        dt = (time.monotonic() - t0) / reps
        print(f"{name}: {dt*1e3:.1f} ms -> {Q/dt/1e9:.2f} G lookups/s  (check {s:.3f})", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)

# A. XLA baseline
@jax.jit
def xla_gather(tab, idx):
    return jnp.take(tab.reshape(-1), idx, axis=0).sum(axis=(1, 2))

# B. fancy index
def k_fancy(t_ref, i_ref, o_ref):
    ii = i_ref[0]
    o_ref[...] = t_ref[ii >> 7, ii & 127]
def mk(kern):
    @jax.jit
    def f(tab, idx):
        return pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[pl.BlockSpec((128, 128), lambda b: (0, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, BQ, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BQ, 128), lambda b: (b * BQ, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb * BQ, 128), jnp.float32),
        )(tab, idx)
    return f

# C. take_along_axis axis=0: gather rows by per-(i,j) row index
def k_sublane(t_ref, i_ref, o_ref):
    ii = i_ref[0]
    row = ii >> 7
    # out[i,j] = tab[row[i,j], j]
    v = jnp.take_along_axis(t_ref[...], row, axis=0)
    o_ref[...] = v

# D. transpose trick: needs table transposed [128(lanes->rows), 128(rows->lanes)]
def k_transpose(t_ref, i_ref, o_ref):
    ii = i_ref[0]            # [BQ, 128]
    tt = t_ref[...].T        # [128, 128]: tt[l, r] = tab[r, l]
    def chunk(c, _):
        iic = ii[pl.ds(c * 128, 128), :]       # [128,128]
        row = iic >> 7
        lane = iic & 127
        # step1: for query block arranged [128q, 128]: want out[q,l128] = tab[row(q,?)...]
        # process one query-row at a time? do [128,128]: rows_b[l, q] = tt[l, row_flat[q]]
        # need row as [128, 128] idx along last dim of tt
        # take queries column-major: treat iic as 128x128, gather per output elem:
        g1 = jnp.take_along_axis(jnp.broadcast_to(tt[:, :], (128, 128)), row, axis=1)  # wrong semantics probe
        o_ref[pl.ds(c * 128, 128), :] = g1
        return _
    jax.lax.fori_loop(0, BQ // 128, chunk, 0)

# E. row-loop (current scheme) R=128
def k_rowloop(t_ref, i_ref, o_ref):
    ii = i_ref[0]
    lane = ii & 127
    row = ii >> 7
    def body(r, d):
        rowv = t_ref[pl.ds(r, 1), :]
        rowb = jnp.broadcast_to(rowv, ii.shape)
        v = jnp.take_along_axis(rowb, lane, axis=1)
        return jnp.where(row == r, v, d)
    o_ref[...] = jax.lax.fori_loop(0, 128, body, jnp.zeros(ii.shape, jnp.float32))

print("devices:", jax.devices(), flush=True)
timeit("A.xla_take_16k", xla_gather, tab, idx)
timeit("B.fancy2d", mk(k_fancy), tab, idx)
timeit("C.sublane_taa", mk(k_sublane), tab, idx)
timeit("E.rowloop128", mk(k_rowloop), tab, idx)
