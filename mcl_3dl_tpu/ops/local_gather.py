"""Pallas two-stage local-table gather + likelihood score kernel.

Why this exists (measured on v5e, tools/exp_gather.py):

* XLA's TPU gather lowering retires ~117M gather-ops/s, flat in table
  size/dtype/locality — the likelihood model's ``[particles x points]``
  nearest-distance lookups (96M ops at 1M particles) cost ~0.8 s.
* Mosaic's lane-dimension ``take_along_axis`` runs at ~2.7G ops/s, and a
  two-stage (row-select + lane-gather) scheme over a small VMEM table
  sustains ~2.5G ops/s — 20x XLA.

The trick: Mosaic can only gather along the 128-lane dimension, so
arbitrary table indexing is decomposed as ``idx = row * 128 + lane``; the
kernel loops rows, broadcasting each table row across sublanes, lane-
gathers, and selects where ``row`` matches.  That bounds the table to a
few-thousand entries — fine, because converged-filter queries cluster:
for a fixed scan point, all particle-transformed copies land in a small
axis-aligned box of distance-field cells.  The caller extracts one local
box table per scan point (cheap: K x box cells XLA gathers) and this
kernel evaluates the full ``[points, particles]`` score at VPU rate.

Used by models/likelihood.py for the nearest-cell sampling mode
(lidar_measurement_model_likelihood.cpp:124-135 scoring semantics,
fused: matched mask, flat-floor clamp, per-particle sum + match count).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_bq(nrows: int) -> int:
    for c in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if nrows % c == 0:
            return c
    return 1


def _score_kernel(tab_ref, idx_ref, score_ref, match_ref, *,
                  n_rows, trunc, mdm, mdf, mw):
    k = pl.program_id(1)
    ii = idx_ref[0]                       # [BQ, 128] int32 in [0, n_rows*128)
    lane = ii & 127
    row = ii >> 7

    def body(r, d):
        rowv = tab_ref[0, pl.ds(r, 1), :]            # [1, 128]
        rowb = jnp.broadcast_to(rowv, ii.shape)
        v = jnp.take_along_axis(rowb, lane, axis=1)
        return jnp.where(row == r, v, d)

    d = jax.lax.fori_loop(
        0, n_rows, body, jnp.full(ii.shape, trunc, jnp.float32)
    )

    matched = d <= mdm
    contrib = jnp.maximum(mw * (mdm - jnp.maximum(d, mdf)), 0.0)
    contrib = jnp.where(matched, contrib, 0.0)

    @pl.when(k == 0)
    def _():
        score_ref[...] = jnp.zeros_like(score_ref)
        match_ref[...] = jnp.zeros_like(match_ref)

    score_ref[...] += contrib
    match_ref[...] += matched.astype(jnp.float32)


def _emulate_local_score(tables, lidx, *, match_dist_min, match_dist_flat,
                         match_weight, trunc):
    """Vectorized pure-JAX re-statement of ``_score_kernel`` (the CPU
    default — see ops/grouped._resolve_impl).  Same per-element f32 ops
    and the same sequential accumulation order over the K points as the
    kernel's grid-k accumulation, so results are bit-equal."""
    K, R, L = tables.shape
    N = lidx.shape[1]
    tab2 = tables.reshape(K, R * L)

    def body(k, carry):
        acc, mac = carry
        d = jnp.take(tab2[k], lidx[k], axis=0)               # [N]
        matched = d <= match_dist_min
        contrib = jnp.maximum(
            match_weight * (match_dist_min - jnp.maximum(d, match_dist_flat)),
            0.0)
        contrib = jnp.where(matched, contrib, 0.0)
        return acc + contrib, mac + matched.astype(jnp.float32)

    zero = jnp.zeros((N,), jnp.float32)
    return jax.lax.fori_loop(0, K, body, (zero, zero))


@functools.partial(
    jax.jit, static_argnames=("match_dist_min", "match_dist_flat",
                              "match_weight", "trunc", "impl")
)
def local_score(
    tables: jnp.ndarray,        # [K, R, 128] f32 local distance tables
    lidx: jnp.ndarray,          # [K, N] int32 local flat cell index
    *,
    match_dist_min: float,
    match_dist_flat: float,
    match_weight: float,
    trunc: float,
    impl: str | None = None,
):
    """Fused likelihood scoring over ``[K points, N particles]``.

    Per (k, n): d = tables[k][lidx[k, n]]; matched = d <= match_dist_min;
    contribution = max(match_weight * (match_dist_min - max(d,
    match_dist_flat)), 0) when matched.  Returns ``(score[N],
    match_count[N])`` summed over k.  Point validity is folded into the
    tables by the caller (invalid point => all-``trunc`` table => no
    match, zero contribution).
    """
    from mcl_3dl_tpu.ops.grouped import _resolve_impl

    K, R, L = tables.shape
    assert L == 128
    _, N = lidx.shape
    assert N % 128 == 0
    impl = _resolve_impl(impl)
    if impl == "emulate":
        return _emulate_local_score(
            tables, lidx, match_dist_min=float(match_dist_min),
            match_dist_flat=float(match_dist_flat),
            match_weight=float(match_weight), trunc=float(trunc))
    nrows = N // 128
    bq = _pick_bq(nrows)
    nb = nrows // bq
    idx3 = lidx.reshape(K, nrows, 128)

    kern = functools.partial(
        _score_kernel, n_rows=R, trunc=float(trunc),
        mdm=float(match_dist_min), mdf=float(match_dist_flat),
        mw=float(match_weight),
    )
    score, match = pl.pallas_call(
        kern,
        grid=(nb, K),
        in_specs=[
            pl.BlockSpec((1, R, 128), lambda nb, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 128), lambda nb, k: (k, nb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq, 128), lambda nb, k: (nb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 128), lambda nb, k: (nb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nrows, 128), jnp.float32),
            jax.ShapeDtypeStruct((nrows, 128), jnp.float32),
        ],
        interpret=impl == "interpret",
    )(tables, idx3)
    return score.reshape(N), match.reshape(N)
