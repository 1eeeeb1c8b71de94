"""Discrete first-order LPF/HPF (reference: include/mcl_3dl/filter.h).

The reference's ``Filter`` is a bilinear-transform first-order filter with
an optional angle mode that wraps the input to within pi of the current
output (filter.h:85-88).  Here the filter is a small pytree
(``FilterState``) carried through the jitted engine step; each state can
be scalar or a vector (``filter_vec3.h`` is just the vector case with a
per-component ``angle`` flag).

Coefficient derivation matches filter.h:54-75 exactly:

LPF:  k3 = -1/(1+2T), k2 = -k3, k1 = (1-2T)k3, k0 = -k1 - 1
HPF:  k3 = -1/(1+2T), k2 = -2T k3, k1 = (1-2T)k3, k0 = 2T(-k1 + 1)
x0 for output out0:  x = (1 - k2) * out0 / k3
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class FilterState(NamedTuple):
    k: jnp.ndarray        # [4] or [..., 4] coefficients
    x: jnp.ndarray        # internal state
    out: jnp.ndarray      # last output
    angle: jnp.ndarray    # bool mask, broadcastable to x


def _init(k0, k1, k2, k3, out0, angle):
    out0 = jnp.asarray(out0, dtype=jnp.float32)
    k = jnp.broadcast_to(
        jnp.stack(
            [jnp.asarray(k0, jnp.float32), jnp.asarray(k1, jnp.float32),
             jnp.asarray(k2, jnp.float32), jnp.asarray(k3, jnp.float32)],
            axis=-1,
        ),
        out0.shape + (4,),
    )
    x = (1.0 - k[..., 2]) * out0 / k[..., 3]
    return FilterState(k=k, x=x, out=out0,
                       angle=jnp.broadcast_to(jnp.asarray(angle), out0.shape))


def lpf_init(time_const, out0=0.0, angle=False) -> FilterState:
    """Low-pass filter (filter.h:60-66)."""
    t = jnp.asarray(time_const, jnp.float32)
    k3 = -1.0 / (1.0 + 2.0 * t)
    k2 = -k3
    k1 = (1.0 - 2.0 * t) * k3
    k0 = -k1 - 1.0
    return _init(k0, k1, k2, k3, out0, angle)


def hpf_init(time_const, out0=0.0, angle=False) -> FilterState:
    """High-pass filter (filter.h:67-73)."""
    t = jnp.asarray(time_const, jnp.float32)
    k3 = -1.0 / (1.0 + 2.0 * t)
    k2 = -k3 * 2.0 * t
    k1 = (1.0 - 2.0 * t) * k3
    k0 = 2.0 * t * (-k1 + 1.0)
    return _init(k0, k1, k2, k3, out0, angle)


def filter_set(state: FilterState, out0) -> FilterState:
    """Reset the filter output to ``out0`` (filter.h:76-80)."""
    out0 = jnp.broadcast_to(jnp.asarray(out0, jnp.float32), state.out.shape)
    x = (1.0 - state.k[..., 2]) * out0 / state.k[..., 3]
    return state._replace(x=x, out=out0)


def filter_step(state: FilterState, value):
    """Feed one sample; returns ``(new_state, output)`` (filter.h:81-94).

    In angle mode the input is unwrapped relative to the current output:
    ``in' = out + remainder(in - out, 2*pi)`` (filter.h:85-88).
    """
    value = jnp.broadcast_to(jnp.asarray(value, jnp.float32), state.out.shape)
    two_pi = 2.0 * jnp.pi
    # C remainder(): result in [-pi, pi] with round-to-nearest quotient.
    wrapped = state.out + (value - state.out) - two_pi * jnp.round(
        (value - state.out) / two_pi
    )
    v = jnp.where(state.angle, wrapped, value)
    x = state.k[..., 0] * v + state.k[..., 1] * state.x
    out = state.k[..., 2] * v + state.k[..., 3] * x
    return state._replace(x=x, out=out), out
