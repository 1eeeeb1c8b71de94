"""Flagship-configuration smoke test.

Both the r2 and r3 end-of-round snapshots shipped a regression on the
1M-particle flagship bench path that only surfaced when `bench.py` ran
on the chip (VERDICT r3).  This test traces the EXACT flagship
configuration on CPU — the fused ``_measurement_step`` with
``fast=True`` (interp=nearest → grouped likelihood Pallas tier) and the
grouped fixed-march beam kernel, interpret mode — at a small particle
count, and asserts both grouped tiers actually engaged (tier 0/0).
Any kernel-signature or orchestration drift on the bench path fails
here in seconds instead of at the end of the round.
"""

import pathlib
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


@pytest.mark.slow
def test_flagship_step_grouped_tiers_engage():
    import __graft_entry__ as ge
    from mcl_3dl_tpu.ops.grouped import TILE

    eng, args = ge._build_engine_and_inputs(
        num_particles=2 * TILE, cloud_points=512, seed=0, fast=True)
    # Converged-tracking spread (the bench reaches this after warmup;
    # seed it directly so one step suffices for the envelopes to fit).
    eng.initial_pose(
        np.zeros(3), np.asarray([0.0, 0.0, 0.0, 1.0]),
        np.diag([0.02**2, 0.02**2, 0.02**2, 0.01**2, 0.01**2, 0.02**2]),
    )
    args = (eng.pstate,) + args[1:]

    out = jax.jit(eng._measurement_step)(*args)
    jax.block_until_ready(out)
    aux = jax.device_get(out[-1])

    assert np.isfinite(aux["e_pos"]).all()
    assert int(aux["tier_like"]) == 0, (
        "grouped likelihood tier did not engage on the flagship config")
    assert int(aux["tier_beam"]) == 0, (
        "grouped beam tier did not engage on the flagship config")
