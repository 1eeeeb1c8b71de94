"""Host-side global-mode graph selection (engine._global_step_for) and
the dryrun's IMPL_OVERRIDE hygiene."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mcl_3dl_tpu.config import Params
from mcl_3dl_tpu.engine import MCL3DL


def test_global_step_bucket_selection():
    """Buckets follow the reference's point ramp (num_points *
    num_particles / n_active, floored at num_points_global) rounded up
    to a power-of-two slot count, capped at the full budget."""
    eng = MCL3DL(Params(num_particles=64))
    lp = eng.params.likelihood
    assert (lp.num_points, lp.num_points_global) == (96, 8)

    def k_for(n):
        step = eng._global_step_for(n)
        # jit(partial(...)) — recover the static slot count from cache
        for k, s in eng._step_global_cache.items():
            if s is step:
                return k
        raise AssertionError("step not cached")

    # huge count -> ramp below the floor -> floor bucket
    assert k_for(100_000) == 8
    # ramp 96*64/1000 = 6 -> floor 8
    assert k_for(1000) == 8
    # ramp 96*64/300 = 20 -> bucket 32
    assert k_for(300) == 32
    # ramp 96*64/80 = 76 -> bucket capped at num_points (96)
    assert k_for(80) == 96
    # caching: same bucket returns the same jit object
    assert eng._global_step_for(100_000) is eng._global_step_for(90_000)


def test_global_graph_runs_with_bucketed_slots():
    """A seeded global-mode state runs through the bucketed graph and
    produces finite results with the beam dropped (tier -1)."""
    import jax

    from worlds import make_room, simulate_scan

    eng = MCL3DL(Params(num_particles=64, use_beam_model=True))
    room = make_room(grid=0.15)
    eng.load_map(room)
    n = eng.global_localization()
    assert n > 64 and eng._n_active_host == n
    scan = simulate_scan(room, np.array([1.0, 0.5, 0.5], np.float32),
                         np.array([0, 0, 0, 1], np.float32),
                         n_rays=128, seed=0)
    res = eng.measure_direct(scan, np.zeros((1, 3), np.float32),
                             np.zeros(len(scan), np.int32), 0.1)
    assert res is not None
    assert np.isfinite(np.asarray(res.raw_pos)).all()
    # host mirror tracked the in-step decay
    assert eng._n_active_host == int(eng.pstate.n_active)
