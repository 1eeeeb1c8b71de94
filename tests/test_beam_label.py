"""Engine-level semi-transparent wall test (mirror test_beam_label.cpp:
206-230): map points with label > filter_label_max are transparent to
the beam model's rays, so a labeled wall between the robot and the real
wall must not penalize beams."""

import numpy as np
import jax.numpy as jnp

from mcl_3dl_tpu.config import BeamParams, Params
from mcl_3dl_tpu.map.map_data import MapData
from mcl_3dl_tpu.math import quat as mq
from mcl_3dl_tpu.models.beam import BeamStatus, beam_measure


def _wall(x, half=3.0, grid=0.1):
    ys = np.arange(-half, half + grid / 2, grid)
    zs = np.arange(-1.0, 1.0 + grid / 2, grid)
    gy, gz = np.meshgrid(ys, zs, indexing="ij")
    return np.stack([np.full(gy.size, x), gy.ravel(), gz.ravel()], axis=1)


def _world_with_labeled_wall():
    solid = _wall(3.0)                        # real wall, label 0
    ghost = _wall(1.5)                        # semi-transparent, label 10
    back = _wall(-4.0)                        # encloses the origin
    pts = np.concatenate([solid, ghost, back])
    labels = np.concatenate([
        np.zeros(len(solid), np.uint32),
        np.full(len(ghost), 10, np.uint32),
        np.zeros(len(back), np.uint32),
    ])
    return pts, labels


def _measure(params, pts, labels, use_dda):
    m = MapData.build(pts, params, labels, downsample=False)
    scan = jnp.asarray([[3.0, 0.0, 0.0]], jnp.float32)  # endpoint: real wall
    lik, _, status = beam_measure(
        m.df_beam, m.occ,
        jnp.zeros((1, 3), jnp.float32), mq.identity()[None, :],
        scan, jnp.zeros(1, jnp.int32), jnp.ones(1, bool),
        jnp.zeros((1, 3), jnp.float32),
        use_dda=use_dda, map_grid_min=0.1, map_grid_max=0.1,
        hit_range=0.3, beam_likelihood_min=0.2, num_points_default=1,
        sin_total_ref=0.5,
        filter_label_max=params.beam.filter_label_max,
        add_penalty_short_only_mode=True, num_steps=64,
    )
    return float(lik[0]), int(status[0, 0])


def test_labeled_wall_transparent_df_mode():
    pts, labels = _world_with_labeled_wall()
    # transparent: labels > 5 invisible to rays
    p_t = Params(beam=BeamParams(filter_label_max=5))
    lik, status = _measure(p_t, pts, labels, use_dda=False)
    assert status == BeamStatus.HIT
    assert abs(lik - 1.0) < 1e-6
    # opaque: the ghost wall blocks the ray -> SHORT
    p_o = Params()
    lik2, status2 = _measure(p_o, pts, labels, use_dda=False)
    assert status2 == BeamStatus.SHORT
    assert abs(lik2 - 0.2) < 1e-6


def test_labeled_wall_transparent_dda_mode():
    pts, labels = _world_with_labeled_wall()
    p_t = Params(beam=BeamParams(filter_label_max=5, use_raycast_using_dda=True))
    lik, status = _measure(p_t, pts, labels, use_dda=True)
    assert status == BeamStatus.HIT
    p_o = Params(beam=BeamParams(use_raycast_using_dda=True))
    lik2, status2 = _measure(p_o, pts, labels, use_dda=True)
    assert status2 == BeamStatus.SHORT


def test_df_beam_shared_when_no_filtering():
    pts, labels = _world_with_labeled_wall()
    m = MapData.build(pts, Params(), labels, downsample=False)
    assert m.df_beam is m.df  # default filter_label_max admits everything
    m2 = MapData.build(
        pts, Params(beam=BeamParams(filter_label_max=5)), labels,
        downsample=False,
    )
    assert m2.df_beam is not m2.df
