"""MCL engine (reference layer L6: src/mcl_3dl.cpp, class MCL3dlNode).

The ROS node's callback spaghetti becomes a host-side shell around a few
fused, jit-compiled device steps:

* :meth:`MCL3DL.odometry`   — cbOdom (src/mcl_3dl.cpp:200-247)
* :meth:`MCL3DL.imu`        — cbImu (:941-1018)
* :meth:`MCL3DL.push_cloud` — cbCloud + accumulation (:248-302)
* the **measurement step**  — measure() (:304-898), one jit-compiled
  graph covering scan clipping/sampling, both LIDAR models, the
  odometry-error prior, weight update + rollback, bias, pose
  expectation, jump detection, TF smoothing, covariance, convergence
  classification, resampling, noise redraw, expansion resetting, and
  global-localization particle decay — zero host round-trips inside.
* services — initialpose (:155-198), landmark (:899-940), resize
  (:1019-1025), expansion reset (:1026-1038), global localization
  (:1039-1099), load map (:127-140, :1150-1192), map update merge
  (:1350-1378).

Dynamic particle counts use fixed-capacity arrays + an active count, so
the hot step never recompiles; capacity itself grows/shrinks in
power-of-two buckets on the host (one compile per bucket, cached).
"""

from __future__ import annotations

import math
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P_spec

from mcl_3dl_tpu import pf
from mcl_3dl_tpu import state as st
from mcl_3dl_tpu.cloud_accum import CloudAccumulation, CloudAccumulationPassThrough
from mcl_3dl_tpu.config import Params
from mcl_3dl_tpu.map.map_data import MapData
from mcl_3dl_tpu.map.voxel import voxel_downsample
from mcl_3dl_tpu.math import filters as mf
from mcl_3dl_tpu.math import quat as mq
from mcl_3dl_tpu.math import quat_np as mqn
from mcl_3dl_tpu.math.nd import NormalLikelihoodNd, normal_likelihood
from mcl_3dl_tpu.models.beam import (BeamVirtualPoints, beam_measure,
                                     beam_measure_grouped)
from mcl_3dl_tpu.ops import grouped as og
from mcl_3dl_tpu.ops.grouped import TILE as _GTILE
from mcl_3dl_tpu.models.imu_gravity import imu_gravity_likelihood
from mcl_3dl_tpu.models.likelihood import clip_mask, likelihood_measure
from mcl_3dl_tpu.models.motion import (
    OdomDelta,
    predict_differential_drive,
    reset_error_integrals,
)
from mcl_3dl_tpu.models.samplers import (
    estimate_normals_host,
    sample_uniform,
    sample_weighted_without_replacement,
    sampler_with_normal_weights,
)
from mcl_3dl_tpu.state import ParticleState
from mcl_3dl_tpu.status import (
    ConvergenceStatus,
    Diagnostics,
    ErrorCode,
    FilterStatus,
    MeasureResult,
    Status,
)


def _tree_where(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def _bucket(n: int, base: int = 64) -> int:
    """Round up to a power-of-two capacity bucket (compile-count bound)."""
    c = max(base, 1)
    while c < n:
        c *= 2
    return c


class MCL3DL:
    """TPU-native 6-DOF Monte Carlo localizer."""

    def __init__(self, params: Optional[Params] = None, capacity: Optional[int] = None):
        self.params = params or Params()
        p = self.params
        self._base_capacity = _bucket(p.num_particles)
        self._key = jax.random.PRNGKey(p.seed)
        # Local-table Pallas scoring for nearest-cell sampling (see
        # models/likelihood.py).  Sharding/fleet wrappers flip this off
        # before tracing: pallas_call does not GSPMD-partition.
        self._local_kernel_ok = True

        # pf_->init with the initial pose (src/mcl_3dl.cpp:1272-1276)
        mean_pos, mean_rpy = p.initial_pose_mean
        self.pstate = st.init_diagonal(
            self._next_key(),
            capacity or self._base_capacity,
            p.num_particles,
            jnp.asarray(mean_pos, jnp.float32),
            jnp.asarray(mean_rpy, jnp.float32),
            jnp.asarray(p.initial_pose_sigma, jnp.float32),
        )

        # output / accel smoothing filters (src/mcl_3dl.cpp:1278-1289)
        self.f_pos = mf.lpf_init(p.lpf_step, jnp.zeros(3))
        self.f_ang = mf.lpf_init(p.lpf_step, jnp.zeros(3), angle=True)
        self.f_acc = mf.lpf_init(p.acc_lpf_step, jnp.zeros(3))
        self.localize_rate = mf.lpf_init(5.0, 0.0)  # :1300

        if p.accum_cloud == 0:
            self.accum = CloudAccumulationPassThrough()
        else:
            self.accum = CloudAccumulation(p.accum_cloud, p.total_accum_cloud_max)

        self.map: Optional[MapData] = None
        self.has_map = False
        self.has_odom = False
        self.has_imu = False
        self.odom_pos = np.zeros(3, np.float32)
        self.odom_rot = np.array([0, 0, 0, 1], np.float32)
        self.odom_prev_pos = np.zeros(3, np.float32)
        self.odom_prev_rot = np.array([0, 0, 0, 1], np.float32)
        self.odom_last: float = 0.0
        self.imu_last: float = 0.0
        self.imu_quat = np.array([0, 0, 0, 1], np.float32)

        self.state_prev_pos = jnp.asarray(mean_pos, jnp.float32)
        self.state_prev_rot = mq.from_rpy(jnp.asarray(mean_rpy, jnp.float32))
        # TF smoothers start at the identity transform (mcl_3dl.cpp:
        # 1278-1285 does the same); re-seeded with a consistent
        # map->odom at the first measurement once odometry exists
        self._tf_seeded = False

        self.tf_tolerance_base = 0.0
        self.localized_last: float = 0.0
        self.global_localization_fix_cnt = 0
        self.cnt_measure = 0
        self.match_output_last = -1e18
        # pub_matched_/pub_unmatched_ stand-in: set a callback
        # (t, matched_points[M,3], unmatched_points[U,3], both map frame)
        # to receive the interval-throttled debug clouds
        # (src/mcl_3dl.cpp:762-805); None = "no subscribers", skipped.
        self.on_match_clouds = None
        self.status = Status()
        self.entropy = 0.0

        # accumulated scan (odom frame) — accumClear (:267-272)
        self._accum_points: list[np.ndarray] = []
        self._accum_origins: list[np.ndarray] = []
        self._accum_odom: list = []
        self._accum_stamps: list = []
        self._last_scan_base: Optional[np.ndarray] = None
        self._pc_all_accum: list[np.ndarray] = []

        # one jit object for the fused step; jit's own cache re-traces
        # per (capacity, cloud bucket, n_origins) shape combination.
        # Recreated on map load/update to drop stale compilations.
        # The global-mode twin compiles the num_points_global-sized
        # specialization (see _measurement_step global_mode); the host
        # picks between them from the particle count.
        self._step = jax.jit(self._measurement_step)
        self._step_global = jax.jit(
            partial(self._measurement_step, global_mode=True))
        self._step_global_cache = {}
        # host mirror of n_active for graph selection (avoids a device
        # fetch before every step; refreshed wherever n_active changes)
        self._n_active_host = p.num_particles
        self._predict_jit = jax.jit(
            partial(
                predict_differential_drive,
                odom_err_integ_lin_tc=p.odom_err_integ_lin_tc,
                odom_err_integ_ang_tc=p.odom_err_integ_ang_tc,
            )
        )
        self._imu_jit = jax.jit(self._imu_step)
        self._landmark_jit = jax.jit(self._landmark_step)
        self._resample_sigma = jnp.asarray(
            [p.resample_var_x, p.resample_var_y, p.resample_var_z,
             p.resample_var_roll, p.resample_var_pitch, p.resample_var_yaw],
            jnp.float32,
        )
        self._expansion_sigma = jnp.asarray(
            [p.expansion_var_x, p.expansion_var_y, p.expansion_var_z,
             p.expansion_var_roll, p.expansion_var_pitch, p.expansion_var_yaw],
            jnp.float32,
        )

    # ------------------------------------------------------------------ utils

    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def _grow_capacity(self, n: int) -> None:
        """Grow particle arrays to a bucket >= n (pads inactive slots)."""
        cap = self.pstate.capacity
        new_cap = _bucket(n, self._base_capacity)
        if new_cap <= cap:
            return
        pad = new_cap - cap
        s = self.pstate
        self.pstate = ParticleState(
            pos=jnp.pad(s.pos, ((0, pad), (0, 0))),
            rot=jnp.concatenate(
                [s.rot, jnp.broadcast_to(mq.identity(), (pad, 4))]
            ),
            odom_err_lin=jnp.pad(s.odom_err_lin, ((0, pad), (0, 0))),
            odom_err_ang=jnp.pad(s.odom_err_ang, ((0, pad), (0, 0))),
            noise=jnp.pad(s.noise, ((0, pad), (0, 0))),
            prob=jnp.pad(s.prob, (0, pad)),
            prob_bias=jnp.pad(s.prob_bias, (0, pad), constant_values=1.0),
            n_active=s.n_active,
        )

    def _maybe_shrink_capacity(self) -> None:
        """Compact back to the base bucket once global localization decays."""
        n = int(self.pstate.n_active)
        target = _bucket(n, self._base_capacity)
        if self.pstate.capacity > target:
            s = self.pstate
            self.pstate = jax.tree.map(
                lambda a: a[:target] if getattr(a, "ndim", 0) >= 1 else a, s
            )._replace(n_active=s.n_active)

    # ---------------------------------------------------------------- map I/O

    def load_map(self, points: np.ndarray, labels: Optional[np.ndarray] = None):
        """cbMapcloud / loadMapCloud (src/mcl_3dl.cpp:127-140, 1150-1170)."""
        self.map = MapData.build(points, self.params, labels)
        self.has_map = True
        self._accum_clear()
        self.accum.reset()
        self._step = jax.jit(self._measurement_step)
        self._step_global = jax.jit(
            partial(self._measurement_step, global_mode=True))
        self._step_global_cache = {}
        return self.map

    def update_map(self, points: np.ndarray, labels: Optional[np.ndarray] = None):
        """cbMapcloudUpdate + merge timer (src/mcl_3dl.cpp:141-153, 1350-1369).

        The update cloud is downsampled at the update leaf size and merged
        into the compiled map.
        """
        if self.map is None:
            return None
        p = self.params
        pts = np.asarray(points, np.float64).reshape(-1, 3)
        if labels is None:
            labels = np.zeros((pts.shape[0],), np.uint32)
        pts, attrs = voxel_downsample(
            pts,
            (p.update_downsample_x, p.update_downsample_y, p.update_downsample_z),
            attrs=np.asarray(labels, np.float64)[:, None],
        )
        self.map = self.map.merged_with(pts, np.round(attrs[:, 0]).astype(np.uint32))
        self._step = jax.jit(self._measurement_step)
        self._step_global = jax.jit(
            partial(self._measurement_step, global_mode=True))
        self._step_global_cache = {}
        return self.map

    # ------------------------------------------------------------- pose seeds

    def initial_pose(self, pos, rot, cov66) -> None:
        """initialpose re-seed (cbPosition, src/mcl_3dl.cpp:155-198)."""
        rot = np.asarray(rot, np.float64)
        if abs(float(np.sum(rot * rot)) - 1.0) > 0.1:
            raise ValueError("initialpose orientation must be a unit quaternion")
        rpy = mqn.to_rpy(rot)
        cap = self.pstate.capacity
        self.pstate = st.init_multivariate(
            self._next_key(), cap, self.params.num_particles,
            jnp.asarray(pos, jnp.float32), jnp.asarray(rpy, jnp.float32),
            jnp.asarray(cov66, jnp.float32),
        )
        self.pstate = reset_error_integrals(self.pstate)
        self._n_active_host = self.params.num_particles
        # state_prev_ is intentionally left alone: the next measurement
        # detects the re-seed as a pose jump and resets the TF smoothers
        # (src/mcl_3dl.cpp:155-198 never touches state_prev_).
        self._maybe_shrink_capacity()

    # ------------------------------------------------------------ odom / imu

    def odometry(self, pos, rot, t: float) -> None:
        """cbOdom (src/mcl_3dl.cpp:200-247)."""
        pos = np.asarray(pos, np.float32)
        rot = np.asarray(rot, np.float32)
        self.odom_pos, self.odom_rot = pos, rot
        if not self.has_odom:
            self.odom_prev_pos, self.odom_prev_rot = pos, rot
            self.odom_last = t
            self.has_odom = True
            return
        dt = t - self.odom_last
        if dt < 0.0 or dt > 5.0:
            self.has_odom = False
            return
        if dt > 0.05:
            delta = OdomDelta.from_poses(
                jnp.asarray(self.odom_prev_pos), jnp.asarray(self.odom_prev_rot),
                jnp.asarray(pos), jnp.asarray(rot), dt,
            )
            self.pstate = self._predict_jit(self.pstate, delta)
            self.odom_last = t
            self.odom_prev_pos, self.odom_prev_rot = pos, rot
        if self.params.fake_imu:
            accel = mqn.rotate(rot, np.array([0.0, 0.0, 1.0], np.float32))
            self.imu(accel, rot, t)

    def _imu_step(self, state: ParticleState, acc_measure):
        lik = imu_gravity_likelihood(state.rot, acc_measure, self.params.acc_var)
        new_state, _ = pf.measure(state, lik)
        return new_state

    def imu(self, acc, orientation, t: float) -> None:
        """cbImu (src/mcl_3dl.cpp:941-1018).

        ``acc`` and ``orientation`` must already be in the base_link frame
        (the replay adapter applies the static sensor transform the node
        gets from TF at :966-995).
        """
        self.f_acc, acc_f = mf.filter_step(self.f_acc, jnp.asarray(acc, jnp.float32))
        if not self.has_imu:
            self.f_acc = mf.filter_set(self.f_acc, jnp.zeros(3))
            self.imu_last = t
            self.has_imu = True
            return
        dt = t - self.imu_last
        if dt < 0.0 or dt > 5.0:
            self.has_imu = False
            return
        if dt > 0.05:
            acc_measure = acc_f / jnp.linalg.norm(acc_f)
            self.imu_quat = np.asarray(orientation, np.float32)
            self.pstate = self._imu_jit(self.pstate, acc_measure)
            self.imu_last = t
            if self.params.fake_odom:
                self.odometry(np.zeros(3, np.float32), self.imu_quat, t)

    # ----------------------------------------------------------- scan intake

    def _accum_clear(self) -> None:
        self._accum_points = []
        self._accum_origins = []
        self._accum_odom = []
        self._accum_stamps = []

    def push_cloud(
        self,
        frame_id: str,
        points_odom: np.ndarray,
        sensor_origin_odom: np.ndarray,
        t: float,
    ) -> Optional[MeasureResult]:
        """cbCloud (src/mcl_3dl.cpp:248-302).

        ``points_odom``: scan points already transformed into the odom
        frame (the node does this with TF in accumCloud, :274-302);
        ``sensor_origin_odom``: sensor position in the odom frame.
        Returns a MeasureResult when this cloud triggered a measurement.
        """
        if not self.has_map:
            return None
        if not self.has_odom:
            # The node's accumCloud TF lookup (cloud -> odom,
            # src/mcl_3dl.cpp:283-287) fails until odometry — real or
            # fake_odom-synthesized from the IMU — has published the
            # odom frame; it catches the exception and skips the cloud
            # (tolerated by test_transform_failure.cpp).  Without this,
            # a cloud recorded in the odom frame would be measured
            # against a stale identity odom attitude.
            return None
        self.status = Status(
            status=FilterStatus.NORMAL,
            error=ErrorCode.NORMAL,
            convergence_status=ConvergenceStatus.NORMAL,
        )
        result: list[Optional[MeasureResult]] = [None]

        def process():
            result[0] = self._measure(t)

        def accumulate(msg):
            pts, origin = msg
            self._accum_points.append(np.asarray(pts, np.float64).reshape(-1, 3))
            self._accum_origins.append(np.asarray(origin, np.float64).reshape(3))
            # odometry at the cloud's stamp — stands in for the TF lookup
            # the node does at measure time (src/mcl_3dl.cpp:319-335)
            self._accum_odom.append((self.odom_pos.copy(), self.odom_rot.copy()))
            self._accum_stamps.append(t)
            return True

        self.accum.push(
            frame_id, (points_odom, sensor_origin_odom),
            process, accumulate, self._accum_clear,
        )
        return result[0]

    def measure_direct(
        self, points_base: np.ndarray, origins_base: np.ndarray,
        labels: np.ndarray, t: float,
    ) -> Optional[MeasureResult]:
        """Run a measurement on a base_link-frame cloud directly (test API)."""
        return self._measure_base(points_base, labels, origins_base, t)

    def _measure(self, t: float) -> Optional[MeasureResult]:
        """measure() preamble (src/mcl_3dl.cpp:304-360): frame transform +
        origin collection, then the fused device step."""
        if not self._accum_points:
            self.status.error = ErrorCode.POINTS_NOT_FOUND
            return None

        # odom -> base_link at the LAST accumulated cloud's stamp (the
        # node looks up TF at pc_accum_header_.back().stamp,
        # src/mcl_3dl.cpp:317-335); using the newest odometry instead
        # would smear the scan by the motion since that cloud arrived.
        odom_pos, odom_rot = self._accum_odom[-1]
        inv_rot = mqn.inv(odom_rot)
        pts = np.concatenate(self._accum_points, axis=0)
        labels = np.concatenate(
            [np.full((len(p),), i, np.int32)
             for i, p in enumerate(self._accum_points)]
        )
        pts_base = mqn.rotate(inv_rot, pts - odom_pos).astype(np.float32)
        origins = np.stack(self._accum_origins, axis=0)
        origins_base = mqn.rotate(inv_rot, origins - odom_pos).astype(np.float32)
        # The measurement is evaluated AND STAMPED at that same cloud
        # stamp: the node publishes the pose with header.stamp =
        # pc_accum_header_.back().stamp (src/mcl_3dl.cpp:317,712), and
        # compare_pose/compare_tf interpolate the reference and look up
        # TF at that stamp — so the map->odom composition must also use
        # the odometry recorded at the accumulated cloud, not the newest.
        return self._measure_base(pts_base, labels, origins_base,
                                  self._accum_stamps[-1],
                                  odom=(odom_pos, odom_rot))

    # ------------------------------------------------------- measurement step

    def _measure_base(self, pts_base, labels, origins_base, t,
                      odom=None) -> MeasureResult:
        # skip_measure decimation (src/mcl_3dl.cpp:306-310)
        self.cnt_measure += 1
        if self.cnt_measure % max(int(self.params.skip_measure), 1) != 0:
            return None

        p = self.params
        ts = time.monotonic()

        # VoxelGrid downsample (src/mcl_3dl.cpp:363-367)
        pts_ds, attrs = voxel_downsample(
            pts_base, (p.downsample_x, p.downsample_y, p.downsample_z),
            attrs=np.asarray(labels, np.float64)[:, None],
        )
        lbl_ds = np.round(attrs[:, 0]).astype(np.int32)
        self._last_scan_base = pts_ds

        n_pts = pts_ds.shape[0]
        bucket = _bucket(max(n_pts, 1), 256)
        cloud = np.zeros((bucket, 3), np.float32)
        cloud[:n_pts] = pts_ds
        cloud_label = np.zeros((bucket,), np.int32)
        cloud_label[:n_pts] = np.clip(lbl_ds, 0, max(len(origins_base) - 1, 0))
        cloud_valid = np.zeros((bucket,), bool)
        cloud_valid[:n_pts] = True

        if p.use_random_sampler_with_normal:
            normals = np.zeros((bucket, 3), np.float32)
            normals[:n_pts] = estimate_normals_host(
                pts_ds, p.random_sampler_with_normal.normal_search_range
            )
        else:
            normals = np.zeros((bucket, 3), np.float32)

        n_origins = max(len(origins_base), 1)
        origins_arr = np.zeros((n_origins, 3), np.float32)
        if len(origins_base):
            origins_arr[: len(origins_base)] = origins_base

        if not self._tf_seeded:
            # Seed the TF smoothers with the CURRENT map->odom at the
            # first measurement: the configure-time identity seed
            # (mirroring mcl_3dl.cpp:1278-1285) is only consistent when
            # odometry starts near identity — under fake_odom the odom
            # frame carries the IMU attitude from the start, and the
            # cold smoother would drag the first published poses toward
            # the identity transform (sub-jump_dist, so the in-step
            # jump reset never fires).
            op = np.asarray(odom[0] if odom is not None else self.odom_pos,
                            np.float64)
            orot = np.asarray(odom[1] if odom is not None else self.odom_rot,
                              np.float64)
            pp = np.asarray(self.state_prev_pos, np.float64)
            pr = np.asarray(self.state_prev_rot, np.float64)
            mrot = mqn.mul(pr, mqn.inv(orot))
            mpos = pp - mqn.rotate(mrot, op)
            self.f_ang = mf.filter_set(
                self.f_ang, jnp.asarray(mqn.to_rpy(mrot), jnp.float32))
            self.f_pos = mf.filter_set(
                self.f_pos, jnp.asarray(mpos, jnp.float32))
            self._tf_seeded = True

        # graph selection mirrors the reference's host-side
        # setGlobalLocalizationStatus reconfiguration: above
        # num_particles a global-mode specialization runs (point budget
        # bucketed along the reference's ramp; beam dropped)
        step = (self._global_step_for(self._n_active_host)
                if self._n_active_host > p.num_particles else self._step)
        (self.pstate, self.f_pos, self.f_ang, self.state_prev_pos,
         self.state_prev_rot, aux) = step(
            self.pstate,
            self._next_key(),
            self.map.df, self.map.df_beam, self.map.occ,
            jnp.asarray(cloud), jnp.asarray(cloud_label),
            jnp.asarray(cloud_valid), jnp.asarray(normals),
            jnp.asarray(origins_arr),
            jnp.asarray(odom[0] if odom is not None else self.odom_pos),
            jnp.asarray(odom[1] if odom is not None else self.odom_rot),
            self.state_prev_pos, self.state_prev_rot,
            self.f_pos, self.f_ang,
            jnp.asarray(self.global_localization_fix_cnt > 0),
            # live-tunable warn thresholds (dynamic_reconfigure parity,
            # cfg/MCL3DLParams.cfg + parameters.cpp:320-325): traced
            # inputs so updating Params needs no recompile
            jnp.asarray([p.std_warn_thresh_xy, p.std_warn_thresh_z,
                         p.std_warn_thresh_yaw], jnp.float32),
        )
        aux = jax.device_get(aux)

        if p.debug_finite_checks:
            # assert(isfinite(...)) guards (src/mcl_3dl.cpp:454-460,686-692)
            for name in ("e_pos", "e_rot", "pub_pos", "pub_rot", "cov"):
                if not np.isfinite(np.asarray(aux[name])).all():
                    raise FloatingPointError(
                        f"non-finite {name} in measurement step: {aux[name]}"
                    )

        if aux["points_not_found"]:
            self.status.error = ErrorCode.POINTS_NOT_FOUND
            return MeasureResult(status=self.status, elapsed=time.monotonic() - ts)

        # host-side epilogue (src/mcl_3dl.cpp:853-897)
        if aux["expanded"]:
            self.status.status = FilterStatus.EXPANSION_RESETTING

        dt = min(max(t - self.localized_last, 0.0), 1.0)
        self.localize_rate, tol = mf.filter_step(self.localize_rate, dt)
        self.tf_tolerance_base = float(tol)
        self.localized_last = t

        if aux["did_resize"]:
            # wait 99.7% fix — three sigma (src/mcl_3dl.cpp:886-887)
            self.global_localization_fix_cnt = 1 + int(math.ceil(p.lpf_step)) * 3
            self._maybe_shrink_capacity()
        if self.global_localization_fix_cnt:
            self.global_localization_fix_cnt -= 1
            self.status.status = FilterStatus.GLOBAL_LOCALIZATION

        if aux["large_std"]:
            self.status.convergence_status = ConvergenceStatus.LARGE_STD_VALUE
        elif aux["converged"]:
            self.status.convergence_status = ConvergenceStatus.CONVERGED

        self.entropy = float(aux["entropy"])
        self.status.match_ratio = float(aux["match_ratio_max"])
        self.status.particle_size = int(self.pstate.n_active)
        self._n_active_host = self.status.particle_size
        self.status.entropy = self.entropy

        if p.output_pcd:
            e_rot = jnp.asarray(aux["pub_rot"])
            moved = np.asarray(
                mq.rotate(e_rot, jnp.asarray(pts_ds)) + jnp.asarray(aux["pub_pos"])
            )
            self._pc_all_accum.append(moved)

        # interval-throttled matched/unmatched clouds
        # (src/mcl_3dl.cpp:762-805): emit at most every
        # match_output_interval_interval seconds, plus the reference's
        # backwards-time-jump re-arm (stamp + 1s < last)
        if self.on_match_clouds is not None and (
            t > self.match_output_last + p.match_output_interval_interval
            or t + 1.0 < self.match_output_last
        ):
            self.match_output_last = t
            matched_m, unmatched_m = self.classify_cloud(
                pts_ds, aux["e_pos"], aux["e_rot"])
            pts_map = mqn.rotate(
                np.asarray(aux["e_rot"]), np.asarray(pts_ds, np.float64)
            ) + np.asarray(aux["e_pos"])
            self.on_match_clouds(
                t, pts_map[matched_m], pts_map[unmatched_m])

        return MeasureResult(
            stamp=t,
            pos=aux["pub_pos"], rot=aux["pub_rot"], cov=aux["cov"],
            map_to_odom_pos=aux["map_to_odom_pos"],
            map_to_odom_rot=aux["map_to_odom_rot"],
            raw_pos=aux["e_pos"], raw_rot=aux["e_rot"],
            match_ratio_min=float(aux["match_ratio_min"]),
            match_ratio_max=float(aux["match_ratio_max"]),
            entropy=self.entropy,
            jumped=bool(aux["jumped"]), expanded=bool(aux["expanded"]),
            converged=bool(aux["converged"]), large_std=bool(aux["large_std"]),
            particle_size=int(self.pstate.n_active),
            status=self.status,
            elapsed=time.monotonic() - ts,
        )


    def _measure_models(self, pos, rot, mask, n_active, df, df_beam, occ,
                        like_pts, like_valid, beam_pts, beam_labels,
                        beam_valid, origins, *, spmd_safe=False,
                        use_beam=None):
        """Per-particle measurement likelihoods (measure_func,
        src/mcl_3dl.cpp:402-425): likelihood-field + beam models with
        their tiered fast paths.  Pure per-particle math — safe to run
        per shard under ``shard_map`` (``parallel/sharding.py``) on the
        local particle slice.

        ``use_beam`` (static) overrides ``params.use_beam_model`` — the
        global-mode graph passes False when the beam point budget is 0
        so the raycast march is not built at all.

        Returns ``(lik_l, qual_l, lik_b, tier_like, tier_beam)``.
        """
        p = self.params
        lp, bp = p.likelihood, p.beam
        use_beam_model = p.use_beam_model if use_beam is None else use_beam
        # Trilinear sampling for normal tracking accuracy; 1-gather
        # nearest-cell sampling during global localization (huge particle
        # counts, pose uncertainty >> half a cell).
        in_global_mode = n_active > p.num_particles
        local_ok = self._local_kernel_ok and not spmd_safe
        n_cap = pos.shape[0]
        rmat = mq.rotation_matrix(mq.normalize(rot))          # [N, 3, 3]

        # grouped fixed-march beam kernel eligibility (the reference's
        # exact kd-tree march over pose-grouped local tables; fixed
        # probe count covers the longest clipped ray (+1 m sensor-
        # origin margin).  nprobe capped by its VMEM table block.
        use_grouped_beam = False
        if use_beam_model and not bp.use_raycast_using_dda:
            z_ext = max(abs(bp.clip_z_min), abs(bp.clip_z_max))
            steps_g = int(math.ceil(
                (math.hypot(bp.clip_far, z_ext) + bp.hit_range + 1.0)
                / p.map_grid_min)) + 2
            use_grouped_beam = (
                local_ok and n_cap % _GTILE == 0 and steps_g + 1 <= 64
            )

        # ONE pose-grouped sort serves both measurement kernels: df and
        # df_beam live on the same grid (map/map_data.py), so the stats,
        # the counting-sorted layout, and the overflow slots are shared;
        # each model keeps its own per-virtual-point boxes + fits cond.
        grouped_like = grouped_beam = None
        share_like = (
            local_ok and lp.interp == "nearest"
            and n_cap % _GTILE == 0 and df.field2d is not None
        )
        if share_like or use_grouped_beam:
            cap = og.default_overflow_cap(n_cap)
            stats = og.group_stats(pos, rmat, rot, df.weights,
                                   float(df.cell), df.origin, mask)
            need_layout = jnp.zeros((), bool)
            if share_like:
                lo_l, fits_kg_l = og.group_boxes(stats, like_pts,
                                                 df.field.shape)
                fits_l = (jnp.all(fits_kg_l | ~like_valid[:, None])
                          & (stats.n_over <= cap))
                need_layout |= fits_l
            if use_grouped_beam:
                vp = BeamVirtualPoints(
                    beam_pts, beam_labels, beam_valid, origins,
                    p.map_grid_min, bp.hit_range, steps_g)
                lo_b, fits_kg_b = og.group_boxes(stats, vp.vpf,
                                                 df_beam.field.shape)
                fits_b = (jnp.all(fits_kg_b | ~vp.chainf[:, None])
                          & (stats.n_over <= cap))
                need_layout |= fits_b
            layout = jax.lax.cond(
                need_layout,
                lambda: og.build_layout(stats, cap),
                lambda: og.empty_layout(n_cap, cap),
            )
            if share_like:
                grouped_like = (stats, layout, lo_l, fits_l)
            if use_grouped_beam:
                grouped_beam = (stats, layout, lo_b, fits_b, vp)

        if lp.interp == "nearest":
            lik_l, qual_l, tier_like = likelihood_measure(
                df, pos, rot, like_pts, like_valid,
                lp.match_dist_min, lp.match_dist_flat, lp.match_weight,
                trilinear=False, local_kernel=local_ok,
                active=mask, rmat=rmat, grouped=grouped_like,
                with_info=True,
            )
        else:
            lik_l, qual_l, tier_like = jax.lax.cond(
                in_global_mode,
                lambda: likelihood_measure(
                    df, pos, rot, like_pts, like_valid,
                    lp.match_dist_min, lp.match_dist_flat, lp.match_weight,
                    trilinear=False, local_kernel=local_ok,
                    active=mask, rmat=rmat, with_info=True,
                ),
                lambda: likelihood_measure(
                    df, pos, rot, like_pts, like_valid,
                    lp.match_dist_min, lp.match_dist_flat, lp.match_weight,
                    trilinear=True, rmat=rmat, with_info=True,
                ),
            )
        if use_beam_model:
            if bp.use_raycast_using_dda:
                num_steps = int(
                    math.ceil((bp.clip_far + bp.hit_range)
                              / (bp.dda_grid_size * 0.5))
                ) + 2
            else:
                # sphere tracing: adaptive steps, bounded iteration count
                num_steps = min(
                    bp.max_sphere_steps,
                    int(math.ceil((bp.clip_far + bp.hit_range)
                                  / p.map_grid_min)) + 2,
                )

            def _beam_xla():
                lik, _, _ = beam_measure(
                    df_beam, occ, pos, rot, beam_pts,
                    beam_labels, beam_valid, origins,
                    use_dda=bp.use_raycast_using_dda,
                    map_grid_min=p.map_grid_min,
                    map_grid_max=p.map_grid_max,
                    hit_range=bp.hit_range,
                    beam_likelihood_min=bp.beam_likelihood,
                    num_points_default=bp.num_points,
                    sin_total_ref=math.sin(bp.ang_total_ref),
                    filter_label_max=bp.filter_label_max,
                    add_penalty_short_only_mode=bp.add_penalty_short_only_mode,
                    num_steps=num_steps,
                    early_exit=not spmd_safe,
                    ray_angle_half=bp.ray_angle_half,
                    min_dist_thr_sq=p.min_dist_thr_sq,
                )
                return lik

            if use_grouped_beam:
                lik_b, tier_beam = beam_measure_grouped(
                    df_beam, pos, rot, beam_pts, beam_labels,
                    beam_valid, origins,
                    map_grid_min=p.map_grid_min,
                    map_grid_max=p.map_grid_max,
                    hit_range=bp.hit_range,
                    beam_likelihood_min=bp.beam_likelihood,
                    num_points_default=bp.num_points,
                    sin_total_ref=math.sin(bp.ang_total_ref),
                    add_penalty_short_only_mode=bp.add_penalty_short_only_mode,
                    num_steps=steps_g,
                    active=mask,
                    fallback=_beam_xla,
                    grouped=grouped_beam,
                    rmat=rmat,
                    with_info=True,
                )
            else:
                lik_b = _beam_xla()
                tier_beam = jnp.int32(2)
        else:
            lik_b = jnp.ones_like(lik_l)
            tier_beam = jnp.int32(-1)
        return lik_l, qual_l, lik_b, tier_like, tier_beam

    def _measurement_step(
        self, state, key, df, df_beam, occ,
        cloud, cloud_label, cloud_valid, normals, origins,
        odom_pos, odom_rot, prev_pos, prev_rot,
        f_pos, f_ang, is_global_fix, std_warn_thresh=None,
        *, spmd_safe=False, shard_mesh=None, global_mode=False,
        global_slots=None,
    ):
        """The fused measurement update (src/mcl_3dl.cpp:363-893 on device).

        ``shard_mesh`` (static; set by ``parallel.sharded_filter_step``)
        runs the per-particle measurement models under ``shard_map`` on
        each shard's local particle slice — pose-grouped Pallas kernels
        and early-exit raycasts included, since control flow inside
        shard_map is device-local.  The rest of the step stays under
        GSPMD auto-partitioning (weight normalization, moments,
        resampling CDF get their collectives inserted automatically).

        ``spmd_safe=True`` (static; the vmapped fleet path) selects
        shard-count-invariant control flow under plain GSPMD: fixed-trip
        raycast marches instead of early-exit ``while_loop`` (whose cond
        would reduce over the sharded axis — each shard then runs its
        own trip count and the program's collectives deadlock) and the
        pure-XLA likelihood path (the Pallas local-table kernel cannot
        be GSPMD-partitioned).

        ``global_mode=True`` (static) compiles a global-localization
        specialization: the sampled point arrays are sized at
        ``global_slots`` (default: the likelihood model's
        ``num_points_global`` floor; the reference reconfigures the
        models the same way on the host, setGlobalLocalizationStatus,
        lidar_measurement_model_likelihood.cpp:63-77) and a zero beam
        budget drops the raycast march from the graph entirely — the
        reference evaluates only the sampled points, so a graph that
        still marches every full-budget slot with a validity mask pays
        ~10x the honest cost at 100k+ particles.  The host selects the
        graph from the particle count (``_measure_base`` via
        ``_global_step_for``), following the reference's point ramp
        through power-of-two ``global_slots`` buckets during the 0.75x
        decay (one cached compile per bucket; the traced
        ``active_points`` ramp masks within the bucket).  Remaining
        deviation: the beam model stays dropped for the whole decay —
        the reference's beam ramp leaves its 0-point floor only in the
        last decay step (n_active < 3x num_particles).
        """
        p = self.params
        lp, bp = p.likelihood, p.beam
        like_slots = (
            (global_slots or lp.num_points_global) if global_mode
            else lp.num_points)
        beam_slots = bp.num_points_global if global_mode else bp.num_points
        use_beam = p.use_beam_model and beam_slots > 0
        beam_slots = max(beam_slots, 1)        # keep array shapes non-empty
        k_like, k_beam, k_resample, k_noise, k_expand = jax.random.split(key, 5)
        mask = state.active_mask()
        nf32 = state.n_active.astype(jnp.float32)

        # global-localization point-count shrink (setGlobalLocalizationStatus,
        # lidar_measurement_model_likelihood.cpp:63-77)
        def active_points(default, global_min):
            num = default * p.num_particles // jnp.maximum(state.n_active, 1)
            num = jnp.maximum(num, global_min)
            return jnp.where(state.n_active <= p.num_particles, default, num)

        # --- clip + sample (filter(), likelihood .cpp:79-103 / beam :98-122)
        like_keep = cloud_valid & clip_mask(
            cloud, lp.clip_near, lp.clip_far, lp.clip_z_min, lp.clip_z_max
        )
        beam_keep = cloud_valid & clip_mask(
            cloud, bp.clip_near, bp.clip_far, bp.clip_z_min, bp.clip_z_max
        )
        points_not_found = jnp.sum(like_keep) == 0

        if p.use_random_sampler_with_normal:
            sw = p.random_sampler_with_normal
            # prev-state statistics (setParticleStatistics,
            # src/mcl_3dl.cpp:369-375)
            mean_pos_prev, mean_rot_prev = pf.expectation(state)
            cov_prev = st.covariance6(state, state.prob, mean_pos_prev,
                                      mean_rot_prev)
            weights = sampler_with_normal_weights(
                normals, like_keep, cov_prev[:3, :3], mean_rot_prev,
                sw.perform_weighting_ratio, sw.max_weight_ratio, sw.max_weight,
            )
            like_pts, like_ok, like_idx = sample_weighted_without_replacement(
                k_like, cloud, weights, like_slots
            )
            bweights = sampler_with_normal_weights(
                normals, beam_keep, cov_prev[:3, :3], mean_rot_prev,
                sw.perform_weighting_ratio, sw.max_weight_ratio, sw.max_weight,
            )
            beam_pts, beam_ok, beam_idx = sample_weighted_without_replacement(
                k_beam, cloud, bweights, beam_slots
            )
        else:
            like_pts, like_ok, like_idx = sample_uniform(
                k_like, cloud, like_keep, like_slots
            )
            beam_pts, beam_ok, beam_idx = sample_uniform(
                k_beam, cloud, beam_keep, beam_slots
            )

        # ramp from the FULL budgets (the reference's formula), clipped
        # to the graph's static slot count
        n_like = jnp.minimum(
            active_points(lp.num_points, lp.num_points_global), like_slots)
        like_valid = like_ok & (
            jnp.arange(like_slots, dtype=jnp.int32) < n_like
        )
        n_beam = jnp.minimum(
            active_points(bp.num_points, bp.num_points_global), beam_slots)
        beam_valid = beam_ok & (
            jnp.arange(beam_slots, dtype=jnp.int32) < n_beam
        )
        if not use_beam:
            beam_valid = jnp.zeros_like(beam_valid)
        beam_labels = cloud_label[beam_idx]

        # --- per-particle likelihoods (measure_func, src/mcl_3dl.cpp:402-425)
        if shard_mesh is not None:
            # Each shard runs the FULL fast path on its local particles —
            # pose-grouped Pallas kernels, early-exit raycasts, per-shard
            # lax.cond tiers — because inside shard_map control flow is
            # local to the device (no cross-shard reduction in a
            # while_loop cond, unlike GSPMD auto-partitioning, which
            # forced the spmd_safe slow path in rounds 1-2).  Collectives
            # remain only at the filter boundaries below (weight
            # normalization, moments, resampling CDF), inserted by GSPMD.
            pp = P_spec("particles")
            rr = P_spec()

            def _models_local(pos, rot, mask_l, n_act, df_, df_beam_, occ_,
                              lpts, lvalid, bpts, blabels, bvalid, orgs):
                lik_l, qual_l, lik_b, tl, tb = self._measure_models(
                    pos, rot, mask_l, n_act, df_, df_beam_, occ_,
                    lpts, lvalid, bpts, blabels, bvalid, orgs,
                    spmd_safe=False, use_beam=use_beam,
                )
                return lik_l, qual_l, lik_b, tl[None], tb[None]

            # check_vma=False: early-exit while_loop carries start from
            # unvarying zeros but end particle-varying, which the vma
            # checker rejects; everything here is genuinely per-particle
            lik_l, qual_l, lik_b, tl_s, tb_s = jax.shard_map(
                _models_local, mesh=shard_mesh,
                in_specs=(pp, pp, pp, rr, rr, rr, rr, rr, rr, rr, rr, rr,
                          rr),
                out_specs=(pp, pp, pp, pp, pp),
                check_vma=False,
            )(state.pos, state.rot, mask, state.n_active, df, df_beam, occ,
              like_pts, like_valid, beam_pts, beam_labels, beam_valid,
              origins)
            # conservative: report the worst tier any shard paid
            tier_like = jnp.max(tl_s)
            tier_beam = jnp.max(tb_s)
        else:
            lik_l, qual_l, lik_b, tier_like, tier_beam = self._measure_models(
                state.pos, state.rot, mask, state.n_active, df, df_beam, occ,
                like_pts, like_valid, beam_pts, beam_labels, beam_valid,
                origins, spmd_safe=spmd_safe, use_beam=use_beam,
            )

        odom_error = normal_likelihood(
            jnp.linalg.norm(state.odom_err_lin, axis=-1), p.odom_err_integ_lin_sigma
        )
        likelihood = lik_l * lik_b * odom_error

        match_ratio_min = jnp.min(jnp.where(mask, qual_l, jnp.inf))
        match_ratio_max = jnp.max(jnp.where(mask, qual_l, -jnp.inf))

        state2, entropy = pf.measure(state, likelihood)

        # --- bias toward the previous pose (src/mcl_3dl.cpp:428-450)
        lin_diff = jnp.linalg.norm(state2.pos - prev_pos, axis=-1)
        ang_diff = mq.angle(mq.mul(state2.rot, mq.inv(prev_rot)))
        p_bias = (
            normal_likelihood(lin_diff, p.bias_var_dist)
            * normal_likelihood(ang_diff, p.bias_var_ang)
            + 1e-6
        )
        in_global = state2.n_active > p.num_particles
        state2 = pf.bias(state2, jnp.where(in_global, 1.0, p_bias))

        e_pos, e_rot = pf.expectation_biased(state2)
        e_rot = mq.normalize(e_rot)
        e_max = pf.max_particle(state2)

        # --- map->odom + jump detection (src/mcl_3dl.cpp:630-661)
        map_rot = mq.mul(e_rot, mq.inv(odom_rot))
        map_pos = e_pos - mq.rotate(map_rot, odom_pos)

        jump_dist = jnp.linalg.norm(e_pos - prev_pos)
        jump_ang = mq.angle(mq.mul(mq.inv(e_rot), prev_rot))
        jumped = (~in_global) & (
            (jump_dist > p.jump_dist) | (jnp.abs(jump_ang) > p.jump_ang)
        )
        state2 = _tree_where(jumped, reset_error_integrals(state2), state2)
        jump = in_global | jumped

        # --- TF output smoothing (src/mcl_3dl.cpp:662-684)
        rpy = mq.to_rpy(map_rot)
        f_ang2 = _tree_where(jump, mf.filter_set(f_ang, rpy), f_ang)
        f_pos2 = _tree_where(jump, mf.filter_set(f_pos, map_pos), f_pos)
        f_ang2, rpy_s = mf.filter_step(f_ang2, rpy)
        f_pos2, map_pos_s = mf.filter_step(f_pos2, map_pos)
        map_rot_s = mq.from_rpy(rpy_s)
        pub_rot = mq.mul(map_rot_s, odom_rot)
        pub_pos = map_pos_s + mq.rotate(map_rot_s, odom_pos)

        # --- covariance + convergence (src/mcl_3dl.cpp:704-751)
        cov = pf.covariance(state2)
        if std_warn_thresh is None:
            std_warn_thresh = jnp.asarray(
                [p.std_warn_thresh_xy, p.std_warn_thresh_z,
                 p.std_warn_thresh_yaw], jnp.float32,
            )
        large_std = (~is_global_fix) & (
            (jnp.sqrt(cov[0, 0] + cov[1, 1]) > std_warn_thresh[0])
            | (jnp.sqrt(cov[2, 2]) > std_warn_thresh[1])
            | (jnp.sqrt(cov[5, 5]) > std_warn_thresh[2])
        )
        fix_ang = jnp.sqrt(cov[3, 3] + cov[4, 4] + cov[5, 5])
        fix_dist = jnp.sqrt(cov[0, 0] + cov[1, 1] + cov[2, 2])
        converged = (~large_std) & (fix_dist < p.fix_dist) & (
            jnp.abs(fix_ang) < p.fix_ang
        )

        # --- resample + noise redraw (src/mcl_3dl.cpp:809-825)
        state3 = pf.resample(state2, k_resample, self._resample_sigma)
        nvals = jax.random.normal(k_noise, (state.capacity, 4), jnp.float32)
        new_noise = nvals * jnp.asarray(
            [p.odom_err_lin_lin, p.odom_err_lin_ang,
             p.odom_err_ang_lin, p.odom_err_ang_ang], jnp.float32,
        )
        state3 = state3._replace(noise=new_noise)

        # --- expansion resetting (src/mcl_3dl.cpp:853-864); lax.cond so
        # the noise redraw only executes on the (rare) trigger
        expanded = match_ratio_max < p.match_ratio_thresh
        state4 = jax.lax.cond(
            expanded,
            lambda s: pf.add_noise(s, k_expand, self._expansion_sigma),
            lambda s: s,
            state3,
        )

        # --- global-localization decay (src/mcl_3dl.cpp:875-888)
        reduced = (nf32 * 0.75).astype(jnp.int32)
        new_n = jnp.where(reduced > p.num_particles, reduced, p.num_particles)
        did_resize = state4.n_active > p.num_particles
        state5 = jax.lax.cond(
            did_resize, lambda s: pf.resize(s, new_n), lambda s: s, state4
        )

        # all-filtered-out guard: leave the filter untouched
        # (src/mcl_3dl.cpp:385-391)
        final_state = _tree_where(points_not_found, state, state5)
        f_pos_out = _tree_where(points_not_found, f_pos, f_pos2)
        f_ang_out = _tree_where(points_not_found, f_ang, f_ang2)
        new_prev_pos = jnp.where(points_not_found, prev_pos, e_pos)
        new_prev_rot = jnp.where(points_not_found, prev_rot, e_rot)

        aux = {
            "e_pos": e_pos, "e_rot": e_rot,
            "pub_pos": pub_pos, "pub_rot": pub_rot,
            "map_to_odom_pos": map_pos_s, "map_to_odom_rot": map_rot_s,
            "cov": cov, "entropy": entropy,
            "match_ratio_min": match_ratio_min,
            "match_ratio_max": match_ratio_max,
            "jumped": jump, "expanded": expanded,
            "large_std": large_std, "converged": converged,
            "did_resize": did_resize,
            "points_not_found": points_not_found,
            # engaged measurement tier (0=grouped Pallas, 1=per-point box,
            # 2=XLA gather, -1=model off) — bench.py reports these
            "tier_like": tier_like, "tier_beam": tier_beam,
            "e_max_odom_err_lin": e_max["odom_err_lin"],
            "e_max_odom_err_ang": e_max["odom_err_ang"],
        }
        return (final_state, f_pos_out, f_ang_out, new_prev_pos,
                new_prev_rot, aux)

    def _global_step_for(self, n_active: int):
        """Global-mode graph for the current particle count: the
        reference's point ramp (num_points * num_particles / n, floored
        at num_points_global — lidar_measurement_model_likelihood.cpp:
        63-77) rounded UP to a power-of-two slot bucket, one cached jit
        per bucket, so the 0.75x decay follows the ramp instead of
        pinning the floor for the whole recovery."""
        p = self.params
        lp = p.likelihood
        ramp = max(lp.num_points * p.num_particles // max(n_active, 1),
                   lp.num_points_global)
        k = max(lp.num_points_global, 1)
        while k < min(ramp, lp.num_points):
            k *= 2
        k = min(k, lp.num_points)
        step = self._step_global_cache.get(k)
        if step is None:
            step = jax.jit(partial(self._measurement_step,
                                   global_mode=True, global_slots=k))
            self._step_global_cache[k] = step
        return step

    # --------------------------------------------------------------- services

    def resize_particles(self, n: int) -> None:
        """resize_mcl_particle service (src/mcl_3dl.cpp:1019-1025)."""
        self._grow_capacity(n)
        self.pstate = jax.jit(pf.resize)(self.pstate, jnp.asarray(n, jnp.int32))
        self._n_active_host = n
        self._maybe_shrink_capacity()

    def expansion_reset(self) -> None:
        """expansion_resetting service (src/mcl_3dl.cpp:1026-1038)."""
        self.pstate = pf.add_noise(
            self.pstate, self._next_key(), self._expansion_sigma
        )

    def global_localization(self) -> int:
        """global_localization service (src/mcl_3dl.cpp:1039-1099).

        Seeds one particle per (standable surface point x yaw bin), yaw
        composed with the current IMU attitude; returns the new particle
        count.
        """
        if not self.has_map:
            raise RuntimeError("No map received.")
        p = self.params
        grid = p.global_localization_grid_lin
        points = voxel_downsample(self.map.points, grid)

        # drop points with another point directly above (not standable,
        # src/mcl_3dl.cpp:1058-1074); radius search in the reference uses
        # the anisotropic point representation.
        keep = _standable_mask(points, grid, p.dist_weight)
        points = points[keep]
        if points.shape[0] == 0:
            return int(self.pstate.n_active)

        dyaw = p.global_localization_div_yaw
        n = points.shape[0] * dyaw
        self._grow_capacity(n)
        cap = self.pstate.capacity

        idx = np.arange(cap, dtype=np.int64)
        pt_idx = np.minimum(idx // dyaw, points.shape[0] - 1)
        yaw_idx = idx % dyaw
        pos = jnp.asarray(points[pt_idx], jnp.float32)
        yaw = jnp.asarray(2.0 * np.pi * yaw_idx / dyaw, jnp.float32)
        zero = jnp.zeros_like(yaw)
        yaw_quat = mq.from_rpy(jnp.stack([zero, zero, yaw], axis=-1))
        rot = mq.normalize(mq.mul(yaw_quat, jnp.asarray(self.imu_quat)))

        prob = 1.0 / float(points.shape[0])  # reference quirk: 1/points, not 1/n
        active = idx < n
        self.pstate = st.zeros(cap, n)._replace(
            pos=pos, rot=rot,
            prob=jnp.asarray(np.where(active, prob, 0.0), jnp.float32),
            prob_bias=jnp.ones((cap,), jnp.float32),
        )
        self._n_active_host = n
        return n

    def global_localization_correlative(
        self,
        num_seeds: int = 1024,
        yaw_bins: Optional[int] = None,
        scan_points_base: Optional[np.ndarray] = None,
        yaw_prior: Optional[tuple] = None,
        seed_z: Optional[float] = None,
    ) -> int:
        """One-shot dense global localization (TPU-native addition).

        Scores every (x, y) map cell x yaw bin against the latest scan by
        FFT cross-correlation of the planar likelihood field
        (map/correlative.py), then seeds the particle filter with the
        top candidates (z from the standable-surface map, yaw composed
        with the IMU attitude like src/mcl_3dl.cpp:1087-1089).  Replaces
        the reference's 100k-particle seed-and-decay search with one
        device pass; the particle filter refines from there.

        ``yaw_prior=(center, tol)`` restricts candidates to map yaws
        within ``tol`` of ``center`` — the kidnapped-robot case: a
        displacement cannot corrupt the gyro/gravity attitude estimate,
        so when the IMU yaw is trusted the search needs position only
        (and symmetric rooms stop being ambiguous).  ``seed_z`` pins the
        seeded height (same-floor prior) instead of the standable-
        surface lookup.
        """
        from mcl_3dl_tpu.map.correlative import (
            build_planar_field,
            correlate_scan,
            top_candidates,
        )

        if not self.has_map:
            raise RuntimeError("No map received.")
        if scan_points_base is None:
            scan_points_base = self._last_scan_base
        if scan_points_base is None or len(scan_points_base) == 0:
            raise RuntimeError("No scan available for correlation.")
        p = self.params
        lp = p.likelihood
        scan = np.asarray(scan_points_base, np.float32)
        keep = np.asarray(clip_mask(
            jnp.asarray(scan), lp.clip_near, lp.clip_far,
            lp.clip_z_min, lp.clip_z_max,
        ))
        scan = scan[keep]
        if len(scan) == 0:
            raise RuntimeError("All scan points clipped.")

        df = self.map.df
        # padding must cover the scan footprint so circular FFT
        # correlation never wraps a real peak
        pad = int(np.ceil(lp.clip_far / df.cell)) + 2
        field2d = build_planar_field(
            df, lp.match_dist_min, lp.match_dist_flat, lp.match_weight,
            z_lo=-np.inf, z_hi=np.inf, pad_cells=pad,
        )
        w = np.asarray(df.weights)
        scan_xyw = jnp.asarray(scan[:, :2] * w[None, :2], jnp.float32)
        nbins = yaw_bins or max(p.global_localization_div_yaw, 36)
        yaws = jnp.asarray(
            2.0 * np.pi * np.arange(nbins) / nbins, jnp.float32
        )
        scores = correlate_scan(field2d, scan_xyw, yaws)
        if yaw_prior is not None:
            # the seeded map yaw equals the bin yaw (_seed_correlative
            # subtracts imu_yaw before composing with imu_quat), so
            # filtering bins directly against the prior center is exact
            center, tol = yaw_prior
            dy = np.arctan2(np.sin(np.asarray(yaws) - center),
                            np.cos(np.asarray(yaws) - center))
            bin_ok = jnp.asarray(np.abs(dy) <= tol)
            scores = jnp.where(bin_ok[:, None, None], scores, -jnp.inf)
        xs, ys, yaw_is, vals = jax.device_get(
            top_candidates(scores, field2d, num_seeds)
        )
        good = np.isfinite(vals) & (vals > 0)
        xs, ys, yaw_is, vals = xs[good], ys[good], yaw_is[good], vals[good]
        n = len(xs)
        if n == 0:
            return int(self.pstate.n_active)

        # z from the nearest standable surface point (same surface model
        # the reference seeds from, src/mcl_3dl.cpp:1050-1074), unless a
        # same-floor prior pins it
        cand_xy = np.stack([xs / w[0], ys / w[1]], axis=1)
        if seed_z is not None:
            zs = np.full(len(cand_xy), float(seed_z), np.float32)
            return self._seed_correlative(cand_xy, zs, yaw_is, vals, nbins)
        grid = p.global_localization_grid_lin
        surf = voxel_downsample(self.map.points, grid)
        surf = surf[_standable_mask(surf, grid, p.dist_weight)]
        if len(surf) == 0:
            surf = self.map.points
        d2 = (
            (surf[None, :, 0] - cand_xy[:, None, 0]) ** 2
            + (surf[None, :, 1] - cand_xy[:, None, 1]) ** 2
        )
        zs = surf[np.argmin(d2, axis=1), 2]
        return self._seed_correlative(cand_xy, zs, yaw_is, vals, nbins)

    def _seed_correlative(self, cand_xy, zs, yaw_is, vals, nbins) -> int:
        """Replace the particle set with score-weighted correlation
        candidates (the tail of global_localization_correlative)."""
        n = len(cand_xy)
        self._grow_capacity(n)
        cap = self.pstate.capacity
        idx = np.arange(cap)
        sel = np.minimum(idx, n - 1)
        pos = np.stack([cand_xy[sel, 0], cand_xy[sel, 1], zs[sel]], axis=1)
        yaw = 2.0 * np.pi * np.asarray(yaw_is)[sel] / nbins
        # Compose with the IMU attitude like the reference's seeding
        # (src/mcl_3dl.cpp:1087-1089) — but where the reference sweeps
        # EVERY yaw bin (so the imu yaw inside imu_quat_ is harmless),
        # our candidates carry the ABSOLUTE map yaw of the correlation
        # peak; subtract the imu yaw first or it would be double-counted
        # and every seed would point the scan the wrong way.
        imu_yaw = float(mqn.to_rpy(np.asarray(self.imu_quat, np.float64))[2])
        rpy = np.stack([np.zeros(cap), np.zeros(cap), yaw - imu_yaw], axis=1)
        rot = mq.normalize(mq.mul(
            mq.from_rpy(jnp.asarray(rpy, jnp.float32)),
            jnp.asarray(self.imu_quat),
        ))
        active = idx < n
        # Seed weights from the correlation score — unlike the
        # reference's uniform seeding we already know each hypothesis's
        # field match.  The raw score is a SUM of per-point matches
        # (same units as lidar_measurement_model_likelihood.cpp:120-138),
        # under which near-tied hypotheses separate at only a few
        # percent per update; exponentiating the relative score
        # concentrates the particle budget on the top candidates so the
        # filter needs refinement steps, not a random walk, to lock in.
        score = np.asarray(vals)[sel]
        rel = score / max(float(np.max(vals)), 1e-12)
        sharp = np.exp(-60.0 * (1.0 - rel))
        prob = np.where(active, sharp, 0.0)
        prob = prob / max(prob[:n].sum(), 1e-12)
        self.pstate = st.zeros(cap, n)._replace(
            pos=jnp.asarray(pos, jnp.float32),
            rot=rot,
            prob=jnp.asarray(prob, jnp.float32),
            prob_bias=jnp.ones((cap,), jnp.float32),
        )
        self._n_active_host = n
        return n

    def _landmark_step(self, state, key, mpos, mrot, nd_a, nd_sigma_inv):
        d_pos = state.pos - mpos
        d_rot = mq.mul(mq.inv(mrot), state.rot)
        diff6 = jnp.concatenate([d_pos, mq.to_rpy(d_rot)], axis=-1)
        quad = jnp.einsum("ni,ij,nj->n", diff6, nd_sigma_inv, diff6)
        lik = nd_a * jnp.exp(-0.5 * quad)
        state2, _ = pf.measure(state, lik)
        return pf.resample(state2, key, self._resample_sigma)

    def landmark(self, pos, rot, cov66) -> None:
        """Landmark pose measurement (cbLandmark, src/mcl_3dl.cpp:899-940).

        The Gaussian's normalization/inverse are host-precomputed like
        the reference's NormalLikelihoodNd constructor and passed as
        arrays so the jitted step is compiled once per capacity.
        """
        nd = NormalLikelihoodNd(cov66)
        self.pstate = self._landmark_jit(
            self.pstate, self._next_key(),
            jnp.asarray(pos, jnp.float32), jnp.asarray(rot, jnp.float32),
            jnp.asarray(nd.a, jnp.float32), nd.sigma_inv,
        )

    # ------------------------------------------------------------ inspection

    def get_particles(self):
        """publishParticles equivalent (src/mcl_3dl.cpp:1101-1125)."""
        n = int(self.pstate.n_active)
        rot = mq.normalize(self.pstate.rot[:n])
        return np.asarray(self.pstate.pos[:n]), np.asarray(rot), np.asarray(
            self.pstate.prob[:n]
        )

    def classify_cloud(self, points_base, pos, rot):
        """matched/unmatched debug clouds (src/mcl_3dl.cpp:761-805).

        Returns (matched_mask, unmatched_mask) over ``points_base``
        transformed by the given pose.
        """
        p = self.params
        q = mq.rotate(jnp.asarray(rot, jnp.float32),
                      jnp.asarray(points_base, jnp.float32)) + jnp.asarray(
            pos, jnp.float32
        )
        d = self.map.df.sample_trilinear(q)
        unmatched = d > p.unmatch_output_dist
        matched = (~unmatched) & (d < p.match_output_dist)
        return np.asarray(matched), np.asarray(unmatched)

    def debug_beam_status(self, pos, rot, points_base, origin_indices,
                          origins_base):
        """Beam classification at a given pose — the data behind the
        reference's rviz ray/collision markers (src/mcl_3dl.cpp:464-628).

        Returns (status[B], collision-ish info is in the status codes).
        """
        p = self.params
        bp = p.beam
        num_steps = (
            int(math.ceil((bp.clip_far + bp.hit_range)
                          / (bp.dda_grid_size * 0.5)) + 2)
            if bp.use_raycast_using_dda else bp.max_sphere_steps
        )
        _, _, status = beam_measure(
            self.map.df_beam, self.map.occ,
            jnp.asarray(pos, jnp.float32)[None, :],
            jnp.asarray(rot, jnp.float32)[None, :],
            jnp.asarray(points_base, jnp.float32),
            jnp.asarray(origin_indices, jnp.int32),
            jnp.ones(len(points_base), bool),
            jnp.asarray(origins_base, jnp.float32),
            use_dda=bp.use_raycast_using_dda,
            map_grid_min=p.map_grid_min, map_grid_max=p.map_grid_max,
            hit_range=bp.hit_range,
            beam_likelihood_min=bp.beam_likelihood,
            num_points_default=max(bp.num_points, 1),
            sin_total_ref=math.sin(bp.ang_total_ref),
            filter_label_max=bp.filter_label_max,
            add_penalty_short_only_mode=bp.add_penalty_short_only_mode,
            num_steps=num_steps,
            ray_angle_half=bp.ray_angle_half,
            min_dist_thr_sq=p.min_dist_thr_sq,
        )
        return np.asarray(status[0])

    def save_accumulated_pcd(self, path) -> int:
        """Dump the accumulated matched scans (output_pcd mode) to a PCD
        file — the reference's shutdown dump (src/mcl_3dl.cpp:1340-1348).
        Returns the number of points written."""
        from mcl_3dl_tpu.io.pcd import write_pcd

        if not self._pc_all_accum:
            return 0
        pts = np.concatenate(self._pc_all_accum, axis=0)
        write_pcd(path, pts)
        return len(pts)

    def diagnostics(self) -> Diagnostics:
        """diagnoseStatus (src/mcl_3dl.cpp:1127-1148)."""
        if self.status.error == ErrorCode.POINTS_NOT_FOUND:
            return Diagnostics(False, "Valid points does not found.",
                               self.has_map, self.has_odom, self.has_imu)
        if self.status.convergence_status == ConvergenceStatus.LARGE_STD_VALUE:
            return Diagnostics(False, "Too Large Standard Deviation.",
                               self.has_map, self.has_odom, self.has_imu)
        return Diagnostics(True, "OK", self.has_map, self.has_odom, self.has_imu)


def _standable_mask(points: np.ndarray, grid: float, dist_weight) -> np.ndarray:
    """Points with no neighbor within weighted ``grid`` of p+(0,0,0.01+grid).

    Mirrors the pc_filter at src/mcl_3dl.cpp:1062-1074 with the node's
    anisotropic point representation.  Vectorized kd-tree query (the
    reference uses the chunked FLANN tree here); exact radius semantics.
    """
    from scipy.spatial import cKDTree

    points = np.asarray(points, np.float64).reshape(-1, 3)
    m = points.shape[0]
    if m == 0:
        return np.zeros((0,), bool)
    w = np.asarray(dist_weight, np.float64)
    scaled = points * w
    probe = (points + np.array([0.0, 0.0, 0.01 + grid])) * w
    tree = cKDTree(scaled, balanced_tree=False, compact_nodes=False)
    d, _ = tree.query(probe, k=1, distance_upper_bound=grid, workers=-1)
    return ~np.isfinite(d)
