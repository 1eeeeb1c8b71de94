"""Measurement / prediction models (reference layer L3)."""

from mcl_3dl_tpu.models.motion import OdomDelta, predict_differential_drive
from mcl_3dl_tpu.models.likelihood import likelihood_measure
from mcl_3dl_tpu.models.beam import beam_measure, BeamStatus
from mcl_3dl_tpu.models.imu_gravity import imu_gravity_likelihood
from mcl_3dl_tpu.models.landmark import landmark_likelihood

__all__ = [
    "OdomDelta",
    "predict_differential_drive",
    "likelihood_measure",
    "beam_measure",
    "BeamStatus",
    "imu_gravity_likelihood",
    "landmark_likelihood",
]
