"""Batched math primitives (reference layer L0: vec3.h / quat.h / nd.h / filter.h)."""

from mcl_3dl_tpu.math import quat
from mcl_3dl_tpu.math.nd import normal_likelihood, NormalLikelihoodNd
from mcl_3dl_tpu.math.filters import (
    FilterState,
    lpf_init,
    hpf_init,
    filter_set,
    filter_step,
)

__all__ = [
    "quat",
    "normal_likelihood",
    "NormalLikelihoodNd",
    "FilterState",
    "lpf_init",
    "hpf_init",
    "filter_set",
    "filter_step",
]
