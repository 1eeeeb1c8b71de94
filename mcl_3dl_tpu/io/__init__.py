"""Host I/O: PCD files, replay logs."""

from mcl_3dl_tpu.io.pcd import read_pcd, write_pcd
from mcl_3dl_tpu.io.replay import ReplayLog, ReplayDriver

__all__ = ["read_pcd", "write_pcd", "ReplayLog", "ReplayDriver"]
