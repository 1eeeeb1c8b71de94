"""TPU kernels (Pallas/Mosaic) for the hot gather-bound primitives."""

from mcl_3dl_tpu.ops.local_gather import local_score  # noqa: F401
