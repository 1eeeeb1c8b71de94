"""Test configuration: run on a virtual 8-device CPU mesh.

The session environment registers the remote-TPU "axon" PJRT plugin via
sitecustomize and forces ``jax_platforms=axon,cpu``; running unit tests
against the tunneled chip would make every op a network round-trip.
Override the already-applied config back to CPU, with 8 virtual host
devices for sharding tests.  The driver validates the real multi-chip
path separately via ``__graft_entry__.dryrun_multichip``, and bench.py
runs on the real chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # slow interpret-mode shards reach collectives staggered; the
    # default 40 s rendezvous termination aborts the process
    flags = (
        flags
        + " --xla_cpu_collective_timeout_seconds=1200"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    ).strip()
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, jax.devices()
