"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated here without TPU hardware via
``xla_force_host_platform_device_count`` (the driver separately dry-runs the
multi-chip path through ``__graft_entry__.dryrun_multichip``).

Note: the session's sitecustomize registers the axon TPU plugin and pins
``jax_platforms="axon,cpu"`` programmatically, so the env var alone is not
enough — we must override via ``jax.config`` before any backend use.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
