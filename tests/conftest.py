"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated here without TPU hardware via
``xla_force_host_platform_device_count`` (the driver separately dry-runs the
multi-chip path through ``__graft_entry__.dryrun_multichip``).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
