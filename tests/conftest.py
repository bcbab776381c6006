"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Per the build requirements, multi-chip sharding is validated on a virtual CPU
mesh (`--xla_force_host_platform_device_count=8`); the real TPU is only used by
bench.py.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
