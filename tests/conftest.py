"""Test configuration: force an 8-device virtual CPU mesh.

Two mechanisms, both needed:
  * XLA_FLAGS --xla_force_host_platform_device_count=8 must be in the env
    before the CPU backend initializes;
  * this machine's axon site hook force-registers the TPU and overwrites
    JAX_PLATFORMS (sitecustomize sets jax_platforms="axon,cpu"), so the env
    var alone is ignored — jax.config.update AFTER import wins instead.

Tests therefore run on real CPU (leaving the one TPU chip free for bench and
verify drives), and the driver's virtual multi-chip validation matches.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
