"""TPU-gated Pallas kernel parity (skipped on the CPU test mesh).

tests/conftest.py pins the suite to the virtual CPU mesh, so this is normally
skipped in CI; it runs when pointed at real hardware
(JAX_PLATFORMS unset + a TPU attached), and the committed TPUPARITY_r{N}.json
artifact (tools/tpu_parity.py) records the same checks from the bench chip.
"""

import jax
import pytest


@pytest.mark.skipif(jax.default_backend() == "cpu", reason="needs a real TPU")
def test_pallas_kernels_match_jnp_on_device():
    from mamri_tpu.perception.parity import run_parity_checks

    report = run_parity_checks(size=128)
    assert report["all_exact"], report
