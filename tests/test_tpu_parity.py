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


def test_parity_script_cpu_smoke():
    """The parity SCRIPT runs end-to-end in interpret mode at a size whose
    cube does NOT divide the stats kernels' pad units (48^3 % 32768 != 0) —
    this guards the harness logic itself (incl. the sentinel-row comparison
    rule and the anisotropic block) between hardware runs."""
    from mamri_tpu.perception.parity import run_parity_checks

    r = run_parity_checks(size=48)
    assert r["all_exact"], {
        k: v for k, v in r.items() if isinstance(v, dict)
    }
    assert r["num_checks"] >= 31
    assert r["segment_volume_anisotropic"]["shape"] == "80x48x48"
