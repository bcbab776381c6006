"""Write the on-TPU Pallas kernel parity artifact (TPUPARITY_r{N}.json).

Run on a machine with a real TPU:  python tools/tpu_parity.py [round]
Refuses to stamp a CPU run as TPU parity.
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from mamri_tpu.perception.parity import run_parity_checks

    if jax.default_backend() == "cpu":
        print("refusing: default backend is cpu, not a TPU", file=sys.stderr)
        return 1
    rnd = sys.argv[1] if len(sys.argv) > 1 else "03"
    report = run_parity_checks(size=128)
    # 80^3 does NOT divide the stats kernels' chunk/block pad units, so this
    # second pass exercises the padded-tail path (and another anisotropic
    # shape) on real Mosaic, which the canonical 128 run cannot
    report_nd = run_parity_checks(size=80)
    report["nondividing_size80"] = report_nd
    report["all_exact"] = bool(report["all_exact"] and report_nd["all_exact"])
    report["num_checks"] = report["num_checks"] + report_nd["num_checks"]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), f"TPUPARITY_r{rnd}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"all_exact": report["all_exact"], "num_checks": report["num_checks"], "artifact": out}))
    return 0 if report["all_exact"] else 2


if __name__ == "__main__":
    sys.exit(main())
