"""One compact 8->32 scaling cycle (the north-rule N vs 4N criterion pair)
with the machine burn-control ceiling, appended to
bench_artifacts/round2_scaling_cycles.jsonl.

The full `bench.py --scaling` protocol (interleaved 2/8 cycles + 32) runs
~12 min; this compact form fits a shorter window and is re-run at spaced
intervals to catch a clean host window (see BENCH.md: the box's hypervisor
throttles time-varyingly; only windows whose burn control is near its own
best are attributable to the engine).

Usage: python scripts/scale_cycle_8_32.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main() -> int:
    r8 = bench._probe(8, 20000, n_passes=4)
    r32 = bench._probe(32, 80000, n_passes=5)
    eff = round((r32["triples_per_sec"] / r8["triples_per_sec"]) / 4.0, 3)
    ceil = bench._burn_control()
    out = {
        "local[8]": r8,
        "local[32]": r32,
        "efficiency_8_to_32": eff,
        "machine_ceiling": ceil,
    }
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "bench_artifacts", os.environ.get("SCALE_CYCLE_OUT", "round4_scaling_cycles.jsonl"))
    with open(path, "a") as f:
        f.write(json.dumps(out) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
