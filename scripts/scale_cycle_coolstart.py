"""8->32 scaling cycle variant for credit-throttled host windows.

Observation driving this variant (round 3): the hypervisor's throttling
engages under SUSTAINED 32-wide load — short 32-wide bursts (the 15 s
bench kg_pipeline) run at ~0% steal in the same minutes that a long
32-leg probe reports 9-19% steal, and within a probe the first pass is
reliably the worst.  So this cycle (a) cools down before each leg,
(b) runs the 32-core leg FIRST on a full credit budget, and (c) uses 2
measured passes per leg instead of 3 to shorten exposure.  Identical
work per pass as scale_cycle_8_32.py (same probe, same inputs): only
the ordering/pacing changes, which is measurement hygiene, not a
different workload.

Usage: python scripts/scale_cycle_coolstart.py [cooldown_sec]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main() -> int:
    cool = int(sys.argv[1]) if len(sys.argv) > 1 else 90
    time.sleep(cool)
    r32 = bench._probe(32, 80000, n_passes=2)
    time.sleep(cool)
    r8 = bench._probe(8, 20000, n_passes=2)
    eff = round((r32["triples_per_sec"] / r8["triples_per_sec"]) / 4.0, 3)
    ceil = bench._burn_control()
    out = {
        "local[8]": r8,
        "local[32]": r32,
        "efficiency_8_to_32": eff,
        "machine_ceiling": ceil,
        "protocol": "coolstart: 32-leg first after cooldown, 2 passes/leg",
    }
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "bench_artifacts", "round3_scaling_cycles.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps(out) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
