#!/usr/bin/env python3
"""Bench-scale soak: run EVERY registered query Spark-side at
$SPARK_GRAFT_SF_DIR (default sf0.1) and report failures + stragglers.

The correctness gate runs at sf0.01; this catches the failure class that
only appears at 10× that — quadratic intermediates, iterative plan/lineage
blowup, heap pressure (it caught a driver OOM in connected components and a
users-quadratic day-join in round 1). One JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rdkafka_streams_spark import get_spark, tune_for_bench  # noqa: E402
from rdkafka_streams_spark.queries import REGISTRY  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("soak", master=f"local[{cpus}]")
    tune_for_bench(spark, cpus)
    spark.sparkContext.setLogLevel("ERROR")

    fails: list[list[str]] = []
    slow: list[list[object]] = []
    for name, q in sorted(REGISTRY.items()):
        t0 = time.perf_counter()
        try:
            q.fn(spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 1)
            if dt > 5:
                slow.append([name, dt])
        except Exception as ex:  # noqa: BLE001 — soak reports, never aborts
            fails.append([name, f"{type(ex).__name__}: {str(ex)[:120]}"])
    print(
        json.dumps(
            {"sf_dir": sf_dir, "total": len(REGISTRY), "fails": fails, "slow_gt_5s": slow}
        )
    )
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
