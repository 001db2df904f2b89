#!/usr/bin/env python3
"""Per-query job/stage profiler: run one (or more) registered queries and
report DAGScheduler job and stage counts plus wall seconds — the
deterministic metrics the r15/r16 optimization rounds steer by (wall alone
is unreadable on this box: OPTIMIZATION_r15.md "Box noise").

Usage: python scripts/profile_jobs.py q335_beam_search_graph_ann [q349...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
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
    names = sys.argv[1:]
    if not names:
        print("usage: profile_jobs.py <query> [...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("profile", master=f"local[{cpus}]")
    tune_for_bench(spark, cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    sc = spark.sparkContext
    out = {}
    for name in names:
        q = REGISTRY[name]
        q.fn(spark, sf_dir).count()  # warm pass (codegen/FS caches)
        jsc = sc._jsc.sc()

        def _ids():
            ds = jsc.dagScheduler()
            j, s = ds.nextJobId(), ds.nextStageId()
            return (j if isinstance(j, int) else j.get(),
                    s if isinstance(s, int) else s.get())

        j0, s0 = _ids()
        t0 = time.perf_counter()
        n = q.fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        j1, s1 = _ids()
        out[name] = {
            "jobs": j1 - j0,
            "stages": s1 - s0,
            "wall_warm_sec": round(wall, 3),
            "rows": n,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
