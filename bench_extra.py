"""Extra benchmarks for optimization work (guide §1) — bench.py stays FROZEN.

Measures declared queries one at a time with the same materialization the
driver's bench uses (xxhash64 over all columns -> sum; count() would let
Catalyst prune), labels jobs, and optionally dumps `.explain("formatted")`
per query to a directory.

Usage:
  python bench_extra.py --sf-dir /tmp/ndspark_sf1 [--cold] [--runs 2]
         [--explain-dir plans/r06] [--suffix _after] [names...]

Notes:
  * --cold times build+materialize in one go (matches bench.py's COLD set);
    default is warm (one untimed materialize first, then best-of --runs).
  * every invocation recomputes from the parquet inputs; nothing is cached
    across processes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--cold", action="store_true")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from nifi_daffodil_spark.plans import driver_queries as dq
    from nifi_daffodil_spark.session import build_session

    spark = build_session(app_name="bench_extra", cores=args.cpus,
                          shuffle_partitions=args.cpus)
    qs = dq.queries()
    names = args.names or list(qs)

    def _materialize(df) -> None:
        df.select(F.xxhash64(*df.columns).cast("double").alias("_h")).agg(
            F.sum("_h")
        ).collect()

    out: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if args.cold:
            t0 = time.monotonic()
            _materialize(qs[name](spark, args.sf_dir))
            out[name] = round(time.monotonic() - t0, 2)
        else:
            df = qs[name](spark, args.sf_dir)
            if args.explain_dir:
                os.makedirs(args.explain_dir, exist_ok=True)
                with open(os.path.join(args.explain_dir, f"{name}{args.suffix}.txt"), "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            _materialize(df)  # warm
            walls = []
            for _ in range(args.runs):
                t0 = time.monotonic()
                _materialize(df)
                walls.append(time.monotonic() - t0)
            out[name] = round(min(walls), 2)
        print(f"{name}: {out[name]}s", file=sys.stderr, flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": args.sf_dir, "cold": args.cold, "queries": out,
                      "total": round(sum(out.values()), 2)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
