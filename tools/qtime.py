"""Per-query timing + plan capture harness (guide §1: measure first).

Times queries with the FROZEN bench methodology (build, then min-of-3
``df.count()``), optionally also a noop-sink run (§1.4) to time full-column
materialization, and writes ``.explain("formatted")`` to a plans dir.

Usage:
    python3 tools/qtime.py [--sf DIR] [--plans DIR] [--noop] [--reps N] q1 q2 ...

One JSON line per query to stdout; does NOT touch bench.py or its record.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402  (module scope: pandas_udf type hints)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans", default=None, help="dir for explain('formatted') dumps")
    ap.add_argument("--suffix", default="", help="plan filename suffix, e.g. _before")
    ap.add_argument("--noop", action="store_true", help="also time a noop-sink write")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from gdal_common_python_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="qtime", cores=cpus, shuffle_partitions=max(cpus, 8))
    qs = entrymod.queries()

    # same session warm-up as bench.py so the first query doesn't pay the
    # python-worker/codegen tax
    from pyspark.sql import functions as F, types as T

    @F.pandas_udf(T.DoubleType())
    def _warm(x: pd.Series) -> pd.Series:
        return x * 1.0

    spark.range(1000).select(_warm(F.col("id").cast("double"))).count()

    for name in args.names:
        spark.sparkContext.setJobDescription(f"qtime:{name}")
        tb = time.monotonic()
        df = qs[name](spark, args.sf)
        build = time.monotonic() - tb
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            with open(os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        samples = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            n = df.count()
            samples.append(round(time.monotonic() - t0, 3))
        rec = {"name": name, "build": round(build, 3), "count_min": min(samples),
               "count_samples": samples, "rows": n}
        if args.noop:
            nsamples = []
            for _ in range(args.reps):
                t0 = time.monotonic()
                df.write.format("noop").mode("overwrite").save()
                nsamples.append(round(time.monotonic() - t0, 3))
            rec["noop_min"] = min(nsamples)
            rec["noop_samples"] = nsamples
        spark.catalog.clearCache()
        print(json.dumps(rec), flush=True)
    spark.stop()
    os._exit(0)


if __name__ == "__main__":
    main()
