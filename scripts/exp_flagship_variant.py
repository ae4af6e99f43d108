"""Experiment: flagship variant (arrow-PIP broadcast vs native edge-join)
steady-state wall at a given core count, optionally taskset-pinned.

Usage: python scripts/exp_flagship_variant.py VARIANT CORES SF [ITERS]
Prints STEADY_SEC=<min wall> ROWS=<n>.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    variant, cores, sf = sys.argv[1], sys.argv[2], sys.argv[3]
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    from gdal_common_python_spark import synth
    from gdal_common_python_spark.session import get_spark
    from gdal_common_python_spark.operators import spatial_join as sj

    sdir = synth.sf_dir(sf)
    if cores.startswith("x"):  # "x4" = local-cluster with 4 two-core executors
        n_exec = int(cores[1:])
        spark = get_spark(app=f"exp[{variant}][{cores}]", executors=n_exec)
    else:
        cores = int(cores)
        spark = get_spark(app=f"exp[{variant}][{cores}]", cores=cores,
                          shuffle_partitions=max(cores, 8))
    docs = spark.read.parquet(os.path.join(sdir, "documents_spans.parquet"))
    zones = spark.read.parquet(os.path.join(sdir, "zones.parquet"))
    if variant == "arrow":
        out = sj.spatial_join_points(spark, docs, zones, res=9, strategy="broadcast")
    elif variant == "edge":
        out = sj.spatial_join_points_distributed(spark, docs, zones, res=9,
                                                 strategy="broadcast")
    else:
        raise SystemExit(f"unknown variant {variant}")
    rows = out.count()  # warm-up
    best = float("inf")
    for _ in range(iters):
        t0 = time.monotonic()
        out.count()
        best = min(best, time.monotonic() - t0)
    print(f"STEADY_SEC={best:.4f} ROWS={rows}")
    spark.stop()


if __name__ == "__main__":
    main()
