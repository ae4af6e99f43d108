"""Example spark-submit job: the flagship spatial join, cluster-shaped.

    python3 scripts/package.py
    spark-submit --master 'local[8]' \
        --py-files dist/gdal_common_python_spark.zip \
        scripts/submit_job.py <sf_dir> [output_dir]

Imports resolve from the shipped zip (no repo on the executors' path);
writes the join result as parquet and prints a one-line summary.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1]
    out_dir = sys.argv[2] if len(sys.argv) > 2 else None
    spark = SparkSession.builder.appName("spatial_join_submit").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from gdal_common_python_spark.operators import spatial_join as sj

    docs = spark.read.parquet(f"{sf_dir}/documents_spans.parquet")
    zones = spark.read.parquet(f"{sf_dir}/zones.parquet")
    result = sj.spatial_join_points(spark, docs, zones)
    if out_dir:
        result.write.mode("overwrite").parquet(out_dir)
        n = spark.read.parquet(out_dir).count()
    else:
        n = result.count()
    print(f"SUBMIT_RESULT rows={n}")
    spark.stop()


if __name__ == "__main__":
    main()
