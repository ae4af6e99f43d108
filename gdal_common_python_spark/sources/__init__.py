"""Sources/sinks (SURVEY §2.1): catalog resolution, Iceberg-layout tables
on plain parquet, GeoJSON export."""
