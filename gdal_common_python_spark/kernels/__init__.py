"""Pure-numpy geometry / raster / cell kernels.

Everything in this subpackage is Spark-free and GDAL-free: plain functions on
numpy arrays and small Python containers. The Spark layer only ever calls
these on Arrow batches inside pandas UDFs / applyInPandas kernels, so the
exact-parity logic is unit-testable without a SparkSession (SURVEY.md §5.2).
"""
