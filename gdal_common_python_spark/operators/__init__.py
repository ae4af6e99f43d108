"""Engine operators (SURVEY.md §2): each is a pure function DataFrame -> DataFrame.

All heavy per-element logic runs either JVM-side (native pyspark.sql.functions
inside whole-stage codegen) or in Arrow-vectorized pandas UDF batches — never
per-row Python (BASELINE.json API mandate).
"""
