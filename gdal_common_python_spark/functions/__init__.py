"""Scalar function surface (SURVEY §2.8): date helpers, unit constants,
geometry measures — all native Column expressions or Arrow kernels."""
