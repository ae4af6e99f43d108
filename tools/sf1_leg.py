"""The 10x superlinearity leg (round-4 judge ask #6): run the most
expensive SYNTH-BACKED gates at sf0.1 and sf1 (10x docs, ~10.6x raster
pixels over the same geographic window) with the bench's steady-state
protocol and record the per-query wall RATIO. A ratio well above ~15x
(10x data + log factors + a shuffle constant) flags hidden
superlinearity; sub-10x ratios mean fixed costs still dominate at sf0.1.

Excluded (and why): gates reading the driver-provided testdata tables
(documents / orders / lineitem / embeddings — dup_passages,
scrub_contaminated, corpus_overlap, strip_boilerplate, quantize_int8,
curated_packs, ...) exist only up to sf0.1; there is no sf1 testdata to
scale them against. Every synth-backed member of the top-expensive list
is measured.

Usage: python tools/sf1_leg.py  (writes BENCH/bench_sf1_leg.json and
prints one JSON line)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GATES = [
    "spatial_join_pip",
    "zone_keywords",
    "nearest_zone_distance",
    "nearest_zone_distance_distributed",
    "zone_mean_center",
    "zone_corpus_profile",
    "track_resample",
    "track_dwells",
    "cell_rollup",
    "sieve",
    "contour",
    "contour_lines",
    "polygonize",
    "fillnodata",
    "focal_mean",
    "hillshade",
    "ruggedness",
    "proximity",
    "proximity_alloc",
    "slope",
    "footprint",
]


def main():
    from gdal_common_python_spark import synth
    from gdal_common_python_spark.operators.util import release
    from gdal_common_python_spark.session import get_spark
    import __spark_entry__ as entrymod

    dirs = {sf: synth.ensure(sf) for sf in ("sf0.1", "sf1")}
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="sf1leg", cores=cpus, shuffle_partitions=cpus)
    qs = entrymod.queries()
    walls: dict[str, dict[str, float]] = {g: {} for g in GATES}
    builds: dict[str, dict[str, float]] = {g: {} for g in GATES}
    for sf, d in dirs.items():
        for g in GATES:
            tb = time.monotonic()
            df = qs[g](spark, d)
            builds[g][sf] = round(time.monotonic() - tb, 3)
            df.count()  # warm-up: codegen + page cache
            best = float("inf")
            for _ in range(3):
                t0 = time.monotonic()
                df.count()
                best = min(best, time.monotonic() - t0)
            walls[g][sf] = round(best, 3)
            release(df)
            spark.catalog.clearCache()
    out = {
        "metric": "sf1_superlinearity_leg",
        "cpus": cpus,
        "data_ratio": {"docs": 10.0, "raster_pixels_shared": (416 / 128) ** 2,
                       "raster_pixels_shifted": (320 / 96) ** 2},
        "queries": {
            g: {
                "sf0.1_sec": walls[g]["sf0.1"],
                "sf1_sec": walls[g]["sf1"],
                "ratio": round(walls[g]["sf1"] / max(walls[g]["sf0.1"], 1e-9), 2),
                "build_sf1_sec": builds[g]["sf1"],
            }
            for g in GATES
        },
        "excluded_testdata_gates": "dup_passages scrub_contaminated "
        "corpus_overlap strip_boilerplate quantize_int8 curated_packs "
        "(driver testdata exists only to sf0.1)",
        "method": "steady-state min of 3 executions per (gate, scale), "
        "warm-up excluded, cache cleared between gates, one local[%d] "
        "session" % cpus,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH", "bench_sf1_leg.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "method"}))
    os._exit(0)


if __name__ == "__main__":
    main()
