"""Training-data pipeline operators: dedup recall, ANN recall, text, media,
sources (tested on synth + in-memory data; the driver gate covers exactness
vs DuckDB)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_common_python_spark.operators import dedup, multimodal, similarity, text as text_ops
from gdal_common_python_spark.sources.catalog import IcebergLayoutTable, guess_format
from gdal_common_python_spark.sources.geojson import to_feature_collection


from conftest import assert_no_new_persistent as _assert_no_new_persistent
from conftest import persistent_ids as _persistent_ids


@pytest.fixture(scope="module")
def texts(spark):
    rows = [
        ("d1", "the quick brown fox jumps over the lazy dog"),
        ("d2", "the quick brown fox jumps over the lazy dog"),  # exact dup
        ("d3", "the quick brown fox jumped over the lazy dog"),  # near dup
        ("d4", "el rapido zorro marron salta sobre el perro perezoso que es muy lento"),
        ("d5", "completely different content about distributed query engines"),
        ("d6", ""),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


class TestDedup:
    def test_exact(self, texts):
        out = dedup.exact_duplicates(texts).collect()
        assert len(out) == 1 and out[0].n_docs == 2 and out[0].keep_id == "d1"

    def test_minhash_lsh_finds_near_dup(self, texts):
        signed = dedup.minhash_docs(texts, k=16, n=3)
        pairs = dedup.lsh_candidate_pairs(signed, bands=8, rows=2).collect()
        got = {(p.a_id, p.b_id) for p in pairs}
        assert ("d1", "d2") in got  # exact dup always collides
        est = {(p.a_id, p.b_id): p.est_jaccard for p in pairs}
        assert est[("d1", "d2")] == 1.0

    def test_ngram_jaccard(self, texts):
        pairs = texts.sparkSession.createDataFrame(
            pd.DataFrame([("d1", "d2"), ("d1", "d3"), ("d1", "d5")], columns=["a_id", "b_id"])
        )
        out = {(r.a_id, r.b_id): r.jaccard for r in dedup.ngram_jaccard_pairs(texts, pairs).collect()}
        assert out[("d1", "d2")] == 1.0
        assert 0.0 < out[("d1", "d3")] < 1.0
        assert out[("d1", "d5")] == 0.0

    def test_minhash_similarity_join_cross_table(self, spark):
        """Cross-table LSH join finds left-right near matches, never
        left-left or right-right pairs, reports each pair once, and takes
        no cache (each side is read once)."""
        rows_l = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (3, "entirely unrelated text about distributed engines"),
        ]
        rows_r = [
            (2, "the quick brown fox jumps over the lazy dog"),
            (4, "the quick brown fox jumps over the lazy dog"),
            (6, "some other unrelated benchmark sentence entirely"),
        ]
        left = spark.createDataFrame(pd.DataFrame(rows_l, columns=["doc_id", "text"]))
        right = spark.createDataFrame(pd.DataFrame(rows_r, columns=["doc_id", "text"]))
        before = _persistent_ids(spark)
        out = dedup.minhash_similarity_join(left, right, threshold=0.5, bands=8, rows=2)
        got = sorted((r.a_id, r.b_id, r.est_jaccard) for r in out.collect())
        assert got == [(1, 2, 1.0), (1, 4, 1.0)]
        _assert_no_new_persistent(spark, before)

    def test_near_dup_clusters_transitive_and_released(self, spark):
        """A~B and B~C must land in ONE cluster (transitive closure), the
        canonical member is the min id, singletons self-cluster, and every
        cache the operator takes is released by util.release()."""
        from gdal_common_python_spark.operators.util import release

        rows = [
            (10, "alpha beta gamma delta epsilon zeta eta theta"),
            (11, "alpha beta gamma delta epsilon zeta eta theta"),  # = 10
            (12, "alpha beta gamma delta epsilon zeta eta theta"),  # = 10
            (13, "totally different words live in this document here"),
        ]
        docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
        # earlier tests may hold their own (unreleased) caches — measure
        # relative to the pre-op level, not absolute zero
        before = _persistent_ids(spark)
        out = dedup.near_dup_clusters(docs, threshold=0.5, bands=8, rows=2)
        got = {r.doc_id: (r.cluster_id, r.is_canonical) for r in out.collect()}
        assert got == {
            10: (10, True),
            11: (10, False),
            12: (10, False),
            13: (13, True),
        }
        assert out._gcp_cc_rounds >= 1
        release(out)
        _assert_no_new_persistent(spark, before)

    def test_ngram_structs_match_lambda_form(self, spark):
        """The zip/struct n-gram builder must reproduce the interpreted
        transform() lambda formula string-for-string (the DuckDB oracles
        mirror that formula) — including short docs (< n tokens, null
        padding + concat_ws skip) and duplicate grams."""
        rows = [
            ("a", "x y z x y z x y"),  # dup grams
            ("b", "one two"),  # shorter than n=3
            ("c", "solo"),  # single token
            ("d", "  padded   whitespace  runs "),  # \s+ runs
        ]
        docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
        toks = F.split(F.trim(F.col("text")), r"\s+")
        for n in (2, 3):
            lam = F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
            old = docs.select("doc_id", F.posexplode(lam))
            new = docs.select(
                "doc_id", F.posexplode(dedup.ngram_structs_col(toks, n)).alias("pos", "s")
            ).select("doc_id", "pos", dedup.ngram_string("s", n))
            assert sorted(map(tuple, old.collect())) == sorted(map(tuple, new.collect()))

    def test_simhash_similarity_order(self, texts):
        out = {r.doc_id: r.simhash for r in dedup.simhash_docs(texts, bits=32).collect()}
        def ham(a, b):
            return bin(a ^ b).count("1")
        assert ham(out["d1"], out["d2"]) == 0
        assert ham(out["d1"], out["d3"]) < ham(out["d1"], out["d5"])


class TestSimilarity:
    def test_lsh_recall_vs_bruteforce(self, spark):
        rng = np.random.default_rng(3)
        base = rng.normal(size=(8, 16))
        rows = []
        for i in range(80):
            v = base[i % 8] + rng.normal(scale=0.05, size=16)
            rows.append((i, v.astype(np.float32).tolist()))
        emb = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
        exact = {
            (r.vec_id, r.neighbor_id) for r in similarity.cosine_topk(emb, k=3).collect()
        }
        approx = {
            (r.vec_id, r.neighbor_id)
            for r in similarity.lsh_topk(emb, k=3, n_planes=4, dim=16).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall > 0.8, recall

    def test_ivf_recall_vs_bruteforce(self, spark):
        rng = np.random.default_rng(7)
        base = rng.normal(size=(8, 16))
        rows = []
        for i in range(80):
            v = base[i % 8] + rng.normal(scale=0.05, size=16)
            rows.append((i, v.astype(np.float32).tolist()))
        emb = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
        exact = {
            (r.vec_id, r.neighbor_id) for r in similarity.cosine_topk(emb, k=3).collect()
        }
        approx = {
            (r.vec_id, r.neighbor_id)
            for r in similarity.ivf_topk(emb, k=3, n_centroids=8, n_probe=2).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall > 0.8, recall
        # determinism: same input -> identical result set
        again = {
            (r.vec_id, r.neighbor_id)
            for r in similarity.ivf_topk(emb, k=3, n_centroids=8, n_probe=2).collect()
        }
        assert approx == again

    def test_lsh_high_dim_no_codegen_blowup(self, spark):
        # dim=512 with array-literal hyperplanes: the old per-component
        # literal chain exploded codegen/constant pools at real embedding
        # dims; this pins that realistic dims run end-to-end
        rng = np.random.default_rng(11)
        base = rng.normal(size=(4, 512))
        rows = []
        for i in range(40):
            v = base[i % 4] + rng.normal(scale=0.03, size=512)
            rows.append((i, v.astype(np.float32).tolist()))
        emb = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
        exact = {(r.vec_id, r.neighbor_id) for r in similarity.cosine_topk(emb, k=3).collect()}
        approx = {
            (r.vec_id, r.neighbor_id)
            for r in similarity.lsh_topk(emb, k=3, n_planes=4, dim=512).collect()
        }
        assert len(exact & approx) / len(exact) > 0.8
        nd = similarity.lsh_near_dup(emb, threshold=0.95, n_planes=4, n_tables=4, dim=512)
        assert nd.count() > 0

    def test_near_dup_empty_input(self, spark):
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        )
        empty = spark.createDataFrame([], schema)
        assert similarity.cosine_near_dup(empty, threshold=0.9).count() == 0
        assert similarity.lsh_near_dup(empty, threshold=0.9, dim=8).count() == 0

    def test_near_dup_exact_and_lsh(self, spark):
        from gdal_common_python_spark import synth

        emb = spark.read.parquet(synth.ensure_embeddings("sf0.001"))
        exact = similarity.cosine_near_dup(emb, threshold=0.9).collect()
        assert len(exact) > 0
        # planted copies sit well above the threshold; random pairs well below
        assert all(r.cos > 0.93 for r in exact)
        exact_pairs = {(r.a_id, r.b_id) for r in exact}
        approx = {
            (r.a_id, r.b_id)
            for r in similarity.lsh_near_dup(emb, threshold=0.9, n_planes=6, n_tables=4).collect()
        }
        # OR-amplified LSH: no false positives (exact filter), high recall
        assert approx <= exact_pairs
        assert len(approx & exact_pairs) / len(exact_pairs) >= 0.9


class TestText:
    def test_profile_basics(self, texts):
        out = {r.doc_id: r for r in text_ops.text_profile(texts).collect()}
        assert out["d1"].n_tokens == 9
        assert out["d6"].n_tokens == 0
        assert out["d1"].lang_guess == "en"
        assert out["d4"].lang_guess == "es"
        assert 0.0 <= out["d1"].quality <= 1.0
        assert out["d1"].fp == out["d2"].fp != out["d3"].fp

    def test_scrub_pii(self, spark):
        """Counts measure the ORIGINAL text per category; replacement is
        sequential in pattern order (an earlier category's token is never
        re-matched by a later pattern); clean text passes through."""
        rows = [
            (1, "mail a.b-c@x.co and 10.0.0.1 ssn 123-45-6789 card 4111111111111111"),
            (2, "two mails p@q.io r@s.net one ip 192.168.1.1"),
            (3, "nothing sensitive here"),
            (4, ""),
        ]
        docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
        out = {r.doc_id: r for r in text_ops.scrub_pii(docs).collect()}
        assert out[1].text == "mail <EMAIL> and <IP> ssn <SSN> card <CARD>"
        assert (out[1].n_email, out[1].n_ipv4, out[1].n_ssn, out[1].n_card) == (1, 1, 1, 1)
        assert out[2].text == "two mails <EMAIL> <EMAIL> one ip <IP>"
        assert out[2].n_email == 2 and out[2].n_ipv4 == 1
        assert out[3].text == "nothing sensitive here"
        assert (out[3].n_email, out[3].n_ipv4, out[3].n_ssn, out[3].n_card) == (0, 0, 0, 0)
        assert out[4].text == ""

    def test_repetition_profile_planted(self, spark):
        import pandas as pd

        docs = spark.createDataFrame(
            pd.DataFrame(
                [
                    # "a b" 2-gram repeats: 2-grams = [ab, ba, ab, ba, ab] -> 2/5 distinct
                    dict(doc_id=1, text="a b a b a b"),
                    dict(doc_id=2, text="w x y z"),  # all distinct
                    dict(doc_id=3, text=" "),  # blank
                ]
            )
        )
        out = {r.doc_id: r for r in text_ops.repetition_profile(docs).collect()}
        assert out[1].n_tokens == 6
        assert abs(out[1].dup_2gram_frac - (1 - 2 / 5)) < 1e-12
        assert abs(out[1].top_tok_frac - 0.5) < 1e-12
        assert out[1].flagged
        assert out[2].dup_2gram_frac == 0.0 and not out[2].flagged
        assert out[3].n_tokens == 0 and out[3].top_tok_frac == 0.0 and not out[3].flagged


class TestMultimodal:
    def test_media_features_plumbing(self, docs):
        out = multimodal.extract_media_features(docs)
        rows = out.collect()
        spans = multimodal.media_spans(docs).count()
        assert len(rows) == spans > 0
        r = rows[0]
        assert len(r.features) == multimodal.FEATURE_DIM
        assert r.media_ref == f"{r.raster_id}/{r.band}"
        assert 64 <= r.width < 256


class TestSources:
    def test_guess_format(self):
        assert guess_format("a/b.parquet") == "parquet"
        assert guess_format("a/b.geojson") == "json"
        assert guess_format("warehouse/zones") == "iceberg_layout"

    def test_iceberg_layout_snapshots(self, spark, zones, tmp_path):
        t = IcebergLayoutTable(str(tmp_path / "ztab"))
        t.append(zones.limit(10).select("zone_id", "name"))
        assert t.read(spark).count() == 10
        t.append(zones.limit(5).select("zone_id", "name"))
        assert t.read(spark).count() == 15
        t.overwrite(zones.limit(3).select("zone_id", "name"))
        assert t.read(spark).count() == 3

    def test_iceberg_layout_time_travel(self, spark, zones, tmp_path):
        t = IcebergLayoutTable(str(tmp_path / "tt"))
        t.append(zones.limit(10).select("zone_id", "name"), stats_cols=["zone_id"])
        t.append(zones.limit(5).select("zone_id", "name"))
        t.overwrite(zones.limit(3).select("zone_id", "name"))
        # latest = v3; every prior snapshot stays readable
        assert t.read(spark).count() == 3
        assert t.read(spark, version=1).count() == 10
        assert t.read(spark, version=2).count() == 15
        hist = t.history()
        assert [h["version"] for h in hist] == [1, 2, 3]
        assert [h["operation"] for h in hist] == ["append", "append", "overwrite"]
        assert hist[0]["n_rows"] == 10  # stats commit records counts
        import pytest as _pt

        with _pt.raises(FileNotFoundError):
            t.read(spark, version=9)

    def test_iceberg_layout_stats_pruning(self, spark, tmp_path):
        """Manifest min/max stats must prune files, and a pruned read plus
        residual filter must equal the full scan's answer."""
        import pandas as pd
        from pyspark.sql import functions as F

        t = IcebergLayoutTable(str(tmp_path / "pr"))
        # three commits with disjoint key ranges -> >=3 files with stats
        for lo in (0, 1000, 2000):
            pdf = pd.DataFrame({"k": range(lo, lo + 100), "v": range(100)})
            t.append(spark.createDataFrame(pdf).coalesce(1), stats_cols=["k"])
        all_files = t.plan_files()
        pruned = t.plan_files(ranges={"k": (1010, 1020)})
        assert len(pruned) < len(all_files) and len(pruned) >= 1
        got = (
            t.read(spark, ranges={"k": (1010, 1020)})
            .filter((F.col("k") >= 1010) & (F.col("k") <= 1020))
            .count()
        )
        assert got == 11
        # open-ended ranges and an unknown-stats column never lose rows
        assert len(t.plan_files(ranges={"k": (None, 50)})) >= 1
        assert t.plan_files(ranges={"v2": (0, 1)}) == all_files
        # fully-pruned read: empty frame, schema intact
        empty = t.read(spark, ranges={"k": (99999, 99999)})
        assert empty.count() == 0 and set(empty.columns) == {"k", "v"}

    def test_iceberg_merge_by_key_prunes_rewrites(self, spark, tmp_path):
        """Copy-on-write merge must rewrite ONLY files whose key stats
        overlap the incoming keys; everything else carries by reference."""
        import pandas as pd
        from pyspark.sql import functions as F

        t = IcebergLayoutTable(str(tmp_path / "mg"))
        for lo in (0, 1000, 2000):
            pdf = pd.DataFrame({"k": range(lo, lo + 100), "v": [0] * 100})
            t.append(spark.createDataFrame(pdf).coalesce(1), stats_cols=["k"])
        upd = spark.createDataFrame(pd.DataFrame({"k": [1005, 1010, 9999], "v": [7, 7, 7]}))
        res = t.merge_by_key(upd, "k")
        # only the middle commit's file(s) overlap [1005, 9999]... 9999 maxes
        # past every file, so files with max < 1005 (first commit) carry
        assert res["carried"] >= 1 and res["rewritten"] >= 1
        got = {r.k: r.v for r in t.read(spark).collect()}
        assert len(got) == 301  # 300 originals - 2 updated + 2 updated + 1 new
        assert got[1005] == 7 and got[1010] == 7 and got[9999] == 7
        assert got[1006] == 0 and got[5] == 0
        assert t.history()[-1]["operation"] == "merge"
        assert t.history()[-1]["n_rows"] == 301

    def test_iceberg_optimize_compacts_and_sorts(self, spark, tmp_path):
        """OPTIMIZE: many small appends -> few range-sorted files whose key
        ranges are disjoint, so manifest pruning works afterwards."""
        import pandas as pd

        t = IcebergLayoutTable(str(tmp_path / "opt"))
        # 6 appends with INTERLEAVED key ranges: pre-optimize, every file
        # overlaps every key range, so stats cannot prune
        for i in range(6):
            pdf = pd.DataFrame({"k": range(i, 3000, 6), "v": [i] * 500})
            t.append(spark.createDataFrame(pdf).coalesce(1), stats_cols=["k"])
        assert len(t.plan_files(ranges={"k": (10, 20)})) == 6  # no pruning possible
        res = t.optimize(spark, sort_col="k", num_files=3)
        assert res["files_before"] == 6 and res["files_after"] == 3
        pruned = t.plan_files(ranges={"k": (10, 20)})
        assert len(pruned) == 1  # ranges now disjoint
        assert t.read(spark).count() == 3000  # nothing lost
        assert t.history()[-1]["operation"] == "optimize"

    def test_iceberg_expire_snapshots(self, spark, tmp_path):
        import os

        import pandas as pd
        import pytest as _pt

        t = IcebergLayoutTable(str(tmp_path / "exp"))
        t.append(spark.createDataFrame(pd.DataFrame({"k": [1, 2]})).coalesce(1))
        t.overwrite(spark.createDataFrame(pd.DataFrame({"k": [3]})).coalesce(1))
        t.overwrite(spark.createDataFrame(pd.DataFrame({"k": [4]})).coalesce(1))
        res = t.expire_snapshots(keep_last=1)
        assert res["versions_dropped"] == 2 and res["files_deleted"] >= 2
        assert [h["version"] for h in t.history()] == [3]
        assert {r.k for r in t.read(spark).collect()} == {4}
        with _pt.raises(FileNotFoundError):
            t.read(spark, version=1)
        # only live data files remain on disk
        live = {os.path.basename(p) for p in t.plan_files()}
        on_disk = {
            f
            for d, _, fs in os.walk(t.data_dir)
            for f in fs
            if f.endswith(".parquet")
        }
        assert on_disk == live

    def test_iceberg_expire_keeps_shared_files(self, spark, tmp_path):
        """A file referenced by BOTH an expired and a kept snapshot must
        survive (append chains share files across versions)."""
        import pandas as pd

        t = IcebergLayoutTable(str(tmp_path / "shr"))
        t.append(spark.createDataFrame(pd.DataFrame({"k": [1]})).coalesce(1))
        t.append(spark.createDataFrame(pd.DataFrame({"k": [2]})).coalesce(1))
        res = t.expire_snapshots(keep_last=1)  # v1 expired, but v2 holds its file
        assert res["files_deleted"] == 0
        assert {r.k for r in t.read(spark).collect()} == {1, 2}

    def test_iceberg_snapshot_diff(self, spark, tmp_path):
        import pandas as pd

        t = IcebergLayoutTable(str(tmp_path / "df"))
        t.append(spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3], "v": [1, 1, 1]})))
        t.overwrite(spark.createDataFrame(pd.DataFrame({"k": [2, 3, 4], "v": [1, 9, 1]})))
        d = {(r.k, r.v, r._change) for r in t.diff(spark, 1, 2).collect()}
        assert d == {
            (1, 1, "removed"), (3, 1, "removed"),
            (3, 9, "added"), (4, 1, "added"),
        }

    def test_iceberg_layout_zorder_composition(self, spark, tmp_path):
        """layout_by_zorder + stats commit = file skipping for bbox reads:
        a small bbox must touch a strict minority of the files."""
        import numpy as np
        import pandas as pd
        from gdal_common_python_spark.operators import layout

        rng = np.random.default_rng(21)
        pdf = pd.DataFrame(
            {"lon": rng.uniform(-60, 60, 8000), "lat": rng.uniform(-60, 60, 8000)}
        )
        clustered = layout.layout_by_zorder(
            spark.createDataFrame(pdf), "lon", "lat", res=12, num_partitions=8
        )
        t = IcebergLayoutTable(str(tmp_path / "zo"))
        t.append(clustered, stats_cols=["zkey"])
        # bbox -> zkey range: corners of a small box (z-order is not an
        # interval map, so [z(lo), z(hi)] over-covers — still prunes)
        from pyspark.sql import functions as F

        probe = spark.createDataFrame(pd.DataFrame({"lon": [5.0, 6.0], "lat": [5.0, 6.0]}))
        zlo, zhi = [
            r.z
            for r in probe.select(
                layout.zorder_key(F.col("lon"), F.col("lat"), 12).alias("z")
            ).collect()
        ]
        pruned = t.plan_files(ranges={"zkey": (min(zlo, zhi), max(zlo, zhi))})
        assert len(pruned) < len(t.plan_files())
        # pruned read + exact residual equals the full-scan answer
        res = (
            t.read(spark, ranges={"zkey": (min(zlo, zhi), max(zlo, zhi))})
            .filter(
                (F.col("lon") >= 5) & (F.col("lon") <= 6)
                & (F.col("lat") >= 5) & (F.col("lat") <= 6)
            )
            .count()
        )
        want = len(
            pdf[(pdf.lon >= 5) & (pdf.lon <= 6) & (pdf.lat >= 5) & (pdf.lat <= 6)]
        )
        assert res == want

    def test_geojson(self, zones):
        import json

        s = to_feature_collection(zones.limit(2))
        obj = json.loads(s)
        assert obj["type"] == "FeatureCollection" and len(obj["features"]) == 2
        assert obj["features"][0]["geometry"]["type"] == "Polygon"
        # zone schema: all non-geometry columns become properties
        props = obj["features"][0]["properties"]
        assert "zone_id" in props and "category" in props and "rings" not in props

    def test_geojson_generic_schemas(self, spark):
        # export must derive properties from ANY schema, not a hardcoded one
        import json

        custom = spark.createDataFrame(
            pd.DataFrame(
                {
                    "parcel": ["a1", "b2"],
                    "owner": ["x", "y"],
                    "score": [0.5, 0.75],
                    "rings": [
                        [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]]],
                        [[[2.0, 2.0], [3.0, 2.0], [3.0, 3.0]]],
                    ],
                }
            )
        )
        obj = json.loads(to_feature_collection(custom))
        f = obj["features"][0]
        assert set(f["properties"]) == {"parcel", "owner", "score"}
        assert f["geometry"]["coordinates"] == [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]]]
        # point layer round-trip
        pts = spark.createDataFrame(
            pd.DataFrame({"pid": [1, 2], "x": [10.0, 11.5], "y": [-3.0, 4.25]})
        )
        pobj = json.loads(to_feature_collection(pts, geometry_type="Point"))
        g = pobj["features"][1]["geometry"]
        assert g["type"] == "Point" and g["coordinates"] == [11.5, 4.25]
        assert set(pobj["features"][0]["properties"]) == {"pid"}

    def test_geojson_nested_multipolygon(self, spark):
        # RFC 7946 shape for a holed multipart layer: per-part
        # [exterior, holes...] nesting, closed rings, CCW exteriors / CW
        # holes — the OGR ExportToJson grouping
        import json

        from gdal_common_python_spark.kernels import geom as G

        holed_multipart = spark.createDataFrame(
            pd.DataFrame(
                {
                    "fid": [1],
                    "rings": [
                        [
                            # part A: 10x10 outer (CCW) with a 4x4 hole (CW)
                            [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]],
                            [[3.0, 3.0], [3.0, 7.0], [7.0, 7.0], [7.0, 3.0]],
                            # part B: disjoint 1x1 square (CCW)
                            [[20.0, 20.0], [21.0, 20.0], [21.0, 21.0], [20.0, 21.0]],
                        ]
                    ],
                }
            )
        )
        obj = json.loads(
            to_feature_collection(holed_multipart, geometry_type="MultiPolygon")
        )
        g = obj["features"][0]["geometry"]
        assert g["type"] == "MultiPolygon"
        parts = g["coordinates"]
        assert len(parts) == 2
        holed = next(p for p in parts if len(p) == 2)
        solo = next(p for p in parts if len(p) == 1)
        for part in parts:
            for ring in part:
                assert ring[0] == ring[-1]  # closed per spec
        ext = np.asarray(holed[0][:-1])
        hole = np.asarray(holed[1][:-1])
        assert G.signed_area(ext) > 0  # exterior CCW
        assert G.signed_area(hole) < 0  # hole CW
        assert abs(G.signed_area(hole)) == pytest.approx(16.0)
        assert abs(G.signed_area(np.asarray(solo[0][:-1]))) == pytest.approx(1.0)


class TestMeasures:
    def test_calc_geometry(self, spark, zones):
        from gdal_common_python_spark.functions import units as U
        from gdal_common_python_spark.functions.measures import calc_geometry
        from gdal_common_python_spark.operators.reproject import reproject

        merc = reproject(zones.limit(5), 3857)
        out = calc_geometry(merc, "area_km2", U.AREA_SQ_KILOMETER, 3857).collect()
        for r in out:
            assert r.area_km2 > 0
        with pytest.raises(ValueError):
            calc_geometry(zones, "x", U.AREA_SQ_METER, 4326)


class TestMultimodalProperties:
    def test_resize_props(self, spark, docs):
        from gdal_common_python_spark.operators import multimodal

        rows = multimodal.resize_media(docs, 224, 224).collect()
        assert rows
        for r in rows:
            # letterbox: within target, at least 1px, aspect preserved to trunc
            assert 1 <= r.width <= 224 and 1 <= r.height <= 224
            scale = min(224 / r.src_width, 224 / r.src_height)
            assert r.width == max(1, int(r.src_width * scale))
            assert r.height == max(1, int(r.src_height * scale))

    def test_frame_sample_props_and_determinism(self, spark, docs):
        from gdal_common_python_spark.operators import multimodal

        a = multimodal.frame_sample(docs, every_n=10).collect()
        b = multimodal.frame_sample(docs, every_n=10).collect()
        key = lambda r: (r.doc_id, r.offset, r.frame_idx)  # noqa: E731
        assert sorted(map(key, a)) == sorted(map(key, b))  # deterministic
        for r in a:
            assert 1 <= r.n_frames <= 64
            assert r.frame_idx % 10 == 0 and r.frame_idx < r.n_frames
            assert len(r.features) == multimodal.FEATURE_DIM


class TestSimhashNearDup:
    def test_pigeonhole_completeness(self, spark):
        # with max_hamming < bands, banding finds EVERY pair within the
        # radius — verify against brute force over all fingerprint pairs
        rng = np.random.default_rng(13)
        base = int(rng.integers(0, 2**32))
        rows = []
        for i in range(60):
            sig = base
            for b in rng.choice(32, size=int(rng.integers(0, 6)), replace=False):
                sig ^= 1 << int(b)
            rows.append((i, sig))
        signed = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "simhash"]))
        got = {
            (r.a_id, r.b_id): r.hamming
            for r in dedup.simhash_candidate_pairs(signed, bands=4, max_hamming=3).collect()
        }
        brute = {}
        for i, si in rows:
            for j, sj in rows:
                if i < j and bin(si ^ sj).count("1") <= 3:
                    brute[(i, j)] = bin(si ^ sj).count("1")
        assert got == brute and len(brute) > 0


class TestCosineTopkBlocked:
    """The blocked-GEMM exact top-k: the multi-block merge path is not
    reachable at the gate scales (sf0.01 fits one block), so pin it here —
    tiny blocks must reproduce the single-block result and a local numpy
    reference exactly."""

    def _emb(self, spark, n=90, d=12, seed=5):
        rng = np.random.default_rng(seed)
        rows = [(i, rng.normal(size=d).astype(np.float32).tolist()) for i in range(n)]
        return spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))

    def _ref(self, emb, k):
        pdf = emb.toPandas().sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        cos = Xn @ Xn.T
        out = set()
        for i in range(len(ids)):
            order = sorted(
                (j for j in range(len(ids)) if j != i),
                key=lambda j: (-cos[i, j], ids[j]),
            )[:k]
            for r, j in enumerate(order, 1):
                out.add((int(ids[i]), r, int(ids[j])))
        return out

    def test_multi_block_matches_single_block_and_reference(self, spark):
        emb = self._emb(spark)
        single = {
            (r.vec_id, r.rank, r.neighbor_id)
            for r in similarity.cosine_topk(emb, k=4).collect()
        }
        multi = {
            (r.vec_id, r.rank, r.neighbor_id)
            for r in similarity.cosine_topk(
                emb, k=4, query_block=16, corpus_block=24
            ).collect()
        }
        assert multi == single == self._ref(emb, 4)

    def test_k_exceeds_corpus(self, spark):
        emb = self._emb(spark, n=6)
        got = {
            (r.vec_id, r.rank, r.neighbor_id)
            for r in similarity.cosine_topk(emb, k=10, corpus_block=4).collect()
        }
        # every point gets exactly n-1 neighbours, ranks 1..5
        assert got == self._ref(emb, 10)
        assert len(got) == 6 * 5

    def test_zero_norm_vector_nan_ordering(self, spark):
        """A zero-norm embedding yields NaN cosine against everything; Spark
        and DuckDB ORDER BY treat NaN as the largest double, so the zero
        vector must appear at rank 1 of every other point's list (tie-broken
        by id), not be dropped the way numpy's default NaN sort would."""
        rng = np.random.default_rng(9)
        rows = [(i, rng.normal(size=8).astype(np.float32).tolist()) for i in range(20)]
        rows.append((99, [0.0] * 8))
        emb = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
        got = {
            (r.vec_id, r.rank, r.neighbor_id)
            for r in similarity.cosine_topk(emb, k=3, corpus_block=8).collect()
        }
        # every real point ranks the zero vector first (NaN == largest)
        for i in range(20):
            assert (i, 1, 99) in got, sorted(t for t in got if t[0] == i)
