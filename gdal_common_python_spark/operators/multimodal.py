"""Multimodal (media) span processing — Spark plumbing real, codecs stubbed.

Media spans carry ``media_ref = '<raster_id>/<band>'`` (FIXTURES.md §1);
in a production corpus the ref would point at image/audio/video bytes in an
object store. The image/audio libraries are not in this container, so the
DECODE step is a clearly-marked deterministic stub; everything around it —
schema, Arrow batch shape, mapInPandas partitioning, metadata join — is the
real distributed plumbing and is tested.

``extract_media_features`` yields one row per media span with typed metadata
and a fixed-size feature vector. Swap ``_decode_stub`` for a real decoder
(PIL/ffmpeg) without touching the Spark plan.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

FEATURE_DIM = 8

_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("raster_id", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _decode_stub(media_ref: str) -> dict:
    """STUB: deterministic fake decode (md5-seeded). A real implementation
    would fetch bytes and decode via PIL/ffmpeg — not installed here."""
    h = hashlib.md5(media_ref.encode()).digest()
    rng = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    return dict(
        width=int(64 + h[0] % 192),
        height=int(64 + h[1] % 192),
        format="stub/raw",
        features=(rng[:FEATURE_DIM] / 255.0).tolist(),
    )


def media_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, offset, media_ref) for kind='media' spans — native."""
    return (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select("doc_id", F.col("s.offset").alias("offset"), F.col("s.media_ref").alias("media_ref"))
    )


def extract_media_features(docs: DataFrame) -> DataFrame:
    """Decode + featurize every media span (mapInPandas, Arrow batches)."""
    spans = media_spans(docs)

    def kernel(batches):
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                meta = _decode_stub(row.media_ref)
                rid, band = row.media_ref.split("/")
                rows.append(
                    dict(
                        doc_id=row.doc_id,
                        offset=int(row.offset),
                        media_ref=row.media_ref,
                        raster_id=rid,
                        band=int(band),
                        **meta,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "offset",
                    "media_ref",
                    "raster_id",
                    "band",
                    "width",
                    "height",
                    "format",
                    "features",
                ],
            )

    return spans.mapInPandas(kernel, _SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def resize_media(docs: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Stub-resize every media span to (target_w, target_h), preserving
    aspect by letterboxing the shorter axis (the arithmetic is real; the
    pixel resample is the stubbed codec step). One row per media span with
    source + target dims and a deterministic content hash standing in for
    the resized bytes."""
    spans = media_spans(docs)

    def kernel(batches):
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                meta = _decode_stub(row.media_ref)
                sw, sh = meta["width"], meta["height"]
                scale = min(target_w / sw, target_h / sh)
                ow, oh = max(1, int(sw * scale)), max(1, int(sh * scale))
                digest = hashlib.md5(
                    f"{row.media_ref}|{ow}x{oh}".encode()
                ).hexdigest()
                rows.append(
                    dict(
                        doc_id=row.doc_id,
                        offset=int(row.offset),
                        media_ref=row.media_ref,
                        src_width=sw,
                        src_height=sh,
                        width=ow,
                        height=oh,
                        content_md5=digest,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _RESIZE_SCHEMA.fields])

    return spans.mapInPandas(kernel, _RESIZE_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def frame_sample(docs: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-style frame sampling: each media span fans out to one row per
    sampled frame (every `every_n`-th of the stub-decoded frame count) —
    the one-to-many mapInPandas shape a real ffmpeg frame extractor uses.
    Frame features derive deterministically from (media_ref, frame_idx)."""
    spans = media_spans(docs)

    def kernel(batches):
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                h = hashlib.md5(row.media_ref.encode()).digest()
                n_frames = int(1 + h[2] % 64)
                for fi in range(0, n_frames, every_n):
                    fh = hashlib.md5(f"{row.media_ref}#{fi}".encode()).digest()
                    feats = (
                        np.frombuffer(fh, dtype=np.uint8).astype(np.float32)[
                            :FEATURE_DIM
                        ]
                        / 255.0
                    ).tolist()
                    rows.append(
                        dict(
                            doc_id=row.doc_id,
                            offset=int(row.offset),
                            media_ref=row.media_ref,
                            frame_idx=fi,
                            n_frames=n_frames,
                            features=feats,
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in _FRAME_SCHEMA.fields])

    return spans.mapInPandas(kernel, _FRAME_SCHEMA)


def media_dedup(docs: DataFrame) -> DataFrame:
    """Cross-document media deduplication over the interleaved spans shape:
    every media span whose ``media_ref`` already appears earlier in the
    corpus is a duplicate -> (media_ref, doc_id, offset, canonical_doc_id,
    canonical_offset), one row per NON-canonical occurrence. The canonical
    occurrence of a ref is the (doc_id, offset)-minimum (lexicographic) —
    deterministic and engine-independent, so runs are resume-stable.

    100 TB shape: media spans explode natively (text spans are filtered
    before anything moves), the canonical table is ONE map-side-combined
    groupBy(media_ref).min(struct) — a hot ref (the same image embedded in
    millions of documents) partially aggregates on every input partition,
    so the shuffle carries one row per (partition, ref), not per
    occurrence. The join back is a plain equi-join on media_ref where AQE
    skew-split handles any residual hot key. No windows, no global sorts.
    """
    ms = media_spans(docs)
    canon = ms.groupBy("media_ref").agg(
        F.min(F.struct("doc_id", "offset")).alias("c")
    ).select(
        "media_ref",
        F.col("c.doc_id").alias("canonical_doc_id"),
        F.col("c.offset").alias("canonical_offset"),
    )
    return (
        ms.join(canon, "media_ref")
        .where(
            (F.col("doc_id") != F.col("canonical_doc_id"))
            | (F.col("offset") != F.col("canonical_offset"))
        )
        .select(
            "media_ref", "doc_id", "offset",
            "canonical_doc_id", "canonical_offset",
        )
    )


def media_dedup_oracle_sql(rel: str) -> str:
    """DuckDB mirror of :func:`media_dedup` — row_number over (doc_id,
    offset) picks the same lexicographic-minimum canonical occurrence."""
    return f"""
WITH ms AS (
  SELECT doc_id, sp."offset" AS "offset", sp.media_ref AS media_ref
  FROM (SELECT doc_id, unnest(spans) AS sp FROM {rel})
  WHERE sp.kind = 'media'
),
c AS (
  SELECT media_ref, doc_id AS canonical_doc_id, "offset" AS canonical_offset,
         row_number() OVER (PARTITION BY media_ref ORDER BY doc_id, "offset") AS rn
  FROM ms
)
SELECT m.media_ref, m.doc_id, m."offset",
       c.canonical_doc_id, c.canonical_offset
FROM ms m
JOIN (SELECT * FROM c WHERE rn = 1) c USING (media_ref)
WHERE NOT (m.doc_id = c.canonical_doc_id AND m."offset" = c.canonical_offset)
"""


def caption_pairs(docs: DataFrame) -> DataFrame:
    """Image-text alignment pairs from the interleaved spans shape: each
    media span is paired with its NEAREST text span by |offset| distance
    (ties go to the PRECEDING span, i.e. the smaller offset) ->
    (doc_id, media_ref, media_off, caption_off, caption). Media spans in a
    document with zero text spans emit no row. This is the standard
    captioning-pair extraction for multimodal training corpora: the
    adjacent prose is the weak caption label for the embedded image.

    100 TB shape — ZERO shuffle, pure whole-stage codegen: the nearest-
    text scan is a per-document fold (F.aggregate) over the spans array
    nested inside a transform over the media spans; nothing leaves its
    input partition and no span text is ever exploded. The fold keeps the
    running (diff, toff, caption) minimum, visiting candidates in array
    order, which IS offset order (the north-rule invariant), so the
    result equals the (|Δoffset|, offset)-lexicographic minimum the
    DuckDB window oracle computes.
    """
    txts = F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("text"))
    meds = F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("media"))

    def best(m):
        init = F.struct(
            F.lit(1 << 62).cast("long").alias("diff"),
            F.lit(-1).cast("long").alias("toff"),
            F.lit(None).cast("string").alias("caption"),
        )

        def merge(acc, s):
            toff = s["offset"].cast("long")
            d = F.abs(toff - m["offset"].cast("long"))
            better = (d < acc["diff"]) | (
                (d == acc["diff"]) & (toff < acc["toff"])
            )
            return F.when(
                better,
                F.struct(
                    d.alias("diff"),
                    toff.alias("toff"),
                    s["text"].alias("caption"),
                ),
            ).otherwise(acc)

        return F.aggregate(txts, init, merge)

    pairs = F.transform(
        meds,
        lambda m: F.struct(
            m["media_ref"].alias("media_ref"),
            m["offset"].alias("media_off"),
            best(m).alias("b"),
        ),
    )
    return (
        docs.select("doc_id", F.explode(pairs).alias("p"))
        .where(F.col("p.b.caption").isNotNull())
        .select(
            "doc_id",
            F.col("p.media_ref").alias("media_ref"),
            F.col("p.media_off").alias("media_off"),
            F.col("p.b.toff").alias("caption_off"),
            F.col("p.b.caption").alias("caption"),
        )
    )


def caption_pairs_oracle_sql(rel: str) -> str:
    """DuckDB mirror of :func:`caption_pairs`: unnest both kinds, window
    arg-min over (|Δoffset|, text offset) per media span."""
    return f"""
WITH med AS (
  SELECT doc_id, sp.media_ref AS media_ref, sp."offset" AS media_off
  FROM (SELECT doc_id, unnest(spans) AS sp FROM {rel})
  WHERE sp.kind = 'media'
),
txt AS (
  SELECT doc_id, sp."text" AS caption, sp."offset" AS toff
  FROM (SELECT doc_id, unnest(spans) AS sp FROM {rel})
  WHERE sp.kind = 'text'
),
j AS (
  SELECT m.doc_id, m.media_ref, m.media_off, t.toff, t.caption,
         row_number() OVER (
           PARTITION BY m.doc_id, m.media_off
           ORDER BY abs(t.toff - m.media_off), t.toff
         ) AS rn
  FROM med m JOIN txt t USING (doc_id)
)
SELECT doc_id, media_ref, media_off, CAST(toff AS BIGINT) AS caption_off, caption
FROM j WHERE rn = 1
"""


def rewrite_without(docs: DataFrame, strikes: DataFrame) -> DataFrame:
    """Order-preserving document rewrite: strike the (doc_id, offset) rows
    of ``strikes`` from each document's span array, keep surviving spans in
    their original relative order re-bound to dense offsets 0..n-1 -> one
    flat row per surviving span (doc_id, offset, kind, text, media_ref).
    Documents whose every span is struck disappear from the output. The
    shared rewrite core of :func:`rewrite_dedup_media` and
    ``curation.strip_boilerplate``.

    100 TB shape: strikes aggregate to ONE array per affected document
    (map-side combined, shuffle ∝ struck spans). The join back to docs is
    on the table's primary key doc_id — broadcast when the strike set is
    small (size-gated probe), else a plain equi-join that bucketing on
    doc_id co-locates; AQE splits any residual skew. The rewrite itself is
    a zero-shuffle filter + indexed transform, then a native posexplode.
    """
    from .util import broadcastable

    rm = strikes.groupBy("doc_id").agg(F.collect_list("offset").alias("rm_offs"))
    if broadcastable(rm, row_limit=2_000_000):
        rm = F.broadcast(rm)
    keep = F.filter(
        F.col("spans"),
        lambda s: ~F.coalesce(
            F.array_contains(F.col("rm_offs"), s["offset"]), F.lit(False)
        ),
    )
    # the dense re-bound offset IS the element's position in the filtered
    # array — posexplode emits it natively, replacing an interpreted
    # per-span transform lambda (struct rebuild per survivor) with a
    # codegen Generate
    return (
        docs.join(rm, "doc_id", "left")
        .select("doc_id", F.posexplode(keep).alias("offset", "s"))
        .select(
            "doc_id",
            "offset",
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
        )
    )


def rewrite_dedup_media(docs: DataFrame) -> DataFrame:
    """Order-preserving document rewrite after cross-corpus media dedup:
    every NON-canonical media span (per :func:`media_dedup`) is struck
    from its document -> flat surviving spans with dense re-bound offsets
    (see :func:`rewrite_without`). This is the curation step the dedup
    feeds: the corpus after rewrite carries each media asset once, and
    every document still satisfies the span-sequence invariant (kind,
    text, media_ref, order).

    100 TB shape: the strike table is media-spans-only (text never moves);
    see :func:`rewrite_without` for the rewrite plan.
    """
    return rewrite_without(docs, media_dedup(docs).select("doc_id", "offset"))


def rewrite_dedup_media_oracle_sql(rel: str) -> str:
    """DuckDB mirror of :func:`rewrite_dedup_media`: the media_dedup
    canonical window, an anti-join strike, and a per-document
    row_number re-offset ordered by the original span order."""
    return f"""
WITH ms AS (
  SELECT doc_id, sp."offset" AS "offset", sp.media_ref AS media_ref
  FROM (SELECT doc_id, unnest(spans) AS sp FROM {rel})
  WHERE sp.kind = 'media'
),
c AS (
  SELECT doc_id, "offset",
         row_number() OVER (PARTITION BY media_ref ORDER BY doc_id, "offset") AS rn
  FROM ms
),
rm AS (SELECT doc_id, "offset" FROM c WHERE rn > 1),
flat AS (
  SELECT doc_id, sp.kind AS kind, sp."text" AS "text",
         sp.media_ref AS media_ref, sp."offset" AS old_off
  FROM (SELECT doc_id, unnest(spans) AS sp FROM {rel})
),
keep AS (
  SELECT f.* FROM flat f
  WHERE NOT EXISTS (
    SELECT 1 FROM rm WHERE rm.doc_id = f.doc_id AND rm."offset" = f.old_off
  )
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY old_off) - 1 AS INT) AS "offset",
       kind, "text", media_ref
FROM keep
"""


def render_interleaved(
    docs: DataFrame,
    media_sentinel: str = "<|media|>",
    sep: str = "\n",
    geo: str = "drop",
    spans_col: str = "spans",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flatten each interleaved document into one training-ready string ->
    (doc_id, text, n_text, n_media, n_chars): text spans render verbatim in
    span order, media spans render as ``media_sentinel`` (the placeholder a
    multimodal tokenizer later swaps for patch embeddings), geo spans are
    dropped (``geo='drop'``) or rendered as their WKT text (``geo='wkt'``).
    This is the final "serialize for the trainer" step after curation —
    the inverse direction of every span-derived table in this package.

    100 TB shape: ZERO shuffle — one projection over the document spine;
    the span fold is array HOF expressions evaluated inside the scan (span
    arrays are document-sized, so the interpreted-lambda tax is per-span
    string CASEs, not a join or shuffle). Relies on the engine-wide
    invariant that ``spans`` arrays are offset-ordered (synth writes them
    so; ``rewrite_without`` re-binds dense offsets in order)."""
    if geo not in ("drop", "wkt"):
        raise ValueError("geo must be 'drop' or 'wkt'")
    kinds = ("text", "media") if geo == "drop" else ("text", "media", "geo")
    keep = F.filter(spans_col, lambda s: s["kind"].isin(*kinds))
    parts = F.transform(
        keep,
        lambda s: F.when(
            s["kind"] == "media", F.lit(media_sentinel)
        ).otherwise(F.coalesce(s["text"], F.lit(""))),
    )
    txt = F.array_join(parts, sep)
    n_of = lambda k: F.size(F.filter(spans_col, lambda s: s["kind"] == k))  # noqa: E731
    return docs.select(
        F.col(id_col).alias("doc_id"),
        txt.alias("text"),
        n_of("text").alias("n_text"),
        n_of("media").alias("n_media"),
        F.length(txt).alias("n_chars"),
    )


def render_interleaved_oracle_sql(
    rel: str, media_sentinel: str = "<|media|>", sep: str = "\n"
) -> str:
    """DuckDB mirror of :func:`render_interleaved` (geo='drop'): list
    comprehensions over the spans array preserve span order exactly like
    the engine's filter/transform HOFs — no unnest, so zero-renderable-span
    documents stay present with text = ''."""
    sent = media_sentinel.replace("'", "''")
    s = sep.replace("'", "''").replace("\n", "\\n")
    return f"""
SELECT doc_id,
       coalesce(array_to_string(
         [CASE WHEN s.kind = 'media' THEN '{sent}'
               ELSE coalesce(s."text", '') END
          FOR s IN spans IF s.kind IN ('text', 'media')], e'{s}'), '') AS "text",
       CAST(len([s FOR s IN spans IF s.kind = 'text']) AS INT) AS n_text,
       CAST(len([s FOR s IN spans IF s.kind = 'media']) AS INT) AS n_media,
       CAST(length(coalesce(array_to_string(
         [CASE WHEN s.kind = 'media' THEN '{sent}'
               ELSE coalesce(s."text", '') END
          FOR s IN spans IF s.kind IN ('text', 'media')], e'{s}'), '')) AS INT)
         AS n_chars
FROM {rel}
"""


def span_kind_transitions(
    docs: DataFrame,
    spans_col: str = "spans",
) -> DataFrame:
    """Interleaving-structure profile: corpus-wide counts of adjacent span
    kind pairs -> (from_kind, to_kind, n) plus one BOS row per document
    (from_kind = '^' into the first span's kind) — the Markov view of how
    text / media / geo alternate, the statistic a multimodal data mix is
    tuned against (e.g. "how often does an image follow text?").

    100 TB shape: the pair stream derives from each doc's own spans array
    with zip-shifted HOF expressions inside the scan — ZERO shuffle before
    one map-side-combined groupBy over at most (kinds+1) x kinds keys."""
    s = F.col(spans_col)
    kinds = F.transform(s, lambda x: x["kind"])
    pairs = F.when(
        F.size(s) > 0,
        F.concat(
            F.array(F.struct(F.lit("^").alias("a"), F.element_at(kinds, 1).alias("b"))),
            F.zip_with(
                F.slice(kinds, 1, F.greatest(F.size(s) - 1, F.lit(0))),
                F.slice(kinds, 2, F.greatest(F.size(s) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        docs.select(F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.a").alias("from_kind"),
            F.col("p.b").alias("to_kind"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )


def span_kind_transitions_oracle_sql(rel: str) -> str:
    """DuckDB mirror of :func:`span_kind_transitions`: list comprehension
    pairs + a '^' BOS row per non-empty document."""
    return f"""
WITH pairs AS (
  SELECT unnest(
    CASE WHEN len(spans) > 0
    THEN list_append(
      [{{'a': spans[i].kind, 'b': spans[i + 1].kind}}
       FOR i IN range(1, len(spans))],
      {{'a': '^', 'b': spans[1].kind}})
    ELSE []
    END) AS p
  FROM {rel}
)
SELECT p.a AS from_kind, p.b AS to_kind, CAST(count(*) AS BIGINT) AS n
FROM pairs
GROUP BY 1, 2
"""
