"""End-to-end corpus curation recipes — the composition story.

A user of the reference gets single operators; a training-data pipeline
needs them CHAINED, and the chain must stay deterministic under
repartitioning, retries and resume. ``curate_corpus`` is the canonical
recipe, every stage a pure function of row content:

    exact dedup (keep min doc_id per md5(text))
    -> quality gate (quality_score >= threshold, token-count band)
    -> deterministic stratified split, keep one split
    -> overlapping token-window chunking

All stages compose into ONE lazy plan (two shuffles total: the dedup
window and nothing else — every other stage is narrow), so Catalyst
optimizes across stage boundaries; nothing materializes in between. The
driver gate `curated_chunks` runs the whole chain against a DuckDB oracle
that composes the same four formulas in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .operators import curation
from .operators.text import quality_score, token_count


def curate_corpus(
    docs: DataFrame,
    quality_min: float = 0.45,
    min_tokens: int = 5,
    max_doc_tokens: int = 100_000,
    split_fracs: dict[str, float] | None = None,
    keep_split: str = "train",
    chunk_tokens: int = 32,
    chunk_overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "lang",
) -> DataFrame:
    """documents -> training chunks (doc_id, chunk_ix, start_tok,
    n_chunk_tokens, chunk_text). See module docstring."""
    fracs = split_fracs if split_fracs is not None else {"train": 0.9, "val": 0.1}
    w = Window.partitionBy(F.md5(F.col(text_col)))
    deduped = (
        docs.withColumn("__keep", F.col(id_col) == F.min(id_col).over(w))
        .filter(F.col("__keep"))
        .drop("__keep")
    )
    t = F.col(text_col)
    gated = deduped.filter(
        (quality_score(t) >= quality_min)
        & (token_count(t) >= min_tokens)
        & (token_count(t) <= max_doc_tokens)
    )
    split = curation.stratified_split(gated, fracs, group_col=group_col, id_col=id_col)
    kept = split.filter(F.col("split") == keep_split).drop("split")
    return curation.chunk_documents(
        kept, max_tokens=chunk_tokens, overlap=chunk_overlap,
        text_col=text_col, id_col=id_col,
    )


def curate_interleaved(
    docs: DataFrame,
    quality_min: float = 0.45,
    min_tokens: int = 5,
    capacity: int = 256,
    media_budget: int = 32,
) -> DataFrame:
    """The end-to-end INTERLEAVED curation recipe: spans-shape documents ->
    packed multimodal context windows.

        content-identity dedup (keep min doc_id per md5 of
            text-spans + kind sequence + media refs)
        -> quality gate on the concatenated text spans
        -> pack_interleaved (concat-then-chop windows)

    The identity key hashes all three components joined by the unit
    separator (chr 31 — cannot appear in the synth vocabulary), so two
    documents that share prose but differ in media or span order are NOT
    merged — the span-sequence invariant (kind, text, media_ref, order)
    IS the document identity. Every stage is a pure function of row
    content (resume/retry stable); the whole chain is ONE lazy plan with
    two shuffles: the dedup window and pack's (doc_id, shard, cost)
    triples. Span text and media refs never shuffle."""
    txt = F.coalesce(
        F.array_join(
            F.transform(
                F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("text")),
                lambda s: s["text"],
            ),
            " ",
        ),
        F.lit(""),
    )
    kindseq = F.array_join(F.transform(F.col("spans"), lambda s: s["kind"]), ",")
    refs = F.coalesce(
        F.array_join(
            F.transform(
                F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("media")),
                lambda s: s["media_ref"],
            ),
            ",",
        ),
        F.lit(""),
    )
    key = F.md5(F.concat_ws("\u001f", txt, kindseq, refs))
    w = Window.partitionBy(key)
    staged = docs.withColumn("__txt", txt).withColumn(
        "__keep", F.col("doc_id") == F.min("doc_id").over(w)
    )
    gated = (
        staged.filter(F.col("__keep"))
        .filter(
            (quality_score(F.col("__txt")) >= quality_min)
            & (token_count(F.col("__txt")) >= min_tokens)
        )
        .drop("__txt", "__keep")
    )
    return curation.pack_interleaved(
        gated, capacity=capacity, media_budget=media_budget
    )
