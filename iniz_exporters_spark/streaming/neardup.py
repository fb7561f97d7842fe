"""Streaming corpus near-dup detection (extension surface).

The continual-ingest companion to ``operators.dedup.incremental_neardup``:
an unbounded document stream is checked against a STANDING corpus's
MinHash-LSH artifacts, emitting (batch_id, corpus_id, jaccard) duplicate
links per micro-batch — the quarantine/monitoring feed an ingest pipeline
tails before admitting documents to the training corpus.

Why this shape streams cleanly:

  * The stream side needs ONE fused mapInPandas pass (shingle hashes +
    band buckets in a single kernel — no second read of the micro-batch,
    no stream-stream self-join).
  * Every join is STREAM-STATIC and stateless in Structured Streaming: no
    watermark, no state store, flat per-batch latency. The corpus
    artifacts (band buckets + shingle sets) are bounded relations computed
    once per corpus snapshot; at 100 TB they are parquet artifacts
    refreshed by the batch pipeline, not broadcast — pre-bucket them on
    (band, bucket) / id (sources/bucketing.py) so only the (small)
    micro-batch side exchanges.
  * Within-stream duplicates (doc repeated across micro-batches) are the
    job of ``stateful.streaming_dedup_first`` upstream; this module's
    contract is purely batch-vs-corpus.

Batch-first design: the same composition runs on a static frame, which is
how the parity test pins it against ``incremental_neardup``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from iniz_exporters_spark.functions.text import MOD
from iniz_exporters_spark.operators.dedup import (
    _np_shingle_hashes,
    _perm_mins,
    buckets_from_shingle_sets,
    shingle_sets,
)
from iniz_exporters_spark.pinning import pin


def corpus_neardup_artifacts(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
    rows_per_band: int = 4,
    k: int = 5,
) -> tuple[DataFrame, DataFrame]:
    """(buckets, shingle_sets) for the standing corpus — the write-once
    artifacts the stream joins against. Pin them (localCheckpoint, or
    persist to parquet between corpus refreshes) so every micro-batch
    reads the materialized copy instead of re-hashing the corpus."""
    hs = shingle_sets(corpus, id_col, text_col, k).transform(pin)
    buckets = buckets_from_shingle_sets(
        hs, id_col, num_perm, rows_per_band
    ).select(F.col(id_col).alias("corpus_id"), "band", "bucket")
    hs_named = hs.select(
        F.col(id_col).alias("corpus_id"), F.col("hs").alias("hs_corpus")
    )
    return buckets, hs_named


def _stream_signature_rows(
    stream_df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int,
    rows_per_band: int,
    k: int,
) -> DataFrame:
    """(id, band, bucket, hs) — one fused Arrow pass over the micro-batch:
    shingle-hash set and all band buckets per doc, identical values to the
    batch kernels (same ``_np_shingle_hashes`` / ``_perm_mins`` math)."""
    import pandas as pd

    id_type = dict(stream_df.dtypes)[id_col]
    n_bands = num_perm // rows_per_band
    out_schema = (
        f"{id_col} {id_type}, band int, bucket long, hs array<long>"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, bands, buckets, sets = [], [], [], []
            for i, t in zip(pdf[id_col].values, pdf[text_col].values):
                hs = _np_shingle_hashes(t or "", k)
                m = _perm_mins(np.asarray(hs, dtype=np.int64), num_perm)
                hs_list = hs.tolist()
                for band in range(n_bands):
                    acc = 0
                    for v in m[
                        band * rows_per_band : (band + 1) * rows_per_band
                    ]:
                        acc = (acc * 31 + int(v)) % MOD
                    ids.append(i)
                    bands.append(band)
                    buckets.append(acc)
                    sets.append(hs_list)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "band": np.array(bands, dtype=np.int32),
                    "bucket": buckets,
                    "hs": sets,
                }
            )

    return stream_df.select(id_col, text_col).mapInPandas(kernel, out_schema)


def streaming_corpus_neardup(
    stream_df: DataFrame,
    corpus_buckets: DataFrame,
    corpus_hs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    num_perm: int = 16,
    rows_per_band: int = 4,
    k: int = 5,
) -> DataFrame:
    """(batch_id, corpus_id, jaccard) duplicate links from a (possibly
    streaming) document frame into the standing corpus, same band geometry
    and exact-verify semantics as ``incremental_neardup`` — a pair flagged
    here is exactly a pair the batch path flags.

    All joins are stream-static; per-batch cost is O(batch bands +
    candidates). Note the one stateful op: in streaming mode
    ``dropDuplicates`` on (id, corpus_id) is GLOBAL across micro-batches —
    each candidate link alerts at most once per query lifetime, with state
    bounded by distinct LSH-collision links (candidate-bound, small by
    construction). For strictly bounded state, run the batch path
    (``incremental_neardup``) inside ``foreachBatch`` instead.
    """
    sig = _stream_signature_rows(
        stream_df, id_col, text_col, num_perm, rows_per_band, k
    )
    cand = (
        sig.join(corpus_buckets, ["band", "bucket"])
        .filter(F.col(id_col) != F.col("corpus_id"))
        .dropDuplicates([id_col, "corpus_id"])
        .select(
            F.col(id_col).alias("batch_id"), "corpus_id", F.col("hs")
        )
    )
    inter = F.size(F.array_intersect("hs", "hs_corpus"))
    union = F.size("hs") + F.size("hs_corpus") - inter
    return (
        cand.join(corpus_hs, "corpus_id")
        .withColumn("jaccard", F.round(inter.cast("double") / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("batch_id", "corpus_id", "jaccard")
    )
