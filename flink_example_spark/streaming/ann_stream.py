"""Streaming ANN — top-k similarity search over a LIVE query stream.

The production shape for embedding search in an ingest pipeline: the corpus
is a static (periodically refreshed) table; query vectors arrive as a
stream; each micro-batch is answered with the SAME batch operator
(``similarity.cosine_topk`` — broadcast query batch, zero corpus shuffle)
via foreachBatch. A query's top-k never changes once emitted (the corpus is
fixed for the batch), so per-micro-batch evaluation is exact and the
bounded replay converges to the batch relation — it shares the
``ann_cosine_topk`` oracle.

foreachBatch is at-least-once: writes are keyed on ``batch_id``
(mode=overwrite into a per-batch directory), so a replayed batch overwrites
its own prior output instead of duplicating rows.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_example_spark.session import tune
from flink_example_spark.streaming.staging import stamp_chunk_mtimes


def run_streaming_ann_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    chunks: int = 2,
) -> DataFrame:
    """Bounded replay: the ``vec_id < 8`` query set streamed in ``chunks``
    micro-batches against the static embeddings corpus; the union of
    per-batch answers equals batch ``cosine_topk`` exactly."""
    from flink_example_spark.operators.similarity import cosine_topk
    from flink_example_spark.streaming.pipeline import _read_batches
    from flink_example_spark.tables import load_table

    tune(spark)
    corpus = load_table(spark, sf_dir, "embeddings")
    queries = corpus.filter(F.col("vec_id") < 8)

    tmpdir = tempfile.mkdtemp(prefix="stream_ann_")
    for i in range(chunks):
        queries.filter(F.col("vec_id") % chunks == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(tmpdir, f"chunk_{i}"))
    stamp_chunk_mtimes(tmpdir)

    q_stream = (
        spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(tmpdir, "chunk_*"))
    )
    sink = tempfile.mkdtemp(prefix="stream_ann_out_")

    def handle(batch: DataFrame, batch_id: int) -> None:
        out = cosine_topk(corpus, batch, k=k)
        out.write.mode("overwrite").parquet(f"{sink}/batch={batch_id}")

    q = q_stream.writeStream.foreachBatch(handle).trigger(availableNow=True).start()
    q.awaitTermination()
    return _read_batches(spark, sink)


def run_streaming_bm25(
    spark: SparkSession,
    sf_dir: str,
    queries: list[tuple[int, str]],
    topk: int = 10,
    chunks: int = 2,
) -> DataFrame:
    """Streaming BM25 — live text queries answered against the static
    corpus, the lexical twin of :func:`run_streaming_ann_topk`: each query
    micro-batch runs the SAME batch ``bm25_topk`` (corpus stats are fixed
    per batch, so per-query answers never change once emitted) and the
    bounded replay converges to the batch relation — shares the
    ``text_bm25_topk`` oracle."""
    from flink_example_spark.operators.text import bm25_topk
    from flink_example_spark.streaming.pipeline import _read_batches
    from flink_example_spark.tables import load_table

    tune(spark)
    corpus = load_table(spark, sf_dir, "documents")
    qdf = spark.createDataFrame(list(queries), "query_id bigint, query_text string")

    tmpdir = tempfile.mkdtemp(prefix="stream_bm25_")
    for i in range(chunks):
        qdf.filter(F.col("query_id") % chunks == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(tmpdir, f"chunk_{i}"))
    stamp_chunk_mtimes(tmpdir)

    q_stream = (
        spark.readStream.schema(qdf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(tmpdir, "chunk_*"))
    )
    sink = tempfile.mkdtemp(prefix="stream_bm25_out_")

    def handle(batch: DataFrame, batch_id: int) -> None:
        out = bm25_topk(corpus, batch, topk=topk)
        out.write.mode("overwrite").parquet(f"{sink}/batch={batch_id}")

    q = q_stream.writeStream.foreachBatch(handle).trigger(availableNow=True).start()
    q.awaitTermination()
    return _read_batches(spark, sink)
