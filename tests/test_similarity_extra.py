"""r15 Lloyd driver-update port: the kmeans/PQ centroid update moved to
the driver (parameter-bounded (cells x dim) quantized sums; fixed IEEE
double sequences) — these witnesses pin BIT-equality against the kept
all-in-engine chains."""

from __future__ import annotations

from flink_example_spark.tables import load_table


def _embs(spark):
    return load_table(spark, "/root/testdata/sf0.001", "embeddings")


def _exact_rows(df, keys):
    return sorted(
        (tuple(r[k] for k in keys), list(r["c_vec"]), r["c_norm"])
        for r in df.collect()
    )


def test_kmeans_driver_update_matches_inengine(spark):
    from flink_example_spark.operators.similarity import (
        kmeans_centroids,
        kmeans_centroids_inengine,
    )

    e = _embs(spark)
    got = _exact_rows(kmeans_centroids(e, k=8, iters=2), ["cell"])
    want = _exact_rows(kmeans_centroids_inengine(e, k=8, iters=2), ["cell"])
    # exact float equality — the driver assembly must replicate the
    # engine's IEEE sequence bit-for-bit, not approximately
    assert got == want and len(got) > 1


def test_pq_driver_update_matches_inengine(spark):
    from flink_example_spark.operators.similarity import (
        pq_codebooks,
        pq_codebooks_inengine,
    )

    e = _embs(spark)
    got = _exact_rows(pq_codebooks(e, m=4, k_sub=8, iters=2), ["sub", "cell"])
    want = _exact_rows(
        pq_codebooks_inengine(e, m=4, k_sub=8, iters=2), ["sub", "cell"]
    )
    assert got == want and len(got) > 4
