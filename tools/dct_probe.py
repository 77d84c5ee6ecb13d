"""DCT fingerprint scale probe: image_phash and audio_dct_bands wall
clock at 1x / 4x the sf0.1 documents corpus (synthetic growth by doc_id
offset, so payload sizes and the media mix are unchanged).

Claim under test: both fingerprints are embarrassingly parallel — the
Python stage is per-row decode, the JVM stage joins a 64-row broadcast
basis — so wall scales ~linearly with the corpus (no shuffle grows
superlinearly).

Run on a QUIET box: python tools/dct_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_example_spark.operators.multimodal import (  # noqa: E402
    audio_dct_bands,
    encode_codec_media,
    image_phash,
)
from flink_example_spark.session import get_spark  # noqa: E402
from flink_example_spark.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dct-probe")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    for mult in (1, 4):
        d = docs
        for i in range(1, mult):
            d = d.unionByName(
                docs.select(
                    (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                    "text",
                )
            )
        d = d.localCheckpoint()
        media = encode_codec_media(d, formats=("pgm", "aiff"))
        t0 = time.perf_counter()
        image_phash(
            media.filter(F.col("media_type") == "image"), repartition=False
        ).write.format("noop").mode("overwrite").save()
        t_img = time.perf_counter() - t0
        t0 = time.perf_counter()
        audio_dct_bands(
            media.filter(F.col("media_type") == "audio"), repartition=False
        ).write.format("noop").mode("overwrite").save()
        t_aud = time.perf_counter() - t0
        print(
            f"mult={mult} docs={n * mult} phash={t_img:.2f}s"
            f" audio_dct={t_aud:.2f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
