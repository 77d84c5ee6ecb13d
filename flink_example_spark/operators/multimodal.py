"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: media lives in a BINARY column with a
typed metadata struct alongside; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched ``mapInPandas`` stages so each executor
processes whole record batches without JVM↔Python per-row overhead, and the
pipeline repartitions by size-balanced ranges before the expensive decode.

Third-party codec calls are STUBBED (image/audio libraries are not in this
container): ``decode_media`` raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic fake feature vector
(seeded from the payload bytes) with the REAL schema, partitioning, UDF
signature, and batch shape — so the Spark-side plumbing is fully testable.

A REAL codec path exists for the two formats simple enough to implement
from their public specs without libraries: ``encode_codec_media`` packs
genuine PPM (P6) images and WAV (RIFF/PCM) audio payloads byte-for-byte,
and ``decode_codec_media`` parses them back from raw bytes (magic check,
header walk, chunk scan) — no ``fake`` flag, no metadata peeking. The
decoded metadata is oracle-checked: payload content derives
deterministically from the documents table, so DuckDB re-computes the
expected header fields and a data-byte checksum analytically.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_example_spark.operators.util import local_df, spread, spread_sized
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
        StructField("meta_n_bytes", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("meta_n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)

MEDIA_TYPES = ("image", "audio", "video")


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: the utf-8 text bytes
    stand in for an encoded payload; metadata is derived deterministically."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        (F.col("doc_id") % 640 + 1).cast("int").alias("meta_width"),
        (F.col("doc_id") % 480 + 1).cast("int").alias("meta_height"),
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("meta_n_bytes"),
    )


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a decoded feature vector: bytes of
    sha256(payload || i) scaled to [0, 1)."""
    import hashlib

    out: list[float] = []
    i = 0
    while len(out) < dim:
        digest = hashlib.sha256(payload + i.to_bytes(4, "big")).digest()
        out.extend(b / 256.0 for b in digest)
        i += 1
    return out[:dim]


def decode_media(media: DataFrame, dim: int = 16, fake: bool = False) -> DataFrame:
    """Decode payloads into feature vectors via Arrow-batched mapInPandas.

    With ``fake=False`` this raises NotImplementedError at execution time —
    the real codecs (PIL/librosa/ffmpeg) are not available in this container.
    ``fake=True`` exercises the identical plumbing with deterministic fakes.
    """
    import pandas as pd

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs not available in this environment; "
                    "pass fake=True to exercise the pipeline plumbing"
                )
            feats = [
                _fake_feature(bytes(p), dim) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "meta_n_bytes": pdf["meta_n_bytes"],
                    "feature": feats,
                }
            )

    # Hash-spread on media_id before the (real-world: expensive) decode so
    # stragglers don't dominate — at cluster scale this is the knob that
    # keeps 1000 executors busy. (Partitioning on media_type would cap
    # parallelism at the handful of distinct modalities.)
    return spread(media, "media_id").mapInPandas(decode, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_chars", IntegerType(), True),
        StructField("frame_md5", StringType(), True),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4, fake: bool = False) -> DataFrame:
    """Frame sampling for video payloads via Arrow-batched mapInPandas: emit
    up to ``n_frames`` evenly-spaced frames per video as (media_id,
    frame_idx, frame_chars, frame_md5) rows.

    Real codecs (ffmpeg keyframe extraction) are not in this container;
    ``fake=True`` slices the payload into ceil(len/n)-sized character spans
    — deterministic, so the emitted frame fingerprints are reproducible by
    any SQL engine (the driver oracle re-derives them with substr+md5).
    The Spark-side shape is the real one: video-only pushdown filter,
    size-balanced repartition, Arrow batches bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` so one huge payload
    batch can't blow executor memory.
    """
    import hashlib
    import math

    import pandas as pd

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video codecs not available in this environment; "
                    "pass fake=True to exercise the pipeline plumbing"
                )
            out: list[tuple] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                s = bytes(payload).decode("utf-8")
                step = math.ceil(len(s) / n_frames) if s else 1
                for i in range(n_frames):
                    frame = s[i * step : (i + 1) * step]
                    if not frame:
                        break
                    out.append(
                        (mid, i, len(frame), hashlib.md5(frame.encode()).hexdigest())
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return (
        spread(media.filter(F.col("media_type") == "video"), "media_id")
        .mapInPandas(sample, schema=FRAME_SCHEMA)
    )


CODEC_MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), True),
    ]
)

CODEC_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_data_bytes", LongType(), True),
        StructField("first16_sum", LongType(), True),
    ]
)


def _cycle_bytes(seed_hex: str, n: int) -> bytes:
    """Deterministic payload data: the 32 ascii md5-hex chars cycled to n
    bytes — cheap for the encoder AND analytically reproducible by the
    DuckDB oracle (ascii(substr(md5(text), i, 1)))."""
    return (seed_hex * (n // 32 + 1))[:n].encode("ascii")


def _encode_ppm(width: int, height: int, data: bytes) -> bytes:
    assert len(data) == width * height * 3
    return f"P6\n{width} {height}\n255\n".encode("ascii") + data


def _encode_wav(sample_rate: int, channels: int, data: bytes) -> bytes:
    import struct

    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _parse_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a binary-PPM payload from raw bytes: magic, three whitespace-
    separated header tokens (width height maxval), then exactly w*h*3 data
    bytes. Raises ValueError on malformed input."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    tokens, pos = [], 2
    while len(tokens) < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raster data
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    data = payload[pos:]
    if len(data) != width * height * 3:
        raise ValueError("PPM raster size mismatch")
    return width, height, data


def _encode_pgm(width: int, height: int, data: bytes) -> bytes:
    assert len(data) == width * height
    return f"P5\n{width} {height}\n255\n".encode("ascii") + data


def _parse_pgm(payload: bytes) -> tuple[int, int, bytes]:
    """Parse binary-PGM (grayscale sibling of PPM): w*h data bytes."""
    if payload[:2] != b"P5":
        raise ValueError("not a P5 PGM payload")
    tokens, pos = [], 2
    while len(tokens) < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    data = payload[pos:]
    if len(data) != width * height:
        raise ValueError("PGM raster size mismatch")
    return width, height, data


def _encode_f80(x: int) -> bytes:
    """IEEE 754 80-bit extended float (big-endian), exact for positive ints —
    the AIFF COMM sample-rate encoding."""
    import struct

    if x == 0:
        return b"\x00" * 10
    e = x.bit_length() - 1
    mant = x << (63 - e)  # explicit leading 1 in bit 63
    return struct.pack(">HQ", 16383 + e, mant)


def _parse_f80(b: bytes) -> int:
    import struct

    se, mant = struct.unpack(">HQ", b[:10])
    if se == 0 and mant == 0:
        return 0
    e = (se & 0x7FFF) - 16383
    return mant >> (63 - e)


def _encode_aiff(sample_rate: int, channels: int, data: bytes) -> bytes:
    """AIFF: big-endian IFF container — COMM (channels, frames, 16-bit,
    80-bit-float rate) + SSND (offset, blockSize, PCM data)."""
    import struct

    n_frames = len(data) // (channels * 2)
    comm = struct.pack(">hLh", channels, n_frames, 16) + _encode_f80(sample_rate)
    ssnd = struct.pack(">LL", 0, 0) + data
    chunks = b"COMM" + struct.pack(">L", len(comm)) + comm
    chunks += b"SSND" + struct.pack(">L", len(ssnd)) + ssnd
    return b"FORM" + struct.pack(">L", 4 + len(chunks)) + b"AIFF" + chunks


def _parse_aiff(payload: bytes) -> tuple[int, int, bytes]:
    """Parse an AIFF payload: verify FORM/AIFF magic, walk the big-endian
    chunk list for COMM/SSND, decode the 80-bit-float sample rate."""
    import struct

    if payload[:4] != b"FORM" or payload[8:12] != b"AIFF":
        raise ValueError("not a FORM/AIFF payload")
    pos, sample_rate, channels, data = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack(">L", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"COMM":
            channels, _n_frames, bits = struct.unpack(">hLh", body[:8])
            if bits != 16:
                raise ValueError("only 16-bit PCM supported")
            sample_rate = _parse_f80(body[8:18])
        elif cid == b"SSND":
            offset, _block = struct.unpack(">LL", body[:8])
            data = body[8 + offset :]
        pos += 8 + size + (size & 1)  # IFF chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing COMM or SSND chunk")
    return sample_rate, channels, data


def _parse_wav(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a RIFF/WAVE payload from raw bytes: verify magic, walk the
    chunk list for fmt/data (PCM 16-bit only). Raises ValueError on
    malformed input."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sample_rate, channels, data = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_format, channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_format != 1 or bits != 16:
                raise ValueError("only 16-bit PCM supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    return sample_rate, channels, data


def encode_codec_media(
    documents: DataFrame,
    formats: tuple[str, str] = ("ppm", "wav"),
    size_aware: bool = False,
) -> DataFrame:
    """REAL encoder: pack each document into a genuine media payload — an
    image format for even doc_ids, an audio format for odd ones
    (``formats`` = (image_fmt, audio_fmt): ppm/pgm and wav/aiff; wav is
    little-endian RIFF, aiff its big-endian IFF sibling with an 80-bit
    extended-float sample rate). Dimensions/rates derive from doc_id and
    data bytes from md5(text), so an external oracle can predict every
    decoded field without running Python. Arrow-batched mapInPandas;
    payloads are a few KB each.
    """
    import hashlib

    import pandas as pd

    img_fmt, aud_fmt = formats
    img_encode = {"ppm": _encode_ppm, "pgm": _encode_pgm}[img_fmt]
    img_depth = 3 if img_fmt == "ppm" else 1
    aud_encode = {"wav": _encode_wav, "aiff": _encode_aiff}[aud_fmt]

    def encode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    continue
                mid = int(mid)
                hh = hashlib.md5(text.encode("utf-8")).hexdigest()
                if mid % 2 == 0:
                    w, h = mid % 32 + 8, mid % 24 + 8
                    payload = img_encode(w, h, _cycle_bytes(hh, w * h * img_depth))
                    rows.append((mid, "image", payload))
                else:
                    sr, ch = 8000 + (mid % 8) * 1000, 1 + mid % 2
                    n_frames = mid % 64 + 16
                    payload = aud_encode(sr, ch, _cycle_bytes(hh, n_frames * ch * 2))
                    rows.append((mid, "audio", payload))
            yield pd.DataFrame(rows, columns=["media_id", "media_type", "payload"])

    # single-file harness parquet scans as ONE partition — spread before
    # the Python-side packing so every core encodes. size_aware=True (the
    # light pack+parse codec rows, r15): derive the width from the input
    # size estimate so a toy input does not pay defaultParallelism Python
    # worker startups; heavy per-row consumers (DCT/resize) keep full
    # width.
    sp = spread_sized if size_aware else spread
    return (
        sp(documents.select("doc_id", "text"), "doc_id")
        .mapInPandas(encode, schema=CODEC_MEDIA_SCHEMA)
    )


def decode_codec_media(media: DataFrame, repartition: bool = True) -> DataFrame:
    """REAL decoder: parse PPM/WAV payloads from raw bytes (magic check,
    header tokens, RIFF chunk walk) — nothing is read from metadata columns,
    only from the payload. Emits typed metadata plus ``first16_sum`` (the sum
    of the first 16 data bytes) as the content-roundtrip check.

    Same 100 TB shape as ``decode_media``: size-balanced repartition before
    the CPU-bound parse, Arrow-batched mapInPandas, malformed payloads fail
    loudly (ValueError) rather than silently skewing stats.
    """
    import pandas as pd

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                if payload is None:
                    continue
                payload = bytes(payload)
                if payload[:2] == b"P6":
                    w, h, data = _parse_ppm(payload)
                    rows.append((int(mid), mtype, w, h, 3, None, len(data), sum(data[:16])))
                elif payload[:2] == b"P5":
                    w, h, data = _parse_pgm(payload)
                    rows.append((int(mid), mtype, w, h, 1, None, len(data), sum(data[:16])))
                elif payload[:4] == b"RIFF":
                    sr, ch, data = _parse_wav(payload)
                    rows.append(
                        (int(mid), mtype, None, None, ch, sr, len(data), sum(data[:16]))
                    )
                elif payload[:4] == b"FORM":
                    sr, ch, data = _parse_aiff(payload)
                    rows.append(
                        (int(mid), mtype, None, None, ch, sr, len(data), sum(data[:16]))
                    )
                else:
                    raise ValueError(f"unrecognized payload magic for media {mid}")
            yield pd.DataFrame(
                rows, columns=[f.name for f in CODEC_META_SCHEMA.fields]
            )

    # repartition=False lets a caller that already hash-spread the payloads
    # (e.g. straight off encode_codec_media) chain both Python stages in one
    # task without re-shuffling payload bytes
    if repartition:
        media = spread(media, "media_id")
    return media.mapInPandas(decode, schema=CODEC_META_SCHEMA)


CHUNK_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("chunk_idx", IntegerType(), False),
        StructField("n_frames", IntegerType(), False),
        StructField("byte_sum", LongType(), False),
    ]
)


def chunk_audio(
    media: DataFrame, frames_per_chunk: int = 16, repartition: bool = True
) -> DataFrame:
    """Audio chunking over REAL WAV payloads: parse each RIFF/PCM payload
    from raw bytes (the ``_parse_wav`` codec), slice the PCM stream into
    frame-aligned chunks of ``frames_per_chunk`` frames, and emit per-chunk
    (frame count, data-byte sum) — the frame-sampling analog for audio
    (NEXT.md #3). The last chunk may be short but stays frame-aligned.

    Scale shape mirrors ``sample_frames``: audio-only pushdown filter,
    size-balanced repartition, Arrow-batched mapInPandas.
    """
    import pandas as pd

    def chunk(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                _sr, ch, data = _parse_wav(bytes(payload))
                frame_bytes = ch * 2
                chunk_bytes = frames_per_chunk * frame_bytes
                for ci in range(0, len(data), chunk_bytes):
                    seg = data[ci : ci + chunk_bytes]
                    rows.append(
                        (int(mid), ci // chunk_bytes, len(seg) // frame_bytes, sum(seg))
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in CHUNK_SCHEMA.fields])

    audio = media.filter(F.col("media_type") == "audio")
    if repartition:
        audio = spread(audio, "media_id")
    return audio.mapInPandas(chunk, schema=CHUNK_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata aggregation — stays entirely JVM-side."""
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("meta_n_bytes").alias("total_bytes"),
        F.max("meta_n_bytes").alias("max_bytes"),
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("in_w", IntegerType(), False),
        StructField("in_h", IntegerType(), False),
        StructField("out_w", IntegerType(), False),
        StructField("out_h", IntegerType(), False),
        StructField("out_payload", BinaryType(), False),
        StructField("out_sum", LongType(), False),
    ]
)


def resize_image(
    media: DataFrame, factor: int = 4, method: str = "nearest", repartition: bool = True
) -> DataFrame:
    """REAL image resize: parse each PGM/PPM payload from raw bytes,
    downsample by integer ``factor`` (out dims = floor(in/factor)),
    re-encode in the same format, then RE-PARSE the new payload to produce
    ``out_sum`` (sum of all data bytes of the resized image) — so the
    emitted stats prove the full decode → transform → encode → decode
    roundtrip, not just the sampling arithmetic.

    ``method``: 'nearest' (out pixel (Y, X) = in pixel (Y·f, X·f)) or
    'box' (anti-aliased: per-channel integer mean of the f×f block,
    floor division — pure integer arithmetic, so an external oracle can
    re-derive every output byte).

    Same 100 TB shape as the other codec stages: hash-spread on media_id
    before the CPU-bound byte work, Arrow-batched mapInPandas, loud
    failures on malformed payloads. Non-image payloads are ignored.
    """
    import pandas as pd

    if factor < 1:
        raise ValueError("factor must be >= 1")
    if method not in ("nearest", "box"):
        raise ValueError(f"unknown resize method {method!r}")

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                if payload[:2] == b"P6":
                    w, h, data = _parse_ppm(payload)
                    depth, enc, parse = 3, _encode_ppm, _parse_ppm
                elif payload[:2] == b"P5":
                    w, h, data = _parse_pgm(payload)
                    depth, enc, parse = 1, _encode_pgm, _parse_pgm
                else:
                    continue
                ow, oh = w // factor, h // factor
                if ow < 1 or oh < 1:
                    raise ValueError(f"media {mid}: {w}x{h} too small for /{factor}")
                out = bytearray()
                for y in range(oh):
                    for x in range(ow):
                        if method == "nearest":
                            p = (y * factor * w + x * factor) * depth
                            out += data[p : p + depth]
                        else:
                            for c in range(depth):
                                s = 0
                                for dy in range(factor):
                                    row0 = ((y * factor + dy) * w + x * factor) * depth
                                    for dx in range(factor):
                                        s += data[row0 + dx * depth + c]
                                out.append(s // (factor * factor))
                new_payload = enc(ow, oh, bytes(out))
                _, _, new_data = parse(new_payload)  # roundtrip proof
                rows.append((int(mid), w, h, ow, oh, new_payload, sum(new_data)))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    if repartition:
        media = spread(media, "media_id")
    return media.mapInPandas(resize, schema=RESIZE_SCHEMA)


def crop_image(media: DataFrame, repartition: bool = True) -> DataFrame:
    """REAL center crop: parse each PGM/PPM payload, cut the centered
    (h//2) x (w//2) region starting at row h//4 / column w//4 (integer
    floors — an external oracle re-derives every byte), re-encode, and
    RE-PARSE the cropped payload for ``out_sum`` — the same full
    decode → transform → encode → decode roundtrip proof as
    :func:`resize_image`, with row-slice copies instead of resampling.

    Same 100 TB shape: hash-spread on media_id before the CPU-bound byte
    work, Arrow-batched mapInPandas, loud failures on malformed payloads;
    non-image payloads are ignored.
    """
    import pandas as pd

    def crop(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                if payload[:2] == b"P6":
                    w, h, data = _parse_ppm(payload)
                    depth, enc, parse = 3, _encode_ppm, _parse_ppm
                elif payload[:2] == b"P5":
                    w, h, data = _parse_pgm(payload)
                    depth, enc, parse = 1, _encode_pgm, _parse_pgm
                else:
                    continue
                x0, y0, cw, ch = w // 4, h // 4, w // 2, h // 2
                if cw < 1 or ch < 1:
                    raise ValueError(f"media {mid}: {w}x{h} too small to crop")
                out = bytearray()
                for y in range(ch):
                    row0 = ((y0 + y) * w + x0) * depth
                    out += data[row0 : row0 + cw * depth]
                new_payload = enc(cw, ch, bytes(out))
                _, _, new_data = parse(new_payload)  # roundtrip proof
                rows.append((int(mid), w, h, cw, ch, new_payload, sum(new_data)))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    if repartition:
        media = spread(media, "media_id")
    return media.mapInPandas(crop, schema=RESIZE_SCHEMA)


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("in_w", IntegerType(), False),
        StructField("in_h", IntegerType(), False),
        StructField("fp_hi", LongType(), False),
        StructField("fp_lo", LongType(), False),
        StructField("n_bits", IntegerType(), False),
    ]
)


def image_ahash(media: DataFrame, repartition: bool = True) -> DataFrame:
    """Perceptual average-hash (aHash) fingerprint per image — the
    image-dedup primitive of multimodal training pipelines (near-identical
    frames/thumbnails collapse to the same or nearby 64-bit hash while
    exact-dedup misses any re-encode).

    REAL decode path: parse each PGM/PPM payload from raw bytes, sample an
    8×8 grid (grid pixel (y, x) = input pixel (y·h//8, x·w//8); gray =
    integer channel mean), threshold each cell against the integer mean of
    the 64 grays, and pack the bits row-major. Pure integer arithmetic end
    to end, so an external oracle re-derives every bit from the payload
    scheme. The 64 bits ship as two 32-bit BIGINT halves (``fp_hi`` bits
    63..32, ``fp_lo`` 31..0) — scalar, sign-safe, engine-portable.

    Scale: hash-spread before the Python stage like the other codec ops;
    downstream near-dup joins see only (id, fp) rows — 16 bytes per image
    no matter the pixel count.
    """
    import pandas as pd

    def ahash(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                if payload[:2] == b"P6":
                    w, h, data = _parse_ppm(payload)
                    depth = 3
                elif payload[:2] == b"P5":
                    w, h, data = _parse_pgm(payload)
                    depth = 1
                else:
                    continue
                grays = []
                for y in range(8):
                    for x in range(8):
                        p = ((y * h // 8) * w + (x * w // 8)) * depth
                        grays.append(sum(data[p : p + depth]) // depth)
                mean = sum(grays) // 64
                hi = lo = 0
                for i, g in enumerate(grays):
                    if g > mean:
                        if i >= 32:
                            hi |= 1 << (i - 32)
                        else:
                            lo |= 1 << i
                rows.append((int(mid), w, h, hi, lo, sum(g > mean for g in grays)))
            yield pd.DataFrame(rows, columns=[f.name for f in AHASH_SCHEMA.fields])

    if repartition:
        media = spread(media, "media_id")
    return media.mapInPandas(ahash, schema=AHASH_SCHEMA)


def ahash_pairs(fps: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-duplicate image pairs from aHash fingerprints: hamming distance
    over the 64 bits ≤ ``max_hamming``. Same pigeonhole strategy as
    ``dedup.simhash_pairs``: split the hash into 8 byte-chunks — any pair
    within distance 7 shares at least one UNCHANGED chunk — equi-join on
    (chunk index, chunk value), then verify exactly with bit_count(XOR) on
    the two halves. Never all-pairs: the join fans out only on chunk
    collisions. Output: (id_a, id_b, hamming).
    """
    if max_hamming > 7:
        raise ValueError("pigeonhole over 8 chunks guarantees recall only to 7")
    chunk_structs = [
        F.struct(
            F.lit(base * 4 + i).alias("chunk"),
            F.shiftright(F.col(half), 8 * i).bitwiseAND(F.lit(0xFF)).alias("cval"),
        )
        for base, half in enumerate(("fp_lo", "fp_hi"))
        for i in range(4)
    ]
    chunks = fps.select(
        "media_id",
        "fp_hi",
        "fp_lo",
        F.explode(F.array(*chunk_structs)).alias("__c"),
    ).select("media_id", "fp_hi", "fp_lo", "__c.chunk", "__c.cval")
    # materialize once: the self-join would recompute the Python decode
    # stage on BOTH sides otherwise (multi-consumer DAG recompute)
    chunks = chunks.localCheckpoint(eager=True)
    a, b = chunks.alias("a"), chunks.alias("b")
    hamming = F.bit_count(
        F.col("a.fp_hi").bitwiseXOR(F.col("b.fp_hi"))
    ) + F.bit_count(F.col("a.fp_lo").bitwiseXOR(F.col("b.fp_lo")))
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cval") == F.col("b.cval"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def image_dhash(media: DataFrame, repartition: bool = True) -> DataFrame:
    """Difference-hash (dHash) fingerprint per image — the gradient twin
    of :func:`image_ahash`: sample a 9-wide x 8-tall gray grid and set bit
    ``y*8 + x`` when cell (y, x) is strictly brighter than its right
    neighbor (y, x+1). Gradients survive brightness/contrast shifts that
    move the aHash mean, so the two fingerprints catch different
    near-duplicate families; production dedup ANDs both distances.

    Same REAL decode path and bit-packing contract as ``image_ahash``
    (integer channel means, row-major bits, two 32-bit BIGINT halves) —
    every bit re-derivable analytically from the payload scheme.
    """
    import pandas as pd

    def dhash(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                if payload[:2] == b"P6":
                    w, h, data = _parse_ppm(payload)
                    depth = 3
                elif payload[:2] == b"P5":
                    w, h, data = _parse_pgm(payload)
                    depth = 1
                else:
                    continue

                def gray(y: int, x: int) -> int:
                    p = ((y * h // 8) * w + (x * w // 9)) * depth
                    return sum(data[p : p + depth]) // depth

                hi = lo = n = 0
                for y in range(8):
                    for x in range(8):
                        if gray(y, x) > gray(y, x + 1):
                            i = y * 8 + x
                            n += 1
                            if i >= 32:
                                hi |= 1 << (i - 32)
                            else:
                                lo |= 1 << i
                rows.append((int(mid), w, h, hi, lo, n))
            yield pd.DataFrame(rows, columns=[f.name for f in AHASH_SCHEMA.fields])

    if repartition:
        media = spread(media, "media_id")
    return media.mapInPandas(dhash, schema=AHASH_SCHEMA)


GRID8_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("in_w", IntegerType(), False),
        StructField("in_h", IntegerType(), False),
        StructField("gy", IntegerType(), False),
        StructField("gx", IntegerType(), False),
        StructField("gray", IntegerType(), False),
    ]
)


def _phash_k(scale: int = 10_000) -> list[tuple[int, int, int]]:
    """Integer DCT-II basis, (u, x, round(cos((2x+1)u*pi/16)*scale)) —
    computed ONCE in Python on the driver and embedded as literals in both
    the Spark plan and the DuckDB oracle, so libm variance can't split the
    engines (the ``_portable_perm_coeffs`` device from dedup.py)."""
    import math

    return [
        (u, x, round(math.cos((2 * x + 1) * u * math.pi / 16) * scale))
        for u in range(8)
        for x in range(8)
    ]


def image_grid8(media: DataFrame, repartition: bool = True) -> DataFrame:
    """REAL-codec 8x8 luminance grid per image: parse each PGM/PPM payload
    from raw bytes and emit one row per grid cell — the Python stage stops
    at decoding; all downstream math stays JVM-side. Grid pixel (gy, gx)
    = input pixel (gy*h//8, gx*w//8), gray = integer channel mean (the
    same sampling contract as :func:`image_ahash`)."""
    import pandas as pd

    def grid(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                if payload[:2] == b"P6":
                    w, h, data = _parse_ppm(payload)
                    depth = 3
                elif payload[:2] == b"P5":
                    w, h, data = _parse_pgm(payload)
                    depth = 1
                else:
                    continue
                for y in range(8):
                    for x in range(8):
                        p = ((y * h // 8) * w + (x * w // 8)) * depth
                        g = sum(data[p : p + depth]) // depth
                        rows.append((int(mid), w, h, y, x, g))
            yield pd.DataFrame(rows, columns=[f.name for f in GRID8_SCHEMA.fields])

    if repartition:
        media = spread(media, "media_id")
    return media.mapInPandas(grid, schema=GRID8_SCHEMA)


def image_phash(media: DataFrame, repartition: bool = True) -> DataFrame:
    """Perceptual DCT hash (pHash) per image — the scale/brightness-robust
    member of the perceptual-hash family (aHash = mean threshold, dHash =
    gradient sign, pHash = low-frequency spectrum sign). Near-identical
    images agree on the sign pattern of their lowest DCT coefficients even
    after smooth intensity changes that flip many aHash bits.

    Split by execution model: the Python codec stage emits only the 8x8
    gray grid (:func:`image_grid8`); the 2-D DCT, the exact median
    threshold, and the bit packing are pure codegen DataFrame ops — two
    broadcast joins against the 64-row integer cosine basis
    (:func:`_phash_k`), one aggregation, one 63-row-per-image window.
    All-integer arithmetic (gray * k_u * k_v products, exact BIGINT sums;
    the median of 63 BIGINTs is the rank-32 element — no interpolation),
    so every bit re-derives analytically in the oracle.

    Output: ``(media_id, in_w, in_h, fp_hi, fp_lo, n_bits)`` — 63 AC bits
    (bit i-1 for coefficient index i = u*8+v, i >= 1; fp_lo bits 0..31,
    fp_hi 32..62), ``n_bits`` = population count.
    """
    from pyspark.sql import Window

    spark = media.sparkSession
    grid = image_grid8(media, repartition=repartition)
    k = _phash_k()
    ku = local_df(spark, k, "u int, gx int, ku long")
    kv = local_df(spark, [(v, y, c) for (v, y, c) in k], "v int, gy int, kv long")
    coef = (
        grid.join(F.broadcast(ku), "gx")
        .join(F.broadcast(kv), "gy")
        .groupBy("media_id", "in_w", "in_h", "u", "v")
        .agg(
            F.sum(
                F.col("gray").cast("long") * F.col("ku") * F.col("kv")
            ).alias("c")
        )
    )
    ac = coef.filter(~((F.col("u") == 0) & (F.col("v") == 0))).select(
        "media_id",
        "in_w",
        "in_h",
        (F.col("u") * 8 + F.col("v")).alias("i"),
        "c",
    )
    w = Window.partitionBy("media_id").orderBy("c", "i")
    med = (
        ac.select("media_id", "c", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 32)
        .select("media_id", F.col("c").alias("m"))
    )
    bit = F.when(F.col("c") > F.col("m"), 1).otherwise(0)
    return (
        ac.join(med, "media_id")
        .groupBy("media_id", "in_w", "in_h")
        .agg(
            F.sum(
                F.when(
                    (F.col("c") > F.col("m")) & (F.col("i") >= 33),
                    F.expr("shiftleft(cast(1 as bigint), cast(i - 33 as int))"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("fp_hi"),
            F.sum(
                F.when(
                    (F.col("c") > F.col("m")) & (F.col("i") <= 32),
                    F.expr("shiftleft(cast(1 as bigint), cast(i - 1 as int))"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("fp_lo"),
            F.sum(bit).cast("int").alias("n_bits"),
        )
        .select("media_id", "in_w", "in_h", "fp_hi", "fp_lo", "n_bits")
    )


def image_phash_oracle() -> str:
    """DuckDB twin of ``image_phash`` over the cycled-md5 PGM payload
    scheme (same analytic pixel re-derivation as the aHash oracle), with
    the IDENTICAL embedded integer cosine basis."""
    kvals = ", ".join(f"({u}, {x}, {c})" for (u, x, c) in _phash_k())
    return f"""
        WITH img AS (
          SELECT doc_id, md5(text) AS hh,
                 CAST(doc_id % 32 + 8 AS INTEGER) AS w,
                 CAST(doc_id % 24 + 8 AS INTEGER) AS h
          FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 0
        ), px AS (
          SELECT doc_id, w, h, y, x,
                 ascii(substr(hh,
                       CAST(((y * h // 8) * w + (x * w // 8)) % 32 AS INTEGER) + 1,
                       1)) AS gray
          FROM img, range(0, 8) ry(y), range(0, 8) rx(x)
        ), kb(u, x, k) AS (VALUES {kvals}),
        coef AS MATERIALIZED (
          SELECT px.doc_id, px.w, px.h, ku.u, kv.u AS v,
                 CAST(SUM(CAST(gray AS BIGINT) * ku.k * kv.k) AS BIGINT) AS c
          FROM px JOIN kb ku ON ku.x = px.x JOIN kb kv ON kv.x = px.y
          GROUP BY 1, 2, 3, 4, 5
        ), ac AS MATERIALIZED (
          SELECT doc_id, w, h, u * 8 + v AS i, c FROM coef
          WHERE NOT (u = 0 AND v = 0)
        ), med AS (
          SELECT doc_id, c AS m FROM (
            SELECT doc_id, c,
                   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c, i) AS rn
            FROM ac
          ) WHERE rn = 32
        )
        SELECT ac.doc_id AS media_id, w AS in_w, h AS in_h,
               CAST(COALESCE(SUM(CASE WHEN c > m AND i >= 33
                     THEN CAST(1 AS BIGINT) << CAST(i - 33 AS INTEGER) END), 0)
                 AS BIGINT) AS fp_hi,
               CAST(COALESCE(SUM(CASE WHEN c > m AND i <= 32
                     THEN CAST(1 AS BIGINT) << CAST(i - 1 AS INTEGER) END), 0)
                 AS BIGINT) AS fp_lo,
               CAST(COUNT(*) FILTER (WHERE c > m) AS INTEGER) AS n_bits
        FROM ac JOIN med USING (doc_id)
        GROUP BY ac.doc_id, w, h
    """


AUDIO_SAMPLES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("n_mono", IntegerType(), False),
        StructField("f", IntegerType(), False),
        StructField("pos", IntegerType(), False),
        StructField("s", IntegerType(), False),
    ]
)


def audio_frames8(media: DataFrame, repartition: bool = True) -> DataFrame:
    """REAL-codec audio framing: parse each WAV/AIFF payload from raw
    bytes (endianness per container), take channel 0 of the first 64
    sample frames, and emit 8-sample analysis frames — the Python stage
    stops at decoding, like :func:`image_grid8`. Only COMPLETE 8-sample
    frames are emitted. 16-bit PCM; sample assembly is integer
    (b_hi*256 + b_lo, big-endian AIFF / little-endian WAV)."""
    import pandas as pd

    def frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                if payload[:4] == b"FORM":
                    sr, ch, data = _parse_aiff(payload)
                    be = True
                elif payload[:4] == b"RIFF":
                    sr, ch, data = _parse_wav(payload)
                    be = False
                else:
                    continue
                n_frames = len(data) // (2 * ch)
                n_mono = min(64, n_frames)
                for i in range((n_mono // 8) * 8):
                    p = 2 * i * ch
                    b0, b1 = data[p], data[p + 1]
                    s = b0 * 256 + b1 if be else b1 * 256 + b0
                    if s >= 32768:
                        s -= 65536
                    rows.append((int(mid), int(sr), n_mono, i // 8, i % 8, s))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_SAMPLES_SCHEMA.fields]
            )

    if repartition:
        media = spread(media, "media_id")
    return media.mapInPandas(frames, schema=AUDIO_SAMPLES_SCHEMA)


def audio_dct_bands(media: DataFrame, repartition: bool = True) -> DataFrame:
    """Spectral band fingerprint per audio payload — the audio sibling of
    :func:`image_phash`, reusing the SAME embedded integer DCT-II basis
    (:func:`_phash_k`): 8-point DCT per analysis frame, per-band energy =
    the exact BIGINT sum of |coefficient| across frames (abs, not square
    — keeps every value far inside 2^63 at 16-bit amplitudes). The
    shape every audio-dedup / silence-detection / genre-bucket pipeline
    computes first; near-identical clips agree band-wise.

    Python decodes (:func:`audio_frames8`); the DCT is one broadcast join
    + aggregation JVM-side; the 8 band energies pivot into one wide row
    via conditional sums. Output: ``(media_id, sample_rate, n_mono,
    e0..e7)`` — all scalars, all exact integers, analytic in the oracle.
    """
    spark = media.sparkSession
    fr = audio_frames8(media, repartition=repartition)
    kb = local_df(spark, _phash_k(), "u int, pos int, k long")
    coef = (
        fr.join(F.broadcast(kb), "pos")
        .groupBy("media_id", "sample_rate", "n_mono", "f", "u")
        .agg(F.sum(F.col("s").cast("long") * F.col("k")).alias("c"))
    )
    bands = [
        F.sum(
            F.when(F.col("u") == u, F.abs(F.col("c"))).otherwise(
                F.lit(0).cast("long")
            )
        ).alias(f"e{u}")
        for u in range(8)
    ]
    return (
        coef.groupBy("media_id", "sample_rate", "n_mono")
        .agg(*bands)
    )


def audio_dct_bands_oracle() -> str:
    """DuckDB twin of ``audio_dct_bands`` over the cycled-md5 AIFF payload
    scheme (odd doc_ids; sr = 8000 + 1000*(id%8), channels = 1 + id%2,
    n_frames = id%64 + 16; PCM bytes are cycled md5-hex ASCII, so every
    16-bit sample is b0*256 + b1 < 32768 — always positive)."""
    kvals = ", ".join(f"({u}, {x}, {c})" for (u, x, c) in _phash_k())
    band_cols = ",\n               ".join(
        f"CAST(COALESCE(SUM(CASE WHEN u = {u} THEN abs(c) END), 0) AS BIGINT)"
        f" AS e{u}"
        for u in range(8)
    )
    return f"""
        WITH aud AS (
          SELECT doc_id, md5(text) AS hh,
                 CAST(8000 + 1000 * (doc_id % 8) AS INTEGER) AS sr,
                 CAST(1 + doc_id % 2 AS INTEGER) AS ch,
                 CAST(doc_id % 64 + 16 AS INTEGER) AS n_frames
          FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 1
        ), meta AS (
          SELECT *, CAST(least(64, n_frames) AS INTEGER) AS n_mono FROM aud
        ), samp AS (
          SELECT doc_id, sr, n_mono, CAST(i // 8 AS INTEGER) AS f,
                 CAST(i % 8 AS INTEGER) AS pos,
                 ascii(substr(hh, CAST((2 * i * ch) % 32 AS INTEGER) + 1, 1)) * 256
                 + ascii(substr(hh, CAST((2 * i * ch + 1) % 32 AS INTEGER) + 1, 1))
                   AS s
          FROM meta, range(0, 64) ri(i)
          WHERE i < (n_mono // 8) * 8
        ), kb(u, pos, k) AS (VALUES {kvals}),
        coef AS MATERIALIZED (
          SELECT samp.doc_id, sr, n_mono, f, kb.u,
                 CAST(SUM(CAST(s AS BIGINT) * kb.k) AS BIGINT) AS c
          FROM samp JOIN kb ON kb.pos = samp.pos
          GROUP BY 1, 2, 3, 4, 5
        )
        SELECT doc_id AS media_id, sr AS sample_rate, n_mono,
               {band_cols}
        FROM coef GROUP BY 1, 2, 3
    """


SOBEL_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("in_w", IntegerType(), False),
        StructField("in_h", IntegerType(), False),
        StructField("n_interior", LongType(), False),
        StructField("n_edges", LongType(), False),
        StructField("grad_energy", LongType(), False),
        StructField("max_grad2", LongType(), False),
    ]
)


def image_sobel(
    media: DataFrame, edge_t2: int = 20_000, repartition: bool = True
) -> DataFrame:
    """Sobel gradient-energy statistics per image over the REAL codec
    path — the edge-density screen a multimodal curation pipeline uses to
    drop blank/flat frames (low energy) and synthetic noise (saturated
    energy) before expensive captioning.

    Decodes each PGM/PPM payload from raw bytes (PPM grays are exact
    integer channel means), convolves the interior with the 3x3 Sobel
    kernels in pure integer arithmetic, and reports per image:
    ``n_interior`` pixels, ``n_edges`` with squared gradient magnitude
    ``gx^2 + gy^2 > edge_t2``, the total ``grad_energy`` (BIGINT; bound
    ~2.1e6 per pixel, overflow-safe to 4e12 pixels), and ``max_grad2``.
    Every value re-derives analytically from the cycled-md5 payload
    scheme, so an external engine can oracle-check the whole convolution
    without running Python.

    Scale: hash-spread before the Python stage (numpy-vectorized inside
    Arrow batches); output is 7 scalars per image regardless of pixel
    count.
    """
    import numpy as np
    import pandas as pd

    def sobel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                if payload[:2] == b"P6":
                    w, h, data = _parse_ppm(payload)
                    px = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
                    g = px.reshape(h, w, 3).sum(axis=2) // 3
                elif payload[:2] == b"P5":
                    w, h, data = _parse_pgm(payload)
                    g = (
                        np.frombuffer(data, dtype=np.uint8)
                        .astype(np.int64)
                        .reshape(h, w)
                    )
                else:
                    continue
                if w < 3 or h < 3:
                    rows.append((int(mid), w, h, 0, 0, 0, 0))
                    continue
                gx = (
                    (g[:-2, 2:] + 2 * g[1:-1, 2:] + g[2:, 2:])
                    - (g[:-2, :-2] + 2 * g[1:-1, :-2] + g[2:, :-2])
                )
                gy = (
                    (g[2:, :-2] + 2 * g[2:, 1:-1] + g[2:, 2:])
                    - (g[:-2, :-2] + 2 * g[:-2, 1:-1] + g[:-2, 2:])
                )
                grad2 = gx * gx + gy * gy
                rows.append(
                    (
                        int(mid),
                        w,
                        h,
                        int(grad2.size),
                        int((grad2 > edge_t2).sum()),
                        int(grad2.sum()),
                        int(grad2.max()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in SOBEL_SCHEMA.fields])

    if repartition:
        media = spread(media, "media_id")
    return media.mapInPandas(sobel, schema=SOBEL_SCHEMA)


def image_sobel_oracle(edge_t2: int = 20_000) -> str:
    """DuckDB twin of :func:`image_sobel` for the PGM fixture scheme
    (gray(y, x) = ascii of the cycled md5-hex character at y*w + x)."""
    px = "ascii(substr(hh, CAST(((y + ({dy})) * w + x + ({dx})) % 32 AS INTEGER) + 1, 1))"

    def p(dy, dx):
        return px.format(dy=dy, dx=dx)

    gx = (
        f"({p(-1, 1)} + 2 * {p(0, 1)} + {p(1, 1)})"
        f" - ({p(-1, -1)} + 2 * {p(0, -1)} + {p(1, -1)})"
    )
    gy = (
        f"({p(1, -1)} + 2 * {p(1, 0)} + {p(1, 1)})"
        f" - ({p(-1, -1)} + 2 * {p(-1, 0)} + {p(-1, 1)})"
    )
    return f"""
        WITH img AS (
          SELECT doc_id, md5(text) AS hh,
                 CAST(doc_id % 32 + 8 AS INTEGER) AS w,
                 CAST(doc_id % 24 + 8 AS INTEGER) AS h
          FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 0
        ),
        grads AS (
          SELECT doc_id, w, h,
                 CAST({gx} AS BIGINT) AS gx, CAST({gy} AS BIGINT) AS gy
          FROM img, range(1, 38) rx(x), range(1, 30) ry(y)
          WHERE x <= w - 2 AND y <= h - 2
        )
        SELECT doc_id AS media_id, w AS in_w, h AS in_h,
               CAST(COUNT(*) AS BIGINT) AS n_interior,
               CAST(COUNT(*) FILTER (WHERE gx*gx + gy*gy > {edge_t2})
                 AS BIGINT) AS n_edges,
               CAST(SUM(gx*gx + gy*gy) AS BIGINT) AS grad_energy,
               CAST(MAX(gx*gx + gy*gy) AS BIGINT) AS max_grad2
        FROM grads GROUP BY 1, 2, 3
    """


SILENCE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("n_windows", LongType(), False),
        StructField("n_active", LongType(), False),
        StructField("min_energy", LongType(), False),
        StructField("max_energy", LongType(), False),
        StructField("total_energy", LongType(), False),
    ]
)


def audio_silence(
    media: DataFrame,
    window_frames: int = 8,
    threshold: int = 2_500_000_000,
    repartition: bool = True,
) -> DataFrame:
    """Voice-activity / silence screen per audio payload over the REAL
    codec path — the trim-the-dead-air pass an audio curation pipeline
    runs before transcription. Decodes each WAV/AIFF from raw bytes
    (true 16-bit PCM, either endianness), takes channel-0 frames,
    windows them (``window_frames`` per window, full windows only), and
    scores each window by exact integer energy ``sum(s^2)``; a window is
    ACTIVE when energy > ``threshold``.

    Output per audio: ``(media_id, sample_rate, n_windows, n_active,
    min_energy, max_energy, total_energy)`` — every value re-derivable
    analytically from the cycled-md5 payload scheme (the fixture's
    samples are ``b0*256 + b1`` of hex-ASCII bytes, positive by
    construction, so the oracle needs no sign handling; the DECODER
    handles signed PCM regardless).

    Scale: hash-spread before the Python stage; 7 scalars out per audio.
    """
    import pandas as pd

    def score(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                if payload[:4] == b"RIFF":
                    sr, ch, data = _parse_wav(payload)
                    be = False
                elif payload[:4] == b"FORM":
                    sr, ch, data = _parse_aiff(payload)
                    be = True
                else:
                    continue
                n_frames = len(data) // (2 * ch)
                samples = []
                for f in range(n_frames):
                    p = 2 * f * ch
                    if be:
                        v = data[p] * 256 + data[p + 1]
                    else:
                        v = data[p + 1] * 256 + data[p]
                    if v >= 32768:
                        v -= 65536
                    samples.append(v)
                n_win = n_frames // window_frames
                if n_win == 0:
                    continue
                energies = [
                    sum(
                        s * s
                        for s in samples[
                            w * window_frames : (w + 1) * window_frames
                        ]
                    )
                    for w in range(n_win)
                ]
                rows.append(
                    (
                        int(mid),
                        sr,
                        n_win,
                        sum(e > threshold for e in energies),
                        min(energies),
                        max(energies),
                        sum(energies),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in SILENCE_SCHEMA.fields]
            )

    if repartition:
        media = spread(media, "media_id")
    return media.mapInPandas(score, schema=SILENCE_SCHEMA)


def audio_silence_oracle(
    window_frames: int = 8, threshold: int = 2_500_000_000
) -> str:
    """DuckDB twin of :func:`audio_silence` for the cycled-md5 AIFF
    fixture (odd doc_ids; channel-0 sample of frame f is the big-endian
    pair at byte offset 2*f*ch of the cycled hex string)."""
    return f"""
        WITH aud AS (
          SELECT doc_id, md5(text) AS hh,
                 CAST(8000 + 1000 * (doc_id % 8) AS INTEGER) AS sr,
                 CAST(1 + doc_id % 2 AS INTEGER) AS ch,
                 CAST(doc_id % 64 + 16 AS INTEGER) AS n_frames
          FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 1
        ),
        samp AS (
          SELECT doc_id, sr,
                 CAST(i // {window_frames} AS INTEGER) AS w,
                 CAST(
                   ascii(substr(hh, CAST((2 * i * ch) % 32 AS INTEGER) + 1, 1))
                     * 256
                   + ascii(substr(hh, CAST((2 * i * ch + 1) % 32 AS INTEGER) + 1, 1))
                 AS BIGINT) AS s
          FROM aud, range(0, 80) ri(i)
          WHERE i < (n_frames // {window_frames}) * {window_frames}
        ),
        win AS (
          SELECT doc_id, sr, w, CAST(SUM(s * s) AS BIGINT) AS e
          FROM samp GROUP BY 1, 2, 3
        )
        SELECT doc_id AS media_id, sr AS sample_rate,
               CAST(COUNT(*) AS BIGINT) AS n_windows,
               CAST(COUNT(*) FILTER (WHERE e > {threshold}) AS BIGINT)
                 AS n_active,
               CAST(MIN(e) AS BIGINT) AS min_energy,
               CAST(MAX(e) AS BIGINT) AS max_energy,
               CAST(SUM(e) AS BIGINT) AS total_energy
        FROM win GROUP BY 1, 2
    """


EQUALIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("in_w", IntegerType(), False),
        StructField("in_h", IntegerType(), False),
        StructField("distinct_in", IntegerType(), False),
        StructField("distinct_out", IntegerType(), False),
        StructField("out_sum", LongType(), False),
        StructField("out_min", IntegerType(), False),
        StructField("out_max", IntegerType(), False),
    ]
)


def hist_equalize(media: DataFrame, repartition: bool = True) -> DataFrame:
    """Histogram equalization per image over the REAL codec path — the
    contrast-normalization preprocessing a vision pipeline applies
    before feature extraction (and a pure-integer transform, so the
    whole remap is oracle-checkable).

    Classic integer CDF remap: for each gray level v,
    ``out(v) = ((cdf(v) - cdf_min) * 255) div (n_pixels - cdf_min)``
    (truncating division; cdf_min = count of the darkest PRESENT
    level). Decodes the PGM payload from raw bytes, remaps every pixel,
    and reports the roundtrip stats: distinct levels in/out, the
    post-equalization byte sum (the checksum the oracle re-derives
    analytically from the cycled-md5 scheme), and the stretched range
    [out_min, out_max] (out_max = 255 whenever more than one level is
    present).

    Scale: hash-spread before the Python stage; 8 scalars per image.
    """
    import pandas as pd

    def eq(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                if payload[:2] != b"P5":
                    continue
                w, h, data = _parse_pgm(payload)
                n = w * h
                hist = [0] * 256
                for v in data:
                    hist[v] += 1
                cdf = 0
                cdf_min = None
                lut = [0] * 256
                for v in range(256):
                    if hist[v] == 0:
                        continue
                    cdf += hist[v]
                    if cdf_min is None:
                        cdf_min = hist[v]
                    denom = n - cdf_min
                    lut[v] = ((cdf - cdf_min) * 255) // denom if denom > 0 else 0
                out = [lut[v] for v in data]
                rows.append(
                    (
                        int(mid),
                        w,
                        h,
                        sum(1 for c in hist if c > 0),
                        len({lut[v] for v in range(256) if hist[v] > 0}),
                        sum(out),
                        min(out),
                        max(out),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in EQUALIZE_SCHEMA.fields]
            )

    if repartition:
        media = spread(media, "media_id")
    return media.mapInPandas(eq, schema=EQUALIZE_SCHEMA)


def hist_equalize_oracle() -> str:
    """DuckDB twin of :func:`hist_equalize` for the PGM fixture (pixel
    value at linear offset p = ascii of the cycled md5-hex char)."""
    return """
        WITH img AS (
          SELECT doc_id, md5(text) AS hh,
                 CAST(doc_id % 32 + 8 AS INTEGER) AS w,
                 CAST(doc_id % 24 + 8 AS INTEGER) AS h
          FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 0
        ),
        px AS (
          SELECT doc_id, w, h, CAST(p AS INTEGER) AS p,
                 ascii(substr(hh, CAST(p % 32 AS INTEGER) + 1, 1)) AS v
          FROM img, range(0, 39 * 31) rp(p)
          WHERE p < w * h
        ),
        hist AS (
          SELECT doc_id, w, h, v, CAST(COUNT(*) AS BIGINT) AS c
          FROM px GROUP BY 1, 2, 3, 4
        ),
        lut AS (
          SELECT doc_id, w, h, v, c,
                 CAST(SUM(c) OVER (PARTITION BY doc_id ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cdf,
                 CAST(first_value(c) OVER (PARTITION BY doc_id ORDER BY v)
                   AS BIGINT) AS cdf_min,
                 CAST(w AS BIGINT) * h AS n
          FROM hist
        ),
        mapped AS (
          SELECT doc_id, w, h, v, c,
                 CASE WHEN n - cdf_min > 0
                      THEN ((cdf - cdf_min) * 255) // (n - cdf_min)
                      ELSE 0 END AS o
          FROM lut
        )
        SELECT doc_id AS media_id, w AS in_w, h AS in_h,
               CAST(COUNT(*) AS INTEGER) AS distinct_in,
               CAST(COUNT(DISTINCT o) AS INTEGER) AS distinct_out,
               CAST(SUM(o * c) AS BIGINT) AS out_sum,
               CAST(MIN(o) AS INTEGER) AS out_min,
               CAST(MAX(o) AS INTEGER) AS out_max
        FROM mapped GROUP BY 1, 2, 3
    """
