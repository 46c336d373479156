"""Multimodal column handling: opaque binary payloads + typed metadata.

Pattern (driver contract § north-star extensions): media lives as a
``binary`` column with a typed metadata struct beside it; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` over partitions.
This container has no image/audio codecs, so the decode step is a
DETERMINISTIC FAKE (clearly marked below) deriving pseudo-features from the
payload bytes — the Spark-side plumbing (schema, batching, partitioning,
UDF signature) is real and is what the tests exercise. Swap
``_fake_decode_batch`` for a real PIL/ffmpeg call and nothing else changes.

Blobs here are synthesized from ``documents.text`` (UTF-8 encode) because
the test tables carry no real media; at 100 TB the blob column is exactly
this shape (parquet binary + struct), read with the same scans.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..sources.tables import load_table


def blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload: binary, meta: struct) — the canonical
    multimodal layout. Metadata is computed JVM-side from the payload."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("kind"),
            F.length(payload).alias("n_bytes"),
            F.md5(F.col("text")).alias("checksum"),
        ).alias("meta"),
    )


@query(
    "multimodal_meta",
    oracle=(
        "SELECT doc_id, 'text/plain' AS kind, "
        "octet_length(encode(text)) AS n_bytes, md5(text) AS checksum "
        "FROM documents"
    ),
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata projected off the blob table (struct field access —
    columnar, prunable: a query touching only meta never reads payloads
    from a parquet store with column pruning)."""
    b = blobs(spark, sf_dir)
    return b.select(
        "doc_id",
        F.col("meta.kind").alias("kind"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
    )


@query(
    "multimodal_frames",
    oracle=(
        "SELECT doc_id, unnest(generate_series(0, "
        "octet_length(encode(text)) % 7)) AS frame_id FROM documents"
    ),
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame index, fanned out
    with a generator (explode of a sequence) — the shape of video
    frame-extraction output. Frame count is a deterministic function of
    payload size (stand-in for container metadata)."""
    b = blobs(spark, sf_dir)
    return b.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_bytes") % 7)
        ).alias("frame_id"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("feat", T.ArrayType(T.DoubleType())),
    ]
)


def _fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """DETERMINISTIC FAKE DECODER (no codecs in this container).

    Derives pseudo image dimensions + an 8-dim feature vector from payload
    bytes. Replace the body with a real decoder (PIL/torchvision/ffmpeg)
    without touching the Spark plumbing: signature, Arrow batching, and
    output schema are exactly what a real decoder uses.
    """
    import hashlib

    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            h = hashlib.md5(bytes(payload)).digest()
            out.append(
                {
                    "doc_id": int(doc_id),
                    "width": 16 + h[0] % 64,
                    "height": 16 + h[1] % 64,
                    "channels": 1 + h[2] % 4,
                    "feat": [b / 255.0 for b in h[:8]],
                }
            )
        yield pd.DataFrame(out, columns=[f.name for f in _FEATURE_SCHEMA.fields])


def decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract via Arrow-batched ``mapInPandas`` — the one
    place Python belongs in this engine: per-partition batch transforms of
    opaque payloads. Scales by partition count; no shuffle, no collect.
    Raw output (``feat: array<double>``) — the shape a downstream model
    consumer wants."""
    b = blobs(spark, sf_dir).select("doc_id", "payload")
    return b.mapInPandas(_fake_decode_batch, schema=_FEATURE_SCHEMA)


# Hex-pair → byte value, used to reconstruct digest bytes in DuckDB (whose
# md5() takes VARCHAR and hashes its UTF-8 bytes — identical to hashing the
# payload since payload IS encode(text,'utf-8')).
_HEX_BYTE = (
    "(strpos('0123456789abcdef', hx[2*i+1])-1)*16"
    " + (strpos('0123456789abcdef', hx[2*i+2])-1)"
)


@query(
    "multimodal_decode",
    oracle=(
        "WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents), "
        f"b AS (SELECT doc_id, [ {_HEX_BYTE} for i in generate_series(0,7) ] "
        "AS by FROM h) "
        "SELECT doc_id, CAST(16 + by[1] % 64 AS BIGINT) AS width, "
        "CAST(16 + by[2] % 64 AS BIGINT) AS height, "
        "CAST(1 + by[3] % 4 AS BIGINT) AS channels, "
        "array_to_string(by, ',') AS feat_bytes FROM b"
    ),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-canonical projection of ``decode_features``: the feature
    vector rides as comma-joined byte integers (the fake decoder's
    ``feat[i]`` is ``byte_i/255.0``, so ``round(v*255)`` recovers the byte
    exactly) because the driver's rows-only canonicalizer cannot sort/hash
    an array column (the r02 harness crash, VERDICT.md) — and the integer
    form also makes the whole query DuckDB-expressible: the fake md5 codec
    is reconstructed in SQL from md5(text) hex pairs, converting this key
    from rows-only to fully oracled."""
    raw = decode_features(spark, sf_dir)
    feat_bytes = F.array_join(
        F.transform("feat", lambda v: F.round(v * 255).cast("int").cast("string")),
        ",",
    )
    return raw.select(
        "doc_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("channels").cast("long").alias("channels"),
        feat_bytes.alias("feat_bytes"),
    )


_RESIZE_TARGET = (64, 64)
_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("thumb", T.BinaryType()),
    ]
)


def _fake_resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """DETERMINISTIC FAKE RESIZE (no image libs in this container).

    Emits a fixed-size pseudo-thumbnail derived from the payload bytes.
    Replace the body with a real resampler (PIL.Image.resize /
    torchvision.transforms) without touching the Spark plumbing: binary in
    → binary out through Arrow, fixed output dimensions in the schema."""
    import hashlib

    w, h = _RESIZE_TARGET
    n_out = 32  # fake thumbnail byte budget (a real one would be w*h*c)
    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            d = hashlib.sha256(bytes(payload)).digest()
            thumb = (d * (n_out // len(d) + 1))[:n_out]
            out.append({"doc_id": int(doc_id), "width": w, "height": h, "thumb": thumb})
        yield pd.DataFrame(out, columns=[f.name for f in _RESIZE_SCHEMA.fields])


def resize_thumbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/thumbnail via Arrow-batched ``mapInPandas`` — the
    binary-in/binary-out shape of media preprocessing (decode emits
    features; this emits a transformed payload). No shuffle, no collect;
    scales by partition count like every mapInPandas stage here."""
    b = blobs(spark, sf_dir).select("doc_id", "payload")
    return b.mapInPandas(_fake_resize_batch, schema=_RESIZE_SCHEMA)


@query(
    "multimodal_resize",
    oracle=(
        "SELECT doc_id, CAST(64 AS BIGINT) AS width, "
        "CAST(64 AS BIGINT) AS height, "
        "upper(sha256(text)) AS thumb_hex FROM documents"
    ),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-canonical projection of ``resize_thumbs``: the binary thumb
    rides as its hex encoding so the rows-only canonicalizer can hash it —
    and since the fake kernel's 32-byte thumb IS the sha256 digest
    (digest repeated to the 32-byte budget == the digest itself), the hex
    form equals upper(sha256(text)) in DuckDB, converting this key from
    rows-only (r02) to fully oracled."""
    raw = resize_thumbs(spark, sf_dir)
    return raw.select(
        "doc_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.hex("thumb").alias("thumb_hex"),
    )
