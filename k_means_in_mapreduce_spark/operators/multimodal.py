"""Multimodal column support (north-star: image/audio/video at 100 TB).

Design: media payloads are opaque ``binary`` columns with a typed metadata
struct alongside — the layout a petabyte-scale training pipeline uses
(parquet binary chunks + pushdown-able scalar metadata). Decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so payload bytes
cross the JVM<->Python boundary once per batch, never per row.

The container has no image/audio codecs, so the DECODE step is stubbed:
``decode_media`` raises NotImplementedError, and the pipeline runs with a
clearly-marked deterministic fake decoder. Everything around the stub —
schema, partitioning, UDF signatures, Arrow batch shapes — is real and
tested.

The blob fixture is synthesized deterministically from ``documents``
(text bytes as payload, media type assigned by doc_id) so oracles can
check the plumbing end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

MEDIA_TYPES = ("image", "audio", "video")


def media_blob_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the multimodal fixture: (doc_id, media_type, blob,
    meta struct). blob = UTF-8 bytes of the document text."""
    d = load_table(spark, sf_dir, "documents")
    media_type = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    blob = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        media_type.alias("media_type"),
        blob.alias("blob"),
        F.struct(
            F.octet_length(blob).alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_media(blob: bytes, media_type: str) -> dict:
    """Real decoder entry point — requires image/audio codecs not present
    in this environment."""
    raise NotImplementedError(
        "media decoding requires codec libraries (PIL/ffmpeg) not available "
        "in this container; use fake_decode for plumbing tests"
    )


def fake_decode(blob: bytes, media_type: str) -> dict:
    """Deterministic stand-in for decode_media: derives plausible metadata
    purely from the payload bytes so results are reproducible."""
    n = len(blob)
    if media_type == "image":
        return {"width": 16 + n % 1024, "height": 16 + (n * 7) % 768, "n_frames": 1}
    if media_type == "audio":
        return {"width": 0, "height": 0, "n_frames": n // 4}  # "samples"
    return {"width": 320, "height": 240, "n_frames": max(1, n // 64)}


@query(
    "multimodal_meta",
    """
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                                        WHEN 1 THEN 'audio'
                                        ELSE 'video' END AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata projection over the binary column — stays entirely
    JVM-side (octet_length/md5 are builtin): the cheap pre-filter stage
    before any expensive decode."""
    m = media_blob_table(spark, sf_dir)
    return m.select(
        "doc_id",
        "media_type",
        F.col("meta.n_bytes").cast("bigint").alias("n_bytes"),
        F.md5("blob").alias("content_md5"),
    )


@query(
    "multimodal_decode_meta",
    """
    WITH blobs AS (
        SELECT doc_id,
               CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                                            WHEN 1 THEN 'audio'
                                            ELSE 'video' END AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS n
        FROM documents
    )
    SELECT doc_id, media_type, n AS n_bytes,
           CAST(CASE media_type WHEN 'image' THEN 16 + n % 1024
                                WHEN 'audio' THEN 0 ELSE 320 END AS BIGINT) AS width,
           CAST(CASE media_type WHEN 'image' THEN 16 + (n * 7) % 768
                                WHEN 'audio' THEN 0 ELSE 240 END AS BIGINT) AS height,
           CAST(CASE media_type WHEN 'image' THEN 1
                                WHEN 'audio' THEN n // 4
                                ELSE greatest(1, n // 64) END AS BIGINT) AS n_frames
    FROM blobs
    """,
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode stage plumbing: Arrow-batched mapInPandas over the blob
    column (the real decoder would drop into fake_decode's place). One
    Python round-trip per batch; output schema is fixed and typed."""
    m = media_blob_table(spark, sf_dir)

    # NOTE: the closure must be SELF-CONTAINED (no references to this
    # module's globals) so cloudpickle ships it by value — executor Python
    # workers do not have this package on sys.path.
    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd  # noqa: F811 — by-value closure, see above

        def _fake_decode(blob: bytes, media_type: str) -> dict:
            n = len(blob)
            if media_type == "image":
                return {"width": 16 + n % 1024, "height": 16 + (n * 7) % 768,
                        "n_frames": 1}
            if media_type == "audio":
                return {"width": 0, "height": 0, "n_frames": n // 4}
            return {"width": 320, "height": 240, "n_frames": max(1, n // 64)}

        for pdf in batches:
            metas = [
                _fake_decode(blob, mt)
                for blob, mt in zip(pdf["blob"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(b) for b in pdf["blob"]],
                    "width": [x["width"] for x in metas],
                    "height": [x["height"] for x in metas],
                    "n_frames": [x["n_frames"] for x in metas],
                }
            )

    return m.mapInPandas(
        decode_batches,
        schema=(
            "doc_id bigint, media_type string, n_bytes bigint, "
            "width bigint, height bigint, n_frames bigint"
        ),
    )


@query(
    "multimodal_frame_sample",
    """
    WITH vids AS (
        SELECT doc_id,
               CAST(greatest(1, octet_length(encode(text)) // 64) AS BIGINT) AS n_frames
        FROM documents WHERE CAST(doc_id % 3 AS INT) = 2
    )
    SELECT doc_id, n_frames,
           CAST(unnest(range(0, least(n_frames - 1, 24) + 1, 8)) AS BIGINT) AS frame_idx,
           concat(doc_id, ':', CAST(unnest(range(0, least(n_frames - 1, 24) + 1, 8)) AS BIGINT)) AS frame_key
    FROM vids
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    (every 8th frame, max 4) — the UDTF-style fan-out shape a video
    pipeline needs. Pure-expression fan-out via sequence+explode keeps it
    JVM-side; a real sampler would decode inside mapInPandas instead."""
    decoded = multimodal_decode_meta(spark, sf_dir)
    vids = decoded.filter(F.col("media_type") == "video")
    frame_idx = F.explode(
        F.sequence(
            F.lit(0),
            F.least(F.col("n_frames") - 1, F.lit(24)),
            F.lit(8),
        )
    )
    return vids.select(
        "doc_id", "n_frames", frame_idx.alias("frame_idx")
    ).withColumn(
        "frame_key",
        F.concat_ws(":", F.col("doc_id"), F.col("frame_idx")),
    )


@query(
    "multimodal_feature_extract",
    """
    WITH blobs AS (
        SELECT doc_id,
               CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                                            WHEN 1 THEN 'audio'
                                            ELSE 'video' END AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS n,
               CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1))
                    ELSE 0 END AS b0
        FROM documents
    ),
    feats AS (
        SELECT doc_id, media_type,
               list_transform(range(1, 9), i -> (n * i + 7 * b0) % 997) AS emb
        FROM blobs
    )
    SELECT doc_id, media_type,
           CAST(8 AS BIGINT) AS dim,
           CAST(list_aggregate(list_transform(emb, x -> x * x), 'sum') AS BIGINT)
               AS norm2,
           CAST(list_aggregate(list_transform(range(1, 9),
                    i -> i * emb[i]), 'sum') AS BIGINT) AS checksum
    FROM feats
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction stage: blob -> fixed-width embedding inside an
    Arrow-batched mapInPandas (a real pipeline swaps the deterministic
    byte-arithmetic stand-in for a vision/audio encoder — same signature,
    same batch shape). Integer features so the oracle compares exactly;
    the summary scalars (norm2, checksum) pin every component without
    shipping float arrays through the hash compare."""
    m = media_blob_table(spark, sf_dir)

    # Self-contained closure (shipped by value; workers lack this package).
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd  # noqa: F811

        idx = np.arange(1, 9, dtype=np.int64)
        for pdf in batches:
            n = pdf["blob"].map(len).to_numpy(dtype=np.int64)
            b0 = pdf["blob"].map(lambda b: b[0] if len(b) else 0).to_numpy(
                dtype=np.int64
            )
            emb = (n[:, None] * idx[None, :] + 7 * b0[:, None]) % 997
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "dim": np.full(len(pdf), 8, dtype=np.int64),
                    "norm2": (emb * emb).sum(axis=1),
                    "checksum": (emb * idx[None, :]).sum(axis=1),
                }
            )

    return m.mapInPandas(
        extract,
        schema=(
            "doc_id bigint, media_type string, dim bigint, "
            "norm2 bigint, checksum bigint"
        ),
    )


@query(
    "multimodal_resize_plan",
    """
    WITH imgs AS (
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n
        FROM documents WHERE CAST(doc_id % 3 AS INT) = 0
    ),
    dims AS (
        SELECT doc_id,
               16 + n % 1024 AS width,
               16 + (n * 7) % 768 AS height
        FROM imgs
    )
    SELECT doc_id, CAST(width AS BIGINT) AS width,
           CAST(height AS BIGINT) AS height,
           CAST(CASE WHEN greatest(width, height) <= 256 THEN width
                     WHEN width >= height THEN 256
                     ELSE greatest(1, (width * 256) // height) END AS BIGINT)
               AS target_w,
           CAST(CASE WHEN greatest(width, height) <= 256 THEN height
                     WHEN height > width THEN 256
                     ELSE greatest(1, (height * 256) // width) END AS BIGINT)
               AS target_h
    FROM dims
    """,
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning for image rows: longest-side-to-256 with aspect
    preserved, computed over the decoded metadata with integer Catalyst
    expressions — the cheap planning stage that decides work BEFORE
    payload bytes move; the pixel resize itself would run next to the
    decoder inside mapInPandas."""
    decoded = multimodal_decode_meta(spark, sf_dir)
    imgs = decoded.filter(F.col("media_type") == "image")
    w, h = F.col("width"), F.col("height")
    longest = F.greatest(w, h)
    return imgs.select(
        "doc_id",
        "width",
        "height",
        F.when(longest <= 256, w)
        .when(w >= h, F.lit(256))
        .otherwise(
            # integer `div`, not `/`: fp division + cast can round the
            # wrong way on exact multiples; DuckDB's `//` is integer floor
            F.greatest(F.lit(1), F.expr("(width * 256) div height"))
        )
        .cast("long")
        .alias("target_w"),
        F.when(longest <= 256, h)
        .when(h > w, F.lit(256))
        .otherwise(F.greatest(F.lit(1), F.expr("(height * 256) div width")))
        .cast("long")
        .alias("target_h"),
    )
