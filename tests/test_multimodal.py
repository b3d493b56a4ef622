"""Multimodal plumbing tests: schema, batch shape, stub behavior."""

import pytest

from k_means_in_mapreduce_spark import registry
from k_means_in_mapreduce_spark.operators.multimodal import (
    decode_media,
    fake_decode,
    media_blob_table,
)

from .conftest import SF001


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG", "image")


def test_fake_decode_deterministic():
    assert fake_decode(b"abcd" * 10, "image") == fake_decode(b"abcd" * 10, "image")
    assert fake_decode(b"abcd" * 10, "audio")["n_frames"] == 10


def test_blob_table_schema(spark):
    m = media_blob_table(spark, SF001)
    assert dict(m.dtypes)["blob"] == "binary"
    assert dict(m.dtypes)["meta"].startswith("struct<n_bytes")
    row = m.first()
    assert row["meta"]["n_bytes"] == len(row["blob"])


def test_decode_meta_consistency(spark):
    out = registry.QUERIES["multimodal_decode_meta"](spark, SF001).toPandas()
    assert len(out) == 500
    assert set(out.media_type) == {"image", "audio", "video"}
    # fake decode is pure: n_frames for audio == n_bytes // 4
    audio = out[out.media_type == "audio"]
    assert (audio.n_frames == audio.n_bytes // 4).all()


def test_frame_sample_fanout(spark):
    out = registry.QUERIES["multimodal_frame_sample"](spark, SF001).toPandas()
    assert (out.frame_idx % 8 == 0).all()
    assert (out.frame_idx <= 24).all()
    per_doc = out.groupby("doc_id").frame_idx.count()
    assert per_doc.max() <= 4
