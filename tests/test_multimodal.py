"""Multimodal plumbing tests (X5): stub gating + Arrow-batch fan-out."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.functions import multimodal as mm
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table


def test_decode_image_is_stubbed():
    """Real codecs are absent: the decode stubs must fail loudly, not
    silently fake an image."""
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG...")
    with pytest.raises(NotImplementedError):
        mm.resize_image(b"\x89PNG...", 32, 32)


def test_payload_schema(spark, sf_dir):
    frame = mm.attach_payload(load_table(spark, sf_dir, "documents"))
    fields = {f.name: f.dataType.simpleString() for f in frame.schema.fields}
    assert fields["payload"] == "binary"
    assert fields["meta"].startswith("struct<modality:string,mime:string")


def test_frame_fanout_counts(spark, sf_dir):
    """mapInPandas 1→N fan-out: exactly floor(n_bytes/stride) frames per
    doc, regardless of Arrow batch boundaries."""
    docs = load_table(spark, sf_dir, "documents")
    frames = mm.sample_frames(mm.attach_payload(docs))
    got = {
        r.doc_id: r.n
        for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    expected = {
        r.doc_id: len(r.text.encode()) // mm.FRAME_STRIDE
        for r in docs.select("doc_id", "text").collect()
    }
    expected = {k: v for k, v in expected.items() if v > 0}
    assert got == expected


def test_undecodable_payload_yields_no_rows(spark):
    """A genuinely binary (non-UTF-8) payload must be skipped by both
    kernels — the decoder-pipeline convention — not crash the stage, and
    must not suppress valid rows sharing its Arrow batch."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    rows = [
        (1, bytearray(b"\xff\xfe\x80" * 64)),  # invalid UTF-8 "media"
        (2, bytearray(b"hello world, " * 16)),  # decodable text
        (3, None),  # missing payload
    ]
    df = spark.createDataFrame(rows, schema)
    feats = mm.extract_features(df).toPandas()
    assert set(feats["doc_id"]) == {2}
    frames = mm.sample_frames(df).toPandas()
    assert set(frames["doc_id"]) == {2}
    assert len(frames) == len(b"hello world, " * 16) // mm.FRAME_STRIDE
    assert pd.api.types.is_integer_dtype(feats["checksum16"])
