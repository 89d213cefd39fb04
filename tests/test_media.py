"""Multimodal binary plumbing checks (pipeline.media): determinism, Arrow
batch behavior, stub boundary, and the frame-sampling row contract."""

from __future__ import annotations

import pytest

from dbsuite_spark.pipeline.media import (
    _decode_payload,
    media_decode_features,
    media_frame_sample,
)
from dbsuite_spark.tables import t


def test_decode_stub_rejects_real_codecs():
    with pytest.raises(NotImplementedError):
        _decode_payload("png", b"\x89PNG")


def test_features_deterministic_and_typed(spark, sf_dir):
    df = media_decode_features(spark, sf_dir)
    a = sorted((r.doc_id, r.byte_len, r.byte_mean) for r in df.collect())
    b = sorted((r.doc_id, r.byte_len, r.byte_mean) for r in df.collect())
    assert a == b and len(a) > 0
    assert all(r[1] == 64 for r in a)
    schema = dict(df.dtypes)
    assert all(schema[f"h{k}"] == "double" for k in range(8))
    row = df.first()
    # histogram covers every byte of the 64-byte payload
    assert sum(row[f"h{k}"] for k in range(8)) == 64.0


def test_frame_sample_contract(spark, sf_dir):
    n_docs = t(spark, sf_dir, "documents").count()
    frames = media_frame_sample(spark, sf_dir)
    assert frames.count() == n_docs * 4  # 8 frames, stride 2
    r = frames.first()
    assert len(r.frame_hex) == 16 and r.frame_idx % 2 == 0
