"""Multimodal plumbing tests: binary payload schema, Arrow batch iteration,
deterministic decode stub, frame-sampling shape. The value-level correctness
of the query surface is covered by the oracle suite (mm01-mm03)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from tests.conftest import SF_SMALL
from xarray_sql_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.media_table(spark, SF_SMALL)


def test_media_table_schema(media):
    fields = {f.name: f.dataType for f in media.schema.fields}
    assert isinstance(fields["content"], BinaryType)
    assert set(fields) == {"doc_id", "content", "media_type", "origin"}
    types = {r["media_type"] for r in media.select("media_type").distinct().collect()}
    assert types == set(mm.MEDIA_TYPES)


def test_decode_stub_is_deterministic_and_typed(media):
    out = mm.decode_media(media)
    rows = {r["doc_id"]: r for r in out.collect()}
    again = {r["doc_id"]: r for r in mm.decode_media(media).collect()}
    assert rows == again
    src = {r["doc_id"]: bytes(r["content"]) for r in media.collect()}
    for doc_id, r in rows.items():
        assert r["digest"] == hashlib.md5(src[doc_id]).hexdigest()
        assert r["n_bytes"] == len(src[doc_id])
        if r["media_type"] == "image":
            assert r["width"] is not None and r["n_frames"] is None
        if r["media_type"] == "audio":
            assert r["sample_rate"] is not None and r["width"] is None
        if r["media_type"] == "video":
            assert r["n_frames"] is not None and r["duration_s"] is not None


def test_decode_batch_kernel_sees_batches():
    # The mapInPandas kernel contract: pandas DataFrame in, DataFrame out,
    # one per Arrow batch, row count preserved, no pandas index leakage.
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "content": [b"abc", b"defg"],
            "media_type": ["image", "audio"],
            "origin": ["t", "t"],
        }
    )
    outs = list(mm._decode_batches(iter([pdf, pdf])))
    assert len(outs) == 2
    assert list(outs[0]["doc_id"]) == [1, 2]
    assert outs[0].loc[0, "digest"] == hashlib.md5(b"abc").hexdigest()


def test_frame_sampling_stride(media):
    frames = mm.sample_frames(media)
    pdf = frames.toPandas()
    assert (pdf["frame_idx"] % mm.FRAME_STRIDE == 0).all()
    meta = mm.decode_media(media).filter(F.col("media_type") == "video").toPandas()
    expected = int(((meta["n_frames"] - 1) // mm.FRAME_STRIDE + 1).sum())
    assert len(pdf) == expected


def test_features_shape(media):
    feats = mm.extract_features(media)
    row = feats.first()
    assert len(row["features"]) == mm.N_FEATURES
    assert all(-1.0 <= v <= 1.0 for v in row["features"])


def test_resize_fits_max_side_and_preserves_aspect(spark):
    from xarray_sql_spark.operators.multimodal import media_table, resize_images

    out = resize_images(media_table(spark, SF_SMALL)).toPandas()
    assert len(out) > 0
    assert (out[["out_w", "out_h"]].max(axis=1) == 224).all()  # long side hits the target
    # aspect preserved to integer-floor precision
    for r in out.itertuples():
        assert r.out_w == r.width * 224 // max(r.width, r.height)
        assert r.out_h == r.height * 224 // max(r.width, r.height)
