"""Multimodal plumbing tests: schema, determinism, 1:N frame explosion."""

from __future__ import annotations

import pytest

from chchfr_data_collection_spark.multimodal import (
    attach_fake_media,
    extract_features,
    sample_frames,
)
from chchfr_data_collection_spark.session import load_table


@pytest.fixture(scope="module")
def media(spark, sf_small):
    return attach_fake_media(load_table(spark, sf_small, "documents")).cache()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "doc_id", "media_type", "n_bytes", "width", "height", "payload",
    ]
    assert media.schema["payload"].dataType.simpleString() == "binary"


def test_extract_features_deterministic(media):
    f1 = {r.doc_id: r.feat for r in extract_features(media).collect()}
    f2 = {r.doc_id: r.feat for r in extract_features(media).collect()}
    assert f1 == f2
    dim = {len(v) for v in f1.values()}
    assert dim == {8}
    assert len(f1) == media.count()  # 1:1, no rows lost across Arrow batches


def test_extract_features_real_decode_is_stubbed(media):
    from py4j.protocol import Py4JJavaError

    with pytest.raises((Py4JJavaError, Exception)):
        extract_features(media, decode="real").collect()


def test_sample_frames_video_only_1_to_n(media):
    frames = sample_frames(media, every_n_bytes=64)
    vids = media.filter(media.media_type == "video/mp4")
    n_video = vids.count()
    out = frames.collect()
    assert {r.doc_id for r in out} <= {r.doc_id for r in vids.select("doc_id").collect()}
    # every video doc yields ceil(len/64) frames (>=1)
    per_doc = {}
    for r in out:
        per_doc[r.doc_id] = max(per_doc.get(r.doc_id, 0), r.frame_idx + 1)
    sizes = {r.doc_id: r.n_bytes for r in vids.collect()}
    assert len(per_doc) == n_video
    for doc_id, nframes in per_doc.items():
        expect = max(1, -(-sizes[doc_id] // 64))
        assert nframes == expect


def test_resize_integer_invariants(spark, sf_small):
    """Resize stub: width capped, aspect preserved under integer floor
    (out_h = floor(h*out_w/w)), audio rows dropped, payload prefix
    proportional and non-empty."""
    from chchfr_data_collection_spark.multimodal import (
        attach_fake_media,
        resize_media,
    )
    from chchfr_data_collection_spark.session import load_table

    media = attach_fake_media(load_table(spark, sf_small, "documents"))
    out = resize_media(media, max_width=128).collect()
    assert out
    for r in out:
        assert r["media_type"] != "audio/wav"
        assert r["out_width"] == min(r["width"], 128)
        assert r["out_height"] == (r["height"] * r["out_width"]) // r["width"]
        assert 1 <= len(r["out_bytes"])
