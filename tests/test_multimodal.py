"""Multimodal column plumbing: binary payload + typed metadata, Arrow-batched
mapInPandas feature/frame operators, stubbed codec decode.  (Value-level
oracle parity is covered by test_oracle_parity.py.)"""

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_http_full_cache_connector_spark.operators.multimodal import (
    FRAME_LEN,
    FRAME_STRIDE,
    attach_media,
    decode_audio,
    decode_image,
    decode_resize_images,
    extract_features,
    frame_sample,
)


@pytest.fixture()
def media(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="hello world", source="web"),
            Row(doc_id=2, text="x" * 200, source="pdf"),
            Row(doc_id=3, text="héllo ünicode", source="web"),
        ]
    )
    return attach_media(docs)


def test_attach_media_schema_and_metadata(media):
    assert [f.name for f in media.schema.fields] == ["doc_id", "payload", "meta"]
    assert media.schema["payload"].dataType.typeName() == "binary"
    rows = {r.doc_id: r for r in media.collect()}
    assert bytes(rows[1].payload) == b"hello world"
    assert rows[1].meta.kind == "web"
    assert rows[1].meta.byte_len == 11
    assert rows[1].meta.checksum == hashlib.md5(b"hello world").hexdigest()
    # multibyte text: byte_len counts UTF-8 bytes, not characters
    assert rows[3].meta.byte_len == len("héllo ünicode".encode())


def test_extract_features_values(media):
    feats = {r.doc_id: r for r in extract_features(media).collect()}
    assert feats[1].byte_len == 11
    assert feats[1].checksum == hashlib.md5(b"hello world").hexdigest()
    assert feats[1].header_hex == b"hell".hex().upper()
    assert feats[1].header_u32 == int.from_bytes(b"hell", "big")
    # header is by characters: multibyte chars widen the byte window
    assert feats[3].header_hex == "héll".encode().hex().upper()


def test_frame_sample_covers_text(media):
    frames = frame_sample(media).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 11 chars -> 1 frame, the whole prefix
    (f0,) = by_doc[1]
    assert f0.frame_idx == 0
    assert f0.frame_hex == b"hello world".hex().upper()
    # doc 2: 200 chars, stride 64 -> frames at 0,64,128,192
    assert [r.frame_idx for r in sorted(by_doc[2], key=lambda r: r.frame_idx)] == [
        0,
        1,
        2,
        3,
    ]
    full = bytes.fromhex(by_doc[2][0].frame_hex).decode()
    assert full == "x" * FRAME_LEN
    last = sorted(by_doc[2], key=lambda r: r.frame_idx)[-1]
    assert bytes.fromhex(last.frame_hex).decode() == "x" * (200 - 3 * FRAME_STRIDE)


def test_decode_stubs_raise_not_implemented():
    with pytest.raises(NotImplementedError, match="pillow"):
        decode_image(b"\x89PNG...")
    with pytest.raises(NotImplementedError, match="soundfile"):
        decode_audio(b"RIFF...")


def test_decode_resize_plan_builds_but_execution_raises(media):
    # the Spark plan (widen -> Arrow batch -> typed struct) must build fine;
    # only executing the stubbed codec fails, from inside the Python worker
    df = decode_resize_images(media)
    assert [f.name for f in df.schema.fields] == [
        "doc_id",
        "width",
        "height",
        "mode",
        "thumbnail",
    ]
    with pytest.raises(Exception, match="NotImplementedError|pillow"):
        df.collect()


def test_mapinpandas_is_partition_parallel(spark, media):
    # the physical plan should contain no shuffle introduced by the operator
    # beyond the widen repartition: features are map-side only
    plan = extract_features(media)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_fake_thumbnail_semantics():
    from flink_http_full_cache_connector_spark.operators.multimodal import (
        MAX_SIDE,
        fake_thumbnail,
    )

    assert fake_thumbnail(100, 50) == (100, 50)  # already fits: no-op
    assert fake_thumbnail(MAX_SIDE, MAX_SIDE) == (MAX_SIDE, MAX_SIDE)
    w, h = fake_thumbnail(512, 256)  # 2:1 landscape halves
    assert (w, h) == (256, 128)
    w, h = fake_thumbnail(1000, 10)  # extreme ratio floors but never hits 0
    assert w == MAX_SIDE and h >= 1
    assert max(fake_thumbnail(5000, 4999)) == MAX_SIDE
