"""Multimodal plumbing: binary columns + Arrow-batched decode path.

Codec libraries are absent in this environment, so decode_images runs its
clearly-marked deterministic fake — the schema, mapInPandas batching, and
checksum/byte-length logic are what is under test.
"""

import pyspark.sql.functions as F
import pytest

from iniz_exporters_spark.multimodal.binary import (
    binary_metadata,
    decode_images,
    extract_frames,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, b"PNG-fake-payload-AAAA"),
        (2, b"JPEG-fake-payload-BBBBBBBB"),
        (3, b""),
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_binary_metadata(media_df):
    got = {r["media_id"]: r for r in binary_metadata(media_df, "payload").collect()}
    assert got[1]["byte_len"] == 21
    assert got[2]["byte_len"] == 26
    assert got[3]["byte_len"] == 0
    assert got[3]["bin_checksum"] == 0
    assert got[1]["bin_checksum"] != got[2]["bin_checksum"]


def test_binary_metadata_checksum_is_byte_based(spark):
    """The JVM checksum must fold actual bytes (not a UTF-8 decode) and
    therefore agree with decode_images' Python byte checksum on payloads
    containing invalid-UTF-8 and multi-byte sequences."""
    rows = [
        (1, bytes([0xFF, 0xFE, 0x00, 0x89, 0x50, 0x4E, 0x47])),  # invalid UTF-8
        (2, "héllo🙂".encode("utf-8")),  # multi-byte sequences
        (3, bytes(range(200)) * 2),  # > 64 bytes, high bytes
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    jvm = {r["media_id"]: r["bin_checksum"]
           for r in binary_metadata(df, "payload").collect()}
    py = {r["media_id"]: r["checksum"]
          for r in decode_images(df, "payload", "media_id").collect()}
    assert jvm == py


def test_decode_images_fake_path(media_df):
    out = decode_images(media_df, "payload", "media_id")
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,width:int,height:int,format:string,"
        "byte_len:bigint,checksum:bigint>"
    )
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["format"] == "FAKE"  # no Pillow in this container
    assert rows[1]["byte_len"] == 21
    assert 1 <= rows[1]["width"] <= 64
    # determinism: same payload → same fake metadata
    again = {r["media_id"]: r for r in decode_images(media_df, "payload", "media_id").collect()}
    assert rows[1]["checksum"] == again[1]["checksum"]
    assert rows[1]["width"] == again[1]["width"]


def test_extract_frames_row_expansion(media_df, spark):
    """Fake-codec path: payload bytes are windowed into 16-byte 'frames',
    every_n sampling applies, empty payloads yield no rows, and the
    mapInPandas row expansion produces the declared schema."""
    out = extract_frames(media_df, "payload", "media_id", every_n=1)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,frame_idx:int,frame:binary>"
    )
    rows = out.collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    # 21 bytes → 2 fake frames (16 + 5); 26 bytes → 2 (16 + 10); empty → 0
    assert len(by_id[1]) == 2 and len(by_id[2]) == 2
    assert 3 not in by_id
    f0, f1 = sorted(by_id[1], key=lambda r: r["frame_idx"])
    assert (f0["frame_idx"], f1["frame_idx"]) == (0, 1)
    assert bytes(f0["frame"]) + bytes(f1["frame"]) == b"PNG-fake-payload-AAAA"
    # sampling: every_n=2 keeps only frame 0 of a 2-frame payload
    sampled = extract_frames(media_df, "payload", "media_id", every_n=2)
    got = [(r["media_id"], r["frame_idx"]) for r in sampled.collect()]
    assert sorted(got) == [(1, 0), (2, 0)]
    # determinism
    again = sorted(
        (r["media_id"], r["frame_idx"], bytes(r["frame"])) for r in
        extract_frames(media_df, "payload", "media_id", every_n=1).collect()
    )
    assert again == sorted(
        (r["media_id"], r["frame_idx"], bytes(r["frame"])) for r in rows
    )


def test_resize_images_plumbing(media_df):
    from iniz_exporters_spark.multimodal.binary import resize_images

    out = resize_images(media_df, "payload", "media_id", width=32, height=16)
    rows = {r["media_id"]: r for r in out.collect()}
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,resized:binary,width:int,height:int>"
    )
    assert all(r["width"] == 32 and r["height"] == 16 for r in rows.values())
    # fake path passes payload through unchanged
    assert rows[3]["resized"] == bytearray(b"")


def test_audio_features_fixed_dim_deterministic(media_df):
    from iniz_exporters_spark.multimodal.binary import (
        AUDIO_FEATURE_DIM,
        audio_features,
    )

    a = {r["media_id"]: r["features"] for r in
         audio_features(media_df, "payload", "media_id").collect()}
    b = {r["media_id"]: r["features"] for r in
         audio_features(media_df, "payload", "media_id").collect()}
    assert all(len(v) == AUDIO_FEATURE_DIM for v in a.values())
    assert a == b  # deterministic
    assert a[3] == [0.0] * AUDIO_FEATURE_DIM  # empty payload


def test_image_phash_pinned_and_stable(spark):
    """The fake-codec aHash is deterministic and pinned: same payload →
    same 64-bit hash regardless of batching/partitioning; empty payloads
    are skipped."""
    from iniz_exporters_spark.multimodal.binary import image_phash

    rows = [(1, b"hello world"), (2, b"hello world"), (3, b"")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in
           image_phash(df, "payload", "media_id").collect()}
    assert set(got) == {1, 2}  # empty payload dropped
    assert got[1]["phash"] == "ebddf75ed7baeebd"
    assert [got[1][f"b{j}"] for j in range(4)] == [60381, 63326, 55226, 61117]
    assert got[1]["phash"] == got[2]["phash"]
    # partition layout must not change hashes
    re = {r["media_id"]: r["phash"] for r in
          image_phash(df.repartition(7), "payload", "media_id").collect()}
    assert re == {i: got[i]["phash"] for i in got}


def test_phash_neardup_banded_pairs(spark):
    """Identical payloads pair at hamming 0; a far payload (hamming 22,
    no shared band) never becomes a candidate; max_hamming widens the
    verify radius but candidates still require a shared band."""
    from iniz_exporters_spark.multimodal.binary import (
        image_phash,
        phash_neardup,
    )

    rows = [
        (1, b"hello world"),
        (2, b"hello world"),
        (3, b"HELLO WORLD ENTIRELY DIFFERENT PAYLOAD 123456"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    h = image_phash(df, "payload", "media_id")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in phash_neardup(h, "media_id").collect()}
    assert pairs == {(1, 2): 0}
    # widening the radius cannot invent pairs without a shared band
    wide = {(r["id_a"], r["id_b"]): r["hamming"]
            for r in phash_neardup(h, "media_id", max_hamming=64).collect()}
    assert (1, 3) not in wide and (2, 3) not in wide
