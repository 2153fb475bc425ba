"""MP4 / ISO-BMFF structural metadata: muxer-pinned roundtrips,
version-1 full boxes, largesize, malformed rejection, and the Spark
operator path."""

import struct

import pytest

from aml_entity_resolution_assignment_spark.functions.mp4 import (
    Mp4Error,
    build_mp4,
    iter_boxes,
    parse_mp4,
)


def test_roundtrip_fields():
    b = build_mp4(
        width=1920, height=1080, duration=270000, timescale=90000,
        handler="vide", codec="hvc1", n_samples=90, language="fra",
        major_brand="mp42", track_id=7, sample_size=100,
    )
    m = parse_mp4(b)
    assert m.major_brand == "mp42" and m.compatible_brands == ["isom", "iso2"]
    assert m.timescale == 90000 and m.duration == 270000
    assert m.duration_seconds == 3.0
    (t,) = m.tracks
    assert (t.track_id, t.handler, t.codec) == (7, "vide", "hvc1")
    assert (t.width, t.height) == (1920.0, 1080.0)
    assert t.n_samples == 90 and t.const_sample_size == 100
    assert t.language == "fra"
    assert t.media_timescale == 90000 and t.media_duration == 270000


def test_audio_track_and_und_language():
    m = parse_mp4(build_mp4(
        width=0, height=0, duration=44100, timescale=44100,
        handler="soun", codec="mp4a",
    ))
    t = m.tracks[0]
    assert t.handler == "soun" and t.codec == "mp4a"
    assert t.language == "und"
    assert m.duration_seconds == 1.0


def test_version1_mvhd_and_largesize():
    # hand-built v1 mvhd (64-bit duration) inside moov with largesize
    payload = (
        b"\x01\x00\x00\x00"
        + struct.pack(">QQ", 0, 0)
        + struct.pack(">I", 1000)
        + struct.pack(">Q", 1 << 33)
        + b"\x00" * (4 + 2 + 10 + 36 + 24 + 4)
    )
    mvhd = struct.pack(">I", 8 + len(payload)) + b"mvhd" + payload
    inner = mvhd
    moov = (
        struct.pack(">I", 1)
        + b"moov"
        + struct.pack(">Q", 16 + len(inner))
        + inner
    )
    m = parse_mp4(moov)
    assert m.timescale == 1000 and m.duration == 1 << 33


def test_malformed_raises():
    good = build_mp4(width=16, height=16, duration=10)
    with pytest.raises(Mp4Error):
        parse_mp4(good[:10])  # truncated header
    bad = struct.pack(">I", 1 << 30) + b"moov" + b"\x00" * 8
    with pytest.raises(Mp4Error):
        parse_mp4(bad)  # size overruns file
    # size==0 box extends to EOF and must terminate iteration
    free = struct.pack(">I", 0) + b"free" + b"\x00" * 4
    assert [t for t, _, _ in iter_boxes(free)] == [b"free"]


def test_spark_mp4_metadata(spark):
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        mp4_metadata,
    )

    rows = [
        ("a", build_mp4(width=640, height=360, duration=30000,
                        timescale=1000, codec="avc1", n_samples=30)),
        ("b", build_mp4(width=0, height=0, duration=2000, timescale=1000,
                        handler="soun", codec="mp4a")),
        ("c", b"\x00\x01"),          # too short -> NULL row
        ("d", b"garbagegarbage!!"),  # malformed -> NULL row
        ("e", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r["media_id"]: r for r in mp4_metadata(df).collect()}
    assert len(got) == 5
    assert got["a"]["codec"] == "avc1" and got["a"]["width"] == 640.0
    assert got["a"]["duration_sec"] == 30.0 and got["a"]["n_samples"] == 30
    assert got["b"]["handler"] == "soun"
    for k in ("c", "d", "e"):
        assert got[k]["major_brand"] is None and got[k]["codec"] is None


def test_short_boxes_raise_mp4error_and_operator_nulls(spark):
    import struct

    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        mp4_metadata,
    )

    short_mvhd = struct.pack(">I", 12) + b"mvhd" + b"\x00" * 4
    header_only = struct.pack(">I", 8) + b"mvhd"
    with pytest.raises(Mp4Error):
        parse_mp4(short_mvhd)
    with pytest.raises(Mp4Error):
        parse_mp4(header_only)
    df = spark.createDataFrame(
        [("a", short_mvhd), ("b", header_only)],
        "media_id string, payload binary",
    )
    rows = mp4_metadata(df).collect()
    assert all(r["major_brand"] is None and r["codec"] is None for r in rows)
