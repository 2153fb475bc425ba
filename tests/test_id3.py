"""ID3 tag metadata: encoder-pinned roundtrips across versions and
text encodings, v1 fallback, malformed rejection, Spark operator."""

import pytest

from aml_entity_resolution_assignment_spark.functions.id3 import (
    Id3Error,
    build_id3v1,
    build_id3v2,
    parse_id3,
    parse_id3v2,
)


@pytest.mark.parametrize("major", [3, 4])
@pytest.mark.parametrize("encoding", [0, 1, 2, 3])
def test_v2_roundtrip_all_encodings(major, encoding):
    b = build_id3v2(
        major=major, encoding=encoding, title="Héllo", artist="Ärtist",
        album="Albüm", year="2003", track="7/12", genre="Rock",
    )
    m = parse_id3(b + b"\xff\xfb\x00\x00")
    assert m.version == f"2.{major}"
    assert (m.title, m.artist, m.album) == ("Héllo", "Ärtist", "Albüm")
    assert (m.year, m.track, m.genre) == ("2003", "7/12", "Rock")


def test_v1_fallback_and_absent():
    data = b"\xff\xfb" * 40 + build_id3v1(
        title="T", artist="A", album="L", year="1999", track=3, genre=17
    )
    m = parse_id3(data)
    assert (m.version, m.track, m.genre) == ("1.1", "3", "Rock")
    assert parse_id3(b"\xff\xfb" * 40) is None
    # v2 wins over a trailing v1
    both = build_id3v2(title="V2") + build_id3v1(title="V1")
    assert parse_id3(both).title == "V2"


def test_malformed_raises():
    with pytest.raises(Id3Error):
        parse_id3v2(b"ID3\x05\x00\x00\x00\x00\x00\x00")  # v2.5
    with pytest.raises(Id3Error):
        parse_id3v2(b"ID3\x03\x00\x00\x7f\x7f\x7f\x7f")  # size overrun
    bad_enc = build_id3v2(title="x")
    bad = bytearray(bad_enc)
    bad[20] = 9  # unknown encoding byte of the TIT2 payload
    with pytest.raises(Id3Error):
        parse_id3v2(bytes(bad))


def test_spark_id3_metadata(spark):
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        id3_metadata,
    )

    rows = [
        ("a", build_id3v2(major=4, encoding=3, title="T4", genre="Pop")),
        ("b", b"\xff\xfb" + build_id3v1(title="Old", genre=13)),
        ("c", b"\xff\xfb\x00\x00"),
        ("d", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r["media_id"]: r for r in id3_metadata(df).collect()}
    assert got["a"]["tag_version"] == "2.4" and got["a"]["title"] == "T4"
    assert got["b"]["tag_version"] == "1.0" and got["b"]["genre"] == "Pop"
    assert got["c"]["tag_version"] is None and got["d"]["title"] is None


def test_garbage_text_bytes_are_id3error_and_null_row(spark):
    from aml_entity_resolution_assignment_spark.functions.id3 import (
        Id3Error,
        parse_id3v2,
    )
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        id3_metadata,
    )

    # UTF-8 frame carrying invalid bytes: structured error, not
    # UnicodeDecodeError escaping the operator's all-NULL contract
    frame = b"TIT2" + (3).to_bytes(4, "big") + b"\x00\x00" + b"\x03\xff\xfe"
    body = frame + b"\x00" * 10
    size = len(body)
    ss = bytes([(size >> 21) & 127, (size >> 14) & 127,
                (size >> 7) & 127, size & 127])
    tag = b"ID3\x03\x00\x00" + ss + body
    import pytest

    with pytest.raises(Id3Error):
        parse_id3v2(tag)
    df = spark.createDataFrame([("x", tag)], "media_id string, payload binary")
    row = id3_metadata(df).collect()[0]
    assert row["tag_version"] is None and row["title"] is None
