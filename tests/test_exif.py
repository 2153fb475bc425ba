"""EXIF APP1 build/parse (functions/exif.py) + the Spark extraction
operator (operators/multimodal.exif_metadata)."""

import struct

import numpy as np
import pytest

from aml_entity_resolution_assignment_spark.functions.exif import (
    build_exif_app1,
    insert_app1,
    parse_exif,
)
from aml_entity_resolution_assignment_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg_gray,
)


def _full_jpeg(**fields):
    img = np.full((16, 16), 100, np.uint8)
    return insert_app1(encode_jpeg_gray(img), build_exif_app1(**fields))


def test_roundtrip_all_fields():
    j = _full_jpeg(
        make="CamCo",
        model="M3",
        orientation=6,
        datetime_str="2024:06:01 12:00:00",
        exposure=(1, 125),
        iso=200,
        pixel_x=640,
        pixel_y=480,
    )
    got = parse_exif(j)
    assert got == {
        "make": "CamCo",
        "model": "M3",
        "orientation": 6,
        "datetime": "2024:06:01 12:00:00",
        "exposure_num": 1,
        "exposure_den": 125,
        "iso": 200,
        "pixel_x": 640,
        "pixel_y": 480,
    }
    # the raster decode is unaffected by the spliced APP1
    assert decode_jpeg(j).shape == (16, 16)


def test_partial_fields_and_missing():
    j = _full_jpeg(make="X", orientation=1)
    got = parse_exif(j)
    assert got["make"] == "X" and got["orientation"] == 1
    assert got["model"] is None and got["iso"] is None
    # no APP1 at all -> None, not an error
    assert parse_exif(encode_jpeg_gray(np.zeros((8, 8), np.uint8))) is None
    assert parse_exif(b"\xff\xd8\xff\xd9") is None
    assert parse_exif(b"") is None


def test_big_endian_parse():
    """Hand-built MM (big-endian) TIFF payload: Orientation=3 and an
    inline ASCII Make — the parser must honor the byte order mark."""
    # header: MM, 42, IFD at 8; IFD: 2 entries
    ifd = struct.pack(">H", 2)
    ifd += struct.pack(">HHI", 271, 2, 4) + b"Zed\x00"  # Make inline
    ifd += struct.pack(">HHI", 274, 3, 1) + struct.pack(">H", 3) + b"\x00\x00"
    ifd += struct.pack(">I", 0)
    tiff = b"MM" + struct.pack(">H", 42) + struct.pack(">I", 8) + ifd
    got = parse_exif(b"Exif\x00\x00" + tiff)
    assert got["make"] == "Zed" and got["orientation"] == 3


def test_garbage_tolerant():
    """Corrupt offsets / unknown types are skipped, never raised."""
    ifd = struct.pack("<H", 2)
    # unknown value type 99
    ifd += struct.pack("<HHI", 271, 99, 1) + b"\x00\x00\x00\x00"
    # out-of-range overflow offset
    ifd += struct.pack("<HHI", 306, 2, 64) + struct.pack("<I", 1 << 20)
    ifd += struct.pack("<I", 0)
    tiff = b"II" + struct.pack("<H", 42) + struct.pack("<I", 8) + ifd
    got = parse_exif(b"Exif\x00\x00" + tiff)
    assert got is not None and got["make"] is None and got["datetime"] is None
    # truncated APP1 in a JPEG stream: scanner stops cleanly
    assert parse_exif(b"\xff\xd8\xff\xe1\x00\x04Ex") is None


def test_app1_precedes_other_segments():
    j = _full_jpeg(make="A")
    # APP1 marker immediately after SOI, per DC-008
    assert j[2:4] == b"\xff\xe1"


@pytest.mark.usefixtures("spark")
def test_exif_metadata_operator(spark):
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        exif_metadata,
    )

    payloads = [
        (
            "m1",
            _full_jpeg(
                make="CamCo",
                model="M1",
                orientation=5,
                datetime_str="2024:01:02 03:04:05",
                exposure=(1, 50),
                iso=400,
                pixel_x=32,
                pixel_y=24,
            ),
        ),
        ("m2", encode_jpeg_gray(np.zeros((8, 8), np.uint8))),  # no EXIF
        ("m3", None),  # missing payload
        ("m4", b"\x00\x01"),  # not a JPEG
    ]
    media = spark.createDataFrame(
        [
            (mid, "image", p, "image/jpeg", 16, 16, None)
            for mid, p in payloads
        ],
        "media_id string, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    rows = {r["media_id"]: r for r in exif_metadata(media).collect()}
    assert rows["m1"]["make"] == "CamCo"
    assert rows["m1"]["orientation"] == 5
    assert rows["m1"]["exposure_den"] == 50
    assert rows["m1"]["iso"] == 400
    assert rows["m1"]["pixel_x"] == 32 and rows["m1"]["pixel_y"] == 24
    assert rows["m1"]["exif_datetime"] == "2024:01:02 03:04:05"
    for mid in ("m2", "m3", "m4"):
        assert rows[mid]["make"] is None and rows[mid]["orientation"] is None
    assert len(rows) == 4  # no rows dropped
