"""MPEG audio frame-header walking: encoder-pinned chains across
versions/layers/rates, ID3 skipping, malformed rejection, operator."""

import pytest

from aml_entity_resolution_assignment_spark.functions.id3 import (
    build_id3v1,
    build_id3v2,
)
from aml_entity_resolution_assignment_spark.functions.mpeg_audio import (
    MpegAudioError,
    build_frames,
    parse_frame_header,
    stream_stats,
)


@pytest.mark.parametrize(
    "version,layer,bitrate,sr,spf",
    [
        ("1", 3, 128, 44100, 1152),
        ("1", 2, 192, 48000, 1152),
        ("1", 1, 448, 32000, 384),
        ("2", 3, 64, 22050, 576),
        ("2.5", 3, 40, 11025, 576),
    ],
)
def test_chain_walk_and_duration(version, layer, bitrate, sr, spf):
    n = 12
    s = stream_stats(
        build_frames(n, bitrate_kbps=bitrate, samplerate=sr,
                     layer=layer, version=version)
    )
    assert (s.n_frames, s.samplerate, s.layer, s.version) == (
        n, sr, layer, version
    )
    assert abs(s.duration_sec - n * spf / sr) < 1e-12
    assert s.is_cbr and s.mean_bitrate_kbps == bitrate


def test_id3_skipped_and_padding_walked():
    data = (
        build_id3v2(title="skip me")
        + build_frames(9, pad_every=3)
        + build_id3v1(title="tail")
    )
    s = stream_stats(data)
    assert s.n_frames == 9 and s.mode == "joint_stereo"


def test_frame_length_formulas():
    # Layer III MPEG-1 128kbps@44100: 144*128000/44100 = 417 (+pad)
    fi = parse_frame_header(build_frames(1))
    assert fi.frame_bytes == 417
    # Layer I: slot arithmetic in 4-byte units
    fi1 = parse_frame_header(
        build_frames(1, bitrate_kbps=448, samplerate=32000, layer=1)
    )
    assert fi1.frame_bytes == (12 * 448000 // 32000) * 4


def test_malformed_raises():
    with pytest.raises(MpegAudioError):
        stream_stats(b"\x00\x01\x02\x03" * 4)  # never syncs
    with pytest.raises(MpegAudioError):
        parse_frame_header(b"\xff\xfb")  # truncated
    bad = bytearray(build_frames(1))
    bad[2] |= 0xF0  # bitrate index 15
    with pytest.raises(MpegAudioError):
        parse_frame_header(bytes(bad))


def test_spark_mp3_stats(spark):
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        mp3_stats,
    )

    rows = [
        ("a", build_frames(20)),
        ("b", build_id3v2(title="x") + build_frames(5, bitrate_kbps=64,
                                                    samplerate=22050,
                                                    version="2", mode="mono")),
        ("c", b"\x00\x00\x00\x00"),
        ("d", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r["media_id"]: r for r in mp3_stats(df).collect()}
    assert got["a"]["n_frames"] == 20 and got["a"]["is_cbr"]
    assert got["b"]["mpeg_version"] == "2" and got["b"]["mode"] == "mono"
    assert got["c"]["n_frames"] is None and got["d"]["layer"] is None
