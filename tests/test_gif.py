"""GIF codec (functions/gif.py): LZW roundtrips, interlace,
animation compositing with transparency, color-table edge cases,
corruption handling, and the multimodal dispatch."""

import numpy as np
import pytest

from aml_entity_resolution_assignment_spark.functions.gif import (
    decode_gif,
    encode_gif,
)


def _gray_palette():
    return np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)


def _idx(shape, seed=0, k=256):
    return np.random.default_rng(seed).integers(0, k, shape, dtype=np.uint8)


def test_single_frame_roundtrip():
    idx = _idx((13, 17), seed=1)
    frames, delays = decode_gif(encode_gif(idx, _gray_palette()))
    assert frames.shape == (1, 13, 17, 3)
    np.testing.assert_array_equal(frames[0], _gray_palette()[idx])


def test_small_palette_roundtrip():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = _idx((9, 11), seed=2, k=3)
    frames, _ = decode_gif(encode_gif(idx, pal))
    np.testing.assert_array_equal(frames[0], pal[idx])


def test_interlaced_roundtrip():
    for shape in ((16, 16), (13, 7), (5, 5), (1, 3)):
        idx = _idx(shape, seed=shape[0])
        frames, _ = decode_gif(encode_gif(idx, _gray_palette(), interlace=True))
        np.testing.assert_array_equal(
            frames[0], _gray_palette()[idx], err_msg=str(shape)
        )


def test_long_run_forces_clear_respam():
    # > max_run pixels so the encoder re-emits clear mid-stream
    idx = _idx((64, 64), seed=3)
    frames, _ = decode_gif(encode_gif(idx, _gray_palette()))
    np.testing.assert_array_equal(frames[0], _gray_palette()[idx])


def test_animation_frames_and_delays():
    fr = np.stack([_idx((8, 8), seed=s) for s in range(3)])
    frames, delays = decode_gif(
        encode_gif(fr, _gray_palette(), delays_ms=[100, 200, 50])
    )
    assert frames.shape == (3, 8, 8, 3)
    assert delays == [100, 200, 50]
    for i in range(3):
        np.testing.assert_array_equal(frames[i], _gray_palette()[fr[i]])


def test_transparency_composites_previous_frame():
    pal = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0]], dtype=np.uint8)
    f0 = np.full((4, 4), 1, dtype=np.uint8)
    f1 = np.zeros((4, 4), dtype=np.uint8)  # index 0 = transparent below
    payload = bytearray(encode_gif(np.stack([f0, f1]), pal, delays_ms=[10, 10]))
    # flag frame-2's graphic control as transparent on index 0:
    # find the second \x21\xf9\x04 block and set its flag byte + tidx
    first = payload.index(b"\x21\xf9\x04")
    second = payload.index(b"\x21\xf9\x04", first + 1)
    payload[second + 3] = 0x01  # transparency flag
    payload[second + 6] = 0  # transparent index 0
    frames, _ = decode_gif(bytes(payload))
    # frame 2 is all-transparent -> shows frame 1 unchanged
    np.testing.assert_array_equal(frames[1], frames[0])


def test_corrupt_rejected():
    payload = encode_gif(_idx((8, 8), seed=4), _gray_palette())
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + payload[6:])
    with pytest.raises(ValueError):
        decode_gif(payload[: len(payload) // 2])
    for cut in range(6, len(payload) - 1, 5):
        try:
            decode_gif(payload[:cut])
        except ValueError:
            pass  # never a non-ValueError escape


def test_multimodal_dispatch_decodes_gif():
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        _decode_image,
    )

    idx = _idx((16, 16), seed=5)
    out = _decode_image(encode_gif(idx, _gray_palette()))
    np.testing.assert_array_equal(out, _gray_palette()[idx])


def test_frame_stack_feeds_video_sampling():
    """Animated GIF = the real decode behind the frame-sampling plan:
    delays give frame timestamps; sampled ts map back to frames."""
    fr = np.stack([_idx((4, 4), seed=s) for s in range(4)])
    frames, delays = decode_gif(
        encode_gif(fr, _gray_palette(), delays_ms=[50, 50, 50, 50])
    )
    ts = np.cumsum([0] + delays[:-1])
    assert list(ts) == [0, 50, 100, 150]
    assert frames[np.searchsorted(ts, 120, side="right") - 1].shape == (4, 4, 3)


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
