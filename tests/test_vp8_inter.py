"""VP8 INTER frames (round 5, RFC 6386 §16-§18): motion-vector entropy
coding, the near-MV survey with count-based mode contexts, last/golden/
altref reference management, quarter/eighth-pel six-tap motion
compensation, and the IVF sequence container.

Contract: decode_ivf(encode_vp8_video(...)) must equal the encoder's
decoder-identical reconstruction BIT-EXACTLY for every frame; flat
content at qi=0 must roundtrip EXACTLY (the multimodal oracle's
property)."""

import numpy as np
import pytest

from aml_entity_resolution_assignment_spark.functions import vp8


def _flat(v):
    return np.full((32, 32), v, dtype=np.uint8)


def _assert_sequence_exact(ivf, recs, sources=None):
    dec, _fps = vp8.decode_ivf(ivf)
    assert len(dec) == len(recs)
    for i, ((y, u, v), rec) in enumerate(zip(dec, recs)):
        assert np.array_equal(y, rec[0]), f"frame {i}: luma != encoder rec"
        assert np.array_equal(u, rec[1]) and np.array_equal(v, rec[2]), i
        if sources is not None:
            assert np.array_equal(y, sources[i]), f"frame {i}: lossy"
    return dec


def test_zero_mv_flat_sequence_exact():
    frames = [_flat(b) for b in (100, 140, 60, 200, 30)]
    ivf, recs = vp8.encode_vp8_video(frames, qi=0)
    _assert_sequence_exact(ivf, recs, sources=frames)


def test_newmv_integer_and_subpel_flat_exact():
    """NEWMV residual coding (short + long MV components, signs) and
    the six-tap subpel path: on flat planes every filter output equals
    the constant (taps sum to 128), so qi=0 stays exact end-to-end."""
    frames = [_flat(b) for b in (90, 180, 45, 220)]
    all_mbs = [(r, c) for r in range(2) for c in range(2)]
    modes = {
        1: {m: {"mode": vp8.NEWMV, "mv": (8, -16)} for m in all_mbs},
        # quarter-pel fractions + a long (>= 8 quarter-pel) component
        2: {m: {"mode": vp8.NEWMV, "mv": (2, 6)} for m in all_mbs},
        3: {m: {"mode": vp8.NEWMV, "mv": (-34, 70)} for m in all_mbs},
    }
    ivf, recs = vp8.encode_vp8_video(frames, qi=0, mb_modes_per_frame=modes)
    _assert_sequence_exact(ivf, recs, sources=frames)


def test_nearest_near_zero_modes_roundtrip():
    """NEARESTMV/NEARMV resolve against the decoder's own near-MV
    survey — the encoder runs the identical survey, so mixed-mode MBs
    roundtrip bit-exactly."""
    frames = [_flat(b) for b in (90, 180, 120)]
    modes = {
        1: {
            (0, 0): {"mode": vp8.NEWMV, "mv": (8, 8)},
            (0, 1): {"mode": vp8.NEARESTMV},  # surveys (8,8) from left
            (1, 0): {"mode": vp8.ZEROMV},
            (1, 1): {"mode": vp8.NEARMV},
        },
        2: {
            (0, 0): {"mode": vp8.NEWMV, "mv": (-8, 16)},
            (0, 1): {"mode": vp8.NEWMV, "mv": (8, -8)},
            (1, 0): {"mode": vp8.NEARESTMV},
            (1, 1): {"mode": vp8.NEARMV},
        },
    }
    ivf, recs = vp8.encode_vp8_video(frames, qi=0, mb_modes_per_frame=modes)
    _assert_sequence_exact(ivf, recs, sources=frames)


def test_real_motion_compensation_recovers_shift():
    """A textured frame translated by a whole-pel vector: NEWMV with
    the matching MV predicts it from 'last', the residual is pure
    quantization noise, and the decode equals the encoder rec
    bit-exactly."""
    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, (32, 32)).astype(np.uint8)
    shifted = np.roll(base, (4, -8), axis=(0, 1))
    mv = {(r, c): {"mode": vp8.NEWMV, "mv": (-4 << 3, 8 << 3)}
          for r in range(2) for c in range(2)}
    ivf, recs = vp8.encode_vp8_video(
        [base, shifted], qi=4, mb_modes_per_frame={1: mv}
    )
    dec = _assert_sequence_exact(ivf, recs)
    # MC actually engaged: error vs the true shifted source is small
    err = np.abs(dec[1][0].astype(int) - shifted.astype(int)).mean()
    assert err < 3.0, err


def test_subpel_sixtap_on_texture_bit_exact():
    """Half/quarter-pel MVs over texture drive the two-pass six-tap
    filter with nonzero taps; the contract is decode == encoder rec
    (both run the same interpolation) for every fractional phase."""
    rng = np.random.default_rng(11)
    base = rng.integers(0, 255, (32, 32)).astype(np.uint8)
    nxt = rng.integers(0, 255, (32, 32)).astype(np.uint8)
    for mv in ((2, 0), (0, 2), (4, 4), (6, 2), (-2, -6), (12, -10)):
        modes = {1: {(r, c): {"mode": vp8.NEWMV, "mv": mv}
                     for r in range(2) for c in range(2)}}
        ivf, recs = vp8.encode_vp8_video(
            [base, nxt], qi=8, mb_modes_per_frame=modes
        )
        _assert_sequence_exact(ivf, recs)


def test_golden_and_altref_references():
    """Reference management: frame 1 refreshes golden; frame 2 changes
    'last' completely; frame 3 predicts from GOLDEN (the frame-1
    content) with zero residual at qi=0 — decoding proves the buffer
    routing, not just last-frame chaining."""
    f0, f1, f2 = _flat(100), _flat(160), _flat(40)
    stream0, rec0 = vp8.encode_vp8(f0, qi=0)
    refs = {k: rec0 for k in ("last", "golden", "altref")}
    s1, rec1, refs = vp8.encode_vp8_inter(
        f1, refs=refs, qi=0, refresh_golden=True
    )
    s2, rec2, refs = vp8.encode_vp8_inter(f2, refs=refs, qi=0)
    # frame 3: every MB ZEROMV from golden -> reconstructs frame 1
    modes = {(r, c): {"mode": vp8.ZEROMV, "ref": "golden"}
             for r in range(2) for c in range(2)}
    s3, rec3, refs = vp8.encode_vp8_inter(
        _flat(160), refs=refs, qi=0, mb_modes=modes
    )
    dec, drefs = vp8.decode_vp8_frame(stream0)
    for s, expect in ((s1, f1), (s2, f2), (s3, _flat(160))):
        (y, u, v), drefs = vp8.decode_vp8_frame(s, drefs)
        assert np.array_equal(y, expect)
    # golden was refreshed at frame 1 and then never overwritten
    assert np.array_equal(drefs["golden"][0], rec1[0])


def test_intra_mb_inside_inter_frame():
    """Intra MBs in inter frames use the non-KF mode trees and the
    context-free 4x4 probs; mix intra DC/TM/B_PRED with inter
    neighbors and roundtrip."""
    rng = np.random.default_rng(3)
    base = rng.integers(0, 255, (32, 32)).astype(np.uint8)
    nxt = rng.integers(0, 255, (32, 32)).astype(np.uint8)
    modes = {1: {
        (0, 0): {"mode": vp8.DC_PRED},
        (0, 1): {"mode": vp8.ZEROMV},
        (1, 0): {"mode": vp8.TM_PRED},
        (1, 1): {"mode": vp8.B_PRED,
                 "bmodes": [vp8.B_VE, vp8.B_HE] * 8},
    }}
    ivf, recs = vp8.encode_vp8_video(
        [base, nxt], qi=12, mb_modes_per_frame=modes
    )
    _assert_sequence_exact(ivf, recs)


def test_skip_mbs_in_inter_frame():
    """An unchanged flat region under ZEROMV quantizes to all-zero
    levels -> the MB skips (no tokens) and still reconstructs exactly.
    Flat quadrants keep frame 0's key-frame reconstruction exact, so
    'unchanged' is exact too and the skip path is really taken."""
    base = np.zeros((32, 32), dtype=np.uint8)
    for q, (ys, xs) in enumerate(((0, 0), (0, 16), (16, 0), (16, 16))):
        base[ys : ys + 16, xs : xs + 16] = 60 + 40 * q
    nxt = base.copy()
    nxt[16:, 16:] = 233  # one MB changes; the other three skip
    ivf, recs = vp8.encode_vp8_video([base, nxt], qi=0)
    dec = _assert_sequence_exact(ivf, recs, sources=[base, nxt])
    # skip actually engaged: the inter frame codes ONE MB's tokens;
    # an all-coded variant (every quadrant changed) must be larger
    all_changed = np.clip(base.astype(int) + 97, 0, 255).astype(np.uint8)
    ivf_all, _ = vp8.encode_vp8_video([base, all_changed], qi=0)
    f1 = vp8.decode_ivf_frames(ivf)[0][1]
    f1_all = vp8.decode_ivf_frames(ivf_all)[0][1]
    assert len(f1) < len(f1_all)


def test_inter_frame_with_loop_filter():
    """Inter frames run the non-key-frame loop-filter limits; decode
    must still equal the encoder's filtered reconstruction."""
    rng = np.random.default_rng(9)
    base = rng.integers(0, 255, (32, 32)).astype(np.uint8)
    nxt = np.roll(base, 8, axis=1)
    modes = {1: {(r, c): {"mode": vp8.NEWMV, "mv": (0, -8 << 3)}
                 for r in range(2) for c in range(2)}}
    ivf, recs = vp8.encode_vp8_video(
        [base, nxt], qi=24, mb_modes_per_frame=modes,
        filter_level=20, filter_type=0,
    )
    _assert_sequence_exact(ivf, recs)


def test_mv_component_codec_exhaustive():
    """The MV component coder roundtrips every magnitude class: short
    tree (0-7), long form with/without the implicit bit-3, signs."""
    probs = vp8.DEFAULT_MV_CONTEXT
    vals = list(range(-40, 41)) + [255, -255, 400, -400, 1023 // 2]
    be = vp8.BoolEncoder()
    for v in vals:
        vp8._write_mv_component(be, probs[0], v)
        vp8._write_mv_component(be, probs[1], -v)
    bd = vp8.BoolDecoder(be.finish())
    for v in vals:
        assert vp8._read_mv_component(bd, probs[0]) == v
        assert vp8._read_mv_component(bd, probs[1]) == -v


def test_ivf_container_roundtrip_and_guards():
    frames = [b"abc", b"defgh", b""]
    ivf = vp8.encode_ivf(frames, 64, 48, fps=25)
    got, (w, h, fps) = vp8.decode_ivf_frames(ivf)
    assert got == frames and (w, h, fps) == (64, 48, 25)
    with pytest.raises(ValueError, match="IVF"):
        vp8.decode_ivf_frames(b"RIFFxxxx")


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
