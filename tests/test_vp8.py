"""VP8 (lossy WebP key-frame) codec: bool-coder properties, transform
identities, and encoder<->decoder roundtrips across modes/filters.

The roundtrip contract: decode_vp8(encode_vp8(img)) must equal the
encoder's own decoder-identical reconstruction EXACTLY (integer math,
no tolerance) — this verifies the entropy coding, contexts, transforms
and reconstruction end-to-end independent of probability-table values
(see functions/vp8.py module docstring for what that proves)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aml_entity_resolution_assignment_spark.functions import vp8


# ---------------------------------------------------------------------------
# boolean coder
# ---------------------------------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 254), st.integers(0, 1)), min_size=0, max_size=300
    )
)
def test_bool_coder_roundtrip(seq):
    be = vp8.BoolEncoder()
    for p, b in seq:
        be.put(p, b)
    bd = vp8.BoolDecoder(be.finish())
    assert [bd.read(p) for p, _ in seq] == [b for _, b in seq]


def test_bool_decoder_range_invariant():
    # decoding any byte stream keeps range in [128, 255]
    rng = np.random.default_rng(3)
    bd = vp8.BoolDecoder(rng.integers(0, 256, 64, dtype=np.uint8).tobytes())
    for i in range(300):
        bd.read(1 + i % 254)
        assert 128 <= bd.range <= 255


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 255), st.integers(-63, 63))
def test_literal_roundtrip(v, s):
    be = vp8.BoolEncoder()
    be.literal(8, v)
    be.signed_literal(6, s)
    be.flag_signed(4, s % 16 if s >= 0 else -(abs(s) % 16))
    bd = vp8.BoolDecoder(be.finish())
    assert bd.literal(8) == v
    assert bd.signed_literal(6) == s
    assert bd.flag_signed(4) == (s % 16 if s >= 0 else -(abs(s) % 16))


def test_tree_roundtrip_all_symbols():
    for tree, probs, symbols in (
        (vp8.KF_YMODE_TREE, vp8.KF_YMODE_PROB, range(5)),
        (vp8.UV_MODE_TREE, vp8.KF_UV_MODE_PROB, range(4)),
        (vp8.BMODE_TREE, vp8._kf_bmode_prob(vp8.B_DC, vp8.B_TM), range(10)),
        (vp8.COEF_TREE, vp8.DEFAULT_COEF_PROBS[2, 3, 1], range(12)),
    ):
        be = vp8.BoolEncoder()
        for s in symbols:
            be.tree(tree, probs, s)
        bd = vp8.BoolDecoder(be.finish())
        assert [bd.tree(tree, probs) for _ in symbols] == list(symbols)


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def test_idct_dc_only_is_flat():
    # single DC coefficient x -> all pixels (x + 4) >> 3 (spec identity)
    for x in (-221, -8, 0, 8, 63, 800):
        blk = np.zeros((4, 4), dtype=np.int64)
        blk[0, 0] = x
        out = vp8.idct4x4(blk)
        assert (out == ((x + 4) >> 3)).all(), x


def test_iwht_dc_only_is_flat():
    for x in (-3562, -64, 0, 64, 1000):
        blk = np.zeros((4, 4), dtype=np.int64)
        blk[0, 0] = x
        out = vp8.iwht4x4(blk)
        assert (out == ((x + 3) >> 3)).all(), x


def test_fdct_idct_near_identity():
    rng = np.random.default_rng(11)
    for _ in range(50):
        px = rng.integers(-128, 128, (4, 4)).astype(np.int64)
        rec = vp8.idct4x4(vp8.fdct4x4(px))
        assert np.abs(rec - px).max() <= 2  # integer-approximation bound


def test_fwht_iwht_near_identity():
    rng = np.random.default_rng(12)
    for _ in range(50):
        dcs = rng.integers(-1024, 1024, (4, 4)).astype(np.int64)
        rec = vp8.iwht4x4(vp8.fwht4x4(dcs))
        assert np.abs(rec - dcs).max() <= 4


def test_dequant_factors_spec_rules():
    f = vp8.dequant_factors(0)
    assert f["y"] == (4, 4)
    assert f["y2"][0] == 8  # dc * 2
    assert f["y2"][1] == 8  # max(8, ac*155//100)
    f127 = vp8.dequant_factors(127)
    assert f127["uv"][0] == 132  # uv dc clamp
    assert f127["y"][1] == vp8.AC_QLOOKUP[127]


# ---------------------------------------------------------------------------
# intra predictors — hand-computed spec cases
# ---------------------------------------------------------------------------


def test_pred_dc_edges():
    above = np.full(16, 100, dtype=np.uint8)
    left = np.full(16, 60, dtype=np.uint8)
    assert vp8.pred_dc(above, left, True, True, 16)[0, 0] == 80
    assert vp8.pred_dc(above, left, True, False, 16)[0, 0] == 100
    assert vp8.pred_dc(above, left, False, True, 16)[0, 0] == 60
    assert vp8.pred_dc(above, left, False, False, 16)[0, 0] == 128


def test_pred_tm_clamps():
    above = np.array([250, 250, 250, 250], dtype=np.uint8)
    left = np.array([250, 0, 128, 10], dtype=np.uint8)
    out = vp8.pred_tm(above, left, 10, 4)
    # row 0: 250 + 250 - 10 = 490 -> clamp 255; row 1: 0+250-10=240
    assert out[0, 0] == 255 and out[1, 0] == 240


def test_pred_b_ve_filter():
    above = np.array([10, 20, 30, 40], dtype=np.uint8)
    ar = np.array([50, 0, 0, 0], dtype=np.uint8)
    left = np.zeros(4, dtype=np.uint8)
    out = vp8.pred_b(vp8.B_VE, above, ar, left, 8)
    # col 0: (8 + 2*10 + 20 + 2) >> 2 = 12
    assert (out[:, 0] == 12).all()
    # col 3: (30 + 2*40 + 50 + 2) >> 2 = 40
    assert (out[:, 3] == 40).all()


def test_pred_b_hu_bottom_replicates():
    left = np.array([10, 20, 30, 40], dtype=np.uint8)
    out = vp8.pred_b(
        vp8.B_HU, np.zeros(4, np.uint8), np.zeros(4, np.uint8), left, 0
    )
    assert (out[3] == 40).all()
    assert out[0, 0] == (10 + 20 + 1) >> 1


# ---------------------------------------------------------------------------
# full-frame roundtrips
# ---------------------------------------------------------------------------


def _roundtrip(img, **kw):
    stream, rec = vp8.encode_vp8(img.get("y"), img.get("u"), img.get("v"), **kw)
    got = vp8.decode_vp8(stream)
    for g, r in zip(got, rec):
        assert np.array_equal(g, r)
    return got


def test_flat_image_exact_at_qi0():
    # flat MBs quantize exactly at qi=0: decode == source, not just rec
    for g in (0, 17, 100, 200, 255):
        y = np.full((32, 32), g, dtype=np.uint8)
        got = _roundtrip({"y": y}, qi=0)
        assert (got[0] == g).all(), g
        assert (got[1] == 128).all() and (got[2] == 128).all()


def test_gradient_quality_scales_with_qi():
    y = (np.arange(48)[None, :] * 5 + np.arange(32)[:, None] * 3).astype(np.uint8)
    err_prev = -1
    for qi in (0, 30, 100):
        got = _roundtrip({"y": y}, qi=qi)
        err = int(np.abs(got[0].astype(int) - y.astype(int)).max())
        assert err >= err_prev  # coarser quantizer -> no better
        err_prev = err
    assert int(np.abs(_roundtrip({"y": y}, qi=0)[0].astype(int) - y).max()) <= 6


def test_all_prediction_modes_roundtrip():
    rng = np.random.default_rng(7)
    y = rng.integers(0, 255, (48, 64)).astype(np.uint8)
    u = rng.integers(0, 255, (24, 32)).astype(np.uint8)
    v = rng.integers(0, 255, (24, 32)).astype(np.uint8)
    modes = {}
    k = 0
    for r in range(3):
        for c in range(4):
            if (r + c) % 2 == 0:
                modes[(r, c)] = {
                    "ymode": vp8.B_PRED,
                    "bmodes": [(k + i) % 10 for i in range(16)],
                    "uvmode": (r + c) % 4,
                }
            else:
                modes[(r, c)] = {
                    "ymode": (r * 4 + c) % 4,  # DC/V/H/TM
                    "uvmode": (r * 2 + c) % 4,
                }
            k += 3
    _roundtrip({"y": y, "u": u, "v": v}, qi=8, per_mb_modes=modes)


def test_skip_macroblocks_roundtrip():
    # flat second half -> residual-free MBs exercise the skip path
    y = np.full((32, 64), 90, dtype=np.uint8)
    y[:, :16] = np.arange(16, dtype=np.uint8)[None, :] * 7
    _roundtrip({"y": y}, qi=50)


@pytest.mark.parametrize("ftype", [0, 1])
def test_loop_filter_roundtrip(ftype):
    # smooth gradient + coarse quantizer -> blocking artifacts the
    # filter is designed to smooth (on NOISE the interior-smoothness
    # mask correctly suppresses filtering — that's spec behavior)
    y = (np.arange(64)[None, :] * 4 + np.arange(32)[:, None] * 2).astype(np.uint8)
    got_nf = _roundtrip({"y": y}, qi=110, filter_level=0)
    got_f = _roundtrip({"y": y}, qi=110, filter_level=40, filter_type=ftype)
    # the filter must actually change pixels (and still roundtrip)
    assert not np.array_equal(got_nf[0], got_f[0])


def test_loop_filter_noop_on_noise():
    rng = np.random.default_rng(9)
    y = rng.integers(0, 255, (32, 48)).astype(np.uint8)
    got_nf = _roundtrip({"y": y}, qi=40, filter_level=0)
    got_f = _roundtrip({"y": y}, qi=40, filter_level=32)
    # interior-smoothness mask: heavy texture is left untouched
    assert np.array_equal(got_nf[0], got_f[0])


def test_normal_filter_edge_smooths_step():
    # flat 100 | 110 step edge, wide-open limits: the mb filter's
    # 27/18/9 taps must pull the two sides together symmetrically
    n = 8
    cols = [np.full(n, 100) for _ in range(4)] + [np.full(n, 110) for _ in range(4)]
    res = vp8._normal_filter_edge(cols, interior=63, edge=255, hev_t=0, mb=True)
    p2, p1, p0, q0, q1, q2 = [r.astype(int) for r in res]
    assert (p0 > 100).all() and (q0 < 110).all()
    assert (p0 - 100 == 110 - q0).all()  # symmetric step response
    assert (p1 >= 100).all() and (q1 <= 110).all()


def test_simple_filter_edge_only_touches_p0_q0():
    n = 4
    px = [np.full(n, 100), np.full(n, 100), np.full(n, 130), np.full(n, 130)]
    p0, q0 = vp8._simple_filter_edge(px, edge=255)
    # a = clamp(clamp(p1-q1) + 3*(q0-p0)) = 60 -> F1 = 8, F2 = 7
    assert (p0 == 107).all() and (q0 == 122).all()


def test_odd_dimensions_cropped():
    rng = np.random.default_rng(10)
    y = rng.integers(0, 255, (37, 53)).astype(np.uint8)
    got = _roundtrip({"y": y}, qi=12)
    assert got[0].shape == (37, 53)
    assert got[1].shape == (19, 27)


def test_inter_frame_needs_refs():
    """decode_vp8 (the key-frame API) refuses inter frames with an
    actionable message; decode_vp8_frame without refs likewise (round
    5: inter frames DO decode once reference buffers are supplied —
    see test_vp8_inter.py)."""
    y = np.full((16, 16), 128, dtype=np.uint8)
    stream, _ = vp8.encode_vp8(y)
    bad = bytes([stream[0] | 1]) + stream[1:]  # flip key-frame bit
    with pytest.raises(ValueError, match="inter frame"):
        vp8.decode_vp8(bad)
    with pytest.raises(ValueError, match="reference buffers"):
        vp8.decode_vp8_frame(bad)


def test_webp_container_lossy_dispatch():
    from aml_entity_resolution_assignment_spark.functions.webp import decode_webp

    y = np.full((32, 32), 77, dtype=np.uint8)
    payload, rec = vp8.encode_webp_lossy(y, qi=0)
    rgb = decode_webp(payload)
    assert rgb.shape == (32, 32, 3)
    # flat 77 / neutral chroma -> all channels (298*(77-16)+128)>>8
    expect = (298 * (77 - 16) + 128) >> 8
    assert (rgb == expect).all()


def test_yuv_to_rgb_neutral_chroma_formula():
    y = np.arange(256, dtype=np.uint8).reshape(16, 16)
    u = np.full((8, 8), 128, dtype=np.uint8)
    v = np.full((8, 8), 128, dtype=np.uint8)
    rgb = vp8.yuv_to_rgb(y, u, v)
    expect = np.clip((298 * (y.astype(np.int32) - 16) + 128) >> 8, 0, 255)
    assert (rgb[..., 0] == expect).all()
    assert (rgb[..., 1] == expect).all()
    assert (rgb[..., 2] == expect).all()


def test_token_partitions_roundtrip():
    """MB rows striped across 2/4/8 coefficient partitions (3-byte LE
    size prefixes) must decode identically to the single-partition
    stream's reconstruction."""
    rng = np.random.default_rng(15)
    y = rng.integers(0, 256, (80, 96)).astype(np.uint8)
    ref = None
    for nparts in (1, 2, 4, 8):
        stream, rec = vp8.encode_vp8(y, qi=15, token_partitions=nparts)
        got = vp8.decode_vp8(stream)
        for g, r in zip(got, rec):
            assert np.array_equal(g, r), nparts
        if ref is None:
            ref = got
        else:
            # same coefficients regardless of partition layout
            for g, r in zip(got, ref):
                assert np.array_equal(g, r), nparts


def test_segmentation_roundtrip_and_quantizer_effect():
    """Per-segment quantizer deltas: segment-id tree coding + per-
    segment dequant must roundtrip, and a coarser segment must actually
    decode with more error than a finer one."""
    rng = np.random.default_rng(16)
    y = rng.integers(0, 256, (80, 96)).astype(np.uint8)
    segmap = [[(r + c) % 4 for c in range(6)] for r in range(5)]
    stream, rec = vp8.encode_vp8(
        y, qi=30, segment_map=segmap, segment_quant=(-25, 0, 30, 60)
    )
    got = vp8.decode_vp8(stream)
    for g, r in zip(got, rec):
        assert np.array_equal(g, r)
    # error comparison between the finest (seg 0) and coarsest (seg 3)
    err = np.abs(got[0].astype(int) - y.astype(int))
    fine = [err[r * 16 : r * 16 + 16, c * 16 : c * 16 + 16].mean()
            for r in range(5) for c in range(6) if (r + c) % 4 == 0]
    coarse = [err[r * 16 : r * 16 + 16, c * 16 : c * 16 + 16].mean()
              for r in range(5) for c in range(6) if (r + c) % 4 == 3]
    assert np.mean(coarse) > np.mean(fine)


def test_segmentation_with_partitions_and_filter():
    rng = np.random.default_rng(17)
    y = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    segmap = [[(r * 4 + c) % 4 for c in range(4)] for r in range(3)]
    stream, rec = vp8.encode_vp8(
        y, qi=30, segment_map=segmap, segment_quant=(-10, 0, 10, 25),
        token_partitions=4, filter_level=20,
    )
    got = vp8.decode_vp8(stream)
    for g, r in zip(got, rec):
        assert np.array_equal(g, r)
