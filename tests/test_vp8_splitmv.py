"""VP8 SPLITMV (RFC 6386 §16.2): per-subblock motion — the four
partition types (16x8 / 8x16 / 8x8 quarters / sixteen 4x4), the
context-conditioned sub_mv_ref coding (LEFT4x4/ABOVE4x4/ZERO4x4/
NEW4x4 against the near-MV survey's best_mv), per-4x4 six-tap motion
compensation, and the 2x2-quad-averaged chroma MVs (build_uvmvs
rounding).

Contract mirrors tests/test_vp8_inter.py: decode_ivf(encode_vp8_video)
must equal the encoder's decoder-identical reconstruction BIT-EXACTLY,
and flat content at qi=0 must roundtrip EXACTLY (SPLITMV MBs carry no
Y2, so this additionally pins the full-DC 4x4 luma path: fdct DC gain
8 divides the qi=0 dc factor 4 exactly)."""

import numpy as np
import pytest

from aml_entity_resolution_assignment_spark.functions import vp8


def _flat(v, shape=(32, 32)):
    return np.full(shape, v, dtype=np.uint8)


def _assert_sequence_exact(ivf, recs, sources=None):
    dec, _fps = vp8.decode_ivf(ivf)
    assert len(dec) == len(recs)
    for i, ((y, u, v), rec) in enumerate(zip(dec, recs)):
        assert np.array_equal(y, rec[0]), f"frame {i}: luma != encoder rec"
        assert np.array_equal(u, rec[1]) and np.array_equal(v, rec[2]), i
        if sources is not None:
            assert np.array_equal(y, sources[i]), f"frame {i}: lossy"
    return dec


def _splitmv_everywhere(mb_rows, mb_cols, mv_fn):
    """One SPLITMV spec per MB, partition type cycling 0..3; mv_fn(k, i)
    gives partition i of the k-th MB its (row, col) eighth-pel MV."""
    modes = {}
    k = 0
    for r in range(mb_rows):
        for c in range(mb_cols):
            p = k % 4
            n = vp8.MBSPLIT_COUNT[p]
            modes[(r, c)] = {
                "mode": vp8.SPLITMV,
                "split": p,
                "mvs": [mv_fn(k, i) for i in range(n)],
            }
            k += 1
    return modes


def test_all_partition_types_flat_exact():
    """Every partition type with distinct sub-pel MVs per partition:
    flat planes stay exact at qi=0 (six-tap of a constant is the
    constant; the no-Y2 DC path divides exactly)."""
    frames = [_flat(b) for b in (77, 101, 160, 23, 209)]
    per_frame = {
        f: _splitmv_everywhere(2, 2, lambda k, i: (2 * (i + 1), -6))
        for f in (1, 2, 3, 4)
    }
    ivf, recs = vp8.encode_vp8_video(
        frames, qi=0, mb_modes_per_frame=per_frame
    )
    _assert_sequence_exact(ivf, recs, sources=frames)


def test_splitmv_texture_roundtrip_all_partitions():
    """Random texture at a lossy qi: decode must equal the encoder's
    reconstruction bit-exactly through partition coding, sub_mv_ref
    contexts, per-4x4 MC, and chroma MV averaging."""
    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, (48, 64), dtype=np.uint8)
              for _ in range(3)]
    per_frame = {
        f: _splitmv_everywhere(
            3, 4, lambda k, i: ((2 * (i % 3) - 2) * 2,
                                (2 * ((i + k) % 3) - 2) * 2)
        )
        for f in (1, 2)
    }
    ivf, recs = vp8.encode_vp8_video(
        frames, qi=12, mb_modes_per_frame=per_frame
    )
    _assert_sequence_exact(ivf, recs)


def test_splitmv_recovers_half_and_half_motion():
    """A frame whose top half shifts differently from its bottom half:
    partition type 0 (two 16x8 halves) with the two true MVs predicts
    it from 'last' and the decode tracks the shifted source closely."""
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    top = np.roll(base, (0, 4), axis=(0, 1))
    bot = np.roll(base, (0, -8), axis=(0, 1))
    nxt = np.vstack([top[:16], bot[16:]]).astype(np.uint8)
    modes = {
        1: {
            (0, c): {"mode": vp8.SPLITMV, "split": 0,
                     "mvs": [(0, -4 << 3), (0, 8 << 3)]}
            for c in range(2)
        }
    }
    modes[1][(1, 0)] = {"mode": vp8.SPLITMV, "split": 0,
                        "mvs": [(0, -4 << 3), (0, 8 << 3)]}
    modes[1][(1, 1)] = {"mode": vp8.SPLITMV, "split": 0,
                        "mvs": [(0, -4 << 3), (0, 8 << 3)]}
    ivf, recs = vp8.encode_vp8_video(
        [base, nxt], qi=4, mb_modes_per_frame=modes
    )
    dec = _assert_sequence_exact(ivf, recs)
    err = np.abs(dec[1][0].astype(int) - nxt.astype(int)).mean()
    assert err < 3.0, err


def test_sub_mv_ref_leaf_coverage():
    """Partition type 3 (sixteen 4x4) with MVs engineered so the
    encoder must emit LEFT4x4 (equal to the left subblock), ABOVE4x4
    (equal to the above subblock but not the left), ZERO4x4, and
    NEW4x4 leaves — the decoder's context/tree walk must mirror every
    one of them for the stream to stay aligned."""
    a, b = (8, 0), (0, 8)
    # raster 4x4 grid: row0 alternates new/left, row1 copies above,
    # row2 zeros, row3 new again
    mvs16 = [a, a, b, b,
             a, a, b, b,
             (0, 0), (0, 0), (0, 0), (0, 0),
             (16, -16), (16, -16), (2, 6), (2, 6)]
    frames = [_flat(90), _flat(150)]
    modes = {1: {(r, c): {"mode": vp8.SPLITMV, "split": 3, "mvs": mvs16}
                 for r in range(2) for c in range(2)}}
    ivf, recs = vp8.encode_vp8_video(
        frames, qi=0, mb_modes_per_frame=modes
    )
    _assert_sequence_exact(ivf, recs, sources=frames)


def test_splitmv_neighbors_feed_survey_and_sub_mv_refs():
    """A SPLITMV MB's bottom-right sub-MV is its MV in the neighbor
    survey; its right/bottom neighbors' LEFT4x4/ABOVE4x4 fetches read
    its edge subblocks. Mixing SPLITMV with NEAREST/NEW MBs that
    depend on those values keeps the stream decodable bit-exactly."""
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (48, 48), dtype=np.uint8)
              for _ in range(2)]
    modes = {1: {
        (0, 0): {"mode": vp8.SPLITMV, "split": 2,
                 "mvs": [(4, 4), (-4, 8), (8, -4), (6, 2)]},
        (0, 1): {"mode": vp8.NEARESTMV},  # survey sees submvs[15]=(6,2)
        (0, 2): {"mode": vp8.SPLITMV, "split": 1,
                 "mvs": [(6, 2), (0, 0)]},  # LEFT4x4 chain from (0,1)
        (1, 0): {"mode": vp8.SPLITMV, "split": 3,
                 "mvs": [(8, -4)] * 4 + [(0, 0)] * 8 + [(2, 2)] * 4},
        (1, 1): {"mode": vp8.NEWMV, "mv": (10, -12)},
        (1, 2): {"mode": vp8.ZEROMV},
        (2, 0): {"mode": vp8.NEARMV},
        (2, 1): {"mode": vp8.SPLITMV, "split": 0,
                 "mvs": [(2, 2), (0, 0)]},
        (2, 2): {"mode": vp8.DC_PRED},  # intra inside the inter frame
    }}
    ivf, recs = vp8.encode_vp8_video(
        frames, qi=10, mb_modes_per_frame=modes
    )
    _assert_sequence_exact(ivf, recs)


def test_split_uvmvs_rounding():
    """build_uvmvs semantics: chroma MV = quad sum, +4 (or -4 when
    negative), C-truncated /8 — round half away from zero."""
    cases = [
        ((2, 2, 2, 2), 1),      # sum 8 -> exact 1
        ((-2, -2, -2, -2), -1),  # sum -8 -> exact -1
        ((2, 2, 2, 0), 1),      # sum 6 -> 10//8 = 1
        ((-2, -2, -2, 0), -1),  # sum -6 -> trunc(-10/8) = -1
        ((2, 2, 0, 0), 1),      # sum 4 -> half rounds up
        ((-2, -2, 0, 0), -1),   # sum -4 -> half rounds away
        ((4, 4, 2, 2), 2),      # sum 12 -> 2
        ((-4, -4, -2, -2), -2),
        ((0, 0, 0, 0), 0),
    ]
    for quad, want in cases:
        submvs = [(0, 0)] * 16
        # chroma quad 0 reads luma subblocks 0, 1, 4, 5
        for k, v in zip((0, 1, 4, 5), quad):
            submvs[k] = (v, -v)
        got = vp8._split_uvmvs(submvs)[0]
        assert got == (want, -want), (quad, got, want)


def test_splitmv_skip_mb():
    """An unchanged flat region predicted by SPLITMV zero-residual MVs
    produces all-zero levels -> mb_skip; the skip path must preserve
    the no-Y2 token layout."""
    frames = [_flat(120), _flat(120)]
    modes = {1: _splitmv_everywhere(2, 2, lambda k, i: (0, -6))}
    ivf, recs = vp8.encode_vp8_video(
        frames, qi=0, mb_modes_per_frame=modes
    )
    _assert_sequence_exact(ivf, recs, sources=frames)


def test_splitmv_with_loop_filter():
    """SPLITMV MBs always take interior loop-filter edges (like
    B_PRED); a filtered sequence must still decode bit-exactly."""
    rng = np.random.default_rng(19)
    frames = [rng.integers(0, 256, (32, 32), dtype=np.uint8)
              for _ in range(2)]
    modes = {1: _splitmv_everywhere(2, 2, lambda k, i: (2, 2))}
    ivf, recs = vp8.encode_vp8_video(
        frames, qi=24, mb_modes_per_frame=modes,
        filter_level=20, filter_type=0,
    )
    _assert_sequence_exact(ivf, recs)


def test_splitmv_encoder_guards():
    refs = {k: vp8.encode_vp8(_flat(10), qi=0)[1]
            for k in ("last", "golden", "altref")}
    with pytest.raises(ValueError, match="needs 4 MVs"):
        vp8.encode_vp8_inter(
            _flat(10), refs=refs,
            mb_modes={(0, 0): {"mode": vp8.SPLITMV, "split": 2,
                               "mvs": [(0, 0)]}},
        )
    with pytest.raises(ValueError, match="must be even"):
        vp8.encode_vp8_inter(
            _flat(10), refs=refs,
            mb_modes={(0, 0): {"mode": vp8.SPLITMV, "split": 0,
                               "mvs": [(1, 0), (0, 0)]}},
        )


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
