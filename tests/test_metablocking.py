"""Meta-blocking (operators/metablocking.py)."""

import math

import pytest

from aml_entity_resolution_assignment_spark.operators import metablocking as MB


def _eb(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, block_key string")


def test_weights_hand_computed(spark):
    # blocks: b1={1,2,3}, b2={1,2}, b3={2,3}  -> post-purge B=3 blocks
    # degrees: 1->2, 2->3, 3->2
    rows = [
        (1, "b1"), (2, "b1"), (3, "b1"),
        (1, "b2"), (2, "b2"),
        (2, "b3"), (3, "b3"),
    ]
    out = {
        (r["id_a"], r["id_b"]): r
        for r in MB.metablock_pairs(_eb(spark, rows), prune=False).collect()
    }
    assert set(out) == {(1, 2), (1, 3), (2, 3)}
    assert out[(1, 2)]["cbs"] == 2  # b1, b2
    assert out[(1, 3)]["cbs"] == 1  # b1
    assert out[(2, 3)]["cbs"] == 2  # b1, b3
    # arcs: b1 has 3 pairs -> 1/3 each; b2, b3 have 1 pair -> 1 each
    assert out[(1, 2)]["arcs"] == pytest.approx(1 / 3 + 1.0)
    assert out[(1, 3)]["arcs"] == pytest.approx(1 / 3)
    # ecbs(1,2) = 2 * ln(3/2) * ln(3/3) = 0 (entity 2 is in every block)
    assert out[(1, 2)]["ecbs"] == pytest.approx(2 * math.log(3 / 2) * math.log(1.0))
    assert out[(1, 3)]["ecbs"] == pytest.approx(1 * math.log(3 / 2) ** 2)


def test_wep_prunes_below_mean_cbs(spark):
    rows = [
        (1, "b1"), (2, "b1"), (3, "b1"),
        (1, "b2"), (2, "b2"),
        (2, "b3"), (3, "b3"),
    ]
    # cbs: (1,2)=2, (1,3)=1, (2,3)=2 -> mean = 5/3; keep cbs >= 5/3
    kept = {
        (r["id_a"], r["id_b"])
        for r in MB.metablock_pairs(_eb(spark, rows)).collect()
    }
    assert kept == {(1, 2), (2, 3)}


def test_purge_caps_and_minimums(spark):
    big = [(i, "huge") for i in range(10)]
    rows = big + [(1, "solo"), (100, "pair"), (101, "pair")]
    out = MB.metablock_pairs(
        _eb(spark, rows), purge_cap=5, prune=False
    ).collect()
    # 'huge' (10 > cap 5) and 'solo' (<2) purged; only 'pair' survives
    assert {(r["id_a"], r["id_b"]) for r in out} == {(100, 101)}


def test_duplicate_entity_block_rows_ignored(spark):
    rows = [(1, "b"), (1, "b"), (2, "b"), (2, "b")]
    out = MB.metablock_pairs(_eb(spark, rows), prune=False).collect()
    assert len(out) == 1 and out[0]["cbs"] == 1


def test_partitioning_invariant(spark):
    rows = [(i % 7, f"b{i % 13}") for i in range(200)]
    df = _eb(spark, rows)
    a = sorted(map(tuple, MB.metablock_pairs(df.repartition(1)).collect()))
    b = sorted(map(tuple, MB.metablock_pairs(df.repartition(9)).collect()))
    assert a == b
