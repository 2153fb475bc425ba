"""CLK Bloom-filter privacy-preserving linkage (functions/pprl.py)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from aml_entity_resolution_assignment_spark.functions import pprl as PP


def _py_dice(a: str, b: str) -> float:
    pa, pb = PP.clk_positions(a), PP.clk_positions(b)
    if not pa and not pb:
        return 0.0
    return 2 * len(pa & pb) / (len(pa) + len(pb))


def test_pack_matches_positions():
    pos = PP.clk_positions("john smith")
    words = PP._pack_words(pos)
    assert len(words) == PP.CLK_WORDS
    unpacked = {
        w * 32 + b
        for w, word in enumerate(words)
        for b in range(32)
        if word >> b & 1
    }
    assert unpacked == pos
    assert all(0 <= w < (1 << 32) for w in words)  # sign-safe longs


def test_batch_matches_scalar():
    texts = ["john smith", "jon smith", "", None, "zzz"]
    got = PP.batch_clk(pd.Series(texts))
    for words, t in zip(got, texts):
        assert list(words) == PP._pack_words(PP.clk_positions(t or ""))


def test_similar_strings_score_high_dissimilar_low():
    hi = _py_dice("john smith", "jon smith")
    lo = _py_dice("john smith", "qqqq vvvv")
    assert hi > 0.8 > 0.4 > lo


def test_jvm_dice_equals_python(spark):
    rows = [
        (1, "john smith"), (2, "jon smith"), (3, "completely other"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "id long, v string")
    enc = df.select("id", "v", PP.clk_encode(F.col("v")).alias("clk"))
    a = enc.select(F.col("id").alias("ia"), F.col("v").alias("va"), F.col("clk").alias("ca"))
    b = enc.select(F.col("id").alias("ib"), F.col("v").alias("vb"), F.col("clk").alias("cb"))
    out = a.crossJoin(b).where(F.col("ia") < F.col("ib")).select(
        "va", "vb", PP.dice(F.col("ca"), F.col("cb")).alias("d")
    )
    for r in out.collect():
        assert r["d"] == pytest.approx(_py_dice(r["va"], r["vb"]), abs=1e-9)


def test_dice_plan_is_jvm_only(spark):
    """The comparison stage must not re-enter Python: only the encode
    projection is an ArrowEvalPython node."""
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    # localCheckpoint cuts the encode lineage so the compare plan can
    # be inspected in isolation
    enc = df.select("id", PP.clk_encode(F.col("v")).alias("clk")).localCheckpoint()
    a = enc.select(F.col("id").alias("ia"), F.col("clk").alias("ca"))
    b = enc.select(F.col("id").alias("ib"), F.col("clk").alias("cb"))
    plan = (
        a.crossJoin(b)
        .select(PP.dice(F.col("ca"), F.col("cb")).alias("d"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "bit_count" in plan
