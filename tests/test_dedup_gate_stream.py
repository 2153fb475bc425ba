"""Streaming dedup admission gate: exact + MinHash-LSH rejection of
already-seen documents at ingest, with the resolve_stream store
machinery (key-family versioning, inc/base compaction, idempotent
per-batch-id overwrites)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from aml_entity_resolution_assignment_spark.streaming import stream as S

BASE = " ".join(f"tok{i}" for i in range(40))
NEAR = " ".join(f"tok{i}" for i in range(39)) + " other"  # J = 39/41 ≈ 0.95
UNIQ1 = " ".join(f"alpha{i}" for i in range(40))
UNIQ2 = " ".join(f"beta{i}" for i in range(40))
UNIQ3 = " ".join(f"gamma{i}" for i in range(40))
SCHEMA = "url string, text string"


def _write_batch(spark, src, name, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/{name}")


def _stream(spark, src):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )


def _run_gate(spark, src, root, **kw):
    q = S.dedup_gate_stream(
        _stream(spark, src),
        f"{root}/store",
        f"{root}/out",
        f"{root}/ckpt",
        **kw,
    )
    q.awaitTermination(180)
    return q


def test_gate_rejects_exact_and_near_dups(spark, tmp_path):
    src, root = str(tmp_path / "src"), str(tmp_path / "gate")
    # batch 1: two uniques + an in-batch near-copy of u_base
    _write_batch(
        spark, src, "f1",
        [("u_base", BASE), ("u_one", UNIQ1), ("u_near_in", NEAR)],
    )
    _run_gate(spark, src, root)
    got = {
        r["url"] for r in S.read_accepted_docs(spark, f"{root}/out").collect()
    }
    assert got == {"u_base", "u_one"}  # greedy: larger id of the pair drops

    # batch 2: exact copy of u_one (content-hash gate), near-copy of
    # u_base (band gate vs store), one genuinely new doc
    _write_batch(
        spark, src, "f2",
        [("u_exact_dup", UNIQ1), ("u_near_store", NEAR), ("u_two", UNIQ2)],
    )
    _run_gate(spark, src, root)
    got = {
        r["url"] for r in S.read_accepted_docs(spark, f"{root}/out").collect()
    }
    assert got == {"u_base", "u_one", "u_two"}


def test_gate_restart_is_idempotent(spark, tmp_path):
    src, root = str(tmp_path / "src"), str(tmp_path / "gate")
    _write_batch(spark, src, "f1", [("a", BASE), ("b", UNIQ1)])
    _run_gate(spark, src, root)
    before = sorted(
        tuple(r)
        for r in S.read_accepted_docs(spark, f"{root}/out").collect()
    )
    # restart with the same checkpoint: nothing re-processes
    _run_gate(spark, src, root)
    after = sorted(
        tuple(r)
        for r in S.read_accepted_docs(spark, f"{root}/out").collect()
    )
    assert before == after == [("a", BASE), ("b", UNIQ1)]


def test_gate_compaction_bounds_store_dirs(spark, tmp_path):
    src, root = str(tmp_path / "src"), str(tmp_path / "gate")
    texts = [UNIQ1, UNIQ2, UNIQ3, BASE]
    for i, t in enumerate(texts):
        _write_batch(spark, src, f"f{i}", [(f"u{i}", t)])
    _run_gate(spark, src, root, compact_every=1)
    got = {
        r["url"] for r in S.read_accepted_docs(spark, f"{root}/out").collect()
    }
    assert got == {"u0", "u1", "u2", "u3"}
    from aml_entity_resolution_assignment_spark.functions.minhash import (
        KEY_FAMILY,
    )

    base_dir = f"{root}/store/keys={KEY_FAMILY}/base"
    assert os.path.isdir(base_dir) and len(os.listdir(base_dir)) >= 1
    # the bounded read: base + short tail, not O(total batches)
    store = S.read_resolve_corpus(
        spark, f"{root}/store/keys={KEY_FAMILY}", before_batch=10**9
    )
    assert store.count() == 4
    assert len(store.inputFiles()) <= 40


def test_gate_foreign_key_family_fails_fast(spark, tmp_path):
    src, root = str(tmp_path / "src"), str(tmp_path / "gate")
    _write_batch(spark, src, "f1", [("a", BASE)])
    os.makedirs(f"{root}/store/keys=k1-md5/inc", exist_ok=True)
    q = S.dedup_gate_stream(
        _stream(spark, src),
        f"{root}/store",
        f"{root}/out",
        f"{root}/ckpt",
    )
    with pytest.raises(Exception, match="different hash family"):
        q.awaitTermination(180)
        q.processAllAvailable()
    shutil.rmtree(f"{root}/store/keys=k1-md5")
