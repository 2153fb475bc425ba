"""End-to-end ER pipeline with per-stage checkpointing + metrics.

Reference lifecycle (/root/reference/src/matching.py:681-715):
load -> candidates -> features -> classify -> cluster -> evaluate.
Here every stage materializes to a parquet table under `work_dir`
(Iceberg-style layout: one directory per stage + _STAGE_MANIFEST.json),
so a restarted run skips completed stages (north_rule: resumable
mid-stage). A metrics table records per-stage row counts and wall time
(analog of the reference's Prometheus counters, api.py:34-36, and
blocking health report, matching.py:21-76).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import blocking, candidates, classify, cluster, features
from ..sources import io
from ..operators.classify import RuleThresholds


@dataclass
class PipelineConfig:
    work_dir: str
    salt_cap: int = candidates.DEFAULT_SALT_CAP
    drop_cap: int = candidates.DEFAULT_DROP_CAP
    thresholds: RuleThresholds | None = None
    model_path: str | None = None  # spark.ml LogisticRegressionModel dir
    # optional phonetic blocking key (blocking.SOUNDEX_KEY): soundex of
    # the title's first two tokens joins the exact-key set end-to-end
    # (keyed stage column + candidate self-join key + key coverage)
    soundex_title_key: bool = False
    # 'cascade' (reference rule cascade, default) or 'fs' (unsupervised
    # Fellegi-Sunter EM over grouped agreement signals —
    # classify.classify_fs; same output schema, no labels/thresholds)
    classifier: str = "cascade"
    resume: bool = True
    pair_partitions: int | None = None
    extra: dict = field(default_factory=dict)

    def fingerprint(self) -> str:
        """Stable hash of every config field that changes stage OUTPUT
        (resume/pair_partitions affect only execution). Folded into
        each stage fingerprint so a rerun with different thresholds,
        caps, or model never silently reuses stale parquet."""
        import hashlib

        from ..functions import minhash as _mh

        payload = json.dumps(
            {
                # persisted blocking keys are family-versioned: a rerun
                # under a different token-hash family must never reuse a
                # keyed stage table written under the old one (ADVICE r3)
                "key_family": _mh.KEY_FAMILY,
                "salt_cap": self.salt_cap,
                "drop_cap": self.drop_cap,
                "soundex_title_key": self.soundex_title_key,
                "classifier": self.classifier,
                "thresholds": None
                if self.thresholds is None
                else sorted(vars(self.thresholds).items()),
                "model_path": self.model_path,
                "extra": sorted(self.extra.items()),
            },
            default=str,
            sort_keys=True,
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


class StageRunner:
    """Materialize-or-reuse executor: each stage writes parquet + a
    manifest (row count, schema, upstream fingerprint); on resume, a
    stage whose manifest matches its fingerprint is re-read instead of
    recomputed — per-stage lineage, per-stage counters."""

    def __init__(self, spark: SparkSession, cfg: PipelineConfig, run_id: str):
        self.spark = spark
        self.cfg = cfg
        self.run_id = run_id
        self.metrics: list[dict] = []
        os.makedirs(cfg.work_dir, exist_ok=True)

    def _path(self, stage: str) -> str:
        return os.path.join(self.cfg.work_dir, f"stage={stage}")

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.cfg.work_dir, f"_MANIFEST_{stage}.json")

    def run(
        self,
        stage: str,
        fingerprint: str,
        build: Callable[[], DataFrame],
        bloom_filter_cols: list[str] | None = None,
    ) -> DataFrame:
        mpath = self._manifest_path(stage)
        dpath = self._path(stage)
        if self.cfg.resume and os.path.exists(mpath):
            with open(mpath) as f:
                manifest = json.load(f)
            if manifest.get("fingerprint") == fingerprint:
                self.metric(stage, "resumed", 1.0)
                return io.read_table(self.spark, self.cfg.work_dir, f"stage={stage}")
        t0 = time.monotonic()
        df = build()
        io.write_table(
            df, self.cfg.work_dir, f"stage={stage}",
            bloom_filter_cols=bloom_filter_cols,
        )
        out = io.read_table(self.spark, self.cfg.work_dir, f"stage={stage}")
        n = out.count()
        # stage output is on disk: intermediates cached inside lazy
        # candidate plans (oversized-key tables) are no longer needed
        candidates.release_persisted()
        wall = time.monotonic() - t0
        with open(mpath, "w") as f:
            json.dump(
                {
                    "stage": stage,
                    "fingerprint": fingerprint,
                    "rows": n,
                    "wall_sec": wall,
                    "run_id": self.run_id,
                    "schema": out.schema.simpleString(),
                },
                f,
            )
        self.metric(stage, "rows_out", float(n))
        self.metric(stage, "wall_sec", wall)
        return out

    def metric(self, stage: str, name: str, value: float, detail: str = "") -> None:
        self.metrics.append(
            {
                "run_id": self.run_id,
                "stage": stage,
                "metric": name,
                "value": float(value),
                "detail": detail,
            }
        )

    def flush_metrics(self) -> None:
        if not self.metrics:
            return
        df = self.spark.createDataFrame(
            [tuple(m.values()) for m in self.metrics],
            "run_id string, stage string, metric string, value double, detail string",
        )
        io.write_table(df, self.cfg.work_dir, "metrics", mode="append")
        self.metrics = []


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    cfg: PipelineConfig,
    run_id: str = "run0",
    input_fingerprint: str = "",
) -> dict[str, DataFrame]:
    """pages -> {keyed, pairs, features, classified, entity_map} with
    per-stage checkpoint/resume under cfg.work_dir.

    Stage fingerprints = input_fingerprint + config hash, so changing
    thresholds/caps/model (or pointing a different input at the same
    work_dir) invalidates every stage. Resume REQUIRES a non-empty
    input_fingerprint — with no way to tell inputs apart, reuse would
    be a silent-wrong-result hazard."""
    if cfg.resume and not input_fingerprint:
        raise ValueError(
            "resume=True requires a non-empty input_fingerprint: stage "
            "reuse cannot be validated without identifying the input "
            "(pass resume=False for a one-shot run)"
        )
    r = StageRunner(spark, cfg, run_id)
    fp = f"{input_fingerprint}|cfg={cfg.fingerprint()}"

    # bloom filter on url: the serving path's point lookups (resolve by
    # url against the checkpointed keyed table) skip row groups at the
    # parquet footer
    keyed = r.run(
        "pages_keyed", fp,
        lambda: blocking.add_blocking_keys(
            pages, soundex_title_key=cfg.soundex_title_key
        ),
        bloom_filter_cols=["url"],
    )

    exact_keys = blocking.BLOCKING_KEYS + (
        [blocking.SOUNDEX_KEY] if cfg.soundex_title_key else []
    )
    pairs = r.run(
        "candidate_pairs",
        fp + "|pairs",
        lambda: candidates.candidate_pairs(
            keyed, exact_keys=exact_keys,
            salt_cap=cfg.salt_cap, drop_cap=cfg.drop_cap,
        ),
    )

    # blocking health (E7) into metrics
    health = blocking.blocking_health(keyed, pairs.count())
    for k, v in health.items():
        r.metric("candidate_pairs", k, v)

    feats = r.run(
        "pair_features",
        fp + "|feats",
        lambda: features.pair_features(
            pairs.repartition(cfg.pair_partitions or spark.sparkContext.defaultParallelism, "id_a"),
            keyed,
        ),
    )

    def _classify() -> DataFrame:
        if cfg.classifier == "fs":
            return classify.classify_fs(feats)
        if cfg.classifier != "cascade":
            raise ValueError(
                f"unknown classifier {cfg.classifier!r} "
                "(expected 'cascade' or 'fs')"
            )
        scored = feats
        if cfg.model_path:
            from ..ml.model import score_with_model

            scored = score_with_model(spark, feats, cfg.model_path)
        return classify.classify(scored, cfg.thresholds)

    classified = r.run("classified_pairs", fp + "|cls", _classify)

    entity_map = r.run(
        "entity_map",
        fp + "|cc",
        lambda: cluster.resolve_entities(classified, keyed),
    )

    for row in classify.classification_counts(classified).collect():
        r.metric("classified_pairs", f"n_{row['match_type']}", float(row["n_pairs"]))
    r.metric(
        "entity_map",
        "n_entities",
        float(entity_map.select("predicted_entity_id").distinct().count()),
    )
    r.flush_metrics()

    return {
        "keyed": keyed,
        "pairs": pairs,
        "features": feats,
        "classified": classified,
        "entity_map": entity_map,
    }


def read_metrics(spark: SparkSession, work_dir: str) -> DataFrame:
    return io.read_table(spark, work_dir, "metrics")
