"""Explicit StructType schemas for every engine table.

The reference trusts implicit pandas/SQLite schemas
(/root/reference/src/generation.py:213-224); here every table boundary
and every pandas-UDF return is declared (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# input_hint shape: Iceberg/parquet table of Common-Crawl-style pages
PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

PAGES_TRUTH = StructType(
    [
        StructField("url", StringType(), False),
        StructField("entity_id", StringType(), False),
    ]
)

# pages + norm_* + bk_* columns (analog of clients_processed,
# reference preprocessing.py:256)
PAGES_KEYED_EXTRA = [
    ("host", StringType()),
    ("norm_url", StringType()),
    ("norm_title", StringType()),
    ("bk_host", StringType()),
    ("bk_title", StringType()),
    ("bk_path", StringType()),
    ("simhash", LongType()),
    ("bk_minhash_bands", ArrayType(LongType())),
    ("bk_simhash_bands", ArrayType(LongType())),
    # compact payloads only: norm_text and the ArrayType minhash
    # signature are derivation intermediates, dropped before persist
    ("sig_bin", BinaryType()),
    ("tokens_bin", BinaryType()),
]

CANDIDATE_PAIRS = StructType(
    [
        StructField("id_a", StringType(), False),
        StructField("id_b", StringType(), False),
    ]
)

FEATURE_COLUMNS = [
    "host_score",
    "url_score",
    "title_score",
    "jaccard_score",
    "minhash_sim",
    "simhash_sim",
    "lang_match",
    "host_match",
    "title_both_present",
]

PAIR_FEATURES = StructType(
    [
        StructField("id_a", StringType(), False),
        StructField("id_b", StringType(), False),
        StructField("host_score", DoubleType(), False),
        StructField("url_score", DoubleType(), False),
        StructField("title_score", DoubleType(), False),
        StructField("jaccard_score", DoubleType(), False),
        StructField("minhash_sim", DoubleType(), False),
        StructField("simhash_sim", DoubleType(), False),
        StructField("lang_match", IntegerType(), False),
        StructField("host_match", IntegerType(), False),
        StructField("title_both_present", IntegerType(), False),
    ]
)

CLASSIFIED_EXTRA = ["ml_prob", "match_type", "confidence_score", "explanation", "is_match"]

ENTITY_MAP = StructType(
    [
        StructField("url", StringType(), False),
        StructField("predicted_entity_id", StringType(), False),
    ]
)

METRICS = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("stage", StringType(), False),
        StructField("metric", StringType(), False),
        StructField("value", DoubleType(), True),
        StructField("detail", StringType(), True),
    ]
)
