"""Driver-mimic correctness harness: run every queries() entry on Spark
at sf0.01 and its DuckDB oracle twin, compare rows/schema/values after
column-name sort. Usage: python tools/check_oracles.py [name ...]"""
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from aml_entity_resolution_assignment_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    spark = get_spark("oracle-check", master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{SF}/{t}.parquet')"
        )
    q, o = e.queries(), e.oracle_sql()
    names = sys.argv[1:] or list(q)
    failed = []
    for name in names:
        try:
            sdf = q[name](spark, SF).toPandas().sort_index(axis=1)
            if name not in o:
                print(f"{name}: rows-only ({len(sdf)} rows)")
                continue
            odf = con.execute(o[name]).df().sort_index(axis=1)
            sdf = sdf.sort_values(list(sdf.columns)).reset_index(drop=True)
            odf = odf.sort_values(list(odf.columns)).reset_index(drop=True)
            rows = sdf.shape[0] == odf.shape[0]
            schema = list(sdf.columns) == list(odf.columns)
            vals = (
                rows
                and schema
                and (sdf.astype(str).values == odf.astype(str).values).all()
            )
            status = "OK" if (rows and schema and vals) else "FAIL"
            print(f"{name}: {status} spark={sdf.shape} oracle={odf.shape}")
            if status == "FAIL":
                failed.append(name)
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ERROR {type(ex).__name__}: {ex}")
            failed.append(name)
        finally:
            # free tracked signature/oversized-key caches per query —
            # same materialization-boundary contract as bench/pipeline
            from aml_entity_resolution_assignment_spark.operators.candidates import (
                release_persisted,
            )

            release_persisted()
    print("failed:", failed or "none")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
