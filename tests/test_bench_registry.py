"""bench.py and __spark_entry__ must stay in sync: every benched query
name resolves in the registry (a rename/merge in queries() without a
bench.py update crashed the round-5 preview run), and every registry
entry keeps its oracle twin with matching keys."""

import bench
import __spark_entry__ as entry


def test_bench_queries_are_registered():
    q = set(entry.queries())
    missing = [n for n in bench.BENCH_QUERIES if n not in q]
    assert not missing, f"BENCH_QUERIES not in queries(): {missing}"


def test_registry_and_oracles_have_identical_keys():
    q, o = entry.queries(), entry.oracle_sql()
    assert set(q) == set(o), {
        "queries_without_oracle": sorted(set(q) - set(o)),
        "orphan_oracles": sorted(set(o) - set(q)),
    }
