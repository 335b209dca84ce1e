"""Mimic the driver's correctness gate: run every queries() entry on Spark
and its oracle_sql() on DuckDB over the same parquet tables; compare row
multisets (columns sorted by name, floats rounded)."""

import math
import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

import __spark_entry__ as entry_mod  # noqa: E402


def _canon(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{round(v, 6):.6f}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in entry_mod.driver_queries.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


# the simulator/twin-backed oracles (crawl_rounds, flagship_*) render for
# the sf dir named at build time: point them at this test's sf for the
# capture only, restoring the documented sf0.01 default afterwards so the
# setting cannot leak into other test modules in the same process
_prev = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR")
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
try:
    ORACLES = entry_mod.oracle_sql()
finally:
    if _prev is None:
        os.environ.pop("SPARK_GRAFT_ORACLE_SF_DIR", None)
    else:
        os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = _prev
ALL_QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    sdf = ALL_QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.sql(ORACLES[name])
    duck_cols = res.columns
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    s = _canon(spark_rows, spark_cols)
    d = _canon(duck_rows, duck_cols)
    assert len(s) == len(d), f"{name}: row count {len(s)} vs {len(d)}"
    mismatches = [i for i, (a, b) in enumerate(zip(s, d)) if a != b]
    assert not mismatches, f"{name}: first mismatch {s[mismatches[0]]} vs {d[mismatches[0]]}"
    assert len(s) > 0, f"{name}: empty result weakens the check"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert df.columns == ["doc_id", "url", "concurrent_id", "warcinfo_id", "puid", "payload"]
    assert rows


def test_flagship_counters(spark):
    row = ALL_QUERIES["flagship_counters"](spark, SF_DIR).first()
    assert row.total_records_read == 500
    assert row.records_written > 0
    assert row.mime_type_records == row.text_mime + row.non_text
