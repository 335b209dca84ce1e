"""Oracle-match specific queries by name at $SPARK_GRAFT_ORACLE_SF_DIR.

Run: python BENCH/oracle_check.py <query> [query...]
Same comparison discipline as sweep_preflight (round-6 floats, sorted rows).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from warc_metadata_sidecar_spark import driver_queries as dq  # noqa: E402
from warc_metadata_sidecar_spark.session import build_session  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> tuple[bool, bool, bool]:
    # same discipline as sweep_preflight.compare (round-6 floats, sorted rows)
    rows = len(sdf) == len(odf)
    scols = sorted(sdf.columns)
    schema = scols == sorted(odf.columns)
    if not (rows and schema):
        return rows, schema, False
    a = sdf[scols].sort_values(scols).reset_index(drop=True)
    b = odf[scols].sort_values(scols).reset_index(drop=True)
    try:
        b = b.astype(a.dtypes.to_dict())
    except (TypeError, ValueError):
        pass
    for c in scols:
        if a[c].dtype.kind == "f":
            a[c] = a[c].round(6)
            b[c] = b[c].round(6)
    a = a.sort_values(scols).reset_index(drop=True)
    b = b.sort_values(scols).reset_index(drop=True)
    return rows, schema, a.equals(b)


def main() -> None:
    spark = build_session("oracle-check", cpus=16, shuffle_partitions=16)
    qs = dq.queries()
    oracles = dq.oracle_sql()
    con = duckdb.connect()
    for t in dq.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    bad = []
    for name in sys.argv[1:]:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF).toPandas()
            odf = con.sql(oracles[name]).df()
            rows, schema, match = compare(sdf, odf)
            err = None
        except Exception as e:  # noqa: BLE001
            rows = schema = match = False
            err = str(e)[:200]
        ok = rows and schema and match and not err
        if not ok:
            bad.append(name)
        print(
            json.dumps(
                {"q": name, "sf": SF, "ok": ok, "wall": round(time.time() - t0, 2), "err": err}
            ),
            flush=True,
        )
    print(json.dumps({"failures": bad}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
