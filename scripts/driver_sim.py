"""Simulate the driver harness: VANILLA SparkSession + DuckDB oracle at sf0.01.

Unlike tests (which use session.get_spark), this builds a session WITHOUT any
of our confs — exactly like the driver does — so session-portability bugs
surface here. Also checks dtype KIND (int vs float) since the driver's
value-hash is type-sensitive.

Usage: python scripts/driver_sim.py [query-name ...]   (default: all)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as E  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(d: pd.DataFrame) -> pd.DataFrame:
    d = d.reindex(sorted(d.columns), axis=1)
    for c in d.columns:
        col = d[c].dropna()
        if d[c].dtype == object and len(col) and hasattr(col.iloc[0], "as_tuple"):
            d[c] = d[c].astype(float)
    return d.sort_values(by=list(d.columns), na_position="last").reset_index(drop=True)


def main() -> int:
    # deliberately bare session: only what the driver itself would set
    spark = (
        SparkSession.builder.appName("driver-sim")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    qs, osql = E.queries(), E.oracle_sql()
    names = sys.argv[1:] or sorted(qs)
    bad = []
    for name in names:
        if name not in qs:
            print(name, "UNKNOWN"); bad.append(name); continue
        try:
            a = canon(qs[name](spark, SF).toPandas())
        except Exception as ex:
            print(name, "ERR:", str(ex).splitlines()[0]); bad.append(name); continue
        if name not in osql:
            print(name, "rows-only", len(a)); continue
        b = canon(con.execute(osql[name]).df())
        kinds_a = [d.kind for d in a.dtypes]
        kinds_b = [d.kind for d in b.dtypes]
        # driver hashes values type-sensitively: int-vs-float kind diff = FAIL
        kind_ok = all(
            ka == kb or {ka, kb} <= {"i", "u"} or {ka, kb} <= {"M", "m"}
            for ka, kb in zip(kinds_a, kinds_b)
        )
        # tz-aware vs naive timestamps hash differently even though both are
        # kind "M" — the r4 normalize_15min_buckets blind spot. Fail loudly.
        tz_a = [getattr(d, "tz", None) for d in a.dtypes]
        tz_b = [getattr(d, "tz", None) for d in b.dtypes]
        if tz_a != tz_b:
            print(name, "TZ-MISMATCH", list(zip(a.columns, tz_a, tz_b)))
            bad.append(name)
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            if kind_ok:
                print(name, "MATCH", len(a))
            else:
                print(name, "KIND-MISMATCH", list(zip(a.columns, kinds_a, kinds_b)))
                bad.append(name)
        except Exception as ex:
            bad.append(name)
            print(name, "MISMATCH:", str(ex).splitlines()[0])
    print("BAD:", bad or "none")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
