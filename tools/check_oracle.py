"""Local replica of the driver's queries()/oracle_sql() compare:
row-count + schema + order-insensitive value comparison at sf0.01.

Usage: python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from crawler_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402
from crawler_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    only = set(sys.argv[1:])
    # registry entries, plus — for explicitly-named components that were
    # folded into a suite (50-entry driver budget) — the module-level
    # function and its Q{NN}_SQL, so every variant stays individually
    # checkable: `python tools/check_oracle.py q39_ivf_cells`
    import crawler_spark.queries as Q

    checks = dict(QUERIES)
    sqls = dict(ORACLE_SQL)
    for name in only - set(QUERIES):
        checks[name] = getattr(Q, name)
        sql = getattr(Q, f"Q{name[1:3]}_SQL", None)
        if sql is not None:
            sqls[name] = sql
    spark = get_spark("oracle_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    failures = []
    for name, fn in checks.items():
        if only and name not in only:
            continue
        if name not in sqls:
            # driver records a rows-only check for oracle-less queries
            n = fn(spark, SF_DIR).count()
            print(f"ROWS {name}: {n} rows (no oracle by design)")
            continue
        try:
            got = norm(fn(spark, SF_DIR).toPandas())
            want = norm(con.sql(sqls[name]).df())
        except Exception as e:
            print(f"FAIL {name}: ERROR {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            failures.append(name)
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            failures.append(name)
            continue
        if len(got) == 0:
            print(f"WARN {name}: 0 rows (matches, but weak)")
            continue
        eq = got.equals(want)
        if not eq:
            # numeric tolerance check to distinguish float jitter from bugs
            diffs = []
            for c in got.columns:
                if pd.api.types.is_numeric_dtype(got[c]) and pd.api.types.is_numeric_dtype(want[c]):
                    d = (pd.to_numeric(got[c]) - pd.to_numeric(want[c])).abs().max()
                    if d and d > 0:
                        diffs.append((c, float(d)))
                elif not got[c].equals(want[c]):
                    bad = (got[c] != want[c])
                    idx = bad[bad].index[:3].tolist()
                    diffs.append((c, [(got[c][i], want[c][i]) for i in idx]))
            print(f"FAIL {name}: value diffs {diffs[:5]}")
            failures.append(name)
        else:
            print(f"OK   {name}: {len(got)} rows")
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
