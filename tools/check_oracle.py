"""Local replica of the driver's duckdb-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and an order-insensitive value hash. Use while iterating so oracle mismatches
surface before the driver's per-round check.

Usage: python tools/check_oracle.py [--bare] [sf_dir] [query_name ...]

``--bare`` runs on a SparkSession built with NO repo confs (mirroring the
driver, which uses its own session) — round 1 proved that factory-only confs
hide real failures, so prefer --bare for pre-round validation.
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark import get_spark
from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.catalog import (
    TABLES,
    table_path,
)
import __spark_entry__ as entrymod


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive canonical form: sort columns by name, normalize
    values to strings (floats rounded to 9 significant-ish decimals),
    sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)

    def norm(col: pd.Series) -> pd.Series:
        if col.dtype.kind == "f":
            return col.map(lambda v: "" if pd.isna(v) else f"{v:.9g}")
        if str(col.dtype).startswith("datetime"):
            return col.map(lambda v: "" if pd.isna(v) else v.isoformat())
        return col.map(lambda v: "" if v is None else str(v))

    out = df.apply(norm)
    if len(out):
        out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
            drop=True
        )
    return out


def compare(name: str, spark_df, con) -> tuple[bool, str]:
    oracles = entrymod.oracle_sql()
    spark_pdf = spark_df.toPandas()
    if name not in oracles:
        return True, f"rows-only check: {len(spark_pdf)} rows"
    duck_pdf = con.execute(oracles[name]).fetchdf()
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    if list(a.columns) != list(b.columns):
        return False, f"column mismatch: spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return False, f"row count mismatch: spark={len(a)} duck={len(b)}"
    if not a.equals(b):
        neq = (a != b).any(axis=1)
        idx = neq[neq].index[:3]
        detail = "; ".join(
            f"row {i}: spark={a.loc[i].to_dict()} duck={b.loc[i].to_dict()}" for i in idx
        )
        return False, f"value mismatch on {int(neq.sum())}/{len(a)} rows; {detail}"
    return True, f"match ({len(a)} rows)"


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--bare"]
    bare = "--bare" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if bare:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check_oracle_bare")
            .getOrCreate()
        )
    else:
        spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    qs = entrymod.queries()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ok, msg = compare(name, fn(spark, sf_dir), con)
        except Exception as e:  # surface, keep going
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
        status = "OK  " if ok else "FAIL"
        print(f"{status} {name:40s} {time.time()-t0:6.2f}s  {msg}")
        failures += 0 if ok else 1
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
