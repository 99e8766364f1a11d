"""Local replica of the driver's DuckDB correctness oracle.

Runs each registered query's Spark plan and oracle SQL side by side and
compares row count, column names, and values (columns sorted by name,
rows sorted by all columns — order-insensitive, like the driver's
value hash). Floats compare exactly after the queries' own explicit
rounding; a tolerance fallback flags "close but not bit-equal" cases
so rounding bugs surface before the driver sees them.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from etl_project_spark.catalog import TABLES, table_path


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for name in TABLES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(spark_df, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    sp = _canon(spark_df.toPandas())
    oc = _canon(oracle_df)
    problems: list[str] = []
    if list(sp.columns) != list(oc.columns):
        return [f"columns differ: spark={list(sp.columns)} oracle={list(oc.columns)}"]
    if len(sp) != len(oc):
        return [f"row count differs: spark={len(sp)} oracle={len(oc)}"]
    for col in sp.columns:
        a, b = sp[col], oc[col]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            af = a.astype(float).to_numpy()
            bf = b.astype(float).to_numpy()
            for i, (x, y) in enumerate(zip(af, bf)):
                both_nan = math.isnan(x) and math.isnan(y)
                if not both_nan and x != y:
                    close = abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y))
                    problems.append(
                        f"col {col} row {i}: spark={x!r} oracle={y!r}"
                        + (" (CLOSE — rounding mismatch)" if close else "")
                    )
                    break
        else:
            eq = (a.astype(object).where(pd.notna(a), None)
                  == b.astype(object).where(pd.notna(b), None))
            nulls = pd.isna(a.astype(object)) & pd.isna(b.astype(object))
            bad = ~(eq | nulls)
            if bad.any():
                i = int(bad.idxmax())
                problems.append(
                    f"col {col} row {i}: spark={a.iloc[i]!r} oracle={b.iloc[i]!r}"
                )
    return problems
