"""Local mimic of the driver's correctness harness.

Runs every ``__spark_entry__.queries()`` entry at sf0.01, runs the matching
``oracle_sql()`` in DuckDB over the same parquet views, and compares
row count + column names + order-insensitive value hash. Usage:

    python tools/check_contract.py [name_filter ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object and s.map(lambda x: isinstance(x, (list, tuple)), na_action="ignore").any():
            df[c] = s.map(lambda x: str(list(x)) if x is not None else None)
    # normalize float formatting and NaN/None
    return df


def value_hash(df: pd.DataFrame) -> str:
    df = canon(df)
    rows = []
    for t in df.itertuples(index=False):
        cells = []
        for v in t:
            if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NaT:
                cells.append("<null>")
            elif isinstance(v, float):
                cells.append(f"{v:.6g}")
            else:
                cells.append(str(v))
        rows.append("|".join(cells))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> None:
    import __spark_entry__ as entry

    from cdm_to_mods_spark.session import get_spark

    filters = sys.argv[1:]
    spark = get_spark("contract-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        try:
            sdf = fn(spark, SF_DIR)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:500]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(spdf)} rows (no oracle)")
            n_rowsonly += 1
            continue
        try:
            opdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = []
        if len(spdf) != len(opdf):
            problems.append(f"rows {len(spdf)} vs {len(opdf)}")
        if sorted(spdf.columns) != sorted(opdf.columns):
            problems.append(f"cols {sorted(spdf.columns)} vs {sorted(opdf.columns)}")
        elif value_hash(spdf) != value_hash(opdf):
            problems.append("value hash mismatch")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            if "value hash mismatch" in problems and len(spdf) == len(opdf):
                a, b = canon(spdf), canon(opdf)
                a = a.sort_values(list(a.columns)).reset_index(drop=True)
                b = b.sort_values(list(b.columns)).reset_index(drop=True)
                neq = (a.astype(str) != b.astype(str)).any(axis=1)
                print("  spark:", a[neq].head(3).to_dict("records"))
                print("  duck :", b[neq].head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(spdf)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")


if __name__ == "__main__":
    main()
