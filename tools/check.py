#!/usr/bin/env python3
"""Local correctness check mimicking the driver's gate:
run Verify output parquet vs DuckDB oracle SQL on the same sf dir.
Columns sorted by name, rows sorted by all columns, exact + approx compare.

Usage: python3 tools/check.py <sfdir> <verify_out_dir>
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import glob, os

sfdir, outdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        # driver testdata: one parquet FILE per table; fuzz corpora
        # (Spark-written): a DIRECTORY of part files
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = []
for name in sorted(oracle):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"MISSING  {name} (no spark output)")
        fails.append(name); continue
    spark_df = canon(pq.ParquetDataset(files).read().to_pandas())
    try:
        duck_df = canon(con.execute(oracle[name]).fetchdf())
    except Exception as e:
        print(f"ORAFAIL  {name}: {e}")
        fails.append(name); continue
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"SCHEMA   {name}: spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        fails.append(name); continue
    if len(spark_df) != len(duck_df):
        print(f"ROWS     {name}: spark={len(spark_df)} duck={len(duck_df)}")
        fails.append(name); continue
    bad = None
    for c in spark_df.columns:
        a, b = spark_df[c], duck_df[c]
        # Mirror the driver gate, which hashes TYPES as well as values:
        # DuckDB HUGEINT (e.g. un-cast SUM() OVER) reaches pandas as
        # float64, so a float-vs-integer dtype pair means the oracle's
        # type differs from Spark's even when every value is equal.
        # The float-tolerant compare below would silently pass it.
        if pd.api.types.is_float_dtype(a) != pd.api.types.is_float_dtype(b) and \
           (pd.api.types.is_integer_dtype(a) or pd.api.types.is_integer_dtype(b)):
            bad = (c, f"dtype mismatch: spark={a.dtype} duck={b.dtype} "
                      "(driver hash gate rejects on type; CAST the oracle)")
            break
        try:
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                af = a.astype(float); bf = b.astype(float)
                neq = ~((af == bf) | (af.isna() & bf.isna()) |
                        (abs(af - bf) <= 1e-9 + 1e-9 * abs(bf)))
            else:
                neq = ~((a.astype(str) == b.astype(str)) | (a.isna() & b.isna()))
        except Exception as e:
            bad = (c, f"compare error {e}"); break
        if neq.any():
            i = neq.idxmax()
            bad = (c, f"row {i}: spark={a[i]!r} duck={b[i]!r} ({int(neq.sum())} diffs)")
            break
    if bad:
        print(f"VALUE    {name}: col {bad[0]} {bad[1]}")
        fails.append(name)
    else:
        print(f"OK       {name} ({len(spark_df)} rows)")

print(f"\n{len(oracle)-len(fails)}/{len(oracle)} OK; fails: {fails}")
sys.exit(1 if fails else 0)
