"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every __spark_entry__.queries() entry at a given sf dir, runs the
matching oracle_sql() in DuckDB over the same parquet tables, and compares
row count, sorted column names, and values (rows sorted, columns sorted by
name). Exact match required; float columns additionally report max abs diff
so near-misses are diagnosable.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from kafka_flink_processing_spark.schemas import TESTDATA_TABLES  # noqa: E402
from kafka_flink_processing_spark.session import get_spark  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(np.asarray(v).tolist()) if isinstance(v, (list, np.ndarray)) else v)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> bool:
    ok = True
    if len(spark_pdf) != len(duck_pdf):
        print(f"  ROWS MISMATCH: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        ok = False
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        print(f"  SCHEMA MISMATCH: spark={s_cols} duck={d_cols}")
        return False
    if not ok:
        return False
    # The driver hashes the RAW frames, so a dtype mismatch (e.g. DuckDB
    # SIGN()->int8 vs Spark signum->double, HUGEINT->float64 vs long, or an
    # uncast UBIGINT->uint64 vs long) hash-fails there even when values are
    # bitwise identical. Replicate that sensitivity: fail on any numeric
    # KIND mismatch (signed int vs unsigned int vs float); width/resolution
    # differences (int32 vs int64, ns vs us) are driver-normalized —
    # verified empirically against r1/r2 green rows.
    for c in s_cols:
        sk = spark_pdf[c].dtype.kind
        dk = duck_pdf[c].dtype.kind
        if {sk, dk} <= {"i", "u", "f"} and sk != dk:
            print(f"  DTYPE KIND MISMATCH col={c}: spark={spark_pdf[c].dtype} "
                  f"duck={duck_pdf[c].dtype} (driver hash would differ — "
                  f"CAST the oracle column to Spark's type)")
            ok = False
    if not ok:
        return False
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv):
            a, b = sv.to_numpy(), dv.to_numpy(dtype="float64")
            both_nan = np.isnan(a) & np.isnan(b)
            exact = np.array_equal(a, b, equal_nan=True)
            if not exact:
                diff = np.abs(np.where(both_nan, 0.0, a - b))
                n_bad = int((diff > 0).sum())
                print(f"  FLOAT DIFF col={c}: n={n_bad} maxabs={np.nanmax(diff):.3e}")
                ok = False
        else:
            eq = (sv.to_numpy() == dv.to_numpy()) | (sv.isna().to_numpy() & dv.isna().to_numpy())
            if not eq.all():
                n_bad = int((~eq).sum())
                i = int(np.argmax(~eq))
                print(f"  VALUE DIFF col={c}: n={n_bad} first: spark={sv.iloc[i]!r} duck={dv.iloc[i]!r}")
                ok = False
    return ok


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check")
    con = duck_connection(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t1 = time.time()
        if name not in oracles:
            print(f"{name}: rows-only check rows={len(sdf)} [{t1-t0:.1f}s]")
            n_weak += 1
            continue
        ddf = con.execute(oracles[name]).fetchdf()
        if compare(name, sdf, ddf):
            print(f"{name}: OK rows={len(sdf)} [{t1-t0:.1f}s spark, {time.time()-t1:.1f}s duck]")
            n_pass += 1
        else:
            print(f"{name}: FAIL")
            n_fail += 1
    print(f"\npass={n_pass} fail={n_fail} rows_only={n_weak}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
