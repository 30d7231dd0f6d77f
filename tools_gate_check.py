"""Local replica of the driver's correctness gate: run every
queries() entry and its oracle_sql() on the same parquet, compare
row count + sorted-column value frames."""
import sys
import duckdb
import pandas as pd
import numpy as np

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
        if np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir, only=None):
    from pyspark.sql import SparkSession
    import __spark_entry__ as e
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions","8")
             .config("spark.ui.enabled","false")
             .config("spark.ui.showConsoleProgress","false")
             .config("spark.sql.execution.arrow.pyspark.enabled","true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
    qs, os_ = e.queries(), e.oracle_sql()
    fails = 0
    for name, fn in qs.items():
        if only and name not in only: continue
        try:
            mine = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"{name:24s} SPARK ERROR: {str(ex)[:200]}"); fails += 1; continue
        if name not in os_:
            print(f"{name:24s} rows-only: {len(mine)} rows"); continue
        try:
            ref = con.execute(os_[name]).fetchdf()
        except Exception as ex:
            print(f"{name:24s} DUCKDB ERROR: {str(ex)[:200]}"); fails += 1; continue
        a, b = normalize(mine), normalize(ref)
        if len(a) != len(b):
            print(f"{name:24s} ROWCOUNT {len(a)} vs {len(b)}"); fails += 1; continue
        if list(a.columns) != list(b.columns):
            print(f"{name:24s} COLS {list(a.columns)} vs {list(b.columns)}"); fails += 1; continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=1e-6, atol=1e-9)
            print(f"{name:24s} OK ({len(a)} rows)")
        except AssertionError as ex:
            print(f"{name:24s} VALUE MISMATCH: {str(ex)[:300]}")
            merged = a.compare(b) if a.shape == b.shape else None
            if merged is not None and len(merged): print(merged.head(5))
            fails += 1
    print("FAILS:", fails)

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv)>1 else "/root/testdata/sf0.001",
         set(sys.argv[2:]) or None)
