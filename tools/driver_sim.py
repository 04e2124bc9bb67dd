"""Simulates the driver's harness: bare SparkSession, import __spark_entry__,
smoke entry(), then hash-compare every queries() entry vs oracle_sql() at sf0.01."""
import hashlib, sys, os
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
from pyspark.sql import SparkSession
import duckdb, pandas as pd, numpy as np

spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()  # NO custom conf
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

df = E.entry(spark)
rows = df.collect()
print(f"entry: OK rows={len(rows)} schema={[f.name for f in df.schema]}")

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def valhash(pdf):
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype("float64")
    rows = sorted(tuple(repr(v) for v in r) for r in pdf.itertuples(index=False, name=None))
    return hashlib.sha256(repr(rows).encode()).hexdigest()[:12], len(pdf)

qs, oracles = E.queries(), E.oracle_sql()
if len(sys.argv) > 1:  # optional substring filters: check only matching names
    qs = {n: f for n, f in qs.items() if any(a in n for a in sys.argv[1:])}
print(f"{len(qs)} queries, {len(oracles)} with oracles")
fails = 0
for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF).toPandas()
    if name not in oracles:
        # the real driver still canonicalizes rows-only outputs with a
        # pandas sort_values over all columns, which raises on array/map
        # columns (the r01 multimodal_feature_extract failure) — valhash's
        # repr() path would NOT raise, so replicate the driver's sort too
        try:
            sdf.sort_values(by=sorted(sdf.columns))
            valhash(sdf)
            print(f"  {name}: rows-only rows={len(sdf)}")
        except Exception as exc:
            fails += 1
            print(f"  {name}: ROWS-ONLY CANONICALIZE ERR {type(exc).__name__}: {exc}")
        continue
    ddf = con.execute(oracles[name]).df()
    h1, n1 = valhash(sdf); h2, n2 = valhash(ddf)
    ok = h1 == h2 and n1 == n2
    fails += 0 if ok else 1
    print(f"  {name}: {'MATCH' if ok else 'MISMATCH'} rows={n1}/{n2} {h1}/{h2}")
print("FAILURES:", fails)
