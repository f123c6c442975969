"""Emulate the driver's verify: t1 smoke (entry @ sf0.001) + t2 oracle
compare (queries vs oracle_sql @ sf0.01). Run from /root/repo."""
import hashlib
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ["SPARK_GRAFT_CPUS"] = "8"

import duckdb
import __spark_entry__ as e
from duck_server_spark.engine.session import get_session

SF = os.environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")
spark = get_session("drive")

# t1 smoke
df = e.entry(spark)
rows = df.collect()
schema1 = df.schema.simpleString()
df2 = e.entry(spark)
assert df2.schema.simpleString() == schema1, "schema not stable across calls"
print(f"t1 smoke: {len(rows)} rows, schema stable: {schema1}")

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def value_hash(pdf):
    cols = sorted(pdf.columns)
    # Canonicalize the way the DRIVER does: a pandas sort over the RAW
    # frame. This crashes on unhashable cells (lists/dicts/ndarrays) —
    # deliberately NOT masked with astype(str): round 7's
    # scalar_bracket_literals passed the self-gate under a stringified
    # sort but failed the driver's artifact. Registry convention: window
    # queries project scalar columns only; this surfaces violations here.
    pdf = pdf[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    h = hashlib.sha256()
    for row in pdf.astype(str).itertuples(index=False, name=None):
        h.update(repr(row).encode())
    return h.hexdigest()[:16]

qs, oracles = e.queries(), e.oracle_sql()
fails = 0
for name, fn in qs.items():
    spdf = fn(spark, SF).toPandas()
    if name not in oracles:
        print(f"{name}: rows-only check, {len(spdf)} rows")
        continue
    dpdf = con.execute(oracles[name]).fetchdf()
    ok_rows = len(spdf) == len(dpdf)
    ok_cols = sorted(spdf.columns) == sorted(dpdf.columns)
    ok_hash = value_hash(spdf) == value_hash(dpdf)
    status = "OK" if (ok_rows and ok_cols and ok_hash) else "MISMATCH"
    if status != "OK":
        fails += 1
    print(f"{name}: {status} rows={len(spdf)}/{len(dpdf)} cols_match={ok_cols} hash_match={ok_hash}")
print("FAILURES:", fails)
