#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare (SURVEY.md §3
entry point 2). Usage:
    python3 tools/compare.py [sfdir] [outdir] [only_query ...]
Reads outdir/<name>/*.parquet (Spark result) and runs
outdir/oracle_sql.json[name] in DuckDB over sfdir views; sorts columns
by name; compares cell-exact.
"""
import sys, json, glob, math
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes = [], []

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # list-typed cells come back as numpy arrays / lists, whose ==
    # yields elementwise arrays; normalize to plain tuples so row
    # comparison stays a scalar bool (the driver's hash compare
    # flattens arrays the same way).
    if hasattr(v, "tolist"):
        return tuple(norm(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v

for name in sorted(oracle):
    if only and name not in only:
        continue
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        fails.append((name, "no spark output"))
        continue
    try:
        sdf = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        odf = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"exec error: {e}"))
        continue
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        fails.append((name, f"schema: spark={scols} oracle={ocols}"))
        continue
    sdf, odf = sdf[scols], odf[scols]
    # The driver's hash compare is TYPED: DuckDB sum(BIGINT) returns
    # HUGEINT (→ float64/object in pandas) while Spark stays int64, and
    # that alone fails the driver even when values are equal. Both
    # frames come through duckdb's fetchdf, so dtype equality here is a
    # faithful local proxy for the driver's type check.
    sdt = {c: str(sdf[c].dtype) for c in scols}
    odt = {c: str(odf[c].dtype) for c in scols}
    if sdt != odt:
        bad = {c: (sdt[c], odt[c]) for c in scols if sdt[c] != odt[c]}
        fails.append((name, f"dtypes (spark, oracle): {bad}"))
        continue
    if len(sdf) != len(odf):
        fails.append((name, f"rows: spark={len(sdf)} oracle={len(odf)}"))
        continue
    srows = [tuple(norm(v) for v in r) for r in sdf.itertuples(index=False)]
    orows = [tuple(norm(v) for v in r) for r in odf.itertuples(index=False)]
    if srows != orows:
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
        fails.append((name, f"{len(diffs)}/{len(srows)} rows differ; first: "
                            f"row {diffs[0][0]}\n  spark:  {diffs[0][1]}\n  oracle: {diffs[0][2]}"))
        continue
    passes.append(name)

for n in passes:
    print(f"PASS {n}")
for n, msg in fails:
    print(f"FAIL {n}: {msg}")
print(f"\n{len(passes)} passed, {len(fails)} failed")
sys.exit(1 if fails else 0)
