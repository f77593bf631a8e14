#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare (SURVEY.md §3
entry point 2). Usage:
    python3 tools/compare.py [sfdir] [outdir] [only_query ...]
Reads outdir/<name>/*.parquet (Spark result) and runs
outdir/oracle_sql.json[name] in DuckDB over sfdir views; sorts columns
by name; compares cell-exact.

Faithfulness notes (round-5 rework after two driver-only failures):
  * The Spark side is read with PYARROW, not duckdb — the driver does
    the same, so parquet-level representation (decimal128 physical
    type, int32 vs int64, …) reaches the compare exactly as the
    driver sees it. Routing both sides through duckdb fetchdf (the
    old behavior) silently canonicalized those differences away.
  * Any list-typed Spark output column is an immediate FAIL: the
    driver's pandas sort_values crashes on list cells (no verdict at
    all, which is worse than a red row). r4 shipped three such
    queries because the old compare.py happily tuple-ized lists.
"""
import sys, json, glob, math, datetime
from decimal import Decimal
import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

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


def is_listy(t):
    return (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t) or pa.types.is_struct(t)
            or pa.types.is_map(t))


def norm(v):
    """Canonicalize a cell for the exact-value compare. Types that
    differ in representation but not value (int vs Decimal scale-0,
    numpy scalar vs python) are NOT collapsed here — dtype mismatch is
    caught by the typed check first, mirroring the driver's typed
    hash."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # datetime-likes canonicalize to ISO text: pyarrow hands dates back
    # as datetime.date objects while duckdb fetchdf gives datetime64[us]
    # — the driver's r4 run passed every such column, so resolution and
    # date-vs-midnight-timestamp differences are NOT driver-visible
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        return pd.Timestamp(v).isoformat()
    if hasattr(v, "tolist"):
        t = v.tolist()
        if isinstance(t, (list, tuple)):
            return tuple(norm(x) for x in t)
        return norm(t)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def dtype_of(series):
    d = str(series.dtype)
    # driver-tolerated equivalence class (see norm): all datetime-like
    # dtypes collapse, including pyarrow's object-of-date columns
    if d.startswith("datetime64"):
        return "datetime-like"
    if d == "object":
        flavor = None
        for x in series:
            if x is None or (isinstance(x, float) and math.isnan(x)):
                continue
            flavor = type(x).__name__
            break
        if flavor in ("date", "datetime", "Timestamp"):
            return "datetime-like"
    if d == "object":
        # distinguish the object-dtype flavors the same way a typed
        # hash would: Decimal vs str vs date vs bytes are different
        for x in series:
            if x is None or (isinstance(x, float) and math.isnan(x)):
                continue
            return f"object:{type(x).__name__}"
        return "object:empty"
    return d


for name in sorted(oracle):
    if only and name not in only:
        continue
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        fails.append((name, "no spark output"))
        continue
    try:
        stbl = pq.read_table(files)
    except Exception as e:
        fails.append((name, f"pyarrow read error: {e}"))
        continue
    listy = [f.name for f in stbl.schema if is_listy(f.type)]
    if listy:
        fails.append((name, f"list/struct-typed output columns {listy} — "
                            "the driver comparer crashes on these (no verdict)"))
        continue
    try:
        sdf = stbl.to_pandas()
        odf = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"exec error: {e}"))
        continue
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        fails.append((name, f"schema: spark={scols} oracle={ocols}"))
        continue
    sdf, odf = sdf[scols], odf[scols]
    # The driver's hash compare is TYPED: the Spark side is pyarrow's
    # pandas view of the parquet bytes, the oracle side is duckdb's
    # fetchdf. A decimal128 column (object:Decimal) vs a DuckDB
    # HUGEINT (object:int / float64) fails the driver even when the
    # values are numerically equal — so it must fail here too.
    sdt = {c: dtype_of(sdf[c]) for c in scols}
    odt = {c: dtype_of(odf[c]) for c in scols}
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
