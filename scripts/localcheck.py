#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tooling only,
not part of the shipped library): run after `sbt "runMain graft.Verify
<sfDir> <outDir>"`. Loads each query's parquet dump, runs its oracle SQL
in DuckDB over the same sf tables, and compares (columns sorted by name,
rows sorted, values stringified)."""
import sys, os, json, glob
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(rel):
    cols = sorted(rel.columns)
    df = rel.df()[cols]
    rows = sorted(tuple(str(v) for v in r) for r in df.itertuples(index=False))
    return cols, rows

def raw_rows(rel):
    # file/result order, columns sorted by name — catches canonical-order
    # divergence that an order-sensitive driver compare would see
    cols = sorted(rel.columns)
    df = rel.df()[cols]
    return [tuple(str(v) for v in r) for r in df.itertuples(index=False)]

fails = 0
for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
    if not os.path.isdir(qdir):
        continue
    q = os.path.basename(qdir)
    got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
    # the driver sorts every dump with pandas sort_values, which throws
    # on array/struct columns (r2: mm_features, q_array_agg) — replicate
    # that failure mode locally for EVERY query, rows-only included
    try:
        df = got.df()
        df.sort_values(by=sorted(df.columns))
    except Exception as e:
        print(f"FAIL {q}: driver-style pandas sort would fail: {e}")
        fails += 1
        continue
    if q not in oracle:
        n = len(got.fetchall())
        print(f"{'OK  ' if n > 0 else 'WARN'} {q}: rows-only ({n} rows)")
        if n == 0: fails += 1
        continue
    try:
        want = con.sql(oracle[q])
        gc, gr = canon(got)
        wc, wr = canon(want)
    except Exception as e:
        print(f"FAIL {q}: oracle error: {e}")
        fails += 1
        continue
    if gc != wc:
        print(f"FAIL {q}: columns {gc} != {wc}")
        fails += 1
    elif gr != wr:
        diff = [i for i, (a, b) in enumerate(zip(gr, wr)) if a != b][:3]
        print(f"FAIL {q}: rows {len(gr)} vs {len(wr)}; first diffs at {diff}")
        for i in diff:
            print(f"   got  {gr[i]}\n   want {wr[i]}")
        if len(gr) != len(wr):
            gs, ws = set(gr), set(wr)
            print(f"   only-got {list(gs - ws)[:2]}\n   only-want {list(ws - gs)[:2]}")
        fails += 1
    else:
        order = "ordered" if raw_rows(got) == raw_rows(want) else "ORDER-DIVERGENT"
        print(f"OK   {q}: {len(gr)} rows ({order})")
        if order != "ordered":
            fails += 1
sys.exit(1 if fails else 0)
