#!/usr/bin/env python3
"""Build a 10x replica corpus at /tmp/sfx for scale probing (dev tooling,
driver-side python only — not part of the shipped library).

Replicates the sf0.1 fact tables 10x with offset keys (dims stay
single-copy), giving ~sf1 volume with WORST-CASE duplicate density:
every text/vector appears 10 times, which is exactly the regime that
floods near-dup band buckets and blocks. Run the bench against it:

    python3 scripts/scaleprobe.py
    SPARK_GRAFT_SF_DIR=/tmp/sfx SPARK_GRAFT_CPUS=32 \
        sbt -batch "runMain graft.Bench"

Round-2 findings from this probe are recorded in SURVEY.md §3a/§3b/§6a.
NOTE: events must be written via pyarrow — duckdb's parquet writer
downcasts TIMESTAMP_NS to microseconds, which silently breaks
Tables.events' nanos handling (queries fail fast and the bench's
try/catch hides it; sanity-check row counts on new probe tables).
"""
import os
import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.1"
OUT = "/tmp/sfx"
R = 10

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()


def key_stride(table: str, key: str) -> int:
    """Replica offset derived from the source's max id — a fixed constant
    would silently collide (duplicate keys) once a table outgrows it."""
    hi = con.sql(f"SELECT max({key}) FROM '{SF}/{table}.parquet'").fetchall()[0][0]
    return int(hi) + 1


doc_stride = key_stride("documents", "doc_id")
con.sql(f"""COPY (
  SELECT doc_id + {doc_stride} * r AS doc_id, lang, source, n_chars, text
  FROM '{SF}/documents.parquet', range(0, {R}) t(r)
) TO '{OUT}/documents.parquet' (FORMAT PARQUET)""")

vec_stride = key_stride("embeddings", "vec_id")
con.sql(f"""COPY (
  SELECT vec_id + {vec_stride} * r AS vec_id, label, embedding
  FROM '{SF}/embeddings.parquet', range(0, {R}) t(r)
) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)""")

order_stride = key_stride("orders", "o_orderkey")
con.sql(f"""COPY (
  SELECT o_orderkey + {order_stride} * r AS o_orderkey, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM '{SF}/orders.parquet', range(0, {R}) t(r)
) TO '{OUT}/orders.parquet' (FORMAT PARQUET)""")

con.sql(f"""COPY (
  SELECT l_orderkey + {order_stride} * r AS l_orderkey, l_partkey, l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{SF}/lineitem.parquet', range(0, {R}) t(r)
) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)""")

for t in ["customer", "supplier", "nation", "region", "part"]:
    con.sql(f"COPY (SELECT * FROM '{SF}/{t}.parquet') TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")

# events: pyarrow replication preserving timestamp[ns]
t = pq.read_table(f"{SF}/events.parquet")
event_stride = pc.max(t.column("event_id")).as_py() + 1
parts = []
for r in range(R):
    parts.append(t.set_column(
        t.schema.get_field_index("event_id"), "event_id",
        pc.add(t.column("event_id"), pa.scalar(event_stride * r, pa.int64()))))
pq.write_table(pa.concat_tables(parts), f"{OUT}/events.parquet")

for name in ["documents", "embeddings", "events", "orders", "lineitem"]:
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchall()[0][0]
    print(f"{name}: {n}")
# the replica must preserve the SOURCE's timestamp flavor exactly —
# Tables.events adapts on the observed schema (ns-as-long, µs, or NTZ),
# so the only wrong outcome is the probe table silently changing flavor
src_ts = pq.read_schema(f"{SF}/events.parquet").field("ts").type
ts_type = pq.read_schema(f"{OUT}/events.parquet").field("ts").type
assert ts_type == src_ts, f"events ts must stay {src_ts}, got {ts_type}"
print("probe tables ready at", OUT)
