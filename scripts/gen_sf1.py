#!/usr/bin/env python3
"""Scale-proof corpus: build sf1 (10x sf0.1) under /tmp/sf1 for the
round-9 scale datapoint (BENCH_NOTES_r9). NOT driver data — bench infra.

Replication preserves per-replica structure exactly and destroys
cross-replica similarity, so the expected scaling of every headline
query is LINEAR (except the documented quadratic-by-spec twin):

- lineitem / events: 10 copies with shifted keys (l_orderkey, event_id,
  user_id). Same time range -> 10x keys, same per-key series shape.
- documents: doc_id shift + every TOKEN suffixed with the replica index
  (injective token map: within-replica shingle/Jaccard structure is
  identical, cross-replica Jaccard is 0 -> near-dup pair count scales
  exactly 10x).
- embeddings: vec_id shift + a per-replica SIGN-FLIP pattern (an
  orthogonal transform: all within-replica cosines preserved exactly,
  cross-replica cosines scrambled -> ANN/cosine-dup workload scales
  linearly in rows).
- dims (region nation customer supplier part orders): copied verbatim.
  CAVEAT: shifted fact keys (l_orderkey, user_id) therefore dangle
  against the unscaled dims for replicas 1..9 — fact-to-dim FK joins
  only match replica 0 at sf1. None of the 17 measured headline
  queries joins a fact to a dim (the joins in the set are
  events-to-events as-of/tolerance), so the scaling table is
  unaffected; do NOT reuse this corpus to scale-test lineitem-orders
  style joins without also scaling the dims.
"""
import os, shutil, sys
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
REPLICAS = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
# corpus timestamps are UTC-adjusted (Spark TimestampType, not NTZ)
con.execute("SET TimeZone='UTC'")

# --- verbatim dims -------------------------------------------------------
for t in ["region", "nation", "customer", "supplier", "part", "orders"]:
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")

# --- lineitem: shifted orderkeys ----------------------------------------
okmax = con.execute(
    f"SELECT max(l_orderkey)+1 FROM read_parquet('{SRC}/lineitem.parquet')"
).fetchone()[0]
con.execute(f"""
  COPY (
    SELECT l_orderkey + r.i * {okmax} AS l_orderkey,
           l_partkey, l_suppkey, l_linenumber, l_quantity,
           l_extendedprice, l_discount, l_tax, l_returnflag,
           l_linestatus, CAST(l_shipdate AS TIMESTAMPTZ) AS l_shipdate
    FROM read_parquet('{SRC}/lineitem.parquet'),
         (SELECT unnest(range({REPLICAS})) AS i) r
  ) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)""")

# --- events: shifted event/user ids, same time range --------------------
emax, umax = con.execute(
    f"SELECT max(event_id)+1, max(user_id)+1 "
    f"FROM read_parquet('{SRC}/events.parquet')").fetchone()
con.execute(f"""
  COPY (
    SELECT event_id + r.i * {emax} AS event_id, CAST(ts AS TIMESTAMPTZ) AS ts,
           user_id + r.i * {umax} AS user_id,
           event_type, value, props
    FROM read_parquet('{SRC}/events.parquet'),
         (SELECT unnest(range({REPLICAS})) AS i) r
  ) TO '{DST}/events.parquet' (FORMAT PARQUET)""")

# --- documents: injective per-replica token map -------------------------
docs = pq.read_table(f"{SRC}/documents.parquet").to_pydict()
dmax = max(docs["doc_id"]) + 1
out = {k: [] for k in docs}
for i in range(REPLICAS):
    sfx = "" if i == 0 else str(i)
    for j in range(len(docs["doc_id"])):
        t = docs["text"][j] if sfx == "" else " ".join(
            w + sfx for w in docs["text"][j].split(" "))
        out["doc_id"].append(docs["doc_id"][j] + i * dmax)
        out["text"].append(t)
        out["lang"].append(docs["lang"][j])
        out["source"].append(docs["source"][j])
        out["n_chars"].append(len(t))
pq.write_table(pa.table(out), f"{DST}/documents.parquet")

# --- embeddings: per-replica orthogonal sign flip -----------------------
emb = pq.read_table(f"{SRC}/embeddings.parquet").to_pydict()
vmax = max(emb["vec_id"]) + 1
dim = len(emb["embedding"][0])
rng = np.random.default_rng(42)
signs = np.where(rng.random((REPLICAS, dim)) < 0.5, -1.0, 1.0)
signs[0, :] = 1.0  # replica 0 verbatim
vecs = np.array(emb["embedding"], dtype=np.float32)
eo = {"vec_id": [], "embedding": [], "label": []}
for i in range(REPLICAS):
    flipped = (vecs * signs[i].astype(np.float32)).astype(np.float32)
    eo["vec_id"].extend(v + i * vmax for v in emb["vec_id"])
    eo["embedding"].extend(flipped.tolist())
    eo["label"].extend(emb["label"])
pq.write_table(
    pa.table({"vec_id": pa.array(eo["vec_id"], pa.int64()),
              "embedding": pa.array(eo["embedding"], pa.list_(pa.float32())),
              "label": pa.array(eo["label"], pa.int32())}),
    f"{DST}/embeddings.parquet")

for t in ["lineitem", "events", "documents", "embeddings"]:
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
    print(t, n)
print("sf1 written to", DST)
