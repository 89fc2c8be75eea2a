#!/usr/bin/env python3
"""Generate an sf1 stress fixture (10x sf0.1) at /tmp/graft_sf1.

Dev-side tooling (like check.py) - NOT engine code. The driver ships
fixtures up to sf0.1; the scale sweep needs one decade more. Strategy:
replicate sf0.1 ten times with SHIFTED KEY SPACES so every foreign-key
relationship is preserved per replica (replica k's lineitem rows join
replica k's orders, etc.) and the key-group cardinality grows 10x while
per-group density stays constant - the scaling regime the plans are
designed for. Content is decorrelated where identity would distort the
workload:

- documents: per-replica deterministic word shuffle PLUS ~15% seeded
  word substitution (seeded by (doc_id, k)). The shuffle decorrelates
  ORDER-SENSITIVE signatures (word 3-gram shingles, char 4-grams,
  8-token windows) but leaves the distinct-token SET identical, which
  would hand every doc 9 exact twins under ORDER-INVARIANT signatures
  (SimHash hashes the distinct token set) and inflate that family's
  measured scaling exponent with workload growth that is fixture
  artifact, not plan behavior. Substituting a random ~15% of word
  occurrences with replica-tagged variants decorrelates the token set
  as well, so per-group density stays constant across the decade for
  both families; n_chars recomputed from the new text.
- embeddings: per-replica circular rotation of the vector - cosine
  structure across replicas is decorrelated deterministically.
- events is written as TIMESTAMP(NANOS) regardless of the source
  generation's physical type (driver fixtures moved to MICROS in
  round 8): Tables.apply dispatches on the type read, so the sf1
  fixture deliberately keeps the legacy nanosAsLong read path
  exercised while the driver fixtures cover the µs/NTZ path.

Bounded dims (region, nation) do NOT scale, same as TPC-H.
"""
import os
import random
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
K = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def copy(sql, t):
    con.execute(f"COPY ({sql}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows")


# key-space strides (max+1 per replica)
C, S, P, O, E, U = [
    con.execute(q).fetchone()[0]
    for q in [
        f"SELECT max(c_custkey)+1 FROM {src('customer')}",
        f"SELECT max(s_suppkey)+1 FROM {src('supplier')}",
        f"SELECT max(p_partkey)+1 FROM {src('part')}",
        f"SELECT max(o_orderkey)+1 FROM {src('orders')}",
        f"SELECT max(event_id)+1 FROM {src('events')}",
        f"SELECT max(user_id)+1 FROM {src('events')}",
    ]
]
REP = f"(SELECT unnest(range({K})) AS k)"

copy(f"SELECT * FROM {src('region')}", "region")
copy(f"SELECT * FROM {src('nation')}", "nation")
copy(
    f"""SELECT c_custkey + k*{C} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM {src('customer')}, {REP}""",
    "customer",
)
copy(
    f"""SELECT s_suppkey + k*{S} AS s_suppkey, s_name, s_nationkey, s_acctbal
        FROM {src('supplier')}, {REP}""",
    "supplier",
)
copy(
    f"""SELECT p_partkey + k*{P} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM {src('part')}, {REP}""",
    "part",
)
copy(
    f"""SELECT o_orderkey + k*{O} AS o_orderkey, o_custkey + k*{C} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}, {REP}""",
    "orders",
)
copy(
    f"""SELECT l_orderkey + k*{O} AS l_orderkey, l_partkey + k*{P} AS l_partkey,
               l_suppkey + k*{S} AS l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag,
               l_linestatus, l_shipdate
        FROM {src('lineitem')}, {REP}""",
    "lineitem",
)
# events: written as parquet TIMESTAMP(NANOS) whatever the source type
# (µs sources upcast losslessly) — keeps the engine's nanosAsLong read
# path exercised now that driver fixtures ship µs; DuckDB's parquet
# writer would downcast ns to us, so pull epoch-ns as int64 and
# reinterpret as timestamp[ns] in pyarrow.
ev = con.execute(
    f"""SELECT event_id + k*{E} AS event_id,
               epoch_ns(CAST(ts AS TIMESTAMP_NS)) AS ts_ns,
               user_id + k*{U} AS user_id, event_type, value, props
        FROM {src('events')}, {REP}"""
).arrow()
ev_out = pa.table(
    {
        "event_id": ev.column("event_id"),
        "ts": ev.column("ts_ns").cast(pa.timestamp("ns")),
        "user_id": ev.column("user_id"),
        "event_type": ev.column("event_type"),
        "value": ev.column("value"),
        "props": ev.column("props"),
    }
)
pq.write_table(ev_out, f"{DST}/events.parquet", coerce_timestamps=None)
print(f"events: {ev_out.num_rows} rows")
# embeddings: deterministic circular rotation per replica
copy(
    f"""SELECT vec_id + k*(SELECT max(vec_id)+1 FROM {src('embeddings')}) AS vec_id,
               CAST(list_transform(range(len(embedding)),
                    i -> embedding[((i + k) % len(embedding)) + 1]) AS FLOAT[]) AS embedding,
               label
        FROM {src('embeddings')}, {REP}""",
    "embeddings",
)

# documents: seeded per-(doc_id, replica) word shuffle (decorrelates
# every ORDER-SENSITIVE signature) + a deterministic per-(word, replica)
# VOCABULARY BIJECTION (decorrelates the token SET across replicas):
# ~15% of the vocabulary, chosen by hash of (word, k) — NOT per
# occurrence — maps w -> w + 'q' + letter(k). Per-word determinism
# means two near-duplicate docs inside one replica undergo the SAME
# substitution, so intra-replica near-dup density is preserved (a
# per-occurrence coin would perturb each member of a pair
# independently and thin the dedup family's workload ~7x); the
# replica tag must be a LETTER because the engine tokenizes [a-z]+ —
# a digit tag is stripped and every replica collapses to the same
# variant token.
import hashlib


def subbed(w, k):
    return int(hashlib.md5(f"{w}|{k}".encode()).hexdigest()[:8], 16) % 100 < 15


docs = pq.read_table(f"{SRC}/documents.parquet")
D = max(docs.column("doc_id").to_pylist()) + 1
ids, texts, langs, sources, nchars = [], [], [], [], []
rows = docs.to_pylist()
for k in range(K):
    for r in rows:
        if k == 0:
            t = r["text"]
        else:
            words = r["text"].split(" ")
            rng = random.Random(r["doc_id"] * 37 + k)
            rng.shuffle(words)
            words = [f"{w}q{chr(96 + k)}" if subbed(w, k) else w for w in words]
            t = " ".join(words)
        ids.append(r["doc_id"] + k * D)
        texts.append(t)
        langs.append(r["lang"])
        sources.append(r["source"])
        nchars.append(len(t))
out = pa.table(
    {
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array(nchars, pa.int64()),
    }
)
pq.write_table(out, f"{DST}/documents.parquet")
print(f"documents: {out.num_rows} rows")

# physical-type check: the engine's nanosAsLong path needs NANOS
sch = pq.read_schema(f"{DST}/events.parquet")
assert "timestamp[ns]" in str(sch.field("ts").type), sch
print("events ts type:", sch.field("ts").type)
print("done ->", DST)
