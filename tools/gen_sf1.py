#!/usr/bin/env python3
"""Local sf1-equivalent dataset for the SCALING.md probe (10x sf0.1).

NOT a replacement for driver testdata (never writes under /root/testdata):
this exists so sf0.1 -> sf1 scaling exponents can be MEASURED instead of
argued from plan shape. Construction mirrors what the driver's generator
does as sf grows:

- relational tables are tiled 10x with per-table key shifts, so distinct
  keys grow 10x while per-key multiplicities stay constant (orders per
  customer, events per user, lineitems per order) -- the direction a real
  warehouse grows. Key-derived strings (c_name, s_name) are regenerated
  from the shifted key, exactly like the source format.
- documents are regenerated fresh (50k docs) from sf0.1's empirical
  unigram weights and doc-length distribution, so chance shingle-collision
  density scales the way a truly larger corpus would (verbatim tiling would
  instead plant 10-copy duplicate clusters everywhere).
- embeddings are 10x same-label jittered samples, preserving the label
  cluster structure IVF/ANN queries rely on.

Usage: python3 tools/gen_sf1.py [outdir] [tiles]   (defaults /tmp/graft_sf1 10)
"""
import os
import sys
import duckdb
import numpy as np

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
TILES = int(sys.argv[2]) if len(sys.argv) > 2 else 10
SEED = 4242

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"

def write(t, sql):
    con.execute(f"COPY ({sql}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows")

# key spans observed at sf0.1 (min is 0 for every key)
SPAN = dict(cust=15000, order=150000, part=20000, supp=1000,
            user=1500, event=100000, doc=5000, vec=2000)

tiles = f"(SELECT unnest(range({TILES})) AS t)"

# dimension tables that do not grow with sf
for t in ("region", "nation"):
    if os.path.exists(f"{SRC}/{t}.parquet"):
        write(t, f"SELECT * FROM {src(t)}")

write("customer", f"""
  SELECT c_custkey + t * {SPAN['cust']} AS c_custkey,
         'Customer#' || lpad((c_custkey + t * {SPAN['cust']})::VARCHAR, 9, '0') AS c_name,
         c_nationkey, c_acctbal, c_mktsegment
  FROM {src('customer')} CROSS JOIN {tiles}""")

write("supplier", f"""
  SELECT s_suppkey + t * {SPAN['supp']} AS s_suppkey,
         'Supplier#' || lpad((s_suppkey + t * {SPAN['supp']})::VARCHAR, 9, '0') AS s_name,
         s_nationkey, s_acctbal
  FROM {src('supplier')} CROSS JOIN {tiles}""")

write("part", f"""
  SELECT p_partkey + t * {SPAN['part']} AS p_partkey,
         p_name, p_brand, p_type, p_size, p_retailprice
  FROM {src('part')} CROSS JOIN {tiles}""")

write("orders", f"""
  SELECT o_orderkey + t * {SPAN['order']} AS o_orderkey,
         o_custkey + t * {SPAN['cust']} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')} CROSS JOIN {tiles}""")

write("lineitem", f"""
  SELECT l_orderkey + t * {SPAN['order']} AS l_orderkey,
         l_partkey + t * {SPAN['part']} AS l_partkey,
         l_suppkey + t * {SPAN['supp']} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')} CROSS JOIN {tiles}""")

write("events", f"""
  SELECT event_id + t * {SPAN['event']} AS event_id, ts,
         user_id + t * {SPAN['user']} AS user_id,
         event_type, value, props
  FROM {src('events')} CROSS JOIN {tiles}""")

# ---- documents: fresh sample from the empirical word/length model ------
rng = np.random.default_rng(SEED)
vocab_rows = con.execute(f"""
  SELECT w, count(*) FROM (
    SELECT unnest(regexp_split_to_array(text, ' ')) AS w FROM {src('documents')})
  GROUP BY 1 ORDER BY 1""").fetchall()
vocab = [r[0] for r in vocab_rows]
wts = np.array([r[1] for r in vocab_rows], dtype=float)
wts /= wts.sum()
lens = [r[0] for r in con.execute(
    f"SELECT len(regexp_split_to_array(text, ' ')) FROM {src('documents')}").fetchall()]
meta = con.execute(
    f"SELECT lang, source, count(*) FROM {src('documents')} GROUP BY 1, 2").fetchall()
meta_keys = [(r[0], r[1]) for r in meta]
meta_w = np.array([r[2] for r in meta], dtype=float)
meta_w /= meta_w.sum()

n_docs = SPAN['doc'] * TILES
doc_lens = rng.choice(lens, size=n_docs)
meta_idx = rng.choice(len(meta_keys), size=n_docs, p=meta_w)
# one vectorized index draw for ALL words (the per-doc rng.choice loop is
# O(|vocab|) per call — prohibitive at TILES=100 / 500k docs), then split
# at the cumulative doc lengths; same unigram/length model, same seed
# stream discipline (a different draw than the loop form, which only
# matters for byte-identity of a regenerated corpus, not for the scaling
# probes this data exists for)
vocab_arr = np.array(vocab, dtype=object)
total_words = int(doc_lens.sum())
word_idx = rng.choice(len(vocab_arr), size=total_words, p=wts)
bounds = np.concatenate(([0], np.cumsum(doc_lens.astype(np.int64))))
texts, langs, sources = [], [], []
for i in range(n_docs):
    texts.append(" ".join(vocab_arr[word_idx[bounds[i]:bounds[i + 1]]]))
    langs.append(meta_keys[meta_idx[i]][0])
    sources.append(meta_keys[meta_idx[i]][1])
import pyarrow as pa
import pyarrow.parquet as pq
pq.write_table(pa.table({
    "doc_id": pa.array(range(n_docs), pa.int64()),
    "text": pa.array(texts),
    "lang": pa.array(langs),
    "source": pa.array(sources),
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
}), f"{OUT}/documents.parquet")
print(f"documents: {n_docs} rows")

# ---- embeddings: same-label jitter, label clusters preserved ------------
base = con.execute(
    f"SELECT vec_id, embedding, label FROM {src('embeddings')} ORDER BY vec_id").fetchall()
vecs = np.array([r[1] for r in base], dtype=np.float32)
labels = np.array([r[2] for r in base])
n_vec = SPAN['vec'] * TILES
pick = rng.integers(0, len(base), size=n_vec)
jitter = rng.normal(0.0, 0.02, size=(n_vec, vecs.shape[1])).astype(np.float32)
out_vecs = vecs[pick] + jitter
pq.write_table(pa.table({
    "vec_id": pa.array(range(n_vec), pa.int64()),
    "embedding": pa.array(out_vecs.tolist(), pa.list_(pa.float32())),
    "label": pa.array(labels[pick].tolist(), pa.int32()),
}), f"{OUT}/embeddings.parquet")
print(f"embeddings: {n_vec} rows")
print("done:", OUT)
