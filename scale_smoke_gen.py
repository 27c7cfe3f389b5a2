"""Build a 10x replica of sf0.1 docs/embeddings/part for scale smokes.

Replication model (documented in SCALE_NOTES.md): corpus GROWS with new
content — duplicate/near-dup rate stays constant. Naive row copies would
make every doc 10x-duplicated (pathological input: pair counts explode
quadratically by construction, telling us nothing about real scaling).
- documents: every word suffixed with a replica tag -> cross-replica
  shingle overlap is zero, within-replica structure identical.
- embeddings: per-replica deterministic dimension permutation ->
  within-replica pair cosines EXACTLY the originals, cross-replica
  pairs decorrelated.
- part: brand suffixed per replica -> fuzzy-match blocks scale OUT
  (more blocks), not UP (bigger blocks) — the realistic blocking-key
  assumption, stated explicitly.
Other tables are copied as-is from sf0.1.

SPARK_GRAFT_SCALE_N sets the replica factor (default 10). N=10 builds
the full table set under .scale_smoke/x10; any other N (e.g. 100 for
the VERDICT r7 #3 dedup-route receipt) builds ONLY documents+embeddings
under .scale_smoke/x{N} — the tables the ANN/span dedup chain reads —
so the x100 corpus is 500k docs / 200k vectors without 60M-row
lineitem ballast.
"""
import os, shutil, sys
sys.path.insert(0, "/root/repo")
import numpy as np
from pyspark.sql import functions as F
from hbacker_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "10"))
DST = f"/root/repo/.scale_smoke/x{N}"  # gitignored, transient
DOCS_ONLY = N != 10

spark = get_spark("scale_smoke")
spark.sparkContext.setLogLevel("ERROR")
os.makedirs(DST, exist_ok=True)

docs = spark.read.parquet(f"{SRC}/documents.parquet")
max_doc = docs.agg(F.max("doc_id")).first()[0] + 1
parts = []
for i in range(N):
    r = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * max_doc))
    if i:
        r = r.withColumn("text", F.regexp_replace("text", r"(\S+)", f"$1x{i}"))
    parts.append(r)
parts[0].unionByName(*parts[1:]) if False else None
out = parts[0]
for p in parts[1:]:
    out = out.unionByName(p)
out.write.mode("overwrite").parquet(f"{DST}/documents.parquet")

emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
max_vec = emb.agg(F.max("vec_id")).first()[0] + 1
dim = len(emb.select("embedding").first()[0])
eparts = []
for i in range(N):
    r = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * max_vec))
    if i:
        perm = np.random.RandomState(i).permutation(dim).tolist()
        r = r.withColumn("embedding", F.array(*[F.col("embedding")[p] for p in perm]))
    eparts.append(r)
out = eparts[0]
for p in eparts[1:]:
    out = out.unionByName(p)
out.write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")

if DOCS_ONLY:
    print("built", DST, "(documents+embeddings only)")
    sys.exit(0)

part = spark.read.parquet(f"{SRC}/part.parquet")
max_pk = part.agg(F.max("p_partkey")).first()[0] + 1
pparts = []
for i in range(N):
    r = part.withColumn("p_partkey", F.col("p_partkey") + F.lit(i * max_pk))
    if i:
        r = r.withColumn("p_brand", F.concat("p_brand", F.lit(f"_r{i}")))
    pparts.append(r)
out = pparts[0]
for p in pparts[1:]:
    out = out.unionByName(p)
out.write.mode("overwrite").parquet(f"{DST}/part.parquet")

# lineitem: replicate with per-replica orderkey/partkey offsets — the
# co-purchase graph gains 10x DISJOINT components (new stores, not
# denser stores): within-replica edge/triangle structure identical,
# cross-replica edges zero. Linear-input growth => graph queries
# (pairs/degree/triangles/BFS) should scale ~linearly; superlinear
# growth here means a join shape regressed.
li = spark.read.parquet(f"{SRC}/lineitem.parquet")
max_ok = li.agg(F.max("l_orderkey")).first()[0] + 1
lparts = []
for i in range(N):
    r = (li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * max_ok))
           .withColumn("l_partkey", F.col("l_partkey") + F.lit(i * max_pk)))
    lparts.append(r)
out = lparts[0]
for q in lparts[1:]:
    out = out.unionByName(q)
out.write.mode("overwrite").parquet(f"{DST}/lineitem.parquet")

# events: replicate with per-replica user_id/event_id offsets — 10x
# DISJOINT users at constant per-user event density ("more users, not
# denser users"). The range join's pair count and sessionization's
# per-user window work both track per-user density, so linear input
# growth should give ~linear (sub-linear after overhead amortization)
# time growth; superlinear means the (user_id, ts-bucket) equi-key or
# the single-shuffle window chain regressed. ts passes through
# unchanged (NANOS->NTZ on read, NTZ parquet on write — also exercises
# the engine-written-events read path in load_table).
ev = spark.read.parquet(f"{SRC}/events.parquet")
max_uid = ev.agg(F.max("user_id")).first()[0] + 1
max_eid = ev.agg(F.max("event_id")).first()[0] + 1
evparts = []
for i in range(N):
    evparts.append(
        ev.withColumn("user_id", F.col("user_id") + F.lit(i * max_uid))
          .withColumn("event_id", F.col("event_id") + F.lit(i * max_eid))
    )
out = evparts[0]
for q in evparts[1:]:
    out = out.unionByName(q)
out.write.mode("overwrite").parquet(f"{DST}/events.parquet")

for t in ("region", "nation", "customer", "supplier", "orders"):
    s = f"{SRC}/{t}.parquet"
    d = f"{DST}/{t}.parquet"
    if os.path.isdir(s):
        shutil.copytree(s, d, dirs_exist_ok=True)
    else:
        shutil.copy(s, d)
print("built", DST)
