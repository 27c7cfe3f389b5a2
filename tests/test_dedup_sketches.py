"""Pure-Python reference pins for the md5-derived sketch family (r6).

The minhash/simhash/LSH constructions are cross-engine portable BECAUSE
they are fully specified by md5 — these tests triangulate the Spark
expressions against a third implementation (hashlib) so an accidental
change to nibble order, seed formatting, or band concatenation breaks a
unit test here, not just the DuckDB oracle gate downstream. Also pins
the family's structural guarantees (identical docs always collide).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from hbacker_spark.functions import dedup as D


def _py_shingles(text: str, k: int = D.SHINGLE_K) -> list[str]:
    ws = text.split(" ")
    if len(ws) < k:
        return []
    out, seen = [], set()
    for i in range(len(ws) - k + 1):
        s = " ".join(ws[i : i + k])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def _py_minhash(text: str, num_hashes: int = D.NUM_HASHES) -> list[int]:
    sh = _py_shingles(text)
    return [
        min(int(hashlib.md5(f"{i}:{s}".encode()).hexdigest()[:8], 16) for s in sh)
        for i in range(num_hashes)
    ]


def _py_simhash(text: str) -> str:
    votes = [0] * 64
    for s in _py_shingles(text):
        hx = hashlib.md5(s.encode()).hexdigest()
        for b in range(64):
            nib = int(hx[b // 4], 16)
            votes[b] += 1 if (nib >> (b % 4)) & 1 else -1
    out = []
    for i in range(16):
        v = sum((1 << j) for j in range(4) if votes[i * 4 + j] > 0)
        out.append("0123456789abcdef"[v])
    return "".join(out)


TEXTS = [
    "the quick brown fox jumps over the lazy dog again and again",
    "pack my box with five dozen liquor jugs for the long trip home",
    "a b",  # under the shingle width -> empty sketches
]


def test_minhash_matches_pure_python_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = {r["doc_id"]: [r[f"mh_{i}"] for i in range(D.NUM_HASHES)]
           for r in D.minhash_signatures(docs).collect()}
    for i, t in enumerate(TEXTS):
        if _py_shingles(t):
            assert got[i] == _py_minhash(t), t
        else:
            assert i not in got  # shingle-less docs emit no signature


def test_simhash_matches_pure_python_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["simhash"] for r in D.simhash_table(docs).collect()}
    for i, t in enumerate(TEXTS):
        if _py_shingles(t):
            assert got[i] == _py_simhash(t), t
        else:
            assert i not in got


def test_identical_docs_always_lsh_candidates(spark):
    """Structural guarantee: byte-identical texts share every band, so
    LSH candidate generation can never miss an exact duplicate —
    n_shared_bands hits the maximum for the duplicate pair."""
    base = TEXTS[0]
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, TEXTS[1])], "doc_id long, text string"
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared_bands"]
        for r in D.lsh_candidate_pairs(docs).collect()
    }
    assert pairs.get((0, 1)) == D.NUM_HASHES // D.BAND_SIZE
    # identical docs also have identical simhash digests
    sims = {r["doc_id"]: r["simhash"] for r in D.simhash_table(docs).collect()}
    assert sims[0] == sims[1] and sims[0] != sims[2]
