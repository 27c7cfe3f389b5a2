"""LLM-data-pipeline operators (SURVEY.md §2.C + driver north star):
dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash / span removal),
similarity search, text analysis, sampling, packing/mixing. EVERY
registered query here is value-oracled (since r6 the sketch plumbing
itself is md5-portable, so even the MinHash/SimHash/LSH/IVF families
hash-match DuckDB cell-for-cell).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hbacker_spark.functions import dedup as D
from hbacker_spark.functions import scoring as SC
from hbacker_spark.functions import similarity as S
from hbacker_spark.functions import text as TX
from hbacker_spark.operators import similarity as SIM
from hbacker_spark.registry import register
from hbacker_spark.sources.tables import load_table, widen

JACCARD_THRESHOLD = 0.5
NEAR_DUP_COS = 0.4
KNN_K = 10
# Stop-shingle cutoff (SURVEY.md §2.C dedup): a shingle present in more
# than this many docs carries no near-dup signal but creates O(df^2)
# join pairs — one viral shingle would go quadratic per key at 100 TB.
# Jaccard is therefore defined over informative (df <= N) shingles, on
# BOTH engines.
MAX_SHINGLE_DF = 100
# Testdata embeddings are 64-dim at every SF (TESTDATA.md); a known dim
# lets the pair kernel unroll the dot product into codegen.
EMB_DIM = 64
# Rolling-hash fingerprint parameters (doc_fingerprint_rolling,
# fingerprint_containment_pairs): 31-base word hash, 131-base 4-word
# window, prime modulus — integer-exact on both engines.
FP_MOD = 1_000_000_007
FP_GRAM = 4


@register(
    "dedup_exact_groups",
    oracle="""
    SELECT md5(text) AS text_hash,
           min(doc_id) AS keeper_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    tags=("dedup", "llm"),
    doc="Exact dedup: hash-groupBy on content; keeper = min doc_id. "
    "Scales as a single shuffle on the content hash.",
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash")).agg(
        F.min("doc_id").alias("keeper_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


@register(
    "dedup_exact_keepers",
    oracle="""
    SELECT doc_id, lang, source
    FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
    tags=("dedup", "llm", "window"),
    doc="First-wins exact dedup via deterministic window (dropDuplicates "
    "keeps an arbitrary row; this keeps min doc_id, reproducibly).",
)
def dedup_exact_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).select("doc_id", "lang", "source")
    )


@register(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH sh0 AS (
      SELECT doc_id, unnest({D.sql_word_shingles('text')}) AS shingle
      FROM documents
    ),
    sh AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS sh_df
        FROM sh0
      ) WHERE sh_df <= {MAX_SHINGLE_DF}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           round(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= {JACCARD_THRESHOLD}
    """,
    tags=("dedup", "llm", "join"),
    doc="Near-dup by word-3-shingle Jaccard >= 0.5 via an inverted "
    "index built ONCE: one shuffle on the shingle hash produces each "
    "shingle's document-frequency and sorted posting list; stop "
    "shingles (df > MAX_SHINGLE_DF) are dropped there, then candidate "
    "pairs explode from the postings (≤ df²/2 per shingle, bounded by "
    "the cutoff) and per-doc sizes re-aggregate from the same postings "
    "— no doc×doc cartesian, no second corpus scan. The previous "
    "self-join formulation scanned+exploded the corpus 4x (stop list, "
    "both join sides, sizes; AQE reused none of the exchanges); this "
    "form is one scan and was measured 6.5s → ~2s at sf0.1. Same "
    "result set as the oracle's exact-string self-join.",
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = widen(load_table(spark, sf_dir, "documents"))
    # Shuffle on a 64-bit hash of the shingle instead of the string: the
    # keys drop from ~20-byte strings to int64 (collision odds
    # ~n^2/2^64, immaterial vs the oracle's exact string join).
    sh = d.select("doc_id", F.explode(D.word_shingles("text")).alias("shingle")).select(
        "doc_id", F.xxhash64("shingle").alias("shingle_h")
    )
    # Shingles are per-doc distinct (array_distinct in the builder), so
    # count(*) per shingle == document frequency. The posting list is
    # slice-bounded DURING projection: only df <= MAX_SHINGLE_DF rows
    # survive, so the kept lists are complete and the viral ones never
    # leave the aggregate. (Partial-agg maps still buffer a viral
    # shingle's full list; under extreme single-key skew the two-pass
    # df-then-anti-join variant bounds that too — cutoff semantics are
    # identical either way and mirrored in the oracle.)
    posts = (
        sh.groupBy("shingle_h")
        .agg(
            F.count(F.lit(1)).alias("sh_df"),
            F.sort_array(F.collect_list("doc_id")).alias("ds"),
        )
        .filter(F.col("sh_df") <= MAX_SHINGLE_DF)
        .select("sh_df", "ds")
    )
    sizes = (
        posts.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_sh"))
    )
    # Pair generation straight off the sorted postings: every (i < j)
    # combination, so doc_a < doc_b by construction — JVM-side
    # higher-order functions, no Python.
    pairs = posts.filter(F.col("sh_df") >= 2).select(
        F.explode(
            F.expr(
                "flatten(transform(ds, (x, i) -> "
                "transform(slice(ds, i + 2, size(ds) - i - 1), "
                "y -> struct(x AS doc_a, y AS doc_b))))"
            )
        ).alias("p")
    )
    common = (
        pairs.select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common"))
    return (
        common.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


CONTAIN_T = 0.8  # asymmetric-containment gate (quote/excerpt detection)


@register(
    "fingerprint_containment_pairs",
    oracle=f"""
    WITH hs AS (
      SELECT doc_id,
             list_transform(string_split(text, ' '), w ->
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(w, ''), c -> CAST(ascii(c) AS BIGINT))),
                 (a, c) -> (a * 31 + c) % {FP_MOD})) AS hs
      FROM documents
    ),
    g0 AS (
      SELECT doc_id,
             unnest(list_distinct(
               list_transform(generate_series(1, len(hs) - {FP_GRAM} + 1), i ->
                 (((((hs[i] * 131 + hs[i+1]) % {FP_MOD})
                    * 131 + hs[i+2]) % {FP_MOD})
                    * 131 + hs[i+3]) % {FP_MOD}))) AS g
      FROM hs WHERE len(hs) >= {FP_GRAM}
    ),
    gk AS (
      SELECT doc_id, g FROM (
        SELECT doc_id, g, COUNT(*) OVER (PARTITION BY g) AS g_df FROM g0
      ) WHERE g_df <= {MAX_SHINGLE_DF}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_fp FROM gk GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM gk a JOIN gk b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           round(CAST(n_common AS DOUBLE) / sa.n_fp, 6) AS contain_a,
           round(CAST(n_common AS DOUBLE) / sb.n_fp, 6) AS contain_b
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / sa.n_fp >= {CONTAIN_T}
       OR CAST(n_common AS DOUBLE) / sb.n_fp >= {CONTAIN_T}
    """,
    tags=("dedup", "llm", "fingerprint", "join"),
    doc="Asymmetric containment detection: fraction of each doc's "
    "distinct rolling-hash 4-gram fingerprints shared with the other "
    "doc — catches quotes/excerpts/supersets that symmetric Jaccard "
    "misses (a doc fully contained in a 10x-larger one has Jaccard "
    "~0.1 but containment 1.0). Same single-scan inverted-index shape "
    "as ngram_jaccard_pairs (posting lists off ONE shuffle, stop-gram "
    "df cutoff bounds the pair fan-out, integer rolling hashes match "
    "the oracle exactly).",
)
def fingerprint_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = widen(load_table(spark, sf_dir, "documents"))
    hs = F.expr(
        f"transform(split(text, ' '), w -> "
        f"aggregate(split(w, ''), CAST(0 AS BIGINT), "
        f"(a, c) -> (a * 31 + ascii(c)) % {FP_MOD}))"
    )
    gs = F.expr(
        f"array_distinct(transform(sequence(0, size(hs) - {FP_GRAM}), i -> "
        f"(((((hs[i] * 131 + hs[i+1]) % {FP_MOD}) "
        f"* 131 + hs[i+2]) % {FP_MOD}) "
        f"* 131 + hs[i+3]) % {FP_MOD}))"
    )
    grams = (
        d.select("doc_id", hs.alias("hs"))
        .filter(F.size("hs") >= FP_GRAM)
        .select("doc_id", F.explode(gs).alias("g"))
    )
    posts = (
        grams.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("g_df"),
            F.sort_array(F.collect_list("doc_id")).alias("ds"),
        )
        .filter(F.col("g_df") <= MAX_SHINGLE_DF)
        .select("g_df", "ds")
    )
    sizes = (
        posts.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_fp"))
    )
    pairs = posts.filter(F.col("g_df") >= 2).select(
        F.explode(
            F.expr(
                "flatten(transform(ds, (x, i) -> "
                "transform(slice(ds, i + 2, size(ds) - i - 1), "
                "y -> struct(x AS doc_a, y AS doc_b))))"
            )
        ).alias("p")
    )
    common = (
        pairs.select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    c_a = F.col("n_common").cast("double") / F.col("sa.n_fp")
    c_b = F.col("n_common").cast("double") / F.col("sb.n_fp")
    return (
        common.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter((c_a >= CONTAIN_T) | (c_b >= CONTAIN_T))
        .select(
            "doc_a",
            "doc_b",
            F.round(c_a, 6).alias("contain_a"),
            F.round(c_b, 6).alias("contain_b"),
        )
    )


@register(
    "unigram_rarity_scores",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tf AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token)
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(tf.cnt) AS BIGINT) AS sum_token_df,
           CAST(MIN(tf.cnt) AS BIGINT) AS rarest_token_df,
           round(CAST(SUM(tf.cnt) AS DOUBLE) / COUNT(*), 6) AS mean_token_df
    FROM toks t JOIN tf ON t.token = tf.token
    GROUP BY t.doc_id
    """,
    tags=("llm", "text", "quality", "aggregation"),
    doc="Unigram-LM rarity scoring: each doc scored by the corpus-wide "
    "frequency of its own tokens (mean + rarest) — the integer-exact "
    "twin of unigram log-prob perplexity proxies (log-space scoring "
    "would hash-drift across libm implementations; counts cannot). Low "
    "mean/rarest = OOV-heavy or noisy doc, high mean = boilerplate. "
    "Two shuffles (global token counts, per-doc rollup) + one equi-join "
    "on token; the vocab side broadcasts when small.",
)
def unigram_rarity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = widen(load_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        toks.join(tf, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("cnt").cast("bigint").alias("sum_token_df"),
            F.min("cnt").cast("bigint").alias("rarest_token_df"),
            F.round(F.sum("cnt").cast("double") / F.count(F.lit(1)), 6).alias("mean_token_df"),
        )
    )


@register(
    "bigram_cond_freq_scores",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    bg AS (
      SELECT doc_id,
             unnest(toks[1:len(toks)-1]) AS w1,
             unnest(toks[2:len(toks)]) AS w2
      FROM t
    ),
    c2 AS (SELECT w1, w2, COUNT(*) AS bg_cnt FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, SUM(bg_cnt) AS ctx_cnt FROM c2 GROUP BY w1),
    vocab AS (SELECT c2.w1, c2.w2, c2.bg_cnt, c1.ctx_cnt
              FROM c2 JOIN c1 ON c2.w1 = c1.w1)
    SELECT bg.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(v.bg_cnt) AS BIGINT) AS sum_bigram_df,
           CAST(MIN(v.bg_cnt) AS BIGINT) AS rarest_bigram_df,
           round(CAST(SUM(v.bg_cnt) AS DOUBLE) / SUM(v.ctx_cnt), 6) AS pooled_cond_p,
           round(MIN(CAST(v.bg_cnt AS DOUBLE) / v.ctx_cnt), 6) AS min_cond_p
    FROM bg JOIN vocab v ON bg.w1 = v.w1 AND bg.w2 = v.w2
    GROUP BY bg.doc_id
    """,
    tags=("llm", "text", "quality", "aggregation"),
    doc="Bigram-LM fluency scoring (the conditional step up from "
    "unigram_rarity_scores): each doc scored by corpus-wide bigram "
    "statistics — P(w2|w1) = C(w1 w2)/C(w1 ·) per bigram, reported as "
    "the pooled ratio-of-sums and the per-doc minimum. Log-free by "
    "design (log-space perplexity hash-drifts across libm builds; "
    "integer count sums and single IEEE divisions cannot), and "
    "ratio-of-sums instead of mean-of-ratios so no double is ever "
    "accumulated (double SUM is addition-order-dependent across "
    "partitionings; BIGINT sums are not). Bigrams come from "
    "arrays_zip(slice, slice) on the split array — no window, no "
    "per-doc shuffle. Scale shape: one shuffle for bigram counts, "
    "context counts folded from the already-aggregated c2 (partial-agg "
    "sized, not corpus sized), one vocab-side enrichment join "
    "(broadcasts while the bigram vocab is small; hash join on w1,w2 "
    "beyond that), one per-doc rollup. Low min_cond_p flags docs with "
    "never-seen-in-context transitions (garbled or TOCed text); high "
    "pooled_cond_p flags boilerplate.",
)
def bigram_cond_freq_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = widen(load_table(spark, sf_dir, "documents"))
    t = d.select("doc_id", F.split("text", " ").alias("toks"))
    bg = t.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.expr("slice(toks, 1, size(toks)-1)").alias("w1"),
                F.expr("slice(toks, 2, size(toks)-1)").alias("w2"),
            )
        ).alias("z"),
    ).select("doc_id", F.col("z.w1").alias("w1"), F.col("z.w2").alias("w2"))
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("bg_cnt"))
    c1 = c2.groupBy("w1").agg(F.sum("bg_cnt").alias("ctx_cnt"))
    vocab = c2.join(c1, "w1").select("w1", "w2", "bg_cnt", "ctx_cnt")
    return (
        bg.join(vocab, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("bg_cnt").cast("bigint").alias("sum_bigram_df"),
            F.min("bg_cnt").cast("bigint").alias("rarest_bigram_df"),
            F.round(
                F.sum("bg_cnt").cast("double") / F.sum("ctx_cnt"), 6
            ).alias("pooled_cond_p"),
            F.round(
                F.min(F.col("bg_cnt").cast("double") / F.col("ctx_cnt")), 6
            ).alias("min_cond_p"),
        )
    )


@register(
    "minhash_lsh_candidates",
    oracle=D.sql_lsh_candidate_pairs(),
    tags=("dedup", "llm", "lsh"),
    doc="MinHash(16)+LSH(4x4) candidate pairs — the sub-quadratic scale "
    "path for near-dup at 100 TB (signature scan + bucket join). FULLY "
    "oracled since r6: signatures are md5-derived (min over shingles of "
    "conv(substr(md5(seed:shingle),1,8))) and band digests are md5 of "
    "the comma-joined slice, so DuckDB rebuilds the identical signature "
    "matrix and candidate PAIR SET — the r5 rows-only status was hash "
    "plumbing (murmur3), not semantics.",
)
def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = widen(load_table(spark, sf_dir, "documents"))
    return D.lsh_candidate_pairs(d)


@register(
    "minhash_jaccard_calibration",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest({D.sql_word_shingles()}) AS shingle
      FROM documents
    ),
    mh AS (
      SELECT doc_id, g.i AS seed,
             MIN(CAST(('0x' || substr(md5(g.i || ':' || shingle), 1, 8)) AS BIGINT)) AS mh
      FROM sh CROSS JOIN generate_series(0, {D.NUM_HASHES - 1}) AS g(i)
      GROUP BY doc_id, g.i
    ),
    bands AS (
      SELECT doc_id, seed // {D.BAND_SIZE} AS band_idx,
             md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed)) AS band_hash
      FROM mh GROUP BY doc_id, seed // {D.BAND_SIZE}
    ),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    agree AS (
      SELECT c.doc_a, c.doc_b,
             SUM(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) AS n_agree
      FROM cand c
      JOIN mh ma ON ma.doc_id = c.doc_a
      JOIN mh mb ON mb.doc_id = c.doc_b AND mb.seed = ma.seed
      GROUP BY 1, 2
    ),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      GROUP BY 1, 2
    ),
    paired AS (
      SELECT a.n_agree,
             CAST(COALESCE(i.inter, 0) AS DOUBLE)
               / CAST(za.n + zb.n - COALESCE(i.inter, 0) AS DOUBLE) AS true_j
      FROM agree a
      LEFT JOIN inter i ON i.doc_a = a.doc_a AND i.doc_b = a.doc_b
      JOIN sz za ON za.doc_id = a.doc_a
      JOIN sz zb ON zb.doc_id = a.doc_b
    )
    SELECT CAST(n_agree AS INT) AS n_agree,
           COUNT(*) AS n_pairs,
           round(CAST(SUM(CAST(round(true_j, 12) AS DECIMAL(38, 12))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_true_jaccard
    FROM paired
    GROUP BY 1
    """,
    tags=("dedup", "llm", "lsh", "stats"),
    doc="Sketch CALIBRATION audit — the pre-flight check before trusting "
    "MinHash at 100 TB: for every LSH candidate pair, the signature "
    "agreement fraction (the sketch's Jaccard estimate, E[agree/16]=J) "
    "is bucketed against the TRUE shingle Jaccard, so mis-tuned "
    "num_hashes/band geometry shows up as estimate/truth divergence "
    "per bucket instead of as silent dedup over/under-reach in "
    "production. Scale shape: reuses the sub-quadratic candidate path "
    "(never all-pairs); exact intersections are computed ONLY for "
    "candidates via two equi-joins whose fan-out is candidates x "
    "shingles-per-doc (linear in candidate text mass, no df^2 shingle "
    "blow-up); the mean is DECIMAL-accumulated from IEEE-exact rational "
    "terms (the source_divergence_stats determinism construction), so "
    "the whole relation is value-oracled.",
)
def minhash_jaccard_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.operators.rank import tracked_checkpoint

    d = widen(load_table(spark, sf_dir, "documents"))
    # r13 (optimization, guide §2.4/§5): the md5-heavy signature matrix
    # feeds BOTH the candidate build and the agreement join, and the
    # exploded shingle relation feeds the size aggregate AND both sides
    # of the intersection join — checkpoint each once instead of
    # trusting ReuseExchange across differently-projected subtrees
    # (profiled 40s executor CPU ≈ 2x the signature pass + repeated
    # shingle explodes). Managed tracked checkpoints: freed at the
    # query boundary by the bench/oracle release hook.
    # r14 (guide §2.4): the signature matrix is an aggregate OVER the
    # exploded shingle relation — derive it from the checkpointed sh
    # instead of re-running the split + shingle explode (profiled: the
    # two hot stages here were both ~6s executor CPU, each one a full
    # re-shingling of the corpus; deriving sigs from sh removes one).
    sh = tracked_checkpoint(D.exploded_shingles(d))
    sigs = tracked_checkpoint(D.minhash_signatures(d, sh=sh))
    cand = D.lsh_candidate_pairs(d, sigs=sigs).select("doc_a", "doc_b")
    agree_expr = sum(
        (F.col(f"a.mh_{i}") == F.col(f"b.mh_{i}")).cast("int")
        for i in range(D.NUM_HASHES)
    )
    agree = (
        cand.join(sigs.alias("a"), F.col("doc_a") == F.col("a.doc_id"))
        .join(sigs.alias("b"), F.col("doc_b") == F.col("b.doc_id"))
        .select("doc_a", "doc_b", agree_expr.alias("n_agree"))
    )
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        cand.join(
            sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id")
        )
        .join(
            sh.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    true_j = F.coalesce(F.col("inter"), F.lit(0)).cast("double") / (
        F.col("za.n") + F.col("zb.n") - F.coalesce(F.col("inter"), F.lit(0))
    ).cast("double")
    paired = (
        agree.join(inter, ["doc_a", "doc_b"], "left")
        .join(sz.alias("za"), F.col("doc_a") == F.col("za.doc_id"))
        .join(sz.alias("zb"), F.col("doc_b") == F.col("zb.doc_id"))
        .select("n_agree", true_j.alias("true_j"))
    )
    return paired.groupBy(F.col("n_agree").cast("int").alias("n_agree")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(
            F.sum(F.round(F.col("true_j"), 12).cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_true_jaccard"),
    )


@register(
    "simhash_fingerprints",
    oracle=D.sql_simhash_table(),
    tags=("dedup", "llm"),
    doc="64-bit SimHash per doc (sign-sum of shingle-hash bits) as a "
    "16-nibble hex digest. FULLY oracled since r6: bit votes come from "
    "the nibbles of md5(shingle) instead of xxhash64, so DuckDB "
    "rebuilds the identical fingerprint string per doc.",
)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = widen(load_table(spark, sf_dir, "documents"))
    return D.simhash_table(d)


@register(
    "knn_cosine_top10",
    oracle=f"""
    WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id, e.label,
             round({S.sql_cosine('e.embedding', 'q.q_emb')}, 6) AS cos_sim
      FROM embeddings e CROSS JOIN q
    )
    SELECT vec_id, label, cos_sim, CAST(rnk AS INT) AS rnk
    FROM (SELECT *, row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rnk FROM scored)
    WHERE rnk <= {KNN_K}
    """,
    tags=("similarity", "llm", "topk"),
    doc="Brute-force cosine top-k vs query vector (vec_id=0): the exact "
    "per-bucket kernel; broadcast the query side, fold-exact arithmetic. "
    "Rounded to 6dp before ranking so the rank cut is engine-stable. "
    "Top-k via orderBy().limit(k) → TakeOrderedAndProject (distributed "
    "per-partition partial top-k, NOT a single-reducer global window); "
    "rnk is re-derived over just the k surviving rows.",
)
def knn_cosine_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    scored = e.crossJoin(F.broadcast(q)).select(
        "vec_id",
        "label",
        F.round(S.cosine("embedding", "q_emb"), 6).alias("cos_sim"),
    )
    top = scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id")).limit(KNN_K)
    w = Window.orderBy(F.col("cos_sim").desc(), F.col("vec_id"))  # over k rows only
    return top.withColumn("rnk", F.row_number().over(w))


@register(
    "embedding_near_dup_pairs",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({S.sql_cosine('a.embedding', 'b.embedding')}, 6) AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE round({S.sql_cosine('a.embedding', 'b.embedding')}, 6) >= {NEAR_DUP_COS}
    """,
    tags=("similarity", "dedup", "llm"),
    doc="Embedding-cosine near-dup pairs (threshold 0.4). Brute-force "
    "pair scan here; at scale the LSH/IVF bucketing in "
    "operators.similarity prunes candidates first. Norms are "
    "precomputed per vector; the per-pair dot is the Arrow-vectorized "
    "exact-fold kernel (see functions.similarity.pair_dot_pandas). "
    "Bounded by contract: the kernel fails fast above "
    "SPARK_GRAFT_EXACT_PAIR_MAX rows (default 50k) with a pointer at "
    "the sub-quadratic twin ann_near_dup_pairs.",
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return S.brute_force_pair_cosines(spark, e, threshold=NEAR_DUP_COS, dim=EMB_DIM)


@register(
    "dedup_cluster_resolution",
    oracle=f"""
    WITH RECURSIVE
    prs AS MATERIALIZED (
      SELECT doc_a AS va, doc_b AS vb FROM ({D.sql_lsh_candidate_pairs()})
    ),
    edges AS MATERIALIZED (
      SELECT va AS u, vb AS v FROM prs
      UNION
      SELECT vb AS u, va AS v FROM prs
    ),
    reach(u, v) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS doc_id,
           min(v) AS keeper_id,
           (min(v) = u) AS is_keeper
    FROM reach
    GROUP BY u
    """,
    tags=("dedup", "llm", "iterative"),
    doc="End-to-end dedup resolution: MinHash-LSH candidate pairs → "
    "connected components (pointer-doubling label propagation, O(log n) "
    "rounds) → every doc mapped to its cluster's min-id keeper. FULLY "
    "oracled since r6 (followed the md5 LSH rewrite for free): the "
    "oracle rebuilds the identical pair set, then expresses the same "
    "CC fixpoint as a DuckDB recursive CTE (transitive closure + "
    "min-reachable), the pattern proven on embedding_dedup_clusters.",
)
def dedup_cluster_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.operators.clustering import dedup_clusters

    d = widen(load_table(spark, sf_dir, "documents"))
    return dedup_clusters(d, D.lsh_candidate_pairs(d))


@register(
    "ann_lsh_cosine_topk",
    oracle=f"""
    WITH _sig AS ({SIM.sql_lsh_sig(dim=EMB_DIM)}),
    _qsig AS (SELECT table_idx, bucket FROM _sig WHERE vec_id = 0),
    _cand AS (
      SELECT DISTINCT s.vec_id
      FROM _sig s JOIN _qsig q
        ON s.table_idx = q.table_idx AND s.bucket = q.bucket
    ),
    _qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    _scored AS (
      SELECT e.vec_id,
             round({S.sql_cosine('e.embedding', 'q.q_emb')}, 6) AS cos_sim
      FROM embeddings e
      JOIN _cand c ON c.vec_id = e.vec_id
      CROSS JOIN _qv q
    )
    SELECT vec_id, cos_sim, CAST(rnk AS INT) AS rnk
    FROM (SELECT *, row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rnk
          FROM _scored)
    WHERE rnk <= {KNN_K}
    """,
    tags=("similarity", "llm", "ann", "lsh"),
    doc="ANN top-10 via random-hyperplane LSH bucketing + exact rerank of "
    "candidates only — the scale path where brute force is the per-bucket "
    "kernel (operators/similarity.py). FULLY oracled since r6: the "
    "md5-integer hyperplanes + floor-quantized int64 sign test make the "
    "candidate set itself engine-portable, so DuckDB rebuilds the exact "
    "bucket probe AND the rerank (fold cosine) — not just the row count. "
    "This per-call form re-hashes the corpus per query; production "
    "serving uses the stored index (operators/ann_index.py: "
    "build_lsh_index + StoredLshIndex, partition-pruned probe reads — "
    "per-query cost tracks the index slice, STORED_SERVING.json).",
)
def ann_lsh_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.operators.similarity import ann_topk

    e = load_table(spark, sf_dir, "embeddings")
    # Driver-side POINT lookup of the query vector (filter on the id
    # column → parquet min/max prunes to one row group); a production
    # caller passes the query vector in directly. Deliberate, not a
    # hidden scan (VERDICT r3 minor #3).
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    # pinned oracle geometry — production callers omit n_planes for auto sizing
    return ann_topk(spark, e, list(qvec), k=KNN_K, n_planes=SIM.DEFAULT_PLANES)


_MULTIPROBE = 2  # Hamming-1 flips per table (least-confident bits)


@register(
    "ann_multiprobe_cosine_topk",
    oracle=f"""
    WITH _sig AS ({SIM.sql_lsh_sig(dim=EMB_DIM)}),
    _probes AS ({SIM.sql_lsh_query_probes(dim=EMB_DIM, multiprobe=_MULTIPROBE)}),
    _cand AS (
      SELECT DISTINCT s.vec_id
      FROM _sig s JOIN _probes q
        ON s.table_idx = q.table_idx AND s.bucket = q.bucket
    ),
    _qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    _scored AS (
      SELECT e.vec_id,
             round({S.sql_cosine('e.embedding', 'q.q_emb')}, 6) AS cos_sim
      FROM embeddings e
      JOIN _cand c ON c.vec_id = e.vec_id
      CROSS JOIN _qv q
    )
    SELECT vec_id, cos_sim, CAST(rnk AS INT) AS rnk
    FROM (SELECT *, row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rnk
          FROM _scored)
    WHERE rnk <= {KNN_K}
    """,
    tags=("similarity", "llm", "ann", "lsh"),
    doc="Multi-probe LSH top-10 (Lv et al. restricted to 1-bit flips): "
    "each table probes its query bucket PLUS the Hamming-1 neighbors of "
    "the 2 least-confident signature bits (smallest |int64 margin|, "
    "plane-index tiebreak) — the recall knob that widens the candidate "
    "set ~3x per table WITHOUT reindexing (the signature index is "
    "unchanged; only the query-side probe set grows). Margins, flips "
    "and rerank are all exact int64/fold arithmetic, so the oracle "
    "rebuilds the identical probe set and candidate list. Recall@10 at "
    "10x measured in ann_recall_smoke.py next to the single-probe row.",
)
def ann_multiprobe_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.operators.similarity import ann_topk

    e = load_table(spark, sf_dir, "embeddings")
    # Same deliberate point lookup as ann_lsh_cosine_topk above.
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    # pinned oracle geometry — production callers omit n_planes for auto sizing
    return ann_topk(spark, e, list(qvec), k=KNN_K, multiprobe=_MULTIPROBE, n_planes=SIM.DEFAULT_PLANES)


_MULTIPROBE_2BIT = 8  # probes from the 2-bit perturbation sequence


@register(
    "ann_multiprobe2bit_cosine_topk",
    oracle=f"""
    WITH _sig AS ({SIM.sql_lsh_sig(dim=EMB_DIM)}),
    _probes AS ({SIM.sql_lsh_query_probes(dim=EMB_DIM, multiprobe=_MULTIPROBE_2BIT, multiprobe_bits=2)}),
    _cand AS (
      SELECT DISTINCT s.vec_id
      FROM _sig s JOIN _probes q
        ON s.table_idx = q.table_idx AND s.bucket = q.bucket
    ),
    _qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    _scored AS (
      SELECT e.vec_id,
             round({S.sql_cosine('e.embedding', 'q.q_emb')}, 6) AS cos_sim
      FROM embeddings e
      JOIN _cand c ON c.vec_id = e.vec_id
      CROSS JOIN _qv q
    )
    SELECT vec_id, cos_sim, CAST(rnk AS INT) AS rnk
    FROM (SELECT *, row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rnk
          FROM _scored)
    WHERE rnk <= {KNN_K}
    """,
    tags=("similarity", "llm", "ann", "lsh"),
    doc="Multi-probe LSH top-10 over the FULL Lv-et-al perturbation "
    "sequence (r9): probe sets of 1 AND 2 bits ranked by the sum of "
    "the flipped planes' |int64 margins| (ties to fewer bits, then "
    "plane order), top-8 probes per table. This is the recall knob the "
    "AUTO geometry needs at scale — sparser corpus-sized buckets "
    "exhaust the n_planes 1-bit flips, while the 2-bit sequence "
    "expresses up to n·(n+1)/2 probes per table with zero reindexing. "
    "Measured (ann_recall_smoke/X100_RECEIPT): at x10 auto geometry "
    "recall@10 0.938 vs 0.688 for the 1-bit m=2 form — above even the "
    "pinned-geometry 0.838. Margins, ranking key and flips are exact "
    "int64, so DuckDB rebuilds the identical probe set; registered at "
    "the pinned 6-plane oracle geometry like the rest of the family.",
)
def ann_multiprobe2bit_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.operators.similarity import ann_topk

    e = load_table(spark, sf_dir, "embeddings")
    # Same deliberate point lookup as ann_lsh_cosine_topk above.
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return ann_topk(
        spark, e, list(qvec), k=KNN_K,
        multiprobe=_MULTIPROBE_2BIT, multiprobe_bits=2,
        n_planes=SIM.DEFAULT_PLANES,
    )


@register(
    "ann_ivf_cosine_topk",
    oracle=SIM.sql_ivf_topk(dim=EMB_DIM, k=KNN_K),
    tags=("similarity", "llm", "ann", "ivf"),
    doc="ANN top-10 via IVF (inverted-file) lists: nearest-centroid "
    "assignment at ingest, nprobe-list probe + exact rerank at query "
    "(expected candidate fraction ≈ nprobe/n_centroids). FULLY oracled "
    "since r6 (the last ANN holdout): Lloyd training is pure INTEGER "
    "arithmetic end to end — md5 seed centroids, 2^20-quantized "
    "components, exact int64 L2 argmin with centroid-id tiebreak, and "
    "a floor-division centroid update — so DuckDB unrolls the SAME "
    "iterations as materialized CTEs (the PageRank playbook) and "
    "rebuilds assignments, probe lists and candidates cell-for-cell. "
    "The old float renormalization (the former impossibility note) is "
    "gone: on unit-norm inputs plain-mean L2 Lloyd is the textbook "
    "k-means and quality is re-measured in ann_recall_smoke.py. This "
    "per-call form retrains per query; production serving uses the "
    "stored index (operators/ann_index.py: build_ivf_index + "
    "StoredIvfIndex — lists are partition dirs, a probe reads its "
    "nprobe lists only; 9.1x over per-call at x100, STORED_SERVING.json).",
)
def ann_ivf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.operators.similarity import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    # Same deliberate point lookup as ann_lsh_cosine_topk above.
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    # pinned oracle geometry (16 centroids / 4 probes) — production
    # callers omit both for the sqrt(n) auto sizing (VERDICT r8 #2)
    return ivf_topk(spark, e, list(qvec), k=KNN_K, n_centroids=16, nprobe=4)


@register(
    "ivf_cluster_balanced_sample",
    oracle=SIM.sql_ivf_balanced_sample(dim=EMB_DIM),
    tags=("similarity", "llm", "ann", "sampling", "mixture"),
    doc="Cluster-balanced subsampling (the SemDeDup/DataComp-style "
    "diversity sampler, r7): every embedding is assigned to its "
    "integer-Lloyd IVF cluster (the SAME trained centroids the ANN "
    "index uses — one Arrow-batched assignment pass), then the "
    "md5-smallest 8 members per cluster are kept — a deterministic "
    "pseudo-random draw that equalizes cluster representation instead "
    "of letting dense regions dominate the sample. Fully value-oracled: "
    "DuckDB replays the identical training iterations "
    "(sql_ivf_balanced_sample shares the unrolled CTEs with "
    "sql_ivf_topk) and the same md5 order. Plan: the rank<=k filter "
    "over the per-cluster window compiles to WindowGroupLimit, so each "
    "map task pre-truncates to k rows per cluster BEFORE the shuffle — "
    "at 100 TB the exchange carries O(clusters x k), not the corpus.",
)
def ivf_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    assigned, _ = SIM.ivf_assign(
        e, n_centroids=16, dim=EMB_DIM, train_iters=SIM.TRAIN_ITERS
    )
    w = Window.partitionBy("centroid_id").orderBy(
        F.md5(F.concat(F.lit("bal:"), F.col("vec_id").cast("string"))), "vec_id"
    )
    return (
        assigned.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 8)
        .select(F.col("centroid_id").alias("cluster_id"), "vec_id", "rnk")
    )


@register(
    "ann_candidate_pairs",
    oracle=SIM.sql_ann_candidate_pairs(dim=EMB_DIM),
    tags=("similarity", "llm", "ann", "dedup"),
    doc="All-pairs ANN candidate generation: random-hyperplane LSH bucket "
    "self-join (operators/similarity.py:ann_candidate_pairs) — the "
    "designated 100 TB pairwise path. Never quadratic: pair fan-out is "
    "bounded by per-(table,bucket) density, and candidates then feed an "
    "exact per-pair rescore (see ann_near_dup_pairs). FULLY oracled "
    "since r6 (md5-integer hyperplanes): DuckDB rebuilds the identical "
    "signature table, the md5-ranked hot-bucket cap, and the pair set "
    "with shared-bucket counts.",
)
def ann_candidate_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.operators.similarity import ann_candidate_pairs

    e = load_table(spark, sf_dir, "embeddings")
    # pinned oracle geometry — production callers omit n_planes for auto sizing
    return ann_candidate_pairs(e, n_planes=SIM.DEFAULT_PLANES)


@register(
    "ann_candidate_pairs_incremental",
    # the fold maintains the UNCAPPED index, and fold == full rebuild
    # exactly (pinned in tests/test_merge_properties.py) — so the
    # oracle is simply the uncapped full-build pair SQL (r6)
    oracle=SIM.sql_ann_candidate_pairs(dim=EMB_DIM, max_bucket=None),
    tags=("similarity", "llm", "ann", "dedup", "incremental"),
    doc="Incremental ANN index maintenance (VERDICT r4 #5): the corpus "
    "is split into two deterministic ingest batches (md5 bucket of "
    "vec_id), batch 0 builds the stored (postings, pairs) state, and "
    "batch 1 is FOLDED in via operators/incremental.py:ann_ingest_batch "
    "— only batch 1's vectors are signature-hashed; stored history is "
    "joined through its posting lists, never rebuilt. The result is "
    "bit-identical to the full uncapped ann_candidate_pairs build "
    "(pinned incl. 3-way split invariance in tests/"
    "test_merge_properties.py). This closes the 100 TB ingest gap: "
    "adding 1 TB of embeddings costs one batch signature pass + one "
    "postings join, not a corpus-wide LSH rebuild; hot-bucket caps "
    "apply per ingest batch with ann_bucket_stats accounting.",
)
def ann_candidate_pairs_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.operators.incremental import (
        ann_ingest_batch,
        ann_pairs_state,
        lsh_postings_state,
    )

    e = load_table(spark, sf_dir, "embeddings")
    bucket = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10).cast("long") % 2
    )
    batch0 = e.filter(bucket == 0)
    batch1 = e.filter(bucket == 1)
    postings0 = lsh_postings_state(batch0)
    pairs0 = ann_pairs_state(batch0)
    _, pairs = ann_ingest_batch(postings0, pairs0, batch1)
    return pairs


@register(
    "ann_bucket_stats",
    oracle=f"""
    WITH _sig AS ({SIM.sql_lsh_sig(dim=EMB_DIM)}),
    _sizes AS (
      SELECT table_idx, bucket, COUNT(*) AS n FROM _sig GROUP BY 1, 2
    )
    SELECT table_idx,
           COUNT(*) AS n_buckets,
           CAST(MAX(n) AS BIGINT) AS max_bucket_size,
           round(AVG(n), 2) AS mean_bucket_size,
           CAST(SUM(CASE WHEN n > 1024 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_capped_buckets
    FROM _sizes GROUP BY table_idx
    """,
    tags=("similarity", "llm", "ann", "observability"),
    doc="Posting-list accounting for the ANN candidate path ('no silent "
    "caps'): per hash table, bucket count, max/mean bucket size, and "
    "how many buckets exceeded the hot-bucket cap and were hash-sampled "
    "down before pair expansion. The observability companion a 100 TB "
    "dedup run consults to know whether the cap is biting.",
)
def ann_bucket_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.operators.similarity import ann_bucket_stats

    e = load_table(spark, sf_dir, "embeddings")
    # pinned oracle geometry — production callers omit n_planes for auto sizing
    return ann_bucket_stats(e, n_planes=SIM.DEFAULT_PLANES)


@register(
    "ann_near_dup_pairs",
    oracle=f"""
    WITH _cand AS ({SIM.sql_ann_candidate_pairs(dim=EMB_DIM)})
    SELECT c.vec_a, c.vec_b,
           round({S.sql_cosine('a.embedding', 'b.embedding')}, 6) AS cos_sim
    FROM _cand c
    JOIN embeddings a ON a.vec_id = c.vec_a
    JOIN embeddings b ON b.vec_id = c.vec_b
    WHERE round({S.sql_cosine('a.embedding', 'b.embedding')}, 6) >= {NEAR_DUP_COS}
    """,
    tags=("similarity", "llm", "ann", "dedup"),
    doc="Bucketed near-dup pairs: LSH candidate pairs → exact-fold cosine "
    "rescore of candidates only (JVM fold, same rounding as the oracled "
    "exact kernel) → threshold. This is the sub-quadratic 100 TB "
    "substitute for embedding_near_dup_pairs: identical scoring on the "
    "pairs it sees, with candidate recall traded for never scoring "
    "O(n^2) pairs. Both equi-joins back to embeddings shuffle on vec_id.",
)
def ann_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return _ann_rescored_pairs(e)


def _ann_rescored_pairs(e: DataFrame, n_planes: int | None = -1) -> DataFrame:
    """LSH candidate pairs → exact-fold rescore → threshold: the shared
    sub-quadratic pair stage for ann_near_dup_pairs and the ANN-fed
    cluster/keeper queries below. ``n_planes`` defaults to the PINNED
    oracle geometry (registered queries must be engine-deterministic);
    pass ``None`` explicitly for the production auto sizing
    (recommended_planes — x100_receipt.py measures that leg).

    Per-vector norms via the JVM fold (n rows, cheap); the PER-PAIR
    dot via the Arrow-batched exact-fold kernel — the interpreted HOF
    fold costs ~2.8µs/element and dominates on pair-shaped workloads
    (SCALE_NOTES: 62s vs 2.3s on 2M pairs). Same IEEE addition order,
    so scores stay bit-identical to the exact kernel (pinned by
    test_ann_near_dup_is_exact_subset_with_recall_floor).
    """
    from hbacker_spark.operators.similarity import ann_candidate_pairs

    if n_planes == -1:  # sentinel: pinned oracle geometry
        n_planes = SIM.DEFAULT_PLANES
    cand = ann_candidate_pairs(e, n_planes=n_planes).select("vec_a", "vec_b")
    ea = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("_ea"),
        S.norm("embedding").alias("_na"),
    )
    eb = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("_eb"),
        S.norm("embedding").alias("_nb"),
    )
    pair_dot = S.pair_dot_pandas()
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(pair_dot("_ea", "_eb") / (F.col("_na") * F.col("_nb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= NEAR_DUP_COS)
    )


@register(
    "ann_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE
    prs AS MATERIALIZED (
      SELECT c.vec_a AS va, c.vec_b AS vb
      FROM ({SIM.sql_ann_candidate_pairs(dim=EMB_DIM)}) c
      JOIN embeddings a ON a.vec_id = c.vec_a
      JOIN embeddings b ON b.vec_id = c.vec_b
      WHERE round({S.sql_cosine('a.embedding', 'b.embedding')}, 6) >= {NEAR_DUP_COS}
    ),
    edges AS MATERIALIZED (
      SELECT va AS u, vb AS v FROM prs
      UNION
      SELECT vb AS u, va AS v FROM prs
    ),
    reach(u, v) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS vec_id,
           min(v) AS keeper_id,
           (min(v) = u) AS is_keeper
    FROM reach
    GROUP BY u
    """,
    tags=("dedup", "llm", "iterative", "similarity", "ann"),
    doc="The 100 TB dedup-clustering route end-to-end (VERDICT r3 #1): "
    "LSH candidate pairs (bucketed posting lists, never quadratic) → "
    "exact-fold cosine rescore of candidates only → connected "
    "components → min-id keeper. Same output contract as the oracled "
    "embedding_dedup_clusters, which stays registered as the exactness "
    "anchor; this form replaces its O(n²) all-pairs kernel with the "
    "sub-quadratic candidate path, so total FLOPs scale with candidate "
    "count (bucket-density-bounded), not corpus².",
)
def ann_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.operators.clustering import dedup_clusters

    e = load_table(spark, sf_dir, "embeddings")
    pairs = _ann_rescored_pairs(e).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    return dedup_clusters(e, pairs, id_col="vec_id")


@register(
    "ann_keeper_by_quality",
    oracle=f"""
    WITH RECURSIVE
    prs AS MATERIALIZED (
      SELECT c.vec_a AS va, c.vec_b AS vb
      FROM ({SIM.sql_ann_candidate_pairs(dim=EMB_DIM)}) c
      JOIN embeddings a ON a.vec_id = c.vec_a
      JOIN embeddings b ON b.vec_id = c.vec_b
      WHERE round({S.sql_cosine('a.embedding', 'b.embedding')}, 6) >= {NEAR_DUP_COS}
    ),
    edges AS MATERIALIZED (
      SELECT va AS u, vb AS v FROM prs
      UNION
      SELECT vb AS u, va AS v FROM prs
    ),
    reach(u, v) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    comp AS MATERIALIZED (SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u),
    m AS (
      SELECT c.doc_id, c.component, d.n_chars
      FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    ),
    k AS (
      SELECT component, doc_id AS keeper_id
      FROM (SELECT component, doc_id,
                   row_number() OVER (PARTITION BY component
                                      ORDER BY n_chars DESC, doc_id) AS rn
            FROM m)
      WHERE rn = 1
    )
    SELECT m.doc_id, k.keeper_id, (m.doc_id = k.keeper_id) AS is_keeper
    FROM m JOIN k USING (component)
    """,
    tags=("dedup", "llm", "iterative", "similarity", "quality", "ann"),
    doc="Quality-aware semantic dedup on the sub-quadratic path (VERDICT "
    "r3 #1): LSH candidates → exact rescore → connected components → "
    "keeper = highest-n_chars doc per cluster (ties to min doc_id). "
    "Mirrors the oracled semantic_keeper_by_quality exactly except for "
    "the pair stage, which is the bucketed candidate path instead of "
    "the O(n²) block-matrix kernel.",
)
def ann_keeper_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # same membership domain as the oracled exact twin: embedded docs
    # only (see semantic_keeper_by_quality — r6 sf0.1 sweep finding)
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .join(e.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_semi")
    )
    pairs = _ann_rescored_pairs(e).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    return _keeper_by_quality(d, pairs)


@register(
    "ann_cluster_validity",
    oracle=f"""
    WITH RECURSIVE
    prs AS MATERIALIZED (
      SELECT c.vec_a AS va, c.vec_b AS vb,
             round({S.sql_cosine('a.embedding', 'b.embedding')}, 6) AS cos
      FROM ({SIM.sql_ann_candidate_pairs(dim=EMB_DIM)}) c
      JOIN embeddings a ON a.vec_id = c.vec_a
      JOIN embeddings b ON b.vec_id = c.vec_b
      WHERE round({S.sql_cosine('a.embedding', 'b.embedding')}, 6) >= {NEAR_DUP_COS}
    ),
    edges AS MATERIALIZED (
      SELECT va AS u, vb AS v FROM prs
      UNION
      SELECT vb AS u, va AS v FROM prs
    ),
    reach(u, v) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    comp AS MATERIALIZED (SELECT u AS vec_id, min(v) AS cluster_id FROM reach GROUP BY u),
    sizes AS (
      SELECT cluster_id, COUNT(*) AS size
      FROM comp GROUP BY cluster_id HAVING COUNT(*) >= 2
    ),
    pc AS (
      SELECT cm.cluster_id, p.cos
      FROM prs p JOIN comp cm ON cm.vec_id = p.va
    )
    SELECT s.cluster_id, s.size,
           COUNT(*) AS n_pairs_observed,
           (COUNT(*) * 2 < s.size * (s.size - 1)) AS chain_risk,
           round(MIN(p.cos), 6) AS min_pair_cos,
           round(CAST(SUM(CAST(round(p.cos, 12) AS DECIMAL(38, 12))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_pair_cos
    FROM sizes s JOIN pc p USING (cluster_id)
    GROUP BY s.cluster_id, s.size
    """,
    tags=("dedup", "llm", "similarity", "ann", "stats"),
    doc="Cluster-VALIDITY audit for the transitive-closure dedup route — "
    "the 'did CC over-merge?' receipt a curation run checks before "
    "dropping non-keepers: per multi-member cluster, the member count, "
    "how many scored pairs actually support it, chain_risk (true when "
    "observed pairs < the clique's pair count — the cluster is held "
    "together by a CHAIN of links, transitive closure's known "
    "over-merge mode), and min/mean observed pair cosine (a low min in "
    "a merged cluster = two barely-linked neighborhoods). Reuses the "
    "oracled sub-quadratic machinery end to end (candidates → exact "
    "rescore → CC), adds only cluster-sized aggregation; means use the "
    "DECIMAL(38,12) order-independent accumulation.",
)
def ann_cluster_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.operators.clustering import dedup_clusters
    from hbacker_spark.operators.rank import tracked_checkpoint

    e = load_table(spark, sf_dir, "embeddings")
    # the rescored pair relation feeds BOTH the CC edges and the
    # per-cluster stats join — checkpoint it once or the whole
    # LSH-candidate + Arrow-rescore pipeline executes twice. At sf0.1
    # the query is CC-round/job-floor-bound (~5 s either way), but at
    # the 10x replica — where the rescore is data-bound — this is
    # 120 s -> 52 s (r7, noop-sink runs)
    pairs = tracked_checkpoint(_ann_rescored_pairs(e))
    clusters = dedup_clusters(
        e, pairs.select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")),
        id_col="vec_id",
    )
    comp = clusters.select("vec_id", F.col("keeper_id").alias("cluster_id"))
    sizes = (
        comp.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("size"))
        .filter(F.col("size") >= 2)
    )
    pc = pairs.join(comp, pairs.vec_a == comp.vec_id).select("cluster_id", "cos_sim")
    stats = pc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_pairs_observed"),
        F.round(F.min("cos_sim"), 6).alias("min_pair_cos"),
        F.round(
            F.sum(F.round(F.col("cos_sim"), 12).cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_pair_cos"),
    )
    return sizes.join(stats, "cluster_id").select(
        "cluster_id",
        "size",
        "n_pairs_observed",
        (F.col("n_pairs_observed") * 2 < F.col("size") * (F.col("size") - 1)).alias(
            "chain_risk"
        ),
        "min_pair_cos",
        "mean_pair_cos",
    )


def _keeper_by_quality(d: DataFrame, pairs: DataFrame) -> DataFrame:
    """components → quality keeper (max n_chars, ties min id) → membership."""
    from hbacker_spark.operators.clustering import connected_components
    from hbacker_spark.operators.rank import tracked_checkpoint

    comps = connected_components(pairs).withColumnRenamed("node", "doc_id")
    # membership feeds the keeper aggregate AND the final join —
    # checkpoint it once so the corpus scan + label join doesn't
    # execute twice (the triangle-count subtree-reuse pattern, r7)
    membership = tracked_checkpoint(
        d.join(comps, "doc_id", "left").withColumn(
            "component", F.coalesce("component", F.col("doc_id"))
        )
    )
    keepers = membership.groupBy("component").agg(
        F.max_by("doc_id", F.struct(F.col("n_chars"), -F.col("doc_id"))).alias("keeper_id")
    )
    return membership.join(keepers, "component").select(
        "doc_id",
        "keeper_id",
        (F.col("doc_id") == F.col("keeper_id")).alias("is_keeper"),
    )


@register(
    "props_map_keys",
    oracle="""
    SELECT event_type, key, COUNT(*) AS n
    FROM (
      SELECT event_type, unnest(json_keys(props)) AS key FROM events
    )
    GROUP BY event_type, key
    """,
    tags=("json", "map", "array"),
    doc="JSON → MapType → explode(map_keys): per-event_type property-key "
    "histogram (the array/map function surface over semi-structured "
    "props).",
)
def props_map_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    keys = e.select(
        "event_type",
        F.explode(F.map_keys(F.from_json("props", "map<string,string>"))).alias("key"),
    )
    return keys.groupBy("event_type", "key").agg(F.count(F.lit(1)).alias("n"))


@register(
    "text_quality_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(len(regexp_extract_all(text, '{TX.TOKEN_PATTERN}')) AS BIGINT) AS n_tokens,
           round(CAST({TX.sql_stopword_count('text')} AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS stopword_ratio,
           {TX.sql_rolling_fingerprint('text')} AS fingerprint
    FROM documents
    """,
    tags=("text", "llm"),
    doc="Per-doc quality stats: word/token counts, stopword ratio, "
    "rolling-hash fingerprint — all codegen'd expressions, no UDF.",
)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = widen(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        TX.n_words().alias("n_words"),
        TX.n_tokens().alias("n_tokens"),
        F.round(TX.stopword_count().cast("double") / TX.n_words(), 6).alias("stopword_ratio"),
        TX.rolling_fingerprint().alias("fingerprint"),
    )


@register(
    "tfidf_top_terms",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tokens GROUP BY doc_id, token),
    dfreq AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY token),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token,
             round(tf.tf * ln((n.n_docs + 1.0) / (dfreq.df + 1.0)), 6) AS tfidf
      FROM tf JOIN dfreq USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tfidf, CAST(rnk AS INT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rnk
          FROM scored)
    WHERE rnk <= 5
    """,
    tags=("text", "llm", "tfidf"),
    doc="TF-IDF top-5 terms per doc, pure DataFrame ops: explode tokens → "
    "tf per (doc,term) → document frequency → smoothed idf → rank-limit "
    "window. At scale: one shuffle on token, one on doc_id; the doc "
    "count is a 1-row aggregate broadcast-cross-joined in — ONE plan, "
    "no separate driver-side count() job. Rounded to 6dp before ranking "
    "so the rank cut is engine-stable (ln() ulps).",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = widen(load_table(spark, sf_dir, "documents"))
    tokens = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tokens.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tokens.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))  # 1-row agg, broadcast side
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.round(F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 5)


@register(
    "array_token_overlap",
    oracle="""
    WITH halves AS (
      SELECT doc_id,
             string_split(text, ' ') AS w,
             CAST(floor(len(string_split(text, ' ')) / 2) AS INT) AS h
      FROM documents
    )
    SELECT doc_id,
           CAST(len(list_intersect(w[1:h], w[h+1:len(w)])) AS INT) AS n_common,
           CAST(len(list_distinct(list_concat(w[1:h], w[h+1:len(w)]))) AS INT) AS n_union
    FROM halves
    """,
    tags=("array", "llm"),
    doc="Array set functions (array_intersect/array_union — S10's "
    "`exported & requested` as engine ops, import.rb:56-63): vocabulary "
    "overlap between each doc's halves. Sizes compared, not arrays — "
    "set-result ordering is engine-specific.",
)
def array_token_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    halved = d.select(
        "doc_id",
        F.split("text", " ").alias("w"),
        F.floor(F.size(F.split("text", " ")) / 2).cast("int").alias("h"),
    )
    first = F.expr("slice(w, 1, h)")
    second = F.expr("slice(w, h + 1, size(w) - h)")
    return halved.select(
        "doc_id",
        F.size(F.array_intersect(first, second)).cast("int").alias("n_common"),
        F.size(F.array_union(first, second)).cast("int").alias("n_union"),
    )


@register(
    "pack_token_budget",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(len(regexp_extract_all(text, '{TX.TOKEN_PATTERN}')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    runs AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      FROM toks
    )
    SELECT doc_id, lang, n_tokens,
           CAST(floor((cum_tokens - n_tokens) / 2048) AS BIGINT) AS pack_id
    FROM runs
    """,
    tags=("llm", "packing", "window"),
    doc="Sequence packing: assign docs (in deterministic doc_id order, "
    "per lang) to fixed ~2048-token training packs via an exact running "
    "sum — the window shape of context-window packing. One shuffle on "
    "the partition key; integer-exact, fully oracled.",
)
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang", TX.n_tokens().alias("n_tokens"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return runs.select(
        "doc_id",
        "lang",
        "n_tokens",
        # floor() on both sides: CAST(double AS BIGINT) truncates in Spark
        # but ROUNDS in DuckDB — never cast a quotient directly
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / 2048).cast("bigint").alias("pack_id"),
    )


@register(
    "mixture_interleave",
    oracle="""
    SELECT doc_id, source,
           CAST(rn AS INT) AS source_pos,
           CAST(row_number() OVER (ORDER BY rn, source, doc_id) AS BIGINT) AS mixture_pos
    FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    )
    """,
    tags=("llm", "mixture", "window"),
    doc="Deterministic mixture interleave: round-robin across sources "
    "(position-within-source, then source) — the data-mixing order for "
    "multi-source training runs. The oracle states it as a full-corpus "
    "row_number, but the engine never runs that single-reducer sort "
    "(VERDICT r4 #1): because (rn, source) is a UNIQUE key, the global "
    "rank has a closed form from per-source counts alone — "
    "mixture_pos = sum_s min(cnt_s, rn-1) + |{s <= source : cnt_s >= rn}| "
    "(rows from every source that sit in earlier round-robin rounds, "
    "plus same-round sources at or before this one). Per-source counts "
    "are a sources-sized aggregate broadcast as ONE row; the only "
    "data-sized shuffle is the per-source window. Scales to any corpus "
    "— no unpartitioned Window in the plan.",
)
def mixture_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w_src = Window.partitionBy("source").orderBy("doc_id")
    ranked = (
        d.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w_src))
    )
    # sources-sized aggregate, folded to a single broadcast row
    sc = (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("source").alias("s"), F.col("cnt").alias("c")))
            ).alias("sc")
        )
    )
    rn_1 = (F.col("rn") - F.lit(1)).cast("bigint")
    pos = F.aggregate(
        F.col("sc"),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc
        + F.least(x["c"], rn_1)
        + F.when((x["s"] <= F.col("source")) & (x["c"] >= F.col("rn")), 1).otherwise(0),
    )
    return ranked.join(F.broadcast(sc)).select(
        "doc_id",
        "source",
        F.col("rn").cast("int").alias("source_pos"),
        pos.alias("mixture_pos"),
    )


@register(
    "hash_sample_per_source",
    oracle="""
    SELECT doc_id, source, lang, rn
    FROM (
      SELECT doc_id, source, lang,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(doc_id || ':42'), doc_id) AS rn
      FROM documents
    )
    WHERE rn <= 20
    """,
    tags=("llm", "sampling", "window"),
    doc="Reproducible per-stratum sampling: order docs inside each source "
    "by md5(doc_id || ':' || seed) and keep the first 20 — a "
    "deterministic 'random' sample that is stable across runs, "
    "partitionings, cluster sizes, AND engines (md5 hex ordering is "
    "identical everywhere, making this fully oracled — upgraded from "
    "the rows-only xxhash64 form; swap xxhash64 back in at 100 TB if "
    "the md5 cost on the sort key ever shows up, the semantics are "
    "unchanged). The scale-safe way to draw fixed-size training "
    "subsets per bucket; rank-limit compiles to WindowGroupLimit.",
)
def hash_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":42"))), F.col("doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "source", "lang", "rn")
    )


_SAMPLE_FRACTIONS = {"en": 0.5, "es": 0.3, "de": 0.3, "fr": 0.2, "zh": 0.2}


@register(
    "stratified_sample_fractions",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_rows, TRUE AS within_band
    FROM documents
    WHERE lang IN ({", ".join(repr(k) for k in sorted(_SAMPLE_FRACTIONS))})
    GROUP BY lang
    """,
    tags=("llm", "sampling"),
    doc="Native stratified sampling (sampleBy): per-language fractions "
    "with a fixed seed — the built-in fraction-based path (the "
    "hash-sample query above is the fixed-size deterministic variant). "
    "Oracled in ERROR-BAND form since r6 (the approx_percentile/HLL "
    "pattern): the Bernoulli draw itself uses Spark's internal RNG and "
    "is not SQL-rebuildable, but its CONTRACT is — each stratum's "
    "sampled count must sit within 5 sigma + 5 of Binomial(n_s, f_s) "
    "(P(miss) < 1e-6 per stratum, and the fixed seed makes the draw "
    "deterministic per dataset, so the check is stable, not flaky). "
    "The emitted relation is (lang, exact n_rows, within_band) and the "
    "oracle states the contract as TRUE literals over the exact "
    "per-stratum counts — a sampler regression (wrong fraction, "
    "double-draw, stratum leak) flips the boolean and hash-fails.",
)
def stratified_sample_fractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    langs = sorted(_SAMPLE_FRACTIONS)
    sampled = (
        d.sampleBy("lang", _SAMPLE_FRACTIONS, seed=42)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    totals = (
        d.filter(F.col("lang").isin(langs))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    frac = F.element_at(
        F.create_map(*[F.lit(x) for k in langs for x in (k, _SAMPLE_FRACTIONS[k])]),
        F.col("lang"),
    )
    expected = frac * F.col("n_rows")
    band = F.lit(5.0) * F.sqrt(F.col("n_rows") * frac * (F.lit(1.0) - frac)) + F.lit(5.0)
    return (
        totals.join(sampled, "lang", "left")
        .select(
            "lang",
            "n_rows",
            (
                F.abs(F.coalesce(F.col("n_sampled"), F.lit(0)) - expected) <= band
            ).alias("within_band"),
        )
    )


@register(
    "pipeline_clean_corpus",
    oracle=f"""
    WITH stats AS (
      SELECT doc_id, lang, source, n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(len(regexp_extract_all(text, '{TX.TOKEN_PATTERN}')) AS BIGINT) AS n_tokens,
             CAST({TX.sql_stopword_count('text')} AS DOUBLE)
               / len(string_split(text, ' ')) AS stopword_ratio,
             row_number() OVER (PARTITION BY text ORDER BY doc_id) AS dup_rank
      FROM documents
    )
    SELECT doc_id, lang, source, n_tokens,
           round(stopword_ratio, 6) AS stopword_ratio
    FROM stats
    WHERE lang IN ('en', 'es', 'de')
      AND dup_rank = 1
      AND n_words BETWEEN 10 AND 500
      AND n_chars >= 50
      AND stopword_ratio >= 0.05
    """,
    tags=("llm", "pipeline", "text", "dedup"),
    doc="End-to-end training-corpus cleaning as ONE declarative plan: "
    "language allowlist -> exact-dedup keeper (deterministic first-wins "
    "window) -> length/char/stopword quality gates -> token counts. "
    "Catalyst fuses the filters; the only shuffle is the dedup window on "
    "the content key.",
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy("doc_id")
    stats = d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        TX.n_words().alias("n_words"),
        TX.n_tokens().alias("n_tokens"),
        (TX.stopword_count().cast("double") / TX.n_words()).alias("stopword_ratio"),
        F.row_number().over(w).alias("dup_rank"),
    )
    return (
        stats.filter(
            F.col("lang").isin("en", "es", "de")
            & (F.col("dup_rank") == 1)
            & F.col("n_words").between(10, 500)
            & (F.col("n_chars") >= 50)
            & (F.col("stopword_ratio") >= 0.05)
        )
        .select("doc_id", "lang", "source", "n_tokens", F.round("stopword_ratio", 6).alias("stopword_ratio"))
    )


@register(
    "pipeline_pretraining_corpus",
    oracle=f"""
    WITH stats AS (
      SELECT doc_id, lang, source, n_chars, text,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(len(regexp_extract_all(text, '{TX.TOKEN_PATTERN}')) AS BIGINT) AS n_tokens,
             CAST({TX.sql_stopword_count('text')} AS DOUBLE)
               / len(string_split(text, ' ')) AS stopword_ratio,
             row_number() OVER (PARTITION BY text ORDER BY doc_id) AS dup_rank
      FROM documents
      WHERE source <> 'src0'
    ),
    gated AS (
      SELECT * FROM stats
      WHERE lang IN ('en', 'es', 'de')
        AND dup_rank = 1
        AND n_words BETWEEN 10 AND 500
        AND n_chars >= 50
        AND stopword_ratio >= 0.05
    ),
    ev AS (
      SELECT DISTINCT unnest({D.sql_word_shingles('text')}) AS shingle
      FROM documents WHERE source = 'src0'
    ),
    contam AS (
      SELECT g.doc_id,
             COUNT(*) AS n_shingles,
             SUM(CASE WHEN ev.shingle IS NOT NULL THEN 1 ELSE 0 END) AS n_eval_hits
      FROM (SELECT doc_id, unnest({D.sql_word_shingles('text')}) AS shingle
            FROM documents WHERE source <> 'src0') g
      LEFT JOIN ev ON g.shingle = ev.shingle
      GROUP BY g.doc_id
    )
    SELECT g.doc_id, g.lang, g.source, g.n_tokens,
           round(g.stopword_ratio, 6) AS stopword_ratio,
           CASE WHEN CAST(('0x' || substr(md5(CAST(g.doc_id AS VARCHAR) || ':split'), 1, 8)) AS BIGINT)
                     % 100 < 95
                THEN 'train' ELSE 'val' END AS split
    FROM gated g JOIN contam c ON g.doc_id = c.doc_id
    WHERE c.n_eval_hits * 20 < c.n_shingles
    """,
    tags=("llm", "pipeline", "text", "dedup", "contamination", "sampling"),
    doc="The full pretraining-corpus build as ONE declarative plan — the "
    "'switch to this engine' capstone composing the stage queries: "
    "language allowlist -> exact-dedup keeper (first-wins window) -> "
    "length/char/stopword quality gates -> benchmark decontamination "
    "(drop docs with >=5% eval-shingle overlap vs the src0 eval set, "
    "same integer-exact rule as contamination_ngram_overlap) -> "
    "deterministic md5 train/val split (95/5, engine- and "
    "partitioning-stable like md5_deterministic_sample). Catalyst "
    "fuses the scalar gates into the scan; the plan's shuffles are "
    "exactly the three the semantics require (dedup window on text, "
    "per-doc contamination rollup, none for the split), and the eval "
    "vocabulary joins broadcast. The contamination rollup is derived "
    "from the RAW corpus, not from the gated relation: per-doc overlap "
    "doesn't depend on gating, and deriving it from gated would "
    "replicate the dedup-window subplan (different column pruning per "
    "branch defeats exchange reuse), shuffling the corpus text twice. "
    "This shape keeps one window shuffle + one rollup shuffle, each "
    "over a single scan. The n_words >= 10 gate guarantees every "
    "surviving doc has shingles, so the final inner join drops "
    "nothing spuriously.",
)
def pipeline_pretraining_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13: widen — the regex tokenization / stopword / shingle columns
    # are computed on the SCAN side (plan: Project below the dup-window
    # exchange), so a single-split source runs the whole per-row text
    # pass in one task (profiled: one 8.5s-CPU task); no-op on
    # multi-split production inputs.
    d = widen(load_table(spark, sf_dir, "documents"))
    corpus = d.filter(F.col("source") != "src0")
    w = Window.partitionBy("text").orderBy("doc_id")
    stats = corpus.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        "text",
        TX.n_words().alias("n_words"),
        TX.n_tokens().alias("n_tokens"),
        (TX.stopword_count().cast("double") / TX.n_words()).alias("stopword_ratio"),
        F.row_number().over(w).alias("dup_rank"),
    )
    gated = stats.filter(
        F.col("lang").isin("en", "es", "de")
        & (F.col("dup_rank") == 1)
        & F.col("n_words").between(10, 500)
        & (F.col("n_chars") >= 50)
        & (F.col("stopword_ratio") >= 0.05)
    )
    ev = (
        d.filter(F.col("source") == "src0")
        .select(F.explode(D.word_shingles("text")).alias("shingle"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    g_sh = corpus.select("doc_id", F.explode(D.word_shingles("text")).alias("shingle"))
    contam = (
        g_sh.join(F.broadcast(ev), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0)).alias("n_eval_hits"),
        )
    )
    split_bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":split"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 100
    )
    return (
        gated.join(contam, "doc_id")
        .filter(F.col("n_eval_hits") * 20 < F.col("n_shingles"))
        .select(
            "doc_id",
            "lang",
            "source",
            "n_tokens",
            F.round("stopword_ratio", 6).alias("stopword_ratio"),
            F.when(split_bucket < 95, "train").otherwise("val").alias("split"),
        )
    )


@register(
    "corpus_lang_profile",
    oracle=f"""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS total_words,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           CAST(SUM(CASE WHEN {TX.sql_lang_guess('text')} = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_guess_match
    FROM documents
    GROUP BY lang, source
    """,
    tags=("text", "llm", "aggregation"),
    doc="Corpus profile per (lang, source) + heuristic lang-ID agreement.",
)
def corpus_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    guess_match = F.when(TX.lang_guess() == F.col("lang"), 1).otherwise(0)
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(TX.n_words()).alias("total_words"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        F.sum(guess_match).alias("n_guess_match"),
    )


@register(
    "contamination_ngram_overlap",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, source, unnest({D.sql_word_shingles('text')}) AS shingle
      FROM documents
    ),
    ev AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
    corpus AS (SELECT doc_id, shingle FROM sh WHERE source <> 'src0')
    SELECT c.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN ev.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_eval_hits,
           (CAST(SUM(CASE WHEN ev.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 20
              >= COUNT(*)) AS contaminated
    FROM corpus c LEFT JOIN ev ON c.shingle = ev.shingle
    GROUP BY c.doc_id
    """,
    tags=("llm", "dedup", "contamination", "join"),
    doc="Benchmark-contamination check: per corpus doc, how many of its "
    "3-shingles appear in the eval set's shingle vocabulary (here: docs "
    "from source 'src0' stand in for a held-out benchmark). The eval "
    "vocabulary is small by construction (benchmarks are) → broadcast "
    "hash join against the exploded corpus, one shuffle on doc_id for "
    "the count. Contamination flag is integer-exact (hits*20 >= total, "
    "i.e. >=5% overlap) — no float threshold to drift between engines.",
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = widen(load_table(spark, sf_dir, "documents"))
    sh = d.select("doc_id", "source", F.explode(D.word_shingles("text")).alias("shingle"))
    ev = sh.filter(F.col("source") == "src0").select("shingle").distinct()
    corpus = sh.filter(F.col("source") != "src0")
    hit = F.when(F.col("_hit").isNotNull(), 1).otherwise(0)
    return (
        corpus.join(F.broadcast(ev.withColumn("_hit", F.lit(1))), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(hit).cast("bigint").alias("n_eval_hits"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_eval_hits",
            (F.col("n_eval_hits") * 20 >= F.col("n_shingles")).alias("contaminated"),
        )
    )


# Bloom-filter geometry (bloom_decontamination_probe). 32 usable bits
# per BIGINT word: DuckDB's `<<` overflows at bit 63 and signed-bit
# parity is fragile, so the bitset packs 32 bits/word — the word count
# doubles, the semantics stay engine-exact. m sizes with the EVAL set
# (benchmarks are ~MBs even when the corpus is 100 TB); at k=3 the FPR
# is ~(1-e^{-3n/m})^3, pinned against the exact join in
# tests/test_sampling.py.
BLOOM_WORDS = 8192  # -> m = 262144 bits
BLOOM_K = 3


@register(
    "bloom_decontamination_probe",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, source, unnest({D.sql_word_shingles('text')}) AS shingle
      FROM documents
    ),
    ev AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
    evh AS (
      SELECT CAST(('0x' || substr(md5(g.j || ':' || shingle), 1, 8)) AS BIGINT)
               % {BLOOM_WORDS * 32} AS idx
      FROM ev CROSS JOIN generate_series(0, {BLOOM_K - 1}) AS g(j)
    ),
    bitset AS (
      SELECT idx // 32 AS word,
             bit_or(1::BIGINT << CAST(idx % 32 AS INT)) AS bits
      FROM evh GROUP BY 1
    ),
    probes AS (
      SELECT doc_id, shingle,
             CAST(('0x' || substr(md5(g.j || ':' || shingle), 1, 8)) AS BIGINT)
               % {BLOOM_WORDS * 32} AS idx
      FROM sh CROSS JOIN generate_series(0, {BLOOM_K - 1}) AS g(j)
      WHERE source <> 'src0'
    ),
    shingle_hits AS (
      SELECT doc_id, shingle,
             MIN(CASE WHEN b.bits IS NOT NULL
                       AND ((b.bits >> CAST(p.idx % 32 AS INT)) & 1) = 1
                 THEN 1 ELSE 0 END) AS maybe
      FROM probes p LEFT JOIN bitset b ON p.idx // 32 = b.word
      GROUP BY doc_id, shingle
    )
    SELECT doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(maybe) AS BIGINT) AS n_maybe_hits,
           (SUM(maybe) * 20 >= COUNT(*)) AS flagged
    FROM shingle_hits
    GROUP BY doc_id
    """,
    tags=("llm", "dedup", "contamination", "sketch"),
    doc="Bloom-filter decontamination: the constant-state twin of "
    "contamination_ngram_overlap. The eval set's shingle vocabulary is "
    "folded into a 262144-bit Bloom bitset (k=3 md5-derived probes, "
    "bit_or-aggregated BIGINT words — portable, so DuckDB rebuilds the "
    "bit-identical filter), and every corpus shingle probes the bitset "
    "instead of joining the vocabulary. Never a false negative (every "
    "exact hit is a bloom hit — superset property pinned in tests), "
    "small bounded FPR. The 100 TB story: the broadcast is <= "
    "8192 rows (~100 KB) REGARDLESS of eval vocabulary size, the "
    "filter is mergeable (bit_or of bitsets = bitset of the union, "
    "same associativity as the HLL/CMS rollups), and the probe side "
    "is one broadcast join on the word index + two doc-local "
    "aggregations — the eval set itself never ships to the executors, "
    "which also matters when benchmark text must not co-locate with "
    "training data. The k-seed explode does NOT triple the shuffle: "
    "partial aggregation collapses the k rows per (doc, shingle) "
    "map-side before the exchange (same task, same key). The "
    "alternative — k probe positions as columns through k aliased "
    "broadcast joins — measured ~1.6x SLOWER at sf0.1 AND at 10x "
    "(aliasing defeats exchange reuse, so the k broadcasts rebuild "
    "the bitset subplan, and wider rows buy nothing the combiner "
    "wasn't already providing). Flag threshold is the same "
    "integer-exact >=5% rule as the exact twin.",
)
def bloom_decontamination_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = BLOOM_WORDS * 32
    d = widen(load_table(spark, sf_dir, "documents"))
    sh = d.select("doc_id", "source", F.explode(D.word_shingles("text")).alias("shingle"))
    seeds = F.explode(F.array([F.lit(j) for j in range(BLOOM_K)])).alias("j")

    def bit_idx():
        h = F.md5(
            F.concat(F.col("j").cast("string"), F.lit(":"), F.col("shingle")).cast("binary")
        )
        return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m).alias("idx")

    ev = sh.filter(F.col("source") == "src0").select("shingle").distinct()
    bitset = (
        ev.select("shingle", seeds)
        .select(bit_idx())
        .select(
            F.expr("idx div 32").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(idx % 32 AS INT))").alias("_b"),
        )
        .groupBy("word")
        .agg(F.bit_or("_b").alias("bits"))
    )
    probes = (
        sh.filter(F.col("source") != "src0")
        .select("doc_id", "shingle", seeds)
        .select("doc_id", "shingle", bit_idx())
        .withColumn("word", F.expr("idx div 32"))
    )
    hit = F.when(
        F.col("bits").isNotNull()
        & (F.expr("(bits >> CAST(idx % 32 AS INT)) & 1") == 1),
        1,
    ).otherwise(0)
    shingle_hits = (
        probes.join(F.broadcast(bitset), "word", "left")
        .select("doc_id", "shingle", hit.alias("_hit"))
        .groupBy("doc_id", "shingle")
        .agg(F.min("_hit").alias("maybe"))
    )
    return shingle_hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum("maybe").cast("bigint").alias("n_maybe_hits"),
        (F.sum("maybe") * 20 >= F.count(F.lit(1))).alias("flagged"),
    )


@register(
    "bigram_next_words",
    oracle="""
    WITH ws AS (
      SELECT string_split(text, ' ') AS w FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    pairs AS (
      SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                                   i -> struct_pack(w1 := w[i], w2 := w[i+1]))) AS p
      FROM ws
    ),
    counts AS (SELECT p.w1 AS w1, p.w2 AS w2, COUNT(*) AS cnt FROM pairs GROUP BY 1, 2)
    SELECT w1, w2, cnt, CAST(rnk AS INT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY w1 ORDER BY cnt DESC, w2) AS rnk
          FROM counts)
    WHERE rnk <= 3
    """,
    tags=("llm", "text", "ngram", "window"),
    doc="Bigram LM stats: top-3 next words per leading word. Explode "
    "bigrams WITH multiplicity (unlike dedup shingles) → count per "
    "(w1, w2) → per-w1 rank-limit window (WindowGroupLimit: map-side "
    "partial top-k per leading word). Guarded: docs under 2 words emit "
    "nothing (Spark sequence() counts DOWN on empty ranges).",
)
def bigram_next_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = widen(load_table(spark, sf_dir, "documents"))
    pairs = (
        d.select(F.split("text", " ").alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i+1] AS w2))")
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    counts = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("w1").orderBy(F.col("cnt").desc(), F.col("w2"))
    return counts.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 3)


@register(
    "embedding_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE
    prs AS MATERIALIZED (
      SELECT a.vec_id AS va, b.vec_id AS vb
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE round({S.sql_cosine('a.embedding', 'b.embedding')}, 6) >= {NEAR_DUP_COS}
    ),
    edges AS MATERIALIZED (
      SELECT va AS u, vb AS v FROM prs
      UNION
      SELECT vb AS u, va AS v FROM prs
    ),
    reach(u, v) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS vec_id,
           min(v) AS keeper_id,
           (min(v) = u) AS is_keeper
    FROM reach
    GROUP BY u
    """,
    tags=("dedup", "llm", "iterative", "similarity"),
    doc="End-to-end embedding dedup resolution, ORACLED: cosine near-dup "
    "pairs (>=0.4, exact-fold kernel) → connected components → every "
    "vector mapped to its cluster's min-id keeper. The Spark side is the "
    "pointer-doubling label-propagation loop (operators/clustering.py, "
    "O(log n) rounds); the oracle expresses the same fixpoint as a "
    "DuckDB recursive CTE (transitive closure + min-reachable), proving "
    "the iterative operator against SQL semantics — not just row counts. "
    "The O(n²) pair stage is bounded by contract "
    "(SPARK_GRAFT_EXACT_PAIR_MAX, default 50k rows); the scale path is "
    "ann_dedup_clusters.",
)
def embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.operators.clustering import dedup_clusters

    e = load_table(spark, sf_dir, "embeddings")
    pairs = S.brute_force_pair_cosines(spark, e, threshold=NEAR_DUP_COS, dim=EMB_DIM).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    return dedup_clusters(e, pairs, id_col="vec_id")


@register(
    "semantic_keeper_by_quality",
    oracle=f"""
    WITH RECURSIVE
    prs AS MATERIALIZED (
      SELECT a.vec_id AS va, b.vec_id AS vb
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE round({S.sql_cosine('a.embedding', 'b.embedding')}, 6) >= {NEAR_DUP_COS}
    ),
    edges AS MATERIALIZED (
      SELECT va AS u, vb AS v FROM prs
      UNION
      SELECT vb AS u, va AS v FROM prs
    ),
    reach(u, v) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    comp AS MATERIALIZED (SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u),
    m AS (
      SELECT c.doc_id, c.component, d.n_chars
      FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    ),
    k AS (
      SELECT component, doc_id AS keeper_id
      FROM (SELECT component, doc_id,
                   row_number() OVER (PARTITION BY component
                                      ORDER BY n_chars DESC, doc_id) AS rn
            FROM m)
      WHERE rn = 1
    )
    SELECT m.doc_id, k.keeper_id, (m.doc_id = k.keeper_id) AS is_keeper
    FROM m JOIN k USING (component)
    """,
    tags=("dedup", "llm", "iterative", "similarity", "quality"),
    doc="Quality-aware semantic dedup: embedding near-dup pairs → "
    "connected components → keeper = the HIGHEST-QUALITY doc per "
    "cluster (n_chars, ties to min doc_id) instead of min-id — what "
    "production pipelines actually keep. One max_by aggregate per "
    "component + a membership join; the oracle proves the full "
    "fixpoint + argmax chain against a recursive CTE. Membership is "
    "the EMBEDDED docs (semi-join on vec_id): a doc with no embedding "
    "cannot participate in semantic dedup, so it gets no row — the "
    "r6 sf0.1 parity sweep caught the earlier all-documents form "
    "silently emitting singleton clusters for the 3000 unembedded "
    "docs at 10x scale (doc/embedding counts coincide below sf0.1, so "
    "the sf0.01 gate could not see it). The O(n²) pair stage is "
    "bounded by contract (SPARK_GRAFT_EXACT_PAIR_MAX, default 50k "
    "rows); the scale path is ann_keeper_by_quality.",
)
def semantic_keeper_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .join(e.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_semi")
    )
    pairs = S.brute_force_pair_cosines(spark, e, threshold=NEAR_DUP_COS, dim=EMB_DIM).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    return _keeper_by_quality(d, pairs)


@register(
    "adaptive_length_gate_per_lang",
    oracle="""
    WITH q AS (
      SELECT lang,
             quantile_cont(CAST(n_chars AS DOUBLE), 0.1) AS lo,
             quantile_cont(CAST(n_chars AS DOUBLE), 0.95) AS hi
      FROM documents GROUP BY lang
    )
    SELECT d.lang, q.lo, q.hi,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN d.n_chars >= q.lo AND d.n_chars <= q.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents d JOIN q ON d.lang = q.lang
    GROUP BY d.lang, q.lo, q.hi
    """,
    tags=("llm", "text", "quality", "percentile", "aggregation"),
    doc="Adaptive per-language length gates: thresholds are the "
    "language's own p10/p95 (not global constants — a fixed cutoff "
    "tuned on English over-filters CJK), derived in one grouped "
    "percentile pass, broadcast back (per-lang bounds are tiny), and "
    "applied as conditional counts. Interpolated percentile parity "
    "with quantile_cont is bit-exact (established on the global "
    "variant). Two shuffles on lang total at any scale.",
)
def adaptive_length_gate_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    q = d.groupBy("lang").agg(
        F.percentile(F.col("n_chars").cast("double"), F.lit(0.1)).alias("lo"),
        F.percentile(F.col("n_chars").cast("double"), F.lit(0.95)).alias("hi"),
    )
    kept = (F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi"))
    return (
        d.join(F.broadcast(q), "lang")
        .groupBy("lang", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        )
    )


@register(
    "repetition_ratio_filter",
    oracle="""
    WITH tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY doc_id, token
    )
    SELECT doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_tokens,
           CAST(MAX(tf) AS BIGINT) AS max_tf,
           (CAST(MAX(tf) AS BIGINT) * 5 >= CAST(SUM(tf) AS BIGINT)) AS repetitive
    FROM tf
    GROUP BY doc_id
    """,
    tags=("llm", "text", "quality"),
    doc="Gopher-style repetition gate: per doc, the most frequent "
    "token's share of all tokens; docs where one token is >=20% of the "
    "text are flagged repetitive. Two shuffles (token counts, then doc "
    "rollup), integer-exact end to end — no float threshold to drift.",
)
def repetition_ratio_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = widen(load_table(spark, sf_dir, "documents"))
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return tf.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("n_tokens"),
        F.max("tf").cast("bigint").alias("max_tf"),
        (F.max("tf").cast("bigint") * 5 >= F.sum("tf").cast("bigint")).alias("repetitive"),
    )


@register(
    "epoch_shuffle_order",
    oracle="""
    SELECT doc_id,
           CAST(rnk AS BIGINT) AS epoch_rank,
           CAST((rnk - 1) % 16 AS INT) AS shard_id
    FROM (SELECT doc_id,
                 ROW_NUMBER() OVER (ORDER BY md5('ep:2:' || doc_id), doc_id) AS rnk
          FROM documents)
    """,
    tags=("llm", "sampling", "rank", "mixture"),
    doc="Deterministic epoch shuffle + shard assignment — the data-order "
    "reproducibility contract a training run needs: the global order "
    "for epoch 2 is ascending md5('ep:2:' || doc_id) (a new "
    "pseudo-random permutation per epoch, identical on every engine "
    "and every rerun — no RNG state to replay), and each doc lands in "
    "shard (rank-1) mod 16 (round-robin over writer files, so shard "
    "sizes differ by at most one). The oracle states it as a global "
    "ROW_NUMBER; the engine computes it with the two-phase distributed "
    "rank (operators/rank.py — range partition on the md5 key, "
    "per-bucket local ranks, P-row offset broadcast), so the corpus "
    "never funnels through one reducer. The same pattern re-shuffles "
    "100 TB per epoch with one range-partition pass.",
)
def epoch_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.operators.rank import with_global_order

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    keyed = d.withColumn(
        "_k", F.md5(F.concat(F.lit("ep:2:"), F.col("doc_id").cast("string")))
    )
    ranked = with_global_order(
        keyed, [F.col("_k"), F.col("doc_id")], rank_col="epoch_rank"
    )
    return ranked.select(
        "doc_id",
        F.col("epoch_rank").cast("long").alias("epoch_rank"),
        ((F.col("epoch_rank") - 1) % 16).cast("int").alias("shard_id"),
    )


@register(
    "quality_gate_agreement_kappa",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY doc_id, token
    ),
    rep AS (
      SELECT doc_id,
             (CAST(MAX(tf) AS BIGINT) * 10 < CAST(SUM(tf) AS BIGINT)) AS keep_rep
      FROM tf GROUP BY doc_id
    ),
    soft AS (
      SELECT doc_id,
             (z / (1 + abs(z)) > -0.45) AS keep_soft
      FROM (
        SELECT doc_id,
               round(0.002 * CAST(n_chars AS DOUBLE)
                     + 2.0 * (CAST({TX.sql_stopword_count('text')} AS DOUBLE)
                              / CAST(len(string_split(text, ' ')) AS DOUBLE))
                     - 0.01 * CAST(len(string_split(text, ' ')) AS DOUBLE)
                     - 1.0, 6) AS z
        FROM documents)
    ),
    cm AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN keep_rep AND keep_soft THEN 1 ELSE 0 END) AS BIGINT) AS n11,
             CAST(SUM(CASE WHEN keep_rep AND NOT keep_soft THEN 1 ELSE 0 END) AS BIGINT) AS n10,
             CAST(SUM(CASE WHEN NOT keep_rep AND keep_soft THEN 1 ELSE 0 END) AS BIGINT) AS n01,
             CAST(SUM(CASE WHEN NOT keep_rep AND NOT keep_soft THEN 1 ELSE 0 END) AS BIGINT) AS n00
      FROM rep JOIN soft USING (doc_id)
    )
    SELECT n, n11, n10, n01, n00,
           round((CAST(n11 AS DOUBLE) + CAST(n00 AS DOUBLE)) / CAST(n AS DOUBLE), 6)
             AS observed_agreement,
           CASE WHEN 1.0 - ((CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE))
                            * (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE))
                            + (CAST(n01 + n00 AS DOUBLE) / CAST(n AS DOUBLE))
                            * (CAST(n10 + n00 AS DOUBLE) / CAST(n AS DOUBLE))) = 0.0
                THEN NULL
                ELSE round(
                  ((CAST(n11 AS DOUBLE) + CAST(n00 AS DOUBLE)) / CAST(n AS DOUBLE)
                   - ((CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE))
                      + (CAST(n01 + n00 AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(n10 + n00 AS DOUBLE) / CAST(n AS DOUBLE))))
                  / (1.0 - ((CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE))
                            * (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE))
                            + (CAST(n01 + n00 AS DOUBLE) / CAST(n AS DOUBLE))
                            * (CAST(n10 + n00 AS DOUBLE) / CAST(n AS DOUBLE)))), 6)
           END AS kappa
    FROM cm
    """,
    tags=("llm", "quality", "stats"),
    doc="Cohen's kappa agreement between two registered quality gates — "
    "the check a curation team runs before swapping an expensive "
    "classifier for a cheap heuristic: gate A = a repetition gate at a "
    "10% max-token-share threshold (the Gopher-style gate tightened so "
    "it discriminates on this corpus — the registered 20% filter keeps "
    "everything here), gate B = the "
    "softsign linear score at its corpus median (-0.45; the registered "
    "0.2 production threshold keeps ~nothing here). Thresholds are "
    "demo-calibrated so the 2x2 table is non-degenerate — the kappa "
    "MACHINERY, not the cut points, is the operator. Emits the 2x2 "
    "confusion counts, observed agreement, and chance-corrected kappa. "
    "Counts are integer-exact; agreement/kappa use only bigint->double "
    "casts (<2^53, exact) and IEEE divisions over identical inputs, so "
    "both engines produce the identical rounded doubles (the "
    "stats_exact_moments construction). One token shuffle + one "
    "codegen feature pass + a 1-row aggregate; degenerate marginals "
    "(pe=1) return NULL kappa on both engines.",
)
def quality_gate_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = widen(load_table(spark, sf_dir, "documents"))
    # r13 examined-and-kept: a single-pass form (gate B computed
    # pre-explode and carried through the token shuffle as a boolean
    # per (doc,token) row) verified identical and read as a wash at
    # sf0.1, but LOST 2.3x at the x10 documents replica — the carried
    # column and its first() aggregation ride the EXPLODED relation,
    # which grows with token volume, while the second corpus scan it
    # saves is a cheap columnar read. The two-scan form stays.
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    rep = tf.groupBy("doc_id").agg(
        (F.max("tf").cast("bigint") * 10 < F.sum("tf").cast("bigint")).alias("keep_rep")
    )
    w = TX.n_words("text").cast("double")
    sw = TX.stopword_count("text").cast("double")
    z = F.round(
        F.lit(0.002) * F.col("n_chars").cast("double")
        + F.lit(2.0) * (sw / w)
        - F.lit(0.01) * w
        - F.lit(1.0),
        6,
    )
    soft = d.select(
        "doc_id", (z / (F.lit(1.0) + F.abs(z)) > -0.45).alias("keep_soft")
    )
    cm = (
        rep.join(soft, "doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("keep_rep") & F.col("keep_soft"), 1).otherwise(0))
            .cast("bigint")
            .alias("n11"),
            F.sum(F.when(F.col("keep_rep") & ~F.col("keep_soft"), 1).otherwise(0))
            .cast("bigint")
            .alias("n10"),
            F.sum(F.when(~F.col("keep_rep") & F.col("keep_soft"), 1).otherwise(0))
            .cast("bigint")
            .alias("n01"),
            F.sum(F.when(~F.col("keep_rep") & ~F.col("keep_soft"), 1).otherwise(0))
            .cast("bigint")
            .alias("n00"),
        )
    )
    nd = F.col("n").cast("double")
    po = (F.col("n11").cast("double") + F.col("n00").cast("double")) / nd
    pa = (F.col("n11") + F.col("n10")).cast("double") / nd
    pb = (F.col("n11") + F.col("n01")).cast("double") / nd
    qa = (F.col("n01") + F.col("n00")).cast("double") / nd
    qb = (F.col("n10") + F.col("n00")).cast("double") / nd
    pe = pa * pb + qa * qb
    return cm.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(po, 6).alias("observed_agreement"),
        F.when(F.lit(1.0) - pe == 0.0, F.lit(None).cast("double"))
        .otherwise(F.round((po - pe) / (F.lit(1.0) - pe), 6))
        .alias("kappa"),
    )


# Model-based quality classifier (VERDICT r7 #8): a logistic scorer fit
# OFFLINE against the repo's heuristic quality gate (n_words 10..500,
# n_chars >= 50, stopword_ratio >= 0.05, not Gopher-repetitive) on
# sf0.01 — the FastText-shaped "cheap model distills an expensive gate"
# production pattern. Weights are frozen literals over four cheap
# per-row features; measured agreement with the gate: 0.982 (sf0.01),
# 0.971 (sf0.1), 0.976 (sf0.001) — pinned >= 0.95 in
# tests/test_curation_stats.py. Since r9 the weights and the scoring
# chain live in functions/scoring.py, shared verbatim by this batch
# query and the streaming ingest gate (stream_quality_gate_rates) —
# one definition, two execution modes.
QC_WEIGHTS = SC.QC_WEIGHTS
QC_BIAS = SC.QC_BIAS
_QC_FEATS_SQL = SC.qc_feats_sql(TX.sql_stopword_count("text"))


@register(
    "quality_classifier_scores",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             {SC.sql_affine_margin(QC_WEIGHTS, QC_BIAS, _QC_FEATS_SQL)} AS margin
      FROM documents
    )
    SELECT doc_id,
           CAST(floor(margin * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS margin_micro,
           margin > CAST(0 AS DOUBLE) AS keep
    FROM m
    """,
    tags=("llm", "quality", "udf", "inference"),
    doc="Model-based quality gate as BATCH INFERENCE (the FastText-"
    "classifier-shaped production cut): a logistic scorer's weights "
    "frozen as plan literals, four codegen'd surface features "
    "(n_words/100, stopword_ratio, distinct-word ratio, mean word "
    "len/10), and the affine margin applied via an Arrow-batched "
    "pandas_udf in the exact left-to-right float64 order the DuckDB "
    "oracle replays — the classifier's SCORES hash-match bit-for-bit "
    "(floor-quantized micro-margin; decimal round() is not portable at "
    "scaled-.5 boundaries), not just its keep/drop counts. No sigmoid "
    "on purpose: libm exp() ulps differ across engines and the "
    "margin's sign is the decision. "
    "Agreement with the heuristic gate it distills: 0.98 at sf0.01 "
    "(pinned in tests). At 100 TB this is one narrow projection + one "
    "Arrow stage: no shuffle, no model file, no driver state.",
)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the whole chain (features → Arrow margin → floor-quantized
    # micro-margin; see scoring.quality_gate_scored for the float64 /
    # rounding-portability notes) is the SHARED definition the
    # streaming ingest gate runs verbatim
    d = widen(load_table(spark, sf_dir, "documents"))
    return SC.quality_gate_scored(d, keep_cols=("doc_id",))


PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\d{3}[-.]\d{3}[-.]\d{4}"


@register(
    "pii_scrub_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS INT) AS n_phones,
           length(regexp_replace(regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
                                 '{PII_PHONE}', '<PHONE>', 'g')) AS scrubbed_len
    FROM documents
    """,
    tags=("llm", "text", "cleaning"),
    doc="PII scrub pass: count + redact email/phone patterns per doc "
    "(regexp kept to the Java/RE2 common dialect so both engines "
    "match). Pure codegen'd expressions — the cleaning-map shape that "
    "runs at scan speed; the synthetic corpus has few hits but the "
    "operator semantics are fully oracled.",
)
def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"), PII_PHONE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(PII_EMAIL), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(PII_PHONE), F.lit(0))).alias("n_phones"),
        F.length(scrubbed).alias("scrubbed_len"),
    )


# Rolling-fingerprint arithmetic (SURVEY.md §2.C text analysis): both
# engines fold chars → word hash, then a base-131 rolling combine over
# 4-word windows, everything mod 1e9+7 so BIGINT never overflows
# ((M-1)*131 + M ≈ 1.3e11) and results are integer-exact cross-engine.
# (FP_MOD / FP_GRAM moved to module top: the containment query's oracle
# f-string needs them at registration time)


@register(
    "doc_fingerprint_rolling",
    oracle=f"""
    WITH hs AS (
      SELECT doc_id,
             list_transform(string_split(text, ' '), w ->
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(w, ''), c -> CAST(ascii(c) AS BIGINT))),
                 (a, c) -> (a * 31 + c) % {FP_MOD})) AS hs
      FROM documents
    )
    SELECT doc_id,
           CAST(len(hs) - {FP_GRAM} + 1 AS BIGINT) AS n_grams,
           CAST(list_min(gs) AS BIGINT) AS min_fp,
           CAST(list_max(gs) AS BIGINT) AS max_fp,
           CAST(len(list_distinct(gs)) AS BIGINT) AS n_distinct_fp
    FROM (
      SELECT doc_id, hs,
             list_transform(generate_series(1, len(hs) - {FP_GRAM} + 1), i ->
               (((((hs[i] * 131 + hs[i+1]) % {FP_MOD})
                  * 131 + hs[i+2]) % {FP_MOD})
                  * 131 + hs[i+3]) % {FP_MOD}) AS gs
      FROM hs WHERE len(hs) >= {FP_GRAM}
    )
    """,
    tags=("llm", "text", "fingerprint"),
    doc="Rolling-hash document fingerprint (winnowing-style sketch): "
    "char-fold each word to a 31-base hash, slide a 4-word 131-base "
    "rolling window, keep min/max/distinct-count of window hashes per "
    "doc. All modular BIGINT arithmetic in codegen'd higher-order "
    "functions — integer-exact on both engines, no explode (the gram "
    "array never leaves the row), embarrassingly parallel per doc.",
)
def doc_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = widen(load_table(spark, sf_dir, "documents"))
    hs = F.expr(
        f"transform(split(text, ' '), w -> "
        f"aggregate(split(w, ''), CAST(0 AS BIGINT), "
        f"(a, c) -> (a * 31 + ascii(c)) % {FP_MOD}))"
    )
    with_hs = d.select("doc_id", hs.alias("hs")).filter(F.size("hs") >= FP_GRAM)
    gs = F.expr(
        f"transform(sequence(0, size(hs) - {FP_GRAM}), i -> "
        f"(((((hs[i] * 131 + hs[i+1]) % {FP_MOD}) "
        f"* 131 + hs[i+2]) % {FP_MOD}) "
        f"* 131 + hs[i+3]) % {FP_MOD})"
    )
    return with_hs.select(
        "doc_id",
        (F.size("hs") - F.lit(FP_GRAM - 1)).cast("bigint").alias("n_grams"),
        F.array_min(gs).cast("bigint").alias("min_fp"),
        F.array_max(gs).cast("bigint").alias("max_fp"),
        F.size(F.array_distinct(gs)).cast("bigint").alias("n_distinct_fp"),
    )


# ASCII-only classes: Java regex and DuckDB's RE2 agree exactly on
# these (unicode classes would not).
BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


@register(
    "token_count_bpe",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{BPE_PATTERN.replace(chr(92) + 's', chr(92) + 's')}')) AS BIGINT) AS n_bpe_tokens,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
           round(CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS tokens_per_word
    FROM documents
    """,
    tags=("llm", "text", "tokenize"),
    doc="BPE-ish token counting: letter runs, single digits, and "
    "punctuation as separate tokens (the GPT-2 pre-tokenizer's shape, "
    "ASCII classes only so Java regex == RE2), vs whitespace word "
    "count. regexp_count is codegen'd JVM-side; one pass, no explode.",
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = widen(load_table(spark, sf_dir, "documents"))
    n_bpe = F.regexp_count("text", F.lit(BPE_PATTERN))
    n_ws = F.size(F.split("text", " "))
    return d.select(
        "doc_id",
        n_bpe.cast("bigint").alias("n_bpe_tokens"),
        n_ws.cast("bigint").alias("n_ws_tokens"),
        F.round(n_bpe.cast("double") / n_ws, 6).alias("tokens_per_word"),
    )


# Context-window chunking (training-data prep): 128-word chunks on a
# 96-word stride (32-word overlap), the standard sliding-window split
# that keeps cross-boundary context in at least one chunk.
CHUNK_WORDS = 128
CHUNK_STRIDE = 96


@register(
    "doc_chunk_windows",
    oracle=f"""
    WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    chunks AS (
      SELECT doc_id,
             s,
             ws[s + 1 : s + {CHUNK_WORDS}] AS chunk
      FROM (SELECT doc_id, ws, unnest(generate_series(0, len(ws) - 1, {CHUNK_STRIDE})) AS s
            FROM ws)
    )
    SELECT doc_id,
           CAST(s // {CHUNK_STRIDE} AS INT) AS chunk_idx,
           CAST(len(chunk) AS BIGINT) AS n_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_hash
    FROM chunks
    """,
    tags=("llm", "text", "chunking"),
    doc="Sliding-window document chunking for context-window packing: "
    "128-word chunks every 96 words (32 overlap), last chunk ragged. "
    "Pure codegen'd higher-order functions (sequence → slice → explode) "
    "— the chunk arrays never leave the JVM; the oracle-compared "
    "identity is the md5 of the rejoined chunk text. DuckDB list slices "
    "are inclusive (ws[s+1 : s+128]) where Spark slice() takes a "
    "length — same 128 elements either way.",
)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = widen(load_table(spark, sf_dir, "documents"))
    chunks = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(split(text, ' ')) - 1, {CHUNK_STRIDE}), "
                f"s -> struct(s AS s, slice(split(text, ' '), s + 1, {CHUNK_WORDS}) AS chunk))"
            )
        ).alias("c"),
    )
    return chunks.select(
        "doc_id",
        (F.col("c.s") / CHUNK_STRIDE).cast("int").alias("chunk_idx"),
        F.size("c.chunk").cast("bigint").alias("n_tokens"),
        F.md5(F.concat_ws(" ", "c.chunk").cast("binary")).alias("chunk_hash"),
    )


@register(
    "dup_rate_by_source",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts,
           CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_redundant,
           round(CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS DOUBLE)
                 / COUNT(*), 6) AS dup_rate
    FROM documents
    GROUP BY source
    """,
    tags=("dedup", "llm", "aggregation", "analytics"),
    doc="Dedup yield report per source: how much of each feed is "
    "redundant copy mass (docs minus distinct contents) — the number "
    "that decides whether a crawl source is worth its storage bill, "
    "and the before/after metric every dedup run reports. "
    "COUNT(DISTINCT md5(text)) expands to a two-phase exact "
    "distinct (partial per-partition dedup on the content hash, then "
    "the merge) — the hash substitutes a 16-byte key for full text "
    "in the shuffle. Within-source view of what "
    "cross_source_dup_matrix shows across sources.",
)
def dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("text").cast("binary"))
    n = F.count(F.lit(1))
    nd = F.count_distinct(h)
    return d.groupBy("source").agg(
        n.alias("n_docs"),
        nd.cast("bigint").alias("n_unique_texts"),
        (n - nd).cast("bigint").alias("n_redundant"),
        F.round((n - nd).cast("double") / n, 6).alias("dup_rate"),
    )


@register(
    "langid_confusion_matrix",
    oracle=f"""
    WITH pred AS (
      SELECT lang AS true_lang, {TX.sql_lang_guess('text')} AS pred_lang
      FROM documents
    ),
    cm AS (
      SELECT true_lang, pred_lang, COUNT(*) AS n
      FROM pred GROUP BY true_lang, pred_lang
    ),
    row_tot AS (SELECT true_lang, SUM(n) AS n_true FROM cm GROUP BY true_lang),
    col_tot AS (SELECT pred_lang, SUM(n) AS n_pred FROM cm GROUP BY pred_lang)
    SELECT cm.true_lang, cm.pred_lang, CAST(cm.n AS BIGINT) AS n_docs,
           round(CAST(cm.n AS DOUBLE) / r.n_true, 6) AS recall_share,
           round(CAST(cm.n AS DOUBLE) / c.n_pred, 6) AS precision_share
    FROM cm
    JOIN row_tot r ON cm.true_lang = r.true_lang
    JOIN col_tot c ON cm.pred_lang = c.pred_lang
    """,
    tags=("llm", "text", "aggregation", "analytics", "evaluation"),
    doc="Classifier evaluation at corpus scale: the confusion matrix of "
    "the heuristic language-ID against the labeled lang column, with "
    "each cell carrying its row-share (recall decomposition: where do "
    "true-X docs get classified) and column-share (precision "
    "decomposition: what feeds the pred-X bucket). The eval pattern "
    "any quality/toxicity/lang model deployed over 100 TB needs, as "
    "one plan: a single map-side-combining shuffle onto a langs² key "
    "space, totals folded from the already-aggregated matrix, shares "
    "dividing exact integers. The heuristic itself is a codegen "
    "expression (functions/text.py) — scoring costs a scan, not a "
    "Python boundary.",
)
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.operators.rank import tracked_checkpoint

    d = widen(load_table(spark, sf_dir, "documents"))
    # r13: cm feeds three consumers (row totals, column totals, the
    # final join) whose pruned copies canonicalize differently — the
    # lang_guess regex corpus scan ran 2x. cm is langs²-sized, so
    # checkpoint it once (guide §2.4).
    cm = tracked_checkpoint(
        d.select(F.col("lang").alias("true_lang"), TX.lang_guess().alias("pred_lang"))
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_tot = cm.groupBy("true_lang").agg(F.sum("n").alias("n_true"))
    col_tot = cm.groupBy("pred_lang").agg(F.sum("n").alias("n_pred"))
    return (
        cm.join(row_tot, "true_lang")
        .join(col_tot, "pred_lang")
        .select(
            "true_lang",
            "pred_lang",
            F.col("n").cast("bigint").alias("n_docs"),
            F.round(F.col("n").cast("double") / F.col("n_true"), 6).alias("recall_share"),
            F.round(F.col("n").cast("double") / F.col("n_pred"), 6).alias("precision_share"),
        )
    )


@register(
    "cross_source_dup_matrix",
    oracle="""
    WITH st AS (
      SELECT DISTINCT md5(text) AS h, source FROM documents
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b
      FROM st a JOIN st b ON a.h = b.h AND a.source < b.source
    )
    SELECT source_a, source_b, COUNT(*) AS n_shared_texts
    FROM pairs GROUP BY source_a, source_b
    """,
    tags=("dedup", "llm", "join", "analytics"),
    doc="Duplication provenance: for every source pair, how many "
    "distinct text contents appear in BOTH — the 'which feeds copy "
    "from which' audit that decides crawl dedup order and licensing "
    "review. One shuffle builds the distinct (content-hash, source) "
    "set; the self-join explodes per-hash source pairs, bounded by "
    "sources²/2 per hash (sources is small; a hash shared by all k "
    "sources yields k(k-1)/2 pairs — per-key fan-out is capped by "
    "source cardinality, never by copy count, because the DISTINCT "
    "collapses per-source copies first). Output is sources²-sized.",
)
def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    st = d.select(F.md5(F.col("text").cast("binary")).alias("h"), "source").distinct()
    a = st.select(F.col("h"), F.col("source").alias("source_a"))
    b = st.select(F.col("h"), F.col("source").alias("source_b"))
    return (
        a.join(b, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared_texts"))
    )


@register(
    "embedding_int8_quantize",
    oracle="""
    WITH ex AS (
      SELECT unnest(range(0, len(embedding))) AS pos,
             unnest(embedding) AS x
      FROM embeddings
    ),
    stats AS (
      SELECT pos, MIN(CAST(x AS DOUBLE)) AS mn, MAX(CAST(x AS DOUBLE)) AS mx
      FROM ex GROUP BY pos
    ),
    r AS (SELECT list(mn ORDER BY pos) AS mns, list(mx ORDER BY pos) AS mxs FROM stats)
    SELECT vec_id, label,
           list_transform(range(1, len(embedding) + 1), i ->
             CASE WHEN r.mxs[i] = r.mns[i] THEN 0
                  ELSE CAST(round(((CAST(embedding[i] AS DOUBLE) - r.mns[i]) * 255)
                                  / (r.mxs[i] - r.mns[i])) AS INT) END) AS codes
    FROM embeddings CROSS JOIN r
    """,
    tags=("llm", "similarity", "array", "etl"),
    doc="Int8 scalar quantization of the embedding column — the storage "
    "step real 100 TB vector pipelines run before ANN serving (4x "
    "smaller than float32, cache-resident codebooks). Per-dimension "
    "min/max calibrate one [0,255] affine code per dim: one "
    "posexplode aggregate (64·n rows, map-side combined into 64 "
    "groups), the 2×64-value calibration row broadcasts, and encoding "
    "is a codegen transform() — no second shuffle. Quantization "
    "arithmetic is double-exact and written in the IDENTICAL "
    "operation order in both engines ((x-mn)*255 then divide, then "
    "round), so the int codes hash-match exactly; the degenerate "
    "mx==mn dim maps to 0 identically. Codes are returned as "
    "array<int> (parquet would store them as bytes; int keeps the "
    "oracle comparison type-exact). Scoring contract: DEQUANTIZE "
    "(mn + code·(mx-mn)/255) before cosine — raw codes keep the "
    "affine min-offset and distort angles (measured: 5/10 recall on "
    "raw codes vs 9+/10 dequantized; pinned in "
    "test_similarity_util.py).",
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(F.posexplode("embedding").alias("pos", "x"))
    stats = ex.groupBy("pos").agg(
        F.min(F.col("x").cast("double")).alias("mn"),
        F.max(F.col("x").cast("double")).alias("mx"),
    )
    r = stats.agg(
        F.array_sort(F.collect_list(F.struct("pos", "mn", "mx"))).alias("s")
    ).select(
        F.expr("transform(s, t -> t.mn)").alias("mns"),
        F.expr("transform(s, t -> t.mx)").alias("mxs"),
    )
    return e.crossJoin(F.broadcast(r)).select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, (x, i) -> "
            "CASE WHEN mxs[i] = mns[i] THEN 0 "
            "ELSE CAST(round(((CAST(x AS DOUBLE) - mns[i]) * 255) / (mxs[i] - mns[i])) AS INT) END)"
        ).alias("codes"),
    )


@register(
    "embedding_norm_stats",
    oracle=f"""
    SELECT label,
           COUNT(*) AS n_vecs,
           min(round(sqrt({S.sql_dot('embedding', 'embedding')}), 6)) AS min_norm,
           max(round(sqrt({S.sql_dot('embedding', 'embedding')}), 6)) AS max_norm,
           CAST(SUM(CAST(round(sqrt({S.sql_dot('embedding', 'embedding')}), 6)
                    AS DECIMAL(18,6))) AS DOUBLE) AS sum_norm
    FROM embeddings
    GROUP BY label
    """,
    tags=("llm", "similarity", "aggregation"),
    doc="Per-label embedding L2-norm profile (the sanity gate before any "
    "cosine pipeline: zero or wildly-scaled norms break similarity). "
    "Norms via the exact fold, rounded to 6dp BEFORE aggregating; the "
    "sum goes through DECIMAL(18,6) so it is aggregation-order-"
    "independent — min/max/count are order-free by nature. One shuffle "
    "on label.",
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    nrm = F.round(S.norm("embedding"), 6)
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.min(nrm).alias("min_norm"),
        F.max(nrm).alias("max_norm"),
        F.sum(nrm.cast("decimal(18,6)")).cast("double").alias("sum_norm"),
    )


APPROX_PCT_QS = (0.25, 0.5, 0.75, 0.95)
APPROX_PCT_ACC = 10000  # GK accuracy parameter → rank error <= n/ACC


@register(
    "approx_percentile_totalprice",
    oracle=f"""
    SELECT p.o_orderpriority, q.q AS quantile, TRUE AS within_bound
    FROM (SELECT DISTINCT o_orderpriority FROM orders) p
    CROSS JOIN (VALUES {", ".join(f"({q})" for q in APPROX_PCT_QS)}) AS q(q)
    """,
    tags=("aggregation", "sketch", "approx"),
    doc="Approximate quantiles of order totals per order-priority via "
    "approx_percentile (Greenwald-Khanna sketch, mergeable across "
    "partitions — the 100 TB path where exact percentile's full sort "
    "is unpayable; accuracy 1/10000). ORACLED since r6 in error-band "
    "form (VERDICT r5 #1c): sketch internals differ across engines, "
    "but the GK CONTRACT — the returned value's rank is within "
    "n/accuracy of q*n — is engine-checkable. The query emits "
    "(priority, quantile, within_bound) where within_bound compares "
    "the approx value's true rank interval [cnt_lt+1, cnt_le] against "
    "[q*n - n/acc - 1, q*n + n/acc + 1]; the oracle states the "
    "contract (all TRUE), so a sketch violating its bound hash-"
    "mismatches. The exact twin percentile_totalprice pins the values "
    "themselves. Cost: one orders scan for the sketch + one for the "
    "rank check joined against the 20-row broadcast approx relation.",
)
def approx_percentile_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    qs_arr = ", ".join(str(q) for q in APPROX_PCT_QS)
    pcts = o.groupBy("o_orderpriority").agg(
        F.expr(f"approx_percentile(o_totalprice, array({qs_arr}), {APPROX_PCT_ACC})").alias("pcts")
    )
    approx = pcts.select(
        "o_orderpriority",
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(q).cast("double") for q in APPROX_PCT_QS]).alias("q"),
                F.col("pcts").alias("v"),
            )
        ).alias("z"),
    ).select("o_orderpriority", F.col("z.q").alias("quantile"), F.col("z.v").alias("v"))
    checked = (
        o.join(F.broadcast(approx), "o_orderpriority")
        .groupBy("o_orderpriority", "quantile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("o_totalprice") <= F.col("v"), 1).otherwise(0)).alias("cnt_le"),
            F.sum(F.when(F.col("o_totalprice") < F.col("v"), 1).otherwise(0)).alias("cnt_lt"),
        )
    )
    eps = F.col("n") / APPROX_PCT_ACC
    target = F.col("quantile") * F.col("n")
    return checked.select(
        "o_orderpriority",
        "quantile",
        (
            (F.col("cnt_le") >= target - eps - 1)
            & (F.col("cnt_lt") <= target + eps + 1)
        ).alias("within_bound"),
    )


@register(
    "mixture_waterfill_allocation",
    oracle="""
    WITH caps AS (
      SELECT source,
             CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS cap
      FROM documents GROUP BY source),
    ranked AS (
      SELECT source, cap,
             ROW_NUMBER() OVER (ORDER BY cap, source) AS i,
             COALESCE(SUM(cap) OVER (ORDER BY cap, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix,
             COUNT(*) OVER () AS n,
             SUM(cap) OVER () AS total
      FROM caps),
    cand AS (
      SELECT *,
             (CAST(total AS DOUBLE) / 2.0 - CAST(prefix AS DOUBLE))
               / CAST(n - i + 1 AS DOUBLE) AS lam
      FROM ranked),
    k AS (SELECT MIN(i) AS k_i FROM cand WHERE lam <= CAST(cap AS DOUBLE)),
    lamv AS (SELECT c.lam FROM cand c JOIN k ON c.i = k.k_i)
    SELECT c.source, c.cap,
           CASE WHEN k.k_i IS NOT NULL AND c.i >= k.k_i THEN lamv.lam
                ELSE CAST(c.cap AS DOUBLE) END AS allocation
    FROM cand c LEFT JOIN k ON TRUE LEFT JOIN lamv ON TRUE
    """,
    tags=("mixing", "window", "aggregation"),
    doc="Water-filling token-budget allocation across sources: spend "
    "half the corpus's total tokens so every source gets an equal "
    "share EXCEPT sources too small to use theirs, whose surplus is "
    "redistributed — the standard data-mixing budgeter (caps = "
    "per-source token counts). Closed form, no iteration: sort "
    "sources by cap, prefix-sum, and the fill level lambda is the "
    "first candidate (B - prefix_{i-1})/(n-i+1) that its own cap can "
    "absorb. Post-agg relation is one row per SOURCE (tiny), so the "
    "global windows are safe at any corpus size; the only fact-table "
    "work is the per-source token count — one shuffle.",
)
def mixture_waterfill_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tokens = F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    caps = d.groupBy("source").agg(F.sum(tokens).cast("long").alias("cap"))
    wo = Window.orderBy("cap", "source")
    wall = Window.partitionBy()
    ranked = caps.select(
        "source",
        "cap",
        F.row_number().over(wo).alias("i"),
        F.coalesce(
            F.sum("cap").over(wo.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
        ).alias("prefix"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("cap").over(wall).alias("total"),
    )
    cand = ranked.withColumn(
        "lam",
        (F.col("total").cast("double") / F.lit(2.0) - F.col("prefix").cast("double"))
        / (F.col("n") - F.col("i") + 1).cast("double"),
    )
    k = cand.filter(F.col("lam") <= F.col("cap").cast("double")).agg(
        F.min("i").alias("k_i")
    )
    lamv = cand.join(k, cand.i == k.k_i).select(F.col("lam").alias("_lam"))
    return (
        cand.join(k, F.lit(True), "left")
        .join(lamv, F.lit(True), "left")
        .select(
            "source",
            "cap",
            F.when(
                F.col("k_i").isNotNull() & (F.col("i") >= F.col("k_i")), F.col("_lam")
            )
            .otherwise(F.col("cap").cast("double"))
            .alias("allocation"),
        )
    )


@register(
    "md5_deterministic_sample",
    oracle="""
    SELECT doc_id, source, lang
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 = 0
    """,
    tags=("sampling", "deterministic"),
    doc="Engine-independent deterministic ~10% sample: bucket = 32 bits "
    "of md5(key) mod 10. Unlike TABLESAMPLE/rand() (seeded per "
    "engine/partitioning) or xxhash64 (not portable), the md5 bucket "
    "reproduces EXACTLY on any engine, any executor count, any day — "
    "which is what makes a train/eval split auditable years later. "
    "The xxhash64 twins (hash_sample_per_source) are the cheaper "
    "in-engine path; this is the cross-system contract. Embarrassingly "
    "parallel: filter only, no shuffle.",
)
def md5_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long") % 10
    return d.filter(bucket == 0).select("doc_id", "source", "lang")


@register(
    "mixture_temperature_weights",
    oracle=f"""
    WITH s AS (
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(len(regexp_extract_all(text, '{TX.TOKEN_PATTERN}'))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n_docs, n_tokens,
             CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 6) AS DECIMAL(18,6)) AS w_raw
      FROM s
    )
    SELECT source, n_docs, n_tokens,
           round(CAST(w_raw AS DOUBLE) / CAST(SUM(w_raw) OVER () AS DOUBLE), 6) AS weight
    FROM w
    """,
    tags=("llm", "mixture", "aggregation"),
    doc="Temperature-scaled mixture weights (alpha=0.5): per-source "
    "sampling weight ∝ n_tokens^0.5, the standard upweighting of small "
    "sources in multi-source training mixes (cf. multilingual LM "
    "sampling). Determinism discipline for the oracle: the per-source "
    "sqrt is rounded into a DECIMAL(18,6) BEFORE the cross-source sum, "
    "so the normalizing total is integer-exact regardless of row order; "
    "only the final division is float (both engines divide the same two "
    "exact values). One shuffle on source; the normalize step is a "
    "window over a handful of source rows.",
)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(TX.n_tokens("text")).cast("bigint").alias("n_tokens"),
    )
    w = s.withColumn(
        "w_raw", F.round(F.sqrt(F.col("n_tokens").cast("double")), 6).cast("decimal(18,6)")
    )
    total = F.sum("w_raw").over(Window.partitionBy())
    return w.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("w_raw").cast("double") / total.cast("double"), 6).alias("weight"),
    )


@register(
    "tokenizer_fertility_by_lang",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_words,
           CAST(SUM(len(regexp_extract_all(text, '{TX.TOKEN_PATTERN}'))) AS BIGINT) AS n_tokens,
           round(CAST(SUM(len(regexp_extract_all(text, '{TX.TOKEN_PATTERN}'))) AS DOUBLE)
                 / SUM(len(string_split(text, ' '))), 6) AS fertility
    FROM documents GROUP BY lang
    """,
    tags=("llm", "text", "aggregation"),
    doc="Tokenizer fertility per language: tokens-per-word ratio under "
    "the BPE-ish token regex — the standard measure of how hard a "
    "tokenizer fragments each language (fertility >> 1 means the vocab "
    "under-serves that language; drives per-language token budgeting). "
    "Integer token/word sums (exact, order-independent), one float "
    "division at the end. One shuffle on lang.",
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(TX.n_words("text")).cast("bigint").alias("n_words"),
        F.sum(TX.n_tokens("text")).cast("bigint").alias("n_tokens"),
        F.round(
            F.sum(TX.n_tokens("text")).cast("double") / F.sum(TX.n_words("text")),
            6,
        ).alias("fertility"),
    )


@register(
    "quality_softsign_gate",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS w,
             CAST({TX.sql_stopword_count('text')} AS DOUBLE) AS sw,
             CAST(n_chars AS DOUBLE) AS nc
      FROM documents
    ),
    z AS (
      SELECT doc_id,
             round(0.002 * nc + 2.0 * (sw / w) - 0.01 * w - 1.0, 6) AS z
      FROM f
    )
    SELECT doc_id, z,
           round(z / (1 + abs(z)), 6) AS quality_score,
           (z / (1 + abs(z)) > 0.2) AS keep
    FROM z
    """,
    tags=("llm", "text", "quality"),
    doc="Linear quality gate with a SOFTSIGN link (z/(1+|z|)) instead of "
    "a sigmoid: the score is a fixed linear model over cheap features "
    "(doc length, stopword ratio, word count). Softsign is chosen "
    "deliberately for cross-engine exactness — it uses only +,*,/,abs "
    "(IEEE-exact, bit-identical in Spark and DuckDB), where exp() in a "
    "sigmoid carries no cross-platform rounding guarantee. The shape "
    "production quality filters take (fasttext-style linear scorer over "
    "handcrafted features), fully codegen, zero shuffles.",
)
def quality_softsign_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = TX.n_words("text").cast("double")
    sw = TX.stopword_count("text").cast("double")
    z = F.round(
        F.lit(0.002) * F.col("n_chars").cast("double")
        + F.lit(2.0) * (sw / w)
        - F.lit(0.01) * w
        - F.lit(1.0),
        6,
    )
    score = z / (F.lit(1.0) + F.abs(z))
    return d.select(
        "doc_id",
        z.alias("z"),
        F.round(score, 6).alias("quality_score"),
        (score > 0.2).alias("keep"),
    )


def _sql_int_pca():
    from hbacker_spark.operators.pca import sql_int_pca_projection

    return sql_int_pca_projection(dim=EMB_DIM)


@register(
    "embedding_pca_projection",
    oracle=_sql_int_pca(),
    tags=("similarity", "llm", "iterative", "statistics"),
    doc="PCA projection of the embedding corpus onto its top-2 "
    "components via seeded INTEGER power iteration (r7 — the "
    "integer-Lloyd playbook that oracled IVF training): one exact "
    "floor-quantized pass for the covariance sufficient statistics "
    "(order-independent int64 partials), 8 driver-side integer power "
    "iterations on the tiny d x d matrix (exact matvec, power-of-two "
    "floor rescale, exact integer deflation for pc2), and a codegen "
    "integer fold projection pass. The published artifact is the "
    "seeded 8-iteration integer subspace — fully value-oracled: DuckDB "
    "unrolls the identical iterations as materialized CTEs. Alignment "
    "with the true numpy eigenbasis is a measured receipt in "
    "tests/test_pca.py (not part of the hash contract). Two corpus "
    "scans total, driver work independent of corpus size.",
)
def embedding_pca_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.operators.pca import (
        int_cov_stats,
        int_power_components,
        int_project,
    )

    e = load_table(spark, sf_dir, "embeddings")
    s1, s2, n = int_cov_stats(e, EMB_DIM)
    comps = int_power_components(s1, s2, n, EMB_DIM, k=2)
    return int_project(e, comps)


@register(
    "dedup_groups_incremental",
    oracle="""
    SELECT md5(text) AS text_hash,
           min(doc_id) AS keeper_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    tags=("llm", "dedup", "incremental"),
    doc="Incremental dedup-state maintenance, proved in the gate: the "
    "corpus is split into two deterministic ingest batches (md5 "
    "bucket), each batch builds its own (text_hash, keeper_id, "
    "n_copies) state, and the states are MERGED (operators/"
    "incremental.py) — the oracle is the plain full-corpus dedup, so "
    "the hash match IS the proof that fold-of-batches == full "
    "recompute. At 100 TB this is the difference between rescanning "
    "history per snapshot session and one state build over the new "
    "batch + one merge shuffle over (stored state ∪ batch state); "
    "min/sum are associative+commutative, so any ingest order agrees "
    "bit-for-bit. 3-way random-split invariance pinned in "
    "tests/test_merge_properties.py.",
)
def dedup_groups_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.operators.incremental import dedup_state, merge_dedup_state

    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long") % 2
    )
    batch0 = d.filter(bucket == 0)
    batch1 = d.filter(bucket == 1)
    return merge_dedup_state(dedup_state(batch0), dedup_state(batch1))


@register(
    "quality_percent_rank_per_source",
    oracle="""
    SELECT doc_id, source, n_chars,
           round(percent_rank() OVER (PARTITION BY source
                                      ORDER BY n_chars, doc_id), 6) AS quality_pct
    FROM documents
    """,
    tags=("llm", "quality", "window", "sampling"),
    doc="Cross-source score calibration: raw quality proxies (here "
    "n_chars) are not comparable across sources with different length "
    "distributions, so mixing pipelines rank-normalize per source — "
    "percent_rank within each source maps every doc onto [0,1] with a "
    "distribution-free, engine-exact definition ((rank-1)/(n-1), ties "
    "broken by doc_id so both engines agree bit-for-bit). Downstream "
    "'keep top 30% of EACH source' gates then cut the same quantile "
    "everywhere regardless of source scale. One window shuffle "
    "partitioned by source — scale-safe. The corpus-wide variant used "
    "to be deliberately absent (a global window serializes onto one "
    "task); it now exists as quality_percent_rank_global via the "
    "two-phase distributed rank.",
)
def quality_percent_rank_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return d.select(
        "doc_id",
        "source",
        "n_chars",
        F.round(F.percent_rank().over(w), 6).alias("quality_pct"),
    )


@register(
    "nucleus_docs_per_source",
    oracle="""
    WITH m AS (
      SELECT doc_id, source, n_chars,
             SUM(n_chars) OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(n_chars) OVER (PARTITION BY source) AS total
      FROM documents
    )
    SELECT doc_id, source, n_chars,
           CAST(cum AS BIGINT) AS cum_chars
    FROM m
    WHERE (cum - n_chars) * 10 < total * 8
    """,
    tags=("llm", "mixture", "window"),
    doc="Per-source nucleus (top-p mass) curation: within each source, "
    "keep the smallest prefix of docs (largest first, id tiebreak) "
    "covering 80% of that source's character mass — the grouped "
    "analog of nucleus sampling, used to cap long-tail noise per "
    "source without a fixed length cutoff. The boundary test is "
    "integer cross-multiplication ((cum-m)*10 < total*8), so no "
    "floating threshold can flip boundary rows between engines. One "
    "shuffle on source; both window sums share the same sort, and the "
    "per-partition total is a frame-free window over the same "
    "exchange — no second shuffle, no driver state.",
)
def nucleus_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    wo = (
        Window.partitionBy("source")
        .orderBy(F.desc("n_chars"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("source")
    m = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.sum("n_chars").over(wo).alias("cum"),
        F.sum("n_chars").over(wall).alias("total"),
    )
    return m.filter(
        (F.col("cum") - F.col("n_chars")) * 10 < F.col("total") * 8
    ).select("doc_id", "source", "n_chars", F.col("cum").cast("bigint").alias("cum_chars"))


# Fixed-point scale for label-centroid sums: float32 inputs scaled by
# 2^30 are already integers (24-bit mantissa), so round() is exact and
# the int64 per-component sums are order-independent on both engines.
CENT_SCALE = 1 << 30
OUTLIER_COS = 0.0


@register(
    "label_centroid_outliers",
    oracle=f"""
    WITH comp AS (
      SELECT label, idx,
             SUM(CAST(round(CAST(embedding[idx] AS DOUBLE) * {float(CENT_SCALE)}, 0) AS BIGINT)) AS s
      FROM embeddings CROSS JOIN generate_series(1, {{EMB_DIM}}) AS g(idx)
      GROUP BY label, idx
    ),
    cent AS (SELECT label, list(s ORDER BY idx) AS cvec FROM comp GROUP BY label)
    SELECT e.vec_id, e.label,
           round({{COS}}, 6) AS cos_centroid,
           round({{COS}}, 6) < {OUTLIER_COS} AS is_outlier
    FROM embeddings e JOIN cent c USING (label)
    """.replace("{EMB_DIM}", str(EMB_DIM)).replace(
        "{COS}",
        f"({S.sql_dot('e.embedding', 'c.cvec')} / "
        f"(sqrt({S.sql_dot('e.embedding', 'e.embedding')}) * sqrt({S.sql_dot('c.cvec', 'c.cvec')})))",
    ),
    tags=("similarity", "llm", "statistics"),
    doc="Mislabeled-point detection: each vector's cosine to its own "
    "label's centroid, flagging vectors pointing away from their class "
    "(the standard training-data QA pass for noisy labels). The "
    "centroid is the UNNORMALIZED per-label sum — cosine is scale-"
    "invariant, so dividing by n is skipped and the sum can stay "
    "integer-exact: float32 components scaled by 2^30 are already "
    "integers, summed as int64 (order-independent, both engines "
    "bit-identical — float centroids would drift with shuffle order). "
    "Plan: posexplode + groupBy(label, idx) with map-side partial "
    "aggregation (the explode collapses to n_labels*dim rows per map "
    "task before the shuffle), tiny centroid table broadcast back, "
    "cosine as the codegen fold. Two corpus scans, one broadcast "
    "join, no Python.",
)
def label_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    comp = (
        e.select("label", F.posexplode("embedding").alias("idx", "x"))
        .groupBy("label", "idx")
        .agg(
            F.sum(
                F.round(F.col("x").cast("double") * F.lit(float(CENT_SCALE)), 0).cast("long")
            ).alias("s")
        )
    )
    cent = comp.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("idx", "s"))), lambda t: t["s"]
        ).alias("cvec")
    )
    joined = e.join(F.broadcast(cent), "label")
    cos = F.round(
        S.dot("embedding", "cvec") / (S.norm("embedding") * S.norm("cvec")), 6
    )
    return joined.select(
        "vec_id",
        "label",
        cos.alias("cos_centroid"),
        (cos < F.lit(OUTLIER_COS)).alias("is_outlier"),
    )


# Expected sample size for the PPS weighted sampler.
PPS_TARGET = 100


@register(
    "weighted_sample_pps",
    oracle=f"""
    WITH tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS w_tot FROM documents),
    p AS (
      SELECT doc_id, source, n_chars,
             LEAST(1.0, {PPS_TARGET}.0 * CAST(n_chars AS DOUBLE) / CAST(w_tot AS DOUBLE)) AS p_raw,
             (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
               / 4294967296.0 AS u
      FROM documents, tot
    )
    SELECT doc_id, source, n_chars,
           round(p_raw, 6) AS p_include,
           round(1.0 / p_raw, 6) AS ht_weight
    FROM p WHERE u < p_raw
    """,
    tags=("sampling", "llm", "deterministic"),
    doc="Weighted (probability-proportional-to-size) Bernoulli sample: "
    "each doc is kept with p = min(1, k*w/W), weight = n_chars, so "
    "long documents — i.e. token mass — are sampled preferentially and "
    "sum(ht_weight * any_stat) over the sample is an unbiased "
    "Horvitz-Thompson estimate of the corpus total. The inclusion draw "
    "u is 32 bits of md5(doc_id) (portable, run-stable); every "
    "arithmetic step (int sum W, k*w, /W, u<p) is IEEE-exact-rounded "
    "from exact integers, so Spark and DuckDB agree BIT-FOR-BIT — "
    "unlike an Efraimidis-Spirakis exp-race key, whose ln() differs "
    "between Java and libm in the last ulp (measured 32/500 rows) and "
    "so cannot be hash-oracled. Scale: W is one tiny agg broadcast "
    "into a stateless filter — no shuffle of the corpus, no driver "
    "loop; expected sample size k regardless of corpus size.",
)
def weighted_sample_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tot = d.agg(F.sum("n_chars").cast("bigint").alias("_w_tot"))
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    p = F.least(
        F.lit(1.0),
        F.lit(float(PPS_TARGET)) * F.col("n_chars").cast("double") / F.col("_w_tot").cast("double"),
    )
    return (
        d.crossJoin(F.broadcast(tot))
        .filter(u < p)
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.round(p, 6).alias("p_include"),
            F.round(F.lit(1.0) / p, 6).alias("ht_weight"),
        )
    )


# Exact duplicated-span census: window width in words. Defined next to
# the incremental state operator so the batch filter, its oracle, and
# span_dedup_state's default can never drift apart (ADVICE r7).
from hbacker_spark.operators.incremental import SPAN_W  # noqa: E402


@register(
    "duplicated_span_census",
    oracle=f"""
    WITH spans AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, len(string_split(text, ' ')) - {SPAN_W - 1}),
               i -> array_to_string(list_slice(string_split(text, ' '), i, i + {SPAN_W - 1}), ' ')
             )) AS span
      FROM documents
      WHERE len(string_split(text, ' ')) >= {SPAN_W}
    )
    SELECT CAST(('0x' || substr(md5(span), 1, 15)) AS BIGINT) AS span_hash,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           COUNT(*) AS n_occurrences,
           min(span) AS sample_span
    FROM spans
    GROUP BY 1
    HAVING COUNT(DISTINCT doc_id) >= 2
    ORDER BY n_docs DESC, n_occurrences DESC, span_hash
    LIMIT 50
    """,
    tags=("llm", "dedup", "text"),
    doc=f"Exact duplicated-span census (the ExactSubstr-style "
    f"memorization audit, cf. dedup literature on repeated training "
    f"spans): every {SPAN_W}-word window is hashed (60 bits of md5 — "
    f"engine-portable) and counted; spans appearing in >=2 distinct "
    f"docs are ranked by spread. Unlike the pairwise dedup family this "
    f"never expands pairs — hot spans just increment counters — so a "
    f"viral boilerplate span costs O(df), not O(df^2). Plan: one "
    f"explode (~n_words rows per doc, linear), one hash-shuffle on "
    f"span_hash with partial aggregation map-side, top-50 via "
    f"TakeOrderedAndProject. The within-doc repeat count is kept "
    f"(n_occurrences counts occurrences, not docs) because "
    f"self-repetition is part of the memorization-risk signal.",
)
def duplicated_span_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13: widen — the span explode multiplies work per input row, and a
    # single-split source otherwise runs the whole explode+hash pass in
    # ONE task (profiled 2.4s single-task stage); no-op on multi-split
    # production inputs.
    d = widen(load_table(spark, sf_dir, "documents"))
    w = F.split(F.col("text"), " ")
    # sequence(1, n) with n < 1 would generate a DESCENDING range in
    # Spark — guard short docs to an empty span list instead.
    idx = F.when(
        F.size(w) >= SPAN_W, F.sequence(F.lit(1), F.size(w) - F.lit(SPAN_W - 1))
    ).otherwise(F.array().cast("array<int>"))
    spans = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i, SPAN_W)))
    exploded = d.select("doc_id", F.explode(spans).alias("span"))
    return (
        exploded.groupBy(
            F.conv(F.substring(F.md5(F.col("span")), 1, 15), 16, 10)
            .cast("long")
            .alias("span_hash")
        )
        .agg(
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("span").alias("sample_span"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), "span_hash")
        .limit(50)
    )


@register(
    "nucleus_docs_global",
    oracle="""
    WITH m AS (
      SELECT doc_id, source, n_chars,
             SUM(n_chars) OVER (ORDER BY n_chars DESC, doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(n_chars) OVER () AS total
      FROM documents
    )
    SELECT doc_id, source, n_chars,
           CAST(cum AS BIGINT) AS cum_chars
    FROM m
    WHERE (cum - n_chars) * 10 < total * 8
    """,
    tags=("llm", "mixture", "rank"),
    doc="CORPUS-GLOBAL nucleus (top-p mass) curation: keep the smallest "
    "prefix of documents (largest first, id tiebreak) covering 80% of "
    "the WHOLE corpus' character mass — the cross-source companion of "
    "nucleus_docs_per_source for budgeting one global token/char "
    "budget. The oracle states it as a global running-sum window; the "
    "engine computes the prefix sums with the two-phase distributed "
    "rank operator (operators/rank.py) — range partition on "
    "(n_chars DESC, doc_id), per-bucket local prefix sums, P-row "
    "offset broadcast — so the corpus-sized input never funnels "
    "through one reducer (the exact failure mode VERDICT r4 #1 flagged "
    "for mixture_interleave). Same integer cross-multiplied boundary, "
    "bit-stable on both engines.",
)
def nucleus_docs_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.operators.rank import with_global_order

    d = load_table(spark, sf_dir, "documents")
    ranked = with_global_order(
        d.select("doc_id", "source", "n_chars"),
        [F.desc("n_chars"), F.col("doc_id")],
        sums=[(F.col("n_chars"), "cum")],
        n_col="_n_docs",
    )
    return ranked.filter(
        (F.col("cum") - F.col("n_chars")) * 10 < F.col("_total_cum") * 8
    ).select("doc_id", "source", "n_chars", F.col("cum").cast("bigint").alias("cum_chars"))


# Non-overlapping dedup-chunk width (chunk_dedup_retention). Distinct
# from SPAN_W (the overlapping audit windows of duplicated_span_census):
# the census COUNTS repeated spans; this query actually REMOVES them and
# accounts for what survives, CCNet-style.
DEDUP_CHUNK_W = 8


@register(
    "chunk_dedup_retention",
    oracle=f"""
    WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    chunks AS (
      SELECT doc_id,
             CAST(s // {DEDUP_CHUNK_W} AS INT) AS chunk_idx,
             array_to_string(ws[s + 1 : s + {DEDUP_CHUNK_W}], ' ') AS chunk
      FROM (SELECT doc_id, ws,
                   unnest(generate_series(0, len(ws) - 1, {DEDUP_CHUNK_W})) AS s
            FROM ws)
    ),
    marked AS (
      SELECT doc_id, length(chunk) AS chunk_chars,
             ROW_NUMBER() OVER (PARTITION BY md5(chunk)
                                ORDER BY doc_id, chunk_idx) AS rn
      FROM chunks
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
           CAST(SUM(CASE WHEN rn = 1 THEN chunk_chars ELSE 0 END) AS BIGINT) AS kept_chars,
           (SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) * 5 < COUNT(*) * 4) AS heavy_dup
    FROM marked
    GROUP BY doc_id
    """,
    tags=("llm", "dedup", "text", "cleaning"),
    doc=f"CCNet-style corpus-level chunk dedup with retention accounting: "
    f"documents are cut into NON-overlapping {DEDUP_CHUNK_W}-word chunks "
    f"(ragged tail kept), each chunk's first occurrence corpus-wide — "
    f"ordered by (doc_id, chunk_idx) — survives, every later duplicate is "
    f"dropped, and the per-document report says how much text the dedup "
    f"pass retained (docs losing >20% of chunks are flagged heavy_dup, the "
    f"CCNet discard signal). Complements duplicated_span_census (the "
    f"overlapping-window AUDIT): this is the FILTER, with the retention "
    f"receipt a curation run needs. Plan: one linear explode, ONE shuffle "
    f"on the chunk hash for a partitioned window (group sizes are "
    f"duplicate multiplicities — bounded, never hot), then a doc_id "
    f"rollup; integer-exact end to end. First-occurrence-wins matches the "
    f"oracle's ROW_NUMBER exactly because the order key (doc_id, "
    f"chunk_idx) is unique.",
)
def chunk_dedup_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = widen(load_table(spark, sf_dir, "documents"))
    chunks = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(split(text, ' ')) - 1, {DEDUP_CHUNK_W}), "
                f"s -> struct(CAST(s / {DEDUP_CHUNK_W} AS INT) AS chunk_idx, "
                f"concat_ws(' ', slice(split(text, ' '), s + 1, {DEDUP_CHUNK_W})) AS chunk))"
            )
        ).alias("c"),
    ).select("doc_id", "c.chunk_idx", "c.chunk")
    w = Window.partitionBy(F.md5(F.col("chunk").cast("binary"))).orderBy(
        "doc_id", "chunk_idx"
    )
    kept = F.when(F.col("rn") == 1, 1).otherwise(0)
    return (
        chunks.withColumn("rn", F.row_number().over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(kept).cast("bigint").alias("kept_chunks"),
            F.sum(
                F.when(F.col("rn") == 1, F.length("chunk")).otherwise(0)
            )
            .cast("bigint")
            .alias("kept_chars"),
            (F.sum(kept) * 5 < F.count(F.lit(1)) * 4).alias("heavy_dup"),
        )
    )


@register(
    "span_removal_filter",
    oracle=f"""
    WITH ws AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
    grams AS (
      SELECT doc_id, s AS p, md5(array_to_string(ws[s + 1 : s + {SPAN_W}], ' ')) AS h
      FROM (SELECT doc_id, ws, unnest(generate_series(0, len(ws) - {SPAN_W})) AS s
            FROM ws WHERE len(ws) >= {SPAN_W})
    ),
    dup AS (
      SELECT doc_id, p FROM (
        SELECT doc_id, p, ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, p) AS rn
        FROM grams) WHERE rn >= 2
    ),
    rem AS (
      SELECT DISTINCT doc_id, p + o.o AS pos
      FROM dup CROSS JOIN generate_series(0, {SPAN_W - 1}) o(o)
    ),
    words AS (
      SELECT doc_id, s AS pos, ws[s + 1] AS word
      FROM (SELECT doc_id, ws, unnest(generate_series(0, len(ws) - 1)) AS s FROM ws)
    ),
    kept AS (
      SELECT w.doc_id, w.pos, w.word
      FROM words w LEFT JOIN rem r ON r.doc_id = w.doc_id AND r.pos = w.pos
      WHERE r.doc_id IS NULL
    ),
    agg AS (
      SELECT doc_id,
             string_agg(word, ' ' ORDER BY pos) AS cleaned_text,
             COUNT(*) AS kept_words
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.cleaned_text, '') AS cleaned_text,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words,
           CAST(COALESCE(a.kept_words, 0) AS BIGINT) AS kept_words,
           CAST(len(string_split(d.text, ' ')) - COALESCE(a.kept_words, 0) AS BIGINT)
             AS removed_words,
           CAST(length(COALESCE(a.cleaned_text, '')) AS BIGINT) AS kept_chars
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    tags=("llm", "dedup", "text", "cleaning"),
    doc=f"ExactSubstr SPAN-REMOVAL filter (r7 — the Lee-et-al dedup step "
    f"between the census and the chunk filter): every OVERLAPPING "
    f"{SPAN_W}-word gram occurrence is ranked corpus-wide by (doc_id, "
    f"pos); any word covered by a non-first gram occurrence is removed "
    f"IN PLACE from the surviving document, first-occurrence-wins, and "
    f"the remainder of the doc is reassembled by integer word position. "
    f"Returns the cleaned corpus itself (production output) plus the "
    f"per-doc retention receipt (n_words / kept_words / removed_words / "
    f"kept_chars). Complements duplicated_span_census (which only "
    f"AUDITS repeated spans) and chunk_dedup_retention (which drops "
    f"whole fixed chunks). Plan: one linear gram explode, ONE window "
    f"shuffle on the gram hash (group sizes = duplicate multiplicity), "
    f"a bounded {SPAN_W}x explode of only the DUPLICATE occurrences, "
    f"and a (doc_id, pos) anti-join + doc_id rollup. Viral-span skew is "
    f"MEASURED, not assumed (skew_smoke.py hot-gram case, SCALE_NOTES "
    f"r8): even a single gram key owning 30% of all gram rows leaves "
    f"the window plan 2.3x FASTER than the skew-proof two-phase "
    f"min-agg+join rewrite, because sort is a small constant of this "
    f"pipeline — the two-phase form stays in skew_smoke.py as the "
    f"escape hatch. The operator rewrites every document, so two "
    f"corpus-sized shuffles is the honest floor. "
    f"Exact integer positions + md5 grams "
    f"end to end: no floats anywhere, both engines agree bit-for-bit. "
    f"Incremental twin: operators/incremental.py span_dedup_state "
    f"(span_removal_incremental proves fold == recompute).",
)
def span_removal_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.operators.rank import tracked_checkpoint

    d = widen(load_table(spark, sf_dir, "documents"))
    # r14 (guide §2.4/§5): the gram explode, the word posexplode, and
    # the n_words projection each re-ran split(text) over the whole
    # corpus (profiled: the two heavy stages both re-read the widened
    # docs and re-split — 14.4s + 10.2s task time at sf0.1). Checkpoint
    # the split ONCE and derive all three consumers from the word
    # array; x10 documents bed: 3.13-3.57s -> ~3.01s, rows identical.
    base = tracked_checkpoint(
        d.select("doc_id", F.split(F.col("text"), " ").alias("ws"))
    )
    grams = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("ws") >= SPAN_W,
                F.expr(
                    f"transform(sequence(0, size(ws) - {SPAN_W}), "
                    f"p -> struct(CAST(p AS INT) AS p, "
                    f"concat_ws(' ', slice(ws, p + 1, {SPAN_W})) AS gram))"
                ),
            ).otherwise(F.expr("CAST(array() AS array<struct<p:int,gram:string>>)"))
        ).alias("g"),
    ).select("doc_id", "g.p", "g.gram")
    w = Window.partitionBy(F.md5(F.col("gram").cast("binary"))).orderBy("doc_id", "p")
    dup = grams.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") >= 2)
    rem = dup.select(
        "doc_id", F.explode(F.expr(f"sequence(p, p + {SPAN_W - 1})")).alias("pos")
    )
    words = base.select("doc_id", F.posexplode("ws").alias("pos", "word"))
    kept = words.join(rem, ["doc_id", "pos"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.expr(
            "concat_ws(' ', transform(sort_array(collect_list(struct(pos, word))), "
            "x -> x.word))"
        ).alias("cleaned_text"),
        F.count(F.lit(1)).alias("kept_words"),
    )
    return (
        base.select("doc_id", F.size("ws").cast("long").alias("n_words"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
            "n_words",
            F.coalesce(F.col("kept_words"), F.lit(0)).cast("long").alias("kept_words"),
            (F.col("n_words") - F.coalesce(F.col("kept_words"), F.lit(0)))
            .cast("long")
            .alias("removed_words"),
            F.length(F.coalesce("cleaned_text", F.lit("")))
            .cast("long")
            .alias("kept_chars"),
        )
    )


@register(
    "span_removal_incremental",
    oracle=f"""
    WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    grams AS (
      SELECT doc_id, s AS p, array_to_string(ws[s + 1 : s + {SPAN_W}], ' ') AS gram
      FROM (SELECT doc_id, ws, unnest(generate_series(0, len(ws) - {SPAN_W})) AS s
            FROM ws WHERE len(ws) >= {SPAN_W})
    )
    SELECT gram_hash, first_doc, first_pos, n_occurrences FROM (
      SELECT md5(gram) AS gram_hash,
             doc_id AS first_doc,
             p AS first_pos,
             CAST(COUNT(*) OVER (PARTITION BY md5(gram)) AS BIGINT) AS n_occurrences,
             ROW_NUMBER() OVER (PARTITION BY md5(gram) ORDER BY doc_id, p) AS rn
      FROM grams) WHERE rn = 1
    """,
    tags=("llm", "dedup", "incremental"),
    doc="Incremental span-dedup-state maintenance, proved in the gate "
    "(the dedup_groups_incremental pattern): the corpus is split into "
    "two deterministic ingest batches (md5 bucket of doc_id), each "
    "batch builds its own (gram_hash, first_doc, first_pos, "
    "n_occurrences) ownership state over OVERLAPPING spans, and the "
    "states are MERGED (operators/incremental.py span_dedup_state / "
    "merge_span_dedup_state). The oracle is the plain full-corpus "
    "first-occurrence ownership, so the hash match IS the proof that "
    "fold-of-batches == full recompute — at 100 TB, span removal over "
    "a growing corpus costs one state build over the new batch plus "
    "one merge over state rows, not a rescan of history. min over the "
    "lexicographic (doc_id, pos) pair and sum are associative+"
    "commutative, so any ingest order agrees bit-for-bit.",
)
def span_removal_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.operators.incremental import (
        merge_span_dedup_state,
        span_dedup_state,
    )

    # r13: widen — both halves run the stride-1 gram explode; a
    # single-split source serializes each half into one task otherwise.
    d = widen(load_table(spark, sf_dir, "documents"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long") % 2
    )
    return merge_span_dedup_state(
        span_dedup_state(d.filter(bucket == 0)),
        span_dedup_state(d.filter(bucket == 1)),
    )


@register(
    "source_divergence_stats",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    st AS (SELECT source, token, COUNT(*) AS tf FROM tok GROUP BY source, token),
    s AS (SELECT source, CAST(SUM(tf) AS BIGINT) AS ns FROM st GROUP BY source),
    t AS (SELECT token, CAST(SUM(tf) AS BIGINT) AS tft FROM st GROUP BY token),
    n AS (SELECT CAST(SUM(tft) AS BIGINT) AS n FROM t),
    terms AS (
      SELECT st.source,
             (CAST(st.tf AS DOUBLE) / CAST(s.ns AS DOUBLE)) AS p,
             (CAST(t.tft AS DOUBLE) / CAST(n.n AS DOUBLE)) AS q,
             t.tft AS tft
      FROM st JOIN s USING (source) JOIN t USING (token) CROSS JOIN n
    ),
    agg AS (
      SELECT source,
             COUNT(*) AS n_distinct_tokens,
             SUM(CAST(round((p - q) * (p - q) / q, 12) AS DECIMAL(38, 12))) AS chi_sum,
             SUM(CAST(round(abs(p - q), 12) AS DECIMAL(38, 12))) AS tv_sum,
             CAST(SUM(tft) AS BIGINT) AS covered
      FROM terms
      GROUP BY source
    )
    SELECT agg.source,
           s.ns AS n_tokens,
           agg.n_distinct_tokens,
           round(CAST(chi_sum AS DOUBLE)
                 + (1.0 - CAST(covered AS DOUBLE) / CAST(n.n AS DOUBLE)), 6) AS chi2_divergence,
           round(0.5 * (CAST(tv_sum AS DOUBLE)
                 + (1.0 - CAST(covered AS DOUBLE) / CAST(n.n AS DOUBLE))), 6) AS tv_distance
    FROM agg JOIN s USING (source) CROSS JOIN n
    """,
    tags=("llm", "mixture", "stats", "text"),
    doc="Domain-shift diagnostics for mixture design: per SOURCE, the "
    "chi-square divergence and total-variation distance between the "
    "source's unigram distribution and the whole-corpus distribution — "
    "the signal data-mixing recipes (DoReMi-style reweighting, domain "
    "upsampling) gate on. Determinism by construction instead of by "
    "luck: every per-token term is built only from IEEE-exact ops "
    "(bigint→double casts <2^53, one divide, subtract, multiply — no "
    "transcendentals), so both engines produce bit-identical term "
    "doubles; terms are rounded to 12 dp, accumulated as DECIMAL(38,12) "
    "(exact, order-independent — the float-sum ordering trap can't "
    "bite), and tokens ABSENT from a source enter via the closed-form "
    "complement (sum over t∉s of q == 1 - covered/N) rather than an "
    "outer join. Plan: one token-explode shuffle, decomposable "
    "aggregations only (skew-proof per SCALE_NOTES even though 'the' "
    "dominates), then a tiny per-source relation joined to two "
    "single-row totals (broadcast).",
)
def source_divergence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.operators.rank import tracked_checkpoint

    d = widen(load_table(spark, sf_dir, "documents"))
    tok = d.select("source", F.explode(F.split("text", " ")).alias("token"))
    # r13: st feeds FOUR consumers (s, t, n, terms) whose pruned copies
    # canonicalize differently, so without materialization the corpus
    # tokenize+aggregate ran 2-4x per query. st is (source, token)-
    # bounded — vocab-sized per source, far below occurrence volume —
    # so checkpointing it once is the 100 TB trade (guide §2.4/§5);
    # n = Σ tft over t == Σ tf over st, so it folds to one st pass too.
    st = tracked_checkpoint(
        tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("tf"))
    )
    s = st.groupBy("source").agg(F.sum("tf").cast("bigint").alias("ns"))
    t = st.groupBy("token").agg(F.sum("tf").cast("bigint").alias("tft"))
    n = st.agg(F.sum("tf").cast("bigint").alias("n"))
    terms = (
        st.join(F.broadcast(s), "source")
        .join(t, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            (F.col("tf").cast("double") / F.col("ns").cast("double")).alias("p"),
            (F.col("tft").cast("double") / F.col("n").cast("double")).alias("q"),
            "tft",
        )
    )
    diff = F.col("p") - F.col("q")
    agg = terms.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_distinct_tokens"),
        F.sum(F.round(diff * diff / F.col("q"), 12).cast("decimal(38,12)")).alias(
            "chi_sum"
        ),
        F.sum(F.round(F.abs(diff), 12).cast("decimal(38,12)")).alias("tv_sum"),
        F.sum("tft").cast("bigint").alias("covered"),
    )
    missing = F.lit(1.0) - F.col("covered").cast("double") / F.col("n").cast("double")
    return (
        agg.join(F.broadcast(s), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            F.col("ns").alias("n_tokens"),
            "n_distinct_tokens",
            F.round(F.col("chi_sum").cast("double") + missing, 6).alias(
                "chi2_divergence"
            ),
            F.round(
                F.lit(0.5) * (F.col("tv_sum").cast("double") + missing), 6
            ).alias("tv_distance"),
        )
    )


@register(
    "quality_percent_rank_global",
    oracle="""
    SELECT doc_id, source, n_chars,
           round(percent_rank() OVER (ORDER BY n_chars, doc_id), 6) AS quality_pct
    FROM documents
    """,
    tags=("llm", "quality", "rank", "sampling"),
    doc="CORPUS-GLOBAL rank normalization: percent_rank over every "
    "document — the cross-source calibration quality_percent_rank_per_"
    "source deliberately avoided while a global ordering meant a "
    "single-reducer sort. With the two-phase distributed rank "
    "(operators/rank.py) it exists scale-safely: percent_rank == "
    "(rank-1)/(n-1) for a tie-broken ordering, computed from the "
    "range-partitioned rank + the P-row total — the oracle states the "
    "plain window, the engine never runs one over the corpus. Use "
    "when one global 'keep top X% of ALL data' gate is wanted instead "
    "of per-source quantile cuts.",
)
def quality_percent_rank_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbacker_spark.operators.rank import with_global_order

    d = load_table(spark, sf_dir, "documents")
    ranked = with_global_order(
        d.select("doc_id", "source", "n_chars"),
        [F.col("n_chars"), F.col("doc_id")],
        rank_col="_rnk",
        n_col="_n",
    )
    return ranked.select(
        "doc_id",
        "source",
        "n_chars",
        F.round(
            (F.col("_rnk") - 1).cast("double") / (F.col("_n") - 1).cast("double"), 6
        ).alias("quality_pct"),
    )


@register(
    "mixture_repeat_upsample",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(len(regexp_extract_all(text, '{TX.TOKEN_PATTERN}')) AS BIGINT) AS n
      FROM documents),
    av AS (SELECT source, SUM(n) AS avail FROM toks GROUP BY source),
    b AS (SELECT MAX(avail) AS budget FROM av),
    r AS (SELECT source, CAST(LEAST(4, (budget + avail - 1) // avail) AS INT) AS n_epochs
          FROM av CROSS JOIN b)
    SELECT t.doc_id, t.source, CAST(g.e AS INT) AS epoch_idx, r.n_epochs
    FROM toks t JOIN r USING (source)
         CROSS JOIN generate_series(1, 4) AS g(e)
    WHERE g.e <= r.n_epochs
    """,
    tags=("llm", "mixture"),
    doc="Epoch-capped repeat upsampling: every source is balanced "
    "toward the LARGEST source's token mass by repeating its documents "
    "ceil(budget/avail) times, capped at 4 epochs — the standard "
    "mixture move for small high-quality sources (repeat wiki, don't "
    "repeat web), emitted as concrete (doc, epoch_idx) training rows. "
    "Integer-exact repeat factors ((budget+avail-1) div avail, "
    "LEAST-capped) so both engines emit identical row sets. Scale "
    "shape: one sources-sized aggregate broadcast back, then a "
    "MAP-SIDE bounded explode (sequence(1, n_epochs), fan-out <= the "
    "epoch cap) — the upsample itself never shuffles, so it streams at "
    "scan speed at 100 TB. Companion to mixture_waterfill_allocation "
    "(which allocates a fixed budget DOWN; this balances sources UP).",
)
def mixture_repeat_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "source", TX.n_tokens().alias("n"))
    av = toks.groupBy("source").agg(F.sum("n").alias("avail"))
    budget = av.agg(F.max("avail").alias("budget"))
    r = av.join(F.broadcast(budget)).select(
        "source",
        F.least(
            F.lit(4),
            F.expr("(budget + avail - 1) div avail"),
        ).cast("int").alias("n_epochs"),
    )
    return (
        toks.join(F.broadcast(r), "source")
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1), F.col("n_epochs"))).alias("_e"),
            "n_epochs",
        )
        .select("doc_id", "source", F.col("_e").cast("int").alias("epoch_idx"), "n_epochs")
    )
