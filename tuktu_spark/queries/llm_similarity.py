"""Similarity-search queries over the embeddings table: exact brute-force
top-k (the baseline) and sign-bucketed IVF/LSH top-k (the scale path).

Cosine math is explicit left-fold double arithmetic in BOTH engines
(Spark F.aggregate == DuckDB list_reduce) — bit-identical scores, so even
ranks compare exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm import similarity as S
from ..tables import load_table
from . import query

_N_QUERIES = 10
_K = 5

_DOT = (
    "list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}),"
    " x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), (acc, v) -> acc + v)"
)
_NORM = (
    "list_reduce(list_prepend(0.0, list_transform({a},"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (acc, v) -> acc + v)"
)


def _cosine_sql(a: str, b: str) -> str:
    return (
        f"{_DOT.format(a=a, b=b)} / "
        f"(sqrt({_NORM.format(a=a)}) * sqrt({_NORM.format(a=b)}))"
    )


_BRUTE_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {_N_QUERIES}
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_cosine_sql('q.qv', 'e.embedding')} AS cosine
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine
FROM ranked WHERE rank <= {_K}
"""


@query("similarity_topk_bruteforce", oracle=_BRUTE_ORACLE, tags=("llm", "similarity"), bench=True)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parallel=True (optimization r13): the corpus side of the brute-force
    # dot-product ran on the single-task local scan; interleaved ABAB
    # measured 0.82 -> 0.52 s. No-op at scale.
    emb = load_table(spark, sf_dir, "embeddings", parallel=True)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return S.brute_force_topk(emb, queries, k=_K)


_BUCKET_SQL = (
    "list_reduce(list_prepend(0, list_transform({v}[1:8],"
    " x -> CASE WHEN CAST(x AS DOUBLE) >= 0 THEN 1 ELSE 0 END)), (a, b) -> a * 2 + b)"
)

_IVF_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding, {_BUCKET_SQL.format(v='embedding')} AS bucket
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, embedding AS qv, bucket FROM e WHERE vec_id < {_N_QUERIES}
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_cosine_sql('q.qv', 'e.embedding')} AS cosine
  FROM q JOIN e ON e.bucket = q.bucket AND e.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine
FROM ranked WHERE rank <= {_K}
"""


@query("similarity_topk_ivf_bucketed", oracle=_IVF_ORACLE, tags=("llm", "similarity"))
def similarity_topk_ivf_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return S.ivf_bucketed_topk(emb, queries, k=_K, bits=8)


# ---------------------------------------------------------------------------
# Centroid distance per label — k-means-adjacent fixture: mean vector per
# label then each vector's cosine to its label centroid. Exact: per-dim sums
# are left-fold free (elementwise aggregate of doubles is order-dependent!)
# so the centroid uses decimal-exact per-dimension sums.
# ---------------------------------------------------------------------------

_CENTROID_ORACLE = """
WITH exploded AS (
  SELECT label,
         generate_subscripts(embedding, 1) AS i,
         unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
  FROM embeddings
), dims AS (
  SELECT label, i,
         CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS c,
         COUNT(*) AS n
  FROM exploded
  GROUP BY label, i
)
SELECT label, CAST(SUM(n) / 64 AS BIGINT) AS n_vectors,
       CAST(SUM(CAST(c * c AS DECIMAL(38,12))) AS DOUBLE) AS centroid_norm_sq
FROM dims GROUP BY label
"""


@query("similarity_label_centroids", oracle=_CENTROID_ORACLE, tags=("llm", "similarity"))
def similarity_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # explode to (label, dim_index, value): per-dimension exact mean, then
    # reassemble the centroid's squared norm — all shuffles carry scalars.
    dims = emb.select(
        "label",
        F.posexplode(F.col("embedding")).alias("i0", "x"),
    ).select("label", (F.col("i0") + 1).alias("i"), F.col("x").cast("double").alias("x"))
    cent = dims.groupBy("label", "i").agg(
        (F.sum(F.col("x").cast("decimal(38,12)")).cast("double") / F.count(F.lit(1))).alias("c"),
        F.count(F.lit(1)).alias("n"),
    )
    return cent.groupBy("label").agg(
        (F.sum("n") / 64).cast("bigint").alias("n_vectors"),
        F.sum(((F.col("c") * F.col("c")).cast("decimal(38,12)"))).cast("double").alias("centroid_norm_sq"),
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs (the fourth dedup modality of the
# LLM-pipeline north star): sign-bucketed candidate join + exact cosine.
# ---------------------------------------------------------------------------

_NEARDUP_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding, {_BUCKET_SQL.format(v='embedding')} AS bucket
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_cosine_sql('a.embedding', 'b.embedding')} AS cosine
FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_cosine_sql('a.embedding', 'b.embedding')} >= 0.3
"""


@query("dedup_embedding_cosine", oracle=_NEARDUP_ORACLE, tags=("llm", "dedup", "similarity"))
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.embedding_near_dup_pairs(emb, threshold=0.3)


# ---------------------------------------------------------------------------
# Embedding quantization (no reference analogue; standard vector-store
# practice): symmetric int8 codes, per-vector scale. Codes are exactly
# engine-portable (max/div/round are IEEE-deterministic), so the oracle
# checks them bit-for-bit; output exploded to scalar columns.
# ---------------------------------------------------------------------------

_QUANT_ORACLE = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
s AS (
  SELECT vec_id, e,
         CASE WHEN list_aggregate(list_transform(e, x -> abs(x)), 'max') = 0
              THEN 1.0
              ELSE list_aggregate(list_transform(e, x -> abs(x)), 'max') / 127.0
         END AS scale
  FROM v
)
SELECT vec_id, CAST(g.i AS INT) AS i,
       CAST(round(e[CAST(g.i AS INT)] / scale) AS INT) AS code,
       scale
FROM s, UNNEST(generate_series(1, len(e))) AS g(i)
"""


@query("similarity_quantize_codes", oracle=_QUANT_ORACLE, tags=("llm", "similarity"))
def similarity_quantize_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.similarity import quantize_embedding

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.select("vec_id", quantize_embedding(F.col("embedding")).alias("q"))
    return q.select(
        "vec_id",
        F.posexplode(F.col("q.codes")).alias("i0", "code"),
        F.col("q.scale").alias("scale"),
    ).select(
        "vec_id", (F.col("i0") + 1).alias("i"), "code", "scale"
    )


_IVF_KMEANS_ORACLE = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS recall_ok,
       TRUE AS per_query_ok
FROM embeddings WHERE vec_id < {_N_QUERIES}
"""


@query("similarity_topk_ivf_kmeans", oracle=_IVF_KMEANS_ORACLE, tags=("llm", "similarity"))
def similarity_topk_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means IVF ANN (FAISS IVF-flat layout): 16 trained coarse
    centroids, queries probe their 8 nearest inverted lists —
    SELF-VERIFYING: the query ALSO runs exact brute-force top-k and
    computes ANN recall against it in-plan; recall_ok asserts mean recall
    >= 0.6 at n_probe=8 (measured ~0.9 probing half the lists) and
    per_query_ok that no query emits more than k results. n_queries is an
    exact corpus fact. A mis-trained index or broken list routing drops
    recall below the floor and breaks the hash-match."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    cents = S.train_ivf_centroids(emb, nlist=16)
    ann = S.ivf_kmeans_topk(emb, queries, cents, k=_K, n_probe=8)
    bf = S.brute_force_topk(emb, queries, k=_K)
    hits = bf.select("query_id", "neighbor_id").join(
        ann.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
    )
    per_q = ann.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_ann"))
    n_bf = bf.count()
    n_hits = hits.count()
    max_per_q = per_q.agg(F.max("n_ann").alias("m"))
    return max_per_q.select(
        F.lit(queries.count()).cast("long").alias("n_queries"),
        F.lit(n_hits / max(n_bf, 1) >= 0.6).alias("recall_ok"),
        (F.col("m") <= _K).alias("per_query_ok"),
    )


_PQ_ORACLE = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS recall_ok,
       TRUE AS per_query_ok
FROM embeddings WHERE vec_id < {_N_QUERIES}
"""


@query("similarity_topk_pq", oracle=_PQ_ORACLE, tags=("llm", "similarity"))
def similarity_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (FAISS PQ/ADC layout, Jégou et al.):
    16 subspaces x 16 centroids compress each 64-dim vector to 16 codes
    (16x), ADC table lookups scan the whole corpus, a 50-candidate
    shortlist is re-ranked with exact cosine — SELF-VERIFYING: recall_ok
    asserts mean recall vs in-plan brute force >= 0.6 (measured
    0.84-0.86) and per_query_ok bounds results per query; n_queries is an
    exact corpus fact. Vectors are unit-normalized first so ADC's L2
    ordering matches the cosine truth."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    embn = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double") / norm).alias("embedding")
    )
    queries = embn.filter(F.col("vec_id") < _N_QUERIES)
    books = S.train_pq_codebooks(embn, m=16, k=16)
    enc = S.pq_encode(embn, books)
    ann = S.pq_rerank_topk(enc, queries, books, k=_K, shortlist=50)
    bf = S.brute_force_topk(embn, queries, k=_K)
    hits = bf.select("query_id", "neighbor_id").join(
        ann.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
    )
    n_bf = bf.count()
    n_hits = hits.count()
    per_q = ann.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_ann"))
    return per_q.agg(F.max("n_ann").alias("m")).select(
        F.lit(queries.count()).cast("long").alias("n_queries"),
        F.lit(n_hits / max(n_bf, 1) >= 0.6).alias("recall_ok"),
        (F.col("m") <= _K).alias("per_query_ok"),
    )


_IVF_INDEX_ORACLE = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS index_matches_direct,
       TRUE AS bucket_pruned
FROM embeddings WHERE vec_id < {_N_QUERIES}
"""


@query("similarity_topk_ivf_index", oracle=_IVF_INDEX_ORACLE, tags=("llm", "similarity"))
def similarity_topk_ivf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-once/ANN-query-many (round 5): the IVF inverted lists are
    materialized as a list_id-bucketed managed table; queries probe their
    n_probe nearest lists and the scan reads ONLY those buckets (Spark
    bucket pruning on the probe-set IN filter). SELF-VERIFYING:
    index_matches_direct asserts the indexed top-k equals the direct
    ivf_kmeans_topk result row-for-row, bucket_pruned asserts the
    physical scan carries SelectedBucketsCount; n_queries is an exact
    corpus fact."""
    import uuid

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    cents = S.train_ivf_centroids(emb, nlist=16)
    table = f"ivf_idx_q_{uuid.uuid4().hex[:8]}"
    S.write_ivf_index(emb, table, cents, buckets=16)
    try:
        direct = S.ivf_kmeans_topk(emb, queries, cents, k=_K, n_probe=8)
        indexed = S.ivf_topk_from_index(
            spark, table, queries, cents, k=_K, n_probe=8
        )
        plan = indexed._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        a = direct.select("query_id", "rank", "neighbor_id")
        b = indexed.select("query_id", "rank", "neighbor_id")
        n_direct = a.count()
        n_same = a.join(b, ["query_id", "rank", "neighbor_id"]).count()
        n_indexed = b.count()
        return spark.range(1).select(
            F.lit(queries.count()).cast("long").alias("n_queries"),
            F.lit(n_direct == n_same and n_indexed == n_direct).alias(
                "index_matches_direct"
            ),
            F.lit("SelectedBucketsCount" in plan).alias("bucket_pruned"),
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


_IVF_APPEND_ORACLE = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS append_matches_rebuild,
       TRUE AS bucket_pruned
FROM embeddings WHERE vec_id < {_N_QUERIES}
"""


@query("similarity_ivf_index_append", oracle=_IVF_APPEND_ORACLE, tags=("llm", "similarity"))
def similarity_ivf_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index append (round 6, verdict #4): centroids are
    trained on the FIRST batch only; the second batch is appended by
    assigning to those existing centroids (llm/similarity.
    append_ivf_index — batch-vs-corpus, never a retrain). SELF-VERIFYING:
    append_matches_rebuild asserts the probe over (write A, append B)
    equals row-for-row the probe over a full rewrite of A∪B with the SAME
    centroids — i.e. appending is exactly incremental; bucket_pruned
    asserts the appended index still prunes buckets
    (SelectedBucketsCount in the physical probe scan)."""
    import uuid

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    batch_a = emb.filter(F.col("vec_id") % 2 == 0)
    batch_b = emb.filter(F.col("vec_id") % 2 == 1)
    cents = S.train_ivf_centroids(batch_a, nlist=16)
    t_inc = f"ivf_app_q_{uuid.uuid4().hex[:8]}"
    t_full = f"{t_inc}_full"
    spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        "centroid_id int, centroid array<double>",
    ).write.mode("overwrite").saveAsTable(f"{t_inc}_centroids")
    S.write_ivf_index(batch_a, t_inc, cents, buckets=16)
    S.append_ivf_index(batch_b, t_inc, buckets=16)
    S.write_ivf_index(emb, t_full, cents, buckets=16)
    try:
        inc = S.ivf_topk_from_index(spark, t_inc, queries, cents, k=_K, n_probe=8)
        full = S.ivf_topk_from_index(spark, t_full, queries, cents, k=_K, n_probe=8)
        plan = inc._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        a = inc.select("query_id", "rank", "neighbor_id")
        b = full.select("query_id", "rank", "neighbor_id")
        n_full = b.count()
        n_same = a.join(b, ["query_id", "rank", "neighbor_id"]).count()
        n_inc = a.count()
        return spark.range(1).select(
            F.lit(queries.count()).cast("long").alias("n_queries"),
            F.lit(n_inc == n_full and n_same == n_full).alias(
                "append_matches_rebuild"
            ),
            F.lit("SelectedBucketsCount" in plan).alias("bucket_pruned"),
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_inc}")
        spark.sql(f"DROP TABLE IF EXISTS {t_inc}_centroids")
        spark.sql(f"DROP TABLE IF EXISTS {t_full}")
        spark.sql(f"DROP TABLE IF EXISTS {t_full}_centroids")


_SEMDEDUP_N_SEEDS = 8
_SEMDEDUP_EPS = 0.7  # synthetic embeddings are near-orthogonal; 1-eps=0.3
                     # matches the dedup_embedding_cosine threshold band

_L2_SQL = (
    "list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}),"
    " x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))"
    " * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))), (acc, v) -> acc + v)"
)

_SEMDEDUP_ORACLE = f"""
WITH cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS cidx,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings WHERE vec_id < {_SEMDEDUP_N_SEEDS}
),
e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
asg AS (
  SELECT e.vec_id, e.v, c.cidx, c.cv,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY {_L2_SQL.format(a='e.v', b='c.cv')}, c.cidx) AS rk
  FROM e CROSS JOIN cent c
),
cs AS (
  SELECT vec_id, v, CAST(cidx AS INT) AS cluster_id,
         {_cosine_sql('v', 'cv')} AS cent_sim
  FROM asg WHERE rk = 1
),
dropped AS (
  SELECT DISTINCT x.vec_id FROM cs x JOIN cs y
    ON x.cluster_id = y.cluster_id AND x.vec_id <> y.vec_id
  WHERE {_cosine_sql('x.v', 'y.v')} >= {1.0 - _SEMDEDUP_EPS}
    AND (y.cent_sim < x.cent_sim
         OR (y.cent_sim = x.cent_sim AND y.vec_id < x.vec_id))
)
SELECT c.vec_id, c.cluster_id, c.cent_sim,
       d.vec_id IS NULL AS keep
FROM cs c LEFT JOIN dropped d ON c.vec_id = d.vec_id
"""


@query("dedup_semdedup", oracle=_SEMDEDUP_ORACLE, tags=("llm", "dedup", "similarity"))
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster-scoped semantic dedup — the
    100 TB shape for embedding-level near-dup removal (corpus shuffles
    once on cluster id; pair work bounded per cluster; the paper scales
    the cluster count with the corpus). For oracle determinism the
    quantizer here is the SEED assignment (centroids = the first
    {n} vectors by id — k-means init without iterations); the operator
    trains real k-means centroids in production. Assignment distance,
    centroid similarity and pair cosines are sequential folds, so DuckDB
    reproduces every keep/drop decision bit-for-bit."""
    emb = load_table(spark, sf_dir, "embeddings")
    seeds = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < _SEMDEDUP_N_SEEDS)
        .orderBy("vec_id")
        .collect()
    ]
    return S.semdedup(emb, seeds, eps=_SEMDEDUP_EPS)


_IVFPQ_ORACLE = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS index_matches_direct,
       TRUE AS bucket_pruned, TRUE AS recall_ok
FROM embeddings WHERE vec_id < {_N_QUERIES}
"""


@query("similarity_ivfpq_topk", oracle=_IVFPQ_ORACLE, tags=("llm", "similarity"))
def similarity_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composite ANN (Jégou et al. 2011; llm/similarity.py): coarse
    lists prune the corpus, PQ codes of the residual make the in-list
    scan m table-lookups per candidate, exact cosine re-ranks only the
    shortlist. SELF-VERIFYING: index_matches_direct pins the bucketed
    index-table path row-for-row equal to the in-plan direct path;
    bucket_pruned asserts the probe scan physically prunes to the probed
    lists' buckets (SelectedBucketsCount); recall_ok pins recall@k vs
    exact brute force >= 0.5 at n_probe=nlist/2 (measured ~0.9 — the
    bound is a floor, not the expectation); n_queries is the exact
    corpus fact the oracle recomputes."""
    import uuid

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    cents, books = S.train_ivfpq(emb, nlist=16, m=4, k_codes=16)
    table = f"ivfpq_idx_q_{uuid.uuid4().hex[:8]}"
    S.write_ivfpq_index(emb, table, cents, books, buckets=16)
    try:
        direct = S.ivfpq_topk(
            emb, queries, cents, books, k=_K, n_probe=8, shortlist=50
        )
        indexed = S.ivfpq_topk_from_index(
            spark, table, queries, cents, books, k=_K, n_probe=8, shortlist=50
        )
        plan = indexed._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        a = direct.select("query_id", "rank", "neighbor_id")
        b = indexed.select("query_id", "rank", "neighbor_id")
        n_direct = a.count()
        n_same = a.join(b, ["query_id", "rank", "neighbor_id"]).count()
        n_indexed = b.count()
        bf = S.brute_force_topk(emb, queries, k=_K)
        want = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
        got = {(r["query_id"], r["neighbor_id"]) for r in indexed.collect()}
        recall = len(want & got) / len(want) if want else 1.0
        return spark.range(1).select(
            F.lit(queries.count()).cast("long").alias("n_queries"),
            F.lit(n_direct == n_same and n_indexed == n_direct).alias(
                "index_matches_direct"
            ),
            F.lit("SelectedBucketsCount" in plan).alias("bucket_pruned"),
            F.lit(recall >= 0.5).alias("recall_ok"),
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


# ---------------------------------------------------------------------------
# Embedding-level decontamination (llm/decontaminate.semantic_decontaminate):
# corpus rows cosine-similar to ANY eval vector are dropped. Same fold-order
# cosine in both engines; eval side broadcasts, corpus never shuffles.
# ---------------------------------------------------------------------------

_SEMDECON_N_EVAL = 8
_SEMDECON_T = 0.7

_SEMDECON_ORACLE = f"""
WITH ev AS (
  SELECT embedding AS evv FROM embeddings WHERE vec_id < {_SEMDECON_N_EVAL}
),
hits AS (
  SELECT DISTINCT e.vec_id
  FROM embeddings e, ev
  WHERE {_cosine_sql('e.embedding', 'ev.evv')} >= {_SEMDECON_T}
)
SELECT vec_id FROM embeddings
WHERE vec_id NOT IN (SELECT vec_id FROM hits)
"""


@query("dedup_semantic_decontam", oracle=_SEMDECON_ORACLE, tags=("llm", "dedup", "similarity"))
def dedup_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination: corpus minus everything embedding-close
    to the 8-vector eval slice (threshold 0.7) — catches paraphrased
    leakage the 13-gram filter misses. Broadcast nested-loop on the
    eval side + broadcast anti join: the corpus never shuffles."""
    from ..llm.decontaminate import semantic_decontaminate

    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("vec_id") < _SEMDECON_N_EVAL)
    out = semantic_decontaminate(
        emb, ev, threshold=_SEMDECON_T,
        corpus_vec="embedding", corpus_id="vec_id", eval_vec="embedding",
    )
    return out.select("vec_id")
