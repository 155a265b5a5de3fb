"""ML / NLP / time-series queries (SURVEY.md §2.12 coverage).

Exact feature engineering, NLP aggregation and CUSUM changepoint are
oracle-checked against DuckDB. Iterative model fits (kmeans, logistic
regression, NBSVM/ShortText SVMs, Baum-Welch, AR/ARIMA) are not
SQL-expressible, so their queries are SELF-VERIFYING: they emit exact
SQL-computable corpus facts plus booleans asserting invariants any
correct fit must satisfy (monotone EM ascent, nested-model SSE bounds,
beats-majority accuracy, optimizer non-regression), and the oracle
asserts those booleans as TRUE literals — a broken fit breaks the
driver hash-match instead of passing a rows-only count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..exactness import davg_sql, dvar_pop_sql
from ..ml import features as FE
from ..ml import models as M
from ..ml import nlp as NLP
from ..ml import timeseries as TS
from ..tables import load_table
from . import query

LANGS = ["de", "en", "es", "fr", "zh"]  # stable across all sf dirs

# ---------------------------------------------------------------------------
# Min-max normalization per event_type (reference normalization golden flow,
# configs/flowtests/normalization.json).
# ---------------------------------------------------------------------------

_MINMAX_ORACLE = """
WITH stats AS (
  SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       (e.value - s.lo) / (s.hi - s.lo) AS value_norm
FROM events e JOIN stats s USING (event_type)
"""


@query("ml_normalize_minmax", oracle=_MINMAX_ORACLE, tags=("ml",))
def ml_normalize_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = FE.normalize_minmax(ev, ["value"], keys=["event_type"])
    return out.select("event_id", "event_type", "value_norm")


# ---------------------------------------------------------------------------
# Z-score normalization (global) with exact decimal-sum mean/variance.
# ---------------------------------------------------------------------------

_ZSCORE_ORACLE = f"""
WITH stats AS (
  SELECT {davg_sql('value')} AS mu, SQRT({dvar_pop_sql('value')}) AS sd
  FROM events
)
SELECT e.event_id, (e.value - s.mu) / s.sd AS value_z
FROM events e CROSS JOIN stats s
"""


@query("ml_normalize_zscore", oracle=_ZSCORE_ORACLE, tags=("ml",))
def ml_normalize_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return FE.normalize_zscore(ev, ["value"], suffix="_z").select(
        "event_id", "value_z"
    )


# ---------------------------------------------------------------------------
# Mean imputation: values < 1.0 treated as missing, refilled with the
# per-type mean of the survivors (reference missing-value imputation).
# ---------------------------------------------------------------------------

_IMPUTE_ORACLE = f"""
WITH holes AS (
  SELECT event_id, event_type,
         CASE WHEN value < 1.0 THEN NULL ELSE value END AS v
  FROM events
), stats AS (
  SELECT event_type, {davg_sql('v')} AS mu FROM holes GROUP BY event_type
)
SELECT h.event_id, h.event_type, COALESCE(h.v, s.mu) AS value_filled
FROM holes h JOIN stats s USING (event_type)
"""


@query("ml_impute_mean", oracle=_IMPUTE_ORACLE, tags=("ml",))
def ml_impute_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.when(F.col("value") < 1.0, F.lit(None)).otherwise(F.col("value")).alias("v"),
    )
    out = FE.impute_mean(ev, ["v"], keys=["event_type"])
    return out.select("event_id", "event_type", F.col("v").alias("value_filled"))


# ---------------------------------------------------------------------------
# Dummy variables over documents.lang (reference dummy-variable processor).
# ---------------------------------------------------------------------------

_DUMMY_ORACLE = "SELECT doc_id, " + ", ".join(
    f"CASE WHEN lang = '{v}' THEN 1 ELSE 0 END AS lang_{v}" for v in LANGS
) + " FROM documents"


@query("ml_dummy_variables", oracle=_DUMMY_ORACLE, tags=("ml",))
def ml_dummy_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = FE.dummy_variables(docs, "lang", categories=LANGS)
    return out.select("doc_id", *[f"lang_{v}" for v in LANGS])


# ---------------------------------------------------------------------------
# NLP: tokenize + stopword removal + corpus top-terms.
# ---------------------------------------------------------------------------

_SW = "', '".join(NLP.DEFAULT_STOPWORDS)
_TOPTERMS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '' AND x NOT IN ('{_SW}'))) AS term
  FROM documents
)
SELECT term, COUNT(*) AS n FROM toks GROUP BY term
ORDER BY n DESC, term ASC LIMIT 50
"""


@query("nlp_top_terms", oracle=_TOPTERMS_ORACLE, tags=("ml", "nlp"))
def nlp_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = NLP.remove_stopwords(NLP.tokenize(F.col("text")))
    return (
        docs.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("term").asc())
        .limit(50)
    )


# ---------------------------------------------------------------------------
# NLP: exact TF-IDF (log-free rarity ratio — bit-portable), top 100.
# ---------------------------------------------------------------------------

_TFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '' AND x NOT IN ('{_SW}'))) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df_t FROM tf GROUP BY term
), n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
SELECT tf.doc_id, tf.term, tf.tf, dfreq.df_t,
       CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE) / CAST(dfreq.df_t AS DOUBLE) AS tfidf
FROM tf JOIN dfreq USING (term) CROSS JOIN n
ORDER BY tfidf DESC, term ASC, doc_id ASC LIMIT 100
"""


@query("nlp_tfidf_top", oracle=_TFIDF_ORACLE, tags=("ml", "nlp"), bench=True)
def nlp_tfidf_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parallel=True (optimization r13): tokenize + explode fed the term
    # repartition from the single-task local scan; interleaved ABAB
    # measured 1.20 -> 0.97 s (min 1.02 -> 0.88). No-op at scale.
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    out = NLP.tf_idf(docs, use_log=False)
    return out.orderBy(
        F.col("tfidf").desc(), F.col("term").asc(), F.col("doc_id").asc()
    ).limit(100)


# ---------------------------------------------------------------------------
# CUSUM changepoint per event_type — exact window algebra.
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH ordered AS (
  SELECT event_type, event_id, CAST(value AS DECIMAL(38,6)) AS v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id) AS t,
         SUM(CAST(value AS DECIMAL(38,6)))
             OVER (PARTITION BY event_type ORDER BY event_id
                   ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(CAST(value AS DECIMAL(38,6))) OVER (PARTITION BY event_type) AS total,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
), scored AS (
  SELECT event_type, event_id, t,
         ABS(n * cum - t * total) AS stat,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ABS(n * cum - t * total) DESC, event_id ASC) AS rk
  FROM ordered
)
SELECT event_type, event_id AS changepoint_at, t AS position,
       CAST(stat AS DOUBLE) AS cusum_stat
FROM scored WHERE rk = 1
"""


@query("ts_changepoint_cusum", oracle=_CUSUM_ORACLE, tags=("ml", "timeseries"))
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return TS.changepoint_cusum(ev, ["event_type"], "event_id", "value")


# ---------------------------------------------------------------------------
# pyspark.ml fits — SELF-VERIFYING oracled rows (approx_sketch pattern):
# the iterative fit itself is not SQL-expressible, so the query emits
# exact SQL-computable corpus facts (hash-matched against DuckDB) plus
# booleans asserting invariants any correct fit must satisfy; the oracle
# asserts the booleans as TRUE literals. A broken fit (degenerate
# clustering, majority-class collapse, non-descending loss) flips a
# boolean and breaks the driver hash-match.
# ---------------------------------------------------------------------------

_KMEANS_ORACLE = """
SELECT COUNT(*) AS n_points, TRUE AS clusters_ok, TRUE AS partition_ok,
       TRUE AS cost_improves
FROM embeddings
"""


@query("ml_kmeans_cluster_sizes", oracle=_KMEANS_ORACLE, tags=("ml",))
def ml_kmeans_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMeans k=8 over the embeddings table, self-verified: n_points is the
    exact corpus size (hash-matched), clusters_ok asserts 2..8 non-empty
    clusters, partition_ok that cluster sizes sum to n_points, and
    cost_improves that the k=8 training cost strictly beats the k=1 cost
    (= total variance, computed in-query) — k-means with 8 seeds on
    non-degenerate data must improve on the single-centroid SSE."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "f", F.col("embedding").cast("array<double>")
    )
    from pyspark.ml.functions import array_to_vector

    vecs = emb.select("vec_id", "f", array_to_vector("f").alias("features"))
    model = M.train(vecs.select("vec_id", "features"), "kmeans", k=8, seed=42)
    cost8 = float(model.stages[-1].summary.trainingCost)
    scored = M.apply_model(vecs.select("vec_id", "features"), model)
    sizes = scored.groupBy("prediction").agg(F.count(F.lit(1)).alias("n"))
    # k=1 cost = sum over dims of (sum(x^2) - sum(x)^2 / n): exact column
    # algebra over the exploded (dim, value) table — no second ML fit needed
    dims = emb.select(F.posexplode("f").alias("i", "x"))
    sse1_row = dims.groupBy("i").agg(
        (F.sum(F.col("x") * F.col("x")) - F.pow(F.sum("x"), 2) / F.count(F.lit(1))).alias("v")
    ).agg(F.sum("v").alias("sse1"))
    stats = sizes.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("n").alias("size_sum"),
    )
    n_points = emb.count()
    return stats.crossJoin(sse1_row).select(
        F.lit(n_points).cast("long").alias("n_points"),
        F.col("n_clusters").between(2, 8).alias("clusters_ok"),
        (F.col("size_sum") == n_points).alias("partition_ok"),
        (F.lit(cost8) < F.col("sse1")).alias("cost_improves"),
    )


_LOGREG_ORACLE = """
SELECT COUNT(*) AS n_rows, COUNT(DISTINCT label) AS n_classes,
       TRUE AS accuracy_ok, TRUE AS beats_majority
FROM embeddings
"""


@query("ml_logreg_accuracy", oracle=_LOGREG_ORACLE, tags=("ml",))
def ml_logreg_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial logistic regression on the embeddings labels,
    self-verified: n_rows/n_classes are exact corpus facts (hash-matched);
    accuracy_ok asserts train accuracy >= 0.25 and beats_majority that it
    strictly beats the majority-class share (~0.13 on 10 roughly-balanced
    labels; measured train accuracy ~0.41-0.45) — a collapsed or
    untrained model fails both."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "f", F.col("embedding").cast("array<double>")
    )
    from pyspark.ml.functions import array_to_vector

    data = emb.select(
        array_to_vector("f").alias("features"), F.col("label").cast("double")
    )
    model = M.train(data, "logistic_regression", label_col="label", maxIter=25, regParam=0.01)
    scored = M.apply_model(data, model)
    return scored.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("label").alias("n_classes"),
        (F.sum((F.col("prediction") == F.col("label")).cast("long"))
         / F.count(F.lit(1))).alias("acc"),
    ).crossJoin(
        scored.groupBy("label").agg(F.count(F.lit(1)).alias("cn"))
        .agg((F.max("cn").cast("double")).alias("maj_n"))
    ).select(
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_classes").cast("long").alias("n_classes"),
        (F.col("acc") >= 0.25).alias("accuracy_ok"),
        (F.col("acc") > F.col("maj_n") / F.col("n_rows")).alias("beats_majority"),
    )


_FPGROWTH_ORACLE = """
WITH baskets AS (
  SELECT user_id, list_sort(list_distinct(list(event_type))) AS items
  FROM events GROUP BY user_id
), n AS (SELECT COUNT(*) AS total FROM baskets),
subsets(itemset) AS (VALUES ('click'), ('error'), ('purchase'), ('signup'), ('view'), ('click,error'), ('click,purchase'), ('click,signup'), ('click,view'), ('error,purchase'), ('error,signup'), ('error,view'), ('purchase,signup'), ('purchase,view'), ('signup,view'), ('click,error,purchase'), ('click,error,signup'), ('click,error,view'), ('click,purchase,signup'), ('click,purchase,view'), ('click,signup,view'), ('error,purchase,signup'), ('error,purchase,view'), ('error,signup,view'), ('purchase,signup,view'), ('click,error,purchase,signup'), ('click,error,purchase,view'), ('click,error,signup,view'), ('click,purchase,signup,view'), ('error,purchase,signup,view'), ('click,error,purchase,signup,view')),
counts AS (
  SELECT s.itemset,
         (SELECT COUNT(*) FROM baskets b
          WHERE list_has_all(b.items, string_split(s.itemset, ','))) AS freq
  FROM subsets s
)
SELECT itemset, freq FROM counts, n WHERE freq >= 0.2 * n.total
"""


@query("ml_fpgrowth_itemsets", oracle=_FPGROWTH_ORACLE, tags=("ml",))
def ml_fpgrowth_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FPGrowth frequent event-type itemsets over per-user baskets
    (reference association-rules processors). Oracle: the 5-type universe
    is small enough to enumerate all 31 subsets and count support in SQL,
    which equals FPGrowth's freqItemsets exactly."""
    ev = load_table(spark, sf_dir, "events")
    baskets = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("items")
    )
    model = M.train(baskets, "fpgrowth", itemsCol="items", minSupport=0.2, minConfidence=0.5)
    freq = model.stages[-1].freqItemsets
    return freq.select(
        F.array_join(F.array_sort("items"), ",").alias("itemset"), "freq"
    ).orderBy(F.col("freq").desc(), F.col("itemset").asc())


_AR_ORACLE = """
SELECT event_type, 5 AS n_forecast, TRUE AS fit_ok, TRUE AS finite_ok
FROM (SELECT DISTINCT event_type FROM events) t
"""


@query("ts_ar_forecast", oracle=_AR_ORACLE, tags=("ml", "timeseries"))
def ts_ar_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(3) forecast of hourly event counts per type, 5 steps ahead —
    SELF-VERIFYING: per series the output row carries the forecast count
    (must be exactly the horizon), finite_ok over the actual forecast
    values, and fit_ok asserting the OLS AR fit's in-sample SSE <= the
    intercept-only model's SSE (a nested-model invariant of least
    squares). The oracle predicts the series keys + horizon from SQL and
    asserts the invariants as TRUE."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    fc = TS.ar_forecast(hourly, ["event_type"], "h", "n", p=3, horizon=5)
    per_key = fc.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("int").alias("n_forecast"),
        F.max(F.isnan("forecast") | F.col("forecast").isNull()).alias("bad"),
    )
    diag = TS.ar_fit_diagnostics(hourly, ["event_type"], "h", "n", p=3)
    return per_key.join(diag, "event_type").select(
        "event_type",
        "n_forecast",
        (F.col("sse_ar") <= F.col("sse_mean") + 1e-6).alias("fit_ok"),
        (~F.col("bad")).alias("finite_ok"),
    )


# ---------------------------------------------------------------------------
# HMM Viterbi decode (models/hmm/ViterbiAlgorithm.scala via ml/hmm.py).
# The decoding model has UNIFORM Pi and A, which makes the Viterbi path
# decouple per timestep — argmax_i B(i, o_t) — so the exact path is
# SQL-expressible and the applyInPandas machinery is oracle-checked
# end-to-end. Full coupled-path Viterbi is pinned by unit test against a
# hand-computed non-uniform fixture (tests/test_hmm.py).
# ---------------------------------------------------------------------------

# symbol order: click, error, purchase, signup, view (alphabetical)
_HMM_B = [
    [0.35, 0.05, 0.05, 0.15, 0.40],  # state 0: "browsing"
    [0.10, 0.15, 0.45, 0.20, 0.10],  # state 1: "buying"
]

_HMM_ORACLE = """
SELECT user_id, event_id,
       CASE WHEN event_type IN ('click', 'view') THEN 0 ELSE 1 END AS state
FROM events
"""


@query("ml_hmm_decode", oracle=_HMM_ORACLE, tags=("ml", "hmm"), bench=True)
def ml_hmm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from ..ml.hmm import HmmModel, hmm_viterbi

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type")
    symbols = ["click", "error", "purchase", "signup", "view"]
    mapping = F.create_map(
        *[x for i, s in enumerate(symbols) for x in (F.lit(s), F.lit(i))]
    )
    obs = ev.withColumn("obs", mapping[F.col("event_type")])
    model = HmmModel(
        pi=np.array([0.5, 0.5]),
        a=np.array([[0.5, 0.5], [0.5, 0.5]]),
        b=np.array(_HMM_B),
    )
    return hmm_viterbi(obs, ["user_id"], "event_id", "obs", model).select(
        "user_id", "event_id", F.col("state").cast("int").alias("state")
    )


_HMM_TRAIN_ORACLE = """
SELECT TRUE AS iters_ok, TRUE AS monotone, TRUE AS pi_ok, TRUE AS a_rows_ok,
       TRUE AS b_rows_ok
"""


@query("ml_hmm_train_loglik", oracle=_HMM_TRAIN_ORACLE, tags=("ml", "hmm"))
def ml_hmm_train_loglik(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Baum-Welch on per-user event-type sequences: 2 hidden
    states, 5 symbols, 5 EM iterations — SELF-VERIFYING: EM's monotone
    likelihood ascent (each iteration's loglik >= the previous, the core
    EM theorem) and stochasticity of the learned model (pi sums to 1,
    every A and B row sums to 1) are computed from the actual training
    history and asserted by the oracle as TRUE literals; a broken E-step
    or M-step renormalization flips them."""
    import numpy as np

    from ..ml.hmm import hmm_baum_welch

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type")
    symbols = ["click", "error", "purchase", "signup", "view"]
    mapping = F.create_map(
        *[x for i, s in enumerate(symbols) for x in (F.lit(s), F.lit(i))]
    )
    obs = ev.withColumn("obs", mapping[F.col("event_type")])
    model, hist = hmm_baum_welch(
        obs, ["user_id"], "event_id", "obs", n_states=2, n_obs=5, iterations=5
    )
    monotone = all(b >= a - 1e-6 for a, b in zip(hist, hist[1:]))
    return spark.createDataFrame(
        [(
            1 <= len(hist) <= 5,
            bool(monotone),
            bool(abs(float(np.sum(model.pi)) - 1.0) < 1e-8),
            bool(np.allclose(model.a.sum(axis=1), 1.0, atol=1e-8)),
            bool(np.allclose(model.b.sum(axis=1), 1.0, atol=1e-8)),
        )],
        "iters_ok boolean, monotone boolean, pi_ok boolean, "
        "a_rows_ok boolean, b_rows_ok boolean",
    )


_ARIMA_ORACLE = """
SELECT event_type, 5 AS n_forecast, TRUE AS refine_ok, TRUE AS finite_ok
FROM (SELECT DISTINCT event_type FROM events) t
"""


@query("ts_arima_forecast", oracle=_ARIMA_ORACLE, tags=("ml", "timeseries"))
def ts_arima_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ARIMA(2,1,1) forecast of hourly event counts per type
    (ARIMA.scala:36-78,404 — Hannan-Rissanen init + CSS refinement +
    differencing/inverse-differencing) — SELF-VERIFYING: per series the
    row carries the forecast count (= horizon), finite_ok over the actual
    forecasts, and refine_ok asserting the CSS log-likelihood after
    Nelder-Mead refinement >= the Hannan-Rissanen starting point (the
    optimizer keeps its best vertex, so regression is impossible for a
    correct implementation)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    fc = TS.arima_forecast(hourly, ["event_type"], "h", "n", p=2, d=1, q=1, horizon=5)
    per_key = fc.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("int").alias("n_forecast"),
        F.max(F.isnan("forecast") | F.col("forecast").isNull()).alias("bad"),
    )
    diag = TS.arima_fit_diagnostics(hourly, ["event_type"], "h", "n", p=2, d=1, q=1)
    return per_key.join(diag, "event_type").select(
        "event_type",
        "n_forecast",
        (F.col("loglik_final") >= F.col("loglik_init") - 1e-6).alias("refine_ok"),
        (~F.col("bad")).alias("finite_ok"),
    )


# ---------------------------------------------------------------------------
# NBSVM (NBSVMProcessor.scala:13; Wang & Manning 2012). The log-count-ratio
# table — the corpus-scale part — is oracled exactly via the log-free odds
# form (multiplication/division are IEEE-exact across engines, ln is not).
# The SVM fit is iterative -> rows-only; accuracy floor pinned in pytest.
# ---------------------------------------------------------------------------

_NBSVM_RATIO_ORACLE = """
WITH lab AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y, text FROM documents
),
tok AS (
  SELECT DISTINCT y, rowid, unnest(string_split(text, ' ')) AS token
  FROM (SELECT y, text, row_number() OVER () AS rowid FROM lab)
),
counts AS (
  SELECT token,
         CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
  FROM tok GROUP BY token
),
tot AS (
  SELECT CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS t1,
         CAST(SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t0,
         COUNT(DISTINCT token) AS v
  FROM tok
)
SELECT token,
       ((n1 + 1.0) / (t1 + 1.0 * v)) / ((n0 + 1.0) / (t0 + 1.0 * v)) AS odds
FROM counts, tot
"""


@query("nlp_nbsvm_ratios", oracle=_NBSVM_RATIO_ORACLE, tags=("ml", "nlp"))
def nlp_nbsvm_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.nbsvm import nb_log_count_ratios

    d = load_table(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("tokens"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )
    return nb_log_count_ratios(d, "tokens", "label", log=False).select(
        "token", F.col("r").alias("odds")
    )


_NBSVM_ACC_ORACLE = """
SELECT COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       TRUE AS accuracy_ok, TRUE AS beats_majority
FROM documents
"""


@query("nlp_nbsvm_accuracy", oracle=_NBSVM_ACC_ORACLE, tags=("ml", "nlp"))
def nlp_nbsvm_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train NBSVM on documents (en vs rest) over unigram+bigram presence
    features and score the same corpus — SELF-VERIFYING: n_docs/n_pos are
    exact corpus facts, accuracy_ok asserts train accuracy >= 0.75 and
    beats_majority that it strictly beats always-predict-majority (the
    corpus shares one 31-token vocabulary across languages, so unigram
    presence alone is inseparable — bigram presence carries the
    per-language co-occurrence signal; measured 0.83-0.89). A
    majority-collapsed SVM fails both booleans."""
    from ..ml.nbsvm import nbsvm_predict, nbsvm_train

    d = (
        load_table(spark, sf_dir, "documents")
        .withColumn("toks", F.split("text", " "))
        .withColumn(
            "bi",
            F.expr(
                "transform(sequence(1, size(toks)-1),"
                " i -> concat(toks[i-1], '_', toks[i]))"
            ),
        )
        .select(
            "doc_id",
            F.concat("toks", "bi").alias("tokens"),
            (F.col("lang") == "en").cast("int").alias("label"),
        )
    )
    model = nbsvm_train(d, "tokens", "label", vocab_size=5000, max_iter=20)
    scored = nbsvm_predict(d, model, "tokens")
    agg = scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("label").cast("long").alias("n_pos"),
        (F.sum((F.col("prediction") == F.col("label")).cast("long"))
         / F.count(F.lit(1))).alias("acc"),
    )
    maj = F.greatest(F.col("n_pos"), F.col("n_docs") - F.col("n_pos")) / F.col("n_docs")
    return agg.select(
        F.col("n_docs").cast("long").alias("n_docs"),
        "n_pos",
        (F.col("acc") >= 0.75).alias("accuracy_ok"),
        (F.col("acc") > maj).alias("beats_majority"),
    )


# ---------------------------------------------------------------------------
# Summarize (nlp/processors/Summarize.scala:14-77): documents have no
# sentence punctuation, so both engines first re-chunk each doc into
# 7-token "sentences", score sentences by mean doc-TF of tokens (len >= 3)
# damped by 2^-|len-5|, and keep the top 2 in document order. base=2 keeps
# every score an exact dyadic rational -> bit-identical ranking.
# ---------------------------------------------------------------------------

_SUMMARIZE_ORACLE = """
WITH toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents
),
sent AS (
  SELECT doc_id, i AS pos,
         array_to_string(tk[(i * 7 + 1):(i * 7 + 7)], ' ') AS sentence
  FROM toks,
       UNNEST(generate_series(0, CAST(ceil(len(tk) / 7.0) AS INT) - 1)) AS g(i)
),
tf AS (
  SELECT doc_id, tok, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY doc_id, tok
),
stok AS (
  SELECT s.doc_id, s.pos, s.sentence, u.tok
  FROM sent s, UNNEST(string_split(s.sentence, ' ')) AS u(tok)
  WHERE len(u.tok) >= 3
),
scored AS (
  SELECT s.doc_id, s.pos, s.sentence,
         COALESCE(agg.score, 0.0) AS score
  FROM sent s
  LEFT JOIN (
    SELECT st.doc_id, st.pos,
           SUM(tf.c) * 1.0 / COUNT(*)
             * power(2.0, -abs(COUNT(*) - 5)) AS score
    FROM stok st JOIN tf ON st.doc_id = tf.doc_id AND st.tok = tf.tok
    GROUP BY st.doc_id, st.pos
  ) agg ON s.doc_id = agg.doc_id AND s.pos = agg.pos
)
SELECT doc_id, string_agg(sentence, '. ' ORDER BY pos) AS summary
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, pos ASC
  ) AS rk
  FROM scored
)
WHERE rk <= 2
GROUP BY doc_id
"""


@query("nlp_summarize_top_sentences", oracle=_SUMMARIZE_ORACLE, tags=("ml", "nlp"))
def nlp_summarize_top_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.nlp import summarize

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tk = F.split("text", " ")
    n_chunks = F.ceil(F.size(tk) / F.lit(7.0)).cast("int")
    sentencized = F.concat_ws(
        ". ",
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(F.slice(tk, i * 7 + 1, 7), " "),
        ),
    )
    tfmap = F.map_from_entries(
        F.transform(
            F.array_distinct(tk),
            lambda t: F.struct(
                t.alias("k"),
                F.size(F.filter(tk, lambda x: x == t)).cast("double").alias("v"),
            ),
        )
    )
    prepared = d.select(
        "doc_id", sentencized.alias("stext"), tfmap.alias("tf")
    )
    out = summarize(
        prepared,
        text_col="stext",
        score_map_col="tf",
        num_lines=2,
        optimal_length=5,
        base=2.0,
        preserve_order=True,
        as_text=True,
    )
    return out.select("doc_id", F.col("summary"))


# ---------------------------------------------------------------------------
# POS tagging + RBEM polarity (POSTagging.scala:17-64, Sentiment.scala:20-75,
# URBEM.scala:43-128). Deterministic fallbacks: lexicon+suffix tagger (the
# SQL CASE oracle is GENERATED from the same rule tables) and exact-match
# seed lexicons with dyadic decay (base 2, clamped distance) so emission
# sums are bit-identical across engines in any summation order.
# ---------------------------------------------------------------------------


def _pos_oracle() -> str:
    from ..ml.rbem import pos_tag_case_sql

    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents
)
SELECT doc_id,
       string_agg({pos_tag_case_sql('tok')}, ' ' ORDER BY i) AS tags
FROM toks GROUP BY doc_id
"""


@query("nlp_pos_tags", oracle=_pos_oracle(), tags=("ml", "nlp"), bench=True)
def nlp_pos_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.rbem import pos_tags

    # NOT parallel=True: the Arrow tagger memoizes per batch, and the
    # corpus vocabulary repeats so heavily that one big batch beats eight
    # small ones (measured 0.64 -> 0.91 s with the repartition)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.select(
        "doc_id",
        F.array_join(pos_tags(F.split("text", " ")), " ").alias("tags"),
    )


# seeds drawn from the corpus vocabulary so emissions are non-trivial:
# 'fast' emits positive, 'slow' negative, 'the' stands in as a right-flip
# negator (synthetic corpus has no sentiment negators).
_RBEM_ORACLE = """
WITH docs AS (
  SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents
),
pos AS (
  SELECT doc_id, unnest(tk) AS tok, generate_subscripts(tk, 1) - 1 AS i
  FROM docs
),
signed AS (
  SELECT doc_id, tok, i,
         CASE WHEN SUM(CASE WHEN tok = 'the' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY i) % 2 = 1
              THEN -1.0 ELSE 1.0 END AS sign
  FROM pos
),
emit AS (
  SELECT p.doc_id, p.i,
         SUM(CASE WHEN s.tok = 'fast'
                  THEN power(2.0, -least(abs(p.i - s.i), 20)) ELSE 0 END) AS ep,
         SUM(CASE WHEN s.tok = 'slow'
                  THEN power(2.0, -least(abs(p.i - s.i), 20)) ELSE 0 END) AS en
  FROM pos p
  JOIN pos s ON p.doc_id = s.doc_id AND s.tok IN ('fast', 'slow')
  GROUP BY p.doc_id, p.i
)
SELECT g.doc_id,
       COALESCE(SUM((e.ep - e.en) * g.sign), 0.0) AS polarity
FROM signed g
LEFT JOIN emit e ON g.doc_id = e.doc_id AND g.i = e.i
GROUP BY g.doc_id
"""


@query("nlp_rbem_polarity", oracle=_RBEM_ORACLE, tags=("ml", "nlp"), bench=True)
def nlp_rbem_polarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.rbem import rbem_polarity

    d = load_table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id", F.split("text", " ").alias("tokens")
    )
    out = rbem_polarity(
        d,
        tokens_col="tokens",
        positive=["fast"],
        negative=["slow"],
        left_flips=[],
        right_flips=["the"],
        decay=2.0,
        max_distance=20,
    )
    return out.select("doc_id", "polarity")


# ---------------------------------------------------------------------------
# Per-language RBEM models (Sentiment.scala loads one binary model per
# language): each document is scored with the model for its `lang`. The
# model map below uses corpus vocabulary so matches actually occur; the
# oracle SQL is GENERATED from the same map (pos_tag_case_sql pattern).
# ---------------------------------------------------------------------------

_RBEM_MULTILANG_MODELS: dict[str, dict[str, list[str]]] = {
    "en": {"positive": ["fast"], "negative": ["slow"], "left_flips": [], "right_flips": ["the"]},
    "de": {"positive": ["big"], "negative": ["small"], "left_flips": [], "right_flips": ["the"]},
    "es": {"positive": ["merge"], "negative": ["scan"], "left_flips": [], "right_flips": ["a"]},
    "fr": {"positive": ["join"], "negative": ["filter"], "left_flips": [], "right_flips": ["a"]},
    "zh": {"positive": ["vector"], "negative": ["batch"], "left_flips": [], "right_flips": ["the"]},
}


def _rbem_multilang_oracle() -> str:
    from ..ml.rbem import rbem_multilang_oracle_sql

    return rbem_multilang_oracle_sql(_RBEM_MULTILANG_MODELS)


@query("nlp_rbem_multilang", oracle=_rbem_multilang_oracle(), tags=("ml", "nlp"))
def nlp_rbem_multilang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.rbem import rbem_polarity_by_lang

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split("text", " ").alias("tokens")
    )
    out = rbem_polarity_by_lang(
        d, tokens_col="tokens", lang_col="lang", models=_RBEM_MULTILANG_MODELS
    )
    return out.select("doc_id", "polarity")


# ---------------------------------------------------------------------------
# FastText fallback: subword n-gram hash vectors (FastTextProcessor.scala:20;
# Bojanowski et al. subword hashing without learned weights). Bucket weights
# are exactly portable: integer counts, IEEE sqrt/div correctly rounded.
# ---------------------------------------------------------------------------

_FASTTEXT_ORACLE = """
WITH grams AS (
  SELECT doc_id, '<' || tok || '>' AS m
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
),
ng AS (
  SELECT doc_id, substr(m, CAST(g.i AS INT), 3) AS gram
  FROM grams,
       UNNEST(generate_series(1, greatest(len(m) - 2, 1))) AS g(i)
),
counts AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(gram), 1, 15) AS BIGINT) % 64 AS bucket,
         COUNT(*) AS c
  FROM ng GROUP BY 1, 2
)
SELECT doc_id, CAST(bucket AS INT) AS bucket,
       CAST(c AS DOUBLE)
         / sqrt(CAST(SUM(c * c) OVER (PARTITION BY doc_id) AS DOUBLE)) AS weight
FROM counts
"""


@query("nlp_fasttext_buckets", oracle=_FASTTEXT_ORACLE, tags=("ml", "nlp"), bench=True)
def nlp_fasttext_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.fasttext import doc_bucket_vectors

    d = load_table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id", F.split("text", " ").alias("tokens")
    )
    return doc_bucket_vectors(d, "tokens", "doc_id", dim=64, n=3)


_FASTTEXT_PAIRS_ORACLE = """
WITH grams AS (
  SELECT doc_id, '<' || tok || '>' AS m
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
),
ng AS (
  SELECT doc_id, substr(m, CAST(g.i AS INT), 3) AS gram
  FROM grams,
       UNNEST(generate_series(1, greatest(len(m) - 2, 1))) AS g(i)
),
counts AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(gram), 1, 15) AS BIGINT) % 64 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM ng GROUP BY 1, 2
),
norms AS (
  SELECT doc_id, CAST(SUM(c * c) AS BIGINT) AS nrm FROM counts GROUP BY doc_id
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(SUM(a.c * b.c) AS BIGINT) AS s
  FROM counts a JOIN counts b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.id_a, p.id_b, p.s, na.nrm AS na, nb.nrm AS nb,
       CAST(p.s AS DOUBLE) / (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE))) AS cosine
FROM pairs p
JOIN norms na ON p.id_a = na.doc_id
JOIN norms nb ON p.id_b = nb.doc_id
WHERE p.s >= 0 AND p.s * p.s * 100 >= 81 * na.nrm * nb.nrm
"""


@query("nlp_fasttext_similar_pairs", oracle=_FASTTEXT_PAIRS_ORACLE, tags=("ml", "nlp"))
def nlp_fasttext_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc pairs with subword-vector cosine >= 0.9 — ORACLED exactly: the
    threshold is evaluated in pure integer algebra over unnormalized hash
    bucket counts (s^2 * 100 >= 81 * |a|^2 * |b|^2), and the reported
    cosine is a fixed chain of correctly-rounded IEEE ops — both engines
    produce bit-identical rows, unlike the float-sum formulation this
    replaces (summation order is engine-dependent)."""
    from ..ml.fasttext import doc_bucket_counts, doc_cosine_pairs_exact

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("tokens")
    )
    cnt = doc_bucket_counts(d, "tokens", "doc_id", dim=64, n=3)
    return doc_cosine_pairs_exact(cnt, "doc_id", min_cosine=0.9).select(
        "id_a", "id_b", F.col("s").cast("long").alias("s"),
        F.col("na").cast("long").alias("na"), F.col("nb").cast("long").alias("nb"),
        "cosine",
    )


# ---------------------------------------------------------------------------
# Token cleanup family (cleanup/Cleanup.scala) + PMI (PMI.scala:6-56).
# Cleanup is pure per-token algebra; the PMI oracle uses the log-free
# ratio (two IEEE divisions — exact across engines; log is monotone so
# ranking semantics are unchanged).
# ---------------------------------------------------------------------------

_CLEANUP_ORACLE = """
SELECT doc_id,
       array_to_string(
         list_transform(
           list_filter(string_split(text, ' '),
                       t -> len(t) > 2 AND NOT regexp_matches(t, '^[[:punct:]]+$')),
           t -> upper(t)),
         ' ') AS cleaned
FROM documents
"""


@query("nlp_cleanup_tokens", oracle=_CLEANUP_ORACLE, tags=("ml", "nlp"))
def nlp_cleanup_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.nlp import remove_punctuation, remove_short_tokens

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split("text", " ")
    cleaned = F.transform(
        remove_short_tokens(remove_punctuation(toks), 2), lambda t: F.upper(t)
    )
    return d.select("doc_id", F.array_join(cleaned, " ").alias("cleaned"))


_PMI_ORACLE = """
WITH docs AS (
  SELECT lang, row_number() OVER () AS did,
         list_distinct(string_split(text, ' ')) AS toks
  FROM documents
),
words AS (
  SELECT lang, did, unnest(toks) AS word FROM docs
),
word_counts AS (
  SELECT lang, word, COUNT(*) AS cnt_v FROM words GROUP BY lang, word
),
seed_docs AS (
  SELECT lang, did, word AS seed FROM words WHERE word IN ('fast', 'slow')
),
n_w AS (
  SELECT lang, seed, COUNT(*) AS n_w FROM seed_docs GROUP BY lang, seed
),
cooc AS (
  SELECT s.lang, s.seed, w.word, COUNT(*) AS cnt_vw
  FROM seed_docs s JOIN words w ON s.lang = w.lang AND s.did = w.did
  GROUP BY s.lang, s.seed, w.word
)
SELECT c.lang, c.seed, c.word,
       (CAST(c.cnt_vw AS DOUBLE) / n.n_w) / wc.cnt_v AS pmi
FROM cooc c
JOIN n_w n ON c.lang = n.lang AND c.seed = n.seed
JOIN word_counts wc ON c.lang = wc.lang AND c.word = wc.word
"""


@query("nlp_pmi_cooccurrence", oracle=_PMI_ORACLE, tags=("ml", "nlp"))
def nlp_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.nlp import pmi_cooccurrence

    d = load_table(spark, sf_dir, "documents").select(
        "lang", F.split("text", " ").alias("tokens")
    )
    return pmi_cooccurrence(d, "tokens", ["fast", "slow"], "lang", log=False)


# ---------------------------------------------------------------------------
# Porter2 (Snowball english) stemming (nlp/processors/Snowball.scala — the
# reference wraps the Tartarus JNI lib; ml/porter2.py is a from-spec
# implementation). The query stems the corpus vocabulary PLUS deterministic
# inflected variants (vocab x suffix grid) so every Porter2 step fires; the
# DuckDB oracle joins the same word grid against a VALUES mapping GENERATED
# at registration by the same porter2_stem over the (fixed, generator-pinned)
# 31-token corpus vocabulary. Algorithm-level independence comes from
# tests/test_porter2.py's hand-checked vectors; this query verifies the
# distributed UDF plumbing end-to-end. A LEFT join keeps unseen vocabulary
# honest: a changed generator wordlist yields NULL oracle stems -> mismatch.
# ---------------------------------------------------------------------------

_STEM_VOCAB = (
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
)

# Suffix grid chosen to exercise steps 0-5: plurals/ies (1a), ed/ing/eed +
# at/bl/iz/double/short-word repair (1b), y->i (1c), the long derivational
# suffixes (2/3), R2 deletions (4) and e/l cleanup (5).
_STEM_SUFFIXES = (
    "", "s", "es", "ies", "ied", "ed", "eed", "eedly", "ing", "ingly",
    "edly", "y", "ation", "ization", "ational", "fulness", "ousness",
    "iveness", "ness", "ment", "ements", "ance", "ence", "er", "li", "ally",
    "ic", "ical", "ative", "izer", "ion", "iti", "alism", "biliti", "ogi",
)


def _stem_oracle() -> str:
    from ..ml.porter2 import porter2_stem

    words = sorted({v + s for v in _STEM_VOCAB for s in _STEM_SUFFIXES})
    mapping = ",\n    ".join(f"('{w}', '{porter2_stem(w)}')" for w in words)
    sufs = ", ".join(f"('{s}')" for s in _STEM_SUFFIXES)
    return f"""
WITH vocab AS (
  SELECT DISTINCT tok FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
  WHERE tok <> ''
),
words AS (
  SELECT DISTINCT v.tok || s.suf AS word
  FROM vocab v CROSS JOIN (VALUES {sufs}) AS s(suf)
),
map AS (
  SELECT * FROM (VALUES
    {mapping}) AS m(word, stem)
)
SELECT w.word AS word, m.stem AS stem
FROM words w LEFT JOIN map m ON w.word = m.word
"""


@query("nlp_stem", oracle=_stem_oracle(), tags=("ml", "nlp"))
def nlp_stem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.porter2 import stem_words

    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    sufs = F.array(*[F.lit(s) for s in _STEM_SUFFIXES])
    words = (
        vocab.select("tok", F.explode(sufs).alias("suf"))
        .select(F.concat("tok", "suf").alias("word"))
        .distinct()
    )
    return words.select("word", stem_words(F.col("word")).alias("stem"))


# ---------------------------------------------------------------------------
# ShortTextClassifier (modules/nlp/app/tuktu/nlp/models/
# ShortTextClassifier.scala:14-220, processors/ShortTextClassifierProcessor
# .scala). The feature construction — the corpus-scaled part — is oracled
# exactly: the ten static style ratios and the seed/flip-processed n-gram
# vocabulary. The OneVsRest LinearSVC fit is iterative -> rows-only;
# accuracy floor pinned in tests/test_shorttext.py.
# ---------------------------------------------------------------------------

_SHORTTEXT_STATICS_ORACLE = r"""
WITH docs AS (
  SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents
),
tokstats AS (
  SELECT doc_id,
         COUNT(*) AS ntok,
         COUNT(*) FILTER (WHERE regexp_matches(tok, '^[[:upper:]]')) AS capw,
         COUNT(*) FILTER (
           WHERE len(tok) > 2 AND regexp_matches(tok, '^[[:upper:]][[:upper:]]')
         ) AS slow
  FROM (SELECT doc_id, unnest(tk) AS tok FROM docs) GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN len(d.text) > 0 THEN
         (len(d.text) - len(regexp_replace(d.text,
            '[!.,?:;''"\[\]{}()\-+=&%$€]', '', 'g'))) * 1.0 / len(d.text)
       ELSE 0.0 END AS punct_ratio,
       CASE WHEN len(d.text) > 0 THEN
         (len(d.text) - len(regexp_replace(d.text, '[[:upper:]]', '', 'g')))
            * 1.0 / len(d.text)
       ELSE 0.0 END AS caps_ratio,
       CASE WHEN len(d.text) > 0 THEN
         (len(d.text) - len(regexp_replace(d.text,
            '[aeoiuyäáàâãëéèêöóòôõïíìîüúùûÿý]', '', 'g'))) * 1.0 / len(d.text)
       ELSE 0.0 END AS vowel_ratio,
       CASE WHEN t.ntok > 0 THEN t.capw * 1.0 / t.ntok ELSE 0.0 END AS cap_words,
       CASE WHEN t.ntok > 0 THEN t.slow * 1.0 / t.ntok ELSE 0.0 END AS slow_release,
       CASE WHEN regexp_matches(substr(d.text, 1, 1), '^[[:upper:]]')
            THEN 1.0 ELSE 0.0 END AS first_cap,
       CASE WHEN len(d.text) <= 10 THEN 1.0 ELSE 0.0 END AS len_short,
       CASE WHEN len(d.text) > 10 AND len(d.text) <= 80 THEN 1.0 ELSE 0.0 END AS len_mid,
       CASE WHEN len(d.text) > 80 THEN 1.0 ELSE 0.0 END AS len_long
FROM docs d JOIN tokstats t USING (doc_id)
"""


@query("nlp_shorttext_statics", oracle=_SHORTTEXT_STATICS_ORACLE, tags=("ml", "nlp"))
def nlp_shorttext_statics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ten static style features per document (getStaticFeatures),
    minus the emoji count (the synthetic corpus has none and DuckDB's RE2
    vs Java regex disagree on surrogate-range classes)."""
    from ..ml.shorttext import static_features

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("tokens")
    )
    s = static_features(F.col("tokens"))
    names = [
        "punct_ratio", "caps_ratio", "vowel_ratio", "cap_words",
        "slow_release", "first_cap", "emojis", "len_short", "len_mid",
        "len_long",
    ]
    cols = [s[i].alias(n) for i, n in enumerate(names) if n != "emojis"]
    return d.select("doc_id", *cols)


def _shorttext_vocab_oracle(min_count: int = 5) -> str:
    return f"""
WITH docs AS (
  SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents
),
pos AS (
  SELECT doc_id, tok, i FROM (
    SELECT doc_id, unnest(tk) AS tok, generate_subscripts(tk, 1) AS i
    FROM docs)
),
proc AS (
  SELECT doc_id, i,
    CASE
      WHEN tok IN ('fast', 'slow') AND (
        (CASE WHEN lag(tok, 1) OVER w = 'the' THEN 1 ELSE 0 END +
         CASE WHEN lag(tok, 2) OVER w = 'the' THEN 1 ELSE 0 END) % 2 = 1)
      THEN (CASE WHEN tok = 'fast' THEN 'pos' ELSE 'neg' END) || '_NEG'
      WHEN tok = 'fast' THEN 'pos'
      WHEN tok = 'slow' THEN 'neg'
      ELSE tok
    END AS ptok
  FROM pos
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
plists AS (
  SELECT doc_id, list(ptok ORDER BY i) AS pl FROM proc GROUP BY doc_id
),
word_grams AS (
  SELECT array_to_string(pl[j:j + n - 1], '') AS ngram
  FROM (
    SELECT pl, n.n AS n,
           unnest(generate_series(1, len(pl) - n.n + 1)) AS j
    FROM plists, (VALUES (1), (2), (3)) AS n(n)
  )
),
char_grams AS (
  SELECT substr(text, CAST(j AS INT), CAST(n AS INT)) AS ngram
  FROM (
    SELECT text, n.n AS n,
           unnest(generate_series(1, len(text) - n.n + 1)) AS j
    FROM docs, (VALUES (3), (4), (5)) AS n(n)
  )
),
counts AS (
  SELECT ngram, COUNT(*) AS count
  FROM (SELECT ngram FROM word_grams UNION ALL SELECT ngram FROM char_grams)
  GROUP BY ngram
)
SELECT ngram, count FROM counts WHERE count >= {min_count}
"""


@query("nlp_shorttext_vocab", oracle=_shorttext_vocab_oracle(), tags=("ml", "nlp"))
def nlp_shorttext_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pruned feature-n-gram vocabulary (trainClassifier's featureMap
    with min_count retention): word 1-3-grams over seed/flip-processed
    tokens (seeds fast->pos / slow->neg, right-flip 'the') plus char
    3-5-grams, counted over the whole corpus."""
    from ..ml.shorttext import ngram_vocabulary

    d = load_table(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("tokens")
    )
    return ngram_vocabulary(
        d, "tokens",
        seed_words={"pos": ["fast"], "neg": ["slow"]},
        right_flips=["the"],
        min_count=5,
    )


_SHORTTEXT_ACC_ORACLE = """
SELECT COUNT(*) AS n_docs, COUNT(DISTINCT lang) AS n_langs,
       TRUE AS accuracy_ok, TRUE AS beats_majority
FROM documents
"""


@query("nlp_shorttext_accuracy", oracle=_SHORTTEXT_ACC_ORACLE, tags=("ml", "nlp"))
def nlp_shorttext_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the 5-class (lang) ShortTextClassifier on documents and score
    the same corpus — SELF-VERIFYING: n_docs/n_langs are exact corpus
    facts; accuracy_ok asserts train accuracy >= 0.9 (measured 0.976) and
    beats_majority that it strictly beats the majority-language share
    (~0.4) — a degenerate OneVsRest fit fails both."""
    from ..ml.shorttext import shorttext_predict, shorttext_train

    lang_code = F.array_position(
        F.array(*[F.lit(lg) for lg in LANGS]), F.col("lang")
    ).cast("double")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.split("text", " ").alias("tokens"),
        lang_code.alias("label"),
    )
    model = shorttext_train(
        d, "tokens", "label",
        seed_words={"pos": ["fast"], "neg": ["slow"]},
        right_flips=["the"],
        min_count=5, vocab_size=10_000, max_iter=15,
    )
    scored = shorttext_predict(d, model, "tokens")
    agg = scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("label").alias("n_langs"),
        (F.sum((F.col("prediction") == F.col("label")).cast("long"))
         / F.count(F.lit(1))).alias("acc"),
    ).crossJoin(
        scored.groupBy("label").agg(F.count(F.lit(1)).alias("cn"))
        .agg(F.max("cn").cast("double").alias("maj_n"))
    )
    return agg.select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_langs").cast("long").alias("n_langs"),
        (F.col("acc") >= 0.9).alias("accuracy_ok"),
        (F.col("acc") > F.col("maj_n") / F.col("n_docs")).alias("beats_majority"),
    )


# ---------------------------------------------------------------------------
# Location detection (nlp/processors/LocationDetectionProcessor.scala:22-180)
# over an inline gazetteer drawn from the corpus vocabulary: token windows
# (1-3 grams) equi-join the broadcast gazetteer, per-doc subsumption drops
# matches contained in a longer match ('fast table' beats 'table'). The
# oracle replicates windows, matching and subsumption in SQL.
# ---------------------------------------------------------------------------

_LOC_GAZ = (
    ("spark", 10.0, 20.0),
    ("window", 30.0, 40.0),
    ("table", 50.0, 60.0),
    ("fast table", 70.0, 80.0),
)


def _location_oracle() -> str:
    gaz = ", ".join(f"('{n}', {lat}, {lon})" for n, lat, lon in _LOC_GAZ)
    return f"""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
wins AS (
  SELECT doc_id, unnest(tk) AS w FROM docs
  UNION ALL
  SELECT doc_id, tk[i] || ' ' || tk[i + 1] AS w
  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i
        FROM docs)
  UNION ALL
  SELECT doc_id, tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2] AS w
  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) AS i
        FROM docs)
),
gaz(name, lat, lon) AS (VALUES {gaz}),
matches AS (
  SELECT DISTINCT doc_id, name, lat, lon
  FROM wins JOIN gaz ON wins.w = gaz.name
),
kept AS (
  SELECT * FROM matches m
  WHERE NOT EXISTS (
    SELECT 1 FROM matches n
    WHERE n.doc_id = m.doc_id AND n.name <> m.name
      AND contains(n.name, m.name)
  )
)
SELECT name, lat, lon, COUNT(*) AS n_docs
FROM kept GROUP BY name, lat, lon
"""


@query("nlp_location_detect", oracle=_location_oracle(), tags=("ml", "nlp"))
def nlp_location_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.location import GAZETTEER_SCHEMA, detect_locations

    gaz = spark.createDataFrame(
        [(n, lat, lon, 0) for n, lat, lon in _LOC_GAZ], GAZETTEER_SCHEMA
    )
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("tokens")
    )
    detected = detect_locations(d, "tokens", gaz, max_window=3)
    return (
        detected.select("doc_id", F.explode("locations").alias("loc"))
        .groupBy(
            F.col("loc.name").alias("name"),
            F.col("loc.lat").alias("lat"),
            F.col("loc.lon").alias("lon"),
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_RHETORICS_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_transform(string_split(text, ' '), t -> lower(t)) AS tk
  FROM documents
),
alli AS (
  SELECT COALESCE(SUM(CASE WHEN substr(tk[CAST(g.i AS INT)], 1, 1)
                              = substr(tk[CAST(g.i AS INT) + 1], 1, 1)
                       THEN 1 ELSE 0 END), 0) AS n
  FROM toks, UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
),
poly AS (
  SELECT COUNT(*) AS n
  FROM toks,
       UNNEST(generate_series(1, len(tk))) AS gi(i),
       UNNEST(generate_series(1, len(tk))) AS gj(j)
  WHERE gj.j > gi.i
    AND len(tk[CAST(gi.i AS INT)]) >= 4 AND len(tk[CAST(gj.j AS INT)]) >= 4
    AND substr(tk[CAST(gi.i AS INT)], 1, 3) = substr(tk[CAST(gj.j AS INT)], 1, 3)
    AND substr(tk[CAST(gi.i AS INT)], 4) <> substr(tk[CAST(gj.j AS INT)], 4)
)
SELECT CAST(alli.n AS BIGINT) AS alliteration, CAST(poly.n AS BIGINT) AS polyptoton,
       TRUE AS others_nonneg
FROM alli, poly
"""


@query("nlp_rhetorics_counts", oracle=_RHETORICS_ORACLE, tags=("ml", "nlp"))
def nlp_rhetorics_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus totals of the ten rhetorical figures (models/Rhetorics.scala
    find) over documents tagged by the heuristic POS tagger — PARTIALLY
    ORACLED: alliteration and polyptoton have closed-form definitions
    (adjacent initial-char match; length>=4 pairs sharing a 3-char stem
    with different endings) that the DuckDB oracle recomputes exactly and
    hash-matches against the Python figure finder's totals; the eight
    branchy phrase-structure figures are asserted non-negative here and
    pinned per-figure by fixtures in tests/test_rhetorics_location.py."""
    from ..ml.rbem import pos_tags
    from ..ml.rhetorics_model import FIGURES
    from ..operators import make_operator

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("tokens")
    ).withColumn("tags", pos_tags(F.col("tokens")))
    counted = make_operator("rhetorics", {})(d)
    totals = counted.select(
        [F.sum(F.col("rhetorics")[f]).alias(f) for f in FIGURES]
    )
    others = [f for f in FIGURES if f not in ("alliteration", "polyptoton")]
    cond = F.lit(True)
    for f in others:
        cond = cond & (F.col(f) >= 0)
    return totals.select(
        F.col("alliteration").cast("long").alias("alliteration"),
        F.col("polyptoton").cast("long").alias("polyptoton"),
        cond.alias("others_nonneg"),
    )


# ---------------------------------------------------------------------------
# Word2Vec nearest words (Word2VecNearestWordsProcessor) — the fit is
# iterative/seeded; SELF-VERIFYING oracle: probe words are drawn from the
# corpus vocabulary (exact SQL facts), each probe returns exactly k
# neighbors with similarities in [-1, 1], sorted descending, never
# containing the probe itself.
# ---------------------------------------------------------------------------

_W2V_ORACLE = """
SELECT 3 AS n_probes, TRUE AS k_each, TRUE AS sims_bounded,
       TRUE AS sorted_desc, TRUE AS no_self
"""


@query("nlp_word2vec_nearest", oracle=_W2V_ORACLE, tags=("ml", "nlp"))
def nlp_word2vec_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import make_operator

    d = load_table(spark, sf_dir, "documents").select("text")
    op = make_operator(
        "word2vec_nearest",
        {"text_field": "text", "words": ["spark", "window", "table"], "k": 5,
         "vector_size": 16, "min_count": 2, "seed": 42},
    )
    out = op(d)
    per_probe = out.groupBy("probe").agg(
        F.count(F.lit(1)).alias("k_got"),
        F.min("similarity").alias("lo"),
        F.max("similarity").alias("hi"),
        F.max((F.col("word") == F.col("probe")).cast("int")).alias("self_hit"),
        (F.collect_list(F.struct(F.col("similarity").alias("s")))).alias("ss"),
    )
    sorted_ok = F.expr(
        "aggregate(sequence(1, size(ss)-1), true,"
        " (acc, i) -> acc AND ss[i-1].s >= ss[i].s - 1e-12)"
    )
    agg = per_probe.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.min(F.col("k_got") == 5).alias("k_each"),
        F.min((F.col("lo") >= -1.0001) & (F.col("hi") <= 1.0001)).alias("sims_bounded"),
        F.min(sorted_ok).alias("sorted_desc"),
        F.min(F.col("self_hit") == 0).alias("no_self"),
    )
    return agg.select(
        F.col("n_probes").cast("int").alias("n_probes"),
        "k_each", "sims_bounded", "sorted_desc", "no_self",
    )


# ---------------------------------------------------------------------------
# Native fastText model loading (FastText.scala / FastTextVectorProcessor):
# document embeddings from a TRAINED .vec model read by the native reader
# (ml/fasttext_io.py — no third-party lib). The bundled mini model's
# components are dyadic rationals (k/32), so the mean of in-vocab word
# vectors is order-free EXACT and the oracle embeds the same model as a
# VALUES table — the loader's parse is hash-checked end to end.
# ---------------------------------------------------------------------------


def _ft_vec_model_path() -> str:
    import os

    from .. import ml as _ml

    return os.path.join(os.path.dirname(_ml.__file__), "data", "mini_fasttext.vec")


def _ft_vec_values() -> str:
    from ..ml.fasttext_io import read_vec

    m = read_vec(_ft_vec_model_path())
    return ", ".join(
        f"('{w}', {j}, {float(v)!r})"
        for w, row in zip(m.words, m.vectors)
        for j, v in enumerate(row)
    )


_FT_VEC_EMBED_ORACLE = f"""
WITH model(word, dim, v) AS (VALUES {_ft_vec_values()}),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
)
SELECT t.doc_id, m.dim, SUM(m.v) / COUNT(*) AS value
FROM toks t JOIN model m ON t.word = m.word
GROUP BY 1, 2
"""


@query("nlp_fasttext_vec_embed", oracle=_FT_VEC_EMBED_ORACLE, tags=("ml", "nlp"))
def nlp_fasttext_vec_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.fasttext import ft_doc_embed_exact
    from ..ml.fasttext_io import read_vec_spark

    vec_df = read_vec_spark(spark, _ft_vec_model_path())
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("tokens")
    )
    return ft_doc_embed_exact(d, vec_df, "tokens", "doc_id")


# ---------------------------------------------------------------------------
# NLP: exact BM25 (log-free rarity idf — bit-portable, same convention as
# nlp_tfidf_top), top 100. The length normalization (dl/avgdl) is what
# tf_idf lacks; the oracle recomputes every factor in the same IEEE order.
# ---------------------------------------------------------------------------

_BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '' AND x NOT IN ('{_SW}'))) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df_t FROM tf GROUP BY term
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS dl_sum FROM dl
)
SELECT tf.doc_id, tf.term, tf.tf, dfreq.df_t, dl.dl,
       ((CAST(n_docs AS DOUBLE) - CAST(df_t AS DOUBLE) + 0.5)
          / (CAST(df_t AS DOUBLE) + 0.5))
       * (CAST(tf AS DOUBLE) * 2.2
          / (CAST(tf AS DOUBLE)
             + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE)
                             / (CAST(dl_sum AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
         AS bm25
FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
ORDER BY bm25 DESC, term ASC, doc_id ASC LIMIT 100
"""


@query("nlp_bm25_top", oracle=_BM25_ORACLE, tags=("ml", "nlp"), bench=True)
def nlp_bm25_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact BM25 over the corpus (k1=1.2, b=0.75, log-free idf for
    bit-portability), top 100 — adds the document-length normalization
    TF-IDF lacks; rides the fused one-term-exchange topology."""
    docs = load_table(spark, sf_dir, "documents")
    out = NLP.bm25(docs, use_log=False)
    return out.orderBy(
        F.col("bm25").desc(), F.col("term").asc(), F.col("doc_id").asc()
    ).limit(100)


# ---------------------------------------------------------------------------
# BM25 top-k retrieval: sum the (bit-portable) per-term scores over a fixed
# query's terms; float SUM order is made engine-portable by summing the
# per-term doubles in term order via DECIMAL-exact accumulation in BOTH
# engines? No — the query terms are FEW (<=3 here), and IEEE addition of 2-3
# doubles in a deterministic order matches when both engines reduce in the
# same order; to remove order dependence entirely the Spark side sorts terms
# and sums via a 2-term expression, and the oracle lists the same terms.
# ---------------------------------------------------------------------------

_BM25_SEARCH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '' AND x NOT IN ('{_SW}'))) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df_t FROM tf GROUP BY term
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS dl_sum FROM dl
), scored AS (
  SELECT tf.doc_id, tf.term,
         ((CAST(n_docs AS DOUBLE) - CAST(df_t AS DOUBLE) + 0.5)
            / (CAST(df_t AS DOUBLE) + 0.5))
         * (CAST(tf AS DOUBLE) * 2.2
            / (CAST(tf AS DOUBLE)
               + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE)
                               / (CAST(dl_sum AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
           AS bm25
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  WHERE tf.term IN ('data', 'model')
)
SELECT doc_id,
       CAST(COALESCE(MAX(CASE WHEN term = 'data' THEN bm25 END), 0)
            + COALESCE(MAX(CASE WHEN term = 'model' THEN bm25 END), 0)
            AS DOUBLE) AS score,
       COUNT(*) AS n_terms
FROM scored GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 20
"""


@query("nlp_bm25_search", oracle=_BM25_SEARCH_ORACLE, tags=("ml", "nlp"))
def nlp_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 BM25 retrieval for the 2-term query 'data model': the
    per-term filter pushes into the fused term exchange; scores sum in
    fixed term order ('data' + 'model') so the oracle's addition order
    matches bitwise."""
    docs = load_table(spark, sf_dir, "documents")
    scored = NLP.bm25(docs, use_log=False)
    per = (
        scored.filter(F.col("term").isin(["data", "model"]))
        .groupBy("doc_id")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("term") == "data", F.col("bm25"))), F.lit(0.0)
            ).alias("s_data"),
            F.coalesce(
                F.max(F.when(F.col("term") == "model", F.col("bm25"))), F.lit(0.0)
            ).alias("s_model"),
            F.count(F.lit(1)).alias("n_terms"),
        )
    )
    return (
        per.select(
            "doc_id",
            (F.col("s_data") + F.col("s_model")).alias("score"),
            "n_terms",
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )
