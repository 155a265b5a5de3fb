"""IVF-PQ composite ANN (llm/similarity.py): residual encoding, ADC
scoring vs a pure-numpy reference, index-path equality, recall floor,
and the operator pair."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import tuktu_spark.llm.similarity as S

NLIST, M, KC = 4, 2, 4
DIM = 6


def _vectors(n=60, seed=3):
    rng = np.random.RandomState(seed)
    base = rng.randn(NLIST, DIM) * 4
    rows = []
    for i in range(n):
        c = i % NLIST
        rows.append((i, (base[c] + rng.randn(DIM) * 0.5).tolist()))
    return rows


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        _vectors(), "vec_id long, embedding array<double>"
    ).cache()


@pytest.fixture(scope="module")
def model(emb):
    return S.train_ivfpq(emb, nlist=NLIST, m=M, k_codes=KC)


class TestEncode:
    def test_codes_shape_and_range(self, emb, model):
        cents, books = model
        enc = S.ivfpq_assign_encode(emb, cents, books).collect()
        assert len(enc) == 60
        for r in enc:
            assert 1 <= r["list_id"] <= NLIST
            assert len(r["pq_codes"]) == M
            assert all(0 <= c < KC for c in r["pq_codes"])

    def test_codes_encode_residual_not_raw(self, emb, model):
        # decoding code centroids + coarse centroid approximates the
        # vector better than the coarse centroid alone
        cents, books = model
        C = np.asarray(cents)
        bks = [np.asarray(b) for b in books]
        d_sub = DIM // M
        err_pq, err_coarse = 0.0, 0.0
        for r in S.ivfpq_assign_encode(emb, cents, books).collect():
            v = np.asarray(r["nv"])
            c = C[r["list_id"] - 1]
            recon = c + np.concatenate(
                [bks[j][r["pq_codes"][j]] for j in range(M)]
            )
            err_pq += ((v - recon) ** 2).sum()
            err_coarse += ((v - c) ** 2).sum()
        assert err_pq < err_coarse

    def test_adc_matches_numpy_reference(self, spark, emb, model):
        cents, books = model
        C = np.asarray(cents)
        bks = [np.asarray(b) for b in books]
        d_sub = DIM // M
        enc = {r["vec_id"]: r for r in
               S.ivfpq_assign_encode(emb, cents, books)
               .withColumnRenamed("neighbor_id", "vec_id").collect()}
        queries = emb.filter(F.col("vec_id") < 2)
        got = S.ivfpq_topk(
            emb, queries, cents, books, k=60, n_probe=NLIST, shortlist=1000
        ).collect()
        # with full probing + unbounded shortlist, the final ranking is
        # the EXACT cosine over all non-self rows — brute force
        bf = {(r["query_id"], r["rank"]): r["neighbor_id"]
              for r in S.brute_force_topk(emb, queries, k=60).collect()}
        for r in got:
            assert bf[(r["query_id"], r["rank"])] == r["neighbor_id"]
        # and the ADC shortlist distances agree with numpy for one query
        qv = np.asarray(emb.filter(F.col("vec_id") == 0).first()["embedding"])
        for nid, er in list(enc.items())[:10]:
            li = er["list_id"]
            rq = qv - C[li - 1]
            want = sum(
                ((bks[j][er["pq_codes"][j]] - rq[j * d_sub:(j + 1) * d_sub]) ** 2).sum()
                for j in range(M)
            )
            # recompute through the production scorer's table path
            t = np.stack([
                ((bks[j] - rq[j * d_sub:(j + 1) * d_sub][None, :]) ** 2).sum(axis=1)
                for j in range(M)
            ])
            got_adc = t[np.arange(M), np.asarray(er["pq_codes"])].sum()
            assert got_adc == pytest.approx(want, rel=1e-12)


class TestSearch:
    def test_index_path_equals_direct(self, spark, emb, model):
        import uuid

        cents, books = model
        table = f"ivfpq_t_{uuid.uuid4().hex[:8]}"
        S.write_ivfpq_index(emb, table, cents, books, buckets=NLIST)
        try:
            direct = S.ivfpq_topk(emb, emb.filter(F.col("vec_id") < 5),
                                  cents, books, k=5, n_probe=2, shortlist=20)
            indexed = S.ivfpq_topk_from_index(
                spark, table, emb.filter(F.col("vec_id") < 5),
                cents, books, k=5, n_probe=2, shortlist=20,
            )
            a = sorted(map(tuple, direct.select(
                "query_id", "rank", "neighbor_id").collect()))
            b = sorted(map(tuple, indexed.select(
                "query_id", "rank", "neighbor_id").collect()))
            assert a == b and len(a) == 25
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")

    def test_recall_floor(self, spark, emb, model):
        cents, books = model
        q = emb.filter(F.col("vec_id") < 10)
        got = S.ivfpq_topk(emb, q, cents, books, k=5, n_probe=2, shortlist=30)
        bf = S.brute_force_topk(emb, q, k=5)
        a = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
        b = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
        assert len(a & b) / len(b) >= 0.5

    def test_no_self_matches(self, emb, model):
        cents, books = model
        q = emb.filter(F.col("vec_id") < 5)
        got = S.ivfpq_topk(emb, q, cents, books, k=5, n_probe=NLIST)
        assert got.filter(F.col("query_id") == F.col("neighbor_id")).count() == 0


class TestOperators:
    def test_write_then_probe(self, spark, emb):
        import uuid

        from tuktu_spark.operators.registry import make_operator

        table = f"ivfpq_op_{uuid.uuid4().hex[:8]}"
        try:
            out = make_operator(
                "ivfpq_index_write",
                {"table": table, "nlist": NLIST, "m": M, "k_codes": KC,
                 "buckets": NLIST},
            )(emb)
            assert out.count() == 60  # passthrough
            assert spark.catalog.tableExists(table)
            assert spark.catalog.tableExists(f"{table}_centroids")
            assert spark.catalog.tableExists(f"{table}_codebooks")
            res = make_operator(
                "ivfpq_topk_from_index",
                {"table": table, "k": 3, "n_probe": 2, "shortlist": 20},
            )(emb.filter(F.col("vec_id") < 3))
            rows = res.collect()
            assert len(rows) == 9
            assert {r["rank"] for r in rows} == {1, 2, 3}
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            spark.sql(f"DROP TABLE IF EXISTS {table}_centroids")
            spark.sql(f"DROP TABLE IF EXISTS {table}_codebooks")


class TestAppend:
    def test_append_equals_full_rebuild(self, spark, emb, model):
        import uuid

        from pyspark.sql import functions as F

        cents, books = model
        a = emb.filter(F.col("vec_id") < 40)
        b = emb.filter(F.col("vec_id") >= 40)
        t1 = f"ivfpq_app_{uuid.uuid4().hex[:8]}"
        t2 = f"ivfpq_full_{uuid.uuid4().hex[:8]}"
        try:
            S.write_ivfpq_index(a, t1, cents, books, buckets=NLIST)
            S.append_ivfpq_index(b, t1, cents, books, buckets=NLIST)
            S.write_ivfpq_index(emb, t2, cents, books, buckets=NLIST)
            q = emb.filter(F.col("vec_id") < 5)
            got = sorted(map(tuple, S.ivfpq_topk_from_index(
                spark, t1, q, cents, books, k=5, n_probe=2, shortlist=30
            ).select("query_id", "rank", "neighbor_id").collect()))
            want = sorted(map(tuple, S.ivfpq_topk_from_index(
                spark, t2, q, cents, books, k=5, n_probe=2, shortlist=30
            ).select("query_id", "rank", "neighbor_id").collect()))
            assert got == want and len(got) == 25
            # the appended index still prunes buckets
            plan = S.ivfpq_topk_from_index(
                spark, t1, q, cents, books, k=5, n_probe=2
            )._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            assert "SelectedBucketsCount" in plan
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {t1}")
            spark.sql(f"DROP TABLE IF EXISTS {t2}")

    def test_append_operator(self, spark, emb):
        import uuid

        from pyspark.sql import functions as F

        from tuktu_spark.operators.registry import make_operator

        table = f"ivfpq_opa_{uuid.uuid4().hex[:8]}"
        try:
            with pytest.raises(ValueError, match="append"):
                make_operator(
                    "ivfpq_index_write", {"table": table, "mode": "append"}
                )(emb)
            cfg = {"table": table, "nlist": NLIST, "m": M, "k_codes": KC,
                   "buckets": NLIST}
            make_operator("ivfpq_index_write", cfg)(
                emb.filter(F.col("vec_id") < 40)
            )
            make_operator("ivfpq_index_write", {**cfg, "mode": "append"})(
                emb.filter(F.col("vec_id") >= 40)
            )
            assert spark.table(table).count() == 60
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            spark.sql(f"DROP TABLE IF EXISTS {table}_centroids")
            spark.sql(f"DROP TABLE IF EXISTS {table}_codebooks")
