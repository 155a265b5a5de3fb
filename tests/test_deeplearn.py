"""Image-classification head (ml/deeplearn.py) — the distributed scoring
shape with the deterministic stub embedder; reference deeplearn/
processors/image/{InceptionClassifier,VGG16Classifier}.scala."""

import pytest
from pyspark.sql import functions as F

from tuktu_spark.llm.multimodal import make_png
from tuktu_spark.ml.deeplearn import _default_embedder, classify_images
from tuktu_spark.operators.registry import make_operator


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, bytearray(make_png(8, 8, shade=10))),
        (2, bytearray(make_png(8, 8, shade=240))),
        (3, None),
    ]
    return spark.createDataFrame(rows, "id int, media binary")


def centroids_for(shades):
    return {
        f"shade{s}": _default_embedder(make_png(8, 8, shade=s)) for s in shades
    }


class TestClassifyImages:
    def test_top1_matches_nearest_centroid(self, spark, media_df):
        cents = centroids_for([10, 240])
        out = classify_images(media_df, "media", cents, top_n=1)
        got = {r["id"]: r["labels"] for r in out.collect()}
        assert got[1][0]["label"] == "shade10"
        assert got[2][0]["label"] == "shade240"
        assert got[3] == []  # null media -> empty labels

    def test_top_n_ordering_and_scores(self, spark, media_df):
        cents = centroids_for([10, 120, 240])
        out = classify_images(media_df, "media", cents, top_n=3)
        labels = {r["id"]: r["labels"] for r in out.collect()}[1]
        scores = [entry["score"] for entry in labels]
        assert scores == sorted(scores, reverse=True)
        assert labels[0]["label"] == "shade10"
        assert labels[0]["score"] == pytest.approx(1.0)  # self-match

    def test_categories_coarsen_with_max(self, spark, media_df):
        cents = centroids_for([10, 120, 240])
        cats = {"shade10": "dark", "shade120": "dark", "shade240": "light"}
        out = classify_images(
            media_df, "media", cents, top_n=2, categories=cats
        )
        labels = {r["id"]: r["labels"] for r in out.collect()}[1]
        assert [e["label"] for e in labels] == ["dark", "light"]

    def test_operator_flatten_and_model_gate(self, spark, media_df):
        cents = centroids_for([10, 240])
        out = make_operator(
            "image_classify",
            {"field": "media", "centroids": cents, "flatten": True, "top_n": 1},
        )(media_df)
        got = {r["id"]: r["labels"] for r in out.collect()}
        assert got[1] == "shade10" and got[2] == "shade240"
        with pytest.raises(NotImplementedError, match="inceptionv3"):
            make_operator(
                "image_classify",
                {"field": "media", "centroids": cents, "model": "inceptionv3"},
            )
        # injected embedder satisfies the model gate
        op = make_operator(
            "image_classify",
            {
                "field": "media",
                "centroids": {"only": [1.0] * 8},
                "model": "vgg16",
                "embedder": lambda b: [1.0] * 8,
                "top_n": 1,
            },
        )
        row = {r["id"]: r["labels"] for r in op(media_df).collect()}[1]
        assert row[0]["label"] == "only" and row[0]["score"] == pytest.approx(1.0)

    def test_extra_columns_pass_through(self, spark, media_df):
        cents = centroids_for([10])
        out = classify_images(
            media_df.withColumn("note", F.lit("x")), "media", cents, top_n=1
        )
        assert {"id", "media", "note", "labels"} == set(out.columns)
