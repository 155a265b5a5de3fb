"""ML / NLP / time-series layer (SURVEY.md §2.12).

The reference ships a train/apply/serialize processor trio per model
(modules/ml/app/tuktu/ml/processors/BaseMLProcessor.scala:22-234) over its
own model implementations, plus NLP processors
(modules/nlp/app/tuktu/nlp/processors/**) and time-series models
(modules/ml/app/tuktu/ml/models/timeseries/*.scala). Here:

- ``features``  — exact, engine-portable feature engineering (normalize,
  impute, dummy variables) as pure DataFrame algebra, plus pyspark.ml
  feature wrappers.
- ``models``    — the train/apply/save/load trio over ``pyspark.ml``
  estimators (the idiomatic replacement for the reference's hand-rolled
  models).
- ``nlp``       — tokenize / n-grams / stopwords / TF-IDF / word2vec.
- ``timeseries``— AR forecasting and CUSUM changepoint detection.
"""

from . import features, models, nlp, timeseries  # noqa: F401
