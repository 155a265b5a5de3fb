"""LLM-data-pipeline operators (BASELINE.json north star).

Beyond the reference's own surface: deduplication (exact, n-gram Jaccard,
MinHash+LSH, SimHash, embedding-cosine), similarity search (brute-force +
bucketed ANN), text analysis (language-ID, quality scoring, token counting,
fingerprinting), multimodal binary-column plumbing.

Everything is built on engine-portable primitives (md5-derived hashing,
integer arithmetic, explicit-fold float math) so results are reproducible
run-to-run and checkable against a DuckDB oracle — a property you want in a
100 TB dedup job anyway (re-runs must agree).
"""

from . import dedup, multimodal, similarity, text  # noqa: F401
