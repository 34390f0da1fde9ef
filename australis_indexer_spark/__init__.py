"""australis_indexer_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of the reference NEAR-blockchain streaming
ETL pipeline (andrcmdr/australis-indexer, surveyed in SURVEY.md), re-expressed
Spark-first, plus the relational and LLM-data-pipeline operators its consumers
are designed to feed.

Layout
------
- ``session``    — SparkSession factory tuned for local[32] tests and 100 TB design
- ``schemas``    — explicit StructType contracts (StreamerMessage, envelope, normalized tables)
- ``fixtures``   — deterministic synthetic block-stream generator (golden fixture)
- ``functions``  — scalar fns: codecs (CBOR/JSON/zlib/lz4/zstd), text, vectors
- ``sources``    — batch and streaming scans (offsets, replay, backfill modes)
- ``operators``  — envelope, projection/explode family, relational layer,
                   dedup (exact/minhash/simhash/ngram/embedding), similarity
                   search, multimodal columns
- ``streaming``  — structured-streaming pipelines: checkpoint/resume, watermark
                   dedup, per-batch ordering
- ``plans``      — plan inspection helpers (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"
