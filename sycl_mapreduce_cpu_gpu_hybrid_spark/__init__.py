"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference `Surnamus/Sycl-MapReduce-CPU-GPU-Hybrid`
(a SYCL CPU/GPU k-mer-counting MapReduce), re-expressed Spark-first and
extended with a relational operator inventory and LLM-data-pipeline
operators (dedup, similarity search, text analysis, streaming).

Layout:
- ``session``    — SparkSession bootstrap tuned for local[N] and cluster use.
- ``operators``  — k-mer pipeline (the reference's one real query),
                   dedup (exact / MinHash-LSH / SimHash / n-gram
                   Jaccard / embedding-cosine), similarity search
                   (exact + IVF), as-of join, multimodal binary-column
                   plumbing.
- ``sources``    — corpus ETL (FASTA-strip / truncate, reference
                   scripts/modifier.sh + truncator.sh semantics),
                   table loaders for the test parquet, CSV/JSON
                   readers, JDBC/Kafka connector builders.
- ``functions``  — text-analysis pack (tokens, quality, lang-id,
                   winnowing fingerprints) and the pandas_udf kernel
                   registration surface.
- ``queries``    — the declared query inventory with DuckDB oracles
                   (the driver's correctness gate).
- ``plans``      — metrics emission shaped like the reference's
                   points.txt (src/main.cpp:19-38) and timing helpers.
- ``streaming``  — Structured Streaming over the events table
                   (watermarked tumbling/sliding/session windows,
                   bounded-state dedup, applyInPandasWithState custom
                   stateful ops), batch-equivalence tested.
"""

__version__ = "0.1.0"
