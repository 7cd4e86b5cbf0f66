"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference `Surnamus/Sycl-MapReduce-CPU-GPU-Hybrid`
(a SYCL CPU/GPU k-mer-counting MapReduce), re-expressed Spark-first and
extended with a relational operator inventory and LLM-data-pipeline
operators (dedup, similarity search, text analysis, streaming).

Layout:
- ``session``    — SparkSession bootstrap tuned for local[N] and cluster use.
- ``operators``  — k-mer pipeline (the reference's one real query),
                   dedup, similarity search, as-of join.
- ``sources``    — corpus ETL (FASTA-strip / truncate, reference
                   scripts/modifier.sh + truncator.sh semantics) and
                   table loaders for the test parquet.
- ``functions``  — portable hashing (DuckDB-oracle-compatible), text
                   analysis function pack.
- ``plans``      — metrics emission shaped like the reference's
                   points.txt (src/main.cpp:19-38) and timing helpers.
- ``streaming``  — Structured Streaming equivalents over the events table.
"""

__version__ = "0.1.0"
