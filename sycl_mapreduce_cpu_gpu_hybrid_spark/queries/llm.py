"""LLM-data-pipeline queries (dedup, similarity search, text analysis)
— populated by operators/dedup.py, operators/similarity.py,
functions/text.py as they land."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
