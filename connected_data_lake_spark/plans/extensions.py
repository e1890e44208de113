"""LLM-pipeline extension queries (dedup / similarity / text analysis /
multimodal) over the documents + embeddings tables."""

from __future__ import annotations
