"""Extension catalog — LLM-data-pipeline operators beyond the
reference surface (dedup, similarity search, text analysis,
multimodal). Populated as the operators land."""

from __future__ import annotations

from ora_ch_spark.catalog import QueryDef

EXT_QUERIES: list[QueryDef] = []
