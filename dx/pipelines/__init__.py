"""Training-data pipeline operators (dedup / similarity / text / multimodal).

Beyond DataX parity (the reference is an ETL pipe with no analytics,
SURVEY.md §2.7), a 100 TB training-data engine needs corpus-hygiene
operators. All hot paths are JVM-side column expressions (higher-order
array functions over md5/conv — no Python in the row path); the only
Python is Arrow-batched mapInPandas where a real decoder would live
(multimodal.py).

Cross-engine determinism: every hash is md5-hex (identical in Spark
and DuckDB), every ratio is floor()-quantized to integer basis points,
every float comparison happens on exactly-representable doubles
derived from int64 — so the driver's value-hash oracle matches
bit-for-bit (dx/queries_td.py).
"""
