"""spider_spark — a PySpark-native distributed crawl/analytics engine.

A from-scratch reimplementation of the *capabilities* of
``@happyvertical/spider`` (reference at /root/reference, v1.1.13) as an
idiomatic PySpark engine: a distributed URL-frontier + fetch scheduler over
partitioned parquet (Iceberg-style) tables of Common-Crawl-style pages, with

- byte-identical text/link/document-URL extraction vs the reference
  (``textops``/``urlops``, vectorized in ``udfs``),
- a sharded URL-seen filter (exact anti-join ground truth + bloom shards),
- per-host politeness budgets, robots gating, priority scheduling,
- checkpoint/resume without refetch (``catalog``/``crawler``),
- DataFrame entry points (``scrape``: scrape_index / scrape_document /
  link filters), platform registry (``platform``), read-through fetch
  cache (``cache``), env config (``config``), streaming extraction
  (``streaming``),
- large-scale training-data ops: dedup (exact/minhash/simhash), ANN
  similarity search, text QC, multimodal column plumbing (``operators``).

Everything is DataFrame-first: Catalyst plans + Arrow-vectorized pandas UDFs;
no per-row Python, no driver-side collect loops in the hot path.
"""

__version__ = "0.1.0"
