"""ieps_crawler_spark — a brand-new PySpark-native crawl/analytics engine.

Re-expresses the capabilities of the reference crawler
(ghajduk3/ieps-crawler, an Akka/PostgreSQL web crawler — see SURVEY.md)
as an idiomatic Spark DataFrame pipeline:

- ``functions/``  vectorized pandas/Arrow UDFs + pure-Python transcriptions
  of the reference's URL canonicalization, HTML extraction, robots.txt and
  sitemap logic (each docstring cites the reference file:line it matches).
- ``operators/``  Spark-first building blocks: partitioned Bloom URL-seen
  filter, content-hash dedup family (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding cosine), politeness top-k, ANN similarity,
  text analysis, multimodal column plumbing.
- ``plans/``      the crawl wave pipeline and the BFS driver loop with
  checkpoint/resume.
- ``sinks/``      snapshot-table layer (parquet-backed, Iceberg-style
  atomic per-wave commits; swaps to real Iceberg when a catalog exists).
- ``corpus.py``   deterministic synthetic Common-Crawl-style corpus
  (input_hint shape: url, warc_ts, html, text, lang) for tests/bench.
- ``simulator.py`` pure-Python single-threaded reference simulator — the
  executable definition of crawl-order/seen-set equivalence (SURVEY §7).

Nothing here is a port of the reference's actor architecture; the logical
plan is declared with DataFrame ops and Catalyst/AQE pick the physical
strategy.
"""

__version__ = "0.1.0"
