"""breakchecker_spark — a PySpark-native crawl/extract/match analytics engine.

A from-scratch reimplementation of the capabilities of the reference
domain scanner (terzikk/BreakChecker, /root/reference/break_checker.py)
as an idiomatic Spark pipeline:

* URL frontier + fetch scheduler over a Common-Crawl-style pages table
  ``(url, warc_ts, html, text, lang)`` — fetching becomes a join of the
  frontier against the pages table (reference fetches live, break_checker.py:742-839).
* Partitioned bloom-prefiltered URL-seen set + exact anti-join
  (reference: in-memory sets, break_checker.py:1222-1226).
* Per-host politeness budget with carry-over + robots gating + host-salted
  skew handling (north-rule additions; reference has only a global
  concurrency cap, break_checker.py:1329-1331).
* Vectorized (Arrow/pandas UDF) email/phone extraction + normalization
  (reference: per-string regex + library calls, break_checker.py:978-1196).
* Breach matching as a broadcast hash join (reference: per-identifier
  HTTP calls, break_checker.py:1458-1563).
* Training-data-pipeline operators: exact/MinHash-LSH/SimHash/Jaccard/
  embedding dedup, ANN similarity search, language-ID, quality scoring,
  token counting, fingerprinting, multimodal binary plumbing.

Everything here derives from public knowledge only: the Apache Spark API
and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
