"""PySpark-native fulltext indexing + BM25 query engine.

A from-scratch rebuild of the *capabilities* of the reference system
(siem-on-amazon-opensearch-service: S3->Lambda ETL + OpenSearch/Lucene
fulltext index, see SURVEY.md) as an idiomatic Spark engine:

- ``analysis``   -- the single shared tokenizer (ref: Lucene ``standard``
  analyzer implied by ``text`` mappings, deploy_es/data.ini:104).
- ``codec``      -- delta + variable-byte posting compression (numpy).
- ``bm25``       -- BM25 scoring constants/formulas (Lucene defaults
  k1=1.2, b=0.75 -- never overridden in deploy_es/data.ini).
- ``corpus``     -- deterministic Common-Crawl-style page generator.
- ``oracle``     -- pure-Python reference engine (golden tests).
- ``index``      -- distributed build: docids, doclens, postings
  (term-partitioned, salted, block-compressed), stats, lineage.
- ``operators``  -- aggregations, range joins, dedup, similarity
  search, text analysis (SURVEY.md section 2 inventory).
- ``functions``  -- scalar functions (url split, ip, timestamps...).
- ``sources``    -- format readers (json/csv/regex-text/cef/...).
- ``plans``      -- checkpoint/lineage + pruning plan helpers.
- ``streaming``  -- incremental index maintenance via foreachBatch.
"""

__version__ = "0.1.0"
