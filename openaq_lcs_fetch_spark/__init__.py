"""openaq_lcs_fetch_spark — a PySpark-native analytics/ingestion engine.

A from-scratch re-expression of the capabilities of the reference ETL
pipeline ``openaq/openaq-lcs-fetch`` (a Node.js Lambda dataflow program:
scans -> filters -> unpivots -> lookup joins -> dedup -> aggregation ->
partitioned sinks), designed Spark-first:

* every operator is a declarative DataFrame transformation so Catalyst
  handles pushdown / pruning / join planning / AQE;
* dimension lookups are broadcast hash joins (reference: in-memory maps,
  ``fetcher/lib/measurand.js:89-95``);
* the measures "stream" (cron + checkpoint in the reference,
  ``fetcher/lib/meta.js``) maps to Structured Streaming with watermarks;
* north-star large-scale data-pipeline operators (dedup, similarity
  search, text analysis, multimodal columns) are first-class.

Nothing in here is copied from the reference — file:line citations in
docstrings point at the *behavior* being re-expressed.
"""

__version__ = "0.1.0"
