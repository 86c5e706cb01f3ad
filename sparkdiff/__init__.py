"""sparkdiff — a PySpark-native analytics engine with the query and
data-processing capabilities of ``shashank-acquia/sf-hive-discrepancy-agent``.

The reference is a Flask + LangChain agent that validates data parity
between a Hive warehouse and a Snowflake warehouse, outsourcing all data
work to Snowflake SQL, a JS stored procedure, and pandas.  This package
re-expresses every data operator of that system (SURVEY.md §2) as
idiomatic, Catalyst-optimizable PySpark — one DataFrame lineage instead
of per-id RPC loops — and extends it with the operators a large-scale
training-data pipeline needs (dedup, similarity search, text analysis,
multimodal column plumbing).

Layout
------
- ``session``        SparkSession factory + testdata table loader
- ``functions``      canonical rendering, text scoring/tokenization, text stats
- ``operators``      table diff, dedup, top-k, similarity, workload ops
- ``sources``        schema catalog, script-directory sources
- ``plans``          ${columns:...} macro expander, Hive-dialect rewriter
- ``streaming``      structured-streaming continuous validation
- ``multimodal``     binary-column (image/audio) plumbing
"""

__version__ = "0.1.0"
