"""PySpark-native analytics engine with the query/data-processing capabilities
of the reference pipeline (Kafka Connect Avro ingest -> Faust enrichment ->
ksqlDB streaming aggregation), re-expressed Spark-first.

Reference semantics: see SURVEY.md. The reference's 3-stage pipeline
(reference: azure-source-cc.json:1-19, src/main.py:35-95,
ci_cd/ksql/create_table.json:2) maps here to:

- ``sources``   : batch/streaming readers + ingest-time mask transform (S1-S3)
- ``functions`` : pure Column expression stacks (dates F3-F5, text, vectors)
- ``operators`` : enrichment (F6), aggregation (K2-K4), dedup, similarity,
                  text analysis, multimodal plumbing, TPC-H-ish analytics
- ``streaming`` : Structured Streaming pipelines (K1, K5, K6, S4)
- ``plans``     : plan-inspection / scale-hygiene helpers
"""

__version__ = "0.1.0"
