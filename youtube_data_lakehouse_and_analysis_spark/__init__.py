"""PySpark-native analytics engine with the query and data-processing
capabilities of VivekS-DS/YouTube_Data_Lakehouse_and_Analysis.

The reference (/root/reference/app.py) is a Streamlit ETL app: YouTube API
-> MongoDB lake -> MySQL warehouse -> 10 canned SQL analytics queries.
This package re-expresses that surface Spark-first (DataFrame / Spark SQL /
Structured Streaming), and extends it with the LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) required for
100 TB scale.

Layout:
  session      — tuned SparkSession factory
  catalog      — testdata table loading / view registration
  schemas      — explicit StructTypes (domain warehouse + testdata)
  functions/   — scalar transform library (F1-F9), text, vector math
  sources/     — ingestion adapters (YouTube-API-shaped fixtures), bronze
  plans/       — silver migration job, the analytics query catalog
  operators/   — dedup, similarity, groupwise top-k
  streaming/   — Structured Streaming windows / dedup
  multimodal/  — binary-column plumbing with stubbed codecs
"""

__version__ = "0.1.0"
