"""chchfr_data_collection_spark — a PySpark-native analytics/ETL engine.

Re-expresses the full capability surface of the reference project
(TEAM-Data-Engineers/CHCHFR-Data-Collection, an Airflow ETL pipeline that
collects fuel-station locations from four HTTP JSON sources, dedups them
into a `gas_station` dimension, and generates a daily `fuel_price` fact) as
an idiomatic Spark DataFrame engine, plus the large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
plumbing) the reference's north star requires.

Design rules (see SURVEY.md §4):
- DataFrame/SQL first; Catalyst owns optimization.
- Set-based replacements for the reference's row-at-a-time patterns
  (its N+1 existence probe becomes one left-anti join).
- Broadcast tiny dimensions; partition facts by date; never collect
  to the driver inside an operator.
- Python only via Arrow-vectorized pandas UDFs, never row-at-a-time.
"""

__version__ = "0.1.0"
