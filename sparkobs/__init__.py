"""sparkobs — PySpark-native data-observability analytics engine.

A brand-new Spark-first engine with the query/data-processing
capabilities of databand-ai/databand_templates (see SURVEY.md):
table & column profiling, catalog shape metrics, object-store
listing aggregation, run-over-run deltas and schema drift, plus
large-scale training-data pipeline operators (dedup, similarity
search, text analysis, multimodal columns).

Every operator is a plain function ``DataFrame -> DataFrame`` with
an explicit, aliased output schema; composition replaces the
reference's Airflow DAG wiring (SURVEY.md §3). No custom Catalyst
rules — plans are declared via the DataFrame API and optimized by
Catalyst/AQE (SURVEY.md §4).
"""

from sparkobs.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
