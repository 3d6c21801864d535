"""kafka_streams_app_spark — a PySpark-native analytics engine with the
semantic surface of the reference Kafka Streams application
(AyoubOm/kafka-streams-app), re-expressed Spark-first.

Design principles (100 TB scale):
- Declare logical plans with the DataFrame/SQL API; let Catalyst pick the
  physical strategy (pushdown, pruning, join selection, AQE).
- Dimension tables are broadcast; fact-fact joins shuffle on their keys.
- No driver-side collects in any operator; everything stays distributed.
- Python only via Arrow-batched pandas UDFs / mapInPandas, never per-row.
"""

from kafka_streams_app_spark.engine import configure_session, get_spark

__all__ = ["get_spark", "configure_session"]
__version__ = "0.1.0"
