"""flink_streaming_kmeans_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
public reference repo ``ScaleUnlimited/flink-streaming-kmeans`` (an
Apache Flink DataStream demo of streaming k-means clustering; the
checkout at /root/reference was empty at build time, so parity targets
derive from SURVEY.md's public-knowledge reconstruction), extended with
the relational operator surface and LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) required
by the project north star (BASELINE.json).

Architecture: DataFrame/SQL declarative plans optimized by Catalyst;
Python drops to Pandas UDFs / applyInPandas only where built-in
operators cannot express the semantics (see plans/udf.py and
streaming/).
"""

__version__ = "0.1.0"
