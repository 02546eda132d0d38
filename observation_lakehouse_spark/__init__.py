"""observation_lakehouse_spark — a PySpark-native observation lakehouse engine.

A brand-new, idiomatic Spark implementation of the query and data-processing
capabilities of SoftwareObservatorium/observation-lakehouse (reference analyzed
in SURVEY.md): stimulus-response observation storage, SRM output views,
behavioral clustering, consensus oracles, three-way joins, dataset statistics,
arena/Solr ingestion — plus LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) designed for 100 TB scale.

Everything is expressed through the DataFrame / Spark SQL API so Catalyst and
Tungsten own the physical plan (partition pruning, predicate pushdown,
whole-stage codegen, AQE); Python UDFs appear only as Arrow-batched pandas UDFs
on genuinely non-relational logic (git-blob hashing, minhash signatures).
"""

from observation_lakehouse_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]

__version__ = "0.1.0"
