"""PySpark-native analytics engine with the capabilities of
Oxford-Research-Cloud-Competency-Centre/aws-seismic-data-pipeline,
re-expressed Spark-first (SURVEY.md).

Public surface:
- ``registry.load_all()`` → name → QuerySpec (builder + oracle SQL)
- ``catalog.load_table`` → typed fixture DataFrames
- ``session.get_spark`` → tuned local SparkSession
- library modules: operators/, functions/, plans/, sources/,
  streaming/, llm/
"""

__version__ = "0.1.0"
