"""razulibs_spark — a PySpark-native analytics/ETL engine with the query
and data-processing capabilities of Regionaal-Archief-Zuid-Utrecht/razulibs.

Not a port: the reference is an eager, row-at-a-time Python toolkit
(pandas + rdflib + boto3); this engine re-expresses its operator
semantics (SURVEY.md §2) as declarative Spark DataFrame plans that
Catalyst optimizes, plus the LLM-data-pipeline operators (dedup,
similarity search, multimodal columns, text analysis) required for
100 TB scale.

Layout:
  session.py    SparkSession factory (AQE, UTC, arrow)
  tables.py     driver-testdata loaders
  functions/    scalar column builders (SURVEY §2.8 F1–F22)
  operators/    relational / rdf / manifest / events / dedup /
                similarity / text / multimodal operator library
  sources/      RDF serialization sinks & sources
  plans/        end-to-end pipelines (flagship csv2rdf shape)
  streaming/    structured-streaming surfaces for the event log
"""

__version__ = "0.1.0"
