"""annotation_service_spark — PySpark-native analytics engine.

A from-scratch Spark implementation of the query and data-processing
capabilities of m-lab/annotation-service (the reference, a Go HTTP
service annotating IPs with geolocation/ASN data as-of a date), plus
the large-scale training-data pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) a 100 TB deployment needs.

Layout
------
functions/   column-expression libraries (IP math, text, vectors)
operators/   relational operators the reference needs that Spark lacks
             natively (interval flatten, range join, as-of join, dedup,
             ANN similarity)
sources/     format readers (GeoLite2 zip/CSV, RouteViews pfx2as TSV,
             dimension CSVs, siteinfo JSON, dataset registry)
plans/       end-to-end query pipelines (the annotate query lifecycle)
streaming/   Structured Streaming refresh + request-stream surfaces

Design stance (SURVEY.md §7): everything is declarative DataFrame/SQL
so Catalyst handles pushdown/pruning/join selection; Pandas UDFs only
where built-ins genuinely cannot express the semantics (16-byte IP
parsing, binary-search range lookup).
"""

__version__ = "0.1.0"
