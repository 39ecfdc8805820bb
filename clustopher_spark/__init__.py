"""clustopher_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference system (a single-node Go geospatial
point-clustering engine; see SURVEY.md): viewport cluster queries
(weighted-centroid greedy radius clustering with metric rollups and
metadata frequency distributions), a generic relational OLAP surface
(joins, aggregations, windows, set ops), plus large-scale training-data
pipeline extensions (deduplication, similarity search, text analysis,
multimodal plumbing) and Structured Streaming over event tables.

Everything is expressed as DataFrame / Spark SQL logical plans so Catalyst
and Tungsten choose the physical strategy; the one genuinely custom kernel
(greedy epsilon-radius agglomeration, reference cluster/cluster.go:1266-1360)
runs as an Arrow-batched ``applyInPandas`` over independent spatial
super-cells.
"""

from clustopher_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
