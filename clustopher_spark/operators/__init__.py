from clustopher_spark.operators.cluster import ClusterOptions, cluster_at_zoom, get_clusters

__all__ = ["ClusterOptions", "cluster_at_zoom", "get_clusters"]
