from distributedvectordatabase_spark.operators.knn import knn, knn_single

__all__ = ["knn", "knn_single"]
