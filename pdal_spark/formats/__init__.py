"""Point-cloud file-format codecs (LAS), Spark-distributed."""
