from mtail_spark.operators import dedup, similarity, textstats, multimodal  # noqa: F401
