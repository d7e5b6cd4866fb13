from spark_streaming_sql_s3_connector_spark.operators.decontamination import (
    benchmark_ngram_set,
    contamination_check,
    decontaminate,
)
from spark_streaming_sql_s3_connector_spark.operators.dedup import (
    dedup_exact,
    embedding_cosine_pairs,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from spark_streaming_sql_s3_connector_spark.operators.similarity import (
    brute_force_topk,
    cosine_sim,
    lsh_ann_topk,
)

__all__ = [
    "benchmark_ngram_set",
    "contamination_check",
    "decontaminate",
    "dedup_exact",
    "embedding_cosine_pairs",
    "minhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "simhash_near_dup_pairs",
    "brute_force_topk",
    "cosine_sim",
    "lsh_ann_topk",
]
