from spark_streaming_sql_s3_connector_spark.operators.classifier import (
    nb_score_docs,
    train_nb_classifier,
)
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
from spark_streaming_sql_s3_connector_spark.operators.drift import (
    categorical_drift,
    numeric_drift,
    snapshot_diff,
    snapshot_diff_summary,
)
from spark_streaming_sql_s3_connector_spark.operators.embeddings import (
    centroid_similarity,
    cluster_balanced_sample,
    group_centroids,
    normalize_embeddings,
    with_l2_norm,
)
from spark_streaming_sql_s3_connector_spark.operators.profile import (
    fingerprint_table,
    profile_table,
)
from spark_streaming_sql_s3_connector_spark.operators.sampling import (
    group_train_test_split,
    shuffle_shards,
    temperature_mix,
    with_group_split,
    write_training_shards,
)
from spark_streaming_sql_s3_connector_spark.operators.importance import (
    dsir_log_weights,
    dsir_resample,
)
from spark_streaming_sql_s3_connector_spark.operators.retrieval import (
    bm25_search,
    rrf_fuse,
    tfidf_top_terms,
    with_rank,
)
from spark_streaming_sql_s3_connector_spark.operators.similarity import (
    brute_force_topk,
    cosine_sim,
    hard_negatives,
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
    "profile_table",
    "fingerprint_table",
    "snapshot_diff",
    "snapshot_diff_summary",
    "categorical_drift",
    "numeric_drift",
    "with_group_split",
    "group_train_test_split",
    "shuffle_shards",
    "write_training_shards",
    "temperature_mix",
    "train_nb_classifier",
    "nb_score_docs",
    "with_l2_norm",
    "normalize_embeddings",
    "group_centroids",
    "centroid_similarity",
    "bm25_search",
    "tfidf_top_terms",
    "hard_negatives",
    "dsir_log_weights",
    "dsir_resample",
    "cluster_balanced_sample",
    "rrf_fuse",
    "with_rank",
]
