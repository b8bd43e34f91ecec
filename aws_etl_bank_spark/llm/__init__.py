from aws_etl_bank_spark.llm.dedup import (  # noqa: F401
    connected_components,
    decontaminate,
    dedup_keep_transitive,
    exact_dedup,
    line_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    minhash_dedup_keep,
    ngram_jaccard_pairs,
    simhash_signatures,
    simhash_lsh_pairs,
    embedding_dup_pairs,
    assign_cells,
    semantic_dedup_pairs,
    semantic_dedup_keep,
    decontaminate_semantic,
    remove_duplicate_spans,
    substring_span_pairs,
)
from aws_etl_bank_spark.llm.similarity import (  # noqa: F401
    cosine_sim,
    brute_force_topk,
    ivf_topk,
    train_centroids,
    ivf_pq_topk,
    pq_codebooks,
    pq_encode,
    pq_topk,
)
from aws_etl_bank_spark.llm.text import (  # noqa: F401
    bigram_logprob,
    chunk_documents,
    dsir_select,
    fingerprint,
    gopher_filter,
    language_id,
    pii_scrub,
    quality_score,
    repetition_signals,
    stratified_sample,
    text_stats,
    token_budget_sample,
    upsample_by_weight,
)
from aws_etl_bank_spark.llm.ranking import (  # noqa: F401
    bm25_scores,
    bm25_topk,
)
from aws_etl_bank_spark.llm.multimodal import (  # noqa: F401
    attach_binary_payload,
    decode_image_features,
    sample_frames,
)
