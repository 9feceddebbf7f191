from .dedup import (  # noqa: F401
    exact_dedup,
    normalized_dedup,
    lsh_plan,
    keep_best_assignment,
    minhash_keep_best_dedup,
    minhash_lsh_dedup,
    simhash_dedup,
    ngram_jaccard_dedup,
    embedding_cosine_dedup,
)
from .bpe import (  # noqa: F401
    bpe_encode,
    bpe_train,
    bpe_train_reference,
    word_frequencies,
)
from .ann import (  # noqa: F401
    ann_brute_force,
    ann_ivf,
    ann_lsh,
    ann_pq,
    pq_encode,
    pq_train,
)
from .embed_cluster import (  # noqa: F401
    kmeans_assign,
    kmeans_distributed,
    pca_fit,
    pca_transform,
    semantic_dedup,
)
from .textstats import (  # noqa: F401
    bm25_topk,
    gopher_rules,
    language_id,
    quality_score,
    script_profile,
    token_count,
    doc_fingerprint,
    repetition_stats,
    unigram_term_freq,
    unigram_xentropy,
)
from .incremental import (  # noqa: F401
    incremental_exact_dedup,
    incremental_minhash_dedup,
)
from .classifier import (  # noqa: F401
    logreg_fit,
    logreg_predict,
)
from .graph import (  # noqa: F401
    core_numbers,
    hits,
    k_core,
    label_propagation,
    pagerank,
    triangle_count,
)
from .simjoin import (  # noqa: F401
    cosine_threshold_join,
    edit_similarity_join,
    jaccard_similarity_join,
    multi_pass_snm,
    sorted_neighborhood_pairs,
)
from .packing import (  # noqa: F401
    pack_sequences,
    pack_sequences_greedy,
)
from .corpus import (  # noqa: F401
    add_url_host,
    boilerplate_keys,
    clean_corpus,
    strip_boilerplate,
    cross_dup_fraction,
    remove_dup_spans,
    source_ngram_overlap,
    clean_corpus_funnel,
    host_stats,
    keep_latest,
    mix_sources,
    fuzzy_decontaminate,
    ngram_decontaminate,
    normalize_url,
    paragraph_dedup,
    sample_per_group,
    split_by_hash,
    weighted_sample,
)
from .lm import (  # noqa: F401
    bigram_lm_fit,
    bigram_lm_score,
    dsir_log_weights,
    gumbel_topk_sample,
    lm_perplexity,
)
from .pii import flag_pii, redact_pii  # noqa: F401
from .corpus import chunk_text  # noqa: F401
from .spans import span_dedup  # noqa: F401
