from .dedup import (  # noqa: F401
    cosine_similarity,
    drop_exact_duplicates,
    embedding_near_duplicates,
    exact_duplicate_groups,
    minhash_lsh_candidates,
    minhash_near_duplicates,
    minhash_signature,
    ngram_jaccard_pairs,
    shingles,
    shingles_from_tokens,
    tokens_column,
    simhash,
    simhash_catalyst,
    simhash_near_duplicates,
)
from .media import (  # noqa: F401
    DECODERS,
    FEATURE_DIM,
    MEDIA_SCHEMA,
    extract_features,
    media_from_documents,
    synthetic_media,
)
from .similarity import (  # noqa: F401
    cosine_to_query,
    cosine_topk,
    hyperplane_signature,
    ivf_assign,
    ivf_topk,
    lsh_topk,
    train_centroids,
)
from .text import (  # noqa: F401
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id,
    lang_scores,
    normalized_text,
    quality_features,
    quality_score,
    whitespace_token_count,
    with_text_analysis,
)
