"""Embedding similarity search (LLM-pipeline operator family):
brute-force cosine top-k as the exactness baseline, banded
random-hyperplane LSH as the scale path, and cosine near-dup pairing.

Numeric determinism: float32 components are quantized to
trunc(x·1e12) integers (tie-free — decimal rounding of dyadic floats
ties, and engines break ties differently); dots and norms accumulate as
exact integer decimals with one string-hopped cast to double at the
end — so Spark and the DuckDB oracle agree BITWISE, and rank order
(hence top-k membership) is identical across engines. Cosine is
scale-invariant, so the 1e24 factor cancels.

Execution shape: the hot path is array-native — ``zip_with`` +
``aggregate`` folds inside whole-stage codegen. Vectors are never
posexploded into (id, pos, v) rows, so a pair costs one array fold,
not a 64-row shuffle. At 100 TB: brute-force is O(queries × corpus)
and only for small query sets; the banded-LSH variant buckets the
corpus once and joins within buckets, with band width as the
recall/candidate-volume knob.
"""


# r11: the 3.4k-line similarity module split into focused submodules
# (base / ivf / stores / pq / sq / bq / mrl) behind this unchanged
# import surface —
# every name, public and private, resolves here exactly as before.

from crypto_data_pipeline_with_kafka_spark.operators.similarity.base import (  # noqa: F401
    _ACC,
    _ALL_PAIRS_MAX_ROWS,
    _QDEC,
    _QSCALE,
    _dot_exact_decimal,
    _ensure_ann_base,
    _plane_signs,
    _rank_topk,
    all_pairs_cosine,
    brute_force_topk,
    cosine_expr,
    cosine_for_pairs,
    dbl_vector,
    dot_double,
    dot_exact,
    lsh_ann_pairs,
    lsh_buckets,
    quantized_vector,
    with_dbl_and_approx_norm,
    with_dbl_and_norm,
    with_q_and_norm,
)
from crypto_data_pipeline_with_kafka_spark.operators.similarity.ivf import (  # noqa: F401
    _seed_centroids,
    ivf_ann_pairs,
    ivf_assignments,
    ivf_candidate_pairs,
    ivf_topk,
    lloyd_refined_centroids,
    resolve_num_centroids,
)
from crypto_data_pipeline_with_kafka_spark.operators.similarity.stores import (  # noqa: F401
    _cells_vec_col,
    incremental_ivf_update,
    ivf_store_needs_retrain,
    load_ivf_index,
    read_ivf_pq_store,
    recover_ivf_store,
    retrain_ivf_store,
    save_ivf_index,
)
from crypto_data_pipeline_with_kafka_spark.operators.similarity.pq import (  # noqa: F401
    _PQServeInputs,
    _adc_lut_sum,
    _adc_pair_cosine,
    _adc_positions,
    _check_codebook_mode,
    _check_residual_tag,
    _codes_adc_side,
    _codes_expr,
    _exact_adc_topk,
    _kmax_plus_one,
    _packed_codebooks,
    _pq_query_luts,
    _residual_adc_side,
    ivf_pq_topk,
    pq_adc_side,
    pq_encode,
    pq_pick_ids,
    pq_topk,
    pq_train,
    pq_train_residual,
)
from crypto_data_pipeline_with_kafka_spark.operators.similarity.sq import (  # noqa: F401
    _SQ8_XDEC,
    _SQ8_XSCALE,
    _sq8_exact_shortlist,
    _sq8_norm_guard,
    sq8_encode,
    sq8_topk,
)
from crypto_data_pipeline_with_kafka_spark.operators.similarity.bq import (  # noqa: F401
    _BQ_LANE_BITS,
    _bq_hamming,
    bq_encode,
    bq_topk,
)
from crypto_data_pipeline_with_kafka_spark.operators.similarity.mrl import (  # noqa: F401
    mrl_prefix_encode,
    mrl_topk,
)
