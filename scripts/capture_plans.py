"""Capture physical plans of headline queries → docs/PLANS.md.

Usage: python scripts/capture_plans.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as em
from annotation_service_spark.session import get_session

QUERIES = [
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q10", "annotate", "range_lookup",
    "asof_select", "dedup_minhash_lsh", "annotate_multisnapshot",
    "legacy_annotate", "corpus_curation", "ann_ivf_topk",
    "ann_cosine_topk", "ann_gemm_topk", "decontaminate",
    "repetition_filter", "group_quantiles", "dedup_clusters",
    "pipeline_full", "span_dedup", "temperature_mix", "vocab_topk",
    "event_rollup", "span_dedup_apply", "dedup_incremental",
    "embedding_gram", "event_rollup_hopping", "distinct_users", "cms_counts", "unigram_nll", "event_topk_windowed", "scd_asof", "dedup_keep_best", "quality_quantile_mix", "doc_percentiles", "rolling_avg", "event_cube", "funnel", "cohort_retention", "upsert_merge",
    "semi_join", "anti_join", "scalar_subquery", "case_pivot",
    "nation_volume", "having_subquery", "kmeans_fixed", "profile_table",
    "text_normalize", "attribution_join", "json_extract", "gap_fill",
    "grouping_sets", "posting_lists",
    "bm25_rank", "weighted_sample", "group_split", "knn_pagerank",
    "incremental_rollup", "trailing_window", "corpus_diff", "table_digest", "set_ops", "unpivot_measures", "weighted_sample_stratified",
    # round 4
    "profile_approx", "percentile_approx", "tpch_q6", "tpch_q8",
    "tpch_q14", "tpch_q18", "tpch_q19", "tfidf_pairs", "doc_chunks",
    "bigram_nll", "linear_interp", "first_touch", "stats_agg",
    "session_rollup", "ntile_deciles", "fuzzy_match", "mom_revenue",
    "price_ranks", "native_pivot", "bloom_join", "zorder_layout",
    # round 6
    "ann_lsh_topk", "dedup_simhash", "knn_pagerank_lsh",
    "first_last_ignore_nulls", "tpch_q15", "cume_dist",
    "ann_quantized_topk", "leakage_safe_split",
    "dedup_incremental_minhash", "dedup_embedding_cosine",
    # round 6, later sessions
    "ann_pq_topk", "ann_ivfpq_topk", "kcore", "dsir_resample",
    "semantic_dedup", "heavy_hitters", "perceptron_filter",
    "tpch_q2", "tpch_q11", "tpch_q12", "tpch_q16", "tpch_q20",
    "filter_calibration", "epoch_shuffle", "lpa_communities",
    # round 8 (stream_annotate is a streaming query — its batch twin
    # `annotate` above carries the identical plan)
    "dedup_embedding_lsh", "tpch_q9", "tpch_q13", "tpch_q21",
    # round 10 continuation: the new operator families
    "dedup_jaccard_prefix", "dedup_weighted_jaccard",
    "annotate_nearest_site",
    "dedup_weighted_minhash", "dedup_winnow", "decontaminate_spans",
    "geo_radius_join",
    # round 11
    "shared_passages", "span_dedup_keep_first", "token_budget_sample",
    # round 12: line-hash family + published cleaning recipes
    "boilerplate_lines", "line_dedup_keep_first",
    "token_budget_sample_tokens", "gopher_quality", "c4_filter",
    "url_dedup", "length_buckets", "web_pipeline",
    # round 13: html extraction family, KN smoothing, blocklist stage
    "web_pipeline_full", "url_host_filter",
    "html_extract", "html_links", "html_pipeline", "sentence_dedup",
    "robots_filter", "kn_nll", "badword_filter",
]


JOIN_RE = (
    r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)"
)


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("plans")
    sections = []
    for name in QUERIES:
        df = em.queries()[name](spark, sf)
        p = plan_of(df)
        tree = p.split("(1) ")[0].strip()
        joins = sorted(set(re.findall(JOIN_RE, p)))
        # execute, then read the FINAL adaptive plan: with the r10
        # static/adaptive broadcast-threshold split, the static plan
        # understates the broadcasts AQE converts to at runtime from
        # actual shuffle sizes — the final strategies are the ones a
        # cluster actually runs
        try:
            df.collect()
            fp = df._jdf.queryExecution().executedPlan().toString()
            joins_final = sorted(set(re.findall(JOIN_RE, fp)))
        except Exception:
            joins_final = ["<not executed>"]
        pushed = re.findall(r"PushedFilters: (\[[^\]]*\])", p)
        schemas = re.findall(r"ReadSchema: (.*)", p)
        sections.append((name, tree, joins, joins_final, pushed[:3], schemas[:3]))

    out = [
        "# Physical plans of headline queries",
        "",
        "Captured via `.explain('formatted')` at sf0.01 (regenerate with",
        "`python scripts/capture_plans.py`). What to look for: broadcast",
        "joins on every dimension/range path, parquet filter pushdown +",
        "column pruning, and no probe-side shuffles in the annotate path",
        "(the range join is a mapInPandas over a broadcast table, so the",
        "probe stream shows NO Exchange between scan and output).",
        "",
    ]
    for name, tree, joins, joins_final, pushed, schemas in sections:
        out.append(f"## {name}")
        out.append("")
        out.append(
            "- join strategies (static plan): "
            + (", ".join(joins) if joins else "none (scan/agg only)")
        )
        out.append(
            "- join strategies (FINAL, after AQE re-plan): "
            + (", ".join(joins_final) if joins_final else "none (scan/agg only)")
        )
        out.append(f"- pushed filters: {pushed}")
        out.append(f"- read schemas (pruned): {schemas}")
        out.append("")
        out.append("```")
        out.append(tree)
        out.append("```")
        out.append("")
    os.makedirs("docs", exist_ok=True)
    with open("docs/PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote docs/PLANS.md ({len(sections)} queries)")


if __name__ == "__main__":
    main()
