#!/usr/bin/env python
"""End-to-end training-data curation session on the Spark engine — the
LLM-pipeline surface (SURVEY.md §2.11) as one runnable script over the
synthetic corpus:

    python examples/curation_session.py [sf_dir]

Stages: corpus profile -> quality + repetition signals -> exact dedup ->
LSH near-dup closure (connected components, canonical per cluster) ->
benchmark decontamination -> temperature-balanced domain mix ->
train/val/test budgets. Every stage is the scale path the registered
queries use (one shared implementation; see project_etl_spark/operators/
llm_dedup.py, llm_text.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from project_etl_spark.io import table
from project_etl_spark.registry import load_all
from project_etl_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("curation-session",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    docs = table(spark, sf_dir, "documents")

    print(f"== dataset card ({sf_dir}) ==")
    reg["ext_dataset_card"].builder(spark, sf_dir).show(vertical=True)

    print("== corpus profile by language ==")
    (docs.groupBy("lang")
     .agg(F.count(F.lit(1)).alias("n_docs"),
          F.sum("n_chars").alias("n_chars"))
     .orderBy(F.desc("n_docs")).show())

    print("== quality + repetition signals (worst 5 by top-bigram) ==")
    (reg["ext_repetition_score"].builder(spark, sf_dir)
     .orderBy(F.desc("top_bigram_frac"), "doc_id").show(5))

    print("== duplicate clusters (exact + LSH closure) ==")
    cc = reg["ext_dedup_connected_components"].builder(spark, sf_dir)
    (cc.where(F.col("cluster_size") > 1)
     .groupBy("cluster_size")
     .agg(F.count(F.lit(1)).alias("n_docs"))
     .orderBy("cluster_size").show())

    print("== repeated-substring spans (exact-substring dedup marking) ==")
    (reg["ext_substring_dupes"].builder(spark, sf_dir)
     .where(F.col("n_dup_grams") > 0)
     .orderBy(F.desc("dup_frac_q"), "doc_id").show(5))

    print("== semantic dedup (SemDeDup within-cluster drop list) ==")
    reg["ext_semdedup"].builder(spark, sf_dir) \
        .orderBy(F.desc("max_cos"), "dup_id").show(5)

    print("== corpus information profile (entropy + Zipf exponent) ==")
    (reg["ext_corpus_entropy"].builder(spark, sf_dir)
     .join(reg["ext_zipf_slope"].builder(spark, sf_dir), "lang")
     .orderBy("lang").show())

    print("== LM quality signal: perplexity tertiles per language ==")
    (reg["ext_unigram_logprob"].builder(spark, sf_dir)
     .groupBy("lang", "ppl_bucket").count()
     .orderBy("lang", "ppl_bucket").show())

    print("== PII scrub accounting ==")
    (reg["ext_pii_redact"].builder(spark, sf_dir)
     .agg(F.sum("n_emails").alias("emails_redacted"),
          F.sum("n_phones").alias("phones_redacted")).show())

    print("== BM25 retrieval smoke (fixed 3-term query) ==")
    reg["ext_bm25_topk"].builder(spark, sf_dir).show()

    print("== benchmark decontamination ==")
    deco = reg["ext_decontaminate"].builder(spark, sf_dir)
    deco.groupBy("is_contaminated").count().orderBy("is_contaminated").show()

    print("== temperature-balanced domain mix (tau=2) ==")
    reg["ext_domain_mix_temperature"].builder(spark, sf_dir) \
        .orderBy(F.desc("n_docs")).show()

    print("== tokenizer induction: top BPE merge candidates ==")
    reg["ext_bpe_merge_step"].builder(spark, sf_dir).show(5)

    print("== embedding geometry: top-2 principal components ==")
    (reg["ext_embedding_pca"].builder(spark, sf_dir)
     .groupBy("k").agg((F.max("eigenvalue_q") / 1e6).alias("eigenvalue"))
     .orderBy("k").show())

    print("== hybrid retrieval: BM25 x cosine rank fusion (RRF, k=60) ==")
    reg["ext_hybrid_retrieval_rrf"].builder(spark, sf_dir).show()

    print("== retrieval diversity: MMR re-rank (5 of top-12, lambda=0.7) ==")
    reg["ext_mmr_diversify"].builder(spark, sf_dir).orderBy("rank").show()

    print("== quality ensemble vote census (kept on >= 3 of 4 votes) ==")
    (reg["ext_quality_ensemble"].builder(spark, sf_dir)
     .orderBy("lang", "votes").show())

    print("== dedup policy: pairs/drops per Jaccard threshold ==")
    (reg["ext_dedup_threshold_curve"].builder(spark, sf_dir)
     .orderBy("threshold").show())

    print("== language-ID confusion (diagonal = per-language recall) ==")
    (reg["ext_langid_confusion"].builder(spark, sf_dir)
     .orderBy("true_lang", "predicted_lang").show())

    print("== DSIR importance weights: does the target slice score higher? ==")
    (reg["ext_dsir_weights"].builder(spark, sf_dir)
     .join(reg["ext_quality_logistic"].builder(spark, sf_dir), "doc_id")
     .groupBy("kept")
     .agg(F.count("*").alias("n_docs"),
          F.avg("dsir_logweight").alias("avg_dsir_logweight"))
     .orderBy("kept").show())

    print("== sketch audit: MinHash estimate vs exact Jaccard (MAE) ==")
    (reg["ext_minhash_accuracy"].builder(spark, sf_dir)
     .agg(F.count("*").alias("candidate_pairs"),
          F.avg("abs_err").alias("mean_abs_err")).show())

    print("== dup-graph centrality: top PageRank holders ==")
    (reg["ext_pagerank_iter"].builder(spark, sf_dir)
     .orderBy(F.desc("pagerank"), "doc_id").show(5))

    print("== split novelty: held-out 5-grams unseen in train ==")
    reg["ext_ngram_novelty"].builder(spark, sf_dir).orderBy("lang").show()

    print("== balanced output shards (no global sort) ==")
    reg["ext_shard_manifest"].builder(spark, sf_dir).orderBy("shard").show()

    print("== image dedup: aHash collision census ==")
    (reg["ext_image_ahash"].builder(spark, sf_dir)
     .groupBy("n_same_hash").count().orderBy("n_same_hash").show())

    print("== corpus snapshot diff (added/removed/changed census) ==")
    reg["ext_snapshot_diff"].builder(spark, sf_dir).orderBy("status").show()

    print("== winnowing fingerprints (MOSS): per-doc fingerprint counts ==")
    (reg["ext_winnowing"].builder(spark, sf_dir)
     .groupBy("doc_id").count().orderBy(F.desc("count"), "doc_id").show(5))

    print("== partial-overlap candidates by shared fingerprints ==")
    (reg["ext_winnowing_candidates"].builder(spark, sf_dir)
     .orderBy(F.desc("n_shared"), "doc_a", "doc_b").show(5))

    print("== RAG chunking: chunks per doc / tail-chunk sizes ==")
    (reg["ext_chunk_overlap"].builder(spark, sf_dir)
     .groupBy("doc_id").agg(F.count("*").alias("n_chunks"),
                            F.min("n_tok").alias("smallest_chunk"))
     .orderBy(F.desc("n_chunks"), "doc_id").show(5))

    print("== snapshot drift: exact two-sample KS on length distribution ==")
    reg["ext_drift_ks"].builder(spark, sf_dir).show()

    print("== dup-graph cohesion: triangles + clustering coefficient ==")
    (reg["ext_graph_triangles"].builder(spark, sf_dir)
     .orderBy(F.desc("clustering"), "doc_id").show(5))

    print("== physical column profile (events table) ==")
    reg["ext_table_profile"].builder(spark, sf_dir).orderBy("column").show()

    print("== mergeable HLL sketches: estimate vs exact distinct ==")
    reg["agg_hll_sketch_mergeable"].builder(spark, sf_dir).orderBy("g").show()

    print("== dedup policy audit: all four detectors side by side ==")
    reg["ext_dedup_method_census"].builder(spark, sf_dir) \
        .orderBy("method").show()

    print("== dedup resolution: keep-the-longest survivors per cluster ==")
    (reg["ext_dedup_resolution"].builder(spark, sf_dir)
     .orderBy(F.desc("cluster_size"), "cluster_id").show(5))

    print("== SFT chat templates: turn/mask budgets (first 5 samples) ==")
    (reg["ext_chat_template_pack"].builder(spark, sf_dir)
     .orderBy("sample_id").show(5))

    print("== T5 span corruption: mask fractions ==")
    (reg["ext_span_corruption"].builder(spark, sf_dir)
     .agg(F.count("*").alias("docs"),
          F.sum("n_masked").alias("masked_tokens"),
          F.sum("n_tokens").alias("total_tokens")).show())

    print("== robust monitoring: 3-MAD outlier census ==")
    reg["agg_mad_outliers"].builder(spark, sf_dir).orderBy("event_type").show()

    print("== rate trend: EWMA tail of the busiest event type ==")
    (reg["win_ewma"].builder(spark, sf_dir)
     .where(F.col("event_type") == "view")
     .orderBy(F.desc("hour")).show(5))

    print("== PQ codes: 16-bit vectors + reconstruction residuals ==")
    (reg["ext_embedding_pq_codes"].builder(spark, sf_dir)
     .orderBy(F.desc("recon_err_q")).show(5))

    print("== PQ ADC search: top-10 by 8 table lookups per candidate ==")
    reg["ext_ann_pq_adc"].builder(spark, sf_dir).show()

    print("== audio modality: loudest clips by frame energy ==")
    (reg["ext_audio_energy"].builder(spark, sf_dir)
     .orderBy(F.desc("max_frame_sumsq"), "doc_id").show(5))

    print("== hot-domain guard: per-source cap census (cap=15) ==")
    (reg["ext_domain_cap"].builder(spark, sf_dir)
     .orderBy(F.desc("n_dropped"), "source").show(5))

    print("== ingest admission gate: Bloom confusion census ==")
    reg["ext_dedup_bloom_gate"].builder(spark, sf_dir).show()

    print("== cross-shard leakage matrix (shared 5-grams) ==")
    (reg["ext_cross_shard_dupes"].builder(spark, sf_dir)
     .orderBy("shard_a", "shard_b").show())

    print("== heavy-hitter tokens: count-min estimate vs exact ==")
    reg["ext_heavy_hitters_cms"].builder(spark, sf_dir).show()

    print("== contrastive prep: hard negatives for the first query ==")
    (reg["ext_hard_negatives"].builder(spark, sf_dir)
     .where(F.col("q_vec_id") == 0).orderBy("rnk").show())

    print("== k-NN graph: per-vector edge coverage ==")
    (reg["ext_knn_graph_lsh"].builder(spark, sf_dir)
     .groupBy("rnk").count().orderBy("rnk").show())

    print("== label spreading: assignments by propagation round ==")
    (reg["ext_label_spread_knn"].builder(spark, sf_dir)
     .groupBy("src_round").count().orderBy("src_round").show())

    print("== canonicalize: NFC normalization census ==")
    (reg["ext_unicode_normalize"].builder(spark, sf_dir)
     .groupBy("changed").count().orderBy("changed").show())

    print("== distributional drift: per-source JS divergence ==")
    (reg["ext_js_divergence"].builder(spark, sf_dir)
     .orderBy(F.desc("jsd"), "source").show(5))

    print("== quality classifier: two GD steps (loss must fall) ==")
    reg["ext_logreg_train_step"].builder(spark, sf_dir).orderBy("iter").show()

    print("== quality classifier: calibration bins ==")
    (reg["ext_quality_calibration_bins"].builder(spark, sf_dir)
     .orderBy("bin").show())

    print("== tokenizer budget: vocab coverage curve ==")
    (reg["ext_vocab_coverage_curve"].builder(spark, sf_dir)
     .orderBy("vocab_size").show())

    print("== retrieval quality: nDCG@10 per eval query ==")
    reg["ext_ndcg_eval"].builder(spark, sf_dir).orderBy("q_id").show()

    print("== training order: curriculum schedule head ==")
    (reg["ext_curriculum_order"].builder(spark, sf_dir)
     .orderBy("position").show(6))

    print("== corpus statistics: Heaps vocabulary-growth curve ==")
    (reg["ext_vocab_growth_heaps"].builder(spark, sf_dir)
     .orderBy("cp_idx").show())

    print("== boilerplate detector: top bursty terms (Fano factor) ==")
    (reg["ext_burstiness"].builder(spark, sf_dir)
     .orderBy(F.desc("burst_micro"), "tok").show(5))

    print("== provenance: Burrows' Delta between sources ==")
    (reg["ext_stylometry_delta"].builder(spark, sf_dir)
     .orderBy("delta_nano").show(5))

    print("== byte-range dedup: content-defined chunk census (head) ==")
    (reg["ext_cdc_chunking"].builder(spark, sf_dir)
     .orderBy(F.desc("n_shared_chunks"), "doc_id").show(5))

    print("== quality gates: dbt-style data tests ==")
    reg["ext_data_tests"].builder(spark, sf_dir).show(truncate=False)

    print("== quality gates: per-source pass rate with Wilson CI ==")
    reg["ext_wilson_ci"].builder(spark, sf_dir).orderBy("source").show()

    print("== quality cutoff: Otsu threshold over the length histogram ==")
    (reg["ext_otsu_threshold"].builder(spark, sf_dir)
     .where("is_otsu").show())

    print("== drift monitors: PSI between ingest cohorts ==")
    (reg["ext_psi_drift"].builder(spark, sf_dir)
     .orderBy("bin").show(4))

    print("== preference data: length-bias audit by margin ==")
    (reg["ext_preference_pair_audit"].builder(spark, sf_dir)
     .orderBy("margin_bucket").show())

    print("== curated split budgets (full pipeline) ==")
    reg["ext_curation_pipeline"].builder(spark, sf_dir) \
        .orderBy("lang", "split").show()


if __name__ == "__main__":
    main()
