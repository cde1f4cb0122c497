"""Regenerate docs/PLANS.md from live explain("formatted") output."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from m12_kafkastreams_python_azure_spark.plans.checks import explain_str  # noqa: E402
from m12_kafkastreams_python_azure_spark.session import get_spark  # noqa: E402

SECTIONS = [
    ("hotels_count", "Flagship reference aggregate (K2-K4)",
     "One scan, partial agg map-side, single small shuffle on stay_category, "
     "final agg. The enrichment stack (F3-F5) is folded into the scan-side "
     "Project: no Python anywhere."),
    ("forecast_revenue_q6", "TPC-H Q6 — pure pushdown",
     "Every predicate (date range, discount band, quantity cap) lands in "
     "PushedFilters; ReadSchema carries 4 of 11 lineitem columns."),
    ("promo_revenue_q14", "TPC-H Q14 — dimension broadcast",
     "part broadcasts (BroadcastHashJoin BuildRight); lineitem streams "
     "through without a shuffle; single-row ratio aggregate."),
    ("asof_latest_order", "As-of join — union spine",
     "NO join operator in the plan: both sides union on a (key, time) "
     "spine, one Window carries the latest order forward. Linear work, "
     "zero row explosion."),
    ("value_band_join", "Band join — broadcast nested loop",
     "3-row bands dimension broadcasts; the non-equi join is a map-side "
     "lookup."),
    ("minhash_near_dup", "MinHash+LSH near-dup — bucketed, never quadratic",
     "One keyed exchange on (band, band-hash) feeds the in-bucket pair "
     "expansion (higher-order functions, no self-join); candidate pairs "
     "broadcast onto the shingle table for the exact-Jaccard verify. No "
     "CartesianProduct anywhere."),
    ("embedding_near_dup_lsh", "Banded sign-LSH embedding near-dup",
     "Exact-duplicate collapse first (one vector-keyed Window, no "
     "broadcast assumption), then LSH over distinct vectors only: all 32 "
     "hyperplanes ship as one literal array-of-arrays (tiny expression "
     "tree); band buckets derive from a single sign-bit pass; verify "
     "joins stream the id-only pair list against the vector table; "
     "expansion joins translate rep pairs back to member pairs."),
    ("segment_dedup", "Boilerplate-segment dedup (CCNet line dedup)",
     "Narrow segmenting (array slices), ONE shuffle on the segment for "
     "the cross-doc frequency window — no self-join, no broadcast of the "
     "unbounded boilerplate set — one doc-keyed shuffle to reassemble "
     "kept text in order."),
    ("domain_cap", "Per-domain cap — salted two-phase top-K",
     "Two Window stages: phase 1 partitions by (source, input-partition "
     "id) so a mega-domain spreads across tasks; phase 2 ranks the <= "
     "cap * n_partitions survivors. No unpartitioned global window, no "
     "per-source funnel."),
    ("semantic_dedup", "SemDeDup in-cluster embedding dedup",
     "Exact-collapse window, then a SALTED equi-join on (cluster, "
     "hash(id) % 8) with the cosine predicate inside the join condition "
     "— only dominating pairs materialize; left_anti subtracts the "
     "dominated set. No CartesianProduct/BNLJ (plan-asserted)."),
    ("ann_ivfpq", "IVFPQ — coarse-quantizer pruning x compressed ADC",
     "The probe is an EQUI-join on centroid_id (queries broadcast with "
     "their per-query ADC tables); the scan side reads codes, not "
     "vectors; exact re-rank touches only the bounded survivor set."),
    ("bm25_retrieval", "BM25 retrieval — hit-set-proportional shuffles",
     "One tokenization per scan (codegen CSE over the shared split "
     "projection); the isin(term) filter lands scan-side so the tf "
     "aggregate shuffles only query-term hits; dl rides the tf keys (no "
     "dl join); idf and corpus stats broadcast; top-k is "
     "TakeOrderedAndProject, never a global sort."),
    ("bpe_merges", "Iterated BPE merges — vocab-bounded training loop",
     "The corpus collapses to the word-count table in ONE shuffle "
     "(cached); each of the 3 unrolled iterations is a vocab-sized "
     "narrow pass (shifted-slice zip_with pair build), a bounded-key "
     "aggregate, a TakeOrderedAndProject top-1, and a 1-row broadcast "
     "LEFT join on a constant key applying the merge as a literal string "
     "replace (crossJoin would annihilate the vocab when merges are "
     "exhausted) — no driver round-trip anywhere."),
    ("token_budget_select", "Token-budget selection — no global sort",
     "The naive spelling is an unpartitioned corpus-wide cumsum window; "
     "this plan buckets by quality, running-sums |buckets| rows in a "
     "bounded window, broadcasts the totals back, and decides every "
     "keep in ONE bucket-partitioned windowed pass. The scored "
     "projection is registry-persisted: the quality battery runs once."),
    ("dedup_keep_best", "Keep-best near-dup curation — CC + quality argmax",
     "Prefix-bucket equi-join candidates (never all-pairs), exact "
     "Jaccard verify, pointer-jumping connected components, then one "
     "cluster-partitioned quality window picks the keeper; singletons "
     "ride the left join untouched. method='minhash' swaps the "
     "candidate stage for the banded-LSH pipeline, same tail."),
    ("knn_label_vote", "kNN label vote — broadcast query side + tiny vote",
     "The exact ground-truth spelling: labeled corpus streams "
     "partition-local against the broadcast query set; only k rows per "
     "query reach the (query,label) vote aggregate and per-query argmax "
     "window. The api front door swaps the candidate stage for IVF/LSH "
     "equi-join plans at scale (same vote, cartesian-free asserted)."),
    ("knn_label_vote_ivf", "kNN labeling — persisted sqrt(n)-list IVF probe",
     "The production lifecycle: the plan READS a saved index (parquet "
     "scan partitioned by centroid_id — no k-means, no corpus "
     "re-assignment anywhere in the plan), equi-joins the broadcast "
     "probe set on centroid_id, and feeds the same vote tail. List "
     "count is ceil(sqrt(n)), so the per-query scan is nprobe*sqrt(n) "
     "rows and the prune ratio tightens as the corpus grows."),
    ("exact_substring_dedup", "ExactSubstr span removal — no gram window",
     "Stride-1 grams from the shifted-slice zip chain; the corpus-first "
     "occurrence per gram is a gram-keyed min(struct) AGGREGATE (partial "
     "map-side — never a row_number window over the hottest gram); "
     "duplicate occurrences re-join on the gram key, covered positions "
     "explode n-wide, and ONE doc-keyed shuffle reassembles survivors "
     "in order."),
    ("phash_near_dup", "Perceptual-hash image dedup — 16-byte shuffles",
     "mapInPandas emits (id, int64) dHash rows — the media bytes never "
     "reach an exchange; one keyed repartition on (band, bucket) feeds "
     "the bounded in-bucket pair expansion; the Hamming verify is "
     "bit_count(xor) on the signatures riding the bucket structs. "
     "8-bit bands make recall COMPLETE for hamming <= 6 (pigeonhole), "
     "so the plan is an exact operator with LSH cost."),
    ("volume_shipping_q7", "TPC-H Q7 — dims broadcast before the big joins",
     "The two 1-nation supplier/customer slices broadcast, so the "
     "lineitem scan is pruned ~25x before the only big-big shuffles "
     "(lineitem⋈orders, orders⋈customer) — the minimum shuffle set any "
     "engine pays for this query."),
    ("lone_fault_supplier_q21", "TPC-H Q21 (adapted) — EXISTS as agg+window",
     "The double-correlated EXISTS/NOT-EXISTS spelling would self-join "
     "lineitem twice; this plan scans it ONCE (plan-asserted): "
     "per-(order, supplier) partial-agg, then a window over l_orderkey "
     "whose partitions are bounded by suppliers-per-order — no skew at "
     "any corpus size."),
    ("quality_classifier", "Linear quality classifier — zero-shuffle pass",
     "fastText-style inference: the weight table constant-folds into a "
     "literal map, the token sum is an array aggregate — the whole plan "
     "is one Project with no Exchange and no Python, so classification "
     "rides the scan and the downstream keep-filter pushes onto it."),
    ("trigram_backoff_score", "Stupid-backoff trigram LM — broadcast model",
     "All three count tables (and both context lookups) come back as "
     "BroadcastHashJoins onto the eval-side narrow pass — the model is "
     "vocabulary-bounded, the corpus is read once per count table and "
     "once for scoring, and the only doc-proportional shuffle is the "
     "final per-doc mean."),
    ("ngram_novelty", "N-gram novelty — first-owner as aggregate",
     "First corpus occurrence per gram is a gram-keyed MIN aggregate "
     "(partial map-side), never a row_number window whose hottest-gram "
     "partition would be corpus-sized; the join back onto per-(doc, "
     "gram) rows and one doc-keyed agg are the only shuffles."),
    ("scd2_pit_lookup", "SCD2 point-in-time lookup — union spine, no join",
     "Versions and facts union on (key, ts); ONE window per dimension "
     "key carries the latest attribute forward; fact rows read it. No "
     "join operator anywhere — the classic valid_from/valid_to range "
     "join this replaces shows up as BroadcastNestedLoopJoin and dies "
     "past small dims."),
    ("jl_project", "JL random projection — literal matrix, zero shuffle",
     "The 16x64 Rademacher matrix is one nested-list literal; the "
     "projection is transform+zip_with folds inside a single Project — "
     "no Exchange, no Python, each partition projects independently."),
    ("decontaminate_bloom", "Bloom-prefiltered decontamination — exact",
     "The eval side enters the probe as a BIT-ARRAY literal (no "
     "broadcast exchange of gram strings); the bloom filter runs "
     "scan-side on the train grams, and the exact confirm is a shuffle "
     "equi-join that moves only the surviving sliver — false positives "
     "die there, so the output contract equals plain decontaminate."),
    ("hash_sample_per_group", "Exact-k per-group sample — salted two-phase",
     "Phase 1 ranks inside (group, salt) so a mega-group spreads over "
     "8 tasks; phase 2 ranks the <= k*8 survivors. Both windows are "
     "bounded; the md5 order makes the result reproducible across "
     "engines and runs."),
    ("containment_screened", "Screened containment — equi-joins end to end",
     "The winnow screen is shuffle-free per-row array math feeding one "
     "fingerprint-bucket expansion at 1/3 gram density; the verify fans "
     "the persisted candidate table out with a broadcast HASH join on "
     "id_a and one (id_b, gram) equi-join — no nested loop, no "
     "cartesian, and the raw gram-string repartition of the exact "
     "operator is gone (3.1-3.6x fewer shuffle bytes, SCALE.md r16)."),
    ("c4_line_filter", "C4 line-level cleaning — zero-shuffle narrow pass",
     "Split once, one higher-order line filter, page predicates on the "
     "raw text, the blocklist as an array literal: the WHOLE plan is "
     "one WholeStageCodegen project+filter over the scan — no Exchange, "
     "no join, no Python. At 100 TB this runs at scan speed on every "
     "executor independently."),
    ("shuffle_shard", "Training-order shuffle — one hash shuffle + shard sort",
     "md5 sort key computed scan-side; the only exchange distributes by "
     "shard and the row_number window is keyed on shard (state bounded "
     "by shard size) — the minimal physical cost of a reproducible "
     "global permutation, with no corpus-wide window anywhere."),
]


def main() -> None:
    import __spark_entry__ as mod

    spark = get_spark(app_name="plansdoc", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    q = mod.queries()
    d = "/root/testdata/sf0.001"
    out = [
        "# PLANS — physical-plan evidence for the scale discipline",
        "",
        "Generated from `explain('formatted')` at sf0.001 (plan shapes are "
        "scale-independent;",
        "AQE may further improve them at runtime). Regenerate with "
        "`python docs/gen_plans.py`.",
        "",
    ]
    for name, title, note in SECTIONS:
        plan = explain_str(q[name](spark, d))
        lines = plan.splitlines()
        tree_end = next(
            (i for i, l in enumerate(lines) if l.strip() == ""), len(lines)
        )
        tree_lines = lines[:tree_end]
        # Persisted-subtree-heavy plans (e.g. containment_screened)
        # inline every InMemoryTableScan's cached plan plus nested AQE
        # "Initial Plan" sections — 12k+ lines of repetition. The
        # evidence is the TOP of the tree; elide the expansions.
        if len(tree_lines) > 80:
            tree_lines = tree_lines[:80] + [
                f"... ({len(lines[:tree_end])} tree lines total; "
                "cached-subtree and AQE initial-plan expansions elided)"
            ]
        tree = "\n".join(tree_lines)
        details = "\n".join(
            l for l in lines if "PushedFilters" in l or "ReadSchema" in l
        )
        out += [f"## {name} — {title}", "", note, "", "```", tree, "", details, "```", ""]
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))


if __name__ == "__main__":
    main()
