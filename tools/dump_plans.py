#!/usr/bin/env python
"""Dump formatted physical plans for flagship queries → docs/PLANS.md.

Run from the repo root: ``python tools/dump_plans.py``. The commentary
states what each plan must show for the 100 TB design to hold; a future
regression (lost pushdown, surprise shuffle, missed broadcast) shows up
as a diff in the committed artifact.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openaq_lcs_fetch_spark.plans import QUERIES
from openaq_lcs_fetch_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"

#: query → what the plan must show
COMMENTARY = {
    "pricing_summary": (
        "Scan-bound aggregation: the shipdate predicate is in PushedFilters, "
        "ReadSchema carries only the 7 needed columns, and the aggregate is "
        "partial (map-side) + final HashAggregate."
    ),
    "region_revenue": (
        "nation/region are hint-broadcast; the customer and orders sides "
        "join as the optimizer sizes them (broadcast under the threshold "
        "at this SF, shuffle on the natural keys at scale); the final "
        "Exchange feeds the 6-row group-by."
    ),
    "top_revenue_orders": (
        "Filters pushed into all three scans; global top-10 compiles to "
        "TakeOrderedAndProject (no full sort)."
    ),
    "latest_3_per_user": (
        "Window top-k: a single hash-partitioned Exchange on user_id, "
        "rank filter applied in the same stage (WindowGroupLimit pushes "
        "the k=3 cut before the full sort materializes)."
    ),
    "minhash_lsh_pairs": (
        "Candidate generation is an equi-join on (band, band_key) — a "
        "shuffled hash join on bucket keys, never a cartesian product; "
        "signatures come from one explode + one groupBy (single shuffle)."
    ),
    "ann_ivf_search": (
        "Centroids are broadcast; assignment aggregates min_by map-side "
        "(K candidate rows collapse before the shuffle); the probe joins "
        "only the query's cell."
    ),
    "large_quantity_orders": (
        "The HAVING aggregate runs FIRST and shrinks the orderkey set "
        "~200x; the orders join then shuffles on the agg's own "
        "partitioning (exchange reuse) and the top-20 is "
        "TakeOrderedAndProject."
    ),
    "last_shipper_suppliers": (
        "Q21 decorrelated: one shuffle on l_orderkey feeds both the "
        "per-(order,supplier) aggregate and the order-level windows; no "
        "self-join of the fact table appears anywhere in the plan."
    ),
    "nation_market_share": (
        "nation/region broadcast into customer/supplier; the orders-side "
        "join is left to the optimizer (fact-scale at 100 TB); lineitem "
        "shuffles for the join key and the per-year aggregate."
    ),
    "tfidf_top_terms": (
        "tf and df aggs share the exploded (doc_id, token) input; df "
        "joins back as a broadcast (vocabulary-sized); the per-doc "
        "top-3 is a WindowGroupLimit, not a global sort."
    ),
    "ann_multiprobe_search": (
        "Bucket assignment is a narrow map (no shuffle); the Hamming<=1 "
        "probe is a bit-trick filter against the broadcast query row — "
        "at scale it becomes n_planes+1 bucket-key lookups."
    ),
    "kmeans_clusters": (
        "Both Lloyd iterations are visible as broadcast-join assignment "
        "+ posexplode aggregation; centroids never leave the DataFrame "
        "plane (no driver collect in the loop)."
    ),
    "decontaminate": (
        "Benchmark side is BroadcastExchange (benchmark-sized by "
        "construction); corpus shingles meet it map-side, so the only "
        "Exchange carries matched (doc_id, hash) pairs into the count."
    ),
    "doc_repetition": (
        "Map-ONLY: no Exchange, no Generate — top-token frequency is the "
        "longest-run fold over the sorted token array inside codegen; an "
        "explode+groupBy formulation would ship every corpus token."
    ),
    "pii_scrub": (
        "Single codegen'd Project over the scan: three regexp_replace and "
        "three regexp_count columns, zero shuffle at any scale."
    ),
    "pq_search": (
        "ADC: the query's MxK distance table is BroadcastExchange; "
        "candidates join on (m, cid) codes and never touch raw vectors; "
        "global top-5 compiles to TakeOrderedAndProject."
    ),
    "corpus_pipeline": (
        "The composed cleaning chain keeps its stages' shapes: quality and "
        "repetition gates fused into the scan Project, contamination as the "
        "broadcast probe, dedup canonicality as a window over md5 "
        "partitions, then a tiny per-source aggregate."
    ),
    "views_before_purchase": (
        "Range join compiles to an equi SortMergeJoin/BroadcastHashJoin on "
        "(user_id, _bkt) with the ts-range predicate as a post-filter — "
        "never a nested-loop."
    ),
    "kmv_distinct_users": (
        "WindowGroupLimit caps each map partition at k hashes per key "
        "before the exchange; the sketch shuffle is O(k x keys)."
    ),
    "asof_calibration": (
        "Dimension-sized right side → broadcast as-of: the events fact "
        "table is scan → two BroadcastHashJoins → array projection, with "
        "ZERO exchanges and no window/sort on the fact side; the only "
        "shuffle aggregates the tiny calibration table."
    ),
    "asof_next_calibration": (
        "Forward as-of = backward on a negated micros axis; with the "
        "dimension broadcast path the fact side again never exchanges."
    ),
    "sequence_pack": (
        "Distributed prefix sum: per-bucket cumsum windows partition on "
        "the 256-way bucket (parallel), the single-partition window runs "
        "over the 256-row offset table only, offsets come back via "
        "BroadcastHashJoin."
    ),
    "semantic_dedup": (
        "k-means cells bound the candidate self-join: the pair join is an "
        "equi join on cid (cell id), never an all-pairs cross; cosine "
        "verify is a codegen projection on the joined rows."
    ),
    "session_window_stats": (
        "Native session windows: one Exchange on user_id feeding "
        "UpdatingSessionsExec + aggregate — gap-merge is per-key local, "
        "no global sort."
    ),
    "ann_recall_eval": (
        "Both rankings read ONE localCheckpointed scoring pass (broadcast "
        "query vector, no recompute); each top-5 is TakeOrderedAndProject; "
        "the recall join is a 5-row semi join."
    ),
    "containment_pairs": (
        "Candidates from the shingle-hash equi-join (never all-pairs); "
        "the checkpointed shingle table feeds the self-join and the size "
        "aggregate without re-scanning documents; both containment "
        "directions come from ONE intersection aggregate."
    ),
    "media_features": (
        "The multimodal decode path: a single ArrowEvalPython/MapInPandas "
        "stage over the payload projection — payload bytes never shuffle, "
        "feature probes are plain Project columns after the Python stage."
    ),
    "event_type_pivot": (
        "Fixed value list → a single scan of events (no distinct-value "
        "discovery pass) feeding a two-phase aggregate: per-(user,type) "
        "count, then pivot assembly on user_id."
    ),
    "status_priority_sets": (
        "GROUPING SETS = one Expand over the scan feeding one partial+"
        "final aggregate — two independent group-bys for the price of "
        "one pass over orders."
    ),
    "passage_dedup": (
        "Passage-level first-wins dedup: the passage key collapses via "
        "min(struct(doc_id, pos)) with a MAP-SIDE partial HashAggregate — "
        "no windowspecdefinition anywhere, so a boilerplate passage in a "
        "billion docs combines per-partition instead of flooding one "
        "reducer; reassembly is one shuffle on doc_id."
    ),
    "doc_lm_score": (
        "Bigram LM scoring: stats are groupBys on the bigram key; the "
        "stats-to-instance joins are plain equi-joins AQE sizes (broadcast "
        "here, shuffle at web-scale vocabulary); per-bigram log-probs are "
        "quantized to BIGINT micro-nats so the per-doc sum is "
        "order-independent."
    ),
    "weighted_sample": (
        "Domain-weights mixing: the weights dim broadcasts, acceptance is "
        "a map-only hash predicate in the same codegen stage as the scan, "
        "one final aggregate on source."
    ),
    "ivf_pq_search": (
        "IVF-PQ composition: the probed cell arrives as a left-semi "
        "BroadcastHashJoin on vec_id, the ADC distance table as a "
        "BroadcastHashJoin on (m, cid) — the scored rows carry codes "
        "only, never the raw double[] vectors."
    ),
    "ann_rerank": (
        "Retrieve → rerank: the IVF top-20 is JVM-side "
        "(TakeOrderedAndProject over the probed cell); ONE "
        "ArrowEvalPython/MapInPandas stage scores just those candidates "
        "— swap the fake scorer for a real cross-encoder and the plan "
        "is unchanged."
    ),
    "ewma_user_value": (
        "Exponential decay: both window functions (count, row_number) "
        "share ONE Exchange on user_id; each term is an exact "
        "0.5^k multiply quantized to BIGINT before the "
        "order-independent sum; global top-50 is TakeOrderedAndProject."
    ),
    "value_interpolate": (
        "Gap interpolation: ONE Exchange on user_id feeds a single "
        "Window computing all four IGNORE-NULLS neighbour columns — the "
        "fused backward+forward as-of, no self-join."
    ),
    "hourly_completeness": (
        "Spine audit: the (day × hour × type) spine builds from "
        "broadcast sequence explodes; the anti join shuffles only the "
        "compact (slot, type) key, never event payloads."
    ),
    "scd2_intervals": (
        "SCD2 build: a SINGLE Exchange on user_id feeds everything — "
        "change-flag window, running island id, the island rollup "
        "(SortAggregate reusing the sort) and the lead(valid_from) "
        "window; the fact table is shuffled exactly once."
    ),
    "locf_fill": (
        "LOCF: spine union readings feeds a single Exchange on user_id "
        "and ONE running-last Window — no as-of join, no per-gap "
        "fan-out; markers are generated (sequence explode), not stored."
    ),
    "trailing_1h_stats": (
        "RANGE frame: one Exchange + sort per user_id; the trailing-hour "
        "count and DECIMAL sum evaluate in the same Window node — "
        "sliding-interval state bounded by the hour span, no self-join."
    ),
    "embedding_covariance": (
        "Exact covariance: the vec_id equi-join materializes N·d²/2 "
        "product rows but the groupBy(i,j) aggregates map-side, so the "
        "Exchange carries d² partial rows per partition; the 64-row "
        "moment table is broadcast twice."
    ),
    "jl_project": (
        "JL projection: the k-axis fanout is a map-side explode with the "
        "±1 sign computed inline from md5 — no sign-matrix join; the "
        "only Exchange is the (vec_id, j) exact-integer sum."
    ),
    "incremental_hourly_merge": (
        "Lambda merge: both half-month rollups push their ts predicate "
        "into the scan (PushedFilters); the re-aggregation unions two "
        "already-aggregated inputs — the second Exchange carries rollup "
        "rows, never events."
    ),
    "time_weighted_avg": (
        "LOCF integral: lead() weights and the weighted sum share one "
        "(user, day) Exchange; the DECIMAL accumulation keeps the "
        "result partitioning-independent; nothing fact-sized appears "
        "after the window."
    ),
    "event_type_affinity": (
        "Market basket: the self-join input is DISTINCT (user, type) — "
        "per-key fan-out bounded by the 5-type vocabulary; totals are "
        "broadcast; no event-volume-sized join anywhere."
    ),
    "user_value_trend": (
        "Distributed OLS: the five sufficient statistics are ONE "
        "hash-partitioned aggregate with map-side partials; the "
        "closed-form solve is a projection — no UDF, no iteration, "
        "nothing fact-sized after the single Exchange."
    ),
    "zorder_locality": (
        "Z-order audit: the Morton key is pure codegen bit math in the "
        "scan stage; zmin/zmax is a 1-row broadcast; the only "
        "fact-sized Exchange is the 32-bucket rollup."
    ),
    "kmv_daily_merge": (
        "Mergeable KMV: per-day k-minima cut by WindowGroupLimit before "
        "the full sort; the merge input is sketch-sized (k·days rows), "
        "so the global row_number window is bounded; exact count and "
        "sketch share one scan."
    ),
    "dup_span_stats": (
        "Substring dedup: gram strings collapse to 60-bit hashes in the "
        "scan stage; per-gram counts are a WINDOW over gh (ONE read of "
        "the gram table — the groupBy+join alternative evaluates the "
        "explode+md5 twice and joins two gram-sized sides; measured "
        "14x slower at sf0.1); the doc rollup is the second Exchange."
    ),
    "bpe_pair_counts": (
        "Tokenizer-training inner loop: adjacent-pair explode feeds a "
        "partial (map-side) HashAggregate on the pair key, then one "
        "Exchange and TakeOrderedAndProject for the deterministic "
        "top-50 cut — no window, no second read of the corpus."
    ),
    "vocab_oov_rate": (
        "Two-phase vocabulary probe: the corpus-wide freq agg shuffles "
        "token hashes once; the 500-row vocabulary comes back as a "
        "BroadcastExchange so the applied OOV pass is map-only (the "
        "per-source rollup is the only other Exchange)."
    ),
    "bloom_membership": (
        "Bloom sketch: the bit table is a DISTINCT over <=4096 ints -> "
        "BroadcastExchange; the probe side is a k=5 fan-out joined "
        "against it BuildRight, then one per-user AND aggregate. No "
        "shuffle carries anything wider than (user_id, pos)."
    ),
    "embedding_int8_quant": (
        "Two-pass exactness at 64-key width: posexplode feeds a partial "
        "(map-side) min/max HashAggregate, the 64-row range table comes "
        "back as a BroadcastExchange, and the code+error pass is "
        "projection-only before the final 64-key rollup — BIGINT `div` "
        "throughout, no double rounding on the shuffle path."
    ),
    "ctfidf_top_terms": (
        "Class-TF-IDF: (source, token) agg shares the token shuffle with "
        "the class-frequency agg; cf is vocabulary-sized -> "
        "BroadcastExchange; the per-source top-3 compiles to "
        "WindowGroupLimit so only 3 rows per class survive each task."
    ),
    "domain_cap_sample": (
        "One window, no joins: rank-within-source compiles to "
        "WindowGroupLimit(10) — every task truncates to the cap before "
        "the exchange, so the shuffle carries at most 10 rows per "
        "(task, source)."
    ),
    "fuzzy_name_match": (
        "ER on the deduped vocabulary via SymSpell deletion-neighborhood "
        "blocking: ~L^2/2 codegen-generated deletion variants per name, "
        "hashed to int64 before the explode so only (int64, name) rows "
        "shuffle; a shared variant pins a pair to edit distance <= 4, so "
        "per-key fan-out tracks genuine near-matches, never token "
        "hotness (the round-4 stop-token flag); levenshtein + "
        "shared-token verify on candidates."
    ),
    "logreg_gd_steps": (
        "Three GD steps = three (broadcast w -> per-row logit agg -> "
        "per-dim gradient agg) rounds over the checkpointed component "
        "table; every agg is map-side-combined BIGINT. No driver-side "
        "math beyond the scalar N."
    ),
    "pareto_front_parts": (
        "No global window: local strictly-cheaper running-mins partition "
        "by price bucket (parallel), the prefix min runs over the "
        "bucket-count summary table only, and returns via "
        "BroadcastHashJoin."
    ),
    "interval_union_length": (
        "Union-of-intervals in one user-keyed shuffle: the running "
        "max(end) window (exclusive frame), the island cumsum, and both "
        "rollups all share the user_id partitioning."
    ),
    "event_motifs": (
        "Two lead() windows share one user partitioning; the motif agg "
        "is map-side-combined on a 125-value key, and the top-20 "
        "compiles to TakeOrderedAndProject."
    ),
    "feature_auc": (
        "Histogram AUC: one map-side-combined agg to score groups, a "
        "prefix window bounded by the GRID cardinality (not event "
        "count), and a scalar fold — 2*U stays an exact BIGINT."
    ),
    "isotonic_fit": (
        "The one genuine applyInPandas stage, now calendar-bounded: a "
        "map-side-combined (type, hour) rollup precedes "
        "FlatMapGroupsInPandas, so the pandas group holds #hours "
        "(sum, count) blocks — never N/5 raw events (the round-4 "
        "unbounded-group flag) — and an in-UDF cap refuses oversized "
        "groups loudly."
    ),
    "ab_test_zstat": (
        "Two aggregates: per-user conversion flag, then a 2-row variant "
        "rollup folded to one scalar row — no joins, two exchanges "
        "total."
    ),
    "region_monthly_growth": (
        "All event-volume work in the first DECIMAL-cents aggregate "
        "(nation/region broadcast); the lag window runs on region x "
        "month rollup rows only."
    ),
    "salted_join_stats": (
        "The join key widens to (event_type, _salt): the Exchange "
        "hash-partitions on both, so a Zipfian-hot type spreads over 16 "
        "reducers; the replicated dim side is explode over a 5-row "
        "local relation."
    ),
    "cusum_changepoint": (
        "Bucketed exact prefix sum (the sequence_pack shape): the "
        "event-level cumsum window partitions on (event_type, hour), "
        "the per-hour offsets come from a window over the HOURLY rollup "
        "and return broadcast, and the argmax is a map-side-combinable "
        "max(struct) — no 5-key window over raw events anywhere (the "
        "round-4 flag)."
    ),
    "weighted_median_value": (
        "Quantized-value grid prefix sum: per-(type, cell) weights from "
        "a map-side-combined agg, crossing cell from a window over the "
        "<=4096-row grid, in-cell resolution over broadcast-selected "
        "distinct values — no event-volume window on the 5-key "
        "partitioning (the round-4 flag)."
    ),
    "cdc_apply": (
        "MERGE-INTO fold in one shuffle: rank and per-key count share "
        "the same user_id window partitioning, so the change-log scan "
        "exchanges once and the filter is projection-stage."
    ),
    "ohlc_bars": (
        "One (series, bar) exchange feeds both row_number windows AND "
        "the final aggregate — open/close/high/low/count from a single "
        "shuffle; bar ids are codegen integer division."
    ),
    "equi_depth_quantiles": (
        "The shared grid order-statistics operator (operators/"
        "quantiles.py): map-side cell counts, ONE <=4096-row grid window "
        "crossed with the 3-row fraction spec, in-cell resolution over "
        "broadcast-selected distinct values — the whole quantile vector "
        "from one grid; no window ever sees event-volume rows."
    ),
    "value_mad": (
        "Two passes of the shared grid operator: the 5-row median table "
        "broadcasts into the |x - med| scan, whose own median resolves "
        "on a fresh grid. Zero event-volume windows."
    ),
    "value_outliers_3sigma": (
        "Mean/variance never float: one map-side (n, S, Q) DECIMAL(38) "
        "rollup broadcasts back into a second scan where the flag "
        "(n*x - S)^2 > 9(nQ - S^2) and its count are map-side too — two "
        "scans, zero windows."
    ),
    "max_drawdown": (
        "Running max via the cusum bucketed-prefix shape: per-(type, "
        "hour) local running-max windows, EXCLUSIVE prefix max over the "
        "hourly rollup broadcast back, argmax as map-side max(struct)."
    ),
    "theil_sen_daily_slope": (
        "Pairwise slopes from a DAILY-rollup self-join — calendar-"
        "squared, never event-volume; the lower-median pick is one "
        "rollup-level window."
    ),
    "lag_features": (
        "One window whose partition key (user_id) scales WITH the data "
        "— the scale-safe window shape by construction; lags are frame "
        "offsets, no joins."
    ),
    "fuzzy_er_clusters": (
        "SymSpell deletion-blocked pairs (output-bounded) feed the "
        "shared min-label components operator: one label shuffle per "
        "round, rounds = cluster diameter."
    ),
    "part_cheapest_offer": (
        "ARGMIN as a map-side-combinable min(struct(cents, suppkey)) "
        "over the fact — no window over lineitem, no correlated "
        "re-join; supplier names join onto the part-sized result."
    ),
    "customers_all_brands": (
        "Relational division as counting: distinct (customer, brand) "
        "restricted to the broadcast divisor, one distinct-count, a "
        "HAVING filter — no per-brand joins, no NOT-EXISTS chain."
    ),
    "copurchase_triangles": (
        "Degree-ordered triangle counting: within-order pair expansion "
        "(fan-out bounded by order size) into a map-side support gate "
        "(co-occurrence >= 2 prunes noise edges and their quadratic "
        "wedge work), orientation by (degree, id) bounds wedges to "
        "O(E^1.5) (Schank-Wagner), closure is one equi-join; scalar "
        "counts recombine via 1-row broadcasts."
    ),
    "basket_lift_rules": (
        "Apriori 2-itemset pass: 1-itemset supports aggregate map-side "
        "and broadcast back as the frequent-set prune BEFORE the "
        "within-basket pair expansion; pair supports are a second "
        "map-side agg; confidence/lift assemble from broadcast scalars."
    ),
    "hourly_autocorr24": (
        "Hourly rollup self-joined on (type, h+24); all five moments "
        "are exact DECIMAL(38) integers from one map-side agg; the "
        "correlation is one division + one sqrt at the very end."
    ),
    "reliability_bins": (
        "Scalar (min,max) broadcast + ONE map-side aggregate; decile "
        "assignment is pure integer arithmetic — <=10 rows out at any "
        "volume, zero windows."
    ),
    "global_rank_sample": (
        "Exact global ranking without the single-reducer ORDER BY "
        "window: per-cell local ranks partition on the 4096-way value "
        "grid (parallel), cell-count prefix offsets broadcast back, "
        "global rank = offset + local rank."
    ),
    "k_anonymity_audit": (
        "QI equivalence classes from one map-side rollup (classes are "
        "the small side by construction); the 3-row k spec crosses as a "
        "broadcast; integer decile bucketing, exact BIGINT counts."
    ),
    "geo_tz_counts": (
        "Broadcast bounding-box range join (BroadcastNestedLoopJoin "
        "against the 5-row dim — correct here BECAUSE the dim is "
        "dimension-sized); the fact side's only exchange is the 6-row "
        "rollup."
    ),
    "corpus_mix_weights": (
        "Source rollup (map-side) x broadcast target spec + scalar "
        "total; factors are ratios of exact BIGINTs capped at 1 — one "
        "shuffle at source cardinality."
    ),
    "hour_of_day_profile": (
        "One map-side rollup to 24 rows per type; the share window "
        "runs over that rollup only."
    ),
    "ppjoin_pairs": (
        "The self-join input is the PREFIX table (a (1-t) fraction of "
        "shingles); candidates verify via id-keyed joins against the "
        "checkpointed full shingle table. No all-pairs product anywhere."
    ),
    "events_profile": (
        "Single aggregate with Expand for the six exact distincts — one "
        "pass over the scan, one shuffle; the long-form unpivot is a "
        "1-row stack, free."
    ),
    "dedup_shrink_report": (
        "Rides the bounded pair pipeline + iterative components; the "
        "accounting adds one doc->component join and a 20-key rollup — "
        "no new scan of documents bodies."
    ),
    "pca_power_iteration": (
        "Matrix-free power iteration: each round is the 64-row v as a "
        "BroadcastExchange, a map-side-combined dot agg keyed by vec_id, "
        "and a 64-key recombination agg — the d x d covariance never "
        "appears; the localCheckpoint pins the exploded components so "
        "three rounds do not re-scan parquet."
    ),
    "token_pagerank": (
        "Iterative graph centrality at vocabulary width: edges/nodes are "
        "token-sized, each round joins the PR table into the edge list "
        "(broadcast at this SF) and re-aggregates per destination; the "
        "corpus is read once in the pair-count stage."
    ),
    "split_leakage_audit": (
        "Composition cost control: everything upstream is the verified "
        "near-dup plan (banding equi-join on (band, sig-slice) buckets, "
        "shingle-intersection verify keyed by candidate pair); the split "
        "classification rides the existing doc-keyed joins — the audit "
        "adds only the final 9-cell rollup."
    ),
    # --- round 6 ---
    "item_item_cosine": (
        "CF similarity without an all-pairs product: within-order pair "
        "expansion (fan-out bounded by basket size) + support-2 gate, "
        "per-item counts join back on the pair keys; cosine is one "
        "sqrt + one divide of exact integers; top-100 compiles to "
        "TakeOrderedAndProject."
    ),
    "gini_revenue": (
        "Exact Lorenz ranking on the 4096-cell value grid (per-cell "
        "ROW_NUMBER + broadcast prefix offsets — no single-reducer "
        "global window over customers); both moment sums accumulate in "
        "DECIMAL(38,0); Gini is one double division at the end."
    ),
    "benford_digits": (
        "One map-side digit rollup (9 groups) x broadcast 9-row ppm "
        "spec; the chi-square term is wholly integer (DECIMAL(38) "
        "numerator, truncating div) — a pure scan-aggregate."
    ),
    "order_price_reconcile": (
        "Lineitem collapses to per-order charge sums map-side, then one "
        "shuffle join on the natural key o_orderkey; all drift stats "
        "exact BIGINT/DECIMAL — scan-dominated."
    ),
    "kaplan_meier": (
        "Event volume reduces map-side to per-user spans, then to the "
        "day-level life table; only that tiny table enters the "
        "single-group fold (cap-guarded applyInPandas, same stance as "
        "isotonic PAV) — nothing driver-side scales with events."
    ),
    "hourly_type_correlation": (
        "Events collapse to the (hour, type) rollup in one map-side "
        "agg; spine densify, pair join and the 10-row moment rollup all "
        "run on rollup-sized data; r is sqrt/divide over DECIMAL(38) "
        "integer moments."
    ),
    "ma_crossover": (
        "Orders collapse to the daily rollup map-side; the RANGE-frame "
        "windows and lag run over that one-row-per-day series (the "
        "deliberately tiny unpartitioned window, global_rank stance); "
        "the crossover test is integer cross-multiplication, never an "
        "average."
    ),
    "new_vs_returning": (
        "Distinct (day, user) and first-seen MIN are both map-side-"
        "combinable; day-level join + a cumulative window over the "
        "day table only."
    ),
    "iqr_fences_outliers": (
        "Fourth surface of the shared grid order-statistics operator: "
        "one grid pass resolves both quartiles, the 5-row fence table "
        "broadcasts into a counting scan — two event-volume passes, "
        "both scan + map-side agg."
    ),
    "user_type_impurity": (
        "Two map-side rollups (user x type, then user) with the "
        "naturally-spread user key; ppm impurity is integer-exact "
        "DECIMAL(38) div; 10 rows out."
    ),
    "source_lang_tv": (
        "One map-side (source, lang) rollup; the dense matrix, totals "
        "and TV sums are all rollup-sized with broadcast dimensions; "
        "drift number is one division of exact integers."
    ),
    "centroid_lang_classifier": (
        "Char features are 27 map-only length/replace expressions (no "
        "tokenizer shuffle); centroids collapse to a 5x27 broadcast; "
        "scoring is a map-side join + per-doc rollup and the argmin "
        "window sees exactly 5 rows per doc."
    ),
    "streaming_sliding_counts": (
        "Sliding windows in append mode over the heartbeat stream: "
        "each event expands to its two windows inside the stateful agg; "
        "watermark evicts finalized windows, so live state is two "
        "windows per type regardless of stream length."
    ),
    "weekday_anova": (
        "One map-side 7-group rollup of exact integer moments, then a "
        "1-row recombination; F is one double division of exact "
        "integer products — calendar math is pure epoch-day integers."
    ),
    "cramers_v": (
        "35-cell map-side contingency rollup; marginals broadcast back; "
        "the chi-square sum is micro-unit integers (summable, unlike "
        "raw rational cells); V = one sqrt of one division."
    ),
    "churn_features": (
        "One user-keyed aggregate with Expand multi-distinct plus a "
        "1-row observation-end broadcast — the embarrassingly-parallel "
        "feature-matrix shape; user key scales with the data."
    ),
    "nearest_poi": (
        "KNN assignment against a broadcast dimension: K distances per "
        "row map-side, argmin as map-side-combinable min(struct) — the "
        "fact never shuffles except the POI-sized rollup."
    ),
    "hll_distinct_events": (
        "A real HyperLogLog whose ESTIMATE hash-matches the oracle: "
        "md5-portable registers, one map-side (type, register) MAX "
        "rollup — fixed-memory mergeable state, the 100 TB shape."
    ),
    "bfs_hops": (
        "Pregel-style frontier expansion as a driver loop: per round "
        "one frontier-edge equi-join + visited anti-join, "
        "localCheckpoint keeps lineage flat, early exit on empty "
        "frontier; bounded by the 6-hop semantic horizon."
    ),
    "quality_quantile_map": (
        "Quantile normalization with NO source-partitioned window: "
        "both rankings (global and within-source) use the 4096-cell "
        "grid shape — per-(key, cell) local ranks + prefix offsets — "
        "so a 20-source corpus never funnels through 20 reducers; the "
        "value lookup is an equi-join on the target rank."
    ),
    "hourly_value_emd": (
        "Events collapse map-side to the (hour, cell) rollup; the "
        "dense spine, both CDF windows and the EMD rollup are all "
        "rollup-sized; every |deltaCDF| term is an exact DECIMAL(38) "
        "integer with denominators cleared, one division at the end."
    ),
    "ols_hourly_trend": (
        "The whole regression is five DECIMAL(38,0) integer moments "
        "in ONE map-side partial agg — no window, no self-join; the "
        "hour axis is shifted per type so n*sum(x^2) stays ~1e21 at "
        "1e12 rows; the only floats are the final slope/intercept/r2 "
        "ratios of exact integers."
    ),
    "hourly_ks_drift": (
        "Shares hourly_value_emd's exact-integer CDF scaffold "
        "(_hour_cell_cdf); on the discrete cell axis the sup over the "
        "spine rows IS the KS statistic, so the extra cost over EMD "
        "is one MAX instead of a width-weighted SUM — all windows "
        "remain rollup-sized."
    ),
    "seasonal_decompose_24": (
        "Raw events collapse map-side to the (type, hour) rollup; the "
        "dense spine, the 25-row centered-MA frame and the hour-of-day "
        "seasonal rollup all run on rollup-sized inputs; every "
        "numerator (trend 2xMA-24, seasonal mean of detrended) is an "
        "exact integer with denominators 48 / 48*n_k cleared, and the "
        "COUNT-over-frame = 25 guard makes gaps yield UNDEFINED trend "
        "instead of a silently shifted row-offset frame."
    ),
    "hll_distinct_fast": (
        "The PRODUCTION HLL form: one corpus scan, no pre-hash distinct "
        "(register MAX is idempotent under duplicate ids), one map-side-"
        "combinable (type, register) MAX rollup with fixed 512-register "
        "state per type, spine derived from the rollup; the exact-"
        "distinct shuffle that dominates the audit twin does not exist "
        "here."
    ),
    "clustering_coefficients": (
        "Schank-Wagner again (copurchase_triangles' shape): support-"
        "filtered within-order pair edges, degree-ordered orientation "
        "bounding wedge fan-out to O(E^1.5), one closure equi-join; "
        "then each closed triangle explodes to its 3 corners and rolls "
        "up per node. tri(v) and d(v)(d(v)-1) stay exact BIGINTs; the "
        "coefficient is one double division; edges/deg/oriented are "
        "localCheckpointed diamond roots (the triangle-family rule)."
    ),
    "fk_integrity_audit": (
        "Each child table melts ALL its FK columns to (relation, key) "
        "in one scan (explode of a struct array — map-side), one "
        "(relation, key) rollup, a tagged union of parent key sets, "
        "and ONE left-anti join covering all seven relations. The "
        "anti-join touches each DISTINCT key once — never child rows; "
        "contrast fk_violation_audit's per-row LEFT JOIN form."
    ),
    "skew_audit": (
        "Per-key counts collapse map-side; everything else runs on the "
        "count-of-counts table, which is O(sqrt(N)) rows by "
        "construction (k distinct counts need >= k(k+1)/2 source rows) "
        "— so the cumulative window extracting exact p50/p90/p99 is "
        "bounded, and the 1-row output carries top-1 share ppm and the "
        "ceil(max/avg) salt factor as exact integer arithmetic."
    ),
    "inverted_postings": (
        "One distinct (token, doc_id) rollup, then a per-TOKEN ordered "
        "window computes delta gaps and exact varint byte cost "
        "((length(bin(x))+6) div 7 — bit-identical both engines). "
        "Parallelism = vocabulary; the documented envelope is stopword "
        "posting lists (corpus-sized partitions) which production "
        "builds doc-shard — df in the output is the detector."
    ),
    "last_touch_attribution": (
        "One user-partitioned running last_value(click_us IGNORE "
        "NULLS) window (millions of user keys parallelize it; never a "
        "global order), then a 5-row attribution-age rollup; purchase "
        "cents monetize NULL/NaN as 0 under the churn_features guard "
        "and gap mass accumulates in DECIMAL(38,0)/HUGEINT."
    ),
    "hybrid_rrf_fusion": (
        "Hybrid retrieval: the only corpus-sized ops are the two "
        "top-20s (TakeOrderedAndProject over the checkpointed BM25 "
        "rollup; broadcast-query cosine scan). Rank windows run over "
        "the ALREADY-LIMITED depth-20 frames and the full-outer fuse "
        "join is top-k × top-k — RRF terms are single IEEE divisions "
        "of exact ranks, bit-identical across engines."
    ),
    "ann_ndcg_eval": (
        "ONE checkpointed corpus scoring pass feeds both the exact and "
        "the IVF ranking (no parquet in the final plan); DCG terms "
        "quantize rel/log2(p+1) to integer micro-units BEFORE the sum "
        "so a last-ulp log2 difference cannot flip the hash; all NDCG "
        "math runs on ≤10-row frames."
    ),
    "compaction_bins": (
        "All planning on the checkpointed day spine (no parquet in the "
        "final plan): the cumulative packing window is calendar-bounded "
        "by construction, the bin target is a broadcast scalar, and "
        "sequential time-order packing preserves min/max-ts pruning in "
        "the rewritten files."
    ),
    "bpe_train_merges": (
        "Sennrich BPE: the corpus is touched ONCE (map-side word-freq "
        "rollup, capped top-4096 deterministically); all three merge "
        "rounds run on the vocabulary-sized symbol table — "
        "freq-weighted BIGINT pair counts, a 1-row broadcast argmax, "
        "and greedy leftmost non-overlap as pure window arithmetic "
        "(odd offsets within runs of consecutive matches); per-round "
        "localCheckpoint keeps lineage flat."
    ),
    "mase_naive_eval": (
        "Events collapse map-side to the (type, hour) cents rollup; "
        "both error masses come from equi-joins on the hour index "
        "(h-1 / h-24, gap-safe where a row-offset LAG is not), all "
        "rollup-sized; the error sums are exact BIGINT |delta-cents| "
        "and mase is one double ratio of four exact integers."
    ),
    "wilson_proportion_ci": (
        "One map-side (k, n) rollup per type; the interval is scalar "
        "arithmetic over +,-,*,/ and sqrt only — every op correctly "
        "rounded under IEEE-754, so both engines evaluating the "
        "identical expression tree produce bit-equal doubles (ln/exp "
        "would not — same reason the impurity queries use Gini)."
    ),
    "transition_dwell_times": (
        "The sequence pass is ONE user_id-partitioned lead() window "
        "(millions of keys, parallelizes on its own — never a global "
        "sort); everything after is a 25-row rollup with exact "
        "DECIMAL(38) integer-microsecond gap mass; (ts, event_id) "
        "ordering makes within-user order total and deterministic."
    ),
    "checkpoint_roundtrip": (
        "The K4 incremental contract in the plan: the reloaded "
        "high-water mark becomes a ts > hwm PushedFilter on the "
        "parquet scan (at 100 TB this bounds the re-read to the new "
        "tail, not the decade), ReadSchema is pruned to ts alone, and "
        "the count aggregates partial/final around one Exchange."
    ),
    "stats_join_strategy": (
        "Both decisions visible in ONE plan: the truthful-stats join "
        "subtree builds a BroadcastHashJoin (the 25-row dimension "
        "ships, the fact side never shuffles), the doctored-stats "
        "subtree builds a SortMergeJoin with Exchanges on both inputs "
        "— the SHUFFLE_MERGE hint holding against the runtime's own "
        "small-size observation. The planner consumed ONLY the stats "
        "documents; same data, different physical strategies."
    ),
    "preflight_salted_join": (
        "The pre-flight ROUTED, not just warned: the Selinger estimate "
        "said 5x the fact side and the hot-key stats showed one type "
        "owning >= 20% of rows, so the join subtree is the salted "
        "shape — hash partitioning on (event_type, _salt), each hot "
        "type spread over 16 reducers, the 25-row dim exploded 16x "
        "(bounded by the small*16 <= big replication rule). A plan-"
        "only change: the rollup above it is the plain-join oracle's."
    ),
}


def main() -> None:
    spark = get_spark("plans-dump", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    out = ["# Physical plans — flagship queries",
           "",
           "Generated by `tools/dump_plans.py` (sf0.01 inputs; plan shape is",
           "SF-independent). Each section states the property the plan must",
           "keep for the design to hold at scale.", ""]
    for name, note in COMMENTARY.items():
        df = QUERIES[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # keep the operator tree, drop the verbose per-node detail section
        tree = plan.split("\n\n")[0]
        out += [f"## {name}", "", note, "", "```", tree.rstrip(), "```", ""]
    os.makedirs("docs", exist_ok=True)
    with open("docs/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote docs/PLANS.md")


if __name__ == "__main__":
    main()
