"""Capture physical-plan evidence for the headline queries into
PLANS.md: predicate pushdown, column pruning, broadcast joins,
whole-stage codegen spans, map-side partial aggregation.

Usage: python tools/dump_plans.py  (writes PLANS.md at repo root)
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from mtail_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

SHOW = [
    ("tpch_pricing_summary",
     "filter must reach the parquet scan; two-phase hash aggregate"),
    ("join_revenue_by_nation",
     "dimension joins must be BroadcastHashJoin — the fact side never shuffles for them"),
    ("window_topk_orders",
     "single sort+window per partition key"),
    ("mtail_counter_by",
     "regex filter evaluated in one codegen stage; partial count before exchange"),
    ("dedup_minhash_lsh",
     "signature aggregation is partial_min before the shuffle; band join on md5 keys"),
    ("sim_topk_bruteforce",
     "query side broadcast; corpus side scans once"),
    ("sim_topk_gemm",
     "corpus mapInPandas emits only local top-k; store-sized window after"),
    ("sim_ivf_fixed",
     "ArrowEvalPython assignment, broadcast probe join, top-k window"),
    ("dedup_simhash",
     "explode+bit-vote groupBy with partial aggregation before the exchange"),
    ("sessionize_events",
     "one shuffle on user_id shared by the lag window and the aggregation"),
    ("session_window_native",
     "native gap-merge session operator: single exchange on user_id"),
    ("sample_stratified",
     "deterministic sampling is a scan-side codegen filter: the only "
     "Exchange is the final stats aggregation, never the sample itself"),
    ("pack_sequences",
     "per-shard recurrence: ONE exchange on the shard column feeding "
     "the applyInPandas group (FlatMapGroupsInPandas), then a "
     "broadcast-free join back on (shard, order)"),
    ("training_data_pipeline",
     "the composed curation pipeline: quality filter at the scan, "
     "ids-only LSH band join, sampling/split as filters (no "
     "exchange), one packing group exchange, one final aggregate"),
    ("text_lm_xent",
     "bigram-LM scoring: two count aggregations with map-side "
     "partials, n-gram-keyed joins (broadcast at this SF, SMJ with "
     "exchange reuse at scale), fixed-point terms keep the per-doc "
     "sum a plain HashAggregate"),
    ("span_dedup",
     "span counting and the count join share the span-hash key; "
     "explode_outer keeps the window regex once-per-row"),
    ("dsir_weights",
     "bucket tables are n_buckets-sized -> broadcast by "
     "construction at ANY corpus scale; corpus scanned twice, "
     "never cached"),
    ("semantic_dedup",
     "Arrow-batched assignment + cosine kernels only; self-join "
     "keyed on cluster (k is the skew knob at scale)"),
    ("tfidf_top_terms",
     "postings build with map-side partial count; df join keyed on "
     "term (broadcast at this SF's tiny vocabulary, SMJ at scale); "
     "WindowGroupLimit pushes the top-k below the per-doc exchange"),
    ("length_quantiles",
     "ONE exchange on the group key shared by the rank window, the "
     "count window, and the final aggregate — order statistics, no "
     "interpolation"),
    ("cluster_profile",
     "Arrow-batched assignment; the profile is a k-group aggregate "
     "with map-side partials — nothing corpus-sized anywhere"),
    ("dedup_incremental",
     "new-shard buckets join base buckets on (band, bkey) — ids "
     "only; the base corpus is never self-joined, and verification "
     "joins fetch only candidate shingles"),
    ("cms_counts",
     "sketch cells partial-aggregate map-side to <= d*w rows before "
     "ONE exchange; the bounded sketch broadcasts to the lookup join"),
    ("hll_distinct",
     "register table is a 256-key aggregate with map-side max "
     "partials; the estimate is a single-row reduction — nothing "
     "scales with cardinality except the scan"),
    ("hybrid_search",
     "keyword stage prunes to 50 candidates (TakeOrderedAndProject); "
     "the rerank joins 50 rows against embeddings — vector math "
     "never sees the corpus"),
    ("substring_search",
     "trigram index join is ids-only with the query grams broadcast; "
     "the verification regex runs on candidates, never the corpus"),
    ("rate_anomalies",
     "count merge exchanges on (key, widx) with map-side partials; "
     "one count-row-sized exchange on key feeds a SINGLE Window node "
     "for all three trailing stats — raw events never shuffle by key"),
    ("vocab_head",
     "top-k tokens via TakeOrderedAndProject (per-partition heaps, "
     "no single-partition sort of the vocabulary); the cumulative- "
     "coverage window runs over k rows only"),
    ("multimodal_frames",
     "ONE mapInPandas (variable-rows-out frame explode) directly "
     "over the media scan — no extra exchange before or after the "
     "Python stage"),
    ("grep_index_reuse",
     "both needles read the STORED trigram index (no Generate node "
     "anywhere — the corpus explode happened once at index-build "
     "time); candidate intersection per needle, verify scan touches "
     "candidates only"),
    ("bloom_membership",
     "set-bit table aggregates distinct (bounded by m) then "
     "broadcasts; the probe side explodes k positions and groups "
     "back on its own key — no shuffle keyed on a skewable column"),
    ("perplexity_buckets",
     "xent scoring is the lm_xent shape; the tercile pass shares "
     "ONE exchange on the language key across the rank/count/"
     "threshold windows; the keep filter is a map-side expression"),
    ("sim_topk_pq",
     "corpus encodes via ONE Arrow stage to codes; query dtables "
     "broadcast; ADC is a JVM fold over table lookups; "
     "WindowGroupLimit keeps per-query top-k map-side — zero "
     "corpus-sized exchanges, raw vectors never read at query time"),
    ("sim_pq_rerank",
     "the exact-rerank fetch joins the corpus against the BROADCAST "
     "shortlist (shortlist-sized build side) — the float vectors are "
     "read for candidates only, never a second corpus-wide pass"),
    ("quality_classifier",
     "per-feature weight is a pure hash expression; ONE map-side-"
     "combined aggregation per document — no weight-table join at "
     "all in the hash-weight form"),
    ("hard_negatives",
     "label-mismatch filter fused into the broadcast join stage, "
     "BEFORE the per-query top-k window"),
    ("bpe_merge_pairs",
     "pair explode runs over the DISTINCT-word frequency table "
     "(vocabulary-sized), map-side-combined counts, global top-k "
     "via TakeOrderedAndProject"),
    ("hist_quantiles",
     "ONE exchange on the group key carrying BIN rows (never raw "
     "values); cumulative window, group total and final aggregate "
     "share it"),
    ("json_props_agg",
     "from_json is a map-side Catalyst projection (no Python "
     "anywhere); the only exchange is the partial-count merge"),
    ("curation_pipeline_v2",
     "composed incremental ingest: classifier gate and bloom verify "
     "are broadcast joins against bounded relations; the tercile "
     "pass exchanges on lang; the final aggregate is the only other "
     "exchange — nothing corpus x corpus anywhere"),
    # round-8 analytics family
    ("asof_join_last_touch",
     "sort-merge as-of, fused single-scan form (r12): ONE events scan "
     "with the IN-filter pushed down, conditional probe/build tagging "
     "in the projection (no Union), ONE exchange on the key, one "
     "sort, one Window carrying the running last build payload — no "
     "join node at all"),
    ("band_join_counts",
     "time-range self-join as a bucketed EQUI-join (probe explodes "
     "into 3 radius cells) — no CartesianProduct/BroadcastNestedLoop "
     "anywhere; zero-neighbor fill is a broadcast left join of the "
     "count-sized hits table"),
    ("sliding_window_stats",
     "one exchange on the key, one sort, ONE Window node computing "
     "all three trailing frames over integer cents"),
    ("retention_cohorts",
     "distinct (user, day) is the only corpus-sized shuffle; cohort "
     "day is a window MIN over that frame (no first-day join); final "
     "rollup is cohort-sized"),
    ("funnel_conversion",
     "each stage scans only its own event_type (pushed filter), "
     "collapses to per-user 1-row state before any join; stage "
     "frames and counts are user- and 1-row-sized"),
    ("rollup_report",
     "ROLLUP compiles to a single Expand + two-phase hash aggregate "
     "— subtotals and grand total in one pass, no per-level rescan"),
    ("pivot_wide",
     "explicit pivot values -> single aggregation with conditional "
     "count states; no distinct-values pre-job, one exchange on user"),
    ("skew_salted_agg",
     "two exchanges by construction: (key, salt) partial then key "
     "merge — the hot-key fan-out shape, each carrying count rows"),
    ("tpch_q3_shipping",
     "customer AND the filtered orders side both broadcast (AQE "
     "sizes them); lineitem never shuffles for the joins; top-10 is "
     "TakeOrderedAndProject"),
    ("attribution_pipeline",
     "the as-of window feeds the band rollup inside one plan; the "
     "revenue join is purchase-sized and broadcast; final aggregate "
     "is band-cardinality-sized"),
    ("state_intervals",
     "two windows (lag change flag, running island id) and the "
     "interval aggregate share ONE exchange on the key"),
    ("tpch_q6_forecast",
     "the pure scan-side query: every predicate in PushedFilters, "
     "4-column ReadSchema, one map-side-combined global aggregate, "
     "zero joins"),
    ("event_transitions",
     "one key exchange for the lag window; the pair aggregation and "
     "the outgoing totals operate on type-pair-cardinality rows; the "
     "totals join is broadcast by construction"),
    ("multi_touch_attribution",
     "touch-conversion match is a user-keyed equi-join (per-user "
     "event counts bound the fan-out, never all-pairs); the credit "
     "split windows on conversion id and the zero-fill is a "
     "count-sized left join"),
    ("seasonal_anomalies",
     "count merge on (key, widx) with map-side partials; ONE "
     "count-row-sized exchange on (key, dow, hour) feeds a single "
     "Window node for all three seasonal aggregates"),
    ("log_templates",
     "three-regex mask is a map-side Catalyst projection; the only "
     "exchange carries template-cardinality count rows (message "
     "shapes, tiny at any input scale)"),
    ("sliding_window_counts",
     "sliding windows expand map-side (one Expand, no join); the "
     "only exchange carries (key, window) count rows with map-side "
     "partials"),
    ("incident_correlation",
     "the alarm set is tiny by construction and BROADCAST back onto "
     "the hourly count table — the correlation join never touches "
     "raw events"),
    ("cusum_changepoints",
     "counts aggregate map-side-combined on (key, widx); the key "
     "mean is a count-row-sized broadcast; the sequential recurrence "
     "is ONE FlatMapGroupsInPandas over count rows — raw events "
     "never reach Python"),
    ("conversion_lag_quantiles",
     "two-phase global order statistic (global_order_stats): the "
     "returned plan is one scan filtered to the <=2 target value "
     "buckets, a value-level aggregate, and a window partitioned by "
     "quantile tag — NO un-partitioned Window / Exchange "
     "SinglePartition over corpus-derived rows"),
    ("funnel_windowed",
     "same shape as funnel_conversion plus one integer-microsecond "
     "bound predicate per stage join; stage frames stay user-keyed "
     "min-aggregates"),
    ("tpch_q10_returns",
     "customer and nation broadcast; lineitem(returnflag=R at the "
     "scan) joins filtered orders on orderkey — one shuffle pair; "
     "top-20 is TakeOrderedAndProject"),
    ("tpch_q18_big_orders",
     "HAVING group filter: lineitem aggregates once on orderkey "
     "(map-side partials); the >300 survivors broadcast back against "
     "orders, customer broadcast, top-100 TakeOrderedAndProject"),
    ("tpch_q4_priority",
     "EXISTS semi-join: lineitem filtered at the scan to returned "
     "lines, orderkey-only LeftSemi (no row widening), then one "
     "priority-cardinality aggregate"),
    ("tpch_q13_custdist",
     "OUTER-join double aggregation: orders pre-aggregate to "
     "per-custkey counts BEFORE the left join (join input shrinks "
     "to customer cardinality); second aggregate over "
     "count-cardinality rows"),
    ("tpch_q22_idle_balances",
     "NOT-EXISTS anti-join + scalar threshold: integer-cents mean "
     "broadcast (1 row), recent-order custkeys LeftAnti against "
     "customer, one segment-cardinality aggregate"),
    ("multimodal_codec_roundtrip",
     "three chained Arrow MapInPandas stages (synthesize PPM -> real "
     "decode+resize+re-encode -> decode+stats), ZERO exchanges — "
     "media bytes never shuffle"),
    ("multimodal_audio_metrics",
     "one Arrow MapInPandas stage (synthesize PCM16 WAV -> real "
     "stdlib decode -> exact integer metrics), zero exchanges"),
    ("tpch_q17_small_qty",
     "correlated aggregate subquery decorrelated: brand dim "
     "broadcast onto BOTH the per-partkey stats input and the probe; "
     "partkey exchange shared; integer cross-multiplied 20%-of-avg "
     "compare"),
    ("tpch_q15_top_supplier",
     "argmax-of-aggregate: one per-suppkey aggregate, the 1-row max "
     "broadcast back as an equality filter, supplier dim broadcast"),
    ("tpch_q19_disjunctive",
     "disjunctive residual on a broadcast hash join: the common "
     "partkey conjunct is the join key, the OR-of-clause-groups "
     "stays a post-join filter — never a cartesian"),
    ("tpch_q7_nation_volume",
     "two-role dimension: nation broadcasts onto supplier AND "
     "customer, both filter to the 2-nation slice before any fact; "
     "filtered supplier broadcasts onto the date-pruned lineitem "
     "scan; ONE orderkey shuffle pair against orders⋈customer"),
    ("tpch_q8_market_share",
     "conditional ratio over a five-dim star: every dim chain "
     "collapses to a broadcast before the single lineitem⋈orders "
     "orderkey exchange; share computed as integer basis points "
     "(cents*10000 DIV cents)"),
    ("tpch_q14_promo_share",
     "conditional-aggregate ratio: month filter pushed to the scan, "
     "part broadcast carrying only (partkey, is_promo), one map-side "
     "combinable aggregate — no exchange wider than the 1-row final "
     "combine"),
    ("tpch_q21_waiting_suppliers",
     "EXISTS + NOT-EXISTS self-join collapsed into window aggregates "
     "over ONE orderkey shuffle: size(collect_set(supp)) and "
     "size(collect_set(late-supp)) replace both correlated "
     "subqueries; supplier broadcast; TakeOrderedAndProject top-25"),
    ("zorder_layout",
     "Z-order layout keys: one 1-row envelope aggregate broadcast "
     "back, then the Morton interleave as pure WholeStageCodegen bit "
     "math — the corpus never hits an exchange; two-branch integer "
     "ranks (stretch narrow domains, divide-first on wide ones so "
     "epoch-micros envelopes can't overflow under ANSI mode)"),
    ("zorder_skipping_stats",
     "what the layout buys: per-zbucket min/max envelopes (the "
     "file-footer statistics a repartitionByRange write would "
     "produce) + the exact skip ratio of a uid-range predicate — "
     "one bucket-keyed aggregate over the zorder plan, then a "
     "<=64-row summary"),
    ("hll_distinct_by_type",
     "per-group HyperLogLog: distinct users per event type with "
     "m=256 integers of state per group (exact count_distinct "
     "shuffles every distinct pair; the sketch shuffles <= m rows "
     "per group); exact counts broadcast back for the accuracy "
     "column"),
    ("hll_distinct_stream",
     "NINTH stream=batch pair: per-(type,bucket) register maxes in "
     "the streaming state store (max is commutative/idempotent — "
     "the mergeable-sketch property makes the final registers "
     "arrival-order-proof); estimate layer over the final "
     "register table"),
    ("tpch_q5_local_volume",
     "Q5's cyclic join: the ASIA nation slice broadcasts onto "
     "supplier AND customer so both fact scans shrink before the "
     "one orderkey exchange pair; the c_nationkey=s_nationkey cycle "
     "edge is a residual on two small ints"),
    ("tpch_q12_priority_class",
     "the canonical big-big shuffle join: both scans prune to two "
     "columns + pushed date filter, one orderkey exchange pair, "
     "priority CASE folds map-side into a 2-row aggregate"),
    ("cms_counts_stream",
     "TENTH stream=batch pair, the ADD-merge half of the mergeable-"
     "sketch story: count-min cells sum in the state store (fixed "
     "depth x width state at any key cardinality); point-query layer "
     "over the final cell table"),
    ("cms_counts_by_lang",
     "per-group count-min: one 4x1024 grid per language (exact "
     "per-group term counts shuffle every distinct (lang, token) "
     "pair; the sketch shuffles <= depth*width rows per group); "
     "lookup-join strategy left to the planner (the grouped sketch "
     "is groups-scaled, so no forced broadcast — r9 ADVICE)"),
    ("quantile_sketch_prices",
     "mergeable rank sketch (HDR-histogram family; KLL's randomized "
     "compaction would be merge-order-dependent): one corpus scan "
     "folds map-side into <= ~1950 integer bucket counts before the "
     "single exchange; quantile selection is a (q)-partitioned "
     "window + tiny aggregate over the bucket table — all BIGINT "
     "bit math, no transcendental anywhere"),
    ("quantile_sketch_by_type",
     "grouped rank sketch: one bucket table per event type (an "
     "exact percentile pass sorts every row per group at 100 TB; "
     "this shuffles <= ~1950 rows per group); cumulative + total "
     "via two window functions over ONE (group, q) partitioning — "
     "no self-join"),
    ("quantile_sketch_stream",
     "ELEVENTH stream=batch pair: HDR bucket counts ADD-merge in "
     "the streaming state store exactly like count-min cells (sums "
     "commute across micro-batches), deterministic type-1 selection "
     "over the final bounded cell table; checked against the SAME "
     "oracle as the batch form"),
    ("cms_join_size",
     "join-size estimation by sketch inner product: two shared-lane "
     "cell builds (each one bounded exchange over its scan), a "
     "sketch-sized (row,bucket) join, per-row dots with the row "
     "domain coalesced to 0, min over <= depth rows — the corpus "
     "join it prices never executes in the production shape"),
    ("hll_distinct_windowed",
     "event-time windows composed with mergeable sketch state: ONE "
     "exchange on (window, type, bucket) builds the registers "
     "map-side-combined; the estimate layer re-groups the bounded "
     "register table"),
    ("hll_distinct_windowed_stream",
     "TWELFTH stream=batch pair: per-(window, type, bucket) register "
     "maxes in the state store — windowing (tumbling pair) and "
     "register merging (HLL pairs) composed; same oracle as the "
     "batch form"),
    ("cms_self_join_size",
     "F2/self-join-size by sketch self-inner-product: one key scan "
     "per cell build, sketch-sized dot, min over <= depth rows; the "
     "skew signal that feeds the salting decision without a groupBy "
     "over the hot column"),
    ("skew_key_profile",
     "exact skew diagnostic: ONE map-side-combinable groupBy(key) "
     "count then a d-row aggregate; the x1000 multiplicity uses the "
     "two-term integer scaling so a skewed 1e8-row column cannot "
     "overflow int64 under ANSI"),
    ("hll_set_algebra",
     "cross-shard sketch algebra: per-shard register tables (each a "
     "bounded aggregate over its filtered scan) MAX-merge into the "
     "union registers — <= 512 rows through the merge, no rescan; "
     "three estimate layers + inclusion-exclusion are 1-row "
     "broadcast joins"),
    ("join_strategy_advice",
     "the advisor composes two 1-row diagnostics (exact profile: one "
     "map-combinable groupBy then d-row aggregate; sketch-only F2: "
     "cell grids, no exact join) via a 1x1 crossJoin; every decision "
     "is integer/CASE codegen — O(1) on top of its inputs"),
    ("quantile_sketch_merge",
     "cross-shard rank algebra: two shard scans each fold map-side "
     "into <= ~1950 bucket rows; union = add-merge of the two cell "
     "tables; all three quantile selections are (q)-partitioned "
     "windows over bucket-bounded tables — no rescan, no global "
     "window"),
    ("sim_lsh_multitable",
     "multi-table LSH: ONE corpus scan computes all table signatures; "
     "posexplode fans out ids+buckets only (no vector bytes); "
     "candidates dedup then broadcast back onto the vector tables "
     "for the exact rerank — the knn_pq_rerank discipline"),
    ("advised_agg_hot",
     "the advisor EXECUTED: a 1-row profile job picks the plan, and "
     "on the hot key (~20% share) the returned plan IS the salted "
     "two-phase shape — (key, _salt) partial exchange fanning the "
     "hot key across 16 reducers, then the bare-key merge of <= 16 "
     "bounded partials per key; values equal the plain GROUP BY"),
    ("advised_agg_plain",
     "the advisor's other branch live: the uniform key profiles "
     "under the 5x-mean bar, so the SAME operator returns the "
     "single-phase aggregate — one exchange, no salt tax; the pair "
     "proves the rewrite is chosen by the data, not the code"),
    ("advised_agg_sketch",
     "the advisor's PRODUCTION path: the branch decision reads the "
     "CMS self-inner-product F2 estimate + row count (stored sketch "
     "state on a stream) — no exact profile pass; est_f2 >= F2 "
     "always, so the sketch rule flags a SUPERSET of the exact "
     "multiplicity rule's tables and errs only toward the "
     "semantically-free salted branch"),
    ("salted_skew_join",
     "the join-side rewrite for AQE-less plans (streaming disables "
     "AQE): left salted by a ROW attribute, right replicated 16x "
     "over the salt domain, SMJ on (key, salt) — the hot key fans "
     "across 16 reducers on a plan that never re-plans; equals the "
     "plain join exactly, per the oracle"),
    ("quantile_sketch_windowed",
     "event-time windows x HDR cells: ONE exchange on (window, type, "
     "bucket) builds the cell table map-side-combined; the type-1 "
     "selection is a (window, type, q)-partitioned window over "
     "bucket-bounded rows — state scales with hours x types, never "
     "with row count"),
]

INTERESTING = re.compile(
    r"PushedFilters|ReadSchema|BroadcastHashJoin|SortMergeJoin|"
    r"BroadcastNestedLoopJoin|HashAggregate|SortAggregate|partial|"
    r"Exchange|WholeStageCodegen|Window|Generate|PhotonAgg|"
    r"MapInPandas|ArrowEval|LocalTableScan|TakeOrderedAndProject"
)


def grab_plan(df) -> str:
    from mtail_spark.planaudit import formatted_plan

    return formatted_plan(df)


def summarize(plan: str) -> str:
    lines = []
    for ln in plan.splitlines():
        if INTERESTING.search(ln):
            lines.append(ln.rstrip()[:200])
        if len(lines) > 40:
            break
    return "\n".join(lines)


def dhcpd_section(spark, qs):
    """Flagship plan (the engine's heaviest query): the r4 rewrite's
    invariants, self-audited by node counts so a regression shows up
    as a changed number, not a prose drift."""
    df = qs["mtail_prog_dhcpd"](spark, SF)
    plan = grab_plan(df)
    n_hash = len(re.findall(r"\bHashAggregate\b", plan))
    n_sort = len(re.findall(r"\bSortAggregate\b", plan))
    n_exch = len(re.findall(r"\bExchange\b", plan))
    n_win = len(re.findall(r"\bWindow\b", plan))
    n_local = len(re.findall(r"\bLocalTableScan\b", plan))
    out = [
        "## mtail_prog_dhcpd (flagship: 27-site compiled program)",
        "",
        "*Expectation:* scan -> literal-prefiltered shared regex "
        "projection -> event-array explode UNIONED with the tiny "
        "zero-init identity-event local relation (NOT an anti-join "
        "re-executing the upstream) -> two all-primitive HashAggregate "
        "stages -> in-plan store select.  Invariants: **0 "
        "SortAggregate** (counter-only program stays all-primitive), "
        "no window pass, no driver materialization anywhere in the "
        "plan (the only LocalTableScan is the zero-init identity "
        "relation), and a single-digit Exchange count.",
        "",
        f"*Counted in this plan:* HashAggregate={n_hash}, "
        f"SortAggregate={n_sort}, Exchange={n_exch}, Window={n_win}, "
        f"LocalTableScan={n_local}.",
        "",
        "```",
        summarize(plan),
        "```",
        "",
    ]
    assert n_sort == 0, "dhcpd plan regressed: SortAggregate appeared"
    assert n_win == 0, "dhcpd plan regressed: Window appeared"
    return out


def chunkfold_section(spark):
    """Plan evidence for the chunkfold backend (register-RMW programs
    on big inputs): phase A must be exchange-free when the scan has
    enough splits, and the merge must only plan branches for the
    program's exported kinds."""
    import tempfile

    from mtail_spark.compiler.api import compile_program
    from mtail_spark.compiler.chunkfold import chunkfold_store

    src = open("/root/reference/examples/mysql_slowqueries.mtail").read()
    prog = compile_program(src, "mysql_slowqueries.mtail")
    out = [
        "## chunkfold (mysql_slowqueries, register-RMW big-input route)",
        "",
        "*Expectation:* the returned merge plan reads the persisted "
        "phase-A output (InMemoryTableScan over the zero-exchange "
        "MapInPandas — scan splits are the chunks, so NO exchange and "
        "NO sort below it), collapses chunks per file and merges "
        "across files as two HashAggregate levels; the program is "
        "counter-only, so no gauge/histogram branch and no join "
        "appears anywhere.",
        "",
        "```",
    ]
    with tempfile.TemporaryDirectory() as td:
        import os

        p = os.path.join(td, "m.log")
        with open(p, "w") as fh:
            for i in range(20000):
                fh.write(f"# User@Host: u[u] @ h [192.0.2.{i%250}]\n")
                fh.write(f"# Query_time: {i%40}  Lock_time: {i%5}\n")
                fh.write(f"SET timestamp={1207033681+i};\n")
                fh.write(f"UPDATE t SET x = {i} # svc;\n")
        from mtail_spark.sources.logs import read_log_lines

        mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 << 10))
        try:
            df = read_log_lines(spark, p, exact_order=False)
            store = chunkfold_store(prog, spark, df)
            plan = grab_plan(store)
            out.append(summarize(plan))
            store._chunkfold_cache.unpersist()
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
    out.extend(["```", ""])
    return out


def register_plans(spark):
    """Plan evidence for the cross-line register machinery, whose
    DataFrame pipeline lives inside run_batch (the queries() entries
    return the driver-assembled store, a LocalTableScan)."""
    from mtail_spark.compiler.api import compile_program
    from mtail_spark.compiler.codegen import Vectorizer

    src = open("/root/reference/examples/mysql_slowqueries.mtail").read()
    prog = compile_program(src, "mysql_slowqueries.mtail")
    vz = Vectorizer(prog.checked, now_us=0)
    vz.compile()
    spark.range(1).selectExpr(
        "'f' AS filename", "id AS line_no", "'x' AS line"
    ).createOrReplaceTempView("__plan_lines")
    out = [
        "## scalar registers — chunk-parallel prefix scan "
        "(mysql_slowqueries, big-input route)",
        "",
        "*Expectation:* every Window partitions by (filename, __chunk) "
        "— parallel within a single file — except the tiny per-file "
        "prefix windows over chunk summaries; chunk-prefix relations "
        "join back as BroadcastHashJoin (never SortMergeJoin: the big "
        "side never re-sorts on join keys).  Per-stratum summary "
        "branches re-derive their input from the scan with columns "
        "pruned to that stratum's write guards (several pruned "
        "parallel scans, partially deduped by ReusedExchange) — "
        "measured cheaper at s=3 than materializing each stratum "
        "(localCheckpoint tripled the wall time).",
        "",
        "```",
    ]
    chunked = vz.scalar_layers_sql(
        vz.shared_layers_sql(vz.chunked_base_sql("__plan_lines"))
    )
    plan = grab_plan(spark.sql(f"SELECT * FROM {chunked}"))
    out.append(summarize(plan))
    out.extend(["```", ""])
    out += [
        "## scalar registers — per-file window (small-input route)",
        "",
        "*Expectation:* one Exchange + one Sort shared by every "
        "stratum's Window (chained window layers, no joins).",
        "",
        "```",
    ]
    perfile = vz.scalar_layers_sql(
        vz.shared_layers_sql("__plan_lines"), chunked=False
    )
    plan = grab_plan(spark.sql(f"SELECT * FROM {perfile}"))
    out.append(summarize(plan))
    out.extend(["```", ""])
    return out


def main():
    spark = get_spark("plan-dump", cpus=4)
    qs = entrymod.queries()
    out = [
        "# PLANS: physical-plan evidence (auto-generated by tools/dump_plans.py)",
        "",
        "Key excerpts from `.explain(\"formatted\")` at sf0.01 — what to",
        "look for per query, then the plan nodes that prove it.",
        "",
    ]
    out.extend(dhcpd_section(spark, qs))
    for name, why in SHOW:
        df = qs[name](spark, SF)
        plan = grab_plan(df)
        out.append(f"## {name}")
        out.append("")
        out.append(f"*Expectation:* {why}")
        out.append("")
        out.append("```")
        out.append(summarize(plan))
        out.append("```")
        out.append("")
    out.extend(register_plans(spark))
    out.extend(chunkfold_section(spark))
    with open("/root/repo/PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
