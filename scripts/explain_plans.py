"""Physical-plan audit: print formatted plans for the engine's core
operators and grep for the properties the 100 TB design demands
(pushed filters, pruned read schema, broadcast joins, single exchange
under stacked windows, whole-stage codegen).

Writes docs/PLANS.md. Run after operator changes to keep the plan
story honest.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from feature_engineering_tk_spark.operators import window_features as W
from feature_engineering_tk_spark.operators.asof import asof_join, asof_join_broadcast
from feature_engineering_tk_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark(master="local[8]", app_name="plan-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")

    sections: list[tuple[str, str, list[str]]] = []

    # 1. stacked windows must share ONE exchange
    feat = W.sessionize(ev, 1800.0, entity="user_id", ts="ts", order=["ts", "event_id"])
    feat = W.with_lag(feat, "value", 1, entity="user_id", order=["ts", "event_id"])
    feat = W.rolling_agg(feat, "value", "mean", 5, entity="user_id", order=["ts", "event_id"])
    feat = W.cumulative_agg(feat, "value", "sum", entity="user_id", order=["ts", "event_id"])
    p = plan_of(feat)
    n_exchanges = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    sections.append(
        (
            "stacked windows (sessionize+lag+rolling+cumsum)",
            p,
            [f"exchanges={n_exchanges} (want 1 — Catalyst reuses the entity sort)"],
        )
    )

    # 2. as-of join: one exchange over the union, no join node
    anchors = ev.select("event_id", "user_id", "ts")
    features = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("v")
    )
    p = plan_of(asof_join(anchors, features, entity="user_id", value_cols=["v"]))
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    n_join = len(set(re.findall(r"Join \((\d+)\)", p)))
    sections.append(
        (
            "as-of join (union-tag sort-merge)",
            p,
            [
                f"exchanges={n_ex}",
                f"join_nodes={n_join} (want 0 — no explosion)",
            ],
        )
    )

    # 3. broadcast as-of variant must broadcast
    p = plan_of(asof_join_broadcast(anchors, features, entity="user_id", value_cols=["v"]))
    sections.append(
        (
            "as-of join (broadcast variant)",
            p,
            [f"broadcast={'BroadcastHashJoin' in p or 'BroadcastExchange' in p}"],
        )
    )

    # 4. filter + projection must push into the parquet scan
    q = li.filter(F.col("l_shipdate") <= "1995-01-01").select("l_orderkey", "l_quantity")
    p = plan_of(q)
    sections.append(
        (
            "scan pushdown (filter + 2-column projection)",
            p,
            [
                f"pushed_filters={'PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate' in p}",
                f"pruned_schema={'ReadSchema: struct<l_orderkey:bigint,l_quantity:double' in p}",
            ],
        )
    )

    # 5. dim join must broadcast under the threshold
    q = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy("o_orderpriority").count()
    p = plan_of(q)
    sections.append(
        (
            "fact-dim join (AQE broadcast)",
            p,
            [f"broadcast_planned={'BroadcastHashJoin' in p}"],
        )
    )

    # 6. Q5-shaped 6-table join: bounded dims (region/nation/orders-side
    # aggregates) broadcast; customer scales with the corpus, so its join
    # is LEFT to AQE (sort-merge at toy SF is the scale-correct plan —
    # round-2 verdict item #3)
    import __spark_entry__ as entry

    p = plan_of(entry.q_regional_revenue(spark, SF))
    n_bhj = len(set(re.findall(r"BroadcastHashJoin[^(\n]*\((\d+)\)", p)))
    n_smj = len(set(re.findall(r"SortMergeJoin[^(\n]*\((\d+)\)", p)))
    sections.append(
        (
            "6-table dim chain (TPC-H Q5 shape)",
            p,
            [f"broadcast_joins={n_bhj} (want 4 — bounded dims only)",
             f"sort_merge_joins={n_smj} (want 1 — customer via AQE, never broadcast-hinted)"],
        )
    )

    # 7. IVF ANN: centroid table broadcast, no cross-join explosion beyond it
    from feature_engineering_tk_spark.functions.similarity import ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    p = plan_of(ivf_topk(emb, qvec, k=10, n_centroids=8, nprobe=2))
    sections.append(
        (
            "IVF ANN search (bucket-pruned)",
            p,
            [
                f"centroids_broadcast={'BroadcastNestedLoopJoin' in p or 'BroadcastExchange' in p}",
                f"takeordered={'TakeOrderedAndProject' in p} (top-k heap, no full sort)",
            ],
        )
    )

    # 8. distributed midranks: rank arithmetic on DISTINCT values only
    from feature_engineering_tk_spark.analysis.stats import _average_ranks

    d = ev.select(F.col("event_type").alias("_g"), F.col("value").alias("_v"))
    p = plan_of(_average_ranks(d, "_v"))
    single_part_window = "Exchange SinglePartition" in p and "Window" in p
    sections.append(
        (
            "Kruskal-Wallis midranks (distinct-value prefix sums)",
            p,
            [
                f"no_single_partition_window={not single_part_window} "
                "(ranks from per-range-partition cumsums, never a global-sort window)"
            ],
        )
    )

    # 9. DSIR scoring: both LM model tables must broadcast (bounded by
    # n_buckets), so the raw corpus is never shuffled for scoring
    from feature_engineering_tk_spark.functions.text import bigram_lm_score, importance_weights

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(
        importance_weights(docs, docs.filter(F.col("lang") == "en"), n_buckets=512)
    )
    n_smj = len(set(re.findall(r"SortMergeJoin[^(\n]*\((\d+)\)", p)))
    sections.append(
        (
            "DSIR importance weights (broadcast LM models)",
            p,
            [
                f"model_broadcast={'BroadcastHashJoin' in p}",
                f"corpus_scoring_sort_merge_joins≤1 (only the audit join-back): {n_smj <= 1}",
            ],
        )
    )

    # 10. bigram LM: corpus tokenized exactly twice (two Generate nodes
    # over the parquet scan), history/vocab derived from the count table
    p = plan_of(bigram_lm_score(docs))
    n_gen = len(set(re.findall(r"Generate[^(\n]*\((\d+)\)", p)))
    sections.append(
        (
            "bigram LM scoring (2-scan tokenize)",
            p,
            [f"generate_nodes={n_gen} (want 2 — counts pass + scoring pass)"],
        )
    )

    # 11. transcript family: validate + latency + mask stacked on a
    # native transcript table must share ONE conv_id exchange, and no
    # Window may be unpartitioned
    from feature_engineering_tk_spark.datagen import generate_transcripts
    from feature_engineering_tk_spark.operators.transcripts import (
        loss_mask,
        response_latency,
        validate_transcripts,
    )

    tr = generate_transcripts(spark, n_convs=50, seed=7)
    stacked = loss_mask(response_latency(tr))
    p1 = plan_of(stacked)
    p2 = plan_of(validate_transcripts(tr))
    p = p1 + p2
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", p1))) + len(
        set(re.findall(r"Exchange \((\d+)\)", p2))
    )
    # formatted Window arguments: [exprs], [partition spec], [order] —
    # an empty partition spec prints as "], [], ["
    unpart = len(re.findall(r"Arguments: \[[^\]]*\], \[\], \[", p))
    sections.append(
        (
            "transcript ops (latency+mask stacked; validate)",
            p,
            [
                f"exchanges={n_ex} (want 2 — one conv_id sort per plan)",
                f"unpartitioned_windows={unpart} (want 0)",
            ],
        )
    )

    # 12. pagerank iteration: contribution groupBy must partial-agg
    # map-side before its exchange
    from feature_engineering_tk_spark.operators.graph import pagerank

    edges = ev.select(
        (F.col("user_id") % 40).alias("src"),
        ((F.col("user_id") * 13 + 3) % 40).alias("dst"),
    ).groupBy("src", "dst").agg(F.count(F.lit(1)).alias("weight"))
    # checkpoint_every above n_iter: a lazy localCheckpoint REPLACES
    # the visible plan with an RDD scan, hiding the aggregates from
    # this audit (it fired at the default every-2-iters — audit rot
    # found in round 4)
    p = plan_of(pagerank(edges, weight="weight", n_iter=2, checkpoint_every=999))
    n_partial = len(re.findall(r"partial_sum", p))
    sections.append(
        (
            "pagerank (2 iters)",
            p,
            [f"partial_sum_sites={n_partial} (want >0 — map-side combine)"],
        )
    )

    # 13. drift KS: prefix-sum ECDF — no single-partition exchange, no
    # global sort window (checkpoint=False keeps the lazy plan visible)
    from feature_engineering_tk_spark.analysis.drift import _two_sided_cumulative

    both = (
        ev.select(F.col("value").alias("_x"))
        .withColumn("_s", F.lit("a"))
        .unionByName(
            ev.select((F.col("value") * 2).alias("_x")).withColumn("_s", F.lit("b"))
        )
    )
    p = plan_of(_two_sided_cumulative(both, "_x", "_s", checkpoint=False))
    n_single = len(re.findall(r"Exchange SinglePartition", p))
    n_winparts = len(re.findall(r"Window.*partitionBy|\[_pid", p))
    sections.append(
        (
            "drift two-sided cumulative (KS/MWU core)",
            p,
            [
                f"single_partition_exchanges={n_single} (want 0 — no global sort window)",
                f"pid_partitioned_nodes={n_winparts} (want >0 — range-partitioned prefix sums)",
            ],
        )
    )

    # 14. funnel: ONE entity exchange; summary adds no replicated scan
    # of the entity table and no cartesian product
    from feature_engineering_tk_spark.operators.funnel import funnel, funnel_summary

    per_entity = funnel(
        ev, ["view", "click", "purchase"], entity="user_id", ts="ts"
    )
    p = plan_of(funnel_summary(per_entity, 3))
    # unique node ids — formatted explain prints each node twice
    n_scans = len(set(re.findall(r"Scan parquet\s*\((\d+)\)", p)))
    n_cart = len(set(re.findall(r"CartesianProduct\s*\((\d+)\)", p)))
    sections.append(
        (
            "funnel + summary (single-pass)",
            p,
            [
                f"event_table_scans={n_scans} (want 1 — entity table never replicated)",
                f"cartesian_products={n_cart} (want 0)",
            ],
        )
    )

    # 15. fuzzy_pairs: the only exchange hashes the BLOCK key — edit
    # distance never crosses blocks
    from feature_engineering_tk_spark.operators.dedup import fuzzy_pairs

    docs_df = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(fuzzy_pairs(docs_df))
    # at toy SF the small side broadcasts (no shuffle at all); at scale
    # the same plan shuffles on _blk. Either way the join must be an
    # EQUI-join keyed on the block — never a cross/nested-loop product.
    equi_on_blk = bool(re.search(r"Left keys \[1\]: \[_blk", p))
    n_products = len(
        set(re.findall(r"(?:CartesianProduct|BroadcastNestedLoopJoin)\s*\((\d+)\)", p))
    )
    other_exchanges = len(
        [m for m in re.findall(r"hashpartitioning\((\w+)", p) if m != "_blk"]
    )
    sections.append(
        (
            "fuzzy_pairs (blocked Levenshtein)",
            p,
            [
                f"equi_join_on_block_key={equi_on_blk} (want True — Levenshtein never crosses blocks)",
                f"cross_products={n_products} (want 0)",
                f"non_block_exchanges={other_exchanges} (want 0)",
            ],
        )
    )

    # 16. BPE training iteration: pair counting touches ONLY the vocab
    # lineage — one corpus scan, vocab-sized aggregates after it
    from feature_engineering_tk_spark.functions.bpe import (
        _adjacent_pairs,
        _initial_symbols,
        word_frequency_table,
    )

    vocab = word_frequency_table(docs_df, "text").withColumn(
        "syms", _initial_symbols(F.col("word"))
    )
    pair_counts = (
        vocab.select(F.col("cnt"), F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("w"))
    )
    p = plan_of(pair_counts)
    n_scans = len(set(re.findall(r"Scan parquet\s*\((\d+)\)", p)))
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    sections.append(
        (
            "bpe pair-count job (per merge batch)",
            p,
            [
                f"corpus_scans={n_scans} (want 1 — merges learned on the vocab table)",
                f"exchanges={n_ex} (want 2 — word groupBy + pair groupBy, both partial-agg)",
            ],
        )
    )

    # 17. Bradley-Terry MM iteration: ratings table (model-sized fitted
    # state) broadcasts onto the pairs table; the only exchange is the
    # map-side-combined groupBy(model)
    from feature_engineering_tk_spark.operators.evals import _mm_step, _sides

    battles = ev.select(
        F.concat(F.lit("m"), (F.col("user_id") % 8).cast("string")).alias("model_a"),
        F.concat(F.lit("m"), ((F.col("user_id") * 7 + 3) % 8).cast("string")).alias(
            "model_b"
        ),
        F.concat(F.lit("m"), (F.col("user_id") % 8).cast("string")).alias("winner"),
    )
    sides = _sides(battles, "model_a", "model_b", "winner")
    record = sides.groupBy("model").agg(
        F.count(F.lit(1)).alias("n_games"), F.sum("win").alias("n_wins")
    )
    pairs = sides.groupBy("model", "opponent").agg(F.count(F.lit(1)).alias("_nij"))
    ratings = record.select("model", F.lit(125000).cast("bigint").alias("p"))
    p = plan_of(_mm_step(pairs, record, ratings, 10**6))
    n_bhj = len(set(re.findall(r"BroadcastHashJoin[^(\n]*\((\d+)\)", p)))
    n_smj = len(set(re.findall(r"SortMergeJoin[^(\n]*\((\d+)\)", p)))
    sections.append(
        (
            "bradley_terry MM iteration",
            p,
            [
                f"broadcast_joins={n_bhj} (want >=3 — ratings x2 + scalar total; model-sized fitted state)",
                f"sort_merge_joins={n_smj} (want 0 — nothing corpus-scale joins)",
            ],
        )
    )

    # 18. distinct_ngrams: grams hash to 8-byte keys BEFORE the first
    # exchange — the shuffle never carries gram text
    from feature_engineering_tk_spark.functions.text import distinct_ngrams

    p = plan_of(distinct_ngrams(docs_df, "text", n=2, by="source"))
    # the first Exchange's input columns must be the 8-byte hash (_h),
    # never the gram text (_g)
    ex_inputs = re.findall(r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]", p)
    hash_before_exchange = bool(ex_inputs) and all(
        "_h" in cols and "_g" not in cols for cols in ex_inputs[:1]
    )
    n_partial = len(set(re.findall(r"partial_count", p)))
    sections.append(
        (
            "distinct_ngrams (diversity)",
            p,
            [
                f"gram_hashed_before_exchange={hash_before_exchange} (want True — 8-byte shuffle keys)",
                f"map_side_partial_agg={n_partial >= 1} (want True)",
            ],
        )
    )

    # 19. qa_metrics: pure row-local projection — ZERO exchanges
    from feature_engineering_tk_spark.functions.text import qa_metrics

    qa_in = docs_df.select(
        "doc_id",
        F.col("text").alias("pred"),
        F.reverse(F.col("text")).alias("ref"),
    )
    p = plan_of(qa_metrics(qa_in))
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    sections.append(
        (
            "qa_metrics (token-F1)",
            p,
            [f"exchanges={n_ex} (want 0 — row-local multiset intersection)"],
        )
    )

    # 20. discounted_return: exactly ONE exchange on the canonical
    # transcript table (conv groupBy; the fold itself is row-local)
    from feature_engineering_tk_spark.operators.transcripts import (
        branch_points,
        discounted_return,
        tool_transitions,
    )

    tr2 = generate_transcripts(spark, n_convs=50, seed=11).withColumn(
        "reward", F.length("text").cast("double")
    )
    p = plan_of(discounted_return(tr2))
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    sections.append(
        (
            "discounted_return (reward trace fold)",
            p,
            [f"exchanges={n_ex} (want 1 — one conv groupBy, JVM fold, posexplode)"],
        )
    )

    # 21. tool_transitions: one subtree — the per-source total is a
    # window over the aggregate-sized counts table, so the transcript
    # scans exactly once (a join-back would duplicate the subtree)
    p = plan_of(tool_transitions(tr2))
    n_scans = len(set(re.findall(r"\((\d+)\) (?:Scan|LocalTableScan)", p)))
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    sections.append(
        (
            "tool_transitions (Markov edge table)",
            p,
            [
                f"input_scans={n_scans} (want 1 — no duplicated subtree)",
                f"exchanges={n_ex} (want 3 — conv lag, edge groupBy, src window)",
            ],
        )
    )

    # 22. branch_points: every window partitioned by conv_id
    p = plan_of(branch_points(tr2))
    unpart = len(re.findall(r"Arguments: \[[^\]]*\], \[\], \[", p))
    sections.append(
        (
            "branch_points (fork detection)",
            p,
            [f"unpartitioned_windows={unpart} (want 0 — running prefix rides the conv sort)"],
        )
    )

    # 23. memorization_scan: the gen-side exchange carries the 8-byte
    # gram hash (_h), never document text; islands window per doc
    from feature_engineering_tk_spark.operators.dedup import memorization_scan

    gen = docs_df.where(F.col("doc_id") % 3 == 0)
    corp = docs_df.where(F.col("doc_id") % 3 != 0)
    p = plan_of(memorization_scan(gen, corp, shingle_n=3))
    ex_inputs = re.findall(r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]", p)
    text_in_exchange = any("text" in cols for cols in ex_inputs)
    unpart = len(re.findall(r"Arguments: \[[^\]]*\], \[\], \[", p))
    sections.append(
        (
            "memorization_scan (contiguous-overlap audit)",
            p,
            [
                f"text_never_shuffles={not text_in_exchange} (want True — 8-byte gram hashes only)",
                f"unpartitioned_windows={unpart} (want 0 — islands window per doc)",
            ],
        )
    )

    # 24. contrastive_triplets: both argmaxes ride ONE partial-agg
    # groupBy — no rank window anywhere in the plan
    from feature_engineering_tk_spark.functions.similarity import (
        contrastive_triplets,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").withColumn(
        "grp", F.col("vec_id") % 7
    )
    p = plan_of(contrastive_triplets(emb, "grp"))
    n_windows = len(set(re.findall(r"Window \((\d+)\)", p)))
    n_partial = "partial_max" in p
    sections.append(
        (
            "contrastive_triplets (hard-negative mining)",
            p,
            [
                f"rank_windows={n_windows} (want 0 — struct-max argmax, no row_number)",
                f"map_side_partial_max={n_partial} (want True)",
            ],
        )
    )

    # 25. suggested-encoder family: ewma+pct_change stack on ONE entity
    # exchange with zero Python; pit_target_encode broadcasts its
    # aggregate-sized prefix table (never a sort-merge on the data
    # table, never a whole category on one task)
    from feature_engineering_tk_spark.transforms.encode import expanding_target_encode

    stacked = W.with_ewma(
        ev, "value", 0.3, entity="user_id", order=["ts", "event_id"], method="prefix"
    )
    stacked = W.with_pct_change(stacked, "value", entity="user_id", order=["ts", "event_id"])
    p = plan_of(stacked)
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    has_python = "Python" in p or "ArrowEval" in p
    sections.append(
        (
            "ewma + pct_change (suggested-encoder window stack)",
            p,
            [
                f"exchanges={n_ex} (want 1 — prefix-sum EWMA rides the shared entity sort)",
                f"python_nodes={has_python} (want False — telescoped identity, pure codegen)",
            ],
        )
    )

    pit = expanding_target_encode(
        ev, "event_type", "value", order=["ts", "event_id"], decimal_scale=3
    )
    p = plan_of(pit)
    n_smj = p.count("SortMergeJoin")
    n_bhj = p.count("BroadcastHashJoin")
    # the within-bucket window must partition by (category, day) — a
    # bare partitionBy(category) would put whole categories on one task
    day_bucketed = bool(re.search(r"hashpartitioning\(event_type[^)]*__b", p))
    sections.append(
        (
            "pit_target_encode (leakage-free expanding target mean)",
            p,
            [
                f"broadcast_joins={n_bhj} (want >=1 — (category, day) prefix table is aggregate-sized)",
                f"sort_merge_joins={n_smj} (want 0 — data table never sort-merge-joined)",
                f"day_bucketed_window={day_bucketed} (want True — no whole-category partitions)",
            ],
        )
    )

    # 26. merge_adjacent_turns: the run-id window and the run groupBy
    # must share ONE conv exchange (groupBy clusters on a superset of
    # the window key); de-id ops must be pure scan-side projections
    from feature_engineering_tk_spark.operators.privacy import date_shift, pseudonymize
    from feature_engineering_tk_spark.operators.transcripts import merge_adjacent_turns

    merged = merge_adjacent_turns(tr)
    p = plan_of(merged)
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    sections.append(
        (
            "merge_adjacent_turns (role-alternation repair)",
            p,
            [
                f"exchanges={n_ex} (want 1 — run groupBy reuses the window's conv exchange)",
            ],
        )
    )

    deid = date_shift(pseudonymize(ev, ["user_id"]), "ts", "user_id", 30)
    p = plan_of(deid)
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    has_python = "Python" in p or "ArrowEval" in p
    sections.append(
        (
            "pseudonymize + date_shift (de-identification)",
            p,
            [
                f"exchanges={n_ex} (want 0 — row-local md5 projections, no per-entity table)",
                f"python_nodes={has_python} (want False — JVM md5/conv codegen)",
            ],
        )
    )

    # 27. chat-JSONL ingest: from_json + posexplode must stay entirely
    # scan-local — zero exchanges, zero Python — so a 100 TB JSONL
    # drop parses at scan speed; the sft_export writer side keeps its
    # single conv groupBy
    from feature_engineering_tk_spark.operators.transcripts import sft_export
    from feature_engineering_tk_spark.sources import parse_chat_jsonl

    parsed = parse_chat_jsonl(sft_export(tr), col="json_line")
    p = plan_of(parsed)
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    has_python = "Python" in p or "ArrowEval" in p
    sections.append(
        (
            "chat-JSONL ingest (sft_export -> parse_chat_jsonl)",
            p,
            [
                f"exchanges={n_ex} (want 1 — sft_export's conv groupBy; the parse adds ZERO)",
                f"python_nodes={has_python} (want False — from_json/posexplode codegen)",
            ],
        )
    )

    # 28. BLEU must be a pure row-local projection (zero exchanges);
    # ngram_novelty's fat gram-instance table must shuffle exactly once
    # (on the 8-byte hash), with the corpus reduced to distinct hashes
    from feature_engineering_tk_spark.functions.text import bleu_score, ngram_novelty

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    pairs = docs.select(
        "doc_id",
        F.array_join(F.slice(toks, 1, 8), " ").alias("pred"),
        F.array_join(F.slice(toks, 3, 8), " ").alias("ref"),
    )
    p = plan_of(bleu_score(pairs, max_n=4))
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    has_python = "Python" in p or "ArrowEval" in p
    sections.append(
        (
            "bleu_score (sentence BLEU-4)",
            p,
            [
                f"exchanges={n_ex} (want 0 — clipped counts are row-local array exprs)",
                f"python_nodes={has_python} (want False — JVM higher-order functions)",
            ],
        )
    )

    nov = ngram_novelty(
        docs.filter(F.col("source") == "src0"),
        docs.filter(F.col("source") != "src0"),
        "text",
        n=2,
    )
    p = plan_of(nov)
    # formatted plans carry partition keys on "Arguments:" lines
    gram_text_shuffled = bool(re.search(r"hashpartitioning\(_g", p))
    n_hash_ex = len(re.findall(r"hashpartitioning\(_h", p))
    sections.append(
        (
            "ngram_novelty (corpus n-gram reuse)",
            p,
            [
                f"gram_text_shuffled={gram_text_shuffled} (want False — only 8-byte hashes cross the wire)",
                f"hash_exchanges={n_hash_ex} (want <=2 — corpus distinct + gen instances at most "
                "once each; at toy SF the broadcast of the distinct corpus side leaves the gen "
                "grams unshuffled entirely, and a 100 TB corpus flips to a shuffled hash join "
                "on the same 8-byte key)",
            ],
        )
    )

    # 29. adjacent_similarity: ONE label-partitioned window (never a
    # single-partition sort); dataset_fingerprint: one partial-agg
    # scalar, no exchange beyond the final single-partition gather
    from feature_engineering_tk_spark.functions.embeddings import adjacent_similarity
    from feature_engineering_tk_spark.sources.tables import dataset_fingerprint

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = plan_of(adjacent_similarity(emb, by="label", threshold=0.1))
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    n_single = len(re.findall(r"SinglePartition", p))
    sections.append(
        (
            "adjacent_similarity (topic-boundary cosine)",
            p,
            [
                f"exchanges={n_ex} (want 1 — one label-partitioned window)",
                f"single_partition_exchanges={n_single} (want 0 — by= keeps sorts partition-local)",
            ],
        )
    )

    p = plan_of(dataset_fingerprint(orders, ["o_orderkey", "o_orderstatus"], hash_mode="md5"))
    n_partial = len(set(re.findall(r"HashAggregate \((\d+)\)", p)))
    sections.append(
        (
            "dataset_fingerprint (order-invariant checksum)",
            p,
            [
                f"hash_aggregates={n_partial} (want 2 — map-side partial sum + final merge)",
            ],
        )
    )

    # 30. classifier evaluation: AUC/curve ride the drift prefix-sum
    # core (no global-sort window, no single-partition exchange before
    # the final scalar gather); gains_table must keep the funnel
    # suffix-sum shape (no cartesian product, row table scanned once)
    from feature_engineering_tk_spark.analysis.classification import (
        gains_table,
        roc_curve,
    )

    scored = ev.select(
        (F.col("value") / F.lit(1000.0)).alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("label"),
    )
    p = plan_of(roc_curve(scored, "score", "label"))
    n_single = len(re.findall(r"Exchange SinglePartition", p))
    n_sortglobal = len(set(re.findall(r"Sort \((\d+)\)[^\n]*global=true", p)))
    sections.append(
        (
            "roc_curve (Mann-Whitney prefix-sum core)",
            p,
            [
                f"single_partition_exchanges={n_single} (want 0 — thresholds stay range-partitioned)",
                f"global_sorts={n_sortglobal} (want 0 — no whole-corpus sort to rank scores)",
            ],
        )
    )

    p = plan_of(gains_table(scored, "score", "label", n_buckets=4))
    n_cart = len(set(re.findall(r"CartesianProduct\s*\((\d+)\)", p)))
    n_scans = len(set(re.findall(r"Scan parquet\s*\((\d+)\)", p)))
    sections.append(
        (
            "gains_table (decile lift, suffix-sum)",
            p,
            [
                f"cartesian_products={n_cart} (want <=1 — only the broadcast of the 1-row totals)",
                f"event_table_scans={n_scans} (want 0 — the checkpointed bucket aggregate "
                "replaces the corpus scan; cumulation is bucket-table-sized)",
            ],
        )
    )

    # 31. frequency: heavy_hitters ends in TakeOrdered (k rows to the
    # driver, never a global sort of the spectrum); frequency_spectrum
    # is two stacked map-side-combined aggregates
    from feature_engineering_tk_spark.operators.frequency import (
        frequency_spectrum,
        heavy_hitters,
    )

    p = plan_of(heavy_hitters(ev, "event_type", k=5))
    has_topk = "TakeOrderedAndProject" in p
    n_sortglobal = len(set(re.findall(r"Sort \((\d+)\)[^\n]*global=true", p)))
    sections.append(
        (
            "heavy_hitters (exact top-k)",
            p,
            [
                f"take_ordered={has_topk} (want True — per-partition heaps, k rows gathered)",
                f"global_sorts={n_sortglobal} (want 0)",
            ],
        )
    )

    p = plan_of(frequency_spectrum(ev, "event_type"))
    n_aggs = len(set(re.findall(r"HashAggregate \((\d+)\)", p)))
    sections.append(
        (
            "frequency_spectrum (Good-Turing count-of-counts)",
            p,
            [
                f"hash_aggregates={n_aggs} (want 4 — partial+final for each of the two stacked "
                "groupBys, all map-side combined)",
            ],
        )
    )

    # 32. temporal_split is a pure row-local CASE (zero exchanges, no
    # Python); approx_distinct shuffles HLL sketch BYTES, never the id
    # spectrum (ObjectHashAggregate partial+final, no expand/distinct)
    from feature_engineering_tk_spark.operators.frequency import approx_distinct
    from feature_engineering_tk_spark.operators.sampling import temporal_split

    p = plan_of(
        temporal_split(ev, "ts", "2024-01-20", "2024-01-26", embargo_seconds=86400)
    )
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    has_python = "Python" in p or "ArrowEval" in p
    sections.append(
        (
            "temporal_split (purged chronological folds)",
            p,
            [
                f"exchanges={n_ex} (want 0 — row-local CASE over the scan)",
                f"python_nodes={has_python} (want False — codegen timestamp comparisons)",
            ],
        )
    )

    p = plan_of(approx_distinct(ev, "user_id", by="event_type"))
    n_obj = len(set(re.findall(r"ObjectHashAggregate \((\d+)\)", p)))
    n_expand = len(set(re.findall(r"Expand \((\d+)\)", p)))
    sections.append(
        (
            "approx_distinct (HLL sketch cardinality)",
            p,
            [
                f"object_hash_aggregates={n_obj} (want 2 — partial sketches merge, "
                "only KB-sized binaries cross the wire)",
                f"expand_nodes={n_expand} (want 0 — no exact-distinct expansion of the id column)",
            ],
        )
    )

    # 33. bucketed co-location: two tables bucketed on the same key +
    # count join AND aggregate with ZERO exchanges — the ingest-time
    # amortization of the pipeline's conv_id shuffle
    import tempfile

    from feature_engineering_tk_spark.sources.tables import write_bucketed

    _btmp = tempfile.mkdtemp(prefix="plan_bucketed_")
    write_bucketed(
        ev.select("event_id", "user_id", "value"),
        "plan_ev_b", "user_id", n_buckets=8, path=f"{_btmp}/ev",
    )
    write_bucketed(
        ev.select("user_id", "event_type").distinct(),
        "plan_et_b", "user_id", n_buckets=8, path=f"{_btmp}/et",
    )
    j = spark.table("plan_ev_b").hint("merge").join(spark.table("plan_et_b"), "user_id")
    p = plan_of(j)
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    g = spark.table("plan_ev_b").groupBy("user_id").agg(F.sum("value"))
    pg = plan_of(g)
    n_ex_g = len(set(re.findall(r"Exchange \((\d+)\)", pg)))
    sections.append(
        (
            "bucketed tables (co-located join + agg)",
            p + "\n--- groupBy plan ---\n" + pg,
            [
                f"join_exchanges={n_ex} (want 0 — both sides pre-clustered by the bucket spec)",
                f"agg_exchanges={n_ex_g} (want 0 — scan satisfies the grouping distribution)",
            ],
        )
    )
    spark.sql("DROP TABLE IF EXISTS plan_ev_b")
    spark.sql("DROP TABLE IF EXISTS plan_et_b")

    # 34. rouge_n: like BLEU, a pure row-local projection — zero
    # exchanges, zero Python; js_divergence: no window/sort anywhere,
    # crossJoins carry broadcast aggregate rows (never CartesianProduct);
    # cluster_keywords: token text shuffles once into the (label, token)
    # partial agg, ranking window partitioned by label
    from feature_engineering_tk_spark.analysis.drift import js_divergence_table
    from feature_engineering_tk_spark.functions.text import (
        cluster_keywords,
        rouge_l,
        rouge_n,
    )

    p = plan_of(rouge_n(pairs, max_n=2))
    pl = plan_of(rouge_l(pairs))
    # node IDs restart per plan — count each plan's exchanges separately
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", p))) + len(
        set(re.findall(r"Exchange \((\d+)\)", pl))
    )
    has_python = any(t in p + pl for t in ("Python", "ArrowEval"))
    sections.append(
        (
            "rouge_n + rouge_l (summary eval)",
            p + "\n--- rouge_l plan ---\n" + pl,
            [
                f"exchanges={n_ex} (want 0 — clipped counts and the LCS nested fold are row-local array exprs)",
                f"python_nodes={has_python} (want False — JVM higher-order functions)",
            ],
        )
    )

    lo_sources = [f"src{i}" for i in range(10)]
    jsd = js_divergence_table(
        docs.where(F.col("source").isin(lo_sources)),
        docs.where(~F.col("source").isin(lo_sources)),
        "text",
        tokens=True,
    )
    p = plan_of(jsd)
    n_win = len(re.findall(r"\bWindow\b", p))
    n_cart = len(set(re.findall(r"CartesianProduct\s*\((\d+)\)", p)))
    sections.append(
        (
            "js_divergence (categorical drift)",
            p,
            [
                f"window_nodes={n_win} (want 0 — totals ride broadcast crossJoins, not windows)",
                f"cartesian_products={n_cart} (want 0 — both crossJoin sides are aggregate rows)",
            ],
        )
    )

    p = plan_of(cluster_keywords(docs, "source", "text", top_k=3))
    unpart = len(re.findall(r"Arguments: \[[^\]]*\], \[\], \[", p))
    n_cart = len(set(re.findall(r"CartesianProduct\s*\((\d+)\)", p)))
    tok_exchanges = len(re.findall(r"hashpartitioning\(label|hashpartitioning\(source", p))
    sections.append(
        (
            "cluster_keywords (c-TF-IDF labels)",
            p,
            [
                f"unpartitioned_windows={unpart} (want 0 — ranking partitions by label)",
                f"cartesian_products={n_cart} (want 0 — the scalar A rides a broadcast)",
                f"label_keyed_exchanges={tok_exchanges} (want >=1 — the one fat token shuffle "
                "is the (label, token) partial agg; everything after is vocabulary-sized)",
            ],
        )
    )

    from feature_engineering_tk_spark.analysis.ranking import ranking_metrics
    from feature_engineering_tk_spark.operators.diff import snapshot_diff_summary
    from feature_engineering_tk_spark.operators.reshape import melt, pivot_agg

    ranked = ev.select(
        (F.col("event_id") % 211).alias("query_id"),
        (F.col("event_id") % 47 + 1).cast("int").alias("rank"),
        (F.col("value") / 100.0).alias("relevance"),
    )
    p = plan_of(ranking_metrics(ranked, k=10))
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    unpart = len(re.findall(r"Arguments: \[[^\]]*\], \[\], \[", p))
    sections.append(
        (
            "ranking_metrics (NDCG/MAP/MRR)",
            p,
            [
                f"exchanges={n_ex} (want 1 — the query-key exchange serves the rank-order "
                "windows, the ideal-order windows, and the final partial+final aggregate)",
                f"unpartitioned_windows={unpart} (want 0 — every window partitions by query)",
            ],
        )
    )

    old_s = orders.where(F.col("o_orderkey") % 19 != 3)
    new_s = orders.where(F.col("o_orderkey") % 13 != 5)
    p = plan_of(
        snapshot_diff_summary(old_s, new_s, ["o_orderkey"], ["o_totalprice"])
    )
    n_cart = len(set(re.findall(r"CartesianProduct\s*\((\d+)\)", p)))
    n_join = len(
        set(re.findall(r"(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)[\w ]*\((\d+)\)", p))
    )
    has_python = "Python" in p
    sections.append(
        (
            "snapshot_diff_summary (table-version diff)",
            p,
            [
                f"join_nodes={n_join} (want 1 — ONE full-outer key join, AQE picks the strategy)",
                f"cartesian_products={n_cart} (want 0)",
                f"python_nodes={has_python} (want False — null-safe compare is codegen)",
            ],
        )
    )

    p = plan_of(
        W.rolling_corr(ev, "value", "event_id", window_rows=10,
                       entity="user_id", order=["ts", "event_id"])
    )
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    n_win = len(re.findall(r"\(\d+\) Window\b", p))
    sections.append(
        (
            "rolling_corr (two-series trailing Pearson)",
            p,
            [
                f"exchanges={n_ex} (want 1 — six sums share one bounded frame)",
                f"window_nodes={n_win} (want 1 — all sufficient statistics in ONE Window node)",
            ],
        )
    )

    p = plan_of(melt(li, ["l_orderkey", "l_linenumber"],
                     ["l_quantity", "l_extendedprice", "l_discount"]))
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    sections.append(
        (
            "melt (wide-to-long unpivot)",
            p,
            [f"exchanges={n_ex} (want 0 — Expand is a map-side row generator)"],
        )
    )

    p = plan_of(
        pivot_agg(ev, ["user_id"], "event_type", "value",
                  categories=["click", "error", "purchase", "signup", "view"],
                  decimal_scale=2)
    )
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    n_agg = len(set(re.findall(r"HashAggregate \((\d+)\)", p)))
    sections.append(
        (
            "pivot_agg (long-to-wide conditional aggregation)",
            p,
            [
                f"exchanges={n_ex} (want 1 — one index-key shuffle between partial and final)",
                f"hash_aggregates={n_agg} (want 2 — map-side partials carry every category cell)",
            ],
        )
    )

    # round-5 additions -------------------------------------------------
    from feature_engineering_tk_spark.functions.text import bm25_topk

    p = plan_of(bm25_topk(docs, "spark sort window", k=10))
    sections.append(
        (
            "bm25_topk (lexical retrieval)",
            p,
            [
                f"takeordered={'TakeOrderedAndProject' in p} (top-k heap, no corpus sort)",
                f"query_filter_at_scan={'spark' in p and 'In(' in p or 'IN (' in p or 'isin' in p.lower() or 'In (' in p} "
                "(query-term literals prune the token stream before any aggregate)",
            ],
        )
    )

    from feature_engineering_tk_spark.analysis.drift import (
        hist_sketch_table,
        psi_from_sketches,
        reference_edges,
    )

    edges = reference_edges(ev, "value", bins=10)
    sk = hist_sketch_table(ev.withColumn("shard", (F.col("user_id") % 4).cast("int")), "value", "shard", edges)
    p = plan_of(sk)
    n_agg = len(set(re.findall(r"HashAggregate \((\d+)\)", p)))
    sections.append(
        (
            "hist_sketch_table (fixed-edge per-slice histogram)",
            p,
            [
                f"hash_aggregates={n_agg} (want 2 — map-side partials; rows shuffled ≤ slices×bins)",
                f"python_nodes={'Python' in p} (want False — bin coding is codegen)",
            ],
        )
    )
    p = plan_of(psi_from_sketches(sk, sk, n_bins=len(edges) + 1))
    sections.append(
        (
            "psi_from_sketches (sketch-table PSI)",
            p,
            [
                f"broadcast_totals={'BroadcastExchange' in p or 'BroadcastNestedLoopJoin' in p} "
                "(1-row totals ride broadcasts; input is sketch-sized)",
            ],
        )
    )

    from feature_engineering_tk_spark.operators.diff import apply_diff, snapshot_diff

    old_o = orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
    new_o = old_o.withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
    p = plan_of(apply_diff(old_o, snapshot_diff(old_o, new_o, ["o_orderkey"]), ["o_orderkey"]))
    n_join = len(set(re.findall(r"Join[^(\n]*\((\d+)\)", p)))
    sections.append(
        (
            "apply_diff (diff round-trip, all columns compared)",
            p,
            [
                f"join_nodes={n_join} (want 1 — only the diff's own full-outer; "
                "compared columns come straight from diff rows, no carry join)",
            ],
        )
    )

    from feature_engineering_tk_spark.operators.evals import preference_pairs

    pp = ev.select(
        (F.col("user_id") % 211).alias("prompt_id"),
        F.col("event_id").alias("response_id"),
        F.col("value").alias("score"),
    )
    p = plan_of(preference_pairs(pp))
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    sections.append(
        (
            "preference_pairs (DPO pair construction)",
            p,
            [
                f"exchanges={n_ex} (want 1 — both argmaxes are struct extrema in ONE groupBy)",
                f"window_nodes={len(re.findall(r'Window', p))} (want 0)",
            ],
        )
    )

    from feature_engineering_tk_spark.operators.frequency import (
        cms_estimate,
        cms_sketch_table,
        merge_cms_sketches,
    )

    cms = cms_sketch_table(
        ev.withColumn("shard", (F.col("user_id") % 4).cast("int")),
        "event_type",
        by="shard",
        depth=3,
        width=256,
    )
    p = plan_of(cms)
    n_agg = len(set(re.findall(r"HashAggregate \((\d+)\)", p)))
    sections.append(
        (
            "cms_sketch_table (Count-Min cell table)",
            p,
            [
                f"hash_aggregates={n_agg} (want 2 — map-side partials; shuffle carries ≤ depth×width cells per slice)",
                f"python_nodes={'Python' in p} (want False — probe hashing is codegen)",
            ],
        )
    )
    p = plan_of(cms_estimate(merge_cms_sketches(cms), ["click", "view"], depth=3, width=256))
    sections.append(
        (
            "cms_estimate (point lookup from merged sketch)",
            p,
            [
                f"broadcast_join={'BroadcastHashJoin' in p} (want True — sketch is the bounded build side)",
                f"sort_merge_join={'SortMergeJoin' in p} (want False)",
            ],
        )
    )

    from feature_engineering_tk_spark.operators.membership import (
        bloom_contains,
        bloom_filter_table,
    )

    bench_docs = docs.where(F.col("doc_id") % 50 == 0).select(
        F.col("text").alias("gram")
    )
    bloom = bloom_filter_table(bench_docs, "gram", n_bits=1 << 16, k=3)
    p = plan_of(bloom_contains(docs, "text", bloom, n_bits=1 << 16, k=3))
    n_bhj = len(set(re.findall(r"BroadcastHashJoin[^(\n]*\((\d+)\)", p)))
    sections.append(
        (
            "bloom_contains (k broadcast probes, corpus never shuffles)",
            p,
            [
                f"broadcast_hash_joins={n_bhj} (want 3 = k — every probe map-side)",
                f"sort_merge_join={'SortMergeJoin' in p} (want False — no corpus shuffle)",
                f"python_nodes={'Python' in p} (want False)",
            ],
        )
    )

    from feature_engineering_tk_spark.functions.text import (
        char_entropy,
        skipgram_cooccurrence,
        trigram_lm_score,
    )

    p = plan_of(trigram_lm_score(docs.limit(200), ref=docs))
    sections.append(
        (
            "trigram_lm_score (stupid-backoff cross-corpus scoring)",
            p,
            [
                f"python_nodes={'Python' in p} (want False — tokenize/hash/backoff all codegen)",
                f"cartesian_products={len(re.findall(r'CartesianProduct', p))} (want 0 — totals ride broadcasts)",
            ],
        )
    )

    p = plan_of(char_entropy(docs))
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    sections.append(
        (
            "char_entropy (bounded per-doc Shannon entropy)",
            p,
            [
                f"exchanges={n_ex} (want 0 — pure row-local array expressions)",
                f"python_nodes={'Python' in p} (want False)",
            ],
        )
    )

    p = plan_of(skipgram_cooccurrence(docs, window=2, min_count=5, top_k=None))
    sections.append(
        (
            "skipgram_cooccurrence (row-local window pairs + PMI)",
            p,
            [
                f"sort_merge_join={'SortMergeJoin' in p} (want False — unigram marginals broadcast)",
                f"python_nodes={'Python' in p} (want False — pair generation is nested array transforms)",
            ],
        )
    )

    from feature_engineering_tk_spark.analysis.ranking import rank_biased_overlap

    ranked = ev.select(
        (F.col("user_id") % 50).alias("query_id"),
        F.when(F.col("event_id") % 2 == 0, F.lit("a")).otherwise(F.lit("b")).alias("ranker"),
        (F.col("event_id") % 10 + 1).cast("int").alias("rank"),
        F.col("event_id").cast("string").alias("item_id"),
    )
    p = plan_of(rank_biased_overlap(ranked, depth=10))
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    sections.append(
        (
            "rank_biased_overlap (truncated RBO@d)",
            p,
            [
                f"exchanges={n_ex} (want 1 — one query-key groupBy; depth filter precedes the shuffle)",
                f"window_nodes={len(re.findall(r'Window', p))} (want 0 — the fold is a row-local aggregate expression)",
                f"depth_filter_pushed={'PushedFilters' in p or 'Filter' in p} (rank<=d filters before the exchange)",
            ],
        )
    )

    from feature_engineering_tk_spark.operators.frequency import burst_scores, decayed_counts
    from feature_engineering_tk_spark.operators.sampling import topk_per_group

    p = plan_of(decayed_counts(ev, "event_type", "ts", 604800.0))
    n_agg = len(set(re.findall(r"HashAggregate \((\d+)\)", p)))
    sections.append(
        (
            "decayed_counts (DECIMAL-exact trending counts)",
            p,
            [
                f"python_nodes={'Python' in p} (want False — pow + round + decimal sum in codegen)",
                f"hash_aggregates>=2: {n_agg >= 2} (map-side partial decimal sums)",
            ],
        )
    )
    p = plan_of(burst_scores(ev, "event_type", "ts", 86400.0, 604800.0))
    n_agg2 = len(set(re.findall(r"HashAggregate \((\d+)\)", p)))
    sections.append(
        (
            "burst_scores (two-horizon burst ratio, one pass)",
            p,
            [
                f"hash_aggregates={n_agg2} (want 4 = anchor-max pair + ONE shared partial/final pair for BOTH horizons — no second corpus scan)",
            ],
        )
    )

    p = plan_of(
        topk_per_group(
            ev.select((F.col("user_id") % 100).alias("b"), "event_id", "value"),
            "b", "value", 3, tie_break="event_id",
        )
    )
    n_ex = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    sections.append(
        (
            "topk_per_group (exact score-ordered k per group)",
            p,
            [
                f"exchanges={n_ex} (want 1 — one group-key shuffle, sort is per-partition)",
                f"single_partition_exchange={'SinglePartition' in p} (want False — no global sort)",
            ],
        )
    )

    os.makedirs("docs", exist_ok=True)
    with open("docs/PLANS.md", "w") as f:
        f.write("# Physical-plan audit (generated by scripts/explain_plans.py)\n")
        for title, plan, checks in sections:
            f.write(f"\n## {title}\n\n")
            for c in checks:
                f.write(f"- {c}\n")
            f.write("\n```\n" + plan.strip()[:4000] + "\n```\n")
    for title, _p, checks in sections:
        print(title, "->", "; ".join(checks))
    spark.stop()


if __name__ == "__main__":
    main()
