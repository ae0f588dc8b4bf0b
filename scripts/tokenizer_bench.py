"""Tokenizer-training scale evidence → BENCH/tokenizer.md.

The claim under test (functions/bpe.py learn_bpe batching): merges are
learned on the distinct-word table with BATCHED count jobs, so a
1k-merge training run costs well under one count job per merge
(jobs/merge < 0.7 exact, far less approximate), and a 3-round unigram
hard-EM run costs a fixed 1 + n_iter vocab-sized jobs after the single
corpus scan.

Two corpora, both deterministic:

- **sf0.1 documents** (the driver's benchmark corpus): honest but
  vocabulary-starved — its generator draws from ~31 distinct words, so
  BPE EXHAUSTS all learnable merges (~a few hundred) long before 1k;
  the run is reported at its natural stopping point.
- **synthetic large-vocab corpus**: ~40k distinct words (base·suffix
  composition, Zipf-ish frequencies, fixed seed — pure function of the
  seed, no RNG in the engine path), the regime a real subword
  tokenizer trains in, where the full 1k merges are learnable.

Both runs train on the distinct-word frequency table, so corpus row
count affects only the ONE initial scan; jobs/merge is a property of
the batching algebra, which is what 100 TB cares about.

Usage: python scripts/tokenizer_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from feature_engineering_tk_spark.session import get_spark  # noqa: E402


def synth_corpus(spark, n_docs: int = 200_000, seed: int = 7):
    """Deterministic large-vocab corpus: ~40k distinct words =
    200 bases × 200 suffixes, drawn Zipf-ish by row-hash algebra —
    all JVM expressions, reproducible bit-for-bit."""
    bases = [f"w{chr(97 + i % 26)}{i:03d}" for i in range(200)]
    base_arr = F.array(*[F.lit(b) for b in bases])
    doc = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    # 24 words per doc; word = base[h1 % zipf] + suffix(h2)
    words = F.transform(
        F.sequence(F.lit(0), F.lit(23)),
        lambda i: F.concat(
            F.element_at(
                base_arr,
                (
                    F.pmod(F.xxhash64(F.col("doc_id") * 31 + i, F.lit(seed)), F.lit(40_000))
                    % (F.pmod(F.xxhash64(F.col("doc_id") * 37 + i, F.lit(seed + 1)), F.lit(199)) + 1)
                ).cast("int")
                + 1,
            ),
            F.lpad(
                F.pmod(F.xxhash64(F.col("doc_id") * 41 + i, F.lit(seed + 2)), F.lit(200)).cast(
                    "string"
                ),
                3,
                "0",
            ),
        ),
    )
    return doc.withColumn("text", F.array_join(words, " ")).select("doc_id", "text")


def bench_bpe(df, num_merges: int, exact: bool) -> dict:
    from feature_engineering_tk_spark.functions.bpe import learn_bpe

    stats: dict = {}
    t0 = time.perf_counter()
    merges, vocab = learn_bpe(
        df, num_merges=num_merges, max_batch=16, exact=exact, stats=stats
    )
    wall = time.perf_counter() - t0
    vocab.unpersist()
    n = stats["n_merges"]
    return {
        "requested_merges": num_merges,
        "learned_merges": n,
        "count_jobs": stats["count_jobs"],
        "jobs_per_merge": round(stats["count_jobs"] / max(n, 1), 3),
        "wall_sec": round(wall, 2),
        "merges_per_sec": round(n / wall, 1),
        "mode": "exact" if exact else "approximate",
    }


def bench_unigram(df, spark) -> dict:
    from feature_engineering_tk_spark.functions.unigram import unigram_train

    # job ids are global and monotonically increasing; count the
    # next-job-id delta (DAGScheduler's AtomicInteger, exposed as int)
    sc = spark.sparkContext
    j0 = int(sc._jsc.sc().dagScheduler().nextJobId())
    t0 = time.perf_counter()
    model = unigram_train(df, vocab_size=8000, n_iter=3, max_piece_len=8, seed_size=16_000)
    n_pieces = model.count()
    wall = time.perf_counter() - t0
    j1 = int(sc._jsc.sc().dagScheduler().nextJobId())
    return {
        "n_iter": 3,
        "vocab_size_final": int(n_pieces),
        "spark_jobs": int(j1 - j0 - 1),  # minus the model.count() job
        "wall_sec": round(wall, 2),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        app_name="tokenizer-bench",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    synth = synth_corpus(spark).localCheckpoint(eager=True)
    n_synth_words = (
        synth.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .agg(F.count_distinct("w"))
        .first()[0]
    )

    rows = {}
    for name, fn in (
        ("sf01_docs_exact_1k", lambda: bench_bpe(docs, 1000, exact=True)),
        ("synth_exact_1k", lambda: bench_bpe(synth, 1000, exact=True)),
        ("synth_approx_1k", lambda: bench_bpe(synth, 1000, exact=False)),
        ("unigram_synth_3em", lambda: bench_unigram(synth, spark)),
    ):
        rows[name] = fn()
        print(name, json.dumps(rows[name]), flush=True)

    b = rows["synth_exact_1k"]
    a = rows["synth_approx_1k"]
    d = rows["sf01_docs_exact_1k"]
    u = rows["unigram_synth_3em"]
    with open(os.path.join(REPO, "BENCH", "tokenizer.md"), "w") as f:
        f.write(f"""# BENCH/tokenizer — tokenizer-training scale evidence

Claim (functions/bpe.py learn_bpe): batched merge learning needs well
under one pair-count job per merge, so a 10k-merge production training
run is hundreds — not tens of thousands — of vocab-sized jobs after the
single corpus scan. Jobs/merge is a property of the batching algebra
over the DISTINCT-WORD table (the corpus is scanned exactly once, into
that table), so it carries to 100 TB unchanged; wall time here is
local[32] at toy scale and bounded by driver round-trips, not data.

## 1k-merge BPE, synthetic large-vocab corpus ({n_synth_words:,} distinct words, 200k docs, deterministic seed 7)

| mode | merges learned | count jobs | jobs/merge | wall s | merges/s |
|---|---|---|---|---|---|
| exact (provably sequential-identical) | {b["learned_merges"]} | {b["count_jobs"]} | {b["jobs_per_merge"]} | {b["wall_sec"]} | {b["merges_per_sec"]} |
| approximate (disjoint-batch, scale path) | {a["learned_merges"]} | {a["count_jobs"]} | {a["jobs_per_merge"]} | {a["wall_sec"]} | {a["merges_per_sec"]} |

Criterion (VERDICT r4 #5): jobs/merge < 0.7 at 1k merges —
exact mode: **{b["jobs_per_merge"]}** ({"MET" if b["jobs_per_merge"] < 0.7 else "NOT met"});
approximate mode: **{a["jobs_per_merge"]}**.

## 1k-merge request on the sf0.1 documents corpus (honest exhaustion)

The driver corpus draws from ~31 distinct words, so every learnable
merge is exhausted long before 1k — reported at the natural stop:

| merges learned | count jobs | jobs/merge | wall s |
|---|---|---|---|
| {d["learned_merges"]} | {d["count_jobs"]} | {d["jobs_per_merge"]} | {d["wall_sec"]} |

(learned == all merges that exist: training stops when no adjacent
pair remains, exactly the sequential algorithm's stopping point.)

## 3-round unigram hard-EM, same synthetic corpus

| EM rounds | final vocab | Spark jobs total | wall s |
|---|---|---|---|
| {u["n_iter"]} | {u["vocab_size_final"]:,} | {u["spark_jobs"]} | {u["wall_sec"]} |

Job anatomy: one corpus scan into the word table (+ its eager
localCheckpoint), one seed-vocabulary job, then ONE Viterbi-count job
per EM round — jobs are constant in corpus size; every iteration
touches only the vocab-sized state (functions/unigram.py docstring).
""")
    print("wrote BENCH/tokenizer.md")
    spark.stop()


if __name__ == "__main__":
    main()
