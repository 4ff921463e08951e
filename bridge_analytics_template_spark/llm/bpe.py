"""BPE merge training — the tokenizer-training loop as a Spark job.

Classic byte-pair-encoding training (Sennrich et al. 2016) runs on the
WORD-FREQUENCY table, not the corpus: the corpus collapses to
(word, freq) once — at 100 TB that first aggregate is the only
corpus-sized pass — and every merge iteration then works on |V| rows.

Per iteration (all DataFrame ops, vocabulary-partitioned):
* adjacent-pair counts: ``arrays_zip(syms[:-1], syms[1:])`` exploded,
  freq-weighted sum per pair — one shuffle over |V|;
* best pair: deterministic ``orderBy(count DESC, pair ASC) LIMIT 1``
  (TakeOrdered, no global sort);
* merge application: a greedy leftmost non-overlapping fold over each
  word's symbol array (``F.aggregate`` with a (arr, prev) struct
  accumulator — interpreted, but the input is vocabulary-sized, not
  corpus-sized);
* lineage is cut with ``localCheckpoint`` every few merges, same recipe
  as operators/pagerank.py.

Exact agreement with a pure-Python reference trainer is pinned in
tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus-sized pass: whitespace words with counts."""
    return (
        docs.select(
            F.explode_outer(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias(
                "word"
            )
        )
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _apply_merge(syms, a: str, b: str):
    """Greedy leftmost non-overlapping replacement of (a, b) -> a+b."""
    merged = F.lit(a + b)
    step = lambda acc, x: F.when(  # noqa: E731
        acc["prev"].isNotNull() & (acc["prev"] == F.lit(a)) & (x == F.lit(b)),
        F.struct(
            F.concat(acc["arr"], F.array(merged)).alias("arr"),
            F.lit(None).cast("string").alias("prev"),
        ),
    ).otherwise(
        F.struct(
            F.when(acc["prev"].isNotNull(), F.concat(acc["arr"], F.array(acc["prev"])))
            .otherwise(acc["arr"])
            .alias("arr"),
            x.alias("prev"),
        )
    )
    zero = F.struct(
        F.array().cast("array<string>").alias("arr"),
        F.lit(None).cast("string").alias("prev"),
    )
    finish = lambda acc: F.when(  # noqa: E731
        acc["prev"].isNotNull(), F.concat(acc["arr"], F.array(acc["prev"]))
    ).otherwise(acc["arr"])
    return F.aggregate(syms, zero, step, finish)


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    checkpoint_every: int = 4,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` merges; returns [(sym_a, sym_b, pair_count)] in
    merge order."""
    vocab = word_freq_table(docs, text_col).select(
        "freq", F.split("word", "").alias("syms")
    )
    vocab = vocab.localCheckpoint(eager=True)

    merges: list[tuple[str, str, int]] = []
    for i in range(n_merges):
        n = F.size("syms")
        pairs = vocab.where(n >= 2).select(
            "freq",
            F.explode(
                F.arrays_zip(
                    F.slice("syms", 1, n - 1).alias("a"),
                    F.slice("syms", 2, n - 1).alias("b"),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], best[0]["cnt"]
        merges.append((a, b, cnt))
        vocab = vocab.select("freq", _apply_merge(F.col("syms"), a, b).alias("syms"))
        if (i + 1) % checkpoint_every == 0 or i == n_merges - 1:
            vocab = vocab.localCheckpoint(eager=True)
    return merges
