"""MinHash-LSH near-dup detection via ``pyspark.ml.feature`` — the
MLlib-native alternative to the pure-DataFrame implementation in
llm/dedup.py (SURVEY.md §2.11 L2 lists both builds).

`HashingTF(binary=True)` maps each doc's distinct shingle set into a
sparse indicator vector (feature space 2^18 — collisions only *overstate*
similarity, and at ~200 shingles/doc the collision mass is negligible);
`MinHashLSH.approxSimilarityJoin` then band-buckets signatures and scores
candidates with Jaccard *distance*. Same asymptotics as the hand-rolled
path (candidate generation linear in docs, not pairs); the trade is
convenience vs control — the ml pipeline owns its signature/banding
parameters, so recall is tunable only via ``num_hash_tables``."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import track
from .dedup import _shingle_arrays


def minhash_near_dups_ml(
    df: DataFrame,
    max_jaccard_distance: float = 0.7,
    shingle_words: int = 5,
    num_hash_tables: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_features: int = 1 << 18,
) -> DataFrame:
    """Candidate near-dup pairs ``(doc_a, doc_b, jaccard_distance)`` with
    estimated distance ≤ the threshold, via the MLlib LSH pipeline."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = _shingle_arrays(df, text_col, id_col, shingle_words).filter(F.size("sh") > 0)
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=num_features, binary=True)
    # persist: the self-join below references the vectorized table twice,
    # and alias exprIds defeat ReuseExchange (NOTES.md lesson 3).
    vectorized = track(tf.transform(sh).persist())
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(vectorized)
    joined = model.approxSimilarityJoin(
        vectorized, vectorized, max_jaccard_distance, distCol="jaccard_distance"
    )
    return joined.select(
        F.col("datasetA.doc").alias("doc_a"),
        F.col("datasetB.doc").alias("doc_b"),
        F.col("jaccard_distance"),
    ).filter(F.col("doc_a") < F.col("doc_b"))
