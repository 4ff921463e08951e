"""Round-10 optimization experiments, driven through tools/ab.py as
``tools.experiments_r10:<name>`` variants. Nothing here is registered;
winners get folded into the real query modules with their oracles intact.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from bridge_analytics_template_spark.catalog import load
from bridge_analytics_template_spark.functions.text import ws_tokens


def _hashed_ngrams_expr(w: int) -> str:
    """SQL expr: DISTINCT hashed word n-grams over a token-hash array `th`
    (xxhash64 per token, position-dependent rotations XOR-combined — the
    _shingle_arrays hashed combination), UNPADDED: docs shorter than the
    gram width yield an EMPTY array, exactly like word_shingles."""

    def rot(e: str, r: int) -> str:
        r = r % 64
        return f"(shiftleft({e}, {r}) | shiftrightunsigned({e}, {(64 - r) % 64}))"

    terms = ["element_at(th, i)"] + [
        rot(f"element_at(th, i + {j})", 13 * j) for j in range(1, w)
    ]
    return (
        f"CASE WHEN size(th) >= {w} THEN "
        f"array_distinct(transform(sequence(1, size(th) - {w - 1}), i -> {' ^ '.join(terms)})) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )


def decon_hashed(spark, sf_dir):
    """llm_decontaminate with HASHED 8-grams on both sides: the join,
    broadcast and distinct all carry 8-byte longs instead of ~50-byte gram
    strings, and no gram string is ever materialized (token hashes are
    rotation-combined in-row). Same result modulo xxhash64-combination
    collisions (the documented llm_ngram_jaccard trade)."""
    d = load(spark, sf_dir, "documents")
    eval_pred = F.col("doc_id") % 50 == 0
    th = (
        d.select("doc_id", ws_tokens("text").alias("toks"))
        .select("doc_id", F.expr("transform(toks, t -> xxhash64(t))").alias("th"))
        .select("doc_id", F.expr(_hashed_ngrams_expr(8)).alias("gr"))
    )
    grams = th.select("doc_id", F.explode_outer("gr").alias("gram"))
    eval_grams = grams.filter(eval_pred).select("gram").distinct()
    hits = (
        grams.filter(~eval_pred)
        .join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        d.filter(~eval_pred)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


def winnow_least(spark, sf_dir):
    """llm_winnowing with the sliding window-min spelled as least() over
    element_at's instead of array_min(slice(...)): same interpreted-lambda
    count, but no per-window array allocation."""
    from bridge_analytics_template_spark.queries.advanced import _WIN_K, _WIN_W
    from bridge_analytics_template_spark.functions.text import word_shingles

    d = load(spark, sf_dir, "documents")
    sh = word_shingles(ws_tokens("text"), _WIN_K)
    hsdf = d.select(
        "doc_id",
        F.transform(sh, lambda s: F.substring(F.md5(s), 1, 16)).alias("hs"),
    )
    hs = F.col("hs")
    m = F.size(hs)
    wins = F.when(
        m >= _WIN_W,
        F.transform(
            F.sequence(F.lit(1), m - (_WIN_W - 1)),
            lambda i: F.least(*[F.element_at(hs, (i + j).cast("int")) for j in range(_WIN_W)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return hsdf.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_distinct(wins)), ",").alias("fp"),
    ).orderBy("doc_id")


def winnow_zip(spark, sf_dir):
    """llm_winnowing with the sliding min as elementwise least of W shifted
    slices (zip_with tree): W-1 interpreted lambdas per WINDOW total work,
    but each lambda body is a single least()."""
    from bridge_analytics_template_spark.queries.advanced import _WIN_K, _WIN_W
    from bridge_analytics_template_spark.functions.text import word_shingles

    d = load(spark, sf_dir, "documents")
    sh = word_shingles(ws_tokens("text"), _WIN_K)
    hsdf = d.select(
        "doc_id",
        F.transform(sh, lambda s: F.substring(F.md5(s), 1, 16)).alias("hs"),
    )
    hs = F.col("hs")
    m = F.size(hs)
    nwin = m - (_WIN_W - 1)
    shifted = [F.slice(hs, j + 1, nwin) for j in range(_WIN_W)]
    acc = shifted[0]
    for s in shifted[1:]:
        acc = F.zip_with(acc, s, lambda a, b: F.least(a, b))
    wins = F.when(m >= _WIN_W, acc).otherwise(F.array().cast("array<string>"))
    return hsdf.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_distinct(wins)), ",").alias("fp"),
    ).orderBy("doc_id")


def diversity_hashed(spark, sf_dir):
    """llm_ngram_diversity over HASHED grams (multiplicity-preserving):
    counts identical modulo 2^-64 collisions, shuffle carries longs."""
    from bridge_analytics_template_spark.functions.text import hashed_word_shingles_expr

    d = load(spark, sf_dir, "documents")
    grams = (
        d.select("lang", ws_tokens("text").alias("toks"))
        .select("lang", F.expr("transform(toks, t -> xxhash64(t))").alias("th"))
        .select(
            "lang",
            F.explode_outer(F.expr(hashed_word_shingles_expr(5, distinct=False))).alias("gram"),
        )
        .filter(F.col("gram").isNotNull())
    )
    n, nd = F.count(F.lit(1)), F.countDistinct("gram")
    return (
        grams.groupBy("lang")
        .agg(
            n.alias("n_grams"),
            nd.alias("n_distinct"),
            ((n - nd).cast("double") / n).alias("dup_fraction"),
        )
        .orderBy("lang")
    )


def novelty_window(spark, sf_dir):
    """llm_ngram_novelty with the firsts attach as a window-min over the
    SAME shingle-keyed exchange instead of aggregate+self-join: the shingle
    lineage runs once and the plan drops to two exchanges."""
    from pyspark.sql import Window
    from bridge_analytics_template_spark.llm.dedup import _shingle_table

    d = load(spark, sf_dir, "documents")
    sh = _shingle_table(d, "text", "doc_id", 5, hashed=True)
    tagged = sh.withColumn("first_doc", F.min("doc").over(Window.partitionBy("shingle")))
    novel = F.count(F.when(F.col("first_doc") == F.col("doc"), 1))
    return (
        tagged.groupBy(F.col("doc").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            novel.alias("n_novel"),
            (novel.cast("double") / F.count(F.lit(1))).alias("novelty"),
        )
        .orderBy("doc_id")
    )


# ---- minhash pipeline decomposition (stage-cost attribution) ----

def mh_arrays(spark, sf_dir):
    from bridge_analytics_template_spark.llm.dedup import _shingle_arrays

    d = load(spark, sf_dir, "documents")
    return _shingle_arrays(d, "text", "doc_id", 5, hashed=True)


def mh_sigs(spark, sf_dir):
    from bridge_analytics_template_spark.llm.dedup import (
        _shingle_arrays,
        minhash_signatures,
    )

    d = load(spark, sf_dir, "documents")
    return minhash_signatures(_shingle_arrays(d, "text", "doc_id", 5, hashed=True), 64)


def mh_cands(spark, sf_dir):
    from bridge_analytics_template_spark.llm.dedup import (
        _shingle_arrays,
        lsh_candidate_pairs,
        minhash_signatures,
        track,
    )

    d = load(spark, sf_dir, "documents")
    arrays = track(_shingle_arrays(d, "text", "doc_id", 5, hashed=True).persist())
    return lsh_candidate_pairs(minhash_signatures(arrays, 64), 16, 64)


def mh_bucket_pairs(spark, sf_dir):
    """lsh_candidate_pairs via groupBy(band, band_hash) + in-row pair
    combinations instead of the banded self-join: one exchange (the
    group-by) + tiny-bucket in-row expansion + pair distinct, vs persist +
    two join-side exchanges + distinct. Buckets are near-singleton except
    for true dups, so the in-row combination lambda touches few elements."""
    from bridge_analytics_template_spark.llm.dedup import (
        _shingle_arrays,
        _banded_signatures,
        minhash_signatures,
        jaccard_for_candidates,
        track,
    )

    d = load(spark, sf_dir, "documents")
    arrays = track(_shingle_arrays(d, "text", "doc_id", 5, hashed=True).persist())
    sigs = minhash_signatures(arrays, 64)
    banded = _banded_signatures(sigs, 16, 64)
    buckets = banded.groupBy("band", "band_hash").agg(
        F.sort_array(F.collect_list("doc")).alias("docs")
    )
    pairs = (
        buckets.filter(F.size("docs") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, size(docs) - 1), i -> "
                    "transform(sequence(i + 1, size(docs)), j -> "
                    "struct(element_at(docs, i) AS doc_a, element_at(docs, j) AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    return jaccard_for_candidates(arrays, pairs, 0.5)


# ---- prefix-filter (PPJoin) pipeline decomposition ----

def _pp_parts(spark, sf_dir):
    from bridge_analytics_template_spark.llm.dedup import _shingle_arrays, track

    d = load(spark, sf_dir, "documents")
    arrays = track(_shingle_arrays(d, "text", "doc_id", 5, hashed=True).persist())
    sh = arrays.select("doc", F.size("sh").alias("n"), F.explode_outer("sh").alias("shingle"))
    hubs = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("freq")).filter("freq >= 2")
    prefixes = (
        sh.join(hubs, "shingle")
        .select(
            "doc", "n", "shingle",
            F.expr("row_number() over (partition by doc order by freq, shingle)").alias("rn2"),
            F.expr("count(1) over (partition by doc)").alias("n2"),
        )
        .filter(F.expr("rn2 <= n2 - ceil(0.5 * n) + 1"))
        .select("doc", "n", "shingle")
    )
    return arrays, sh, hubs, prefixes


def pp_hubs(spark, sf_dir):
    _, _, hubs, _ = _pp_parts(spark, sf_dir)
    return hubs


def pp_prefixes(spark, sf_dir):
    _, _, _, prefixes = _pp_parts(spark, sf_dir)
    return prefixes


def pp_cand(spark, sf_dir):
    from bridge_analytics_template_spark.llm.dedup import track

    _, _, _, prefixes = _pp_parts(spark, sf_dir)
    prefixes = track(prefixes.persist())
    a, b = prefixes.alias("a"), prefixes.alias("b")
    return (
        a.join(
            b,
            F.expr(
                "a.shingle = b.shingle AND a.doc < b.doc "
                "AND b.n >= ceil(0.5 * a.n) AND a.n >= ceil(0.5 * b.n)"
            ),
        )
        .select(F.expr("a.doc").alias("doc_a"), F.expr("b.doc").alias("doc_b"))
        .distinct()
    )


def vocab_old(spark, sf_dir):
    """Pre-r10 train_vocab_encode shape: extra sizing job inside
    assign_contiguous_ids and the distributed-bounds path (sample +
    per-bucket-count jobs) for the bench-scale vocabulary."""
    from bridge_analytics_template_spark.operators import rowids
    from bridge_analytics_template_spark.caching import track

    old = rowids._ONE_TASK_MAX_ROWS
    rowids._ONE_TASK_MAX_ROWS = 0
    try:
        d = load(spark, sf_dir, "documents")
        toks = d.select("doc_id", F.posexplode_outer(ws_tokens("text")).alias("pos", "tok"))
        counts = track(
            toks.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("_negcnt", -F.col("cnt"))
            .persist()
        )
        n_types = counts.count()
        vocab = rowids.assign_contiguous_ids(counts, ["_negcnt", "tok"], id_name="id").select(
            "tok", F.col("id").cast("int").alias("id")
        )
        if n_types <= 2_000_000:
            vocab = F.broadcast(vocab)
        sample = toks.filter(F.col("doc_id") % 20 == 0)
        return (
            sample.join(vocab, "tok")
            .groupBy("doc_id")
            .agg(
                F.to_json(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "id"))), lambda s: s["id"]
                    )
                ).alias("ids")
            )
            .orderBy("doc_id")
        )
    finally:
        rowids._ONE_TASK_MAX_ROWS = old


def _mh_old_full(spark, sf_dir):
    """Pre-r10 minhash pipeline constructors (Column-API spellings),
    verbatim, for build-latency and output-equality A/B."""
    from pyspark.sql import Window
    from bridge_analytics_template_spark.llm.dedup import _shingle_arrays, track

    d = load(spark, sf_dir, "documents")
    arrays = track(_shingle_arrays(d, "text", "doc_id", 5, hashed=True).persist())
    pre = arrays.select(
        "doc",
        F.transform("sh", lambda s: F.xxhash64(s)).alias("h1s"),
        F.transform("sh", lambda s: F.xxhash64(F.lit(1), s)).alias("h2s"),
    )
    sig = (
        "transform(sequence(0, 63), i -> "
        "array_min(zip_with(h1s, h2s, (a, b) -> "
        "a ^ (shiftleft(b, i) | shiftrightunsigned(b, (64 - i) % 64)))))"
    )
    sigs = pre.select("doc", F.expr(sig).alias("sig"))
    rows_per_band = 4
    banded = track(
        sigs.select(
            "doc",
            F.posexplode_outer(
                F.array(
                    *[
                        F.xxhash64(
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        )
                        for b in range(16)
                    ]
                )
            ).alias("band", "band_hash"),
        ).persist()
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    sa = arrays.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = arrays.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("n_inter"),
            F.size("sh_a").alias("n_a"),
            F.size("sh_b").alias("n_b"),
        )
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "n_inter", "n_a", "n_b", "jaccard")
    )


def mh_old(spark, sf_dir):
    return _mh_old_full(spark, sf_dir)


def boot_flags(spark, sf_dir):
    """q_bootstrap_ci with the 32 replica-inclusion predicates projected
    ONCE per row before the aggregate: the current single-aggregate form
    evaluates each replica's md5-hash predicate twice per row (inside s_r
    AND c_r). Same one-pass scale shape, same values."""
    from bridge_analytics_template_spark.functions.numeric import money_units, sql_hash60

    o = load(spark, sf_dir, "orders")
    flagged = o.select(
        money_units("o_totalprice").alias("price_u"),
        *[
            F.expr(
                f"({sql_hash60(f'''CONCAT('{r}|', CAST(o_orderkey AS STRING))''')}) % 2 = 0"
            ).alias(f"i{r}")
            for r in range(32)
        ],
    )
    aggs = [
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price_u").alias("total_u"),
    ]
    for r in range(32):
        aggs.append(
            F.sum(F.when(F.col(f"i{r}"), F.col("price_u")).otherwise(F.lit(0))).alias(f"s{r}")
        )
        aggs.append(F.sum(F.when(F.col(f"i{r}"), F.lit(1)).otherwise(F.lit(0))).alias(f"c{r}"))
    agg = flagged.agg(*aggs)
    means = F.sort_array(F.array(*[F.expr(f"s{r} * 100 div c{r}") for r in range(32)]))
    return agg.select(
        F.col("n_orders").cast("long").alias("n_orders"),
        F.lit(32).cast("long").alias("n_replicas"),
        F.expr("total_u * 100 div n_orders").alias("mean_centicents"),
        means.getItem(1).alias("ci_lo_centicents"),
        means.getItem(30).alias("ci_hi_centicents"),
    )


def boot_conv(spark, sf_dir):
    """q_bootstrap_ci with the Spark-side hash60 spelled as
    CAST(conv(substr(md5(x),1,15),16,10) AS BIGINT) — identical value to
    the 15-term nibble packing (verified 0 mismatches over 200k keys),
    ~1/15th the expression tree per replica."""
    from bridge_analytics_template_spark.functions.numeric import money_units

    o = load(spark, sf_dir, "orders")
    base = o.select("o_orderkey", money_units("o_totalprice").alias("price_u"))
    aggs = [
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price_u").alias("total_u"),
    ]
    for r in range(32):
        h = f"CAST(conv(substr(md5(CONCAT('{r}|', CAST(o_orderkey AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        inc = F.expr(f"({h}) % 2 = 0")
        aggs.append(F.sum(F.when(inc, F.col("price_u")).otherwise(F.lit(0))).alias(f"s{r}"))
        aggs.append(F.sum(F.when(inc, F.lit(1)).otherwise(F.lit(0))).alias(f"c{r}"))
    agg = base.agg(*aggs)
    means = F.sort_array(F.array(*[F.expr(f"s{r} * 100 div c{r}") for r in range(32)]))
    return agg.select(
        F.col("n_orders").cast("long").alias("n_orders"),
        F.lit(32).cast("long").alias("n_replicas"),
        F.expr("total_u * 100 div n_orders").alias("mean_centicents"),
        means.getItem(1).alias("ci_lo_centicents"),
        means.getItem(30).alias("ci_hi_centicents"),
    )


def _nibble60(expr: str) -> str:
    """The pre-r10 15-term big-endian nibble packing (what sql_hash60
    returns) — kept here as the A-side baseline for the conv swap."""
    return " + ".join(
        f"(instr('0123456789abcdef', substr(md5({expr}), {k + 1}, 1)) - 1)"
        f" * CAST({16 ** (14 - k)} AS BIGINT)"
        for k in range(15)
    )


def boot_old(spark, sf_dir):
    """q_bootstrap_ci exactly as shipped before the spark_hash60 swap:
    32 replicas x 15-term nibble hash per row."""
    from bridge_analytics_template_spark.functions.numeric import money_units

    o = load(spark, sf_dir, "orders")
    base = o.select("o_orderkey", money_units("o_totalprice").alias("price_u"))
    aggs = [
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price_u").alias("total_u"),
    ]
    for r in range(32):
        h = _nibble60(f"CONCAT('{r}|', CAST(o_orderkey AS STRING))")
        inc = F.expr(f"({h}) % 2 = 0")
        aggs.append(F.sum(F.when(inc, F.col("price_u")).otherwise(F.lit(0))).alias(f"s{r}"))
        aggs.append(F.sum(F.when(inc, F.lit(1)).otherwise(F.lit(0))).alias(f"c{r}"))
    agg = base.agg(*aggs)
    means = F.sort_array(F.array(*[F.expr(f"s{r} * 100 div c{r}") for r in range(32)]))
    return agg.select(
        F.col("n_orders").cast("long").alias("n_orders"),
        F.lit(32).cast("long").alias("n_replicas"),
        F.expr("total_u * 100 div n_orders").alias("mean_centicents"),
        means.getItem(1).alias("ci_lo_centicents"),
        means.getItem(30).alias("ci_hi_centicents"),
    )


def linscore_old(spark, sf_dir):
    """llm_linear_quality_score with the nibble hash inside the per-token
    lambda (the pre-r10 form)."""
    h = _nibble60("tok")
    w = f"((({h}) % 2048) * 2654435761) % 2003 - 1001"
    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", ws_tokens("text").alias("t"))
    score = F.expr(
        f"aggregate(transform(t, tok -> {w}), cast(0 as bigint), (acc, x) -> acc + x)"
    )
    return (
        t.select(
            "doc_id",
            F.size("t").cast("long").alias("n_tokens"),
            F.coalesce(score, F.lit(0)).alias("score_raw"),
        )
        .withColumn("quality_flag", F.col("score_raw") > 0)
        .orderBy("doc_id")
    )


def simhash_md5_old(spark, sf_dir):
    """llm_dedup_simhash_md5's signature build with the 15-term shiftleft
    token hash (pre-r10) instead of conv(reverse(...))."""
    from bridge_analytics_template_spark.llm.dedup import simhash_near_dups
    from bridge_analytics_template_spark.partitioning import ensure_parallelism

    d = load(spark, sf_dir, "documents")
    tokens = ensure_parallelism(d.select(F.col("doc_id").alias("doc"), "text")).select(
        "doc", F.explode_outer(ws_tokens(F.col("text"))).alias("tok")
    )
    nibble_terms = " + ".join(
        f"shiftleft(CAST(instr('0123456789abcdef', substr(md5(tok), {k + 1}, 1)) - 1"
        f" AS BIGINT), {4 * k})"
        for k in range(15)
    )
    tokens = tokens.withColumn("th", F.expr(f"CAST({nibble_terms} AS BIGINT)"))

    def mask(j: int):
        return F.shiftleft(F.lit(1).cast("long"), j)

    votes = [
        F.sum(F.when(F.col("th").bitwiseAND(mask(j)) != 0, 1).otherwise(-1)).alias(f"b{j}")
        for j in range(60)
    ]
    agg = tokens.groupBy("doc").agg(*votes)
    out = F.lit(0).cast("long")
    for j in range(60):
        out = out + F.when(F.col(f"b{j}") > 0, mask(j)).otherwise(F.lit(0).cast("long"))
    return agg.select("doc", out.alias("simhash"))


def simhash_md5_new(spark, sf_dir):
    """The post-swap library path for the same signature build."""
    from bridge_analytics_template_spark.llm.dedup import simhash

    d = load(spark, sf_dir, "documents")
    return simhash(d, bits=60, hasher="md5")


def locf_old(spark, sf_dir):
    """t_resample_locf as shipped before r10: generate-grid (spans agg +
    sequence explode) + left join back to obs + last_value IGNORE NULLS
    window over the dense grid."""
    from pyspark.sql import Window

    from bridge_analytics_template_spark.functions.numeric import dmoney, dsum

    e = load(spark, sf_dir, "events")
    bucket = (F.unix_timestamp("ts") / F.lit(900)).cast("long") * 900
    obs = e.groupBy(F.col("user_id"), bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"), dsum(dmoney("value"), "bucket_sum")
    )
    grid = (
        obs.groupBy("user_id")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.lit(900))).alias("bucket"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("bucket")
    return (
        grid.join(obs, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            "bucket",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("bucket_sum", ignorenulls=True).over(w).alias("filled_sum"),
        )
        .orderBy("user_id", "bucket")
    )


def ewma_old(spark, sf_dir):
    """ts_ewma_int as shipped before r10: one applyInPandas group PER USER,
    Python list-append loop inside each group."""
    import pandas as pd

    e = load(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        import numpy as np

        x = np.floor(pdf["value"].to_numpy() * 100).astype("int64")
        out = []
        s = 0
        first = True
        for v in x:
            v = int(v)
            s = v if first else v + s // 2
            first = False
            out.append(s)
        pdf = pdf.assign(ewma_half_cents=out)
        return pdf[["user_id", "event_id", "ewma_half_cents"]]

    return (
        e.groupBy("user_id")
        .applyInPandas(ewma, schema="user_id long, event_id long, ewma_half_cents long")
        .orderBy("user_id", "event_id")
    )


def boot_flags_conv(spark, sf_dir):
    """q_bootstrap_ci with the conv hash AND the 32 inclusion flags
    projected once per row before the aggregate (the shipped form
    evaluates each replica's hash twice: inside s_r and inside c_r)."""
    from bridge_analytics_template_spark.functions.numeric import money_units, spark_hash60

    o = load(spark, sf_dir, "orders")
    flagged = o.select(
        money_units("o_totalprice").alias("price_u"),
        *[
            F.expr(
                f"({spark_hash60(f'''CONCAT('{r}|', CAST(o_orderkey AS STRING))''')}) % 2 = 0"
            ).alias(f"i{r}")
            for r in range(32)
        ],
    )
    aggs = [
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price_u").alias("total_u"),
    ]
    for r in range(32):
        aggs.append(
            F.sum(F.when(F.col(f"i{r}"), F.col("price_u")).otherwise(F.lit(0))).alias(f"s{r}")
        )
        aggs.append(F.sum(F.when(F.col(f"i{r}"), F.lit(1)).otherwise(F.lit(0))).alias(f"c{r}"))
    agg = flagged.agg(*aggs)
    means = F.sort_array(F.array(*[F.expr(f"s{r} * 100 div c{r}") for r in range(32)]))
    return agg.select(
        F.col("n_orders").cast("long").alias("n_orders"),
        F.lit(32).cast("long").alias("n_replicas"),
        F.expr("total_u * 100 div n_orders").alias("mean_centicents"),
        means.getItem(1).alias("ci_lo_centicents"),
        means.getItem(30).alias("ci_hi_centicents"),
    )


def bitext_old(spark, sf_dir):
    """llm_bitext_mine as shipped before the r10 sizing-job reduction."""
    from bridge_analytics_template_spark.queries.corpus import _MMR_Q, track
    from pyspark.sql import DataFrame
    import numpy as np
    import pandas as pd

    from bridge_analytics_template_spark.operators.rowids import assign_contiguous_ids

    e = load(spark, sf_dir, "embeddings")
    qv = F.transform("embedding", lambda v: F.floor(v.cast("double") * _MMR_Q).cast("long"))
    nn = F.aggregate(
        F.transform("v", lambda v: v * v), F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    base = e.select("vec_id", qv.alias("v")).select("vec_id", "v", nn.alias("nn"))

    _B = 1024

    def packed(side: DataFrame, blk: str, rows: str) -> tuple[DataFrame, int]:
        n = side.count()
        ranked = assign_contiguous_ids(side, "vec_id", id_name="_rk")
        p = (
            ranked.withColumn(blk, (F.col("_rk") / F.lit(_B)).cast("long"))
            .groupBy(blk)
            .agg(F.collect_list(F.struct("vec_id", "v", "nn")).alias(rows))
        )
        return p, max(1, -(-n // _B))

    src, tgt = base.filter(F.col("vec_id") % 2 == 0), base.filter(F.col("vec_id") % 2 == 1)
    pa, na = packed(src, "blk_a", "rows_a")
    pb, nb = packed(tgt, "blk_b", "rows_b")
    pa, pb = track(pa.persist()), track(pb.persist())
    grid = spark.range(na).select(
        F.col("id").alias("blk_a"),
        F.explode(F.sequence(F.lit(0), F.lit(nb - 1))).alias("blk_b"),
    )
    joined = pa.join(F.broadcast(grid), "blk_a").join(pb, "blk_b")

    def unpack(cell, extra=None):
        ids = np.array([r["vec_id"] for r in cell], dtype=np.int64)
        m = np.array([list(r["v"]) for r in cell], dtype=np.float64)
        rt = np.sqrt(np.array([r["nn"] for r in cell], dtype=np.float64))
        ex = np.array([r[extra] for r in cell], dtype=np.float64) if extra else None
        return ids, m, rt, ex

    def unpack_memo(cache: dict, key, cell, extra=None):
        # a task sees each packed block once per BLOCK PAIR — memoizing the
        # struct-list → numpy conversion by block id cuts the dominant
        # per-pair constant (measured at 100x: unpack, not GEMM, ruled)
        hit = cache.get(key)
        if hit is None:
            if len(cache) >= 512:  # bound worker memory on huge grids
                cache.clear()
            hit = cache[key] = unpack(cell, extra)
        return hit

    def top2(cos: "np.ndarray") -> "np.ndarray":
        # two largest per row, UNORDERED — np.partition is O(cols) per row
        # vs the O(cols log cols) full sort that dominated the first 100x
        # run; order is irrelevant because the downstream combine re-sorts
        # the unioned partials
        if cos.shape[1] < 2:
            return cos
        return -np.partition(-cos, kth=1, axis=1)[:, :2]

    def top2_partials(batches):
        # pass 1: per block pair, each side's two largest cos values —
        # a semilattice partial (global top-2 = top-2 of unioned partials)
        cache: dict = {}
        for pdf in batches:
            for ba, bb, ra, rb in zip(pdf["blk_a"], pdf["blk_b"], pdf["rows_a"], pdf["rows_b"]):
                ia, ma, rta, _ = unpack_memo(cache, ("a", int(ba)), ra)
                ib, mb, rtb, _ = unpack_memo(cache, ("b", int(bb)), rb)
                cos = (ma @ mb.T) / (rta[:, None] * rtb[None, :])
                xa = top2(cos)
                xb = top2(np.ascontiguousarray(cos.T))
                k_a, k_b = xa.shape[1], xb.shape[1]
                yield pd.DataFrame(
                    {
                        "side": ["x"] * (len(ia) * k_a) + ["y"] * (len(ib) * k_b),
                        "id": np.concatenate([ia.repeat(k_a), ib.repeat(k_b)]),
                        "c": np.concatenate([xa.ravel(), xb.ravel()]),
                    }
                )

    partials = joined.mapInPandas(top2_partials, schema="side string, id long, c double")
    # distinct name from the numpy `top2` helper above: the closure only
    # works because the UDF is pickled at the mapInPandas() call site —
    # rebinding the same name to a Column would break under any
    # deferred-serialization path (e.g. Spark Connect)
    top2_col = F.slice(F.sort_array(F.collect_list("c"), asc=False), 1, 2)
    means = partials.groupBy("side", "id").agg(
        ((F.element_at(top2_col, 1) + F.element_at(top2_col, 2)) / 2).alias("r")
    )
    rx = means.filter(F.col("side") == "x").select(F.col("id").alias("x"), F.col("r").alias("rx"))
    ry = means.filter(F.col("side") == "y").select(F.col("id").alias("y"), F.col("r").alias("ry"))

    # pass 2: r(y) rides the packed target rows; per source the block-local
    # argmax of m = 2·cos − r(y) combines via max(struct) — r(x) is constant
    # per source, so csls = m − r(x) attaches after the combine.
    tgt_r = tgt.join(ry, tgt["vec_id"] == ry["y"]).select("vec_id", "v", "nn", "ry")
    pb2 = (
        assign_contiguous_ids(tgt_r, "vec_id", id_name="_rk")
        .withColumn("blk_b", (F.col("_rk") / F.lit(_B)).cast("long"))
        .groupBy("blk_b")
        .agg(F.collect_list(F.struct("vec_id", "v", "nn", "ry")).alias("rows_b"))
    )
    joined2 = pa.join(F.broadcast(grid), "blk_a").join(pb2, "blk_b")

    def best_margin(batches):
        cache: dict = {}
        for pdf in batches:
            for ba, bb, ra, rb in zip(pdf["blk_a"], pdf["blk_b"], pdf["rows_a"], pdf["rows_b"]):
                ia, ma, rta, _ = unpack_memo(cache, ("a", int(ba)), ra)
                ib, mb, rtb, ryv = unpack_memo(cache, ("b", int(bb)), rb, extra="ry")
                cos = (ma @ mb.T) / (rta[:, None] * rtb[None, :])
                m = cos + cos - ryv[None, :]
                mx = m.max(axis=1)
                # tie → lowest target id, same as the oracle's (csls, -y) struct
                best_y = np.where(m == mx[:, None], ib[None, :], np.iinfo(np.int64).max).min(axis=1)
                yield pd.DataFrame({"x": ia, "m": mx, "y": best_y})

    block_best = joined2.mapInPandas(best_margin, schema="x long, m double, y long")
    best = block_best.groupBy("x").agg(
        F.max(F.struct(F.col("m").alias("c"), (-F.col("y")).alias("nid"))).alias("b")
    )
    return (
        best.join(rx, "x")
        .select(
            F.col("x").alias("src_id"),
            (-F.col("b.nid")).alias("tgt_id"),
            (F.col("b.c") - F.col("rx")).alias("csls"),
            ((F.col("b.c") - F.col("rx")) > 0).alias("mined"),
        )
        .orderBy("src_id")
    )



def cascade_old(spark, sf_dir):
    """llm_dedup_cascade as shipped before r10: three sequential count
    jobs (docs, k1, k2) + two chained dedup windows + a persist."""
    from pyspark.sql import Window

    from bridge_analytics_template_spark.functions.text import normalized_fingerprint
    from bridge_analytics_template_spark.llm.dedup import exact_jaccard_pairs
    from bridge_analytics_template_spark.queries.llm import _shingle_arrays, track

    d = load(spark, sf_dir, "documents")
    n_docs = d.count()
    w_exact = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    k1 = d.withColumn("rn", F.row_number().over(w_exact)).filter("rn = 1").drop("rn")
    n_k1 = k1.count()
    w_norm = Window.partitionBy(normalized_fingerprint(F.col("text"))).orderBy("doc_id")
    k2 = track(k1.withColumn("rn", F.row_number().over(w_norm)).filter("rn = 1").drop("rn").persist())
    n_k2 = k2.count()
    arrays = _shingle_arrays(k2, "text", "doc_id", 5, hashed=True)
    near = exact_jaccard_pairs(arrays, min_jaccard=0.5).select("doc_b").distinct()
    n_near = near.count()
    k2.unpersist()
    return spark.createDataFrame(
        [(n_docs, n_docs - n_k1, n_k1 - n_k2, n_near, n_k2 - n_near)],
        "n_docs long, n_exact_removed long, n_norm_removed long, n_neardup_removed long, n_final long",
    )


def ewma_r10_nopersist(spark, sf_dir):
    """ts_ewma_int exactly as committed mid-r10 (vectorized, no persist
    before the output sort)."""

    import pandas as pd

    e = load(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    n_buckets = max(2 * spark.sparkContext.defaultParallelism, 8)

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(pdf) == 0:
            return pd.DataFrame(
                {"user_id": [], "event_id": [], "ewma_half_cents": []}
            ).astype({"user_id": "int64", "event_id": "int64", "ewma_half_cents": "int64"})
        pdf = pdf.sort_values(["user_id", "ts", "event_id"])
        x = np.floor(pdf["value"].to_numpy() * 100).astype("int64")
        uid = pdf["user_id"].to_numpy()
        n = len(uid)
        # per-user step index (uid-sorted, so group starts are boundaries)
        idx = np.arange(n)
        new_grp = np.empty(n, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = uid[1:] != uid[:-1]
        pos = idx - np.maximum.accumulate(np.where(new_grp, idx, 0))
        # step blocks: rows re-sorted by (pos, user); block k holds every
        # user's k-th event, user-sorted, so aligning block k to block k-1
        # is one searchsorted (users at step k are a subset of step k-1)
        order = np.lexsort((uid, pos))
        xs, us, ps = x[order], uid[order], pos[order]
        n_steps = int(ps[-1]) + 1
        starts = np.searchsorted(ps, np.arange(n_steps + 1))
        s_sorted = np.empty(n, dtype="int64")
        prev_users = us[starts[0] : starts[1]]
        prev_s = xs[starts[0] : starts[1]]
        s_sorted[starts[0] : starts[1]] = prev_s
        for k in range(1, n_steps):
            lo, hi = starts[k], starts[k + 1]
            j = np.searchsorted(prev_users, us[lo:hi])
            cur = xs[lo:hi] + np.floor_divide(prev_s[j], 2)
            s_sorted[lo:hi] = cur
            prev_users, prev_s = us[lo:hi], cur
        s = np.empty(n, dtype="int64")
        s[order] = s_sorted
        return pd.DataFrame(
            {
                "user_id": uid,
                "event_id": pdf["event_id"].to_numpy(),
                "ewma_half_cents": s,
            }
        )

    return (
        e.withColumn("_bkt", F.pmod(F.xxhash64("user_id"), F.lit(n_buckets)))
        .groupBy("_bkt")
        .applyInPandas(ewma, schema="user_id long, event_id long, ewma_half_cents long")
        .orderBy("user_id", "event_id")
    )



def locf_r10_nopersist(spark, sf_dir):
    """t_resample_locf exactly as committed mid-r10 (span expansion, no
    persist before the output sort)."""
    from pyspark.sql import Window

    from bridge_analytics_template_spark.functions.numeric import dmoney, dsum

    e = load(spark, sf_dir, "events")
    bucket = (F.unix_timestamp("ts") / F.lit(900)).cast("long") * 900
    obs = e.groupBy(F.col("user_id"), bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"), dsum(dmoney("value"), "bucket_sum")
    )
    w = Window.partitionBy("user_id").orderBy("bucket")
    spans = obs.select(
        "user_id",
        "bucket",
        "n_events",
        # LOCF over observed buckets == last_value IGNORE NULLS over the
        # dense grid: gap rows inherit their span head's filled value.
        F.last("bucket_sum", ignorenulls=True).over(w).alias("filled_sum"),
        F.lead("bucket").over(w).alias("next_bucket"),
    )
    return (
        spans.select(
            "user_id",
            "n_events",
            "filled_sum",
            F.col("bucket").alias("obs_bucket"),
            F.explode(
                F.sequence(
                    "bucket",
                    F.coalesce(F.col("next_bucket") - 900, F.col("bucket")),
                    F.lit(900).cast("long"),
                )
            ).alias("bucket"),
        )
        .select(
            "user_id",
            "bucket",
            F.when(F.col("bucket") == F.col("obs_bucket"), F.col("n_events"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("n_events"),
            "filled_sum",
        )
        .orderBy("user_id", "bucket")
    )



from bridge_analytics_template_spark.queries.advanced import _WIN_K, _WIN_W  # noqa: E402
from bridge_analytics_template_spark.functions.text import word_shingles  # noqa: E402


def winnow_nopersist(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003, the
    MOSS scheme): hash every k-word shingle, slide a w-hash window, keep
    each window's minimum — guarantees any shared run of >= k+w-1 words
    between two documents shares a fingerprint, at ~2/(w+1) selection
    density. All in-row higher-order functions (zero shuffle until the
    final sort); fingerprints emit as canonical sorted text for the
    driver's scalar canon."""
    d = load(spark, sf_dir, "documents")
    # Materialize the token array, then the hash array, as named columns:
    # referencing a raw expression inside a window lambda would re-evaluate
    # the whole shingle+md5 tree once per window — O(n^2) md5 calls per
    # document (measured ~100x on this fixture) — and the element_at-based
    # word_shingles references its token input n+2 times (r10).
    hsdf = d.select("doc_id", ws_tokens("text").alias("toks")).select(
        "doc_id",
        F.transform(
            word_shingles(F.col("toks"), _WIN_K), lambda s: F.substring(F.md5(s), 1, 16)
        ).alias("hs"),
    )
    hs = F.col("hs")
    m = F.size(hs)
    wins = F.when(
        m >= _WIN_W,
        F.transform(
            F.sequence(F.lit(1), m - (_WIN_W - 1)),
            lambda i: F.array_min(F.slice(hs, i, _WIN_W)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return hsdf.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_distinct(wins)), ",").alias("fp"),
    ).orderBy("doc_id")



def simhash_nopersist(spark, sf_dir):
    """llm_dedup_simhash without the r10 persist-before-sort."""
    from bridge_analytics_template_spark.llm.dedup import simhash_near_dups

    return simhash_near_dups(load(spark, sf_dir, "documents"), max_hamming=3).orderBy(
        "doc_a", "doc_b"
    )


def recall_report_old(spark, sf_dir):
    """llm_ann_recall_report as shipped before r10 (brute subtree
    duplicated per method: 4 hits joins + 4 n_brute aggregates)."""
    from bridge_analytics_template_spark.llm.pq import ivfpq_knn, pq_knn
    from bridge_analytics_template_spark.llm.similarity import ivf_knn, knn_bruteforce_np, knn_lsh

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0)
    brute = knn_bruteforce_np(q, e, k=5).select("query_id", "neighbor_id")
    methods = {
        "lsh": knn_lsh(q, e, k=5),
        "ivf": ivf_knn(q, e, k=5),
        "pq": pq_knn(q, e, k=5),
        "ivfpq": ivfpq_knn(q, e, k=5),
    }
    reports = []
    for name, df in methods.items():
        hits = brute.join(df.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        reports.append(
            brute.agg(F.count(F.lit(1)).alias("n_brute"))
            .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hits")))
            .select(
                F.lit(name).alias("method"),
                "n_brute",
                "n_hits",
                (F.col("n_hits").cast("double") / F.col("n_brute")).alias("recall_at_5"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.orderBy("method")
