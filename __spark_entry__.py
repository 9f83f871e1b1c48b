"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship: builds an interleaved spans `documents`
table from the sf0.001 flat documents table, runs the validation
engine (row rules + salted uniqueness + referential), returns the
per-partition verdicts DataFrame.

`queries()` / `oracle_sql()` — one entry per implemented operator
from SURVEY.md §2, cross-checked by the driver against DuckDB at
sf0.01. All computed columns are identically aliased on both sides;
doubles are rounded to fixed decimals on both sides so value-hashes
match despite engine-internal float paths.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def _spans_from_flat(docs: DataFrame) -> DataFrame:
    """Deterministically lift the flat documents table into the
    interleaved span model: text split into 5-word text spans, plus a
    media span derived from doc_id every 3rd doc. The word array is
    let-bound (textops._let) so the split runs once per row, not per
    chunk."""
    # everything the lambda needs is bound through the let struct —
    # outer F.col refs inside a HOF lambda resolve against the SELECT's
    # lateral aliases (here the formatted doc_id string), not the child
    bound = F.struct(
        F.split(F.col("text"), r"\s+").alias("w"),
        (F.pmod(F.col("doc_id"), F.lit(3)) == 0).alias("has_media"),
        F.format_string(
            "media-%08d", F.pmod(F.col("doc_id"), F.lit(1000))
        ).alias("mref"),
    )

    def spans_of(b):
        words = b["w"]
        n = F.size(words)
        k = F.lit(5)
        n_chunks = F.greatest((n + k - 1).cast("int") / k, F.lit(1)).cast("int")
        text_spans = F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                F.lit("text").alias("kind"),
                F.array_join(F.slice(words, i * 5 + 1, 5), " ").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                (i * 8).cast("int").alias("offset"),
            ),
        )
        media_span = F.struct(
            F.lit("image").alias("kind"),
            F.lit(None).cast("string").alias("text"),
            b["mref"].alias("media_ref"),
            (n_chunks * 8).cast("int").alias("offset"),
        )
        return F.when(
            b["has_media"], F.concat(text_spans, F.array(media_span))
        ).otherwise(text_spans)

    from automatic_data_validator_spark.textops import _let

    spans = _let(bound, spans_of)
    return docs.select(
        F.format_string("doc-%012d", F.col("doc_id")).alias("doc_id"),
        spans.alias("spans"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full validation run on an interleaved spans table."""
    from automatic_data_validator_spark.synth import make_media_catalog
    from automatic_data_validator_spark.validate import run_validation

    docs = _spans_from_flat(_t(spark, "/root/testdata/sf0.001", "documents"))
    catalog = make_media_catalog(spark, 1000, seed=42)
    res = run_validation(spark, docs, catalog=catalog, with_profile=False)
    return res.verdicts


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def q01_pricing_summary(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q02_null_counts(spark, sf):
    o = _t(spark, sf, "orders")
    return o.agg(
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
            for c in o.columns
        ]
    )


def q03_distinct_counts(spark, sf):
    li = _t(spark, sf, "lineitem")
    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_returnflag", "l_linestatus"]
    return li.agg(*[F.count_distinct(F.col(c)).alias(f"nd_{c}") for c in cols])


def q04_numeric_stats(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


def q05_quantiles(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", F.lit(0.25)), 4).alias("q1"),
            F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("median"),
            F.round(F.percentile("l_quantity", F.lit(0.75)), 4).alias("q3"),
        )
    )


def q06_outliers(spark, sf):
    """IQR outliers (lineitem prices) and z-score outliers (event
    values) in one long-format result — merged from the former
    q06/q07 so both predicates sit inside the driver's 50-query
    adjudication window (round-4 VERDICT: the CORRECTNESS file caps
    at 50 entries). src='iqr' rows carry (l_orderkey, l_linenumber),
    src='z' rows carry (event_id, 0); val is the outlying value.
    Reference analog: data_analyzer.py IQR/z-score outlier checks."""
    li = _t(spark, sf, "lineitem")
    b = li.agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 2).alias("q1"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 2).alias("q3"),
    )
    iqr = (
        li.crossJoin(F.broadcast(b))
        .filter(
            (F.col("l_extendedprice") < F.col("q1") - 1.5 * (F.col("q3") - F.col("q1")))
            | (F.col("l_extendedprice") > F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")))
        )
        .select(
            F.lit("iqr").alias("src"),
            F.col("l_orderkey").cast("long").alias("id1"),
            F.col("l_linenumber").cast("long").alias("id2"),
            F.round("l_extendedprice", 2).alias("val"),
        )
    )
    ev = _t(spark, sf, "events")
    st = ev.agg(
        F.round(F.avg("value"), 4).alias("mu"),
        F.round(F.stddev_samp("value"), 4).alias("sd"),
    )
    z = (
        ev.crossJoin(F.broadcast(st))
        .filter(F.abs((F.col("value") - F.col("mu")) / F.col("sd")) > 3.0)
        .select(
            F.lit("z").alias("src"),
            F.col("event_id").cast("long").alias("id1"),
            F.lit(0).cast("long").alias("id2"),
            F.round("value", 2).alias("val"),
        )
    )
    return iqr.unionByName(z)


def q08_skew_kurt(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.agg(
        F.round(F.skewness("l_extendedprice"), 3).alias("skew_pop"),
        F.round(F.kurtosis("l_extendedprice"), 3).alias("kurt_pop"),
    )


def q09_categorical_detection(spark, sf):
    li = _t(spark, sf, "lineitem")
    cols = ["l_returnflag", "l_linestatus", "l_partkey"]
    agg = li.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.count_distinct(F.col(c)).alias(f"d_{c}") for c in cols],
    )
    stack = ", ".join(f"'{c}', d_{c}" for c in cols)
    return agg.select(
        F.expr(f"stack({len(cols)}, {stack}) as (col_name, distinct_count)"),
        F.col("n").alias("total_count"),
    ).select(
        "col_name",
        "distinct_count",
        "total_count",
        F.round(F.col("distinct_count") / F.col("total_count"), 6).alias("distinct_ratio"),
        (F.col("distinct_count") / F.col("total_count") < 0.05).alias("is_categorical"),
    )


def q10_topk_brand(spark, sf):
    p = _t(spark, sf, "part")
    # orderBy+limit FIRST (TakeOrderedAndProject: partial top-K per
    # partition, no single-task global sort); the rank window then
    # runs over 5 rows
    w = Window.orderBy(F.desc("cnt"), F.asc("p_brand"))
    return (
        p.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("p_brand"))
        .limit(5)
        .withColumn("rnk", F.row_number().over(w))
    )


def q11_mode_mktsegment(spark, sf):
    c = _t(spark, sf, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("c_mktsegment"))
        .limit(1)
    )


def q12_corr_matrix(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.corr("l_extendedprice", "l_discount"), 4).alias("corr_price_disc"),
        F.round(F.corr("l_quantity", "l_discount"), 4).alias("corr_qty_disc"),
    )


def q13_rare_values(spark, sf):
    ev = _t(spark, sf, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.agg(
        F.sum((F.col("cnt") == 1).cast("long")).alias("n_rare_users"),
        F.count(F.lit(1)).alias("n_users"),
    )


def q14_text_length_stats(spark, sf):
    d = _t(spark, sf, "documents")
    ln = F.length("text")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(ln).alias("len_min"),
        F.max(ln).alias("len_max"),
        F.round(F.avg(ln), 4).alias("len_avg"),
        F.sum((F.col("text") == "").cast("long")).alias("n_empty"),
    )


def q15_char_classes(spark, sf):
    d = _t(spark, sf, "documents")
    return d.agg(
        F.sum(F.col("text").rlike(r"\d").cast("long")).alias("n_has_digit"),
        F.sum(F.col("text").rlike(r"[^A-Za-z0-9\s]").cast("long")).alias("n_has_special"),
        F.sum(((F.upper("text") == F.col("text")) & F.col("text").rlike("[A-Za-z]")).cast("long")).alias("n_all_upper"),
    )


def q16_numeric_convertibility(spark, sf):
    ev = _t(spark, sf, "events")
    k = F.get_json_object("props", "$.k")
    return ev.agg(
        F.sum(k.try_cast("double").isNotNull().cast("long")).alias("n_convertible"),
        F.count(F.lit(1)).alias("n_total"),
        F.round(
            F.sum(k.try_cast("double").isNotNull().cast("long")) / F.count(F.lit(1)), 6
        ).alias("convert_ratio"),
    )


def q17_year_rollup(spark, sf):
    o = _t(spark, sf, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


def q18_string_funcs(spark, sf):
    c = _t(spark, sf, "customer")
    return c.filter(F.col("c_custkey") <= 20).select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_u"),
        F.substring("c_name", 1, 9).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
    )


def q19_regex_match_counts(spark, sf):
    d = _t(spark, sf, "documents")
    return d.agg(
        F.sum(F.col("text").rlike("https?://").cast("long")).alias("n_url"),
        F.sum(F.col("text").rlike(r"\bspark\b").cast("long")).alias("n_spark"),
        F.sum(F.col("text").rlike("[0-9]{3,}").cast("long")).alias("n_big_numbers"),
    )


def q20_window_topk_orders(spark, sf):
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "o_orderpriority", "rnk", "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
        )
    )


def q21_anti_join_customers(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    no_orders = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    return no_orders.agg(
        F.count(F.lit(1)).alias("n_no_orders"),
        F.min("c_custkey").alias("min_ck"),
        F.max("c_custkey").alias("max_ck"),
    )


def q22_semi_join_parts(spark, sf):
    p = _t(spark, sf, "part")
    li = _t(spark, sf, "lineitem")
    used = p.join(li, p.p_partkey == li.l_partkey, "left_semi")
    return used.filter(F.col("p_size") > 45).agg(
        F.count(F.lit(1)).alias("n_big_used_parts")
    )


def q23_unique_key_violations(spark, sf):
    from automatic_data_validator_spark.dedup import duplicate_key_counts

    ev = _t(spark, sf, "events")
    dups = duplicate_key_counts(ev, "user_id")
    # orderBy+limit first (TakeOrderedAndProject), rank over 10 rows
    w = Window.orderBy(F.desc("dup_count"), F.asc("user_id"))
    return (
        dups.orderBy(F.desc("dup_count"), F.asc("user_id"))
        .limit(10)
        .withColumn("rnk", F.row_number().over(w))
        .select("user_id", F.col("dup_count").alias("cnt"), "rnk")
    )


def q24_exact_dup_texts(spark, sf):
    d = _t(spark, sf, "documents")
    groups = (
        d.groupBy(F.md5(F.lower("text")).alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    return groups.agg(F.count(F.lit(1)).alias("n_dup_groups"))


def q25_fingerprint_distinct(spark, sf):
    d = _t(spark, sf, "documents")
    norm = F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
    return d.groupBy("source").agg(
        F.count_distinct(norm).alias("n_distinct_norm"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def q26_token_counts(spark, sf):
    from automatic_data_validator_spark.textops import token_count_bpe, word_count

    d = _t(spark, sf, "documents")
    return d.groupBy("source").agg(
        F.sum(word_count("text").cast("long")).alias("ws_tokens"),
        F.sum(token_count_bpe("text").cast("long")).alias("bpe_tokens"),
    )


def q27_lang_share(spark, sf):
    from automatic_data_validator_spark.textops import english_stopword_ratio

    d = _t(spark, sf, "documents")
    return d.groupBy("source").agg(
        F.sum((english_stopword_ratio("text") > 0.1).cast("long")).alias("n_english"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def q28_quality_flags(spark, sf):
    d = _t(spark, sf, "documents")
    words = F.when(F.trim("text") == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim("text"), r"\s+"))
    )
    digit_ratio = F.length(F.regexp_replace("text", "[^0-9]", "")).cast("double") / F.greatest(
        F.length("text"), F.lit(1)
    )
    return d.select(
        "doc_id",
        words.alias("q_words"),
        (words < 5).alias("flag_short"),
        (digit_ratio > 0.3).alias("flag_digit_heavy"),
    )


_PSI_EDGES = [0.0, 50.0, 100.0, 150.0, 200.0, 250.0]


def _bucket_expr(col):
    b = F.lit(0)
    for i, e in enumerate(_PSI_EDGES):
        b = F.when(F.col(col) >= e, F.lit(i + 1)).otherwise(b)
    return b


def q29_psi_drift(spark, sf):
    ev = _t(spark, sf, "events")
    withb = ev.select(
        _bucket_expr("value").alias("bucket"),
        (F.col("event_type") == "error").alias("is_err"),
    )
    counts = withb.groupBy("bucket").agg(
        F.sum(F.col("is_err").cast("long")).alias("n_err"),
        F.count(F.lit(1)).alias("n_all"),
    )
    tot = counts.agg(
        F.sum("n_err").alias("t_err"), F.sum("n_all").alias("t_all")
    )
    psi = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            (
                (F.col("n_err") / F.col("t_err") - F.col("n_all") / F.col("t_all"))
                * F.log(
                    F.greatest(F.col("n_err") / F.col("t_err"), F.lit(1e-6))
                    / F.greatest(F.col("n_all") / F.col("t_all"), F.lit(1e-6))
                )
            ).alias("term")
        )
        .agg(F.round(F.sum("term"), 4).alias("psi"))
    )
    return psi


_KS_GRID = [25.0, 50.0, 75.0, 100.0, 125.0, 150.0, 175.0, 200.0, 225.0]


def q30_ks_drift(spark, sf):
    ev = _t(spark, sf, "events")
    aggs = []
    for g in _KS_GRID:
        aggs.append(
            F.round(
                F.abs(
                    F.avg(
                        F.when(F.col("event_type") == "error", (F.col("value") <= g).cast("double"))
                    )
                    - F.avg(
                        F.when(F.col("event_type") == "click", (F.col("value") <= g).cast("double"))
                    )
                ),
                6,
            ).alias(f"d_{int(g)}")
        )
    diffs = ev.agg(*aggs)
    return diffs.select(F.round(F.greatest(*[F.col(c) for c in diffs.columns]), 4).alias("ks"))


def q31_ann_cosine_topk(spark, sf):
    # r6: brute_force_topk -> brute_force_topk_arrow (one BLAS matmul
    # per Arrow batch instead of an interpreted HOF dot per pair;
    # guide §4.2). The query computes the SAME rows: the output keeps
    # only (query_id, rnk, neighbor_id) — rank order is pinned by the
    # (sim desc, id asc) total order, and the two scorers' ranks are
    # identical at every SF (verified sf0.001/0.01/0.1/1.0; the arrow
    # path's rank identity vs the expression path is also pytest-pinned
    # in test_dedup_similarity). Measured 0.74s -> 0.60s at sf1.0.
    from automatic_data_validator_spark.similarity import brute_force_topk_arrow

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = brute_force_topk_arrow(emb, q, k=5)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return topk.withColumn("rnk", F.row_number().over(w)).select(
        "query_id", "rnk", "neighbor_id"
    )


def q32_minhash_pairs(spark, sf):
    """No SQL oracle (xxhash64-based) — driver records rows-only."""
    from automatic_data_validator_spark.dedup import minhash_lsh_duplicates

    d = _t(spark, sf, "documents")
    return minhash_lsh_duplicates(d, "doc_id", "text", num_hashes=16, bands=8)


def q33_span_validation(spark, sf):
    """Span rules (W2 order invariant + shape + not-null) through the
    engine's evaluate_row_rules, oracle-checked: every 7th doc with >=2
    spans gets its first offset bumped past the rest (a deterministic
    span_order violation the oracle can count arithmetically); verdicts
    are aggregated per rule so the result is partitioning-independent."""
    from automatic_data_validator_spark import rules as R

    docs = _spans_from_flat(_t(spark, sf, "documents"))
    num = F.substring("doc_id", 5, 12).cast("long")
    s = F.col("spans")
    bumped_first = F.struct(
        s[0]["kind"].alias("kind"),
        s[0]["text"].alias("text"),
        s[0]["media_ref"].alias("media_ref"),
        F.lit(1000000).cast("int").alias("offset"),
    )
    perturbed = F.when(
        (num % 7 == 0) & (F.size(s) >= 2),
        F.concat(F.array(bumped_first), F.slice(s, 2, F.size(s) - 1)),
    ).otherwise(s)
    v, _x = R.evaluate_row_rules(
        docs.select("doc_id", perturbed.alias("spans")),
        [
            R.Rule("span_order", "span_order", column="spans"),
            R.Rule("span_shape", "span_shape", column="spans"),
            R.Rule("not_null_doc_id", "not_null", column="doc_id"),
        ],
    )
    return v.groupBy("rule_id").agg(
        F.sum("row_count").alias("row_count"),
        F.sum("violation_count").alias("violation_count"),
        (F.sum("violation_count") == 0).alias("ok"),
    )


def q34_embedding_norm_stats(spark, sf):
    emb = _t(spark, sf, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(norm), 4).alias("avg_norm"),
        F.round(F.min(norm), 4).alias("min_norm"),
        F.round(F.max(norm), 4).alias("max_norm"),
    )


def q35_categorical_inconsistency(spark, sf):
    from automatic_data_validator_spark.profile import categorical_inconsistency

    d = _t(spark, sf, "documents")
    variants = d.select(
        F.when(F.pmod("doc_id", F.lit(3)) == 0, F.upper("source"))
        .otherwise(F.col("source"))
        .alias("city")
    )
    return categorical_inconsistency(variants, "city")


def q36_jarque_bera(spark, sf):
    li = _t(spark, sf, "lineitem")
    agg = li.agg(
        F.count("l_quantity").alias("n"),
        F.skewness("l_quantity").alias("s"),
        F.kurtosis("l_quantity").alias("k"),
    )
    return agg.select(
        F.round(F.col("n") / 6.0 * (F.col("s") * F.col("s") + F.col("k") * F.col("k") / 4.0), 0)
        .alias("jb"),
    ).select("jb", (F.col("jb") > 5.99).alias("reject_normality"))


def q37_cube_rollup(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def q38_chunk_counts(spark, sf):
    from automatic_data_validator_spark.textops import chunk_text

    d = _t(spark, sf, "documents")
    words = F.size(F.split(F.trim("text"), r"\s+"))
    return d.select(
        "doc_id",
        words.alias("n_words"),
        F.size(chunk_text("text", chunk_words=64, overlap_words=8)).alias("n_chunks"),
    )


def q39_stopword_removal(spark, sf):
    from automatic_data_validator_spark.textops import remove_stopwords

    d = _t(spark, sf, "documents")
    return d.groupBy("lang").agg(
        F.sum(F.length("text").cast("long")).alias("len_raw"),
        F.sum(F.length(remove_stopwords("text")).cast("long")).alias("len_nostop"),
    )


def q40_pivot(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_o"),
            F.col("F").alias("qty_f"),
        )
    )


def q41_setops(spark, sf):
    o = _t(spark, sf, "orders")
    y94 = o.filter(F.year("o_orderdate") == 1994).select("o_custkey")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    both = y94.intersect(y95)
    only94 = y94.distinct().exceptAll(y95.distinct())
    return both.agg(F.count(F.lit(1)).alias("n_both")).crossJoin(
        only94.agg(F.count(F.lit(1)).alias("n_only_1994"))
    )


def q42_date_arith(spark, sf):
    o = _t(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_day"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_day"),
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("span_days"),
        F.count(F.lit(1)).alias("n"),
    )


def _quality_projection(spark, sf):
    """Shared 4-column projection for q43/q44: one numeric outlier
    source, one nullable numeric, one mixed-type string, one pure-text
    string — every quality-score deduction term is exercised."""
    o = _t(spark, sf, "orders")
    return o.select(
        F.col("o_totalprice"),
        F.when(F.pmod("o_orderkey", F.lit(50)) == 0, F.lit(None).cast("long"))
        .otherwise(F.col("o_custkey"))
        .alias("custkey_n"),
        F.when(F.pmod("o_orderkey", F.lit(10)) == 0, F.col("o_custkey").cast("string"))
        .otherwise(F.col("o_orderstatus"))
        .alias("status_mixed"),
        F.col("o_orderpriority"),
    )


def _round_half_up(x: float, d: int) -> float:
    """floor(x*10^d + 0.5)/10^d — identical IEEE ops to the oracle SQL's
    rounding, avoiding Python round()'s banker's ties vs SQL half-up."""
    import math

    s = 10.0 ** d
    return math.floor(x * s + 0.5) / s


def q43_quality_score(spark, sf):
    """A23: the reference quality-score formula (data_analyzer.py:457-477)
    end to end — missing/dup/outlier-row/consistency terms — oracle-checked
    in full SQL on both sides."""
    from automatic_data_validator_spark.profile import quality_report

    rep = quality_report(_quality_projection(spark, sf), exact=True)
    row = (
        _round_half_up(rep["missing_values"]["missing_percentage"], 4),
        _round_half_up(rep["duplicates"]["duplicate_percentage"], 4),
        _round_half_up(rep["outliers"]["outlier_percentage"], 4),
        len(rep["data_consistency"]["issues"]),
        _round_half_up(rep["quality_score"], 2),
    )
    return spark.createDataFrame(
        [row],
        "missing_pct double, dup_pct double, outlier_pct double, "
        "n_issues int, quality_score double",
    )


def q44_mixed_type(spark, sf):
    """A18: 3-way mixed-type classification per string column
    (data_analyzer.py:432-449) from the fused profile."""
    from automatic_data_validator_spark.profile import mixed_type_report

    rows = [
        (r["column"], r["n_numeric_string"], r["n_text"], r["is_mixed"])
        for r in mixed_type_report(_quality_projection(spark, sf))
    ]
    return spark.createDataFrame(
        rows,
        "column_name string, n_numeric_string long, n_text long, is_mixed boolean",
    )


def q45_cosine_neardup(spark, sf):
    """Embedding-cosine near-dup: exact all-pairs scorer (the post-LSH
    verification primitive), top-20 most-similar pairs with a
    deterministic (sim desc, id_a, id_b) tie-break."""
    from automatic_data_validator_spark.similarity import cosine_neardup_pairs

    emb = _t(spark, sf, "embeddings")
    pairs = cosine_neardup_pairs(emb, threshold=-1.0)
    # orderBy+limit first: TakeOrderedAndProject keeps 20 rows per
    # partition instead of sorting every pair through one window task
    w = Window.orderBy(F.desc("cosine_sim"), F.asc("id_a"), F.asc("id_b"))
    return (
        pairs.orderBy(F.desc("cosine_sim"), F.asc("id_a"), F.asc("id_b"))
        .limit(20)
        .withColumn("rnk", F.row_number().over(w))
        .select("rnk", "id_a", "id_b", F.round("cosine_sim", 4).alias("cosine_sim"))
    )


def q46_correction_summary(spark, sf):
    """Before/after correction summary (round-3 directive #4, reference
    pipeline_generator.py:233-309): full-row dedup + fixed impute/cap
    plan over the 4-column quality projection, then
    correct.summary_report — shape delta, per-column null deltas,
    duplicate-row delta, and the quality terms on both sides, every
    numeric rounded half-up to 4dp for cross-engine hashing."""
    from automatic_data_validator_spark.correct import (
        CorrectionPlan,
        apply_plan,
        summary_report,
    )

    base = _quality_projection(spark, sf)
    plan = CorrectionPlan(
        dedup_keys=None,  # full-row dedup
        imputations={"custkey_n": 12345.0},
        caps={"o_totalprice": (1000.0, 300000.0)},
    )
    cleaned = apply_plan(base, plan)
    rep = summary_report(base, cleaned, include_quality=True, exact=True)
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return rep.select(
        "metric",
        "column",
        r4(F.col("before")).alias("before"),
        r4(F.col("after")).alias("after"),
    )


def q47_partitioned_moments(spark, sf):
    """The fused profile's Pébay moment merge (per-partition partials
    shifted to the global mean, profile.finalize_partial_profile) must
    reproduce the exact global statistics — oracle-checked against
    two-pass central moments in SQL. repartition(16) forces a real
    multi-partition merge."""
    from automatic_data_validator_spark.profile import profile_partitioned

    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    li = _t(spark, sf, "lineitem").repartition(16)
    p = profile_partitioned(li, columns=cols, with_quantiles=False)
    rows = []
    for c in sorted(cols):
        st = p.stats[c]
        rows.append(
            (
                c,
                _round_half_up(st["mean"], 3),
                _round_half_up(st["std"], 3),
                _round_half_up(st["skewness"], 3),
                _round_half_up(st["kurtosis"], 3),
            )
        )
    return spark.createDataFrame(
        rows,
        "column_name string, mean double, std double, "
        "skewness double, kurtosis double",
    )


def q48_connected_components(spark, sf):
    """Distributed min-label-propagation connected components
    (dedup.connected_dup_groups — the pair->drop-list step of the
    dedup pipeline) against a recursive-CTE oracle: a deterministic
    chain graph built from the events table's user ids (edges u->u+2
    except where u%7==0 breaks the chain)."""
    from automatic_data_validator_spark.dedup import connected_dup_groups

    ev = _t(spark, sf, "events")
    nodes = ev.select("user_id").distinct().filter(F.col("user_id") < 300)
    pairs = (
        nodes.alias("a")
        .join(
            nodes.alias("b"),
            (F.col("b.user_id") == F.col("a.user_id") + 2)
            & (F.col("a.user_id") % 7 != 0),
        )
        .select(
            F.col("a.user_id").alias("id_a"), F.col("b.user_id").alias("id_b")
        )
    )
    comps = connected_dup_groups(pairs)
    out = comps.select(
        F.col("doc_id").cast("long").alias("node"),
        F.col("component").cast("long").alias("component"),
    ).orderBy("node")
    # localCheckpoint the TINY result while the iteration caches are
    # still warm, then release them: the returned frame holds the rows
    # as executor blocks (no driver round-trip — round-3 hygiene #3)
    # and its lineage no longer references the per-round label plans,
    # which reference the previous round TWICE each and so would
    # recompute exponentially uncached (round-4 review finding)
    out = out.localCheckpoint(eager=True)
    comps.unpersist()
    return out


# dedup-pipeline contract (q49): the subset bound keeps the
# brute-force DuckDB oracle tractable at larger scale factors (all
# 500 docs at sf0.01; 1000 of 5000 at sf0.1 — an all-pairs oracle over
# the full sf0.1 table measured >400s)
_DEDUP_SUBSET = 1000
_DEDUP_TAU = 0.5


def _dedup_verified_pairs(spark, sf):
    """Shared chain for q49: real LSH candidates (16 bands x 1 hash
    row — miss probability for a pair at jaccard j is (1-j)^16, ~1e-16
    at the j>=0.9 pairs this corpus holds, so candidates ∩ {j>=tau}
    equals the oracle's brute-force {j>=tau} set) -> exact n-gram
    Jaccard verify -> threshold filter."""
    from automatic_data_validator_spark.dedup import (
        minhash_lsh_duplicates,
        ngram_jaccard,
    )

    d = (
        _t(spark, sf, "documents")
        .filter(F.col("doc_id") < _DEDUP_SUBSET)
        .select("doc_id", "text")
    )
    cand = minhash_lsh_duplicates(d, "doc_id", "text", num_hashes=16, bands=16)
    ver = ngram_jaccard(d, "doc_id", "text", cand).filter(
        F.col("jaccard") >= _DEDUP_TAU
    )
    return d, ver


def q49_dedup_pipeline(spark, sf):
    """End-to-end dedup pipeline (round-3 VERDICT directive #1; per-pair
    jaccard folded in per round-4 directive #1 so the verify layer ALSO
    sits inside the driver's 50-query adjudication window): minhash LSH
    candidates -> ngram_jaccard verify -> jaccard >= tau -> connected
    components. One row per verified pair, carrying its exact n-gram
    jaccard AND both endpoints' component labels. The DuckDB oracle
    recomputes the verified layer by BRUTE FORCE (all pairs in the
    subset at jaccard >= tau, list_intersect/list_distinct over 3-word
    shingle sets) and the components by recursive CTE — so signatures,
    banding, per-pair verification values, and the component labeling
    (from which the drop list ``doc_id != component`` is a pure filter)
    are all independently checked; any behavior change in any stage
    flips rows here. Reference analog: the zero-dups-after-clean
    invariant of pipeline_generator.py:773-780."""
    from automatic_data_validator_spark.dedup import connected_dup_groups

    _d, ver = _dedup_verified_pairs(spark, sf)
    ver = ver.select("id_a", "id_b", "jaccard").persist()
    comps = connected_dup_groups(ver.select("id_a", "id_b"))
    out = (
        ver.join(
            comps.select(
                F.col("doc_id").alias("id_a"),
                F.col("component").cast("long").alias("comp_a"),
            ),
            "id_a",
        )
        .join(
            comps.select(
                F.col("doc_id").alias("id_b"),
                F.col("component").cast("long").alias("comp_b"),
            ),
            "id_b",
        )
        .select(
            F.col("id_a").cast("long").alias("id_a"),
            F.col("id_b").cast("long").alias("id_b"),
            "jaccard",
            "comp_a",
            "comp_b",
        )
        .orderBy("id_a", "id_b")
    )
    # localCheckpoint the tiny pair list while caches are warm, then
    # release them (q48 pattern + round-4 review: uncached, each CC
    # round's plan references the previous labels twice, so a later
    # driver evaluation would recompute the Python-UDF LSH+jaccard
    # chain ~2^rounds times)
    out = out.localCheckpoint(eager=True)
    comps.unpersist()
    ver.unpersist()
    return out


# deterministic noise for q50: gives the cleaning step real work on the
# synthetic corpus (urls/html/emails to strip, sentences to count)
_Q50_NOISE = ". Visit https://x.co <b>now</b>! mail a@b.com"


def q50_text_changes(spark, sf):
    """Before/after text-change report (reference
    text_processor.py:645-718 via textops.text_change_report): noise is
    injected into every 3rd doc, the engine's clean_text strips it, and
    the report's corpus-level terms (chars/words/sentences/vocabulary,
    removed urls/emails/html tags, derived quality ratios) are each
    recomputed in SQL by the oracle."""
    from automatic_data_validator_spark.textops import clean_text, text_change_report

    d = _t(spark, sf, "documents")
    orig = d.select(
        "doc_id",
        F.when(
            F.pmod("doc_id", F.lit(3)) == 0, F.concat("text", F.lit(_Q50_NOISE))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    cleaned = orig.select("doc_id", clean_text("text").alias("text"))
    return text_change_report(orig, cleaned, "text").orderBy("metric")


def q52_multimodal_pipeline(spark, sf):
    """The whole multimodal chain — decode/feature plumbing
    (multimodal.extract_features, mapInPandas over binary payloads) AND
    the metadata-driven frame-sampling plan (multimodal.frame_sample_plan)
    — in one long-format result (merged from the former q52/q53 per
    round-4 directive #1 so both sit inside the driver's 50-query
    adjudication window). Rows: part in ('b0','b7','nfeat','ok') carry
    the feature-side values per media_ref; part='frame' rows carry one
    frame_ts_ms each.

    Feature side oracle contract: payloads are the docs' UTF-8 bytes
    (pure-ASCII corpus, verified), the deterministic fake decoder's
    feature[i] is byte[i]/255, so round(feature[i]*255) recovers the
    exact byte the oracle reads with ascii(substring(...)). Every 11th
    doc gets a NULL payload to pin the decode-failure path (feature
    NULL -> b0/b7/nfeat NULL, ok=0). The fake decoder ZERO-PADS
    payloads shorter than out_dim*4 bytes (ljust in _decode_image_fake),
    so element_at(..., 8) cannot go out of range under ANSI and a
    padded byte reads 0 = the oracle's ascii('').

    Frame side oracle contract: odd docs carry a deterministic
    duration_ms and expand to range(0, dur, 600); even docs have no
    duration and must emit no rows (oracle = DuckDB range() unnest)."""
    from automatic_data_validator_spark.multimodal import (
        extract_features,
        frame_sample_plan,
    )

    d = _t(spark, sf, "documents")
    img = d.select(
        F.concat(F.lit("m-"), F.col("doc_id")).alias("media_ref"),
        F.lit("image").alias("media_kind"),
        F.when(F.pmod("doc_id", F.lit(11)) == 0, F.lit(None).cast("binary"))
        .otherwise(F.encode("text", "UTF-8"))
        .alias("payload"),
    )
    feats = extract_features(img, out_dim=8).select(
        "media_ref", "decode_ok", "feature"
    )
    feat_rows = feats.select(
        "media_ref",
        F.expr(
            "stack(4,"
            " 'b0', CAST(round(element_at(feature, 1) * 255) AS BIGINT),"
            " 'b7', CAST(round(element_at(feature, 8) * 255) AS BIGINT),"
            " 'nfeat', CAST(size(feature) AS BIGINT),"
            " 'ok', CAST(decode_ok AS BIGINT)) AS (part, v)"
        ),
    )
    audio = d.select(
        F.concat(F.lit("m-"), F.col("doc_id")).alias("media_ref"),
        F.lit("audio").alias("media_kind"),
        F.lit(None).cast("binary").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(
                F.pmod("doc_id", F.lit(2)) == 1,
                (F.pmod("doc_id", F.lit(7)) * 700 + 500).cast("int"),
            )
            .otherwise(F.lit(None).cast("int"))
            .alias("duration_ms"),
            F.lit("application/x-audio").alias("mime"),
        ).alias("meta"),
    )
    frame_rows = frame_sample_plan(audio, every_ms=600).select(
        "media_ref",
        F.lit("frame").alias("part"),
        F.col("frame_ts_ms").cast("long").alias("v"),
    )
    return feat_rows.unionByName(frame_rows).orderBy("media_ref", "part", "v")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # EXACTLY 50 entries — the driver's correctness gate adjudicates at
    # most 50 queries (CORRECTNESS_r04 stopped at exactly 50, leaving
    # three registered queries sweep-green but driver-unseen), so the
    # 53 semantic checks of rounds 3-4 are folded into 50 names
    # (round-4 VERDICT directive #1): the per-pair jaccard layer
    # (former q51) is folded into q49's output, the multimodal frame
    # sampler (former q53) is merged with the feature chain into q52,
    # and the z-score outlier scan (former q07) is unioned into q06.
    # Every component therefore has a driver-adjudicated oracle row;
    # nothing relies on builder-side evidence alone.
    return {
        "q01_pricing_summary": q01_pricing_summary,
        "q02_null_counts": q02_null_counts,
        "q03_distinct_counts": q03_distinct_counts,
        "q04_numeric_stats": q04_numeric_stats,
        "q05_quantiles": q05_quantiles,
        "q06_outliers": q06_outliers,
        "q08_skew_kurt": q08_skew_kurt,
        "q09_categorical_detection": q09_categorical_detection,
        "q10_topk_brand": q10_topk_brand,
        "q11_mode_mktsegment": q11_mode_mktsegment,
        "q12_corr_matrix": q12_corr_matrix,
        "q13_rare_values": q13_rare_values,
        "q14_text_length_stats": q14_text_length_stats,
        "q15_char_classes": q15_char_classes,
        "q16_numeric_convertibility": q16_numeric_convertibility,
        "q17_year_rollup": q17_year_rollup,
        "q18_string_funcs": q18_string_funcs,
        "q19_regex_match_counts": q19_regex_match_counts,
        "q20_window_topk_orders": q20_window_topk_orders,
        "q21_anti_join_customers": q21_anti_join_customers,
        "q22_semi_join_parts": q22_semi_join_parts,
        "q23_unique_key_violations": q23_unique_key_violations,
        "q24_exact_dup_texts": q24_exact_dup_texts,
        "q25_fingerprint_distinct": q25_fingerprint_distinct,
        "q26_token_counts": q26_token_counts,
        "q27_lang_share": q27_lang_share,
        "q28_quality_flags": q28_quality_flags,
        "q29_psi_drift": q29_psi_drift,
        "q30_ks_drift": q30_ks_drift,
        "q31_ann_cosine_topk": q31_ann_cosine_topk,
        "q32_minhash_pairs": q32_minhash_pairs,
        "q33_span_validation": q33_span_validation,
        "q34_embedding_norm_stats": q34_embedding_norm_stats,
        "q35_categorical_inconsistency": q35_categorical_inconsistency,
        "q36_jarque_bera": q36_jarque_bera,
        "q37_cube_rollup": q37_cube_rollup,
        "q38_chunk_counts": q38_chunk_counts,
        "q39_stopword_removal": q39_stopword_removal,
        "q40_pivot": q40_pivot,
        "q41_setops": q41_setops,
        "q42_date_arith": q42_date_arith,
        "q43_quality_score": q43_quality_score,
        "q44_mixed_type": q44_mixed_type,
        "q45_cosine_neardup": q45_cosine_neardup,
        "q46_correction_summary": q46_correction_summary,
        "q47_partitioned_moments": q47_partitioned_moments,
        "q48_connected_components": q48_connected_components,
        "q49_dedup_pipeline": q49_dedup_pipeline,
        "q50_text_changes": q50_text_changes,
        "q52_multimodal_pipeline": q52_multimodal_pipeline,
    }


# the DuckDB mirror of _quality_projection (q43/q44)
_QUALITY_BASE_SQL = """
    SELECT o_totalprice,
           CASE WHEN o_orderkey % 50 = 0 THEN NULL ELSE o_custkey END AS custkey_n,
           CASE WHEN o_orderkey % 10 = 0 THEN CAST(o_custkey AS VARCHAR)
                ELSE o_orderstatus END AS status_mixed,
           o_orderpriority
    FROM orders
"""


def _q46_side_sql(cte: str) -> str:
    """Summary terms for one side of q46 (same structure as the q43
    oracle, parameterized by the source CTE): n, distinct rows, null
    counts, and the quality-score terms."""
    return f"""
      SELECT count(*) AS n,
             (SELECT count(*) FROM (SELECT DISTINCT * FROM {cte})) AS n_distinct,
             sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS null_p,
             sum(CASE WHEN custkey_n IS NULL THEN 1 ELSE 0 END) AS null_c,
             sum(CASE WHEN status_mixed IS NULL THEN 1 ELSE 0 END) AS null_s,
             sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS null_o,
             quantile_cont(o_totalprice, 0.25) AS q1_p,
             quantile_cont(o_totalprice, 0.75) AS q3_p,
             avg(o_totalprice) AS mean_p,
             stddev_pop(o_totalprice) AS sdp_p,
             stddev_samp(o_totalprice) AS sds_p,
             quantile_cont(custkey_n, 0.25) AS q1_c,
             quantile_cont(custkey_n, 0.75) AS q3_c,
             avg(custkey_n) AS mean_c,
             stddev_pop(custkey_n) AS sdp_c,
             stddev_samp(custkey_n) AS sds_c,
             sum(CASE WHEN regexp_full_match(status_mixed, '[0-9]+') THEN 1 ELSE 0 END) AS dig_s,
             sum(CASE WHEN status_mixed IS NOT NULL THEN 1 ELSE 0 END) AS nn_s,
             sum(CASE WHEN regexp_full_match(o_orderpriority, '[0-9]+') THEN 1 ELSE 0 END) AS dig_o,
             sum(CASE WHEN o_orderpriority IS NOT NULL THEN 1 ELSE 0 END) AS nn_o
      FROM {cte}
    """


def _q46_outlier_sql(cte: str, m: str) -> str:
    return f"""
      SELECT count(*) AS n_outlier_rows FROM {cte}, {m}
      WHERE ((o_totalprice < q1_p - 1.5 * (q3_p - q1_p))
             OR (o_totalprice > q3_p + 1.5 * (q3_p - q1_p))
             OR (sds_p > 0 AND abs((o_totalprice - mean_p) / sdp_p) > 3.0))
         OR ((custkey_n < q1_c - 1.5 * (q3_c - q1_c))
             OR (custkey_n > q3_c + 1.5 * (q3_c - q1_c))
             OR (sds_c > 0 AND abs((custkey_n - mean_c) / sdp_c) > 3.0))
    """


def _q46_terms_sql(m: str, o: str) -> str:
    """(missing_pct, dup_pct, outlier_pct, n_issues, quality_score)."""
    return f"""
      SELECT 100.0 * (null_p + null_c + null_s + null_o) / (n * 4) AS missing_pct,
             100.0 * (n - n_distinct) / n AS dup_pct,
             100.0 * n_outlier_rows / n AS outlier_pct,
             (CASE WHEN dig_s > 0 AND nn_s - dig_s > 0 THEN 1 ELSE 0 END
              + CASE WHEN dig_o > 0 AND nn_o - dig_o > 0 THEN 1 ELSE 0 END) AS n_issues,
             n, n_distinct, null_p, null_c, null_s, null_o
      FROM {m}, {o}
    """


def _q46_oracle_sql() -> str:
    r4 = lambda x: f"floor(({x}) * 10000 + 0.5) / 10000"  # noqa: E731
    score = (
        "GREATEST(100.0 - LEAST(missing_pct * 0.5, 20.0)"
        " - LEAST(dup_pct * 0.3, 15.0)"
        " - LEAST(outlier_pct * 0.2, 10.0)"
        " - LEAST(n_issues * 5.0, 15.0), 0.0)"
    )
    rows = []
    rows.append(f"SELECT 'rows' AS metric, '' AS \"column\", CAST(tb.n AS DOUBLE) AS before, CAST(ta.n AS DOUBLE) AS after FROM tb, ta")
    rows.append("SELECT 'columns', '', 4.0, 4.0")
    rows.append("SELECT 'duplicate_rows', '', CAST(tb.n - tb.n_distinct AS DOUBLE), CAST(ta.n - ta.n_distinct AS DOUBLE) FROM tb, ta")
    for col, fld in (("o_totalprice", "null_p"), ("custkey_n", "null_c"),
                     ("status_mixed", "null_s"), ("o_orderpriority", "null_o")):
        rows.append(f"SELECT 'null_count', '{col}', CAST(tb.{fld} AS DOUBLE), CAST(ta.{fld} AS DOUBLE) FROM tb, ta")
    for metric in ("missing_pct", "dup_pct", "outlier_pct"):
        rows.append(f"SELECT '{metric}', '', {r4(f'tb.{metric}')}, {r4(f'ta.{metric}')} FROM tb, ta")
    rows.append("SELECT 'n_issues', '', CAST(tb.n_issues AS DOUBLE), CAST(ta.n_issues AS DOUBLE) FROM tb, ta")
    rows.append(
        f"SELECT 'quality_score', '', {r4(score.replace('missing_pct', 'tb.missing_pct').replace('dup_pct', 'tb.dup_pct').replace('outlier_pct', 'tb.outlier_pct').replace('n_issues', 'tb.n_issues'))}, "
        f"{r4(score.replace('missing_pct', 'ta.missing_pct').replace('dup_pct', 'ta.dup_pct').replace('outlier_pct', 'ta.outlier_pct').replace('n_issues', 'ta.n_issues'))} FROM tb, ta"
    )
    union = "\n      UNION ALL\n      ".join(rows)
    return f"""
      WITH base AS ({_QUALITY_BASE_SQL}),
      cleaned AS (
        SELECT LEAST(GREATEST(o_totalprice, 1000.0), 300000.0) AS o_totalprice,
               COALESCE(custkey_n, 12345) AS custkey_n,
               status_mixed, o_orderpriority
        FROM (SELECT DISTINCT * FROM base)
      ),
      mb AS ({_q46_side_sql('base')}),
      ma AS ({_q46_side_sql('cleaned')}),
      ob AS ({_q46_outlier_sql('base', 'mb')}),
      oa AS ({_q46_outlier_sql('cleaned', 'ma')}),
      tb AS ({_q46_terms_sql('mb', 'ob')}),
      ta AS ({_q46_terms_sql('ma', 'oa')})
      {union}
    """


def _q47_oracle_sql() -> str:
    def r3(x: str) -> str:
        return f"floor(({x}) * 1000 + 0.5) / 1000"

    parts = []
    for c in sorted(["l_quantity", "l_extendedprice", "l_discount"]):
        mu = f"(SELECT avg({c}) AS mu FROM lineitem)"
        std = (
            f"(SELECT sqrt(sum(pow({c} - m.mu, 2)) / (count(*) - 1)) "
            f"FROM lineitem, {mu} m)"
        )
        skew = (
            f"(SELECT avg(pow({c} - m.mu, 3)) / pow(avg(pow({c} - m.mu, 2)), 1.5) "
            f"FROM lineitem, {mu} m)"
        )
        kurt = (
            f"(SELECT avg(pow({c} - m.mu, 4)) / pow(avg(pow({c} - m.mu, 2)), 2) - 3.0 "
            f"FROM lineitem, {mu} m)"
        )
        parts.append(
            f"SELECT '{c}' AS column_name, "
            f"{r3(f'(SELECT avg({c}) FROM lineitem)')} AS mean, "
            f"{r3(std)} AS std, {r3(skew)} AS skewness, {r3(kurt)} AS kurtosis"
        )
    return " UNION ALL ".join(parts)


def _dedup_verified_cte() -> str:
    """Shared q49 oracle layer: brute-force 3-word-shingle jaccard
    over all pairs in the doc_id subset (size-ratio prefilter is exact:
    jaccard >= 0.5 forces |A| <= 2|B| and |B| <= 2|A|)."""
    return f"""
      sh AS (
        SELECT doc_id AS id,
               list_distinct(
                 CASE WHEN len(w) >= 3
                   THEN list_transform(range(1, len(w) - 1),
                                       i -> array_to_string(w[i:i+2], ' '))
                   ELSE [array_to_string(w, ' ')] END
               ) AS s
        FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w
              FROM documents WHERE doc_id < {_DEDUP_SUBSET})
      ),
      verified AS (
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
        FROM sh a JOIN sh b
          ON a.id < b.id
         AND len(a.s) <= 2 * len(b.s) AND len(b.s) <= 2 * len(a.s)
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / len(list_distinct(list_concat(a.s, b.s))) >= {_DEDUP_TAU}
      )"""


def _q49_oracle_sql() -> str:
    """Brute-force pairs + per-pair jaccard + recursive-CTE component
    labels, joined per pair — the one oracle adjudicates candidates,
    verification values, and the drop-list labeling together."""
    return f"""
      WITH RECURSIVE {_dedup_verified_cte()},
      bidir AS (
        SELECT id_a AS src, id_b AS dst FROM verified
        UNION SELECT id_b, id_a FROM verified
      ),
      touched AS (SELECT DISTINCT src AS node FROM bidir),
      reach(node, lbl) AS (
        SELECT node, node FROM touched
        UNION
        SELECT b.dst, r.lbl FROM reach r JOIN bidir b ON b.src = r.node
      ),
      comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
      SELECT CAST(v.id_a AS BIGINT) AS id_a,
             CAST(v.id_b AS BIGINT) AS id_b,
             v.jaccard,
             CAST(ca.component AS BIGINT) AS comp_a,
             CAST(cb.component AS BIGINT) AS comp_b
      FROM verified v
      JOIN comp ca ON ca.node = v.id_a
      JOIN comp cb ON cb.node = v.id_b
      ORDER BY id_a, id_b
    """


def _q50_side_sql(cte: str) -> str:
    """One fused aggregation side of the q50 oracle — every term of
    textops.text_change_report recomputed from scratch in SQL."""
    from automatic_data_validator_spark import config as _cfg

    url = _cfg.TEXT_PATTERNS["url"]
    email = _cfg.TEXT_PATTERNS["email"]
    html = _cfg.TEXT_PATTERNS["html_tag"]
    enc = " OR ".join(
        "contains(t, '" + bad.replace("'", "''") + "')"
        for bad in _cfg.ENCODING_ARTIFACTS
    )
    return f"""
      SELECT
        CAST(count(*) AS DOUBLE) AS n_docs,
        CAST(sum(len(t)) AS DOUBLE) AS total_chars,
        CAST(sum(CASE WHEN trim(t) = '' THEN 0
                 ELSE len(regexp_split_to_array(trim(lower(t)), '\\s+')) END)
             AS DOUBLE) AS total_words,
        CAST(sum(len(list_filter(regexp_split_to_array(t, '[.!?]+'),
                                 x -> trim(x) <> ''))) AS DOUBLE)
             AS total_sentences,
        CAST(sum(CASE WHEN trim(t) = '' THEN 0
                 ELSE len(list_distinct(
                        regexp_split_to_array(trim(lower(t)), '\\s+'))) END)
             AS DOUBLE) AS distinct_words,
        CAST(sum(len(regexp_extract_all(t, '{url}'))) AS DOUBLE) AS urls,
        CAST(sum(len(regexp_extract_all(t, '{email}'))) AS DOUBLE) AS emails,
        CAST(sum(len(regexp_extract_all(t, '{html}'))) AS DOUBLE) AS html_tags,
        CAST(sum(CASE WHEN regexp_matches(t, '{html}') THEN 1 ELSE 0 END)
             AS DOUBLE) AS docs_with_html,
        CAST(sum(CASE WHEN regexp_matches(t, '{url}') THEN 1 ELSE 0 END)
             AS DOUBLE) AS docs_with_urls,
        CAST(sum(CASE WHEN {enc} THEN 1 ELSE 0 END) AS DOUBLE)
             AS docs_with_encoding_artifacts
      FROM (SELECT coalesce(text, '') AS t FROM {cte})
    """


def _q50_oracle_sql() -> str:
    from automatic_data_validator_spark import config as _cfg

    url = _cfg.TEXT_PATTERNS["url"]
    email = _cfg.TEXT_PATTERNS["email"]
    html = _cfg.TEXT_PATTERNS["html_tag"]
    noise = _Q50_NOISE.replace("'", "''")
    simple = [
        "n_docs", "total_chars", "total_words", "total_sentences",
        "distinct_words", "urls", "emails", "html_tags", "docs_with_html",
        "docs_with_urls", "docs_with_encoding_artifacts",
    ]
    rows = [
        f"SELECT '{m}' AS metric, b.{m} AS before, a.{m} AS after, "
        f"a.{m} - b.{m} AS change FROM b, a"
        for m in simple
    ]
    acw = "{s}.total_chars / greatest({s}.total_words, 1.0)"
    vr = "{s}.distinct_words / greatest({s}.total_words, 1.0)"
    rows.append(
        f"SELECT 'average_chars_per_word', {acw.format(s='b')}, "
        f"{acw.format(s='a')}, {acw.format(s='a')} - {acw.format(s='b')} FROM b, a"
    )
    rows.append(
        f"SELECT 'vocabulary_richness', {vr.format(s='b')}, "
        f"{vr.format(s='a')}, {vr.format(s='a')} - {vr.format(s='b')} FROM b, a"
    )
    rows.append(
        "SELECT 'length_reduction', b.total_chars, a.total_chars, "
        "-(b.total_chars - a.total_chars) FROM b, a"
    )
    rows.append(
        "SELECT 'reduction_percentage', NULL, NULL, "
        "CASE WHEN b.total_chars > 0 THEN "
        "(b.total_chars - a.total_chars) / b.total_chars * 100.0 "
        "ELSE 0.0 END FROM b, a"
    )
    union = "\n      UNION ALL ".join(rows)
    return f"""
      WITH orig AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN text || '{noise}'
                    ELSE text END AS text
        FROM documents
      ),
      cleaned AS (
        SELECT doc_id,
               trim(regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(text, '{url}', ' ', 'g'),
                     '{email}', ' ', 'g'),
                   '{html}', ' ', 'g'),
                 '\\s+', ' ', 'g')) AS text
        FROM orig
      ),
      b AS ({_q50_side_sql('orig')}),
      a AS ({_q50_side_sql('cleaned')})
      SELECT metric, before, after, change FROM (
        {union}
      ) ORDER BY metric
    """


def oracle_sql() -> dict[str, str]:
    null_cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                 "o_orderdate", "o_orderpriority"]
    nulls_sql = ", ".join(
        f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_{c}"
        for c in null_cols
    )
    ks_diffs = ", ".join(
        "round(abs("
        f"avg(CASE WHEN event_type = 'error' THEN CASE WHEN value <= {g} THEN 1.0 ELSE 0.0 END END) - "
        f"avg(CASE WHEN event_type = 'click' THEN CASE WHEN value <= {g} THEN 1.0 ELSE 0.0 END END)"
        f"), 6) AS d_{int(g)}"
        for g in _KS_GRID
    )
    bucket_case = "CASE " + " ".join(
        f"WHEN value >= {e} THEN {i + 1}" for i, e in reversed(list(enumerate(_PSI_EDGES)))
    ) + " ELSE 0 END"
    return {
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_extendedprice), 4) AS avg_price,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q02_null_counts": f"SELECT {nulls_sql} FROM orders",
        "q03_distinct_counts": """
            SELECT count(DISTINCT l_orderkey) AS nd_l_orderkey,
                   count(DISTINCT l_partkey) AS nd_l_partkey,
                   count(DISTINCT l_suppkey) AS nd_l_suppkey,
                   count(DISTINCT l_returnflag) AS nd_l_returnflag,
                   count(DISTINCT l_linestatus) AS nd_l_linestatus
            FROM lineitem
        """,
        "q04_numeric_stats": """
            SELECT l_returnflag,
                   round(min(l_extendedprice), 2) AS min_price,
                   round(max(l_extendedprice), 2) AS max_price,
                   round(avg(l_extendedprice), 4) AS avg_price,
                   round(stddev_samp(l_extendedprice), 4) AS std_price,
                   round(sum(l_extendedprice), 2) AS sum_price
            FROM lineitem GROUP BY l_returnflag
        """,
        "q05_quantiles": """
            SELECT l_returnflag,
                   round(quantile_cont(l_quantity, 0.25), 4) AS q1,
                   round(quantile_cont(l_quantity, 0.5), 4) AS median,
                   round(quantile_cont(l_quantity, 0.75), 4) AS q3
            FROM lineitem GROUP BY l_returnflag
        """,
        "q06_outliers": """
            WITH b AS (
              SELECT round(quantile_cont(l_extendedprice, 0.25), 2) AS q1,
                     round(quantile_cont(l_extendedprice, 0.75), 2) AS q3
              FROM lineitem),
            s AS (SELECT round(avg(value), 4) AS mu,
                         round(stddev_samp(value), 4) AS sd FROM events)
            SELECT 'iqr' AS src,
                   CAST(l_orderkey AS BIGINT) AS id1,
                   CAST(l_linenumber AS BIGINT) AS id2,
                   round(l_extendedprice, 2) AS val
            FROM lineitem, b
            WHERE l_extendedprice < q1 - 1.5 * (q3 - q1)
               OR l_extendedprice > q3 + 1.5 * (q3 - q1)
            UNION ALL
            SELECT 'z' AS src,
                   CAST(event_id AS BIGINT) AS id1,
                   CAST(0 AS BIGINT) AS id2,
                   round(value, 2) AS val
            FROM events, s WHERE abs((value - mu) / sd) > 3.0
        """,
        "q08_skew_kurt": """
            WITH m AS (
              SELECT avg(l_extendedprice) AS mu,
                     avg(l_extendedprice * l_extendedprice) AS m2r,
                     count(*) AS n
              FROM lineitem),
            c AS (
              SELECT avg(pow(l_extendedprice - m.mu, 2)) AS m2,
                     avg(pow(l_extendedprice - m.mu, 3)) AS m3,
                     avg(pow(l_extendedprice - m.mu, 4)) AS m4
              FROM lineitem, m)
            SELECT round(m3 / pow(m2, 1.5), 3) AS skew_pop,
                   round(m4 / (m2 * m2) - 3.0, 3) AS kurt_pop
            FROM c
        """,
        "q09_categorical_detection": """
            WITH s AS (
              SELECT count(*) AS n,
                     count(DISTINCT l_returnflag) AS d1,
                     count(DISTINCT l_linestatus) AS d2,
                     count(DISTINCT l_partkey) AS d3
              FROM lineitem)
            SELECT col_name, distinct_count, total_count,
                   round(CAST(distinct_count AS DOUBLE) / total_count, 6) AS distinct_ratio,
                   CAST(distinct_count AS DOUBLE) / total_count < 0.05 AS is_categorical
            FROM (
              SELECT 'l_returnflag' AS col_name, d1 AS distinct_count, n AS total_count FROM s
              UNION ALL
              SELECT 'l_linestatus', d2, n FROM s
              UNION ALL
              SELECT 'l_partkey', d3, n FROM s)
        """,
        "q10_topk_brand": """
            SELECT p_brand, cnt, rnk FROM (
              SELECT p_brand, count(*) AS cnt,
                     row_number() OVER (ORDER BY count(*) DESC, p_brand ASC) AS rnk
              FROM part GROUP BY p_brand)
            WHERE rnk <= 5
        """,
        "q11_mode_mktsegment": """
            SELECT c_mktsegment, count(*) AS cnt
            FROM customer GROUP BY c_mktsegment
            ORDER BY cnt DESC, c_mktsegment ASC LIMIT 1
        """,
        "q12_corr_matrix": """
            SELECT round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
                   round(corr(l_extendedprice, l_discount), 4) AS corr_price_disc,
                   round(corr(l_quantity, l_discount), 4) AS corr_qty_disc
            FROM lineitem
        """,
        "q13_rare_values": """
            WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id)
            SELECT CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare_users,
                   count(*) AS n_users
            FROM c
        """,
        "q14_text_length_stats": """
            SELECT lang, count(*) AS n_docs,
                   CAST(min(length(text)) AS INT) AS len_min,
                   CAST(max(length(text)) AS INT) AS len_max,
                   round(avg(length(text)), 4) AS len_avg,
                   CAST(sum(CASE WHEN text = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty
            FROM documents GROUP BY lang
        """,
        "q15_char_classes": r"""
            SELECT CAST(sum(CASE WHEN regexp_matches(text, '\d') THEN 1 ELSE 0 END) AS BIGINT) AS n_has_digit,
                   CAST(sum(CASE WHEN regexp_matches(text, '[^A-Za-z0-9\s]') THEN 1 ELSE 0 END) AS BIGINT) AS n_has_special,
                   CAST(sum(CASE WHEN upper(text) = text AND regexp_matches(text, '[A-Za-z]') THEN 1 ELSE 0 END) AS BIGINT) AS n_all_upper
            FROM documents
        """,
        "q16_numeric_convertibility": """
            SELECT CAST(sum(CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)
                                 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_convertible,
                   count(*) AS n_total,
                   round(sum(CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)
                             IS NOT NULL THEN 1.0 ELSE 0.0 END) / count(*), 6) AS convert_ratio
            FROM events
        """,
        "q17_year_rollup": """
            SELECT CAST(year(o_orderdate) AS INT) AS order_year,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total_price
            FROM orders GROUP BY 1
        """,
        "q18_string_funcs": """
            SELECT c_custkey, upper(c_mktsegment) AS seg_u,
                   substring(c_name, 1, 9) AS name_prefix,
                   CAST(length(c_name) AS INT) AS name_len
            FROM customer WHERE c_custkey <= 20
        """,
        "q19_regex_match_counts": r"""
            SELECT CAST(sum(CASE WHEN regexp_matches(text, 'https?://') THEN 1 ELSE 0 END) AS BIGINT) AS n_url,
                   CAST(sum(CASE WHEN regexp_matches(text, '\bspark\b') THEN 1 ELSE 0 END) AS BIGINT) AS n_spark,
                   CAST(sum(CASE WHEN regexp_matches(text, '[0-9]{3,}') THEN 1 ELSE 0 END) AS BIGINT) AS n_big_numbers
            FROM documents
        """,
        "q20_window_topk_orders": """
            SELECT o_orderpriority, rnk, o_orderkey, total_price FROM (
              SELECT o_orderpriority, o_orderkey,
                     round(o_totalprice, 2) AS total_price,
                     row_number() OVER (PARTITION BY o_orderpriority
                                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
              FROM orders)
            WHERE rnk <= 3
        """,
        "q21_anti_join_customers": """
            SELECT count(*) AS n_no_orders, min(c_custkey) AS min_ck, max(c_custkey) AS max_ck
            FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "q22_semi_join_parts": """
            SELECT count(*) AS n_big_used_parts
            FROM part WHERE p_size > 45
              AND p_partkey IN (SELECT l_partkey FROM lineitem)
        """,
        "q23_unique_key_violations": """
            SELECT user_id, cnt, rnk FROM (
              SELECT user_id, count(*) AS cnt,
                     row_number() OVER (ORDER BY count(*) DESC, user_id ASC) AS rnk
              FROM events GROUP BY user_id HAVING count(*) > 1)
            WHERE rnk <= 10
        """,
        "q24_exact_dup_texts": """
            SELECT count(*) AS n_dup_groups FROM (
              SELECT md5(lower(text)) AS h, count(*) AS n
              FROM documents GROUP BY 1 HAVING count(*) > 1)
        """,
        "q25_fingerprint_distinct": r"""
            SELECT source,
                   count(DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS n_distinct_norm,
                   count(*) AS n_docs
            FROM documents GROUP BY source
        """,
        "q26_token_counts": r"""
            SELECT source,
                   CAST(sum(CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS BIGINT) AS ws_tokens,
                   CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'))) AS BIGINT) AS bpe_tokens
            FROM documents GROUP BY source
        """,
        "q27_lang_share": r"""
            SELECT source,
                   CAST(sum(CASE WHEN
                     CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                          w -> list_contains(['the','a','an','and','or','but','in','on','at','to',
                                              'for','of','with','by','is','are','was','were','be',
                                              'been','it','this','that','as','from'], w))) AS DOUBLE)
                     / greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')), 1) > 0.1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_english,
                   count(*) AS n_docs
            FROM documents GROUP BY source
        """,
        "q28_quality_flags": r"""
            SELECT doc_id,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS INT) AS q_words,
                   (CASE WHEN trim(text) = '' THEN 0
                         ELSE len(regexp_split_to_array(trim(text), '\s+')) END) < 5 AS flag_short,
                   CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                     / greatest(length(text), 1) > 0.3 AS flag_digit_heavy
            FROM documents
        """,
        "q29_psi_drift": f"""
            WITH b AS (
              SELECT {bucket_case} AS bucket,
                     (event_type = 'error') AS is_err
              FROM events),
            counts AS (
              SELECT bucket,
                     sum(CASE WHEN is_err THEN 1 ELSE 0 END) AS n_err,
                     count(*) AS n_all
              FROM b GROUP BY bucket),
            tot AS (SELECT sum(n_err) AS t_err, sum(n_all) AS t_all FROM counts)
            SELECT round(sum(
                     (CAST(n_err AS DOUBLE) / t_err - CAST(n_all AS DOUBLE) / t_all)
                     * ln(greatest(CAST(n_err AS DOUBLE) / t_err, 1e-6)
                          / greatest(CAST(n_all AS DOUBLE) / t_all, 1e-6))
                   ), 4) AS psi
            FROM counts, tot
        """,
        "q30_ks_drift": f"""
            WITH d AS (SELECT {ks_diffs} FROM events)
            SELECT round(greatest({", ".join(f"d_{int(g)}" for g in _KS_GRID)}), 4) AS ks FROM d
        """,
        "q31_ann_cosine_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
            sims AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            CAST(q.qv AS DOUBLE[])) AS sim
              FROM embeddings e, q)
            SELECT query_id, rnk, neighbor_id FROM (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, neighbor_id ASC) AS rnk
              FROM sims)
            WHERE rnk <= 5
        """,
        "q34_embedding_norm_stats": """
            WITH n AS (
              SELECT label,
                     sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
                                                        x -> x * x), 'sum')) AS nrm
              FROM embeddings)
            SELECT label, count(*) AS n,
                   round(avg(nrm), 4) AS avg_norm,
                   round(min(nrm), 4) AS min_norm,
                   round(max(nrm), 4) AS max_norm
            FROM n GROUP BY label
        """,
        "q35_categorical_inconsistency": """
            WITH v AS (
              SELECT CASE WHEN doc_id % 3 = 0 THEN upper(source)
                          ELSE source END AS value
              FROM documents),
            c AS (
              SELECT value, count(*) AS cnt, lower(trim(value)) AS norm_key
              FROM v GROUP BY value),
            g AS (
              SELECT *, count(*) OVER (PARTITION BY norm_key) AS nv,
                     row_number() OVER (PARTITION BY norm_key
                                        ORDER BY cnt DESC, value ASC) AS rn
              FROM c)
            SELECT norm_key, value, cnt, rn = 1 AS is_canonical
            FROM g WHERE nv > 1
        """,
        "q36_jarque_bera": """
            WITH m AS (SELECT avg(l_quantity) AS mu, count(*) AS n FROM lineitem),
            c AS (
              SELECT n,
                     avg(pow(l_quantity - mu, 2)) AS m2,
                     avg(pow(l_quantity - mu, 3)) AS m3,
                     avg(pow(l_quantity - mu, 4)) AS m4
              FROM lineitem, m GROUP BY n),
            j AS (
              SELECT round(n / 6.0 * (pow(m3 / pow(m2, 1.5), 2)
                     + pow(m4 / (m2 * m2) - 3.0, 2) / 4.0), 0) AS jb
              FROM c)
            SELECT jb, jb > 5.99 AS reject_normality FROM j
        """,
        "q37_cube_rollup": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   count(*) AS n
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "q38_chunk_counts": r"""
            SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_words,
                   CAST(greatest(ceil((len(regexp_split_to_array(trim(text), '\s+')) - 8)
                                      / 56.0), 1) AS INT) AS n_chunks
            FROM documents
        """,
        "q39_stopword_removal": r"""
            SELECT lang,
                   CAST(sum(length(text)) AS BIGINT) AS len_raw,
                   CAST(sum(length(array_to_string(list_filter(
                        regexp_split_to_array(trim(text), '\s+'),
                        w -> NOT list_contains(
                          ['the','a','an','and','or','but','in','on','at','to',
                           'for','of','with','by','is','are','was','were','be',
                           'been','it','this','that','as','from'], lower(w))),
                        ' '))) AS BIGINT) AS len_nostop
            FROM documents GROUP BY lang
        """,
        "q40_pivot": """
            SELECT l_returnflag,
                   round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o,
                   round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f
            FROM lineitem GROUP BY l_returnflag
        """,
        "q41_setops": """
            WITH y94 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1994),
                 y95 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995)
            SELECT
              (SELECT count(*) FROM (SELECT o_custkey FROM y94 INTERSECT
                                     SELECT o_custkey FROM y95)) AS n_both,
              (SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM y94 EXCEPT ALL
                                     SELECT DISTINCT o_custkey FROM y95)) AS n_only_1994
        """,
        "q42_date_arith": """
            SELECT o_orderpriority,
                   strftime(min(o_orderdate), '%Y-%m-%d') AS first_day,
                   strftime(max(o_orderdate), '%Y-%m-%d') AS last_day,
                   CAST(date_diff('day', min(o_orderdate), max(o_orderdate)) AS INT) AS span_days,
                   count(*) AS n
            FROM orders GROUP BY o_orderpriority
        """,
        "q33_span_validation": """
            WITH w AS (
              SELECT doc_id,
                     length(string_split_regex(text, '\\s+')) AS words
              FROM documents
            ),
            s AS (
              SELECT doc_id,
                     GREATEST(CAST(FLOOR((words + 4) / 5.0) AS INT), 1)
                     + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS total_spans
              FROM w
            )
            SELECT rule_id, row_count, violation_count, violation_count = 0 AS ok
            FROM (
              SELECT 'span_order' AS rule_id, count(*) AS row_count,
                     CAST(sum(CASE WHEN doc_id % 7 = 0 AND total_spans >= 2
                              THEN 1 ELSE 0 END) AS BIGINT) AS violation_count
              FROM s
              UNION ALL
              SELECT 'span_shape', count(*), CAST(0 AS BIGINT) FROM s
              UNION ALL
              SELECT 'not_null_doc_id', count(*), CAST(0 AS BIGINT) FROM s
            )
        """,
        "q43_quality_score": f"""
            WITH base AS ({_QUALITY_BASE_SQL}),
            m AS (
              SELECT count(*) AS n,
                     (SELECT count(*) FROM (SELECT DISTINCT * FROM base)) AS n_distinct,
                     sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                     + sum(CASE WHEN custkey_n IS NULL THEN 1 ELSE 0 END)
                     + sum(CASE WHEN status_mixed IS NULL THEN 1 ELSE 0 END)
                     + sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS n_missing,
                     quantile_cont(o_totalprice, 0.25) AS q1_p,
                     quantile_cont(o_totalprice, 0.75) AS q3_p,
                     avg(o_totalprice) AS mean_p,
                     stddev_pop(o_totalprice) AS sdp_p,
                     stddev_samp(o_totalprice) AS sds_p,
                     quantile_cont(custkey_n, 0.25) AS q1_c,
                     quantile_cont(custkey_n, 0.75) AS q3_c,
                     avg(custkey_n) AS mean_c,
                     stddev_pop(custkey_n) AS sdp_c,
                     stddev_samp(custkey_n) AS sds_c,
                     sum(CASE WHEN regexp_full_match(status_mixed, '[0-9]+') THEN 1 ELSE 0 END) AS dig_s,
                     sum(CASE WHEN status_mixed IS NOT NULL THEN 1 ELSE 0 END) AS nn_s,
                     sum(CASE WHEN regexp_full_match(o_orderpriority, '[0-9]+') THEN 1 ELSE 0 END) AS dig_o,
                     sum(CASE WHEN o_orderpriority IS NOT NULL THEN 1 ELSE 0 END) AS nn_o
              FROM base
            ),
            o AS (
              SELECT count(*) AS n_outlier_rows FROM base, m
              WHERE ((o_totalprice < q1_p - 1.5 * (q3_p - q1_p))
                     OR (o_totalprice > q3_p + 1.5 * (q3_p - q1_p))
                     OR (sds_p > 0 AND abs((o_totalprice - mean_p) / sdp_p) > 3.0))
                 OR ((custkey_n < q1_c - 1.5 * (q3_c - q1_c))
                     OR (custkey_n > q3_c + 1.5 * (q3_c - q1_c))
                     OR (sds_c > 0 AND abs((custkey_n - mean_c) / sdp_c) > 3.0))
            ),
            f AS (
              SELECT 100.0 * n_missing / (n * 4) AS missing_pct,
                     100.0 * (n - n_distinct) / n AS dup_pct,
                     100.0 * n_outlier_rows / n AS outlier_pct,
                     (CASE WHEN dig_s > 0 AND nn_s - dig_s > 0 THEN 1 ELSE 0 END
                      + CASE WHEN dig_o > 0 AND nn_o - dig_o > 0 THEN 1 ELSE 0 END) AS n_issues
              FROM m, o
            )
            SELECT floor(missing_pct * 10000 + 0.5) / 10000 AS missing_pct,
                   floor(dup_pct * 10000 + 0.5) / 10000 AS dup_pct,
                   floor(outlier_pct * 10000 + 0.5) / 10000 AS outlier_pct,
                   CAST(n_issues AS INT) AS n_issues,
                   floor(GREATEST(100.0
                                  - LEAST(missing_pct * 0.5, 20.0)
                                  - LEAST(dup_pct * 0.3, 15.0)
                                  - LEAST(outlier_pct * 0.2, 10.0)
                                  - LEAST(n_issues * 5.0, 15.0), 0.0) * 100 + 0.5) / 100
                       AS quality_score
            FROM f
        """,
        "q45_cosine_neardup": """
            WITH p AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])) AS c
              FROM embeddings a, embeddings b
              WHERE a.vec_id < b.vec_id
            ),
            r AS (
              SELECT id_a, id_b, c,
                     CAST(row_number() OVER (ORDER BY c DESC, id_a, id_b) AS INT) AS rnk
              FROM p
            )
            SELECT rnk, id_a, id_b, round(c, 4) AS cosine_sim
            FROM r WHERE rnk <= 20
        """,
        "q44_mixed_type": f"""
            WITH base AS ({_QUALITY_BASE_SQL})
            SELECT 'status_mixed' AS column_name,
                   CAST(sum(CASE WHEN regexp_full_match(status_mixed, '[0-9]+') THEN 1 ELSE 0 END) AS BIGINT) AS n_numeric_string,
                   CAST(sum(CASE WHEN status_mixed IS NOT NULL AND NOT regexp_full_match(status_mixed, '[0-9]+') THEN 1 ELSE 0 END) AS BIGINT) AS n_text,
                   (sum(CASE WHEN regexp_full_match(status_mixed, '[0-9]+') THEN 1 ELSE 0 END) > 0
                    AND sum(CASE WHEN status_mixed IS NOT NULL AND NOT regexp_full_match(status_mixed, '[0-9]+') THEN 1 ELSE 0 END) > 0) AS is_mixed
            FROM base
            UNION ALL
            SELECT 'o_orderpriority' AS column_name,
                   CAST(sum(CASE WHEN regexp_full_match(o_orderpriority, '[0-9]+') THEN 1 ELSE 0 END) AS BIGINT) AS n_numeric_string,
                   CAST(sum(CASE WHEN o_orderpriority IS NOT NULL AND NOT regexp_full_match(o_orderpriority, '[0-9]+') THEN 1 ELSE 0 END) AS BIGINT) AS n_text,
                   (sum(CASE WHEN regexp_full_match(o_orderpriority, '[0-9]+') THEN 1 ELSE 0 END) > 0
                    AND sum(CASE WHEN o_orderpriority IS NOT NULL AND NOT regexp_full_match(o_orderpriority, '[0-9]+') THEN 1 ELSE 0 END) > 0) AS is_mixed
            FROM base
        """,
        "q46_correction_summary": _q46_oracle_sql(),
        "q47_partitioned_moments": _q47_oracle_sql(),
        "q48_connected_components": """
            WITH RECURSIVE nodes AS (
              SELECT DISTINCT user_id FROM events WHERE user_id < 300
            ),
            edges AS (
              SELECT a.user_id AS src, b.user_id AS dst
              FROM nodes a JOIN nodes b
                ON b.user_id = a.user_id + 2 AND a.user_id % 7 <> 0
            ),
            bidir AS (
              SELECT src, dst FROM edges
              UNION SELECT dst, src FROM edges
            ),
            touched AS (SELECT DISTINCT src AS node FROM bidir),
            reach(node, lbl) AS (
              SELECT node, node FROM touched
              UNION
              SELECT b.dst, r.lbl FROM reach r JOIN bidir b ON b.src = r.node
            )
            SELECT CAST(node AS BIGINT) AS node,
                   CAST(min(lbl) AS BIGINT) AS component
            FROM reach GROUP BY node ORDER BY node
        """,
        "q49_dedup_pipeline": _q49_oracle_sql(),
        "q50_text_changes": _q50_oracle_sql(),
        "q52_multimodal_pipeline": """
            WITH m AS (
              SELECT 'm-' || CAST(doc_id AS VARCHAR) AS media_ref,
                     CASE WHEN doc_id % 11 = 0 THEN NULL ELSE text END AS t
              FROM documents
            ),
            fm AS (
              SELECT 'm-' || CAST(doc_id AS VARCHAR) AS media_ref,
                     (doc_id % 7) * 700 + 500 AS dur
              FROM documents WHERE doc_id % 2 = 1
            )
            SELECT media_ref, part, v FROM (
              SELECT media_ref, 'b0' AS part,
                     CASE WHEN t IS NULL THEN NULL
                          ELSE CAST(ascii(substring(t, 1, 1)) AS BIGINT) END AS v
              FROM m
              UNION ALL
              SELECT media_ref, 'b7',
                     CASE WHEN t IS NULL THEN NULL
                          ELSE CAST(ascii(substring(t, 8, 1)) AS BIGINT) END
              FROM m
              UNION ALL
              SELECT media_ref, 'nfeat',
                     CASE WHEN t IS NULL THEN NULL ELSE CAST(8 AS BIGINT) END
              FROM m
              UNION ALL
              SELECT media_ref, 'ok', CAST(t IS NOT NULL AS BIGINT) FROM m
              UNION ALL
              SELECT media_ref, 'frame',
                     CAST(unnest(range(0, dur, 600)) AS BIGINT)
              FROM fm
            ) ORDER BY media_ref, part, v
        """,
    }
