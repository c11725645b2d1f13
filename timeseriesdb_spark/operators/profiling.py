"""Data-profiling operators: table column statistics and calendar
gap detection.

The reference maintains per-segment AggStats at write time
(buffer_pool.rs:757-790) and prunes with hierarchical stats trees
(stats.rs:7-58) — the engine-side use of column statistics. These
queries expose the same statistics as a user-facing surface: the
ANALYZE-style column profile every warehouse runs before planning,
and the per-signal missing-days report that drives backfill jobs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timeseriesdb_spark.tables import load_table

PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style numeric column profile of lineitem: rows of
    (column, n, n_null, n_distinct, min_v, max_v).

    All columns profile in ONE scan: a single agg computes every
    per-column statistic (Spark plans the multi-distinct via one
    Expand — still one pass over the data), then the wide row is
    unpivoted driver-side into the profile rows. At 100 TB swap
    count_distinct for approx_count_distinct (HLL, no Expand) — the
    statistics consumer (the optimizer) only needs magnitude."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                f"{c}__nn"
            ),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            F.min(c).alias(f"{c}__mn"),
            F.max(c).alias(f"{c}__mx"),
        ]
    wide = li.agg(*aggs)
    parts = [
        wide.select(
            F.lit(c).alias("column"),
            F.col(f"{c}__n").alias("n"),
            F.col(f"{c}__nn").alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            F.col(f"{c}__mn").cast("double").alias("min_v"),
            F.col(f"{c}__mx").cast("double").alias("max_v"),
        )
        for c in PROFILE_COLS
    ]
    return reduce(DataFrame.unionAll, parts)


def q_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-signal calendar gaps: days inside [first_day, last_day] of
    each signal with ZERO events — the missing-data report that
    schedules backfills (the row-level twin of q_gap_report's
    intra-day SLA view).

    Shape: per-signal min/max day + distinct active days are one
    partial agg; the calendar is generated per signal with sequence()
    (span-bounded array, no cross join against a calendar table) and
    anti-joined against the active-day set within the same signal
    partitioning — one shuffle total, no global structure."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.col("ts")).alias("d")
    )
    active = days.distinct()
    span = active.groupBy("user_id").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    calendar = span.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("d"),
    )
    return (
        calendar.join(active, ["user_id", "d"], "anti")
        # timestamp, not date: pandas/Arrow map DATE to python objects
        # on one engine and datetime64 on the other — the driver's
        # repr-hash needs one physical type from both
        .select("user_id", F.col("d").cast("timestamp").alias("gap_day"))
    )


DQ_QTY_LO, DQ_QTY_HI = 1.0, 50.0  # valid l_quantity range
DQ_SCHEMA = "table_name string, check_name string, violations bigint, total bigint"


def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-validation report (the Deequ/expectations pattern):
    completeness, uniqueness, range, referential-integrity and
    non-emptiness checks as (table, check, violations, total) rows —
    the gate a pipeline runs before promoting a batch, next to
    q_column_profile's statistics.

    Shape: per-table checks share ONE scan via a single multi-aggregate
    (the q_column_profile discipline); the FK check is a broadcast-able
    anti-join count. Every result frame is one row, so the final union
    is free. At 100 TB each check stays a partial-aggregated scan —
    nothing row-sized ever leaves the executors."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    doc = load_table(spark, sf_dir, "documents")

    li_wide = li.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(
            F.when(F.col("l_orderkey").isNull(), 1).otherwise(0)
        ).alias("v_null"),
        F.sum(
            F.when(
                ~F.col("l_quantity").between(DQ_QTY_LO, DQ_QTY_HI), 1
            ).otherwise(0)
        ).alias("v_range"),
    )
    ord_wide = orders.agg(
        F.count(F.lit(1)).alias("total"),
        (F.count("o_orderkey") - F.count_distinct("o_orderkey")).alias(
            "v_dup"
        ),
        F.sum(
            F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)
        ).alias("v_price"),
    )
    fk = (
        li.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "anti",
        )
        .agg(F.count(F.lit(1)).alias("v_fk"))
        .crossJoin(li_wide.select("total"))
    )
    doc_wide = doc.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(
            F.when(
                F.col("text").isNull()
                | (F.length(F.trim(F.col("text"))) == 0),
                1,
            ).otherwise(0)
        ).alias("v_empty"),
    )

    def row(src: DataFrame, table: str, check: str, vcol: str) -> DataFrame:
        return src.select(
            F.lit(table).alias("table_name"),
            F.lit(check).alias("check_name"),
            F.col(vcol).cast("bigint").alias("violations"),
            F.col("total").cast("bigint").alias("total"),
        )

    parts = [
        row(li_wide, "lineitem", "not_null:l_orderkey", "v_null"),
        row(
            li_wide,
            "lineitem",
            f"range:l_quantity[{DQ_QTY_LO},{DQ_QTY_HI}]",
            "v_range",
        ),
        row(fk, "lineitem", "fk:l_orderkey->orders", "v_fk"),
        row(ord_wide, "orders", "unique:o_orderkey", "v_dup"),
        row(ord_wide, "orders", "positive:o_totalprice", "v_price"),
        row(doc_wide, "documents", "nonempty:text", "v_empty"),
    ]
    return reduce(DataFrame.unionAll, parts)


PSI_SRC_E, PSI_SRC_A = "src0", "src1"  # expected vs actual population
PSI_BIN_W = 50                         # n_chars equi-width bin


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two sources' document-length
    distributions — the banded companion to the KS test (q_length_ks):
    per equi-width bin, (p_a − p_e)·ln(p_a/p_e), plus the running PSI
    total (PSI < 0.1 stable, > 0.25 shifted — the scorecard-monitoring
    convention).

    Bins empty on either side are reported with a NULL term and
    excluded from the total (the no-epsilon-fudge variant —
    deterministic, engine-exact). Proportions divide exact integer
    counts; each term is rounded to the 1e-9 grid and decimal-summed
    over the bin table (bin-count-sized, so the total window is
    aggregate-sized)."""
    doc = load_table(spark, sf_dir, "documents").where(
        F.col("source").isin(PSI_SRC_E, PSI_SRC_A)
    )
    b = doc.groupBy(
        F.expr(f"n_chars div {PSI_BIN_W}").alias("bin")
    ).agg(
        F.sum((F.col("source") == PSI_SRC_E).cast("long")).alias("c_e"),
        F.sum((F.col("source") == PSI_SRC_A).cast("long")).alias("c_a"),
    )
    tot = b.agg(F.sum("c_e").alias("n_e"), F.sum("c_a").alias("n_a"))
    j = b.crossJoin(F.broadcast(tot))
    p_e = F.col("c_e").cast("double") / F.col("n_e").cast("double")
    p_a = F.col("c_a").cast("double") / F.col("n_a").cast("double")
    term = F.when(
        (F.col("c_e") > 0) & (F.col("c_a") > 0),
        F.round((p_a - p_e) * F.log(p_a / p_e), 9),
    )
    w = Window.partitionBy()
    return j.select(
        "bin",
        "c_e",
        "c_a",
        F.round(p_e, 6).alias("p_e"),
        F.round(p_a, 6).alias("p_a"),
        term.alias("psi_term"),
        F.round(
            F.sum(term.cast("decimal(38,9)")).over(w).cast("double"), 6
        ).alias("psi_total"),
    )


def q_lang_source_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between the lang and source columns — the
    column-dependence profile (is language balanced across crawls, or
    does one source carry all the German?). Per (lang, source) cell:
    pointwise MI and its p·ln-term; the repeated mi_total column is
    the statistic (0 = independent).

    All probabilities divide exact counts; ln sees engine-identical
    doubles; terms round to 1e-9 and decimal-sum over the cell table
    (|langs|×|sources| rows — the total window is tiny)."""
    doc = load_table(spark, sf_dir, "documents")
    cell = doc.groupBy("lang", "source").agg(F.count("*").alias("n_ls"))
    lang = doc.groupBy("lang").agg(F.count("*").alias("n_l"))
    src = doc.groupBy("source").agg(F.count("*").alias("n_s"))
    tot = doc.agg(F.count("*").alias("n"))
    j = (
        cell.join(F.broadcast(lang), "lang")
        .join(F.broadcast(src), "source")
        .crossJoin(F.broadcast(tot))
    )
    ratio = (
        F.col("n_ls").cast("double") * F.col("n").cast("double")
    ) / (F.col("n_l").cast("double") * F.col("n_s").cast("double"))
    term = F.round(
        (F.col("n_ls").cast("double") / F.col("n").cast("double"))
        * F.log(ratio),
        9,
    )
    w = Window.partitionBy()
    return j.select(
        "lang",
        "source",
        "n_ls",
        F.round(F.log(ratio), 6).alias("pmi"),
        term.alias("mi_term"),
        F.round(
            F.sum(term.cast("decimal(38,9)")).over(w).cast("double"), 6
        ).alias("mi_total"),
    )


def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law conformance of o_totalprice first digits — the
    fraud/synthetic-data smell test an audit pipeline runs on every
    monetary column. Per leading digit: observed share vs the Benford
    expectation log10(1+1/d), plus the running χ² statistic.

    The leading digit is extracted from the exact cents integer
    (round(x·100) — the 0.01 grid) via bigint→string, never via
    float log10 (whose boundary rounding could flip a digit at exact
    powers of ten). Benford is scale-invariant, so digits of x·100
    equal digits of x. χ² terms round to 1e-9 and decimal-sum over
    the 9-row digit table."""
    orders = load_table(spark, sf_dir, "orders")
    vu = F.round(F.col("o_totalprice") * 100).cast("long")
    d = F.substring(vu.cast("string"), 1, 1).cast("int")
    counts = (
        orders.where(F.col("o_totalprice") > 0)
        .groupBy(d.alias("digit"))
        .agg(F.count("*").alias("n_d"))
    )
    tot = counts.agg(F.sum("n_d").alias("n"))
    j = counts.crossJoin(F.broadcast(tot))
    share = F.col("n_d").cast("double") / F.col("n").cast("double")
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    chi2_term = F.round(
        F.col("n").cast("double") * (share - expected) * (share - expected)
        / expected,
        9,
    )
    w = Window.partitionBy()
    return j.select(
        "digit",
        "n_d",
        F.round(share, 6).alias("share"),
        F.round(expected, 6).alias("benford_share"),
        F.round(
            F.sum(chi2_term.cast("decimal(38,9)")).over(w).cast("double"), 6
        ).alias("chi2_total"),
    )


def q_fanout_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join fan-out profile: the distribution of lineitems per order —
    the statistic a planner (or a human) needs before trusting any
    orders ⋈ lineitem estimate (AQE's skew detection reacts to the
    same shape at runtime; this exposes it as data). Two integer
    aggregations: per-order counts, then the count-of-counts
    histogram with each bucket's share of total fact rows."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(F.count("*").alias("fanout"))
    tot = per_order.agg(
        F.count("*").alias("n_orders"), F.sum("fanout").alias("n_rows")
    )
    return (
        per_order.groupBy("fanout")
        .agg(F.count("*").alias("n_orders_at"))
        .crossJoin(F.broadcast(tot))
        .select(
            "fanout",
            "n_orders_at",
            F.round(
                F.col("n_orders_at").cast("double")
                / F.col("n_orders").cast("double"),
                6,
            ).alias("order_share"),
            F.round(
                (F.col("fanout") * F.col("n_orders_at")).cast("double")
                / F.col("n_rows").cast("double"),
                6,
            ).alias("row_share"),
        )
    )


CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-correlation matrix over lineitem's numeric measures —
    the ANALYZE companion to q_column_profile (which columns move
    together feeds both planner CE and feature selection). ONE scan
    computes every moment: each column is lifted to its exact cents
    integer, products stay bigint (≤1e14) and accumulate as
    DECIMAL(38,0) (associative, overflow-free at any row count), and
    all 6 pairwise Pearson r's are single IEEE expressions over those
    exact sums — engine-identical, nothing rounded but the output."""
    li = load_table(spark, sf_dir, "lineitem")
    # r15: aggregates and the 6 Pearson expressions parse from SQL
    # text (the Column fold was ~200 py4j round trips), and the 6
    # per-pair rows EXPLODE from the single 1-row moment aggregate
    # instead of a 6-branch union — same values row for row, one
    # aggregate subtree in the plan instead of six (the branches only
    # converged again at runtime via exchange reuse; the explode form
    # doesn't need the rescue).
    units = {
        c: f"cast(round({c} * 100) as bigint)" for c in CORR_COLS
    }
    aggs = [F.expr("count(*) AS n")]
    for c in CORR_COLS:
        aggs.append(
            F.expr(f"sum(cast({units[c]} as decimal(38,0))) AS s_{c}")
        )
    pairs = [
        (a, b) for i, a in enumerate(CORR_COLS) for b in CORR_COLS[i + 1:]
    ]
    for a, b in pairs + [(c, c) for c in CORR_COLS]:
        aggs.append(
            F.expr(
                f"sum(cast(({units[a]} * {units[b]}) as decimal(38,0)))"
                f" AS p_{a}_{b}"
            )
        )
    m = li.agg(*aggs)

    def corr(a: str, b: str) -> str:
        n = "cast(n as double)"
        sa = f"cast(s_{a} as double)"
        sb = f"cast(s_{b} as double)"
        sab = f"cast(p_{a}_{b} as double)"
        saa = f"cast(p_{a}_{a} as double)"
        sbb = f"cast(p_{b}_{b} as double)"
        return (
            f"({n} * {sab} - {sa} * {sb}) / "
            f"(sqrt({n} * {saa} - {sa} * {sa})"
            f" * sqrt({n} * {sbb} - {sb} * {sb}))"
        )

    structs = ", ".join(
        f"named_struct('col_x', '{a}', 'col_y', '{b}', "
        f"'pearson_r', round({corr(a, b)}, 6))"
        for a, b in pairs
    )
    return m.select(
        F.expr(f"explode(array({structs}))").alias("e"), "n"
    ).select("e.col_x", "e.col_y", "n", "e.pearson_r")


def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE (Pareto frontier) over the per-signal summary tier:
    signals not dominated in (n_samples, max value) — the classic
    multi-criteria operator (Börzsönyi et al. 2001, `SKYLINE OF`)
    answering "which signals are extreme in volume OR amplitude
    without being beaten on both". Dominance: b dominates a iff
    b ≥ a on both axes and b > a on at least one.

    Exactness: both axes are exact integers (count; max cents), so
    the frontier is engine-identical. Scale shape: the dominance
    anti-join is a nested-loop over the per-signal AGGREGATE tier —
    signals-sized, orders of magnitude below the fact scan that
    builds it (the decision-frame discipline of cluster_pairs); the
    fact table contributes one partial-agg pass. At extreme signal
    counts, pre-filter with the sort-first skyline refinement: sort
    by n_samples desc and keep the running max_vu frontier — the
    2-D case is one window pass; the anti-join form here stays the
    general-dimension reference."""
    ev = load_table(spark, sf_dir, "events")
    sig = ev.groupBy("user_id").agg(
        F.count("*").alias("n_samples"),
        F.max(F.round(F.col("value") * 100).cast("long")).alias("max_vu"),
    )
    a, b = sig.alias("a"), sig.alias("b")
    dominated = (
        (F.col("b.n_samples") >= F.col("a.n_samples"))
        & (F.col("b.max_vu") >= F.col("a.max_vu"))
        & (
            (F.col("b.n_samples") > F.col("a.n_samples"))
            | (F.col("b.max_vu") > F.col("a.max_vu"))
        )
    )
    return a.join(b, dominated, "left_anti").select(
        F.col("a.user_id").alias("user_id"),
        F.col("a.n_samples").alias("n_samples"),
        F.col("a.max_vu").alias("max_vu"),
    )


QUERIES = {
    "q_skyline": q_skyline,
    "q_column_profile": q_column_profile,
    "q_fanout_profile": q_fanout_profile,
    "q_corr_matrix": q_corr_matrix,
    "q_gap_days": q_gap_days,
    "q_dq_checks": q_dq_checks,
    "q_psi_drift": q_psi_drift,
    "q_lang_source_mi": q_lang_source_mi,
    "q_benford": q_benford,
}

_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""
        SELECT '{c}' AS "column", count(*) AS n,
               CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_null,
               count(DISTINCT {c}) AS n_distinct,
               CAST(min({c}) AS DOUBLE) AS min_v,
               CAST(max({c}) AS DOUBLE) AS max_v
        FROM lineitem
    """
    for c in PROFILE_COLS
)

_DQ_SQL = f"""
    WITH li AS (
        SELECT count(*) AS total,
               CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS v_null,
               CAST(sum(CASE WHEN NOT (l_quantity BETWEEN {DQ_QTY_LO}
                                  AND {DQ_QTY_HI}) THEN 1 ELSE 0 END)
                 AS BIGINT) AS v_range
        FROM lineitem
    ),
    ord AS (
        SELECT count(*) AS total,
               count(o_orderkey) - count(DISTINCT o_orderkey) AS v_dup,
               CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS v_price
        FROM orders
    ),
    fk AS (
        SELECT count(*) AS v_fk FROM lineitem l
        ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    doc AS (
        SELECT count(*) AS total,
               CAST(sum(CASE WHEN text IS NULL OR length(trim(text)) = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS v_empty
        FROM documents
    )
    SELECT 'lineitem' AS table_name, 'not_null:l_orderkey' AS check_name,
           v_null AS violations, total FROM li
    UNION ALL
    SELECT 'lineitem', 'range:l_quantity[{DQ_QTY_LO},{DQ_QTY_HI}]',
           v_range, total FROM li
    UNION ALL
    SELECT 'lineitem', 'fk:l_orderkey->orders', CAST(v_fk AS BIGINT),
           total FROM fk, li
    UNION ALL
    SELECT 'orders', 'unique:o_orderkey', CAST(v_dup AS BIGINT),
           total FROM ord
    UNION ALL
    SELECT 'orders', 'positive:o_totalprice', v_price, total FROM ord
    UNION ALL
    SELECT 'documents', 'nonempty:text', v_empty, total FROM doc
"""

def _corr_matrix_sql() -> str:
    cols = CORR_COLS
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    u = lambda c: f"CAST(round({c} * 100) AS BIGINT)"  # noqa: E731
    sums = ", ".join(
        [f"count(*) AS n"]
        + [f"sum(CAST({u(c)} AS DECIMAL(38,0))) AS s_{c}" for c in cols]
        + [
            f"sum(CAST({u(a)} * {u(b)} AS DECIMAL(38,0))) AS p_{a}_{b}"
            for a, b in pairs + [(c, c) for c in cols]
        ]
    )
    def corr(a, b):
        return (
            f"(CAST(n AS DOUBLE) * CAST(p_{a}_{b} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
            f" / (sqrt(CAST(n AS DOUBLE) * CAST(p_{a}_{a} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
            f" * sqrt(CAST(n AS DOUBLE) * CAST(p_{b}_{b} AS DOUBLE)"
            f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))"
        )
    selects = [
        f"SELECT '{a}' AS col_x, '{b}' AS col_y, n,"
        f" round({corr(a, b)}, 6) AS pearson_r FROM m"
        for a, b in pairs
    ]
    return f"WITH m AS (SELECT {sums} FROM lineitem)\n" + "\nUNION ALL\n".join(
        selects
    )


ORACLES = {
    "q_skyline": """
        WITH sig AS (
            SELECT user_id, count(*) AS n_samples,
                   max(CAST(round(value * 100) AS BIGINT)) AS max_vu
            FROM events GROUP BY user_id
        )
        SELECT user_id, n_samples, max_vu FROM sig a
        WHERE NOT EXISTS (
            SELECT 1 FROM sig b
            WHERE b.n_samples >= a.n_samples AND b.max_vu >= a.max_vu
              AND (b.n_samples > a.n_samples OR b.max_vu > a.max_vu)
        )
    """,
    "q_corr_matrix": _corr_matrix_sql(),
    "q_fanout_profile": """
        WITH po AS (
            SELECT l_orderkey, count(*) AS fanout
            FROM lineitem GROUP BY l_orderkey
        ),
        t AS (
            SELECT count(*) AS n_orders,
                   CAST(sum(fanout) AS BIGINT) AS n_rows
            FROM po
        )
        SELECT fanout, count(*) AS n_orders_at,
               round(count(*) / CAST(n_orders AS DOUBLE), 6)
                   AS order_share,
               round((fanout * count(*)) / CAST(n_rows AS DOUBLE), 6)
                   AS row_share
        FROM po, t GROUP BY fanout, n_orders, n_rows
    """,
    "q_psi_drift": f"""
        WITH b AS (
            SELECT n_chars // {PSI_BIN_W} AS bin,
                   CAST(count(*) FILTER (source = '{PSI_SRC_E}') AS BIGINT)
                       AS c_e,
                   CAST(count(*) FILTER (source = '{PSI_SRC_A}') AS BIGINT)
                       AS c_a
            FROM documents
            WHERE source IN ('{PSI_SRC_E}', '{PSI_SRC_A}')
            GROUP BY 1
        ),
        t AS (
            SELECT CAST(sum(c_e) AS BIGINT) AS n_e,
                   CAST(sum(c_a) AS BIGINT) AS n_a
            FROM b
        ),
        j AS (
            SELECT bin, c_e, c_a,
                   c_e / CAST(n_e AS DOUBLE) AS pe,
                   c_a / CAST(n_a AS DOUBLE) AS pa
            FROM b, t
        ),
        k AS (
            SELECT bin, c_e, c_a, pe, pa,
                   CASE WHEN c_e > 0 AND c_a > 0
                        THEN round((pa - pe) * ln(pa / pe), 9)
                   END AS psi_term
            FROM j
        )
        SELECT bin, c_e, c_a, round(pe, 6) AS p_e, round(pa, 6) AS p_a,
               psi_term,
               round(CAST(sum(CAST(psi_term AS DECIMAL(38,9))) OVER ()
                          AS DOUBLE), 6) AS psi_total
        FROM k
    """,
    "q_lang_source_mi": """
        WITH cell AS (
            SELECT lang, source, count(*) AS n_ls
            FROM documents GROUP BY lang, source
        ),
        l AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY lang),
        s AS (SELECT source, count(*) AS n_s FROM documents GROUP BY source),
        t AS (SELECT count(*) AS n FROM documents),
        j AS (
            SELECT cell.lang, cell.source, n_ls,
                   (n_ls * CAST(n AS DOUBLE))
                       / (n_l * CAST(n_s AS DOUBLE)) AS ratio,
                   n_ls / CAST(n AS DOUBLE) AS p_ls
            FROM cell
            JOIN l ON cell.lang = l.lang
            JOIN s ON cell.source = s.source
            CROSS JOIN t
        ),
        k AS (
            SELECT lang, source, n_ls,
                   round(ln(ratio), 6) AS pmi,
                   round(p_ls * ln(ratio), 9) AS mi_term
            FROM j
        )
        SELECT lang, source, n_ls, pmi, mi_term,
               round(CAST(sum(CAST(mi_term AS DECIMAL(38,9))) OVER ()
                          AS DOUBLE), 6) AS mi_total
        FROM k
    """,
    "q_benford": """
        WITH c AS (
            SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
                                          AS BIGINT) AS VARCHAR),
                               1, 1) AS INTEGER) AS digit,
                   count(*) AS n_d
            FROM orders WHERE o_totalprice > 0
            GROUP BY 1
        ),
        t AS (SELECT CAST(sum(n_d) AS BIGINT) AS n FROM c),
        j AS (
            SELECT digit, n_d,
                   n_d / CAST(n AS DOUBLE) AS share,
                   log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS expected,
                   CAST(n AS DOUBLE) AS nd
            FROM c, t
        ),
        k AS (
            SELECT digit, n_d, share, expected,
                   round(nd * (share - expected) * (share - expected)
                         / expected, 9) AS chi2_term
            FROM j
        )
        SELECT digit, n_d, round(share, 6) AS share,
               round(expected, 6) AS benford_share,
               round(CAST(sum(CAST(chi2_term AS DECIMAL(38,9))) OVER ()
                          AS DOUBLE), 6) AS chi2_total
        FROM k
    """,
    "q_dq_checks": _DQ_SQL,
    "q_column_profile": _PROFILE_SQL,
    "q_gap_days": """
        WITH active AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ),
        span AS (
            SELECT user_id, min(d) AS d0, max(d) AS d1
            FROM active GROUP BY user_id
        ),
        calendar AS (
            SELECT user_id,
                   CAST(unnest(generate_series(d0, d1,
                        INTERVAL 1 DAY)) AS DATE) AS d
            FROM span
        )
        SELECT c.user_id, CAST(c.d AS TIMESTAMP) AS gap_day
        FROM calendar c
        ANTI JOIN active a ON a.user_id = c.user_id AND a.d = c.d
    """,
}
