package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{GraftQuery, Tables}

/** Relational operator suite — scans, projections/filters, aggregations,
  * joins, window functions, sorts/top-k, set ops, sampling (SURVEY.md
  * §2.1-2.8, §2.10). Everything is declarative DataFrame API so Catalyst
  * handles pushdown, pruning, partial aggregation and join-strategy choice;
  * small dimension tables are broadcast explicitly.
  *
  * All float outputs are rounded in BOTH the Spark query and the DuckDB
  * oracle so sum-order differences can't flip the hash compare.
  */
object Relational {

  /** Pricing summary: scan + filter + hash agg with partial (map-side)
    * aggregation. Covers S1/S4 (parquet scan), P5 (predicate), A1/A5.
    * Mirrors the reference's groupwise count/mean EDA
    * (reference: app/EDA_proprocess.ipynb cells 7,15). */
  val q01PricingSummary = GraftQuery(
    "q01_pricing_summary",
    "S1,S4,P5,A1,A5",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity), 2) AS sum_qty,
      round(sum(l_extendedprice), 2) AS sum_base_price,
      round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      round(avg(l_quantity), 4) AS avg_qty,
      round(avg(l_discount), 6) AS avg_disc,
      count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** Forecast-revenue filter: tight range predicates all pushed to the
    * parquet scan; single global agg. Covers P5, predicate pushdown (§4). */
  val q02FilterRevenue = GraftQuery(
    "q02_filter_revenue",
    "P5,P8,A1",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(
          round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("n_rows"))
    },
    Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
      count(*) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""))

  /** Multi-way star join: fact (lineitem) ⋈ orders ⋈ customer ⋈ nation ⋈
    * region with the dimension side broadcast. Covers J3/J5 (lookup joins),
    * A1. At 100 TB the fact side stays shuffle-free for nation/region
    * (broadcast); lineitem⋈orders co-partitions on orderkey. */
  val q03JoinRevenueByNation = GraftQuery(
    "q03_join_revenue_by_nation",
    "J3,J5,A1",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    },
    Some("""SELECT n_name,
      round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name ORDER BY n_name"""))

  /** Per-group top-k via window ranking — THE reference pattern (Faiss
    * returns k best per query, reference: app/vector_search.py:182-184).
    * Covers T3, T5, §2.10 window surface. */
  val q04TopkPerGroup = GraftQuery(
    "q04_topk_per_group",
    "T3,T5",
    (s, d) => {
      val o = Tables.orders(s, d).join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("c_mktsegment"), col("rank"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("c_mktsegment"), col("rank"))
    },
    Some("""SELECT c_mktsegment, rank, o_orderkey, round(o_totalprice, 2) AS o_totalprice
      FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY c_mktsegment
            ORDER BY o_totalprice DESC, o_orderkey) AS rank
        FROM orders JOIN customer ON o_custkey = c_custkey) t
      WHERE rank <= 3 ORDER BY c_mktsegment, rank"""))

  /** Global sort + limit (reference: app/main.py:270,275 sort desc + head).
    * Covers T1, T2, T4. Range-partitioned sort; limit is pushed into a
    * TakeOrderedAndProject at the physical level — no full sort at scale. */
  val q05SortLimit = GraftQuery(
    "q05_sort_limit",
    "T1,T2,T4",
    (s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .limit(10),
    Some("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""))

  /** Null handling: inject nulls (nullif), count them, fill them
    * (reference: app/preprocess_data.py:37-54 fillna/dropna). Covers
    * P3, P4, A2. */
  val q06NullHandling = GraftQuery(
    "q06_null_handling",
    "P3,P4,A2",
    (s, d) => {
      val c = Tables.customer(s, d)
        // negative balances -> null, then fill with 0.0 ('Unknown' analogue)
        .withColumn("bal_or_null",
          when(col("c_acctbal") < 0, lit(null).cast("double")).otherwise(col("c_acctbal")))
      c.groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("bal_or_null").isNull.cast("long")).as("n_null"),
          count(col("bal_or_null")).as("n_not_null"),
          round(sum(coalesce(col("bal_or_null"), lit(0.0))), 2).as("sum_filled"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment,
      count(*) AS n_rows,
      CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      count(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END) AS n_not_null,
      round(sum(CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END), 2) AS sum_filled
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** String scalar functions over part: lower/upper/trim/regexp_replace/
    * length/concat (reference: app/preprocess_data.py:78-99, F2-F8). All
    * codegen'd builtins — no UDF. Systematic key filter keeps output small. */
  val q07StringFuncs = GraftQuery(
    "q07_string_funcs",
    "F2,F3,F5,F6,F7,F8,P1,P2",
    (s, d) =>
      Tables.part(s, d)
        .filter(col("p_partkey") % 10 === 0)
        .select(
          col("p_partkey"),
          lower(col("p_name")).as("name_lc"),
          upper(col("p_brand")).as("brand_uc"),
          trim(regexp_replace(col("p_name"), "\\s+", " ")).as("name_norm"),
          regexp_replace(col("p_brand"), "#\\d+$", "").as("brand_stripped"),
          length(col("p_name")).as("name_len"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
        .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey,
      lower(p_name) AS name_lc,
      upper(p_brand) AS brand_uc,
      trim(regexp_replace(p_name, '\s+', ' ', 'g')) AS name_norm,
      regexp_replace(p_brand, '#\d+$', '') AS brand_stripped,
      length(p_name) AS name_len,
      concat_ws('|', p_brand, p_type) AS brand_type
      FROM part WHERE p_partkey % 10 = 0 ORDER BY p_partkey"""))

  /** Date functions + time-grouped aggregation (reference considered but
    * commented out datetime conversion — notebook cell 20; F14 to_timestamp).
    * Covers F14, A1, A3. */
  val q08DateAgg = GraftQuery(
    "q08_date_agg",
    "F14,A1,A3",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .agg(
          count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total"),
          round(avg(col("o_totalprice")), 4).as("avg_price"))
        .orderBy(col("ym")),
    Some("""SELECT strftime(o_orderdate, '%Y-%m') AS ym,
      count(*) AS n_orders,
      round(sum(o_totalprice), 2) AS total,
      round(avg(o_totalprice), 4) AS avg_price
      FROM orders GROUP BY 1 ORDER BY 1"""))

  /** Summary statistics: min/max/avg/stddev + exact interpolated percentiles
    * (reference: describe()/quantile, notebook cells 7/15; A5, A6). */
  val q09StatsSummary = GraftQuery(
    "q09_stats_summary",
    "A5,A6,A7",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          round(min(col("l_extendedprice")), 2).as("min_price"),
          round(max(col("l_extendedprice")), 2).as("max_price"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(stddev_samp(col("l_extendedprice")), 4).as("std_price"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median_price"),
          round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99_price"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
      count(*) AS n,
      round(min(l_extendedprice), 2) AS min_price,
      round(max(l_extendedprice), 2) AS max_price,
      round(avg(l_extendedprice), 4) AS avg_price,
      round(stddev_samp(l_extendedprice), 4) AS std_price,
      round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
      round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Distributed histogram binning (reference: app/evaluation.py:222 50-bin
    * histplot computed at driver; here the binning is a hash agg). A8. */
  val q10Histogram = GraftQuery(
    "q10_histogram",
    "A8",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(floor(col("value") / 25).cast("int").as("bin"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bin")),
    Some("""SELECT CAST(floor(value / 25) AS INT) AS bin, count(*) AS n
      FROM events GROUP BY 1 ORDER BY 1"""))

  /** value_counts top-N with deterministic tie-break (reference: notebook
    * cell 13 value_counts().head(20); A3, A7 mode). */
  val q11ValueCounts = GraftQuery(
    "q11_value_counts",
    "A3,A7,T2",
    (s, d) =>
      Tables.part(s, d)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("p_brand"))
        .limit(10),
    Some("""SELECT p_brand, count(*) AS n FROM part
      GROUP BY p_brand ORDER BY n DESC, p_brand LIMIT 10"""))

  /** Exact distinct counts, single pass (reference: describe unique row,
    * notebook cell 7; A4). approx_count_distinct is exercised in tests (its
    * HLL estimate is engine-specific, so not oracle-comparable). */
  val q12DistinctCounts = GraftQuery(
    "q12_distinct_counts",
    "A4,A10",
    (s, d) =>
      Tables.lineitem(s, d)
        .agg(
          countDistinct(col("l_orderkey")).as("d_orders"),
          countDistinct(col("l_partkey")).as("d_parts"),
          countDistinct(col("l_suppkey")).as("d_supps"),
          count(lit(1)).as("n_rows")),
    Some("""SELECT count(DISTINCT l_orderkey) AS d_orders,
      count(DISTINCT l_partkey) AS d_parts,
      count(DISTINCT l_suppkey) AS d_supps,
      count(*) AS n_rows FROM lineitem"""))

  /** Deterministic systematic sample — the oracle-comparable stand-in for
    * the reference's unseeded random.sample (app/main.py:213-218; X1, X2).
    * Seeded df.sample(...) is exercised in ScalaTest (engine-specific RNG). */
  val q13SystematicSample = GraftQuery(
    "q13_systematic_sample",
    "X1,X2",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 500 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          round(col("l_extendedprice"), 2).as("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity,
      round(l_extendedprice, 2) AS l_extendedprice
      FROM lineitem WHERE l_orderkey % 500 = 0
      ORDER BY l_orderkey, l_linenumber"""))

  /** Union + distinct (reference: pd.concat + list(set(a+b)),
    * app/evaluation.py:208-218, app/fetech_jd.py:85; X4, X5). */
  val q14UnionDistinct = GraftQuery(
    "q14_union_distinct",
    "X4,X5",
    (s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_nationkey").as("nationkey")).withColumn("side", lit("customer"))
      val sup = Tables.supplier(s, d)
        .select(col("s_nationkey").as("nationkey")).withColumn("side", lit("supplier"))
      c.unionByName(sup).distinct().orderBy(col("nationkey"), col("side"))
    },
    Some("""SELECT DISTINCT * FROM (
        SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier)
      ORDER BY nationkey, side"""))

  /** Intersect / except set ops (absent in the reference; declared in-scope
    * per SURVEY §2.8 "free via intersect/except"). */
  val q15SetOps = GraftQuery(
    "q15_set_ops",
    "X5",
    (s, d) => {
      val cn = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sn = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      val both = cn.intersect(sn).withColumn("which", lit("both"))
      val custOnly = cn.except(sn).withColumn("which", lit("customer_only"))
      both.unionByName(custOnly).orderBy(col("which"), col("nationkey"))
    },
    Some("""SELECT * FROM (
        SELECT nationkey, 'both' AS which FROM
          (SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT nationkey, 'customer_only' AS which FROM
          (SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier))
      ORDER BY which, nationkey"""))

  /** Anti join — customers with no orders (dedup D1 ≈ anti-join in spirit,
    * SURVEY §2.6; NOT EXISTS surface). */
  val q16AntiJoin = GraftQuery(
    "q16_anti_join",
    "J1c-adjacent,D1",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      ORDER BY c_custkey"""))

  /** Semi join — suppliers that ship any high-quantity line (EXISTS). */
  val q17SemiJoin = GraftQuery(
    "q17_semi_join",
    "J1c-adjacent",
    (s, d) => {
      val sup = Tables.supplier(s, d)
      val li = Tables.lineitem(s, d).filter(col("l_quantity") >= 49)
      sup.join(li, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    },
    Some("""SELECT s_suppkey, s_name FROM supplier
      WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity >= 49)
      ORDER BY s_suppkey"""))

  /** Window analytics: row_number + lag + running sum per partition
    * (§2.10 window surface beyond T3's ranking). Events ordered by time. */
  val q18WindowAnalytics = GraftQuery(
    "q18_window_analytics",
    "T3,window",
    (s, d) => {
      val ev = Tables.events(s, d).filter(col("user_id") < 10)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev.select(
          col("user_id"), col("event_id"), col("event_type"),
          row_number().over(w).as("rn"),
          round(sum(col("value")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running_value"),
          lag(col("event_type"), 1).over(w).as("prev_type"))
        .orderBy(col("user_id"), col("rn"))
    },
    Some("""SELECT user_id, event_id, event_type,
      row_number() OVER w AS rn,
      round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
      lag(event_type, 1) OVER w AS prev_type
      FROM events WHERE user_id < 10
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, rn"""))

  /** Rollup over region -> nation customer counts (grouping-set surface,
    * SURVEY §2.5 "cube/rollup come free"). */
  val q19Rollup = GraftQuery(
    "q19_rollup",
    "A1,rollup",
    (s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("c_acctbal")), 2).as("sum_bal"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    },
    Some("""SELECT r_name, n_name, count(*) AS n_customers,
      round(sum(c_acctbal), 2) AS sum_bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY r_name NULLS FIRST, n_name NULLS FIRST"""))

  /** Pivot: event_type -> columns per user (the reference's wide
    * qualitative-report pivot, app/evaluation.py:133-171; §3.2 mapping). */
  val q20Pivot = GraftQuery(
    "q20_pivot",
    "report-pivot,A3",
    (s, d) =>
      Tables.events(s, d)
        .filter(col("user_id") < 25)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy(col("user_id")),
    Some("""SELECT user_id,
      CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
      CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
      CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
      CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
      CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
      FROM events WHERE user_id < 25 GROUP BY user_id ORDER BY user_id"""))

  /** Self range-join with canonicalized pair output (the reference's
    * canonical (min,max) pair construction, app/main.py:253-263; D4).
    * Equi-join prefilter on nationkey keeps the theta predicate cheap —
    * same shape as the IVF centroid prefilter in Similarity. */
  val q21PairCanon = GraftQuery(
    "q21_pair_canon",
    "D4,J1c",
    (s, d) => {
      val a = Tables.customer(s, d).select(
        col("c_custkey").as("k1"), col("c_nationkey").as("nk1"), col("c_acctbal").as("b1"))
      val b = Tables.customer(s, d).select(
        col("c_custkey").as("k2"), col("c_nationkey").as("nk2"), col("c_acctbal").as("b2"))
      a.join(b, col("nk1") === col("nk2") && col("k1") < col("k2"))
        .filter(abs(col("b1") - col("b2")) < 1.0)
        .select(
          least(col("k1"), col("k2")).as("id1"),
          greatest(col("k1"), col("k2")).as("id2"),
          round(abs(col("b1") - col("b2")), 2).as("bal_diff"))
        .orderBy(col("id1"), col("id2"))
    },
    Some("""SELECT least(a.c_custkey, b.c_custkey) AS id1,
      greatest(a.c_custkey, b.c_custkey) AS id2,
      round(abs(a.c_acctbal - b.c_acctbal), 2) AS bal_diff
      FROM customer a JOIN customer b
        ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
      WHERE abs(a.c_acctbal - b.c_acctbal) < 1.0
      ORDER BY id1, id2"""))

  /** Binned range join: points `x` against intervals `[lo, hi]` without a
    * theta join. Points map to the single width-sized bucket containing x;
    * each interval replicates to every bucket it overlaps
    * (`sequence(floor(lo/w), floor(hi/w))` — replication factor is
    * `len/w + 1`, bounded when interval length is bounded); the join is a
    * plain hash equi-join on the bucket id, and the exact range predicate
    * re-verifies candidates. This is the standard scale plan for an
    * operator Spark has no native physical strategy for: a naive
    * `a.join(b, x.between(lo, hi))` plans as BroadcastNestedLoopJoin
    * (O(|a|·|b|) comparisons) which is a non-starter at 10^10 rows —
    * PlanSpec asserts the binned form contains no nested-loop or
    * cartesian operator. Same candidates-then-verify shape as the LSH
    * bucket join (Ann) and the shingle-band join (Dedup). */
  def rangeJoinBinned(
      points: DataFrame,
      intervals: DataFrame,
      x: Column,
      lo: Column,
      hi: Column,
      width: Double): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val pts = points.withColumn("__bucket", floor(x / lit(width)).cast("long"))
    val ivs = intervals.withColumn("__bucket",
      explode(sequence(floor(lo / lit(width)).cast("long"),
        floor(hi / lit(width)).cast("long"))))
    pts.join(ivs, Seq("__bucket")).filter(x >= lo && x <= hi).drop("__bucket")
  }

  /** q88: range join — customers whose account balance falls inside each
    * supplier's ±50 band (the value-proximity matching shape; the time
    * form is identical with ts buckets). Interval length is fixed (100)
    * and equals the bucket width, so each interval lands in ≤ 2 buckets
    * and candidate volume is ~2·|supplier| join fan-in, not
    * |supplier|·|customer|. */
  val q88RangeJoin = GraftQuery(
    "q88_range_join",
    "J-ext: binned range join (no NestedLoop); P5",
    (s, d) => {
      val pts = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_acctbal"))
      val ivs = Tables.supplier(s, d).select(
        col("s_suppkey"),
        (col("s_acctbal") - 50).as("lo"),
        (col("s_acctbal") + 50).as("hi"))
      rangeJoinBinned(pts, ivs, col("c_acctbal"), col("lo"), col("hi"), 100.0)
        .groupBy(col("s_suppkey"))
        .agg(
          count(lit(1)).as("n_matches"),
          // sum, not avg: 2-decimal inputs sum ONTO the 0.01 grid (never
          // near a rounding boundary), while avg divides onto a finer grid
          // where cross-engine accumulation order flipped the last cent
          round(sum(col("c_acctbal")), 2).as("sum_match_bal"))
        .orderBy(col("s_suppkey"))
    },
    Some("""SELECT s_suppkey, count(*) AS n_matches,
      round(sum(c_acctbal), 2) AS sum_match_bal
      FROM supplier JOIN customer
        ON c_acctbal >= s_acctbal - 50 AND c_acctbal <= s_acctbal + 50
      GROUP BY s_suppkey ORDER BY s_suppkey"""))

  /** q90: bivariate statistics — Pearson correlation, sample covariance,
    * sample stddev per group (one pass, partial-aggregatable moments; the
    * corpus-profiling stats a mixture designer reads before weighting
    * sources). Rounding is coarse enough that cross-engine accumulation
    * order can't flip the hash. */
  val q90CorrStats = GraftQuery(
    "q90_corr_stats",
    "A5-ext: corr/covar/stddev moments",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_corr"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 1).as("qty_price_covar"),
          round(stddev_samp(col("l_quantity")), 4).as("qty_stddev"),
          round(stddev_samp(col("l_extendedprice")), 2).as("price_stddev"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
      round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
      round(covar_samp(l_quantity, l_extendedprice), 1) AS qty_price_covar,
      round(stddev_samp(l_quantity), 4) AS qty_stddev,
      round(stddev_samp(l_extendedprice), 2) AS price_stddev,
      count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** q91: GROUPING SETS — the two one-dimensional marginals plus the
    * grand total in ONE scan (rollup/cube's general form; q19/q74 cover
    * those). Group keys are coalesced to '(all)' so the ordering is
    * engine-independent (Spark sorts nulls first, DuckDB last), and the
    * grouping() indicators disambiguate a real '(all)' value. Executes as
    * a single Expand + hash aggregate — one shuffle for all three
    * granularities, which at 100 TB replaces three separate scans. */
  val q91GroupingSets = GraftQuery(
    "q91_grouping_sets",
    "A-ext: grouping sets lattice",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("long").as("g_rf"),
          grouping(col("l_linestatus")).cast("long").as("g_ls"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
          col("g_rf"), col("g_ls"), col("sum_qty"), col("n"))
        .orderBy(col("returnflag"), col("linestatus"), col("g_rf"), col("g_ls")),
    Some("""SELECT coalesce(l_returnflag, '(all)') AS returnflag,
      coalesce(l_linestatus, '(all)') AS linestatus,
      CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
      CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
      round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY returnflag, linestatus, g_rf, g_ls"""))

  /** q97: unpivot/melt — the inverse of q20's pivot: wide per-status
    * metric columns back to (status, metric, value) long form (the
    * reshape a metrics store or plotting sink wants). Spark's native
    * unpivot is an Expand — a projection, zero shuffle beyond the
    * feeding aggregate. */
  val q97Unpivot = GraftQuery(
    "q97_unpivot",
    "A-ext: unpivot/melt (inverse pivot)",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          round(sum(col("l_discount")), 2).as("sum_disc"))
        .unpivot(
          Array(col("l_linestatus")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "metric", "val")
        .orderBy(col("l_linestatus"), col("metric")),
    Some("""WITH wide AS (
        SELECT l_linestatus,
          round(sum(l_quantity), 2) AS sum_qty,
          round(sum(l_extendedprice), 2) AS sum_price,
          round(sum(l_discount), 2) AS sum_disc
        FROM lineitem GROUP BY 1)
      SELECT l_linestatus, metric, val
      FROM wide UNPIVOT (val FOR metric IN (sum_qty, sum_price, sum_disc))
      ORDER BY l_linestatus, metric"""))

  /** q98: distribution-rank window family — dense_rank, percent_rank,
    * cume_dist, ntile(4) per order priority (completes the §2.10 window
    * surface next to q18's row_number/lag/frames and q04's top-k).
    * percent_rank/cume_dist are single IEEE divisions of exact integers
    * — bit-stable cross-engine (no accumulation, no transcendentals);
    * the (totalprice desc, orderkey) order is total so every rank is
    * deterministic. */
  val q98RankFamily = GraftQuery(
    "q98_rank_family",
    "T5-ext: dense_rank/percent_rank/cume_dist/ntile",
    (s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .filter(col("o_custkey") < 100)
        .select(
          col("o_orderpriority"), col("o_orderkey"),
          dense_rank().over(w).cast("long").as("drank"),
          round(percent_rank().over(w), 6).as("prank"),
          round(cume_dist().over(w), 6).as("cdist"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
    },
    Some("""SELECT o_orderpriority, o_orderkey,
      dense_rank() OVER w AS drank,
      round(percent_rank() OVER w, 6) AS prank,
      round(cume_dist() OVER w, 6) AS cdist,
      CAST(ntile(4) OVER w AS BIGINT) AS quartile
      FROM orders WHERE o_custkey < 100
      WINDOW w AS (PARTITION BY o_orderpriority
        ORDER BY o_totalprice DESC, o_orderkey)
      ORDER BY o_orderpriority, o_orderkey"""))

  /** q99: declarative constraint audit (the Deequ/Great-Expectations
    * shape): each constraint is one aggregate over its table — uniqueness
    * as count−distinct, domain/range/consistency as filtered counts —
    * union'd into a (table, constraint, n_violations) report. Every check
    * is a partial-aggregatable scan: the whole audit is one pass per
    * table at 100 TB, and a constraint on a partition column prunes to
    * the partitions it names. Mixes hard invariants (expected 0) with
    * policy gates (expected >0) so the report shape is exercised both
    * ways. */
  val q99ConstraintAudit = GraftQuery(
    "q99_constraint_audit",
    "A-ext: data-quality constraint audit",
    (s, d) => {
      val o = Tables.orders(s, d)
      val docs = Tables.documents(s, d)
      def report(tbl: String, c: String, v: DataFrame): DataFrame =
        v.select(lit(tbl).as("tbl"), lit(c).as("constraint_name"),
          col("v").cast("long").as("n_violations"))
      report("orders", "orderkey_unique",
          o.agg((count(col("o_orderkey")) - countDistinct(col("o_orderkey"))).as("v")))
        .unionByName(report("orders", "totalprice_nonneg",
          o.agg(count(when(col("o_totalprice") < 0, 1)).as("v"))))
        .unionByName(report("orders", "orderdate_not_null",
          o.agg(count(when(col("o_orderdate").isNull, 1)).as("v"))))
        .unionByName(report("documents", "doc_id_unique",
          docs.agg((count(col("doc_id")) - countDistinct(col("doc_id"))).as("v"))))
        .unionByName(report("documents", "n_chars_consistent",
          docs.agg(count(when(length(col("text")) =!= col("n_chars"), 1)).as("v"))))
        .unionByName(report("documents", "lang_in_latin_domain",
          docs.agg(count(when(!col("lang").isin("en", "es", "fr", "de"), 1)).as("v"))))
        .unionByName(report("documents", "min_length_policy",
          docs.agg(count(when(col("n_chars") < 100, 1)).as("v"))))
        .orderBy(col("tbl"), col("constraint_name"))
    },
    Some("""SELECT 'orders' AS tbl, 'orderkey_unique' AS constraint_name,
        CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations FROM orders
      UNION ALL SELECT 'orders', 'totalprice_nonneg',
        CAST(count(CASE WHEN o_totalprice < 0 THEN 1 END) AS BIGINT) FROM orders
      UNION ALL SELECT 'orders', 'orderdate_not_null',
        CAST(count(CASE WHEN o_orderdate IS NULL THEN 1 END) AS BIGINT) FROM orders
      UNION ALL SELECT 'documents', 'doc_id_unique',
        CAST(count(doc_id) - count(DISTINCT doc_id) AS BIGINT) FROM documents
      UNION ALL SELECT 'documents', 'n_chars_consistent',
        CAST(count(CASE WHEN length(text) <> n_chars THEN 1 END) AS BIGINT) FROM documents
      UNION ALL SELECT 'documents', 'lang_in_latin_domain',
        CAST(count(CASE WHEN lang NOT IN ('en','es','fr','de') THEN 1 END) AS BIGINT) FROM documents
      UNION ALL SELECT 'documents', 'min_length_policy',
        CAST(count(CASE WHEN n_chars < 100 THEN 1 END) AS BIGINT) FROM documents
      ORDER BY tbl, constraint_name"""))

  /** q103: sketch aggregates — HyperLogLog++ distinct and t-digest-style
    * approximate percentiles next to their exact forms. At 100 TB these
    * are THE way to answer cardinality/quantile questions: both are
    * partial-aggregatable fixed-size sketches (KB per group, merged on
    * the reduce side), where exact distinct shuffles every key and an
    * exact percentile sorts the column. No DuckDB oracle — sketch
    * estimates are implementation-specific — so the gate is a ScalaTest
    * error-bound spec (OperatorSpec): HLL within 3× its configured rsd of
    * the exact count, percentiles within 5% of exact, both computed here
    * side-by-side so the gate is self-contained in the output. */
  val q103SketchAgg = GraftQuery(
    "q103_sketch_agg",
    "A-ext: approx_count_distinct (HLL++) + approx percentile sketches",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_orderkey"), rsd = 0.02)
            .as("approx_orders"),
          countDistinct(col("l_orderkey")).as("exact_orders"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(2000))
            .as("approx_p50"),
          expr("percentile(l_extendedprice, 0.5)").as("exact_p50"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(2000))
            .as("approx_p95"),
          expr("percentile(l_extendedprice, 0.95)").as("exact_p95"))
        .orderBy(col("l_returnflag")),
    None)

  /** q105: k-anonymity audit — equivalence classes over the
    * quasi-identifier tuple (nation, market segment, account-balance
    * band) with class size and a `risky` flag for classes below k=5: the
    * re-identification check run before releasing any person-derived
    * table. One hash aggregate (partial-agg friendly, shuffle bounded by
    * distinct QI tuples), so the audit is a single pass at any scale;
    * pairs with q101's PII scrub (column-level) as the row-level half of
    * the governance surface. */
  val q105KAnonymity = GraftQuery(
    "q105_k_anonymity",
    "A-ext: k-anonymity equivalence-class audit (governance)",
    (s, d) =>
      Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 2000.0).cast("long").as("bal_band"))
        .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"))
        .agg(count(lit(1)).as("class_size"))
        .withColumn("risky", (col("class_size") < 5).cast("int"))
        .orderBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band")),
    Some("""SELECT c_nationkey, c_mktsegment,
        CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS bal_band,
        count(*) AS class_size,
        CAST(count(*) < 5 AS INT) AS risky
      FROM customer
      GROUP BY 1, 2, 3
      ORDER BY c_nationkey, c_mktsegment, bal_band"""))

  /** q114: SCD2 interval derivation — compact a change log (each
    * customer's orders, ordered by date) into slowly-changing-dimension
    * type-2 history: a new version row only where the tracked attribute
    * actually changes; effective_from/effective_to from lead(); open
    * intervals flagged current. Two window passes over ONE partitioning
    * (custkey) = one shuffle total; at 100 TB custkey is high-cardinality
    * so the sort is per-key tiny. Tie-break on (date, orderkey) makes
    * every interval deterministic cross-engine. */
  val q114Scd2 = GraftQuery(
    "q114_scd2",
    "§2.10 ext: SCD2 history compaction (change-log -> intervals)",
    (s, d) => {
      val wSeq = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val changes = Tables.orders(s, d)
        .filter(col("o_custkey") < 200)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority").as("prio"))
        .withColumn("prev", lag(col("prio"), 1).over(wSeq))
        .filter(col("prev").isNull || col("prev") =!= col("prio"))
      changes
        .withColumn("effective_to", lead(col("o_orderdate"), 1).over(wSeq))
        .select(col("o_custkey"), col("prio"),
          col("o_orderdate").as("effective_from"), col("effective_to"),
          col("effective_to").isNull.cast("int").as("is_current"))
        .orderBy(col("o_custkey"), col("effective_from"))
    },
    Some("""WITH log AS (
        SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority AS prio,
          lag(o_orderpriority) OVER w AS prev
        FROM orders WHERE o_custkey < 200
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      changes AS (
        SELECT o_custkey, o_orderkey, o_orderdate, prio FROM log
        WHERE prev IS NULL OR prev <> prio)
      SELECT o_custkey, prio, o_orderdate AS effective_from,
        lead(o_orderdate) OVER w AS effective_to,
        CAST(lead(o_orderdate) OVER w IS NULL AS INT) AS is_current
      FROM changes
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, effective_from"""))

  /** q115: star join — lineitem fact against orders and the two true
    * dimensions (customer, nation) rolled up by nation and return flag.
    * The plan that must come out at 100 TB: customer/nation broadcast
    * (MBs after pruning), but orders is the SECOND-LARGEST table
    * (~25 TB at the 100 TB scale) — it must NOT carry a broadcast hint;
    * lineitem⋈orders is a shuffle join on the orderkey (co-located and
    * shuffle-free when both are bucketed by it, Scale.writeBucketed),
    * and Catalyst prunes orders down to (o_orderkey, o_custkey) before
    * the exchange. PlanSpec pins exactly this shape with auto-broadcast
    * disabled: one SortMergeJoin on the orderkey, two broadcasts. */
  val q115StarJoin = GraftQuery(
    "q115_star_join",
    "J-ext: star-schema join (broadcast dims, shuffle fact-fact)",
    (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy(col("n_name"), col("l_returnflag")),
    Some("""SELECT n_name, l_returnflag, count(*) AS n,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** q116: table statistics collection — the ANALYZE TABLE shape: one
    * partial-aggregatable pass per table computing rows, per-column
    * null counts, min/max, and HLL distinct estimates (exact distincts
    * here so the DuckDB oracle can hash-match; swap count_distinct for
    * approx_count_distinct at 100 TB — q103 gates that estimator). These
    * are the inputs a cost-based optimizer needs for join reordering and
    * broadcast decisions; emitting them as a relation makes stats a
    * queryable artifact instead of a catalog side effect. */
  val q116TableStats = GraftQuery(
    "q116_table_stats",
    "A-ext: ANALYZE-style column statistics relation",
    (s, d) => {
      def stats(tbl: String, df: DataFrame, c: String): DataFrame =
        df.agg(
          count(lit(1)).as("n_rows"),
          count(when(col(c).isNull, 1)).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_v"),
          max(col(c)).cast("string").as("max_v"))
          .select(lit(tbl).as("tbl"), lit(c).as("col_name"),
            col("n_rows"), col("n_null"), col("n_distinct"),
            col("min_v"), col("max_v"))
      val o = Tables.orders(s, d)
      val docs = Tables.documents(s, d)
      stats("orders", o, "o_custkey")
        .unionByName(stats("orders", o, "o_orderpriority"))
        .unionByName(stats("documents", docs, "lang"))
        .unionByName(stats("documents", docs, "n_chars"))
        .orderBy(col("tbl"), col("col_name"))
    },
    Some("""SELECT 'orders' AS tbl, 'o_custkey' AS col_name,
        count(*) AS n_rows,
        CAST(count(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT) AS n_null,
        CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
        CAST(min(o_custkey) AS VARCHAR) AS min_v, CAST(max(o_custkey) AS VARCHAR) AS max_v
      FROM orders
      UNION ALL
      SELECT 'orders', 'o_orderpriority', count(*),
        CAST(count(CASE WHEN o_orderpriority IS NULL THEN 1 END) AS BIGINT),
        CAST(count(DISTINCT o_orderpriority) AS BIGINT),
        min(o_orderpriority), max(o_orderpriority)
      FROM orders
      UNION ALL
      SELECT 'documents', 'lang', count(*),
        CAST(count(CASE WHEN lang IS NULL THEN 1 END) AS BIGINT),
        CAST(count(DISTINCT lang) AS BIGINT), min(lang), max(lang)
      FROM documents
      UNION ALL
      SELECT 'documents', 'n_chars', count(*),
        CAST(count(CASE WHEN n_chars IS NULL THEN 1 END) AS BIGINT),
        CAST(count(DISTINCT n_chars) AS BIGINT),
        CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
      FROM documents
      ORDER BY tbl, col_name"""))

  /** q122: map-side bounded top-k per group via the typed
    * [[graft.functions.TopKAggregator]] — same answer as q04's window
    * row_number form (the oracle IS that window query), radically
    * different plan: partial ObjectHashAggregate heaps per map task →
    * Exchange of k rows per (group, partition) → final merge. The window
    * form shuffles and sorts every row of every group; this shuffles
    * k×groups×partitions rows and sorts nothing (PlanSpec asserts the
    * partial/final split). The scale default for top-k per group. */
  val q122TopkAggregator = GraftQuery(
    "q122_topk_aggregator",
    "T3/§2.10 UDAF: partial-aggregatable bounded top-k per group",
    (s, d) => {
      val topk = udaf(new graft.functions.TopKAggregator(3))
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
        .select(col("o_orderpriority"), posexplode(col("top")))
        .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rank"),
          round(col("col._1"), 2).as("o_totalprice"), col("col._2").as("o_orderkey"))
        .orderBy(col("o_orderpriority"), col("rank"))
    },
    Some("""WITH ranked AS (
        SELECT o_orderpriority, o_totalprice, o_orderkey,
          row_number() OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice DESC, o_orderkey) AS rank
        FROM orders)
      SELECT o_orderpriority, CAST(rank AS BIGINT) AS rank,
        round(o_totalprice, 2) AS o_totalprice, o_orderkey
      FROM ranked WHERE rank <= 3
      ORDER BY o_orderpriority, rank"""))

  /** q126: the SAME range join q88 bins by hand — written naively
    * (BETWEEN, no equi key, the shape Spark plans as an O(N·M)
    * BroadcastNestedLoopJoin) and made scale-safe automatically by
    * [[graft.plans.RangeJoinRule]]: the injected optimizer rule bins the
    * point side and explodes the interval side's bin range into an
    * equi-key, keeping the original predicate as the exactness filter.
    * The fn asserts the rewrite happened (a regression fails loudly, not
    * silently-quadratic) and restores the width conf after forcing
    * optimization, so the rule stays scoped to this query. Band ±40 /
    * width 80 ⇒ ≤ 2 bins per interval, same candidate bound as q88. */
  val q126AutoRangeJoin = GraftQuery(
    "q126_auto_range_join",
    "J-ext: optimizer-rule auto-binned range join (RangeJoinRule)",
    (s, d) => {
      graft.plans.RangeJoinRule.install(s)
      val prev = s.conf.get(graft.plans.RangeJoinRule.widthKey, "0")
      s.conf.set(graft.plans.RangeJoinRule.widthKey, "80.0")
      try {
        val pts = Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal"))
        val ivs = Tables.supplier(s, d).select(
          col("s_suppkey"),
          (col("s_acctbal") - 40).as("lo"),
          (col("s_acctbal") + 40).as("hi"))
        val df = pts
          .join(ivs, col("c_acctbal") >= col("lo") && col("c_acctbal") <= col("hi"))
          .groupBy(col("s_suppkey"))
          .agg(count(lit(1)).as("n_matches"),
            round(sum(col("c_acctbal")), 2).as("sum_match_bal"))
          .orderBy(col("s_suppkey"))
        // force optimization NOW (memoized on the QueryExecution) so the
        // width conf can be restored before the caller executes the plan
        val optimized = df.queryExecution.optimizedPlan.toString
        require(optimized.contains("__graft_bin"),
          "RangeJoinRule did not fire — naive range join would run as a nested loop")
        df
      } finally s.conf.set(graft.plans.RangeJoinRule.widthKey, prev)
    },
    Some("""SELECT s_suppkey, count(*) AS n_matches,
      round(sum(c_acctbal), 2) AS sum_match_bal
      FROM supplier JOIN customer
        ON c_acctbal >= s_acctbal - 40 AND c_acctbal <= s_acctbal + 40
      GROUP BY s_suppkey ORDER BY s_suppkey"""))

  /** q160: the interval-OVERLAP companion of q126 — two interval
    * relations, no equi-key, no shared point (`a.lo <= b.hi AND b.lo <=
    * a.hi`, the q96/q123/q125 shape written naively), made scale-safe by
    * the overlap arm of [[graft.plans.RangeJoinRule]]: both sides explode
    * into their bin ranges, join on the shared bin, and only the FIRST
    * shared bin survives (greatest of the start bins) so multi-bin pairs
    * don't duplicate. Supplier ±40 vs customer ±10 bands at width 80 ⇒
    * ≤ 2 bins per interval. The fn asserts the rewrite fired, exactly
    * like q126 — a rule regression fails loudly, never silently
    * quadratic. */
  val q160AutoIntervalJoin = GraftQuery(
    "q160_auto_interval_join",
    "J-ext: optimizer-rule auto-binned interval-overlap join (RangeJoinRule)",
    (s, d) => {
      graft.plans.RangeJoinRule.install(s)
      val prev = s.conf.get(graft.plans.RangeJoinRule.widthKey, "0")
      s.conf.set(graft.plans.RangeJoinRule.widthKey, "80.0")
      try {
        val a = Tables.supplier(s, d).select(
          col("s_suppkey"),
          (col("s_acctbal") - 40).as("a_lo"),
          (col("s_acctbal") + 40).as("a_hi"))
        val b = Tables.customer(s, d).select(
          col("c_custkey"), col("c_acctbal"),
          (col("c_acctbal") - 10).as("b_lo"),
          (col("c_acctbal") + 10).as("b_hi"))
        val df = a
          .join(b, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
          .groupBy(col("s_suppkey"))
          .agg(count(lit(1)).as("n_overlaps"),
            round(sum(col("c_acctbal")), 2).as("sum_overlap_bal"))
          .orderBy(col("s_suppkey"))
        val optimized = df.queryExecution.optimizedPlan.toString
        require(optimized.contains("__graft_bin_l"),
          "RangeJoinRule overlap arm did not fire — naive interval join " +
            "would run as a nested loop")
        df
      } finally s.conf.set(graft.plans.RangeJoinRule.widthKey, prev)
    },
    Some("""SELECT s_suppkey, count(*) AS n_overlaps,
      round(sum(c_acctbal), 2) AS sum_overlap_bal
      FROM supplier JOIN customer
        ON s_acctbal - 40 <= c_acctbal + 10 AND c_acctbal - 10 <= s_acctbal + 40
      GROUP BY s_suppkey ORDER BY s_suppkey"""))

  /** q143: join-size prediction from per-key count relations — the
    * CBO companion to q116's column stats: |A ⋈_k B| = Σ_k c_A(k)·c_B(k),
    * computed from two small grouped-count relations joined on the key,
    * WITHOUT executing the join. The prediction is exact (it is the
    * join-cardinality identity, not an estimate), and the query also
    * RUNS the join to emit predicted next to actual — the oracle's hash
    * match is the identity's proof on data. Per-key counts are what a
    * cost-based optimizer sinks into broadcast/shuffle decisions; at
    * 100 TB the count relations are key-cardinality-sized (and the
    * exact Σ products would be fed by the q103 sketch tier instead).
    * The events self-join on user_id is the skew-relevant case: Σ c(u)²
    * is exactly the blow-up a skew planner (q118's report, q108's
    * salting) needs to see before running the join. */
  val q143JoinSize = GraftQuery(
    "q143_join_size",
    "A-ext/CBO: exact join-cardinality prediction from count relations",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"))
      val counts = ev.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      val predicted = counts
        .agg(sum(col("c") * col("c")).as("predicted_rows"))
      val actual = ev.join(ev.withColumnRenamed("user_id", "u2"),
          col("user_id") === col("u2"))
        .agg(count(lit(1)).as("actual_rows"))
      predicted.crossJoin(actual)
        .select(col("predicted_rows"), col("actual_rows"),
          (col("predicted_rows") === col("actual_rows")).cast("int")
            .as("identity_holds"))
    },
    Some("""WITH c AS (
        SELECT user_id, count(*) AS c FROM events GROUP BY 1),
      p AS (SELECT CAST(sum(c * c) AS BIGINT) AS predicted_rows FROM c),
      a AS (
        SELECT count(*) AS actual_rows
        FROM events e1 JOIN events e2 ON e1.user_id = e2.user_id)
      SELECT predicted_rows, actual_rows,
        CAST(predicted_rows = actual_rows AS INT) AS identity_holds
      FROM p, a"""))

  /** q157: POINT-IN-TIME dimension join — the feature-store correctness
    * primitive a training pipeline owes its labels: every fact joins the
    * dimension version that was valid AT FACT TIME, never a later one
    * (future-version lookup is target leakage; a plain latest-version
    * join silently trains on the future). The dimension is a
    * deterministic synthetic SCD2 history (3 staggered versions per
    * customer — the q95-changeset discipline; q114 is the storage shape
    * this consumes), the facts are orders at o_orderdate. The plan is
    * q75's LINEAR as-of form applied per entity: union version rows and
    * fact rows keyed by the customer, one ordered window pass carries
    * the last valid version forward — one shuffle on the entity key,
    * O(facts + versions) total, where the naive BETWEEN join explodes
    * to all (fact, earlier-version) pairs per entity. Orders before a
    * customer's first version surface as 'none' (left semantics —
    * the 1997 version epoch sits INSIDE the 1995-2001 order-date range
    * precisely so that branch carries rows):
    * PIT-correct pipelines must SEE missing history, not fabricate it.
    * Oracle: DuckDB's native ASOF LEFT JOIN over the same synthesis. */
  val q157PitJoin = GraftQuery(
    "q157_pit_join",
    "J-ext: point-in-time (as-of) dimension join, SCD2 semantics",
    (s, d) => {
      val versions = Tables.customer(s, d)
        .select(col("c_custkey"), explode(array(lit(0), lit(1), lit(2))).as("v"))
        .withColumn("ts", expr(
          "timestamp '1997-01-01 00:00:00' + " +
            "make_interval(0, 0, 0, CAST(v * 730 + c_custkey % 365 AS INT), 0, 0, 0)"))
        .withColumn("segment",
          concat(lit("seg"), pmod(col("c_custkey") + col("v"), lit(5)).cast("string")))
        .select(col("c_custkey"), col("ts"), lit(0).as("tag"),
          col("segment"), lit(null).cast("double").as("o_totalprice"))
      val facts = Tables.orders(s, d)
        .select(col("o_custkey").as("c_custkey"),
          col("o_orderdate").cast("timestamp").as("ts"), lit(1).as("tag"),
          lit(null).cast("string").as("segment"), col("o_totalprice"))
      val w = Window.partitionBy(col("c_custkey"))
        .orderBy(col("ts"), col("tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      versions.unionByName(facts)
        .withColumn("cur_seg",
          last(when(col("tag") === 0, col("segment")), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .groupBy(coalesce(col("cur_seg"), lit("none")).as("segment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("segment"))
    },
    Some("""WITH versions AS (
        SELECT c_custkey,
          TIMESTAMP '1997-01-01 00:00:00'
            + (v * 730 + c_custkey % 365) * INTERVAL 1 DAY AS valid_from,
          'seg' || ((c_custkey + v) % 5) AS segment
        FROM customer CROSS JOIN (SELECT unnest(range(0, 3)) AS v)),
      j AS (
        SELECT o.o_totalprice, v.segment
        FROM orders o ASOF LEFT JOIN versions v
          ON o.o_custkey = v.c_custkey AND o.o_orderdate >= v.valid_from)
      SELECT coalesce(segment, 'none') AS segment, count(*) AS n_orders,
        round(sum(o_totalprice), 2) AS revenue
      FROM j GROUP BY 1 ORDER BY 1"""))

  def queries: Seq[GraftQuery] = Seq(
    q157PitJoin,
    q01PricingSummary, q02FilterRevenue, q03JoinRevenueByNation,
    q04TopkPerGroup, q05SortLimit, q06NullHandling, q07StringFuncs,
    q08DateAgg, q09StatsSummary, q10Histogram, q11ValueCounts,
    q12DistinctCounts, q13SystematicSample, q14UnionDistinct, q15SetOps,
    q16AntiJoin, q17SemiJoin, q18WindowAnalytics, q19Rollup, q20Pivot,
    q21PairCanon, q88RangeJoin, q90CorrStats, q91GroupingSets,
    q97Unpivot, q98RankFamily, q99ConstraintAudit,
    q103SketchAgg, q105KAnonymity, q114Scd2, q115StarJoin, q116TableStats,
    q122TopkAggregator, q126AutoRangeJoin, q143JoinSize, q160AutoIntervalJoin)
}
