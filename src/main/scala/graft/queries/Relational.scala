package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational query surface (SURVEY.md §2.9 Q1, Q11–Q23).
  *
  * Each query is a declarative DataFrame program: filters/projections sit
  * directly on the parquet scan (pushdown + pruning), dimension joins are
  * broadcast, aggregates rely on Catalyst's partial/final HashAggregate
  * split. Every query ends with a total ORDER BY on a unique key and
  * rounds float aggregates to 4 (money: 2) decimals for oracle parity.
  *
  * Scale notes (100 TB posture) are on each operator: broadcast only
  * bounded dims (region/nation: 25 rows at any SF), never the fact side;
  * aggregation keys are the natural shuffle keys; top-k compiles to
  * TakeOrderedAndProject (no global sort materialization).
  */
object Relational {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Q1: scan + project + predicate; filter and 2-column projection reach
    * the parquet scan (PushedFilters / ReadSchema). */
  def q01ScanFilter(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(col("lang") === "en")
      .select(col("doc_id"), col("n_chars"))
      .orderBy("doc_id")

  /** Q11: fact ⋈ dim ⋈ dim. nation is a bounded dim → broadcast; the
    * orders⋈customer equi-join shuffles on the key at scale (AQE may still
    * broadcast customer at small SF). */
  def q11Join(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val customer = t(spark, dir, "customer")
    val nation = t(spark, dir, "nation")
    orders
      .filter(col("o_totalprice") > 400000.0)
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("o_orderkey"), col("o_totalprice"), col("c_name"),
        col("n_name"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Q12a: left-semi (EXISTS). The quantity filter is pushed below the
    * join so the build side is pre-shrunk. */
  def q12Semi(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(t(spark, dir, "lineitem").filter(col("l_quantity") >= 45.0),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"))
      .orderBy("o_orderkey")

  /** Q12b: left-anti (NOT EXISTS). */
  def q12Anti(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(t(spark, dir, "lineitem").filter(col("l_quantity") >= 45.0),
        col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select(col("o_orderkey"))
      .orderBy("o_orderkey")

  /** Q13: multi-way join + group agg (TPC-H Q3 shape). Aggregates on the
    * join key, so partial aggregation happens map-side before the shuffle
    * (the reference's combiner, for free — SURVEY §2.4/§4). */
  def q13Revenue(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val orders = t(spark, dir, "orders").filter(col("o_orderstatus") === "O")
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(100)
  }

  /** Q14: hash agg with count distinct (expands to a two-phase distinct
    * aggregate under Catalyst). */
  def q14CountDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(
        countDistinct(col("o_orderstatus")).as("n_status"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")

  /** Q14b: approximate count-distinct (HyperLogLog++) — the 100 TB
    * cardinality primitive: constant-size sketch, map-side partials,
    * commutative/associative merge (order-insensitive → deterministic
    * under any partitioning). The sketch estimate itself is
    * engine-specific, so the oracle contract is the exact cardinality
    * plus a checked error bound: the rsd=0.05 estimate must land
    * within 3σ (15%) of exact. */
  def q14ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact_keys"),
        approx_count_distinct(col("l_orderkey"), 0.05).as("hll"))
      .select(col("l_returnflag"), col("exact_keys"),
        (abs(col("hll") - col("exact_keys")) <=
          col("exact_keys") * 0.15).as("hll_ok"))
      .orderBy("l_returnflag")

  /** Q21d: approximate quantiles (Greenwald-Khanna summaries,
    * accuracy=10000 → rank error ≤ 0.01%) next to the exact
    * percentiles — mergeable bounded-size state, the scale path when
    * an exact sort-based percentile is too expensive. Oracle contract:
    * exact values + a checked 1%-relative error bound on the sketch. */
  def q21ApproxQuantiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"),
        expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 10000)")
          .as("ap"))
      .select(col("l_returnflag"), col("p25"), col("p50"), col("p75"),
        (abs(element_at(col("ap"), 1) - col("p25")) <= col("p25") * 0.01 &&
          abs(element_at(col("ap"), 2) - col("p50")) <= col("p50") * 0.01 &&
          abs(element_at(col("ap"), 3) - col("p75")) <= col("p75") * 0.01)
          .as("approx_ok"))
      .orderBy("l_returnflag")

  /** Q15: ROLLUP over region/nation supplier balances. NULLS FIRST is
    * explicit: Spark default is nulls-first, DuckDB's is nulls-last. */
  def q15Rollup(spark: SparkSession, dir: String): DataFrame = {
    val s = t(spark, dir, "supplier")
    val n = broadcast(t(spark, dir, "nation"))
    val r = broadcast(t(spark, dir, "region"))
    s.join(n, col("s_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("s_acctbal")), 2).as("total_bal"),
        grouping(col("r_name")).cast("long").as("g_r"),
        grouping(col("n_name")).cast("long").as("g_n"))
      .orderBy(col("g_r"), col("g_n"), col("r_name").asc_nulls_first,
        col("n_name").asc_nulls_first)
  }

  /** Q15b: CUBE over region/nation (all four grouping combinations). */
  def q15Cube(spark: SparkSession, dir: String): DataFrame = {
    val s = t(spark, dir, "supplier")
    val n = broadcast(t(spark, dir, "nation"))
    val r = broadcast(t(spark, dir, "region"))
    s.join(n, col("s_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .cube(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_supp"),
        round(avg(col("s_acctbal")), 4).as("avg_bal"),
        grouping(col("r_name")).cast("long").as("g_r"),
        grouping(col("n_name")).cast("long").as("g_n"))
      .orderBy(col("g_r"), col("g_n"), col("r_name").asc_nulls_first,
        col("n_name").asc_nulls_first)
  }

  /** Q16b: navigation window functions (lead / first / last / ntile)
    * over one partition spec — single shuffle serves all four. */
  def q16WindowNav(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderkey"))
    t(spark, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"),
        first(col("o_orderkey")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("first_key"),
        last(col("o_orderkey")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .as("last_key"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Q20b: extended string battery (pad/translate/repeat/reverse/
    * split_part/left/right). */
  def q20Strings2(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(
        col("p_partkey"),
        lpad(col("p_brand"), 12, "*").as("lp"),
        rpad(col("p_brand"), 12, "-").as("rp"),
        translate(col("p_name"), "aeiou", "AEIOU").as("tr"),
        repeat(col("p_type"), 2).as("rep2"),
        reverse(col("p_name")).as("rev"),
        expr("split_part(p_name, ' ', 1)").as("first_word"),
        expr("left(p_name, 5)").as("l5"),
        expr("right(p_name, 5)").as("r5"))
      .orderBy("p_partkey")

  /** Q21b: null-handling battery (coalesce / nullif / CASE / null-safe
    * aggregation) — nulls synthesized from data predicates. */
  def q21Nulls(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        when(col("l_discount") > 0.05, col("l_discount")).as("disc_or_null"),
        nullif(col("l_linenumber"), lit(1)).as("ln_not1"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(coalesce(col("disc_or_null"), lit(-1.0)), 4).as("c1"),
        col("ln_not1").cast("long").as("n1"),
        when(col("disc_or_null").isNull, "none")
          .otherwise("some").as("tag"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Q21c: exact percentile battery — Spark `percentile` and DuckDB
    * `quantile_cont` share the linear-interpolation definition, so
    * values agree exactly. */
  def q21Percentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_quantity, 0.75)"), 4).as("p75"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("med_price"))
      .orderBy("l_returnflag")

  /** Q21 statistics battery: stddev/variance over INTEGRAL-valued
    * doubles (l_quantity, l_linenumber) — their sums/co-moments stay
    * exact in double arithmetic regardless of partition order, so
    * round(4) is deterministic cross-engine (unlike stats over
    * fractional columns, where summation order matters). */
  def q21Stats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(stddev_pop(col("l_quantity")), 4).as("sdp_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(corr(col("l_quantity"), col("l_linenumber").cast("double")), 4)
          .as("corr_ql"),
        round(covar_samp(col("l_quantity"),
          col("l_linenumber").cast("double")), 4).as("cov_ql"))
      .orderBy("l_returnflag")

  /** Q15 explicit GROUPING SETS (beyond rollup/cube): chosen subsets
    * only — (r_name), (n_name), and grand total. */
  def q15GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val s = t(spark, dir, "supplier")
      .join(t(spark, dir, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .join(t(spark, dir, "region"),
        col("n_regionkey") === col("r_regionkey"))
    // Dataset groupingSets API (Spark 4): no temp-view registration —
    // a view would mutate the session catalog as a hidden side effect
    // and race between interleaved invocations
    s.groupingSets(
        Seq(Seq(col("r_name")), Seq(col("n_name")), Seq.empty),
        col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_supp"),
        round(sum(col("s_acctbal")), 2).as("total_bal"),
        grouping(col("r_name")).cast("long").as("g_r"),
        grouping(col("n_name")).cast("long").as("g_n"))
      .orderBy(col("g_r"), col("g_n"),
        col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** Q16: ranking windows; one shuffle on o_custkey serves all three
    * window functions (same partition spec). */
  def q16RankWindows(spark: SparkSession, dir: String): DataFrame = {
    val byPrice = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val byStatus = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderstatus"))
    t(spark, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(byPrice).cast("long").as("rn"),
        rank().over(byStatus).cast("long").as("rk"),
        dense_rank().over(byStatus).cast("long").as("drk"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** Q17: analytic window with a ROWS frame + lag over the events table.
    * Ordering uses the exact nanosecond value (ts_ns) so frame contents
    * match the oracle's ns-precision ordering; event_id breaks ties. */
  def q17WindowFrames(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
    t(spark, dir, "events")
      .select(
        col("event_id"), col("user_id"),
        round(sum(col("value")).over(w.rowsBetween(-2, 0)), 4)
          .as("running_sum"),
        round(lag(col("value"), 1, 0.0).over(w), 4).as("prev_value"))
      .orderBy("event_id")
  }

  /** Q18: global top-k → TakeOrderedAndProject (per-partition heaps + one
    * driver merge of k rows; no full sort at any scale). */
  def q18TopK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)

  /** Q13b: the canonical TPC-H Q1 pricing summary — the industry's
    * reference "one wide scan, partial-agg everything" report. Money
    * sums use the sanctioned fixed-point pattern (the synthetic data
    * is cents-exact, so per-row quantization to 1e2/1e4/1e6 units is
    * the identity and the BIGINT sums are engine-exact — a raw
    * double sum over a whole-table group drifts past round(2) at this
    * row count). One scan, map-side partials, 4-row output. */
  def q13TpchPricing(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
    val disc = lit(1) - col("l_discount")
    val charge = disc * (lit(1) + col("l_tax"))
    // DECIMAL(38,0) accumulators, not sum(long): Spark's long sum wraps
    // silently in non-ANSI mode while DuckDB's BIGINT sum widens to
    // HUGEINT — a whole-table group of ~1e8 cents-scaled rows would
    // overflow the long on the Spark side only. Same overflow-proof
    // pattern as the fixed-point label centroids.
    def dsum(c: Column) = sum(c.cast("decimal(38,0)"))
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(round(col("l_quantity"), 0).cast("long"))
          .cast("long").as("sum_qty"),
        round(dsum(round(col("l_extendedprice") * 100, 0).cast("long"))
          .cast("double") / 100.0, 2).as("sum_base_price"),
        round(dsum(round(col("l_extendedprice") * disc * 1e4, 0)
          .cast("long")).cast("double") / 1e4, 2).as("sum_disc_price"),
        round(dsum(round(col("l_extendedprice") * charge * 1e6, 0)
          .cast("long")).cast("double") / 1e6, 2).as("sum_charge"),
        round(dsum(round(col("l_quantity"), 0).cast("long")).cast("double") /
          count(lit(1)).cast("double"), 4).as("avg_qty"),
        round(dsum(round(col("l_extendedprice") * 100, 0).cast("long"))
          .cast("double") / 100.0 / count(lit(1)), 4).as("avg_price"),
        round(dsum(round(col("l_discount") * 100, 0).cast("long"))
          .cast("double") / 100.0 / count(lit(1)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Q18b: top-k PER GROUP through the custom bounded-heap aggregate
    * (`graft_topk`, a TypedImperativeAggregate) — the scale-right form
    * of the window `row_number() <= k` pattern: state is O(k) per
    * group per partition with map-side partial aggregation, instead of
    * a full shuffle-and-sort of every group. PlanSpec asserts the
    * ObjectHashAggregate partial/final pair and the absence of any
    * WindowExec. */
  def q18TopKGroup(spark: SparkSession, dir: String,
                   k: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(graft.functions.GraftFunctions
        .topkBy(col("o_totalprice"), col("o_orderkey"), k).as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"), (col("pos") + 1).cast("long").as("rn"),
        col("col.id").as("o_orderkey"), col("col.score").as("o_totalprice"))
      .orderBy("o_custkey", "rn")
  }

  /** Q19: set ops over customer vs supplier nation keys. */
  def q19SetOps(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
      .select(col("c_nationkey").cast("long").as("k"))
    val s = t(spark, dir, "supplier")
      .select(col("s_nationkey").cast("long").as("k"))
    val both = c.intersect(s).withColumn("tag", lit("both"))
    val custOnly = c.except(s).withColumn("tag", lit("cust_only"))
    val suppOnly = s.except(c).withColumn("tag", lit("supp_only"))
    both.union(custOnly).union(suppOnly)
      .select(col("tag"), col("k"))
      .orderBy("tag", "k")
  }

  /** Q20: string function battery over part (SURVEY §2.8). */
  def q20Strings(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(
        col("p_partkey"),
        lower(col("p_name")).as("lo"),
        upper(col("p_brand")).as("up"),
        trim(col("p_name")).as("tr"),
        substring(col("p_name"), 1, 8).as("sub8"),
        instr(col("p_name"), "a").cast("long").as("ia"),
        length(col("p_name")).cast("long").as("len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("cw"),
        regexp_replace(col("p_name"), " ", "_").as("rep"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("rx"),
        when(col("p_name").startsWith("a"), 1L).otherwise(0L).as("sw"))
      .orderBy("p_partkey")

  /** Q21: math battery over lineitem (SURVEY §2.8). */
  def q21Math(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(log(col("l_extendedprice")), 4).as("ln_price"),
        round(log10(col("l_extendedprice")), 4).as("log10_price"),
        ceil(col("l_discount") * 100).cast("long").as("ceil_disc"),
        floor(col("l_tax") * 100).cast("long").as("floor_tax"),
        round(abs(col("l_discount") - col("l_tax")), 4).as("abs_diff"),
        round(least(col("l_quantity"), lit(25.0)), 4).as("lq"),
        round(greatest(col("l_quantity"), lit(25.0)), 4).as("gq"),
        (col("l_orderkey") * col("l_linenumber") % 97).as("m"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Q22a: date battery over orders (second-granularity epoch values are
    * the cross-engine-safe representation — FIXTURES.md cautions). */
  def q22Dates(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        unix_timestamp(date_trunc("month", col("o_orderdate")))
          .as("month_start"))
      .orderBy("o_orderkey")

  /** Q22c: date arithmetic battery (datediff / date_add / add_months /
    * last_day / dayofweek) over o_orderdate. */
  def q22DateArith(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        datediff(lit("1998-01-01").cast("date"), col("o_orderdate"))
          .cast("long").as("days_to_98"),
        date_add(col("o_orderdate"), 30).cast("string").as("plus30"),
        add_months(col("o_orderdate"), 2).cast("string").as("plus2m"),
        last_day(col("o_orderdate")).cast("string").as("eom"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"))
      .orderBy("o_orderkey")

  /** Q22b: timestamp handling on the ns-precision events table; the µs
    * `ts` derived in [[Tables.events]] truncates toward -inf exactly like
    * the oracle's ns→second date_trunc, so second granularity agrees. */
  def q22DatesEvents(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(
        col("event_id"),
        unix_timestamp(date_trunc("second", col("ts"))).as("sec"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hr"))
      .orderBy("event_id")

  /** Q23c: higher-order array functions (filter / transform /
    * aggregate-fold / exists / array_max) over the embedding vectors —
    * the fold matches the oracle's list_reduce bit-for-bit. */
  def q23HigherOrder(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(
        col("vec_id"),
        size(filter(col("embedding"), x => x.cast("double") > 0.0)).cast("long")
          .as("n_pos"),
        round(aggregate(
          transform(col("embedding"), x => x.cast("double") * 2.0),
          lit(0.0), (acc, v) => acc + v), 4).as("sum2x"),
        when(exists(col("embedding"), x => x.cast("double") > 0.9), 1L).otherwise(0L)
          .as("has_big"),
        round(array_max(col("embedding")).cast("double"), 4).as("mx"),
        round(array_min(col("embedding")).cast("double"), 4).as("mn"))
      .orderBy("vec_id")

  /** Q23a: JSON extraction from events.props. */
  def q23Json(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id")

  /** Q23b: array battery over embeddings (floats promoted to double
    * before rounding — exact promotion, both engines agree). */
  def q23Arrays(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("e1"),
        round(element_at(col("embedding"), 64).cast("double"), 4).as("e64"))
      .orderBy("vec_id")

  /** Q23d: MAP column battery — construct, merge, look up, transform,
    * and explode string-keyed maps (the Document.metadata shape from
    * SURVEY §1.3). Map iteration order is engine-specific, so every
    * order-sensitive output goes through sorted keys; the oracle
    * rebuilds each value relationally without map types at all. */
  def q23Maps(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        map_concat(
          map(lit("lang"), col("lang")),
          map(lit("src"), col("source"))).as("m"))
      .select(col("doc_id"),
        element_at(col("m"), "lang").as("lang_v"),
        size(col("m")).cast("long").as("n_keys"),
        array_join(array_sort(map_keys(col("m"))), ",").as("keys"),
        array_join(array_sort(map_values(
          transform_values(col("m"), (_, v) => upper(v)))), ",")
          .as("upper_vals"),
        map_contains_key(col("m"), "src").as("has_src"))
      .orderBy("doc_id")
}
