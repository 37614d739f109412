package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Temporal join operators the reference lacks entirely (SURVEY §2.3
  * lists as-of / range joins as "absent — free from Spark when the
  * extended surface needs them"; Spark has no native ASOF, so these are
  * the library's own compositions of built-ins).
  *
  * Scale posture (100 TB): neither operator ever materializes a
  * time-range cross product.
  *  - [[asofLeft]] is the union-sort-fill pattern: tag left/right rows,
  *    ONE shuffle on the `by` key, one in-partition sort by (t, tag),
  *    and a running `last(value, ignoreNulls)` window — cost is
  *    O(n log n) per key, the same shape as a sort-merge join, with no
  *    range-predicate blowup.
  *  - [[rangePairs]] buckets time into window-sized cells and
  *    equi-joins on (key, cell) with a ±1-cell probe expansion — the
  *    standard interval-bucketing that turns a range join into a hash
  *    join; each qualifying pair is produced exactly once per probed
  *    cell and exact bounds are re-checked on the narrow joined row.
  */
object Temporal {

  /** Rows whose `by` keys are all non-null (no-op for empty `by`). */
  private def nonNullKeys(df: DataFrame, by: Seq[String]): DataFrame =
    if (by.isEmpty) df
    else df.filter(by.map(col(_).isNotNull).reduce(_ && _))

  /** Right-side rows an as-of join can ever match: non-null `by` keys
    * (SQL equality — NULL = NULL is not a joinable group) AND a
    * non-null time (`l.t >= NULL` is never true in the DuckDB ASOF
    * semantics both forms mirror; an unfiltered null-time right row
    * would sort NULLS-FIRST into every window frame / merge head and
    * its value would masquerade as the fill for left rows with no real
    * prior match). A null-time LEFT row needs no special case after
    * this: nothing sorts at-or-before it, so it gets the null fill. */
  private def matchableRight(right: DataFrame, by: Seq[String],
                             rightOn: String): DataFrame =
    nonNullKeys(right, by).filter(col(rightOn).isNotNull)

  /** Left as-of join: for every `left` row, attach `valueCols` from the
    * LATEST `right` row with `right(rightOn) <= left(leftOn)` within
    * the same `by` group (inclusive, matching DuckDB `ASOF ... ON l.t
    * >= r.t`); null-filled when no prior right row exists.
    *
    * Contract: `right` has at most one row per (by, rightOn) — pre-
    * aggregate otherwise — and non-null `valueCols` (a null value is
    * indistinguishable from "no match" to the ignoreNulls fill).
    *
    * NULL `by` keys and NULL times follow SQL semantics (as DuckDB
    * ASOF does): a null-keyed or null-time right row matches nothing,
    * a null-keyed or null-time left row gets the null fill — enforced
    * by dropping unmatchable right rows before the merge
    * ([[matchableRight]]), since the window's NULLS-FIRST sort would
    * otherwise surface a null-time right row's value as every
    * unmatched left row's fill. */
  def asofLeft(left: DataFrame, right: DataFrame, by: Seq[String],
               leftOn: String, rightOn: String,
               valueCols: Seq[String]): DataFrame = {
    require(valueCols.forall(c => !left.columns.contains(c)),
      s"valueCols ${valueCols.filter(left.columns.contains)} collide " +
        "with left columns — the output would be ambiguous; rename first")
    val rightNN = matchableRight(right, by, rightOn)
    val lCols = left.columns.toSeq
    val lTagged = left.select(
      lCols.map(col) ++
        valueCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"__asof_$c")) ++
        Seq(lit(1).as("__asof_tag"), col(leftOn).as("__asof_t")): _*)
    val rTagged = rightNN.select(
      lCols.map { c =>
        if (by.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++
        valueCols.map(c => col(c).as(s"__asof_$c")) ++
        Seq(lit(0).as("__asof_tag"), col(rightOn).as("__asof_t")): _*)
    // right rows (tag 0) sort BEFORE left rows (tag 1) at equal t, so
    // an exactly-simultaneous right row is visible to the left row —
    // the inclusive (>=) as-of semantics
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col("__asof_t"), col("__asof_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .select(lCols.map(col) ++ valueCols.map(c =>
        last(col(s"__asof_$c"), ignoreNulls = true).over(w).as(c)) :+
        col("__asof_tag"): _*)
      .filter(col("__asof_tag") === 1)
      .drop("__asof_tag")
  }

  /** All pairs of `df` rows in the same `by` group whose `on` values
    * differ by at most `window` (exclusive of self; each unordered pair
    * once, ordered by `idCol`). Bucketed equi-join, not a range join:
    * probe cells {c-1, c, c+1} cover every |Δt| ≤ window when cell
    * size == window. */
  def rangePairs(df: DataFrame, by: Seq[String], on: String,
                 idCol: String, window: Long): DataFrame = {
    require(window > 0,
      s"rangePairs window must be positive, got $window " +
        "(window = 0 would divide by zero in the cell bucketing)")
    // helper/build column names must not collide with the input's —
    // an ambiguous-reference failure deep in the join would otherwise
    // surface with no hint at the cause (same guard as writeZOrdered)
    val clash = df.columns.filter(c =>
      c == "__d" || c == "__probe" || c == "__cell" ||
        df.columns.contains(s"r_$c"))
    require(clash.isEmpty,
      s"rangePairs reserves __d/__probe/__cell and the r_ prefix; " +
        s"rename input column(s) ${clash.mkString(", ")}")
    // integer div — double division would lose ns precision at 2^60
    val cell = (name: String) => expr(s"`$name` div ${window}L")
    val probes = df.select(
      (df.columns.map(col) :+
        explode(array(lit(-1L), lit(0L), lit(1L))).as("__d")): _*)
      .withColumn("__probe", cell(on) + col("__d"))
    val build = df.select(
      (df.columns.map(c => col(c).as(s"r_$c")) :+
        cell(on).as("__cell")): _*)
    probes.join(build,
        by.map(c => col(c) === col(s"r_$c")).reduce(_ && _) &&
          col("__probe") === col("__cell") &&
          col(idCol) < col(s"r_$idCol") &&
          abs(col(s"r_$on") - col(on)) <= window)
      .drop("__d", "__probe", "__cell")
  }

  /** [[asofLeft]] through the CUSTOM PHYSICAL OPERATOR
    * ([[graft.plans.AsOfJoinExec]] — sort-merge as-of join planned
    * from a custom LogicalPlan via a SparkStrategy): one linear merge
    * per co-partitioned sorted partition instead of the union+window
    * composition. Same contract and output as [[asofLeft]]
    * (TemporalSpec + the q30 oracle prove it), except that `by` must
    * be non-empty — the operator's ClusteredDistribution needs a key
    * (use [[asofLeft]] for a global, un-keyed as-of). */
  def asofLeftMerge(left: DataFrame, right: DataFrame, by: Seq[String],
                    leftOn: String, rightOn: String,
                    valueCols: Seq[String]): DataFrame = {
    import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy, PlanUtils}
    require(by.nonEmpty,
      "asofLeftMerge needs at least one by key (ClusteredDistribution " +
        "cannot be empty) — use asofLeft for an un-keyed as-of")
    val spark = left.sparkSession
    // idempotent for sessions not built with GraftExtensions; the
    // lock closes the check-then-act race between concurrent callers
    // (an unsynchronized read-modify-write could drop a registration)
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lp = left.queryExecution.analyzed
    // renew the right side's exprIds — both sides may share lineage
    // (e.g. two filters of the same table); null-keyed and null-time
    // right rows are dropped for SQL semantics (see asofLeft)
    val rp = PlanUtils.freshCopy(
      matchableRight(right, by, rightOn).queryExecution.analyzed)
    // resolve with the session's resolver so name-casing behaves like
    // every other DataFrame API (case-insensitive by default)
    val resolver = spark.sessionState.analyzer.resolver
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             n: String) =
      p.output.find(a => resolver(a.name, n)).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output}"))
    org.apache.spark.sql.graft.Bridge.ofRows(spark,
      AsOfJoinPlan(lp, rp,
        by.map(attr(lp, _)), by.map(attr(rp, _)),
        attr(lp, leftOn), attr(rp, rightOn),
        valueCols.map(attr(rp, _))))
  }

  /** q30: for each 'view' event, the value of the user's most recent
    * 'purchase' at or before it (−1 when none). Runs through the
    * custom sort-merge as-of operator — the DuckDB ASOF oracle checks
    * the custom physical plan end-to-end. */
  def q30AsOf(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts_ns"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_ns"))
      .agg(max(col("value")).as("p_value"))
    asofLeftMerge(views, purchases, by = Seq("user_id"),
        leftOn = "ts_ns", rightOn = "ts_ns", valueCols = Seq("p_value"))
      .select(col("event_id"), col("user_id"),
        round(coalesce(col("p_value"), lit(-1.0)), 4).as("p_value"))
      .orderBy("event_id")
  }

  /** q30: same-user event pairs within a 1-hour window. Times compared
    * at µs granularity (`ts_ns div 1000` == DuckDB's µs TIMESTAMP from
    * the ns parquet — both truncate toward zero for positive epochs). */
  def q30RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val W = 3600L * 1000 * 1000 // 1 hour in µs
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        expr("ts_ns div 1000").as("ts_us"))
    rangePairs(ev, by = Seq("user_id"), on = "ts_us",
        idCol = "event_id", window = W)
      .select(col("user_id"), col("event_id").as("e_a"),
        col("r_event_id").as("e_b"),
        (col("r_ts_us") - col("ts_us")).as("delta_us"))
      .orderBy("e_a", "e_b")
  }
}
