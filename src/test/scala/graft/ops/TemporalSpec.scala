package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unit semantics of the temporal join operators ([[Temporal]]):
  * hand-computed as-of matches and range-pair parity with the naive
  * quadratic join they replace. */
class TemporalSpec extends SparkSpec {

  test("asofLeft picks the latest right row at or before each left row") {
    import spark.implicits._
    val left = Seq(("a", 5L, 1), ("a", 10L, 2), ("b", 3L, 3))
      .toDF("k", "t", "id")
    val right = Seq(("a", 5L, 50.0), ("a", 7L, 70.0), ("b", 9L, 90.0))
      .toDF("k", "rt", "v")
    val got = Temporal.asofLeft(left, right, by = Seq("k"),
        leftOn = "t", rightOn = "rt", valueCols = Seq("v"))
      .orderBy("id")
      .select("id", "v").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getDouble(1)))
    // (a,5) sees the simultaneous right row (inclusive >=); (a,10) the
    // latest of {5,7}; (b,3) has no prior right row
    assert(got.toSeq === Seq((1, 50.0), (2, 70.0), (3, null)))
  }

  test("asofLeftMerge (custom physical operator) equals asofLeft") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val left = (1 to 500).map(i =>
      ("k" + rnd.nextInt(7), rnd.nextInt(1000).toLong, i)).toDF("k", "t", "id")
    val right = (1 to 300).map(i =>
      ("k" + rnd.nextInt(7), rnd.nextInt(1000).toLong, rnd.nextDouble()))
      .toDF("k", "rt", "v")
      // contract: unique (by, rightOn)
      .groupBy("k", "rt").agg(max("v").as("v"))
    val viaWindow = Temporal.asofLeft(left, right, Seq("k"), "t", "rt", Seq("v"))
      .orderBy("id").collect().map(_.toSeq).toSeq
    val viaMerge = Temporal.asofLeftMerge(left, right, Seq("k"), "t", "rt", Seq("v"))
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(viaMerge === viaWindow)
    // and it really is the custom operator: no window in the plan
    val plan = Temporal.asofLeftMerge(left, right, Seq("k"), "t", "rt", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("NULL by-keys never match, in both as-of forms (SQL equality)") {
    import spark.implicits._
    val left = Seq((Some("a"), 10L, 1), (None, 10L, 2))
      .toDF("k", "t", "id")
    val right = Seq((Some("a"), 5L, 1.0), (None, 5L, 9.9))
      .toDF("k", "rt", "v")
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.orderBy("id").select("id", "v").collect()
        .map(r => (r.getInt(0), if (r.isNullAt(1)) None
          else Some(r.getDouble(1)))).toSeq
    val expect = Seq((1, Some(1.0)), (2, None)) // null key: null fill
    assert(run(Temporal.asofLeft(left, right, Seq("k"), "t", "rt",
      Seq("v"))) == expect)
    assert(run(Temporal.asofLeftMerge(left, right, Seq("k"), "t", "rt",
      Seq("v"))) == expect)
  }

  test("NULL time values never match, in both as-of forms (l.t >= NULL is false)") {
    import spark.implicits._
    // right row with null rt would sort NULLS-FIRST into every frame
    // and masquerade as the fill for unmatched left rows; left row with
    // null t must get the null fill (nothing is at-or-before NULL)
    val left = Seq(("a", Some(50L), 1), ("a", None, 2))
      .toDF("k", "t", "id")
    val right = Seq(("a", Option.empty[Long], 9.9), ("a", Some(100L), 1.0))
      .toDF("k", "rt", "v")
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.orderBy("id").select("id", "v").collect()
        .map(r => (r.getInt(0), if (r.isNullAt(1)) None
          else Some(r.getDouble(1)))).toSeq
    val expect = Seq((1, None), (2, None))
    assert(run(Temporal.asofLeft(left, right, Seq("k"), "t", "rt",
      Seq("v"))) == expect)
    assert(run(Temporal.asofLeftMerge(left, right, Seq("k"), "t", "rt",
      Seq("v"))) == expect)
  }

  test("rangePairs rejects reserved/colliding column names") {
    import spark.implicits._
    val pts = Seq(("u", 0L, 1L)).toDF("k", "t", "__probe")
    intercept[IllegalArgumentException] {
      Temporal.rangePairs(pts, Seq("k"), "t", "__probe", window = 10L)
    }
  }

  test("rangePairs rejects a non-positive window") {
    import spark.implicits._
    val pts = Seq(("u", 0L, 1L)).toDF("k", "t", "id")
    intercept[IllegalArgumentException] {
      Temporal.rangePairs(pts, Seq("k"), "t", "id", window = 0L)
    }
  }

  test("rangePairs equals the naive quadratic range join") {
    import spark.implicits._
    val pts = Seq(("u", 0L, 1L), ("u", 50L, 2L), ("u", 100L, 3L),
      ("u", 149L, 4L), ("u", 300L, 5L), ("w", 40L, 6L))
      .toDF("k", "t", "id")
    val got = Temporal.rangePairs(pts, by = Seq("k"), on = "t",
        idCol = "id", window = 100L)
      .select(col("id"), col("r_id")).as[(Long, Long)].collect().toSet
    val naive = pts.as("a").join(pts.as("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id") &&
          abs(col("b.t") - col("a.t")) <= 100L)
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    assert(got === naive && naive.nonEmpty)
    // boundary: |Δ|=100 inclusive, |Δ|=101 excluded, cross-key never
    assert(got.contains((1L, 3L)) && !got.contains((1L, 4L)) &&
      !got.contains((2L, 6L)))
  }
}
