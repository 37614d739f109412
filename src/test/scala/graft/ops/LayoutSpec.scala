package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.SparkSpec

class LayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("morton interleave is invertible on the 16-bit grid") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L)).toDF("a", "b")
      .select(col("a"), col("b"), Layout.morton(col("a"), col("b")).as("z"))
    df.collect().foreach { r =>
      val (a, b, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      var (ra, rb) = (0L, 0L)
      for (i <- 0 until Layout.MortonBits) {
        ra |= ((z >> (2 * i)) & 1L) << i
        rb |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert((ra, rb) == (a, b), s"z=$z decoded to ($ra,$rb)")
    }
  }

  test("z-ordered layout skips row groups a natural layout reads " +
    "(both filter columns)") {
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_linenumber")
    val base = java.nio.file.Files.createTempDirectory("graft_zorder")
    val natural = base.resolve("natural").toString
    val zed = base.resolve("zed").toString
    // natural layout: insertion (orderkey) order — partkey stats are
    // wide in every row group; tiny block size makes skipping visible
    // at test scale
    li.repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.option("parquet.block.size", 16 * 1024)
      .mode("overwrite").parquet(natural)
    Layout.writeZOrdered(li, zed, "l_orderkey", "l_partkey",
      files = 8, blockSize = 16 * 1024)

    // rows the parquet reader actually surfaces after row-group
    // pruning, from the scan node's own metric
    def scanned(path: String,
                pred: org.apache.spark.sql.Column): (Long, Long) = {
      val prev = spark.conf.get("spark.sql.adaptive.enabled")
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val df = spark.read.parquet(path).filter(pred)
        val rows = df.collect().length.toLong
        val scan = df.queryExecution.executedPlan.collect {
          case f: FileSourceScanExec => f
        }.head
        (rows, scan.metrics("numOutputRows").value)
      } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }

    try {
      val total = li.count()
      // a narrow partkey slice: natural layout cannot skip for it
      val pred = col("l_partkey") <= 50
      val (rowsN, scanN) = scanned(natural, pred)
      val (rowsZ, scanZ) = scanned(zed, pred)
      assert(rowsN == rowsZ, s"layouts disagree: $rowsN vs $rowsZ")
      assert(rowsN > 0)
      // threshold leaves slack over the ~50% typical skip at this
      // granularity: repartitionByRange samples with a random seed, so
      // file (and hence row-group) boundaries shift slightly per run —
      // a hard 50% line flaked at 50.4% depending on the draw
      assert(scanZ < scanN * 2 / 3,
        s"z-order skipped nothing: scanned $scanZ vs natural $scanN")
      // the z-layout still skips substantially on the OTHER dimension
      // (it cannot beat natural there — natural IS sorted by orderkey,
      // the optimal single-column layout; z trades a bounded loss on
      // the sort key for skipping on both)
      val predA = col("l_orderkey") <= 100
      val (ra, sa) = scanned(zed, predA)
      val (rn, sn) = scanned(natural, predA)
      assert(ra == rn)
      assert(sn <= sa, s"natural lost on its own sort key: $sn vs $sa")
      // at 16 coarse row groups the z-rectangles still cover about
      // half the groups for a narrow slice; the bound tightens with
      // granularity (production row groups are far finer-grained)
      assert(sa < total * 2 / 3,
        s"z-order scanned $sa of $total rows for a narrow orderkey slice")
    } finally {
      val wk = java.nio.file.Files.walk(base)
      try wk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally wk.close()
    }
  }
}
