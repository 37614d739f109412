package graft.streaming

import graft.SparkSpec

/** Pins the input-sized stream shuffle derivation (r17): the clamp
  * arithmetic, the conf knob, the restore-on-exit contract and the
  * disable path — the levers the streaming query paths now depend on
  * for their partition counts. */
class StreamShuffleSpec extends SparkSpec {

  test("partitionsFor clamps ceil(bytes/target) to [1, parallelism]") {
    val cap = spark.sparkContext.defaultParallelism
    // zero / tiny input never goes below one partition
    assert(StreamShuffle.partitionsFor(spark, 0L) == 1)
    assert(StreamShuffle.partitionsFor(spark, 1L) == 1)
    // the byte term binds in the middle: 3 targets' worth → 3 (the
    // local[4] session has parallelism 4)
    val target = spark.conf
      .get(StreamShuffle.BytesPerPartitionKey,
        StreamShuffle.BytesPerPartitionDefault.toString).toLong
    if (cap >= 3)
      assert(StreamShuffle.partitionsFor(spark, 3 * target) == 3)
    // huge input caps at the available parallelism
    assert(StreamShuffle.partitionsFor(spark, Long.MaxValue / 2) == cap)
  }

  test("withInputSizedShuffle sets from the staged bytes and restores") {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    val dir = java.nio.file.Files.createTempDirectory("graft_sss")
    java.nio.file.Files.write(dir.resolve("chunk-0.parquet"),
      Array.fill[Byte](1024)(1))
    try {
      StreamShuffle.withInputSizedShuffle(spark, Seq(dir.toString)) {
        // 1 KB of staged input → one partition while the stream runs
        assert(spark.conf.get(key) == "1")
      }
      assert(spark.conf.get(key) == prev, "session value must restore")
      // restore also on failure
      intercept[RuntimeException] {
        StreamShuffle.withInputSizedShuffle(spark, Seq(dir.toString)) {
          throw new RuntimeException("boom")
        }
      }
      assert(spark.conf.get(key) == prev)
      // target ≤ 0 disables the derivation entirely
      spark.conf.set(StreamShuffle.BytesPerPartitionKey, "-1")
      try StreamShuffle.withInputSizedShuffle(spark, Seq(dir.toString)) {
        assert(spark.conf.get(key) == prev)
      } finally spark.conf.unset(StreamShuffle.BytesPerPartitionKey)
    } finally {
      val wk = java.nio.file.Files.walk(dir)
      try wk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally wk.close()
    }
  }

  test("conf target overrides the 128 MB default") {
    spark.conf.set(StreamShuffle.BytesPerPartitionKey, "100")
    try {
      val cap = spark.sparkContext.defaultParallelism
      assert(StreamShuffle.partitionsFor(spark, 250L) ==
        math.min(3, cap))
    } finally spark.conf.unset(StreamShuffle.BytesPerPartitionKey)
  }
}
