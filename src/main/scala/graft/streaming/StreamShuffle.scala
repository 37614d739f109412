package graft.streaming

import org.apache.spark.sql.SparkSession

/** Input-sized shuffle-partition derivation for the STREAMING query
  * paths (guide §2.2: make partitioning scale-adaptive — derive it
  * from input size — instead of a constant tuned for either local
  * mode or the cluster).
  *
  * Why streams specifically: every stateful operator and foreachBatch
  * job in a micro-batch runs at `spark.sql.shuffle.partitions`, which
  * the runner mains size to the CORE COUNT. A micro-batch carries a
  * trigger's worth of data — at bench scale a few MB — so 32 cores
  * schedule 32-task shuffles over kilobytes per task: pure scheduling
  * and state-store overhead that GROWS with core count. The r16
  * driver measured exactly that inversion (q26_ir_stream 10.4 s at 32
  * cores vs 5.9 s at 8; q29_join 6.6 vs 4.1 — scaling ratios 0.57 /
  * 0.63 on unchanged code). Partitions must follow the data volume,
  * capped at the parallelism actually available:
  *
  *   partitions = clamp(ceil(inputBytes / bytesPerPartition), 1, cores)
  *
  * At 100 TB the cap binds (wide state, full parallelism); at bench
  * scale the byte term binds (one or two partitions, no 32-way fan of
  * empty tasks). `bytesPerPartition` is conf-overridable
  * ([[BytesPerPartitionKey]], default 128 MB — the guide §2.2
  * 100 MB–1 GB discipline's floor, matching
  * `spark.sql.files.maxPartitionBytes`); setting it ≤ 0 disables the
  * derivation entirely (the session default then applies, which is
  * how the cluster-shaped conf can opt out).
  *
  * The wrapper sets the session's shuffle partitions around the whole
  * stream run (start → processAllAvailable → stop) and RESTORES the
  * previous value in finally: the micro-batch engine clones session
  * state at `start()`, so both the stream's own stateful exchanges
  * and every foreachBatch job inherit the derived value, while
  * everything after the stream (final presentation sorts, other
  * queries) runs at the session default. Results are
  * partition-count-invariant (the sf0.01 oracle hash gate pins each
  * stream's output); only task counts change.
  */
object StreamShuffle {

  /** Target input bytes per stream shuffle partition; ≤ 0 disables
    * the input-sized derivation. */
  val BytesPerPartitionKey = "spark.graft.stream.bytesPerPartition"
  val BytesPerPartitionDefault: Long = 128L * 1024 * 1024

  /** Total bytes under a staged stream-source path (file or dir). */
  private def bytesUnder(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
  }

  /** clamp(ceil(bytes / target), 1, defaultParallelism). */
  private[graft] def partitionsFor(spark: SparkSession,
                                   bytes: Long): Int = {
    val target = spark.conf
      .get(BytesPerPartitionKey, BytesPerPartitionDefault.toString)
      .toLong
    require(target != 0, s"$BytesPerPartitionKey must not be 0")
    val cap = math.max(1, spark.sparkContext.defaultParallelism)
    math.max(1L, math.min(cap.toLong,
      (bytes + target - 1) / target)).toInt
  }

  /** Run `body` (a whole stream: start → processAllAvailable → stop)
    * with `spark.sql.shuffle.partitions` derived from the staged
    * inputs' size, restoring the session value afterwards. With the
    * derivation disabled (target ≤ 0) the body runs unchanged. */
  def withInputSizedShuffle[T](spark: SparkSession,
                               inputPaths: Seq[String])(body: => T): T = {
    val target = spark.conf
      .get(BytesPerPartitionKey, BytesPerPartitionDefault.toString)
      .toLong
    if (target <= 0) body
    else {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      val n = partitionsFor(spark,
        inputPaths.map(bytesUnder(spark, _)).sum)
      spark.conf.set(key, n.toString)
      try body finally spark.conf.set(key, prev)
    }
  }
}
