package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Each table is one parquet file under the scale-factor directory. Reads
  * are plain `spark.read.parquet`, so Catalyst predicate pushdown / column
  * pruning reach the scan — callers should select/filter on the returned
  * DataFrame and let the optimizer prune.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.ts is nanosecond-precision parquet, which Spark 4 refuses to
    * read as TIMESTAMP. Read it as a long via an EXPLICIT user schema
    * (ts: LONG) — no session conf involved (the legacy `nanosAsLong`
    * toggle this used to flip globally is unnecessary when the schema
    * is supplied, and flipping shared-session conf inside a reader was
    * a scoping bug) — keep the exact value as `ts_ns` (total ordering
    * without µs-truncation collisions), and derive a µs `ts` TIMESTAMP
    * for the datetime API. */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    deriveEventTime(spark.read.schema(eventsRawSchema)
      .parquet(s"$sfDir/events.parquet"))

  /** The ns→µs event-time derivation shared by the batch loader above
    * and the streaming reader ([[graft.streaming.EventsStream]]): one
    * definition, so batch oracle and stream can never disagree on event
    * time. */
  def deriveEventTime(raw: DataFrame): DataFrame =
    raw.withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))

  /** Explicit schema of the raw events parquet (ns-precision ts read
    * as a plain long) — supplied to every events read so no legacy
    * session conf is needed, and lets a streaming reader start on a
    * still-empty ingest directory, where inference has nothing to read. */
  val eventsRawSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
  }

  /** Register every table as a temp view (idempotent) and return the dir. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}
