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
    * read as TIMESTAMP. Read it as a long (legacy nanosAsLong), keep the
    * exact value as `ts_ns` (total ordering without µs-truncation
    * collisions), and derive a µs `ts` TIMESTAMP for the datetime API. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }

  /** Register every table as a temp view (idempotent) and return the dir. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}
