package graft.query

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-side zone-map routing shared by the loaded-artifact servers
  * ([[LoadedPointServer]], [[LoadedPhraseServer]]): read a write-time
  * range manifest once (O(files) driver state), then map a point key to
  * its covering file(s) — normally exactly one, since range
  * partitioning gives disjoint ranges. Linear scans over the manifest
  * are fine at any realistic file count (a 100 TB index at 4M rows/file
  * is ~10⁵ entries; swap in a binary search then). */
private[query] object Routing {

  /** Sorted (lo, hi, file) ranges of a STRING-keyed artifact. */
  def stringRanges(spark: SparkSession,
                   path: String): Array[(String, String, String)] =
    spark.read.parquet(path)
      .select(col("lo").cast("string"), col("hi").cast("string"), col("file"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)

  /** Sorted (lo, hi, file) ranges of a LONG-keyed artifact. */
  def longRanges(spark: SparkSession,
                 path: String): Array[(Long, Long, String)] =
    spark.read.parquet(path)
      .collect()
      .map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi"),
        r.getAs[String]("file")))
      .sortBy(_._1)

  def route(ranges: Array[(String, String, String)], key: String): Seq[String] =
    ranges.iterator.filter(r => r._1 <= key && key <= r._2).map(_._3).toSeq

  def route(ranges: Array[(Long, Long, String)], key: Long): Seq[String] =
    ranges.iterator.filter(r => r._1 <= key && key <= r._2).map(_._3).toSeq

  /** Access-ordered LRU with eldest eviction, for prepared plans keyed
    * by file set (and, for phrase templates, phrase length): hot keys
    * keep their plans, cold ones rebuild on next touch. */
  def lru[K, V](maxPlans: Int): java.util.LinkedHashMap[K, V] =
    new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[K, V]): Boolean =
        size() > maxPlans
    }
}
