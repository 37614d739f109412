package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Physical-LAYOUT operators: how the bytes land on disk decides what a
  * 100 TB scan can skip. Parquet keeps per-row-group min/max stats for
  * every column; a table sorted by its insertion order has tight stats
  * only on time-correlated columns, so predicates on anything else read
  * everything. Z-ORDERING (Morton interleave of the filter columns'
  * bits) makes each row group cover a compact rectangle of the
  * (a, b) key space — min/max stay tight on BOTH columns and a
  * predicate on EITHER skips most row groups. Same mechanism the
  * lakehouse formats (Delta OPTIMIZE ZORDER, Iceberg sort orders)
  * expose; here it is a pure column expression + range-partitioned
  * sorted write, nothing engine-specific. */
object Layout {

  /** Bits per dimension interleaved into the z-value (16 → 32-bit
    * codes) — shared with the DuckDB oracle. */
  val MortonBits = 16

  /** Grid size per dimension (2^bits) — every fold/scale onto the grid
    * derives from this so the modulus and the interleave width can
    * never silently diverge. */
  val MortonGrid: Long = 1L << MortonBits

  /** Morton/Z interleave of the low [[MortonBits]] bits of two
    * non-negative longs: bit i of `a` lands at position 2i, bit i of
    * `b` at 2i+1. A flat bitwise-OR expression tree — codegen'd,
    * no UDF. */
  def morton(a: Column, b: Column, bits: Int = MortonBits): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** DuckDB fragment computing exactly [[morton]]. Arguments are cast
    * to BIGINT first — over INT32 inputs DuckDB's `<< 31` overflows. */
  def ddbMorton(a: String, b: String, bits: Int = MortonBits): String = {
    val (ab, bb) = (s"CAST($a AS BIGINT)", s"CAST($b AS BIGINT)")
    (0 until bits).map { i =>
      s"((($ab >> $i) & 1) << ${2 * i}) | ((($bb >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")
  }

  /** Q34: z-values for lineitem's (orderkey, partkey) — the filter
    * columns a mixed workload hits. Keys fold into the 16-bit grid by
    * modulus; the oracle embeds the identical interleave (identical on
    * the NON-NEGATIVE keys here — Spark `pmod` and DuckDB `%` diverge
    * below zero). */
  def q34ZValue(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        morton(pmod(col("l_orderkey"), lit(MortonGrid)),
          pmod(col("l_partkey"), lit(MortonGrid))).as("zval"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Rewrite a DataFrame into `files` parquet files z-ordered on
    * (a, b): range-partition by z-value (files cover disjoint compact
    * z-ranges), sort within each, drop the helper column.
    *
    * Both columns are linearly scaled onto the FULL 16-bit grid first
    * (two scalars from one min/max agg). Interleaving the raw values
    * is the classic z-order mistake: with unequal key widths the
    * z-value's high bits come entirely from the wider column, the
    * range boundaries degenerate to that column's order, and the
    * narrow column gets no skipping (measured: zero row groups
    * skipped). The scaling plays the role of Delta ZORDER's
    * range-id normalization. Small `parquet.block.size` values give
    * row-group-granular skipping even on small test data; production
    * leaves the default 128 MB. */
  def writeZOrdered(df: DataFrame, path: String, a: String, b: String,
                    files: Int, blockSize: Long = 128L * 1024 * 1024): Unit = {
    val zc = "_graft_z"
    require(!df.columns.contains(zc),
      s"input already has a $zc column — it would be overwritten")
    // cast to long up front: int key columns otherwise ClassCastException
    // out of the min/max Row below
    val r = df.agg(min(col(a).cast("long")), max(col(a).cast("long")),
      min(col(b).cast("long")), max(col(b).cast("long"))).head()
    if (r.isNullAt(0) || r.isNullAt(2)) {
      // empty input, or a key column with no non-null values: there is
      // no (a, b) grid to order on; write the dataset as-is (checking
      // BOTH mins — an all-null b used to NPE out of getLong below)
      df.write.mode("overwrite").parquet(path)
      return
    }
    val (aLo, aHi, bLo, bHi) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    def scaled(c: String, lo: Long, hi: Long): Column =
      if (hi == lo) lit(0L)
      // double division (Column./ is Divide): monotone onto the grid
      else ((col(c).cast("long") - lo).cast("double") *
        (MortonGrid - 1).toDouble / (hi - lo)).cast("long")
    df.withColumn(zc, morton(scaled(a, aLo, aHi), scaled(b, bLo, bHi)))
      .repartitionByRange(files, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
      .write.option("parquet.block.size", blockSize)
      .mode("overwrite").parquet(path)
  }
}
