package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import CrossHash._

/** Interchange-format round-trips: the documents table written to and
  * read back from CSV, JSON and ORC — the sources/sinks a data
  * pipeline meets beyond parquet. The probe emits, per format, the
  * row count and an ORDER-FREE exact content hash (sum of per-row
  * polynomial hashes — BIGINT, no overflow at P² × corpus): the DuckDB
  * oracle computes the same pair straight from the source table, so a
  * hash-match proves each format preserved every row byte-for-byte
  * through write → read (schema supplied on read; CSV/JSON carry no
  * types of their own).
  *
  * Scale shape: each leg is one narrow write and one narrow
  * aggregate-only read; formats differ only in the codec. (Writes go
  * to a per-run temp dir — this is a conformance probe, not a sink
  * recommendation; columnar parquet remains the layout everywhere
  * else.)
  */
object Formats {

  val RoundTripFormats: Seq[String] = Seq("csv", "json", "orc")

  /** Shared null sentinel for the digest (see the null-homogeneity
    * note in [[roundTrip]]). Applied AFTER the read, so it never
    * rides through a format itself; the control-char framing cannot
    * collide with any representable field value in these formats. */
  val NullSentinel = "\u0001null\u0001"

  def roundTrip(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val base = graft.TempDirs.scratch("graft_formats")
    // NULL-homogeneous hashing (ADVICE r8): Spark's concat_ws SKIPS
    // null fields while the oracle's '||' nulls the whole row and
    // drops it from the sum — a null lang/text would fail the probe
    // for a reason unrelated to format fidelity (and CSV additionally
    // conflates null with '' on read). Both engines coalesce each
    // field to the same sentinel before hashing, so the probe measures
    // round-trip fidelity of the content and nothing else.
    def digest(df: DataFrame, fmt: String): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
        sum(graft.functions.GraftFunctions.polyhash(
          concat_ws(" ", col("doc_id"),
            coalesce(col("lang"), lit(NullSentinel)),
            coalesce(col("text"), lit(NullSentinel))), P))
          .as("hash_sum"))
        .select(lit(fmt).as("format"), col("n_rows"), col("hash_sum"))
    RoundTripFormats.map { fmt =>
      val p = s"$base/$fmt"
      val w = docs.write.mode("overwrite")
      (fmt match {
        // CSV needs its lossy defaults disabled for a fair conformance
        // probe: the writer trims leading/trailing whitespace unless
        // told otherwise, a bare empty field reads back as null, and
        // embedded newlines need multiLine on the read side — without
        // these, representable text would false-fail the round-trip
        case "csv" => w.option("header", "true")
          .option("ignoreLeadingWhiteSpace", "false")
          .option("ignoreTrailingWhiteSpace", "false")
          .option("emptyValue", "\"\"")
        case _ => w
      }).format(fmt).save(p)
      val back = fmt match {
        case "csv"  => spark.read.option("header", "true")
          .option("multiLine", "true")
          .option("ignoreLeadingWhiteSpace", "false")
          .option("ignoreTrailingWhiteSpace", "false")
          .schema(docs.schema).csv(p)
        case "json" => spark.read.schema(docs.schema).json(p)
        case _      => spark.read.orc(p)
      }
      digest(back, fmt)
    }.reduce(_ unionByName _)
      .orderBy("format")
  }
}
