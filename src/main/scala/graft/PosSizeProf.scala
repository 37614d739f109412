package graft

import org.apache.spark.sql.SparkSession

/** Measures the positional index's durable layouts (SCALING.md): bytes
  * of `pos_postings` written plain (`positions ARRAY<INT>` under
  * parquet's own encodings) vs varint-gap compressed (`pos_z` BINARY),
  * at a given SF dir. Parquet already delta/dictionary/snappy-encodes
  * int arrays, so the codec's win is an empirical question per corpus
  * shape — this main answers it with numbers instead of folklore.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.PosSizeProf"`
  */
object PosSizeProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = ExtraConf(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.index.PositionalIndex
    val ix = PositionalIndex.build(spark,
      graft.queries.IrEngine.corpus(spark, sfDir))
    val plain = java.nio.file.Files.createTempDirectory("pos_sz_p").toString
    val comp = java.nio.file.Files.createTempDirectory("pos_sz_z").toString
    PositionalIndex.write(ix, plain)
    PositionalIndex.write(ix, comp, compressed = true)
    def bytes(d: String): Long = new java.io.File(s"$d/pos_postings")
      .listFiles().filter(_.getName.endsWith(".parquet"))
      .map(_.length()).sum
    val (bp, bz) = (bytes(plain), bytes(comp))
    println(f"[pos-size] sf=$sfDir plain=$bp%d varint=$bz%d " +
      f"ratio=${bz.toDouble / bp}%.3f")
    spark.stop()
  }
}
