package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Formatted-plan capture for the optimization rounds: writes
  * `<out>/<query>_<suffix>.txt` with `.explain("formatted")` output for
  * each named query — the before/after evidence files the round's
  * OPTIMIZATION_r{N}.md references (`plans/r16/...`).
  *
  * For LAZY entries the dump is the returned frame's full physical
  * plan. Entries that execute eagerly while being CONSTRUCTED
  * (driver-side panels, staged pipelines — the [[Plans]] main's
  * q25_kmeans rule) would dump only their terminal one-row frame, so
  * for those this main dumps the dominant internal ARM(s) instead,
  * labeled in the file header.
  *
  * Usage: `sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> q... q..."`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <sfDir> <outDir> <suffix> <query> [query...]")
    val sfDir = args(0)
    val out = args(1)
    val suffix = args(2)
    val names = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = ExtraConf(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    Files.createDirectories(Paths.get(out))

    def fmt(df: DataFrame): String =
      df.queryExecution.explainString(ExplainMode.fromString("formatted"))

    /** Eager panels dump their dominant arms, not the one-row result. */
    def arms(name: String): Seq[(String, DataFrame)] = name match {
      case "q24_dedup_eval" =>
        graft.ops.Dedup.dedupEvalArms(spark, sfDir) match {
          case (lsh, truth) => Seq("lsh-arm" -> lsh, "truth-arm" -> truth)
        }
      case "q26_ir_rm3" =>
        // the returned frame is only pass 3; the r16/r17 changes are
        // in pass 2 (the relevance-model frame — r17 fuses pass 1
        // into it as a broadcast subtree), so dump both
        val ix = graft.index.InvertedIndex.build(spark,
          graft.queries.IrEngine.corpus(spark, sfDir), k = 1)
        val terms =
          graft.query.QueryEngine.requireArity("merge stream").distinct
        Seq("rm-model-arm" ->
            graft.query.QueryEngine.rm3ModelOver(ix,
              graft.query.QueryEngine.searchTop(ix, terms, 5), 10),
          "returned-frame" -> SparkEntry.queries(name)(spark, sfDir))
      case _ =>
        Seq("returned-frame" -> SparkEntry.queries(name)(spark, sfDir))
    }

    names.foreach { n =>
      val body = arms(n).map { case (label, df) =>
        s"== PlanDump arm: $label ==\n" + fmt(df)
      }.mkString("\n\n")
      Files.writeString(Paths.get(out, s"${n}_$suffix.txt"), body)
      println(s"[plandump] wrote $out/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
