package graft

import org.apache.spark.sql.SparkSession

/** Env-driven session-conf overrides for the runner mains
  * (Verify/Bench/Prof): `SPARK_GRAFT_EXTRA_CONF="k=v;k=v"` is applied
  * AFTER each runner's defaults, so a single env var can reshape a run
  * to cluster conf without touching code — e.g.
  *
  *   SPARK_GRAFT_EXTRA_CONF="spark.sql.shuffle.partitions=200;\
  *     spark.sql.adaptive.enabled=true"
  *
  * is the cluster-shaped correctness run (AQE on, 10× partitions,
  * default broadcast thresholds) CLUSTERCONF.md records. */
object ExtraConf {
  val EnvKey = "SPARK_GRAFT_EXTRA_CONF"

  def apply(b: SparkSession.Builder): SparkSession.Builder =
    sys.env.get(EnvKey).toSeq
      .flatMap(_.split(';')).map(_.trim).filter(_.nonEmpty)
      .foldLeft(b) { (bb, kv) =>
        val i = kv.indexOf('=')
        require(i > 0, s"$EnvKey entry must be key=value, got: $kv")
        bb.config(kv.take(i).trim, kv.drop(i + 1).trim)
      }
}
