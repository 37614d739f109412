package graft

/** Temp scratch directories with JVM-exit cleanup.
  *
  * The conformance queries that stage data through /tmp
  * (q25_ann_ivf_loaded's vector store, q38_formats' interchange
  * copies, q36_phrase_compressed's index) return DataFrames that read
  * those files LAZILY — deleting eagerly would break the caller, so
  * the correct lifetime is the JVM's: one shutdown hook walks every
  * registered root (catching files written after registration too),
  * and repeated runs stop leaking corpus-sized directories. */
object TempDirs {

  private val roots =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]

  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      roots.forEach { root =>
        try {
          val wk = java.nio.file.Files.walk(root)
          try wk.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
          finally wk.close()
        } catch { case _: Throwable => () }
      }
    }))
  }

  /** A fresh temp directory removed (recursively) at JVM exit. */
  def scratch(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    hookInstalled
    roots.add(p)
    p.toString
  }
}
