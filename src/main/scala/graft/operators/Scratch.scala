package graft.operators

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Per-JVM scratch directories under java.io.tmpdir that clean themselves
  * up on JVM exit. Query-level operators that persist state between steps
  * (the dedup index, the CDC snapshot replay, the IVF index) write under a
  * deterministic per-(application, corpus) path so repeated invocations in
  * one bench/verify run overwrite instead of accumulate — but the JVM-exit
  * sweep is what keeps a fleet of test/bench JVMs from leaving one full
  * index copy per run behind in /tmp.
  */
object Scratch {
  private val registered = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread("graft-scratch-sweep") {
      override def run(): Unit = registered.forEach(p => deleteRecursively(Paths.get(p)))
    })
  }

  private def deleteRecursively(root: Path): Unit =
    if (Files.exists(root)) {
      try {
        val walk = Files.walk(root)
        try walk.sorted(Comparator.reverseOrder[Path]())
          .forEach(p => try Files.deleteIfExists(p) catch { case _: java.io.IOException => () })
        finally walk.close()
      } catch { case _: java.io.IOException => () } // best-effort: exit hygiene, not correctness
    }

  /** A deterministic scratch path `<tmpdir>/<prefix>-<app>-<corpusHash>`,
    * registered for recursive deletion at JVM exit. Deterministic within a
    * (application, corpus) pair so re-invocations overwrite their own
    * output; unique across concurrent applications via applicationId. */
  def dir(prefix: String, applicationId: String, corpus: String): String = {
    hookInstalled
    val path = s"${System.getProperty("java.io.tmpdir")}/$prefix-$applicationId-" +
      s"${math.abs(corpus.hashCode)}"
    registered.add(path)
    path
  }
}
