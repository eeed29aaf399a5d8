package graft.util

import java.nio.file.{Files, Path, Paths}

/** Process-scoped scratch directories: created under java.io.tmpdir and
  * removed by a single JVM shutdown hook, so repeated Verify/Bench/spec
  * runs don't litter /tmp with derived layouts (round-2 nit: the
  * streaming-entry segment dirs were left behind). */
object Scratch {

  private val created =
    java.util.Collections.synchronizedList(new java.util.ArrayList[Path]())

  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => created.forEach(p => deleteRecursively(p))))

  /** New empty scratch dir, deleted on JVM exit. */
  def dir(prefix: String): String = {
    hook
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { Files.deleteIfExists(f); () })
      finally s.close()
    }

  def deleteRecursively(p: String): Unit = deleteRecursively(Paths.get(p))
}

/** Graceful SparkContext shutdown. AQE cancels in-flight broadcast jobs
  * when empty-relation propagation removes a join (e.g. a no-match query
  * joining docids to the docs table); the killed tasks keep reporting
  * status briefly, and calling `spark.stop()` under them shuts the
  * TaskResultGetter pool mid-report — every late statusUpdate then logs
  * `ERROR TaskSchedulerImpl: Exception in statusUpdate`. Harmless, but
  * it buries real errors, so wait for the scheduler to go quiet first. */
object SparkQuiesce {
  def stop(spark: org.apache.spark.sql.SparkSession,
           timeoutMs: Long = 10000L): Unit = {
    val tracker = spark.sparkContext.statusTracker
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    def busy() = tracker.getActiveJobIds().nonEmpty ||
      tracker.getExecutorInfos.exists(_.numRunningTasks() > 0)
    while (busy() && System.nanoTime() < deadline) Thread.sleep(50)
    spark.stop()
  }
}
