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
