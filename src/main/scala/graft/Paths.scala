package graft

/** Tiny filesystem helpers shared by harness code (gate index caches,
  * scale probes) — NOT part of the engine surface. */
object Paths {
  /** Recursively delete a directory tree. Best-effort: per-entry delete
    * failures are ignored (the callers clean up temp state). */
  def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(rmTree))
    f.delete()
    ()
  }

  /** Temp directory removed RECURSIVELY at JVM exit. The common
    * `deleteOnExit()` idiom silently leaks non-empty directories
    * (`File.delete` only removes empty ones) — every scratch dir that
    * accumulates written data (parquet indexes, exports, stream feeds)
    * must use this instead. */
  def scratchDir(prefix: String): java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => rmTree(dir.toFile)))
    dir
  }
}
