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
}
