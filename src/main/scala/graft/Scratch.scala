package graft

import java.io.File
import java.lang.management.ManagementFactory

/** Deterministic scratch directories for queries that model a PERSISTED
  * warehouse/store table (the rollup/join MVs, schema-evolution days,
  * CSV/JSONL/ORC round trips). Each query keys its path by a stable
  * tag, so the 4+ Verify/Bench passes of one run overwrite a single
  * directory in place instead of leaking a fresh UUID directory per
  * invocation. The root is namespaced by PID — two JVMs (a Verify and a
  * Bench started together) can never clobber each other mid-read — and
  * the whole per-process root is removed by a JVM shutdown hook, so
  * nothing outlives the run.
  *
  * WITHIN one JVM the per-tag path is additionally keyed by the calling
  * THREAD id: a sequential driver (Verify/Bench loop one query at a
  * time) reuses one directory per tag exactly as before, while a
  * parallel in-process runner gets a distinct directory per worker
  * thread, so one query's overwrite can never race another query's lazy
  * read of the same tag. (Every `dir()` tag is write-then-read inside a
  * single query closure, so thread-local isolation is sufficient.)
  */
object Scratch {
  private val pid: String =
    ManagementFactory.getRuntimeMXBean.getName.takeWhile(_ != '@')

  private val root = new File(
    sys.props("java.io.tmpdir"), s"graft-scratch-$pid")

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(root)))
  }

  private def deleteRec(f: File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRec)
    f.delete()
    ()
  }

  /** Stable per-run, per-thread path for `tag`; callers write with
    * mode=overwrite.
    */
  def dir(tag: String): String =
    new File(root, s"$tag-t${Thread.currentThread().getId}").getPath
}
