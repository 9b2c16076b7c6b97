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
  * WITHIN one JVM the stable per-tag paths assume the driver runs
  * queries SEQUENTIALLY (Verify and Bench loop one query at a time;
  * forked tests run suites serially) — that is what lets pass N+1
  * overwrite pass N's directory safely. A future PARALLEL runner would
  * race an overwrite against another query's lazy read of the same tag:
  * key `dir()` by tag+thread (or revert to per-invocation UUIDs) before
  * running queries concurrently in-process.
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

  /** Stable per-run path for `tag`; callers write with mode=overwrite. */
  def dir(tag: String): String = new File(root, tag).getPath
}
