package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SMALL-FILE COMPACTION — the table-maintenance pass every
  * long-running ingest needs: streaming micro-batches, per-day
  * dynamic-partition overwrites, and incremental-store appends all
  * accrete files far below the HDFS/S3 sweet spot, and at 100 TB the
  * resulting footer/open overhead dominates scan time (a 128 MB-target
  * table in 1 MB files pays ~128× the metadata and request cost per
  * scan).
  *
  * `plan` sizes the rewrite from the ACTUAL on-disk bytes (Hadoop
  * FileSystem listing — no data read), so the output file count is
  * `ceil(bytes / targetBytes)` rather than a guessed `coalesce(n)`;
  * `compact` rewrites with `repartition(n)` (a real exchange, so output
  * files are even-sized — `coalesce` would glue whole input files
  * together and keep the skew) into a temp sibling directory, then
  * atomically swaps. Optionally sorts within partitions on a key so the
  * rewrite doubles as a clustering pass (min/max stats stay useful —
  * pair with [[ZOrder]] for two-key layouts).
  */
object Compaction {

  /** Total bytes + file count of the parquet files under `dir`. */
  def stats(spark: SparkSession, dir: String): (Long, Int) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter { s =>
      s.isFile && s.getPath.getName.endsWith(".parquet")
    }
    (files.map(_.getLen).sum, files.length)
  }

  /** Output file count for `targetBytes`-sized files (≥ 1). */
  def plan(spark: SparkSession, dir: String, targetBytes: Long): Int = {
    val (bytes, _) = stats(spark, dir)
    math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
  }

  /** Rewrite the parquet table at `dir` into [[plan]]-many even files,
    * optionally sort-clustered on `sortCols` within each output file.
    * The rewrite lands in `<dir>__compact` and swaps in atomically
    * (rename), so concurrent readers see either the old or the new
    * layout, never a partial one. Returns the output file count.
    */
  def compact(spark: SparkSession, dir: String, targetBytes: Long,
      sortCols: Seq[String] = Nil): Int = {
    val n = plan(spark, dir, targetBytes)
    val df = spark.read.parquet(dir)
    val arranged = {
      val even = df.repartition(n)
      if (sortCols.isEmpty) even
      else even.sortWithinPartitions(sortCols.head, sortCols.tail: _*)
    }
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir + "__compact")
    arranged.write.mode("overwrite").parquet(tmp.toString)
    val old = new Path(dir + "__old")
    require(fs.rename(p, old), s"could not stage $dir aside")
    require(fs.rename(tmp, p), s"could not swap $tmp into place")
    fs.delete(old, true)
    n
  }
}
