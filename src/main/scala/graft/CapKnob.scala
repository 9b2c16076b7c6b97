package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Measures the stratified skew channel's sig-bucket occupancy cap
  * (CellKnob pattern): containment_stratified's plan with
  * maxSigOccupancy ∈ {0 (declared, unbounded), 64} on one dataset —
  * noop-sink materialization over a pre-materialized signature store,
  * so the delta isolates the candidate channel. Output lines:
  *   CAPKNOB <dir> cap=<c> <sec> rows=<n>
  */
object CapKnob {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/repo/scale-data/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.sessionDefaults.foldLeft(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false"))((b, kv) => b.config(kv._1, kv._2))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- dirs) {
      val hr = Dedup.hashedShingleRows(Tables.documents(spark, dir)).localCheckpoint()
      val bands = Dedup.minhashBands(hr).localCheckpoint()
      for (cap <- Seq(0, 64)) {
        val t0 = System.nanoTime()
        val out = Dedup.containmentNearDupStratifiedFromHashes(
          hr, bands = Some(bands), maxSigOccupancy = cap)
        val n = out.count()
        println(f"CAPKNOB $dir cap=$cap ${(System.nanoTime() - t0) / 1e9}%.1f s rows=$n")
      }
    }
    spark.stop()
  }
}
