package graft

import org.apache.spark.sql.SparkSession

import graft.ext.Dedup

/** Measures the banded channel's occupancy caps (CellKnob pattern),
  * r14 edition: the three declared pair queries' plans with
  * maxBandOccupancy ∈ {0 (unbounded), 64 (declared)} on each dataset —
  * count() materialization over a pre-materialized signature store, so
  * the delta isolates the candidate channel, and the row counts ARE the
  * recall adjudication (rows(64) / rows(0) on identical verification).
  * Stratified runs its declared sig-cap 64 in both arms so the band-cap
  * delta is isolated there too. Output lines:
  *   CAPKNOB <dir> <query> cap=<c> <sec> s rows=<n>
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
      val hr = graft.ext.Ckpt.ser(Dedup.hashedShingleRows(Tables.documents(spark, dir)))
      val bands = graft.ext.Ckpt.ser(Dedup.minhashBands(hr))
      def run(query: String, cap: Int)(mk: => org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        val n = mk.count()
        println(f"CAPKNOB $dir $query cap=$cap ${(System.nanoTime() - t0) / 1e9}%.1f s rows=$n")
      }
      for (cap <- Seq(0, 64)) {
        run("near_dup_minhash", cap)(
          Dedup.nearDupMinhashFromHashes(hr, bands = Some(bands),
            maxBandOccupancy = cap))
        run("containment_near_dup", cap)(
          Dedup.containmentNearDupFromHashes(hr, bands = Some(bands),
            maxBandOccupancy = cap))
        run("containment_stratified", cap)(
          Dedup.containmentNearDupStratifiedFromHashes(hr, bands = Some(bands),
            maxSigOccupancy = 64, maxBandOccupancy = cap))
      }
    }
    spark.stop()
  }
}
