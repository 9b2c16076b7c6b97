package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up PLAN evidence capture (VERDICT r9 "Next round" #1): executes
  * the unhinted-dim join shapes (`star_join`, `q5_local_volume`) at each
  * given sf dir and records which physical join strategy AQE chose for
  * the customer and supplier joins in the FINAL adaptive plan — the
  * BHJ→SMJ flip past the autoBroadcast threshold is the load-bearing
  * claim behind the "pin only bounded dims, leave customer/supplier to
  * AQE" broadcast policy. Also runs a planted-hot-key join and asserts
  * AQE's skew-split engages (`skew=true` on the sort-merge join /
  * PartialReducer splits in the shuffle read).
  *
  * The skew demo tunes `skewedPartitionThresholdInBytes` /
  * `advisoryPartitionSizeInBytes` down to values proportionate to the
  * local dataset (a 256 MB default threshold is a 1000-executor
  * setting; the point proven is that the MECHANISM engages on a hot
  * key, with the knobs doing the same proportional job they do at
  * 100 TB). Everything else runs Spark 4 defaults.
  *
  * Usage: sbt "runMain graft.ScaleCheck <sfDir> [sfDir...]"
  * Writes SCALE_EVIDENCE_r10.md and prints one JSON line per dir.
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/scale-data/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.sessionDefaults.foldLeft(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false"))((b, kv) => b.config(kv._1, kv._2))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val md = new StringBuilder
    md ++= "# SCALE EVIDENCE — round 10\n\n"
    md ++= "Captured by `graft.ScaleCheck` (final ADAPTIVE plans, after execution —\n"
    md ++= "not the static planner guess). Joins listed are the UNHINTED dim joins\n"
    md ++= "the broadcast policy leaves to AQE.\n\n"
    for (dir <- dirs) {
      md ++= s"## $dir\n\n"
      for (q <- Seq("star_join", "q5_local_volume")) {
        val df = SparkEntry.queries(q)(spark, dir)
        // Execute THIS QueryExecution (a .write would plan its own), so
        // the captured adaptive plan is the final one (isFinalPlan=true)
        // — the static plan records the ESTIMATE-based guess, not what
        // AQE decided from measured shuffle sizes.
        val qe = df.queryExecution
        qe.toRdd.count()
        val plan = qe.executedPlan.toString
        val joinLines = plan.linesIterator
          .filter(l => l.contains("Join") && !l.contains("ReusedExchange"))
          .map(_.trim.replaceAll("#\\d+L?", "")).toSeq
        val custStrategy = strategyOf(joinLines, "c_custkey")
        val supStrategy = strategyOf(joinLines, "s_suppkey")
        println(s"""{"dir":"$dir","query":"$q","customer_join":"$custStrategy","supplier_join":"$supStrategy"}""")
        md ++= s"### $q\n\n"
        md ++= s"- customer join: **$custStrategy**\n"
        md ++= s"- supplier join: **$supStrategy**\n"
        md ++= "```\n" + joinLines.map(l => l.take(150)).mkString("\n") + "\n```\n\n"
      }
    }
    // Skew-split evidence: 30% of sf1 lineitem collapses onto one hot
    // orderkey, then a shuffle join against orders. With proportionate
    // thresholds AQE must split the hot partition (skew=true).
    val big = dirs.last
    md ++= s"## AQE skew-split on a planted hot key ($big)\n\n"
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.lineitem(spark, big)
        .withColumn("k",
          when(col("l_orderkey") % 10 < 3, lit(42L)).otherwise(col("l_orderkey")))
      val o = Tables.orders(spark, big).withColumn("k", col("o_orderkey"))
      val j = li.join(o, "k")
        .groupBy("l_returnflag").agg(sum("o_totalprice").as("s"))
      val qe = j.queryExecution
      qe.toRdd.count()
      val plan = qe.executedPlan.toString
      val skewed = plan.contains("skew=true")
      println(s"""{"dir":"$big","check":"skew_split","engaged":$skewed}""")
      md ++= (if (skewed) "AQE split the hot partition — the join carries `skew=true`:\n"
        else "**skew split did NOT engage** — plan below:\n")
      md ++= "```\n" + plan.linesIterator
        .filter(l => l.contains("Join") || l.contains("AQEShuffleRead"))
        .map(_.trim.replaceAll("#\\d+L?", "").take(150)).mkString("\n") + "\n```\n"
    } finally {
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/SCALE_EVIDENCE_r10.md"), md.toString)
    spark.stop()
  }

  /** The join strategy (plan-node name) of the first join line whose
    * condition mentions `key`.
    */
  private def strategyOf(joinLines: Seq[String], key: String): String =
    joinLines.find(_.contains(key))
      .map(_.split("\\s+").find(_.contains("Join")).getOrElse("?"))
      .getOrElse("absent")
}
