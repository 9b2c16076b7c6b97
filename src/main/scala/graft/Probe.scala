package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/timing probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("ngram full")(ext.Dedup.ngramJaccardBlocked(docs).count())
    val mh = ext.Dedup.nearDupMinhash(docs)
    mh.explain("formatted")
    time("minhash full")(mh.count())
    spark.stop()
  }
}
