package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Stage-wise cost profile of the prefix-filtered n-gram Jaccard plan
  * (diagnostic harness, Probe/SpillCheck class — not a query path).
  * Prints, per sf dir:
  *   - store build wall + row count (charGramSets);
  *   - gram posting-list profile (distinct grams, df p50/p99/max);
  *   - prefix-row count and the ANALYTIC candidate bound Σ_g p_g²
  *     over prefix postings p_g — computed WITHOUT running the pair
  *     join, so a quadratic configuration is diagnosed in seconds
  *     instead of a disk-full abort;
  *   - the top prefix grams by posting length (who is hot and why).
  */
object GramDiag {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/repo/scale-data/sf1")
    val threshold = sys.env.getOrElse("SPARK_GRAFT_GRAM_T", "0.8").toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.sessionDefaults.foldLeft(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false"))((b, kv) => b.config(kv._1, kv._2))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"GRAMDIAG $what ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    for (dir <- dirs) {
      println(s"GRAMDIAG === $dir ===")
      val g = timed("store_build")(
        graft.ext.Ckpt.ser(Dedup.charGramSets(Tables.documents(spark, dir))))
      val nDocs = g.count()
      val avgGrams = g.agg(avg(size(col("grams")))).head.getDouble(0)
      println(f"GRAMDIAG docs=$nDocs avg_grams=$avgGrams%.0f")
      val ex = g.select(col("doc_id"), col("lang"),
        size(col("grams")).as("n"), explode(col("grams")).as("gram"))
      val dfreq = timed("dfreq")(
        graft.ext.Ckpt.ser(ex.groupBy("gram").agg(count(lit(1)).as("df"))))
      dfreq.agg(count(lit(1)).as("grams"),
          expr("percentile_approx(df, 0.5)").as("p50"),
          expr("percentile_approx(df, 0.99)").as("p99"), max("df").as("max"))
        .collect().foreach(r => println(s"GRAMDIAG dfreq $r"))
      val w = Window.partitionBy("doc_id", "lang").orderBy(col("df"), col("gram"))
      val pfx = timed("prefix_rows")(
        ex.join(dfreq, "gram")
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <=
            (col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)) + 1))
          .select(col("doc_id"), col("lang"), col("n"), col("gram"))
          .localCheckpoint())
      println(s"GRAMDIAG prefix_rows=${pfx.count()}")
      // Analytic candidate bound: pairs meeting at gram g ≤ p_g²/2.
      val prof = pfx.groupBy("gram", "lang").agg(count(lit(1)).as("p"))
        .localCheckpoint()
      prof.agg(sum(col("p") * col("p")).as("sum_p2"), max("p").as("max_p"))
        .collect().foreach(r => println(s"GRAMDIAG candidate_bound $r"))
      println("GRAMDIAG hottest prefix grams (posting len, decoded):")
      prof.orderBy(col("p").desc).limit(15).collect().foreach { r =>
        val code = r.getLong(0)
        val s = (4 to 0 by -1).map(k => ((code >> (8 * k)) & 0xff).toChar).mkString
        println(f"GRAMDIAG   p=${r.getLong(2)}%8d gram='$s' lang=${r.getString(1)}")
      }
      // True candidate volume (distinct pairs after the size-ratio
      // residual) and verification wall — only when the analytic bound
      // says it is feasible.
      // coalesce: sum over zero rows is null (an empty corpus dir must
      // report bound 0, not abort the multi-dir sweep).
      val bound = prof.agg(coalesce(sum(col("p") * col("p")), lit(0L)))
        .head.getLong(0)
      if (bound <= 2e9) {
        val cand = timed("cand_distinct")(
          pfx.as("a").join(pfx.as("b"),
            col("a.gram") === col("b.gram") && col("a.lang") === col("b.lang") &&
              col("a.doc_id") < col("b.doc_id") &&
              col("a.n") >= lit(threshold) * col("b.n") - lit(1e-9) &&
              col("b.n") >= lit(threshold) * col("a.n") - lit(1e-9))
            .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
            .distinct().localCheckpoint())
        println(s"GRAMDIAG cand_pairs=${cand.count()}")
        val inter = graft.functions.SortedIntersectSize(col("ga"), col("gb"))
        val jac = inter / (size(col("ga")) + size(col("gb")) - inter).cast("double")
        val verified = timed("verify")(
          cand.repartition(32)
            .join(g.select(col("doc_id").as("doc_a"), col("grams").as("ga")), "doc_a")
            .join(g.select(col("doc_id").as("doc_b"), col("grams").as("gb")), "doc_b")
            .where(jac >= threshold).count())
        println(s"GRAMDIAG verified_pairs=$verified")
      } else println(s"GRAMDIAG cand SKIPPED (bound $bound)")
      // Background pair-J distribution: same-lang pairs at id offsets
      // 1 and 13 (same ScaleUp copy block) — what any candidate channel
      // must reject. Decile histogram of exact J.
      val ga = g.select(col("doc_id"), col("lang"), col("grams").as("ga"))
      for (off <- Seq(1L, 13L)) {
        val gb = g.select((col("doc_id") - off).as("doc_id"), col("lang"),
          col("grams").as("gb"))
        val inter = graft.functions.SortedIntersectSize(col("ga"), col("gb"))
        val j = inter / (size(col("ga")) + size(col("gb")) - inter).cast("double")
        ga.join(gb, Seq("doc_id", "lang"))
          .select(floor(j * 10).cast("int").as("dec"))
          .groupBy("dec").agg(count(lit(1)).as("n")).orderBy("dec")
          .collect().foreach(r =>
            println(s"GRAMDIAG pairJ off=$off decile=${r.getInt(0)} n=${r.getLong(1)}"))
      }
    }
    spark.stop()
  }
}
