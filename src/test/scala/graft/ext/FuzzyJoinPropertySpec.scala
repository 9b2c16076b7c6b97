package graft.ext

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[FuzzyJoin.linkage]] ≡ the naive unblocked formulation whenever the
  * corruption preserves the blocking key — the distinct-name rewrite and
  * the length-band prefilter must be pure optimizations.
  */
class FuzzyJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val adjectives = Seq("azure", "rose", "mint", "plum", "jet", "sand")
  private val nouns = Seq("bolt", "ring", "plate", "gear", "widget", "crank")

  /** Deterministic dim: every adjective × noun combo, several skus per
    * name (the degenerate-catalog shape that motivated the rewrite).
    */
  private def dim: DataFrame = {
    val names = for {
      a <- adjectives; n <- nouns
    } yield s"$a $n"
    names.zipWithIndex.flatMap { case (nm, i) =>
      Seq((i * 10L + 1, nm), (i * 10L + 2, nm), (i * 10L + 3, nm))
    }.toDF("sku", "clean_name")
  }

  /** Random TAIL corruption with ≤ maxDist edits (never touches the
    * first token, so blocking is lossless by the documented contract).
    */
  private def corrupt(rng: Random, name: String, maxDist: Int): String = {
    var s = name
    val edits = rng.nextInt(maxDist + 1)
    val firstTokenEnd = name.indexOf(' ') + 1
    (1 to edits).foreach { _ =>
      if (s.length <= firstTokenEnd + 1) ()
      else rng.nextInt(3) match {
        case 0 => s = s + ('a' + rng.nextInt(26)).toChar // append
        case 1 => s = s.dropRight(1)                     // truncate
        case 2 =>                                        // substitute past token 1
          val i = firstTokenEnd + rng.nextInt(s.length - firstTokenEnd)
          s = s.updated(i, '#')
      }
    }
    s
  }

  private def naive(dirty: DataFrame, maxDist: Int): Set[(Long, Long, Int)] = {
    val cand = dirty.crossJoin(dim)
      .withColumn("dist", levenshtein(col("raw_name"), col("clean_name")))
      .where(col("dist") <= maxDist)
    val w = Window.partitionBy("rec_id")
      .orderBy(col("dist"), col("clean_name"), col("sku"))
    cand.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("rec_id", "sku", "dist")
      .as[(Long, Long, Int)].collect().toSet
  }

  test("linkage ≡ naive all-pairs best match under tail corruptions (3 seeds)") {
    for (seed <- Seq(7, 42, 1234)) {
      val rng = new Random(seed)
      val names = dim.select("clean_name").distinct().as[String].collect()
      val dirty = (1L to 120L).map { id =>
        (id, corrupt(rng, names(rng.nextInt(names.length)), 2))
      }.toDF("rec_id", "raw_name")
      val fast = FuzzyJoin
        .linkage(dirty, "rec_id", "raw_name", dim, "sku", "clean_name", 2)
        .select("rec_id", "sku", "dist")
        .as[(Long, Long, Int)].collect().toSet
      assert(fast === naive(dirty, 2), s"seed $seed diverged")
    }
  }

  test("planted first-token typos are recovered with the volume bound held") {
    // A HOT-FIRST-TOKEN catalog: every name starts with "premium", so
    // r8's single-key blocking would put all |d|×|c| pairs in ONE block.
    // The composite (pass, token, length-bucket) key must (a) still
    // recover a planted first-token typo via the last-token pass and
    // (b) keep the scored-candidate volume well under the full product.
    val hotDim = (0 until 60).map { i =>
      (i.toLong, s"premium ${nouns(i % nouns.length)} ${"x" * (i % 20)}$i")
    }.toDF("sku", "clean_name")
    val names = hotDim.as[(Long, String)].collect()
    val dirty = names.toSeq.map { case (sku, nm) =>
      // typo in the first token: "premium" → "premxum" (dist 1); last
      // token intact, so only the second pass can block it.
      (sku + 1000L, "premxum" + nm.drop(7))
    }.toDF("rec_id", "raw_name")
    val out = FuzzyJoin
      .linkage(dirty, "rec_id", "raw_name", hotDim, "sku", "clean_name", 2)
      .select("rec_id", "sku", "dist").as[(Long, Long, Int)].collect()
    assert(out.length === 60, "a first-token typo failed to link")
    assert(out.forall { case (rid, sku, dist) => sku === rid - 1000L && dist === 1 },
      "first-token typo linked to the wrong sku")
    // Volume bound on the EXACT frame linkage scores: the length-bucket
    // slice must cut the hot block far below the |d|·|c| product.
    val dNames = dirty.select("raw_name").distinct()
    val cNames = hotDim.groupBy("clean_name").agg(min(col("sku")).as("sku"))
    val vol = FuzzyJoin
      .candidates(dNames, "raw_name", cNames, "sku", "clean_name", 2).count()
    val full = dNames.count() * cNames.count()
    assert(vol * 4 < full,
      s"composite blocking did not bound the hot block: $vol of $full pairs")
  }

  test("every within-distance tail corruption is recalled (no silent miss)") {
    val rng = new Random(99)
    val names = dim.select("clean_name").distinct().as[String].collect()
    val dirty = (1L to 60L).map { id =>
      (id, corrupt(rng, names((id % names.length).toInt), 2))
    }.toDF("rec_id", "raw_name")
    val n = FuzzyJoin
      .linkage(dirty, "rec_id", "raw_name", dim, "sku", "clean_name", 2)
      .count()
    assert(n === 60L, "a tail-corrupted record failed to link")
  }
}
