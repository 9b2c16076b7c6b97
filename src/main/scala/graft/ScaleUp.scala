package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up synthesizer — builds an sf1-equivalent (~10×)
  * dataset from the sf0.1 seed ENTIRELY inside Spark, for the scale-up
  * validation run (VERDICT r9 "Next round" #1). No RNG: copy `i` of each
  * fact/dim row is the seed row with its keys shifted by `i × stride`
  * (stride = the seed table's dense key-domain size), so every foreign
  * key lands on the same-copy parent and all join/aggregate semantics of
  * the seed replay exactly, 10× over. Per-copy content transforms keep
  * the INTRA-copy statistics of the seed while preventing spurious
  * CROSS-copy duplicates (which would turn a 10× corpus into a 90%-dup
  * corpus and measure a different regime than "10× more data"):
  *
  *   - `documents.text`: every token gets a `_i` suffix for copy i>0 —
  *     token/shingle sets become disjoint across copies, so the seed's
  *     dup-rate and group-size distribution is preserved at 10× rows
  *     (what a real 10× crawl looks like), not inflated to all-dups.
  *   - `embeddings.embedding`: the vector is ROTATED by `(i·7) mod 64`
  *     positions — norm-preserving, deterministic, and rotated copies
  *     decorrelate, so ANN cell occupancy grows ~10× instead of every
  *     cell holding 10 identical points.
  *   - names (`c_name`/`p_name`/`s_name`) get a `-i` suffix so
  *     name-keyed ops (fuzzy match blocking, dim dedup) keep one
  *     distinct name per key.
  *
  * region/nation stay fixed (TPC-H semantics: they never scale), which
  * is exactly what makes the BHJ-vs-SMJ flip observable: bounded dims
  * stay broadcastable at any sf while customer/supplier cross the
  * autoBroadcast threshold.
  *
  * Writes one parquet dir per table under the target dir (same layout
  * the Tables loader expects). Usage:
  *   SPARK_GRAFT_SCALE_FACTOR=10 sbt "runMain graft.ScaleUp"
  */
object ScaleUp {
  // Dense 0-based key-domain sizes of the sf0.1 seed (verified against
  // the data: max key + 1).
  private val strides = Map(
    "orders" -> 150000L, "customer" -> 15000L, "supplier" -> 1000L,
    "part" -> 20000L, "events" -> 100000L, "user" -> 1500L,
    "documents" -> 5000L, "embeddings" -> 2000L)

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
    val dst = sys.env.getOrElse("SPARK_GRAFT_SCALE_DST", "/root/repo/scale-data/sf1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.sessionDefaults.foldLeft(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false"))((b, kv) => b.config(kv._1, kv._2))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    write(spark, src, dst, factor)
    spark.stop()
  }

  def write(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    // Optional table subset (comma-separated) — the BHJ→SMJ flip capture
    // only needs the relational star at factor 100, not a 500k-doc corpus.
    val wanted = sys.env.get("SPARK_GRAFT_SCALE_TABLES").map(_.split(",").toSet)
    def save(name: String, df: => DataFrame, files: Int): Unit =
      if (wanted.forall(_.contains(name)))
        df.repartition(files).write.mode("overwrite").parquet(s"$dst/$name.parquet")
    // Fixed dims: copy through unchanged.
    for (t <- Seq("region", "nation") if wanted.forall(_.contains(t)))
      Tables(spark, src, t).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    save("customer", replicate(spark, src, "customer", factor) { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * strides("customer")))
        .withColumn("c_name", suffixed(col("c_name"), i))
    }, 8)
    save("supplier", replicate(spark, src, "supplier", factor) { (df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(i * strides("supplier")))
        .withColumn("s_name", suffixed(col("s_name"), i))
    }, 4)
    save("part", replicate(spark, src, "part", factor) { (df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i * strides("part")))
        .withColumn("p_name", suffixed(col("p_name"), i))
    }, 8)
    save("orders", replicate(spark, src, "orders", factor) { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * strides("orders")))
        .withColumn("o_custkey", col("o_custkey") + lit(i * strides("customer")))
    }, 16)
    save("lineitem", replicate(spark, src, "lineitem", factor) { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * strides("orders")))
        .withColumn("l_partkey", col("l_partkey") + lit(i * strides("part")))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * strides("supplier")))
    }, 32)
    save("events", replicate(spark, src, "events", factor) { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * strides("events")))
        .withColumn("user_id", col("user_id") + lit(i * strides("user")))
    }, 16)
    save("documents", replicate(spark, src, "documents", factor) { (df, i) =>
      // The per-copy suffix must SURVIVE the text pipeline's
      // [^a-z0-9]→space tokenizer: an "_i" suffix splits into an
      // interleaved digit token, which collapses every copy's 2-word
      // shingle vocabulary to ~2·|vocab| and turns the whole copy into
      // one genuine near-dup group (measured: 99.6M band candidates at
      // factor 10 vs the intended ~10×204k). An all-LETTER suffix keeps
      // one token per seed token, so each copy replays the seed's
      // shingle structure over a disjoint token universe. Base-26 so the
      // suffix stays [a-z] for ANY factor (a single 'a'+i char walks
      // past 'z' at i>26 and reintroduces the split-token collapse).
      def b26(n: Int): String =
        if (n < 26) ('a' + n).toChar.toString
        else b26(n / 26 - 1) + ('a' + n % 26).toChar
      // The suffix decorrelates copies at the TOKEN level but not at
      // the CHARACTER level: a suffixed token keeps every interior
      // char-3-gram of its seed token, so all `factor` copies of a doc
      // share ~50% of their gram SETS (measured at factor 10: jaccard
      // 0.45–0.58 between copies, under any sane near-dup threshold
      // but far above corpus background). Against a [a-z0-9 ]³ ≤ 37³
      // gram universe that cannot grow with the corpus, gram posting
      // lists then scale ∝ factor and char-gram candidate volume
      // quadratically in density — the factor-100 run drove
      // ngram_jaccard's candidate join into ~80 GB of shuffle spill
      // and a disk-full abort while its TRUE output stayed flat (every
      // cross-copy pair verifies below 0.8). A real 100× crawl does
      // not share half its gram vocabulary corpus-wide, so copy i>0
      // additionally runs through a per-copy AFFINE LETTER CIPHER
      // (x → a·x + b mod 26 with a coprime to 26 — 312 distinct
      // permutations, deterministic, bijective): intra-copy gram
      // structure is preserved exactly (any alphabet bijection maps
      // gram sets 1:1), cross-copy gram sets decorrelate to corpus
      // background, and letters stay letters for the tokenizer. The
      // cipher is applied BEFORE the suffix so suffix letters are
      // plain and per-copy token disjointness keeps holding via the
      // suffix alone at every factor.
      //
      // KNOWN LIMITS of the decorrelation claim (ADVICE r12) — both are
      // corpus/factor-dependent, not general guarantees:
      //   - LETTERS ONLY: digits, punctuation and whitespace pass
      //     through, so char-grams containing non-letters stay shared
      //     across every copy of a numeric/symbol-heavy doc. Measured
      //     cross-copy jaccard on THIS corpus is 0.00–0.01 (word-soup
      //     text, few digits); a digit-heavy seed corpus would need the
      //     map extended to [0-9].
      //   - ONLY 312 DISTINCT CIPHERS exist (12 coprime slopes × 26
      //     offsets), so at factor > 312 copies repeat ciphers and
      //     cross-copy gram sharing returns for the repeats. Factors
      //     used here (10, 100) stay well inside the budget.
      val coprimes = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
      def cipher(n: Int): String = {
        val a = coprimes((n / 26) % coprimes.size)
        val b = n % 26
        (0 until 26).map(x => ('a' + (a * x + b) % 26).toChar).mkString
      }
      val alpha = "abcdefghijklmnopqrstuvwxyz"
      val enc = if (i == 0) col("text")
        else translate(col("text"), alpha + alpha.toUpperCase,
          cipher(i) + cipher(i).toUpperCase)
      val text = if (i == 0) col("text")
        else regexp_replace(enc, "(\\S+)", "$1q" + b26(i - 1))
      df.withColumn("doc_id", col("doc_id") + lit(i * strides("documents")))
        .withColumn("text", text)
    }, 16)
    save("embeddings", replicate(spark, src, "embeddings", factor) { (df, i) =>
      val rot = (i * 7) % 64
      val emb = if (rot == 0) col("embedding")
        else concat(slice(col("embedding"), rot + 1, 64 - rot),
          slice(col("embedding"), 1, rot))
      df.withColumn("vec_id", col("vec_id") + lit(i * strides("embeddings")))
        .withColumn("embedding", emb)
    }, 8)
  }

  /** factor key-shifted copies of the seed table, unioned by name. */
  private def replicate(spark: SparkSession, src: String, name: String,
      factor: Int)(remap: (DataFrame, Int) => DataFrame): DataFrame = {
    val seed = Tables(spark, src, name)
    (0 until factor).map(i => remap(seed, i)).reduce(_.unionByName(_))
  }

  /** `name` → `name-i` for copy i>0; identity on copy 0. */
  private def suffixed(c: Column, i: Int): Column =
    if (i == 0) c else concat(c, lit(s"-$i"))
}
