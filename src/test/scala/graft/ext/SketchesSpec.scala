package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Sketches]] — KMV distinct-count sketch: exactness below k, merge
  * associativity (batch-cut invariance), estimator accuracy, duplicate
  * insensitivity.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("groups with fewer than k distinct values are counted exactly") {
    val df = (1L to 1000L).map(i => (s"g${i % 4}", i % 40)).toDF("g", "v")
    val got = Sketches.kmvDistinct(df, Seq("g"), "v", k = 64)
      .as[(String, Long)].collect().toMap
    // values i%40 split by group i%4: each group sees 10 distinct values
    assert(got === Map("g0" -> 10L, "g1" -> 10L, "g2" -> 10L, "g3" -> 10L))
  }

  test("duplicate rows never change the sketch") {
    val base = (1L to 500L).map(i => ("g", i)).toDF("g", "v")
    val dups = base.union(base).union(base)
    val a = Sketches.kmvSketch(base, Seq("g"), "v", k = 32)
      .select("kmv_hash").as[Long].collect().sorted
    val b = Sketches.kmvSketch(dups, Seq("g"), "v", k = 32)
      .select("kmv_hash").as[Long].collect().sorted
    assert(a.toSeq === b.toSeq)
  }

  test("merge of arbitrary batch cuts equals the one-shot sketch") {
    val all = (1L to 3000L).map(i => (s"g${i % 2}", i)).toDF("g", "v")
    val oneShot = Sketches.kmvSketch(all, Seq("g"), "v", k = 64)
    // three uneven, overlapping batches (overlap = re-delivered rows)
    val cuts = Seq((1L, 1200L), (1000L, 2100L), (2000L, 3000L)).map { case (lo, hi) =>
      Sketches.kmvSketch(all.where(col("v").between(lo, hi)), Seq("g"), "v", k = 64)
    }
    val merged = cuts.reduce(Sketches.kmvMerge(_, _, Seq("g"), k = 64))
    val key = (d: org.apache.spark.sql.DataFrame) =>
      d.select("g", "kmv_hash").as[(String, Long)].collect().sorted.toSeq
    assert(key(merged) === key(oneShot))
    // and the estimates agree too
    val estA = Sketches.kmvEstimate(oneShot, Seq("g"), 64).as[(String, Long)].collect().toMap
    val estB = Sketches.kmvEstimate(merged, Seq("g"), 64).as[(String, Long)].collect().toMap
    assert(estA === estB)
  }

  test("estimator is within theoretical error on a saturated group") {
    // 20,000 distinct values, k = 256 → relative error ~1/sqrt(254) ≈ 6.3%;
    // assert within 3 sigma (19%). Deterministic (md5), so this is a
    // pinned regression bound, not a flaky statistical test.
    val df = (1L to 20000L).map(i => ("g", i)).toDF("g", "v")
    val est = Sketches.kmvDistinct(df, Seq("g"), "v", k = 256)
      .as[(String, Long)].head()._2
    assert(math.abs(est - 20000L) < 3800, s"estimate $est too far from 20000")
  }

  test("rolling active users merges trailing-day sketches exactly") {
    // k far above the cardinalities → every estimate is exact, so the
    // rolling merge must equal the true rolling distinct.
    val ev = Seq(
      ("2024-01-01", 1L), ("2024-01-01", 2L),
      ("2024-01-02", 2L), ("2024-01-02", 3L),
      ("2024-01-03", 5L))
      .map { case (d, u) => (java.sql.Timestamp.valueOf(s"$d 10:00:00"), u) }
      .toDF("ts", "user_id")
    val got = Sketches.rollingActiveUsers(ev, k = 64, windowDays = 2)
      .as[(java.sql.Date, Long)].collect()
      .map(r => (r._1.toString, r._2)).sortBy(_._1)
    assert(got.toSeq === Seq(
      ("2024-01-01", 2L),  // {1,2}
      ("2024-01-02", 3L),  // {1,2,3}
      ("2024-01-03", 3L))) // {2,3,5}
  }

  test("rolling window skips gap days and emits only observed days") {
    val ev = Seq(("2024-01-01", 1L), ("2024-01-04", 2L))
      .map { case (d, u) => (java.sql.Timestamp.valueOf(s"$d 10:00:00"), u) }
      .toDF("ts", "user_id")
    val got = Sketches.rollingActiveUsers(ev, k = 64, windowDays = 2)
      .as[(java.sql.Date, Long)].collect()
      .map(r => (r._1.toString, r._2)).sortBy(_._1)
    // no row for 01-02 (unobserved), and 01-04 sees only its own user
    assert(got.toSeq === Seq(("2024-01-01", 1L), ("2024-01-04", 1L)))
  }

  test("estimate column is exact-cnt vs estimator branch per group") {
    // one tiny group (exact) and one saturated group in the same frame
    val df = ((1L to 5L).map(i => ("small", i)) ++ (1L to 5000L).map(i => ("big", i)))
      .toDF("g", "v")
    val got = Sketches.kmvDistinct(df, Seq("g"), "v", k = 64)
      .as[(String, Long)].collect().toMap
    assert(got("small") === 5L)
    assert(got("big") > 3000L && got("big") < 8000L)
  }

  test("intersection estimate is exact below saturation, zero when disjoint") {
    // A = 1..60, B = 41..100 (overlap 20), C = 200..260 (disjoint with A)
    val a = (1L to 60L).map(("g", _)).toDF("g", "v")
    val b = (41L to 100L).map(("g", _)).toDF("g", "v")
    val c = (200L to 260L).map(("g", _)).toDF("g", "v")
    def sk(d: org.apache.spark.sql.DataFrame) = Sketches.kmvSketch(d, Seq("g"), "v", 128)
    val ab = Sketches.kmvIntersectEstimate(sk(a), sk(b), Seq("g"), 128)
      .as[(String, Long)].collect().toMap
    val ac = Sketches.kmvIntersectEstimate(sk(a), sk(c), Seq("g"), 128)
      .as[(String, Long)].collect().toMap
    assert(ab("g") === 20L)
    assert(ac("g") === 0L)
  }

  test("intersection estimate stays near truth on saturated sketches") {
    // |A| = |B| = 4000, true overlap 2000, k = 256
    val a = (1L to 4000L).map(("g", _)).toDF("g", "v")
    val b = (2001L to 6000L).map(("g", _)).toDF("g", "v")
    val est = Sketches.kmvIntersectEstimate(
        Sketches.kmvSketch(a, Seq("g"), "v", 256),
        Sketches.kmvSketch(b, Seq("g"), "v", 256), Seq("g"), 256)
      .as[(String, Long)].collect().toMap.apply("g")
    assert(est > 1200L && est < 2800L, s"overlap estimate $est far from 2000")
  }

  test("intersection groups are isolated") {
    val a = (1L to 30L).map(("g1", _)) ++ (1L to 10L).map(("g2", _))
    val b = (16L to 45L).map(("g1", _)) ++ (100L to 110L).map(("g2", _))
    val got = Sketches.kmvIntersectEstimate(
        Sketches.kmvSketch(a.toDF("g", "v"), Seq("g"), "v", 64),
        Sketches.kmvSketch(b.toDF("g", "v"), Seq("g"), "v", 64), Seq("g"), 64)
      .as[(String, Long)].collect().toMap
    assert(got === Map("g1" -> 15L, "g2" -> 0L))
  }

  // ------------------------------------------------------------ count-min

  /** Skewed fixture: value v_i appears i times (frequencies known
    * exactly), plus a long tail of singletons to populate collisions.
    */
  private def cmsFixture = {
    val heavy = (1 to 50).flatMap(i => Seq.fill(i)(s"v$i"))
    val tail = (1 to 2000).map(i => s"tail$i")
    (heavy ++ tail).toDF("v")
  }

  test("count-min never underestimates and overshoot stays within eN") {
    val df = cmsFixture
    val n = df.count()
    val sk = Sketches.cmsSketch(df, "v", depth = 4, width = 1024)
    val probes = (1 to 50).map(i => (s"v$i", i.toLong)).toDF("v", "true_n")
    val got = Sketches.cmsEstimate(sk, probes, "v", depth = 4, width = 1024)
      .as[(String, Long, Long)].collect()
    assert(got.length === 50)
    got.foreach { case (v, trueN, est) =>
      assert(est >= trueN, s"$v underestimated: $est < $trueN")
      // Markov bound per row: overshoot < e·N/w w.p. 1/e per row; with
      // d=4 rows an overshoot beyond eN/w on the MIN is vanishingly
      // rare. 4× slack keeps the deterministic fixture comfortably in.
      assert(est - trueN <= 4 * math.E * n / 1024,
        s"$v overshoot ${est - trueN} exceeds bound")
    }
  }

  test("count-min merge over batch cuts is bit-identical to one-shot") {
    val df = cmsFixture.withColumn("part", pmod(length(col("v")), lit(3)))
    val oneShot = Sketches.cmsSketch(cmsFixture, "v")
    val cuts = (0 until 3).map(p =>
      Sketches.cmsSketch(df.where(col("part") === p).select("v"), "v"))
    val merged = cuts.reduce(Sketches.cmsMerge)
    val key = (d: org.apache.spark.sql.DataFrame) =>
      d.select("cms_row", "cms_bucket", "cms_cnt")
        .as[(Int, Long, Long)].collect().sorted.toSeq
    assert(key(merged) === key(oneShot))
  }

  test("weighted count-min from pre-aggregated counts is bit-identical") {
    // r17: cmsSketchWeighted over (value, occurrence-count) rows must
    // reproduce the per-occurrence sketch exactly — the counters are
    // sums, so adding a value's count once ≡ adding 1 per occurrence.
    val df = cmsFixture
    val oneShot = Sketches.cmsSketch(df, "v")
    val counts = df.groupBy("v").agg(count(lit(1)).as("n"))
    val weighted = Sketches.cmsSketchWeighted(counts, "v", "n")
    val key = (d: org.apache.spark.sql.DataFrame) =>
      d.select("cms_row", "cms_bucket", "cms_cnt")
        .as[(Int, Long, Long)].collect().sorted.toSeq
    assert(key(weighted) === key(oneShot))
  }

  test("count-min estimates zero for a value with an untouched bucket") {
    val sk = Sketches.cmsSketch(Seq("a").toDF("v"), "v", depth = 4, width = 4096)
    // one inserted value occupies 4 buckets of 16384; a probe colliding
    // on all 4 is (4/4096)^4-improbable — this fixed probe misses.
    val got = Sketches.cmsEstimate(sk, Seq("zzz-absent").toDF("v"), "v",
        depth = 4, width = 4096)
      .as[(String, Long)].collect().toMap
    assert(got("zzz-absent") === 0L)
  }
}
