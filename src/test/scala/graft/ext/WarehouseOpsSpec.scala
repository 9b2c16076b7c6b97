package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-8 second-batch operators: RFM segmentation, association rules,
  * triangle census, conversion latency, numeric profile, histogram
  * quantiles, and the near-dup point lookup — hand-computed fixtures
  * plus equivalence checks against the exact/pairwise formulations.
  */
class WarehouseOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"1995-01-$day%02d 00:00:00")

  test("rfmSegments scores strictly-ordered customers onto the tile diagonal") {
    // cust k: k orders on days 1..k at price 100·k — every metric is
    // strictly ordered with cust 5 best, so each quintile holds exactly
    // one customer and r = f = m = 6 − k.
    val orders = (1 to 5).flatMap { k =>
      (1 to k).map(d => (k.toLong, ts(d), 100.0 * k))
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = Retail.rfmSegments(orders)
      .select("o_custkey", "recency_days", "n_orders", "total_cents", "segment")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    (1 to 5).foreach { k =>
      val (_, rec, n, cents, seg) = got(k - 1)
      assert(rec === 5L - k, s"recency of cust $k")
      assert(n === k.toLong)
      assert(cents === k.toLong * k * 10000)
      val s = (6 - k).toString
      assert(seg === s * 3, s"segment of cust $k")
    }
  }

  test("assocRules confidence is directional and exact in ppm") {
    // orders 1–3 contain {10, 20}; order 4 contains only 10.
    // n_ante(10)=4, n_ante(20)=3, n_ab=3:
    //   10→20 = 3/4 = 750000 ppm; 20→10 = 3/3 = 1000000 ppm.
    val lineitem = Seq(
      (1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (4L, 10L))
      .toDF("l_orderkey", "l_partkey")
    val got = Retail.assocRules(lineitem, minCount = 3, minConfPpm = 1, k = 10)
      .select("antecedent", "consequent", "conf_ppm")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((10L, 20L, 750000L), (20L, 10L, 1000000L)))
  }

  test("copurchaseTriangles counts closed wedges once and skips open ones") {
    // order 1 = {1,2,3} → triangle; order 2 = {1,4} → open wedge 4–1–2.
    val lineitem = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 4L))
      .toDF("l_orderkey", "l_partkey")
    val got = Retail.copurchaseTriangles(lineitem, minCount = 1)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("timeToConvert keeps converting users only, at exact whole seconds") {
    val ev = Seq(
      (1L, Timestamp.valueOf("1995-01-01 00:00:00"), 7L, "view", 0.0, "{}"),
      (2L, Timestamp.valueOf("1995-01-01 00:01:30"), 7L, "purchase", 1.0, "{}"),
      (3L, Timestamp.valueOf("1995-01-01 00:00:00"), 8L, "view", 0.0, "{}"),
      (4L, Timestamp.valueOf("1995-01-01 00:00:00"), 9L, "purchase", 1.0, "{}"),
      (5L, Timestamp.valueOf("1995-01-02 00:00:00"), 9L, "view", 0.0, "{}"),
      (6L, Timestamp.valueOf("1995-01-01 00:00:00"), 10L, "view", 0.0, "{}"),
      (7L, Timestamp.valueOf("1995-01-01 00:00:00"), 10L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.timeToConvert(ev)
      .select("user_id", "secs_to_convert").as[(Long, Long)].collect().toMap
    // u7 converts in 90 s; u8 never purchases; u9 purchased BEFORE the
    // first view (excluded); u10 converts instantly (0 s, boundary kept).
    assert(got === Map(7L -> 90L, 10L -> 0L))
  }

  test("numericProfile profiles every column in one pass, nulls counted") {
    val df = Seq(
      (Some(1.00), 0.10), (Some(2.50), 0.10), (None, 0.10))
      .toDF("a", "b")
    val got = Stats.numericProfile(df, Seq("a", "b"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") === ("a", 3L, 2L, 2L, 100L, 250L, 350L))
    assert(got("b") === ("b", 3L, 3L, 1L, 10L, 10L, 30L))
  }

  test("histogramQuantiles picks the first bucket reaching the type-1 rank") {
    // g: 1.00..10.00; width 300 cents → buckets 0:{100,200} 1:{300..500}
    // 2:{600..800} 3:{900,1000}; cum 2,5,8,10. p50 rank 5 → bucket 1
    // (300), p90 rank 9 → bucket 3 (900), p99 rank 10 → bucket 3.
    val df = (1 to 10).map(i => ("g", i * 1.00)).toDF("grp", "v")
    val got = Stats.histogramQuantiles(df, Seq("grp"), "v", 300L, Seq(50, 90, 99))
      .as[(String, Long, Long, Long)].collect()
    assert(got.toSeq === Seq(("g", 300L, 900L, 900L)))
  }

  test("histogramQuantiles at width 1 equals the exact type-1 quantile in cents") {
    val df = Seq(17, 3, 250, 42, 42, 99, 1234, 8, 60, 77)
      .map(c => ("g", c / 100.0)).toDF("grp", "v")
    val exact = Stats.groupQuantiles(df, Seq("grp"), "v", Seq(50, 90))
      .as[(String, Double, Double)].collect().head
    val est = Stats.histogramQuantiles(df, Seq("grp"), "v", 1L, Seq(50, 90))
      .as[(String, Long, Long)].collect().head
    assert(est._2 === math.round(exact._2 * 100))
    assert(est._3 === math.round(exact._3 * 100))
  }

  test("nearDupLookup with an all-docs probe equals both directions of nearDupMinhash") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base, "en"),
      (2L, base.replace("today", "tomorrow"), "en"),
      (3L, "completely unrelated words about spark catalyst tungsten codegen", "en"),
      (6L, base.replace("dog", "cat"), "en"))
      .toDF("doc_id", "text", "lang")
    val hr = Dedup.hashedShingleRows(docs)
    val pairs = Dedup.nearDupMinhashFromHashes(hr)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(pairs.nonEmpty)
    val expected = pairs ++ pairs.map(p => (p._2, p._1, p._3))
    val got = Dedup.nearDupLookup(Dedup.minhashBands(hr), hr, lit(true))
      .as[(Long, Long, Double)].collect().toSet
    assert(got === expected)
  }

  test("histogram store halves: split-merge probe equals the one-shot quantiles") {
    val df = (1 to 40).map(i => (if (i % 2 == 0) "a" else "b", i * 0.37)).toDF("grp", "v")
    val oneShot = Stats.histogramQuantiles(df, Seq("grp"), "v", 5L, Seq(50, 90))
      .collect().map(_.toSeq).toSet
    // Two disjoint "batches" build independent histograms; the store
    // merges them by addition (mergeRollup on the (grp, bucket) key).
    val h1 = Stats.histogramOf(df.where(col("v") < 7.0), Seq("grp"), "v", 5L)
    val h2 = Stats.histogramOf(df.where(col("v") >= 7.0), Seq("grp"), "v", 5L)
    val merged = graft.streaming.StreamingOps.mergeRollup(h1, h2, Seq("grp", "bucket"), "n")
    val probed = Stats.quantilesFromHistogram(merged, Seq("grp"), 5L, Seq(50, 90))
      .collect().map(_.toSeq).toSet
    assert(probed === oneShot)
  }

  test("histogram store: 3-cut fold in any order equals the one-shot quantiles") {
    // Merge is associative + commutative, so any batch cut AND any fold
    // order converges — the contract quantile_ingest_replay DuckDB-checks
    // at sf0.01 and histIngestStream relies on per micro-batch.
    val rows = (1 to 60).map(i => (i.toLong, if (i % 2 == 0) "a" else "b", (i * 13 % 41) * 0.29))
    val df = rows.toDF("id", "grp", "v")
    val oneShot = Stats.histogramQuantiles(df, Seq("grp"), "v", 7L, Seq(50, 90, 99))
      .collect().map(_.toSeq).toSet
    val cuts = (0 until 3).map(i =>
      Stats.histogramOf(df.where(pmod(col("id"), lit(3)) === i),
        Seq("grp"), "v", 7L))
    for (order <- Seq(Seq(0, 1, 2), Seq(2, 0, 1), Seq(1, 2, 0))) {
      val folded = order.map(cuts).reduce((a, b) =>
        graft.streaming.StreamingOps.mergeRollup(a, b, Seq("grp", "bucket"), "n"))
      val probed = Stats.quantilesFromHistogram(folded, Seq("grp"), 7L, Seq(50, 90, 99))
        .collect().map(_.toSeq).toSet
      assert(probed === oneShot, s"fold order $order diverged")
    }
  }

  test("histogramQuantiles error vs exact quantile is bounded by the bucket width") {
    // The estimate is the LOWER BOUND of the first bucket reaching the
    // type-1 rank, so exact − width < est ≤ exact on the cents grid —
    // the deterministic error contract that makes this the 100 TB
    // quantile path (vs groupQuantiles' full per-group sort).
    val df = (1 to 97).map(i => (if (i % 3 == 0) "a" else "b", (i * 37 % 101) / 100.0 * 9))
      .toDF("grp", "v")
    val width = 50L
    val exact = Stats.groupQuantiles(df, Seq("grp"), "v", Seq(50, 90, 99))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4).map(v => math.round(v * 100))).toMap
    val est = Stats.histogramQuantiles(df, Seq("grp"), "v", width, Seq(50, 90, 99))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4)).toMap
    for (g <- exact.keys; (e, h) <- exact(g).zip(est(g))) {
      assert(h <= e, s"group $g: estimate $h overshoots exact $e")
      assert(e - h < width, s"group $g: estimate $h misses exact $e by >= $width")
    }
  }

  test("discrepancyTrend signs the integer least-squares slope per sku") {
    import java.sql.Date
    val d = (i: Int) => Date.valueOf(f"1995-06-${i + 1}%02d")
    // A worsens (|disc| 0,1,2), B improves (2,1,0), C flat (1,1,1),
    // D has one day (excluded: slope_den = 0).
    val recon = Seq(
      ("A", d(0), 0L), ("A", d(1), -1L), ("A", d(2), 2L),
      ("B", d(0), 2L), ("B", d(1), 1L), ("B", d(2), 0L),
      ("C", d(0), -1L), ("C", d(1), 1L), ("C", d(2), -1L),
      ("D", d(0), 5L))
      .toDF("sku", "date_key", "discrepancy_amount")
    val got = graft.etl.MultiDayReconcile
      .discrepancyTrend(recon, java.time.LocalDate.parse("1995-06-01"))
      .select("sku", "trend").as[(String, String)].collect().toMap
    assert(got === Map("A" -> "worsening", "B" -> "improving", "C" -> "flat"))
  }

  test("nearDupLookup restricts to the probe predicate, keeping both roles") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base, "en"),
      (2L, base.replace("today", "tomorrow"), "en"),
      (3L, "completely unrelated words about spark catalyst tungsten here", "en"))
      .toDF("doc_id", "text", "lang")
    val hr = Dedup.hashedShingleRows(docs)
    val got = Dedup.nearDupLookup(Dedup.minhashBands(hr), hr,
        col("doc_id") === 2L)
      .select("probe_id", "match_id").as[(Long, Long)].collect().toSet
    assert(got === Set((2L, 1L)))
  }

  test("nearDupLookup hot-band cap skips saturated buckets, keeps rare-band pairs") {
    // 10 identical docs saturate ALL their shared band buckets at
    // occupancy 10; a distinct near-dup pair occupies rare buckets.
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val clones = (10L to 19L).map(i =>
      (i, "many copies of this exact boilerplate sentence repeat verbatim", "en"))
    val docs = (Seq(
      (1L, base, "en"),
      (2L, base.replace("today", "tomorrow"), "en")) ++ clones)
      .toDF("doc_id", "text", "lang")
    val hr = Dedup.hashedShingleRows(docs)
    val bands = Dedup.minhashBands(hr)
    // Cap 5 < clone-cluster 10: every clone bucket is skipped, so clone
    // pairs vanish; the (1,2) pair's buckets have occupancy 1–2 and
    // survive — the documented recall trade, exactly.
    val capped = Dedup.nearDupLookup(bands, hr, lit(true), maxBandOccupancy = 5)
      .select("probe_id", "match_id").as[(Long, Long)].collect().toSet
    assert(capped === Set((1L, 2L), (2L, 1L)))
    // Default 0 = unbounded: nothing skipped, clone pairs all present.
    val full = Dedup.nearDupLookup(bands, hr, lit(true))
      .select("probe_id", "match_id").as[(Long, Long)].collect().toSet
    val clonePairs = (for { a <- 10L to 19L; b <- 10L to 19L if a != b }
      yield (a, b)).toSet
    assert(full === clonePairs + ((1L, 2L)) + ((2L, 1L)))
  }

  test("pair-channel band cap skips saturated buckets, keeps rare-band pairs") {
    // Same fixture as the lookup cap test, through the PAIR channel:
    // nearDupMinhash/containmentNearDup/dupGroups share
    // bandedCandidates' occupancy census.
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val clones = (10L to 19L).map(i =>
      (i, "many copies of this exact boilerplate sentence repeat verbatim", "en"))
    val docs = (Seq(
      (1L, base, "en"),
      (2L, base.replace("today", "tomorrow"), "en")) ++ clones)
      .toDF("doc_id", "text", "lang")
    val hr = Dedup.hashedShingleRows(docs)
    val capped = Dedup.nearDupMinhashFromHashes(hr, maxBandOccupancy = 5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped === Set((1L, 2L)))
    // Default 0 = unbounded: the clone cluster's pairs are all present.
    val full = Dedup.nearDupMinhashFromHashes(hr)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val clonePairs = (for { a <- 10L to 19L; b <- 10L to 19L if a < b }
      yield (a, b)).toSet
    assert(full === clonePairs + ((1L, 2L)))
    // Containment + groups ride the same census: capped groups keep the
    // rare-band component only.
    val groups = Dedup.dupGroupsFromHashes(hr, maxBandOccupancy = 5)
      .select("doc_id", "group_id").as[(Long, Long)].collect().toSet
    assert(groups === Set((1L, 1L), (2L, 1L)))
  }
}
