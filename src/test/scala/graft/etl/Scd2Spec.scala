package graft.etl

import java.sql.Date

import graft.SparkSpec

/** [[Scd2]] — versioned dimension merge: close/reopen on change,
  * pass-through otherwise, idempotent re-runs, as-of reads.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val d1 = Date.valueOf("2024-01-01")
  private val d2 = Date.valueOf("2024-02-01")
  private val d3 = Date.valueOf("2024-03-01")

  private def dim = Seq(
    (1L, "widget", 10.0),
    (2L, "gadget", 20.0),
    (3L, "doodad", 30.0)).toDF("k", "name", "price")

  test("merge partitions versions: close+reopen changed, pass unchanged, open new") {
    val cur = Scd2.init(dim, d1)
    val upd = Seq(
      (1L, "widget", 15.0), // price change → close + reopen
      (2L, "gadget", 20.0), // identical → untouched
      (9L, "newone", 99.0)) // brand-new key → first version
      .toDF("k", "name", "price")
    val out = Scd2.merge(cur, upd, "k", Seq("name", "price"), d2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDate(3), r.getDate(4), r.getBoolean(5))).toSet
    assert(out === Set(
      (1L, "widget", 10.0, d1, d2, false),
      (1L, "widget", 15.0, d2, null, true),
      (2L, "gadget", 20.0, d1, null, true),
      (3L, "doodad", 30.0, d1, null, true), // absent from delta → open
      (9L, "newone", 99.0, d2, null, true)))
  }

  test("closed history passes through later merges untouched") {
    val v1 = Scd2.merge(Scd2.init(dim, d1),
      Seq((1L, "widget", 15.0)).toDF("k", "name", "price"),
      "k", Seq("name", "price"), d2)
    val v2 = Scd2.merge(v1,
      Seq((1L, "widget", 17.0)).toDF("k", "name", "price"),
      "k", Seq("name", "price"), d3)
    val versionsOf1 = v2.where($"k" === 1L)
      .collect().map(r => (r.getDouble(2), r.getDate(3), r.getDate(4), r.getBoolean(5))).toSet
    assert(versionsOf1 === Set(
      (10.0, d1, d2, false), (15.0, d2, d3, false), (17.0, d3, null, true)))
  }

  test("re-running the same delta is a no-op (idempotent day)") {
    val upd = Seq((1L, "widget", 15.0), (9L, "newone", 99.0))
      .toDF("k", "name", "price")
    val once = Scd2.merge(Scd2.init(dim, d1), upd, "k", Seq("name", "price"), d2)
    val twice = Scd2.merge(once, upd, "k", Seq("name", "price"), d2)
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("temporalJoin prices each fact at its own date's version") {
    val v = Scd2.merge(Scd2.init(dim, d1),
      Seq((1L, "widget", 15.0)).toDF("k", "name", "price"),
      "k", Seq("name", "price"), d2)
    val facts = Seq(
      (100L, 1L, Date.valueOf("2024-01-15")), // v1 window → 10.0
      (101L, 1L, d2), // change day → NEW version owns it
      (102L, 1L, Date.valueOf("2024-05-01")), // open version → 15.0
      (103L, 2L, Date.valueOf("2024-05-01")), // unchanged key → 20.0
      (104L, 1L, Date.valueOf("2023-06-01"))) // before first load → null
      .toDF("fact_id", "k", "d")
    val out = Scd2.temporalJoin(facts, "d", v, "k", Seq("price"))
      .orderBy("fact_id")
      .collect().map(r => (r.getLong(0), r.getDate(3), Option(r.getAs[Any]("price"))))
    assert(out.toSeq === Seq(
      (100L, d1, Some(10.0)), (101L, d2, Some(15.0)), (102L, d2, Some(15.0)),
      (103L, d1, Some(20.0)), (104L, null, None)))
  }

  test("asOf reads the version covering the date, half-open intervals") {
    val v = Scd2.merge(Scd2.init(dim, d1),
      Seq((1L, "widget", 15.0)).toDF("k", "name", "price"),
      "k", Seq("name", "price"), d2)
    def priceOf1(d: Date): Double = Scd2.asOf(v, d).where($"k" === 1L)
      .select("price").as[Double].collect().head
    assert(priceOf1(d1) === 10.0)
    assert(priceOf1(Date.valueOf("2024-01-31")) === 10.0)
    assert(priceOf1(d2) === 15.0) // valid_to is exclusive: new version owns d2
    assert(priceOf1(d3) === 15.0)
    // Before the initial load nothing is visible.
    assert(Scd2.asOf(v, Date.valueOf("2023-12-31")).count() === 0)
  }

  test("upsertType1 classifies insert/update/keep; re-running the delta is all-keep") {
    val delta = Seq(
      (2L, "gadget", 25.0), // price change → update
      (3L, "doodad", 30.0), // identical → keep (matched no-op)
      (4L, "gizmo", 40.0))  // new key → insert
      .toDF("k", "name", "price")
    val out = Scd2.upsertType1(dim, delta, "k", Seq("name", "price"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(3))).toSeq ===
      Seq((1L, "keep"), (2L, "update"), (3L, "keep"), (4L, "insert")))
    assert(out(1).getDouble(2) === 25.0) // delta value won
    assert(out(0).getDouble(2) === 10.0) // untouched row passed through
    // Idempotence is visible: the same delta over the merged state
    // reports zero row activity.
    val merged = Scd2.upsertType1(dim, delta, "k", Seq("name", "price")).drop("action")
    val again = Scd2.upsertType1(merged, delta, "k", Seq("name", "price"))
      .orderBy("k").select("action").as[String].collect()
    assert(again === Seq("keep", "keep", "keep", "keep"))
  }

  test("upsertType1 change detection is null-safe per column") {
    val cur = Seq((1L, Option("a")), (2L, Option.empty[String])).toDF("k", "name")
    val delta = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "name")
    val out = Scd2.upsertType1(cur, delta, "k", Seq("name"))
      .orderBy("k").select("action").as[String].collect()
    assert(out === Seq("update", "keep")) // a→null is a change; null→null is not
  }
}
