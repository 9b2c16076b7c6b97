package graft.etl

import graft.SparkSpec

/** [[DataQuality]] — per-rule violation counts, planted violations of
  * every rule class, clean-table zeros, the load gate.
  */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private def fact = Seq(
    (Some(1L), 10.0, "A"),
    (Some(1L), 10.0, "A"), // duplicate key 1 → unique violation
    (Some(2L), 99.0, "N"), // out of range
    (Some(3L), 10.0, "X"), // not in accepted set
    (Some(7L), 10.0, "R"), // no dim match → FK violation
    (None, 10.0, "R")) // null key → not_null fires, FK must NOT
    .toDF("k", "v", "flag")

  private def dim = Seq(1L, 2L, 3L).toDF("dk")

  private def rules = Seq(
    DataQuality.NotNull("k"),
    DataQuality.InRange("v", 0.0, 50.0),
    DataQuality.Accepted("flag", Seq("A", "N", "R")),
    DataQuality.UniqueKey(Seq("k")),
    DataQuality.ForeignKey("k", dim, "dk"))

  test("each rule class counts exactly its planted violations") {
    val got = DataQuality.check(fact, rules)
      .as[(String, Long)].collect().toMap
    assert(got === Map(
      "not_null:k" -> 1L,
      "range:v" -> 1L,
      "accepted:flag" -> 1L,
      "unique:k" -> 1L, // key 1 has 2 rows → 1 extra
      "fk:k" -> 1L)) // key 7 only: null key is not an FK violation
  }

  test("a clean table yields all-zero verdicts and passes the gate") {
    val clean = Seq((Some(1L), 10.0, "A"), (Some(2L), 20.0, "N"))
      .toDF("k", "v", "flag")
    val verdicts = DataQuality.check(clean, rules)
    assert(verdicts.as[(String, Long)].collect().forall(_._2 == 0L))
    assert(DataQuality.passes(verdicts))
    assert(!DataQuality.passes(DataQuality.check(fact, rules)))
  }

  test("unique counts extras, not groups: a triple key is 2 violations") {
    val df = Seq(1L, 1L, 1L, 2L).toDF("k")
    val got = DataQuality.check(df, Seq(DataQuality.UniqueKey(Seq("k"))))
      .as[(String, Long)].collect().toMap
    assert(got === Map("unique:k" -> 2L))
  }

  test("empty input: zero violations everywhere, gate passes") {
    val empty = fact.where($"v" < 0)
    val verdicts = DataQuality.check(empty, rules)
    assert(verdicts.as[(String, Long)].collect().toMap.values.forall(_ == 0L))
    assert(DataQuality.passes(verdicts))
  }

  test("observed() counts in-flight, matching check() with no second pass") {
    val rowRules = rules.take(3) // the row-local subset
    val (instrumented, obs) = DataQuality.observed(fact, rowRules)
    // The "real action" — a write-shaped count, NOT a DQ scan.
    assert(instrumented.count() === 6L)
    val got = obs.get.map { case (k, v) => k -> v.asInstanceOf[Long] }
    val viaCheck = DataQuality.check(fact, rowRules)
      .as[(String, Long)].collect().toMap
    assert(got === viaCheck)
    assert(got === Map("not_null:k" -> 1L, "range:v" -> 1L, "accepted:flag" -> 1L))
  }

  test("observed() rejects rules that need their own shuffle") {
    intercept[IllegalArgumentException] {
      DataQuality.observed(fact, rules) // includes UniqueKey/ForeignKey
    }
  }
}
