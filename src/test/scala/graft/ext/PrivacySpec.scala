package graft.ext

import graft.SparkSpec

/** [[Privacy]] PII detection + redaction on literal frames. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("piiStats counts each class independently") {
    val d = docs(
      (1L, "mail a@b.co and c.d+e@f-g.org, call 555-123-4567"),
      (2L, "ssn 123-45-6789 from host 192.168.0.1"),
      (3L, "no pii here at all"))
    val out = Privacy.piiStats(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
    assert(out.toSeq === Seq(
      (1L, 2, 1, 0, 0, 3),
      (2L, 0, 0, 1, 1, 2),
      (3L, 0, 0, 0, 0, 0)))
  }

  test("phone and SSN shapes do not cross-match") {
    val out = Privacy.piiStats(docs(
      (1L, "phone 555-123-4567 only"),
      (2L, "ssn 123-45-6789 only"))).orderBy("doc_id").collect()
    assert(out(0).getInt(2) === 1 && out(0).getInt(3) === 0)
    assert(out(1).getInt(2) === 0 && out(1).getInt(3) === 1)
  }

  test("redactPii replaces every class with its sentinel in one pass") {
    val out = Privacy.redactPii(docs(
      (1L, "write a@b.co or call 555-123-4567; ssn 123-45-6789 at 10.0.0.1")))
      .collect().head
    assert(out.getString(1) ===
      "write <EMAIL> or call <PHONE>; ssn <SSN> at <IP>")
    assert(out.getInt(2) === 4)
  }

  test("redaction sentinels cannot manufacture later matches") {
    // An email whose local part looks phone-ish: after <EMAIL> lands,
    // the digit-free sentinel must not feed the phone/SSN/IP passes.
    val out = Privacy.redactPii(docs((1L, "x 555-123-4567abc@mail.com y")))
      .collect().head
    assert(!out.getString(1).contains("555"))
    assert(out.getString(1) === "x <EMAIL> y")
  }

  test("kAnonymity counts classes below k and the rows inside them") {
    import spark.implicits._
    // Classes: (A,1)×5, (A,2)×2, (B,1)×1 → with k=3: two violating
    // classes holding 3 rows total; min class size 1.
    val df = (Seq.fill(5)(("A", 1)) ++ Seq.fill(2)(("A", 2)) ++ Seq(("B", 1)))
      .toDF("seg", "region")
    val out = Privacy.kAnonymity(df, Seq("seg", "region"), k = 3L)
      .collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3))
      === ((3L, 2L, 3L, 1L)))
    // k = 1 is vacuously satisfied: nothing violates.
    val clean = Privacy.kAnonymity(df, Seq("seg", "region"), k = 1L)
      .collect().head
    assert((clean.getLong(1), clean.getLong(2)) === ((0L, 0L)))
  }
}
