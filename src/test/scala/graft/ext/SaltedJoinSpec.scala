package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  // One genuinely hot key (5,000 rows) among cold ones — the shape the
  // salting exists for.
  private def fact = spark.range(5000).select(lit(1L).as("k"), col("id").as("v"))
    .union(spark.range(100).select((col("id") + 2).as("k"), col("id").as("v")))
  private def dim = spark.range(102).select(col("id").as("k"),
    concat(lit("d"), col("id")).as("name"))

  test("salted join equals the plain inner join on skewed data") {
    val salted = SaltedJoin.equiJoin(fact, dim, "k",
        saltFactor = 8, heavyThreshold = 1000)
      .select("k", "v", "name").as[(Long, Long, String)].collect().sorted
    val plain = fact.join(dim, "k")
      .select("k", "v", "name").as[(Long, Long, String)].collect().sorted
    assert(salted.length === 5100) // hot key ×5000 + 100 cold rows
    assert(salted === plain)
  }

  test("salted join with sampled detection still equals the plain join") {
    val salted = SaltedJoin.equiJoin(fact, dim, "k",
        saltFactor = 4, heavyThreshold = 100, sampleFraction = 0.2)
      .select("k", "v", "name").as[(Long, Long, String)].collect().sorted
    val plain = fact.join(dim, "k")
      .select("k", "v", "name").as[(Long, Long, String)].collect().sorted
    assert(salted === plain)
  }

  test("no hot keys means no replication work") {
    val salted = SaltedJoin.equiJoin(fact, dim, "k",
        saltFactor = 8, heavyThreshold = 100000)
      .select("k", "v", "name").as[(Long, Long, String)].collect().sorted
    val plain = fact.join(dim, "k")
      .select("k", "v", "name").as[(Long, Long, String)].collect().sorted
    assert(salted === plain)
  }
}
