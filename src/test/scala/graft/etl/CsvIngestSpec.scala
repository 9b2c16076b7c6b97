package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType}

import graft.SparkSpec
import graft.schemas.Schemas
import graft.sources.CsvIngest

/** CsvIngest — the pinned-schema default vs the reference-compatibility
  * `inferSchema` mode, pinning the exact drift hazard SURVEY §7.4
  * predicts: inference types a column FROM THE DATA, so the same logical
  * column lands as INT or DOUBLE depending on which file shows up.
  */
class CsvIngestSpec extends SparkSpec {

  private def writeCsv(lines: String*): String = {
    val dir = Files.createTempDirectory("graft-csvingest")
    Files.write(dir.resolve("part.csv"),
      ("sku,quantity" +: lines).mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("inferSchema drifts int → double across files; the pinned schema does not") {
    val intDay = writeCsv("a1,3", "b2,4")
    val fracDay = writeCsv("a1,3", "b2,4.5") // one decimal flips the type
    def inferredType(path: String) =
      CsvIngest.readInferred(spark, path).schema("quantity").dataType
    assert(inferredType(intDay) === IntegerType)
    assert(inferredType(fracDay) === DoubleType,
      "one fractional row must flip the inferred column type — the drift hazard")
    // The pinned path reads BOTH days with the same declared schema.
    Seq(intDay, fracDay).foreach { p =>
      assert(CsvIngest.read(spark, p, Schemas.posSalesRaw)
        .schema("quantity").dataType === StringType)
    }
  }

  test("audited read splits clean and corrupt rows from one parse") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{StructField, StructType}
    val typed = StructType(Seq(
      StructField("sku", StringType), StructField("quantity", IntegerType)))
    val day = writeCsv("a1,3", "b2,notanum", "c3,5")
    val read = CsvIngest.readAudited(spark, day, typed).cache()
    val clean = read.where(col("_corrupt_record").isNull)
      .select("sku", "quantity").collect()
      .map(r => (r.getString(0), r.getInt(1))).sortBy(_._1)
    assert(clean.toSeq === Seq(("a1", 3), ("c3", 5)))
    val quarantined = read.where(col("_corrupt_record").isNotNull)
      .select("sku", "_corrupt_record").collect()
    assert(quarantined.length === 1)
    // The malformed line is captured VERBATIM for the quarantine stream.
    assert(quarantined.head.getString(1) === "b2,notanum")
    read.unpersist()
  }

  test("both modes stage identical aggregates on clean integer data") {
    val day = writeCsv("a1,3", "a1,2", "b2,4")
    val d = java.time.LocalDate.parse("2024-01-02")
    def staged(infer: Boolean) =
      StageSales.stage(
        if (infer) CsvIngest.readInferred(spark, day)
        else CsvIngest.read(spark, day, Schemas.posSalesRaw), d)
        .orderBy("sku").collect()
        .map(r => (r.getString(1), r.getLong(2))).toSeq
    // stage()'s try_cast(quantity as int) normalizes either arrival type,
    // so on type-stable data the compatibility mode is a drop-in.
    assert(staged(infer = false) === Seq(("A1", 5L), ("B2", 4L)))
    assert(staged(infer = true) === staged(infer = false))
  }
}
