package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[ZOrder]] — Morton-code correctness vs a bit-by-bit reference,
  * per-axis monotonicity, and the clustering effect of [[ZOrder
  * .zorderWrite]] (each file covers a small rectangle of the key plane).
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference interleave: bit i of a → bit 2i, bit i of b → bit 2i+1. */
  private def zRef(a: Long, b: Long): Long =
    (0 until 32).foldLeft(0L) { (z, i) =>
      z | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
    }

  test("zValue matches the bit-by-bit reference on deterministic key pairs") {
    val keys = for {
      a <- Seq(0L, 1L, 2L, 3L, 255L, 256L, 65535L, 65536L, 123456789L, 0xFFFFFFFFL)
      b <- Seq(0L, 1L, 42L, 65535L, 987654321L, 0xFFFFFFFFL)
    } yield (a, b)
    val got = keys.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z === zRef(a, b), s"interleave($a, $b)")
    }
  }

  test("zValue is monotone along each axis with the other fixed") {
    val as = Seq(0L, 5L, 17L, 1000L, 123456L)
    for (fixed <- Seq(0L, 7L, 99999L)) {
      val alongA = as.map(a => zRef(a, fixed))
      assert(alongA === alongA.sorted, s"monotone in a at b=$fixed")
      val alongB = as.map(b => zRef(fixed, b))
      assert(alongB === alongB.sorted, s"monotone in b at a=$fixed")
    }
  }

  test("zorderWrite clusters both key columns into per-file rectangles") {
    // 64×64 key grid → 16 z-range files ≈ 16 quadrant rectangles: each
    // file's per-axis spread must be far below the global 0..63 spread.
    val grid = (for { a <- 0 until 64; b <- 0 until 64 } yield (a, b))
      .toDF("a", "b")
    val dir = Files.createTempDirectory("zorder").toFile
    val path = new java.io.File(dir, "t").getAbsolutePath
    try {
      ZOrder.zorderWrite(grid, "a", "b", path, numFiles = 16)
      val perFile = spark.read.parquet(path)
        .select(input_file_name().as("f"), col("a"), col("b"),
          ZOrder.zValue(col("a"), col("b")).as("z"))
        .groupBy("f")
        .agg(min("a").as("a0"), max("a").as("a1"),
          min("b").as("b0"), max("b").as("b1"),
          min("z").as("z0"), max("z").as("z1"),
          count(lit(1)).as("n"))
        .collect()
      assert(perFile.length === 16)
      assert(perFile.map(_.getAs[Long]("n")).sum === 64L * 64)
      // Range partitioning: the files' z ranges must not overlap.
      val zRanges = perFile.map(r => (r.getAs[Long]("z0"), r.getAs[Long]("z1")))
        .sortBy(_._1)
      zRanges.sliding(2).foreach {
        case Array((_, hi), (lo, _)) => assert(hi < lo, "z ranges overlap")
        case _ => ()
      }
      // A single-column sort would leave one axis at full 0..63 width in
      // every file; the z layout keeps BOTH axes narrow on average (a
      // file may straddle a z-curve quadrant jump, so only the worst
      // few can approach full width).
      val widths = perFile.map(r =>
        (r.getAs[Int]("a1") - r.getAs[Int]("a0")) max
          (r.getAs[Int]("b1") - r.getAs[Int]("b0")))
      val avg = widths.sum.toDouble / widths.length
      assert(avg < 40, s"avg per-file axis width $avg (single-sort would be 63)")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
  }
}
