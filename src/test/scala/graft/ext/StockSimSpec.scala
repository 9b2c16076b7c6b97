package graft.ext

import graft.SparkSpec

class StockSimSpec extends SparkSpec {
  import spark.implicits._

  test("clamped fold: stockouts truncate, never borrow") {
    // opening 10, inflow 5. Day sales: 1→8, 2→20 (raw 10+5-8=7; then
    // 7+5-20=-8 → clamp, stockout, unmet 8), 3→0 (0+5-0=5), 4→3 (7).
    val daily = Seq(
      StockDay(1L, 1, 8L), StockDay(1L, 2, 20L),
      StockDay(1L, 3, 0L), StockDay(1L, 4, 3L)).toDS()
    val out = StockSim.simulate(daily, opening = 10L, inflow = 5L).collect()
    assert(out.toSeq === Seq(StockState(1L, 7L, 1L, 8L)))
  }

  test("fold is order-sensitive: shuffled input days yield the same result") {
    // Same days delivered in scrambled order — flatMapSortedGroups must
    // re-sort by day, so the result is identical.
    val scrambled = Seq(
      StockDay(1L, 3, 0L), StockDay(1L, 1, 8L),
      StockDay(1L, 4, 3L), StockDay(1L, 2, 20L)).toDS().repartition(3)
    val out = StockSim.simulate(scrambled, opening = 10L, inflow = 5L).collect()
    assert(out.toSeq === Seq(StockState(1L, 7L, 1L, 8L)))
  }

  test("a plain running sum would differ: the clamp is non-associative") {
    // Without the clamp day 2 would end at -8 and day 4 at 10+20-31=-1+...
    // i.e. final = opening + 4*inflow − Σsold = 10+20−31 = −1 → a
    // running sum reports −1; the clamped fold reports 7. Guard the
    // distinction so nobody "simplifies" the fold into a window.
    val daily = Seq(
      StockDay(1L, 1, 8L), StockDay(1L, 2, 20L),
      StockDay(1L, 3, 0L), StockDay(1L, 4, 3L)).toDS()
    val unclamped = 10L + 4 * 5L - daily.collect().map(_.sold).sum
    val clamped = StockSim.simulate(daily, 10L, 5L).head().final_balance
    assert(unclamped === -1L)
    assert(clamped === 7L)
  }

  test("empty input simulates to empty, not an error") {
    val empty = Seq.empty[StockDay].toDS()
    assert(StockSim.simulate(empty, 50L, 8L).count() === 0L)
  }

  test("juneGrid zero-fills missing days so inflow accrues on them") {
    val li = Seq(
      (1L, java.sql.Timestamp.valueOf("1996-06-05 00:00:00"), 4.0),
      (1L, java.sql.Timestamp.valueOf("1996-06-20 00:00:00"), 2.0),
      (2L, java.sql.Timestamp.valueOf("1996-07-01 00:00:00"), 9.0)) // outside June
      .toDF("l_partkey", "l_shipdate", "l_quantity")
    val grid = StockSim.juneGrid(li).collect()
    assert(grid.length === 30) // part 1 only, all 30 days
    assert(grid.count(_.sold > 0) === 2)
    assert(grid.map(_.sold).sum === 6L)
  }
}
