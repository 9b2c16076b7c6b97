package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One (part, calendar-day) demand cell of the simulation grid. */
case class StockDay(part: Long, day: Int, sold: Long)

/** Final per-part simulation state. */
case class StockState(part: Long, final_balance: Long, n_stockouts: Long,
    total_unmet: Long)

/** Clamped replenishment simulation — a per-key ORDER-DEPENDENT fold
  * that no window frame can express: daily balance is
  * `max(0, prev + inflow − sold)`, and the clamp makes the recurrence
  * NON-associative (a running sum would let the balance go negative and
  * silently "borrow" future stock — exactly the bug the reference's
  * reconciliation exists to catch, `glue_job_2_reconcile.py:79-108`
  * computes expected vs actual precisely because naive arithmetic
  * drifts).
  *
  * Spark-first shape: `groupByKey(part).flatMapSortedGroups(day)` — the
  * typed Dataset API's sorted-group scan. One shuffle on the part key,
  * then each group streams through the fold in day order WITHIN a
  * partition; state is O(1) per group, output one row per part. At
  * 100 TB this is the mapGroups discipline: keys hash across
  * executors, the per-key sort rides the shuffle's spillable sorter,
  * and nothing ever materializes more than one group's iterator.
  * Contrast with the window-expressible running sums (orders_backlog):
  * those stay in pure SQL; this operator is WHY the typed escape hatch
  * exists.
  */
object StockSim {

  /** Simulate June's stock per part: `opening` units at month start,
    * `inflow` restocked every calendar day, the day's sales drawn down,
    * balance clamped at zero (unmet demand is lost, not borrowed).
    * Emits final balance, number of stockout days (clamp applied), and
    * total unmet units per part.
    *
    * `daily` must hold one row per (part, day) — the caller gap-fills
    * zero-sale days so inflow accrues on them too.
    */
  def simulate(daily: Dataset[StockDay], opening: Long,
      inflow: Long): Dataset[StockState] = {
    val s = daily.sparkSession
    import s.implicits._
    daily.groupByKey(_.part)
      .flatMapSortedGroups(col("day")) { (part, it) =>
        var bal = opening
        var stockouts = 0L
        var unmet = 0L
        it.foreach { d =>
          val raw = bal + inflow - d.sold
          if (raw < 0L) { stockouts += 1L; unmet -= raw; bal = 0L }
          else bal = raw
        }
        Iterator(StockState(part, bal, stockouts, unmet))
      }
  }

  /** The gap-filled June demand grid from the raw fact: per-part daily
    * sold quantities, zero-filled across all `nDays` calendar days so
    * the fold sees every restock day. Grid volume is |parts| × nDays —
    * built by exploding a day sequence per part (no shuffle beyond the
    * daily aggregate).
    */
  def juneGrid(lineitem: DataFrame, year: Int = 1996,
      nDays: Int = 30): Dataset[StockDay] = {
    val s = lineitem.sparkSession
    import s.implicits._
    val sold = lineitem
      .where(col("l_shipdate") >= lit(s"$year-06-01").cast("timestamp") &&
        col("l_shipdate") < lit(s"$year-07-01").cast("timestamp"))
      .groupBy(col("l_partkey").as("part"),
        dayofmonth(col("l_shipdate")).as("day"))
      .agg(sum(col("l_quantity").cast("long")).as("sold"))
    sold.select("part").distinct()
      .withColumn("day", explode(sequence(lit(1), lit(nDays))))
      .join(sold, Seq("part", "day"), "left")
      .select(col("part"), col("day"),
        coalesce(col("sold"), lit(0L)).as("sold"))
      .as[StockDay]
  }
}
