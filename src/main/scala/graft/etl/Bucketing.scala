package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout — the shuffle-elimination half of the warehouse
  * story (the reference leans on Redshift `DISTKEY`/`SORTKEY` for the
  * same effect, `sql/create_redshift_tables.sql:14-15,25-26`; Spark's
  * analogue is a bucketed+sorted Parquet table).
  *
  * Why it matters at 100 TB: a fact⋈fact equi-join between two tables
  * bucketed BY THE SAME KEY INTO THE SAME BUCKET COUNT reads co-located
  * buckets and joins them with ZERO Exchange — the shuffle was paid once
  * at write time and is amortized over every subsequent join, instead of
  * re-paid per query. `sortBy` additionally lets sort-merge join skip
  * its sort. This is the "reuse a partitioning across stages" design
  * lever: nightly loads write bucketed, every downstream reconciliation
  * joins shuffle-free.
  *
  * `bucketBy` requires a catalog table (`saveAsTable`) — Spark stores the
  * bucket spec in table metadata, which a plain `.parquet(path)` write
  * cannot carry.
  */
object Bucketing {

  /** Write `df` as a bucketed + in-bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
