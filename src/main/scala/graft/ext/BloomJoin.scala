package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X7 — Bloom-filter pruned equi-join (semi-join reduction).
  *
  * At 100 TB the dominant join cost is shuffling probe-side rows whose
  * keys have no partner at all (a selective dim filter can strand > 99%
  * of the fact). The standard fix is a semi-join reduction: build a
  * compact BLOOM FILTER over the build side's keys, broadcast the bits
  * (m/8 bytes, independent of key count), and drop probe rows that fail
  * the membership test BEFORE the shuffle. Bloom filters have no false
  * negatives, so the pruned join's result is EXACTLY the plain join's —
  * the oracle for the declared query is the unhinted SQL join itself.
  * False positives only cost wasted shuffle rows (rate ≈ (1−e^{−hn/m})^h,
  * ~1% at m/n = 16, h = 4).
  *
  * Everything is deterministic and in-plan — no driver-side sketch, no
  * `collect()`: h bit positions per key derive from one portable 60-bit
  * md5 base hash through the same universal-hash family as MinHash
  * ([[Dedup.Perms]]), the word table aggregates with `bit_or`, densifies
  * into a single `array<long>` row, and reaches the probe side as a
  * one-row broadcast. Spark 3.5's own `InjectRuntimeFilter` plans the
  * same shape automatically in narrow cases; this operator is the
  * explicit, engine-portable form the caller controls (filter size,
  * hash count, reuse across queries).
  */
object BloomJoin {

  /** Default filter size: 2²⁰ bits = 128 KiB — 16 bits/key up to 65k
    * build keys, broadcast-trivial.
    */
  val DefaultBits: Int = 1 << 20
  val DefaultHashes: Int = 4

  private def requirePow2(m: Int): Unit =
    require(m > 64 && (m & (m - 1)) == 0, s"mBits must be a power of two > 64, got $m")

  /** The i-th bit position for a key's 60-bit base hash:
    * `((a·(H mod p) + b) mod p) mod m` — independent-enough universal
    * hashes from one md5 ([[Dedup.Perms]] constants, shared with
    * MinHash so the DuckDB mirror already exists).
    */
  private def bitPos(h: Column, i: Int, mBits: Int): Column = {
    val (a, b) = Dedup.Perms(i)
    // The outer coalesce exists for NULLABILITY, not values: Spark marks
    // `%` always-nullable (divisor-zero → null), and a nullable computed
    // column under a null-intolerant predicate triggers trap 5 —
    // Catalyst infers `isnotnull(<whole md5 chain>)` and inlines it as a
    // scan filter, evaluating the hash h extra times per probe row.
    coalesce((((h % Dedup.Prime) * a + b) % Dedup.Prime) % mBits, lit(0L))
  }

  /** The key's base hash, made NON-NULLABLE (null keys hash to 0).
    * Two reasons: `map_from_entries` rejects the null word a null build
    * key would produce, and — the PLANS.md trap-5 rule — a nullable
    * computed column in a null-intolerant predicate makes Catalyst infer
    * `isnotnull(<whole md5 chain>)` and inline it below the scan, paying
    * the hash repeatedly. Null probe keys may now pass the prefilter;
    * the inner join drops them regardless (null never equi-matches).
    */
  private def keyHash(key: String): Column =
    coalesce(Dedup.hash60(col(key).cast("string")), lit(0L))

  /** Build the filter: ONE row, `bloom: array<long>` of length m/64.
    * Cost: one partial-aggregated pass over the (deduplicated) build
    * keys — the m/64-word table is tiny at any scale.
    */
  def buildFilter(build: DataFrame, key: String, mBits: Int = DefaultBits,
      hashes: Int = DefaultHashes): DataFrame = {
    requirePow2(mBits)
    require(hashes >= 1 && hashes <= Dedup.SigCount, s"hashes must be in [1, ${Dedup.SigCount}]")
    val nWords = mBits / 64
    val h = keyHash(key)
    build
      .select(explode(array((0 until hashes).map(i => bitPos(h, i, mBits)): _*)).as("pos"))
      .groupBy((col("pos") / 64).cast("int").as("w"))
      .agg(bit_or(expr("shiftleft(1L, int(pos % 64))")).as("bits"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("bits")))).as("wm"))
      .select(transform(sequence(lit(0), lit(nWords - 1)),
        w => coalesce(element_at(col("wm"), w), lit(0L))).as("bloom"))
  }

  /** Drop probe rows whose key cannot be in the filter. The one-row
    * filter frame arrives as a broadcast nested-loop of width 1 —
    * effectively a shared lookup array per executor; the membership
    * test is h codegen'd shift-and-mask ops, no shuffle.
    */
  def prune(probe: DataFrame, key: String, filter: DataFrame, mBits: Int = DefaultBits,
      hashes: Int = DefaultHashes): DataFrame = {
    requirePow2(mBits)
    val h = keyHash(key)
    val posCols = (0 until hashes).map(i => bitPos(h, i, mBits).as(s"__pos_$i"))
    val hit = (0 until hashes).map { i =>
      expr(s"(bloom[int(__pos_$i / 64)] & shiftleft(1L, int(__pos_$i % 64))) != 0")
    }.reduce(_ && _)
    probe.select(col("*") +: posCols: _*)
      .crossJoin(broadcast(filter))
      .where(hit)
      .drop((0 until hashes).map(i => s"__pos_$i") :+ "bloom": _*)
  }

  /** Bloom-pruned inner equi-join: ≡ `probe ⋈ build` row-for-row (no
    * false negatives), with the probe side semi-join-reduced before the
    * shuffle. Key columns must be named differently on the two sides
    * (TPC-H style) or identically (dedup'd via `Seq`-join).
    */
  def join(probe: DataFrame, probeKey: String, build: DataFrame, buildKey: String,
      mBits: Int = DefaultBits, hashes: Int = DefaultHashes): DataFrame = {
    val filter = buildFilter(build, buildKey, mBits, hashes)
    val pruned = prune(probe, probeKey, filter, mBits, hashes)
    if (probeKey == buildKey) pruned.join(build, Seq(probeKey))
    else pruned.join(build, col(probeKey) === col(buildKey))
  }
}
