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

  /** The i-th bit position for a key's base hash:
    * `((a·(H mod p) + b) mod p) mod m` — independent-enough universal
    * hashes ([[Dedup.Perms]] constants, shared with MinHash).
    */
  private def bitPos(h: Column, i: Int, mBits: Int): Column = {
    val (a, b) = Dedup.Perms(i)
    // The outer coalesce exists for NULLABILITY, not values: Spark marks
    // `%`/`pmod` always-nullable (divisor-zero → null), and a nullable
    // computed column under a null-intolerant predicate triggers trap
    // 5 — Catalyst infers `isnotnull(<whole hash chain>)` and inlines it
    // as a scan filter, evaluating the hash h extra times per probe row.
    coalesce((pmod(h, lit(Dedup.Prime)) * a + b) % Dedup.Prime % mBits, lit(0L))
  }

  /** The key's base hash: `xxhash64` over the key's STRING form — a
    * single codegen'd hash per row. md5 (the MinHash base used
    * elsewhere for DuckDB-mirrorability) is NOT needed here: bloom
    * membership has no false negatives under ANY fixed hash, so the
    * declared oracle is the plain SQL join and the hash never has to be
    * reproduced outside Spark; xxhash64 is ~10× cheaper per probe row.
    * The string cast makes equal-printing key types (int vs bigint)
    * hash identically on the two sides. Non-nullable by construction
    * (xxhash64 of a null input returns the seed hash), which keeps the
    * PLANS.md trap-5 `isnotnull(<chain>)` scan-filter inference away.
    * Null probe keys may pass the prefilter; the inner join drops them
    * regardless (null never equi-matches).
    */
  private def keyHash(key: String): Column =
    xxhash64(col(key).cast("string"))

  /** Build the filter: ONE row, `bloom: array<long>` of length m/64.
    * Cost: one partial-aggregated pass over the (deduplicated) build
    * keys — the m/64-word table is tiny at any scale. Densification
    * unions an all-zero word per index and sorts the collected structs
    * (O(words·log words)); the tempting `map_from_entries` +
    * per-index `element_at` form is O(words²) because Spark map lookup
    * is a linear scan — 8 s of single-row work at the 2²⁰-bit default.
    */
  def buildFilter(build: DataFrame, key: String, mBits: Int = DefaultBits,
      hashes: Int = DefaultHashes): DataFrame = {
    requirePow2(mBits)
    require(hashes >= 1 && hashes <= Dedup.SigCount, s"hashes must be in [1, ${Dedup.SigCount}]")
    val nWords = mBits / 64
    val h = keyHash(key)
    val zeros = build.sparkSession.range(nWords)
      .select(col("id").cast("int").as("w"),
        lit(0L).as("bits"))
    // Zeros union BEFORE the word aggregate (r17): bit_or(x, 0) = x, so
    // densification rides the same map-side-combined exchange as the
    // word OR itself — one word shuffle instead of two (guide §2.4,
    // shared exchange). The former shape aggregated sparse words first
    // and re-grouped after the union, paying a second exchange for the
    // same one-row result.
    build
      .select(explode(array((0 until hashes).map(i => bitPos(h, i, mBits)): _*)).as("pos"))
      .select((col("pos") / 64).cast("int").as("w"),
        expr("shiftleft(1L, int(pos % 64))").as("bits"))
      .unionByName(zeros)
      .groupBy("w").agg(bit_or(col("bits")).as("bits"))
      .agg(transform(array_sort(collect_list(struct(col("w"), col("bits")))),
        _.getField("bits")).as("bloom"))
  }

  /** Drop probe rows whose key cannot be in the filter. The one-row
    * filter frame arrives as a broadcast nested-loop of width 1 —
    * effectively a shared lookup array per executor; the membership
    * test is h codegen'd shift-and-mask ops, no shuffle.
    */
  def prune(probe: DataFrame, key: String, filter: DataFrame, mBits: Int = DefaultBits,
      hashes: Int = DefaultHashes): DataFrame = {
    requirePow2(mBits)
    // The cross-joined filter frame contributes a `bloom` column and the
    // membership test names its working positions `__pos_i`; a probe that
    // already carries either would make the references ambiguous
    // (ADVICE r6) — fail loudly instead of silently mis-resolving.
    val reserved = probe.columns.filter(c => c == "bloom" || c.startsWith("__pos_"))
    require(reserved.isEmpty,
      s"probe columns collide with bloom-prune working names: ${reserved.mkString(", ")}")
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
