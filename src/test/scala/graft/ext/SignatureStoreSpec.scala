package graft.ext

import java.nio.file.Files

import graft.SparkSpec

/** The signature-store halves are persisted parquet at scale; these
  * specs assert each probe form produces identical results whether fed
  * the in-session frame or its parquet round trip. This is not hygiene:
  * a parquet round trip flips columns nullable, and the char-gram
  * pipeline's scaladoc documents how a nullable gram column resurrects
  * the isnotnull-pushdown O(len²) trap — equality here proves the probe
  * forms are round-trip safe.
  */
class SignatureStoreSpec extends SparkSpec {

  private val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")

  private def roundTrip(df: org.apache.spark.sql.DataFrame, name: String) = {
    val dir = Files.createTempDirectory(s"graft-store-$name").toString
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("minhash hr store: parquet round trip probes identically") {
    val hr = Dedup.hashedShingleRows(docs)
    val direct = Dedup.nearDupMinhashFromHashes(hr).collect().toSet
    val viaParquet = Dedup.nearDupMinhashFromHashes(roundTrip(hr, "hr"))
      .collect().toSet
    assert(viaParquet === direct)
  }

  test("simhash chunk store: parquet round trip probes identically") {
    val ch = Dedup.simhashChunks(docs)
    val direct = Dedup.nearDupSimhashFromChunks(ch).collect().toSet
    val viaParquet = Dedup.nearDupSimhashFromChunks(roundTrip(ch, "simhash"))
      .collect().toSet
    assert(viaParquet === direct)
  }

  test("char-gram store: parquet round trip probes identically") {
    val g = Dedup.charGramSets(docs)
    val direct = Dedup.ngramJaccardFromGrams(g).collect().toSet
    val viaParquet = Dedup.ngramJaccardFromGrams(roundTrip(g, "grams"))
      .collect().toSet
    assert(viaParquet === direct)
  }

  test("char-gram store: banded probe round trip + mixed era ≡ one-shot banded") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    // The banded channel's signatures/bands are pure per-doc functions
    // of the stored gram arrays, so a parquet round trip and a
    // mixed-era (append) store must both probe exactly like a fresh
    // one-shot build — the same contract as the prefix probe below,
    // for the channel the declared query actually runs.
    val oneShot = Dedup.ngramJaccardBanded(Dedup.charGramSets(docs))
      .collect().toSet
    val viaParquet = Dedup.ngramJaccardBanded(
      roundTrip(Dedup.charGramSets(docs), "grams-banded")).collect().toSet
    assert(viaParquet === oneShot)
    val base = docs.where(pmod(col("doc_id"), lit(3)) =!= 0)
    val fresh = docs.where(pmod(col("doc_id"), lit(3)) === 0)
    val mixed = roundTrip(Dedup.charGramSets(base), "grams-banded-era1")
      .unionByName(Dedup.charGramSets(fresh))
    assert(Dedup.ngramJaccardBanded(mixed).collect().toSet === oneShot)
  }

  test("char-gram store: mixed-era incremental append loses no pairs") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    // The hazard this pins (VERDICT r11 #4 / ADVICE r11): a store built
    // at corpus-time T unioned with freshly-encoded docs at T+1 must
    // probe exactly like a one-shot build over the grown corpus. That
    // holds only because charGramSets stores corpus-INDEPENDENT
    // value-sorted gram codes and ngramJaccardFromGrams derives the
    // rarity order per probe — a store with document frequency baked
    // into the encoding (the r11 df·2²⁴+gram layout) mixes df eras
    // here, breaks gram equality across eras, and silently loses
    // pairs. Era 1 is parquet round-tripped like the at-rest store.
    val base = docs.where(pmod(col("doc_id"), lit(3)) =!= 0)
    val fresh = docs.where(pmod(col("doc_id"), lit(3)) === 0)
    val store = roundTrip(Dedup.charGramSets(base), "grams-era1")
      .unionByName(Dedup.charGramSets(fresh))
    val incremental = Dedup.ngramJaccardFromGrams(store).collect().toSet
    val oneShot = Dedup.ngramJaccardBlocked(docs).collect().toSet
    assert(incremental === oneShot)
  }

  test("k-shingle store: parquet round trip probes identically") {
    val sh = Corpus.shingleHashes(docs, Corpus.DecontamShingle).distinct()
    val direct = Corpus.duplicatedSpansFromHashes(sh).collect().toSet
    val viaParquet = Corpus.duplicatedSpansFromHashes(roundTrip(sh, "k8"))
      .collect().toSet
    assert(viaParquet === direct)
    val novDirect = Corpus.shingleNoveltyFromHashes(sh).collect().toSet
    val novParquet = Corpus.shingleNoveltyFromHashes(roundTrip(sh, "k8n"))
      .collect().toSet
    assert(novParquet === novDirect)
  }

  test("shingle-set store: probing stored sets ≡ candidate-filtered rebuild") {
    // r17: verification joins read the persisted (doc_id, sh) half of
    // the signature store instead of re-aggregating candidate shingle
    // sets per query. Sets are a per-doc pure function, so the stored
    // form (parquet round-tripped like the at-rest table) must verify
    // bit-identically across the whole probe family.
    val hr = Dedup.hashedShingleRows(docs)
    val sets = roundTrip(Dedup.shingleSets(hr), "sets")
    assert(Dedup.nearDupMinhashFromHashes(hr, sets = Some(sets)).collect().toSet
      === Dedup.nearDupMinhashFromHashes(hr).collect().toSet)
    assert(Dedup.containmentNearDupFromHashes(hr, sets = Some(sets)).collect().toSet
      === Dedup.containmentNearDupFromHashes(hr).collect().toSet)
    assert(Dedup.containmentNearDupStratifiedFromHashes(hr, sets = Some(sets))
      .collect().toSet
      === Dedup.containmentNearDupStratifiedFromHashes(hr).collect().toSet)
    import org.apache.spark.sql.functions.lit
    assert(Dedup.nearDupLookup(Dedup.minhashBands(hr), hr, lit(true),
      storeSets = Some(sets)).collect().toSet
      === Dedup.nearDupLookup(Dedup.minhashBands(hr), hr, lit(true)).collect().toSet)
  }

  test("char-gram band store: probing stored bands ≡ probe-time banding") {
    // r17: the 96-permutation gram minhash bands persist beside the gram
    // sets; the banded probe must be identical fed either form.
    val g = Dedup.charGramSets(docs)
    val bands = roundTrip(Dedup.gramMinhashBands(g), "gbands")
    assert(Dedup.ngramJaccardBanded(g, bands = Some(bands)).collect().toSet
      === Dedup.ngramJaccardBanded(g).collect().toSet)
  }

  test("simhash fingerprint store: probing stored fingerprints ≡ chunk vote") {
    // r17: the 4-int majority-vote fingerprint is the persisted form;
    // probing it must equal voting from the chunk store at probe time.
    val ch = Dedup.simhashChunks(docs)
    val fp = roundTrip(Dedup.simhashFingerprints(ch), "simfp")
    assert(Dedup.nearDupSimhashFromChunks(ch, fingerprints = Some(fp))
      .collect().toSet
      === Dedup.nearDupSimhashFromChunks(ch).collect().toSet)
  }

  test("k-shingle store: batch slice span counts ≡ tokenizing the batch") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    // r17: span_ingest_replay derives each batch's span summary from a
    // doc-residue SLICE of the k-shingle store; per-doc purity makes the
    // slice ≡ shingleHashes(batch).distinct(), so the folded store must
    // be bit-identical to per-batch tokenization.
    val sh = roundTrip(
      Corpus.shingleHashes(docs, Corpus.DecontamShingle).distinct(), "k8slice")
    val viaStore = (0 until 3)
      .map(i => Corpus.spanCountsFromHashes(
        sh.where(pmod(col("doc_id"), lit(3)) === i)))
      .reduce(Corpus.spanStoreMerge).collect().toSet
    val viaDocs = (0 until 3)
      .map(i => Corpus.spanCounts(docs.where(pmod(col("doc_id"), lit(3)) === i)))
      .reduce(Corpus.spanStoreMerge).collect().toSet
    assert(viaStore === viaDocs)
  }

  test("manifest keeper-label store: probing labels equals recomputing") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val corpus = docs.where(pmod(col("doc_id"), lit(20)) =!= 0)
    val bench = docs.where(pmod(col("doc_id"), lit(20)) === 0)
    val cold = Corpus.corpusManifest(corpus, bench).collect().toSet
    // The store contract: labels computed over EXACTLY the manifest's
    // keeper set (filter-then-dedup), parquet round-tripped like the
    // at-rest label table would be.
    val keepIds = Corpus.qualityFilter(corpus)
      .where(col("reasons") === "").select("doc_id")
    val labels = Dedup.dupGroupsFromHashes(
      Dedup.hashedShingleRows(docs).join(keepIds, "doc_id"))
    val warm = Corpus.corpusManifest(corpus, bench,
      keeperLabels = Some(roundTrip(labels, "mlabels"))).collect().toSet
    assert(warm === cold)
  }
}
