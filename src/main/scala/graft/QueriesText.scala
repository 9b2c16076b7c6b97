package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{AsOfJoin, BloomJoin, Corpus, Dedup, Events, Hierarchy, Multimodal, Privacy, RangeJoin, Retail, SaltedJoin, Similarity, Sketches, Stats, StockSim, TextOps}
import graft.etl.ZOrder

/** X2 text analysis + corpus preparation + privacy: stats,
  * language id, tokenization, quality, sampling/splits, BPE, packing,
  * PII. One `entries` query + one `oracles` SQL per operator.
  *
  * Registry object: entry/oracle blocks moved verbatim from the
  * pre-r12 ExtQueries monolith (plans unchanged); ExtQueries
  * composes every family back into the driver-contract maps and
  * still owns the shared session stores and SQL fragments.
  */
private[graft] object QueriesText {
  import ExtQueries._

  def entries: Map[String, Q] = Map[String, Q](
    // X2 — per-document stats + quality score.
    "text_stats" -> ((s, dir) =>
      castLongs(TextOps.textStats(Tables.documents(s, dir)),
        "n_tokens", "n_distinct_tokens", "n_chars").orderBy("doc_id")),

    // X2 — language-ID heuristic vs the labeled lang.
    "lang_id" -> ((s, dir) =>
      TextOps.langId(Tables.documents(s, dir)).orderBy("doc_id")),

    // X2 — whitespace + BPE-ish token counting.
    "token_counts" -> ((s, dir) =>
      castLongs(TextOps.tokenCounts(Tables.documents(s, dir)),
        "ws_tokens", "bpe_pieces", "n_chars").orderBy("doc_id")),

    // X2 — content + canonical fingerprints.
    "doc_fingerprints" -> ((s, dir) =>
      TextOps.fingerprints(Tables.documents(s, dir)).orderBy("doc_id")),

    // X2 — corpus top-20 word frequency (count desc, token asc).
    "word_freq" -> ((s, dir) =>
      TextOps.wordFreq(Tables.documents(s, dir), 20)),

    // X2 — corpus length profile as an equi-width histogram (250-char
    // buckets): one hash aggregate on the bucket id — integer div keeps
    // the bucketing engine-exact, and the aggregate is map-side
    // combinable so the shuffle carries ≤ |buckets| rows per task at
    // any corpus size.
    "doc_length_histogram" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy(expr("n_chars div 250").as("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").cast("long").as("total_chars"))
        .select(col("bucket"), (col("bucket") * 250).as("bucket_lo"),
          col("n_docs"), col("total_chars"))
        .orderBy("bucket")),

    // Corpus — benchmark decontamination: docs sharing any 8-token
    // shingle with the doc_id % 20 = 0 "benchmark" subset.
    "decontaminate" -> ((s, dir) => {
      val sh = k8ShingleStore(s, dir)
      Corpus.decontaminateFromHashes(
        sh.where(pmod(col("doc_id"), lit(20)) =!= 0),
        sh.where(pmod(col("doc_id"), lit(20)) === 0))
        .orderBy("doc_id")
    }),

    // Corpus — Gopher-style repetition quality signals.
    "repetition_score" -> ((s, dir) =>
      Corpus.repetitionScore(Tables.documents(s, dir)).orderBy("doc_id")),

    // Corpus — bigram-LM fluency proxy (corpus-conditional transition
    // frequencies, KenLM-style filtering without an external model).
    "bigram_lm_score" -> ((s, dir) =>
      castLongs(Corpus.bigramLmScore(Tables.documents(s, dir)), "n_bigrams")
        .orderBy("doc_id")),

    // Corpus — top-20 collocations by lift (rational PMI ranking).
    "collocations" -> ((s, dir) =>
      castLongs(Corpus.collocations(Tables.documents(s, dir)), "n_pair")
        .orderBy("rank")),

    // Corpus — token-mixture rebalancing: 4 sources down-sampled to a
    // 40/30/20/10 token recipe, the rest dropped.
    "corpus_mix" -> ((s, dir) =>
      Corpus.mixCorpus(Tables.documents(s, dir),
        Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1))
        .orderBy("doc_id")),

    // Corpus — deterministic per-source stratified sampling
    // (src0 up-weighted to 50%, src1 dropped, 20% elsewhere).
    "stratified_sample" -> ((s, dir) =>
      Corpus.stratifiedSample(Tables.documents(s, dir), 20,
        Map("src0" -> 50, "src1" -> 0)).orderBy("doc_id")),

    // Corpus — deterministic hash-based train/val/test assignment.
    "dataset_split" -> ((s, dir) =>
      Corpus.datasetSplit(Tables.documents(s, dir)).orderBy("doc_id")),

    // Corpus — quality-weighted sampling: survival probability = the
    // quality score, as a pure-integer ppm hash gate (see
    // Corpus.weightedSample — the soft downsampling move).
    "weighted_sample" -> ((s, dir) =>
      Corpus.weightedSample(Tables.documents(s, dir)).orderBy("doc_id")),

    // X6 — deterministic A/B experiment report: users hash-split into
    // two arms, per-arm conversion in exact ppm. Two aggregates, the
    // first collapsing events to per-user converted flags map-side.
    "ab_split_report" -> ((s, dir) =>
      Tables.events(s, dir)
        .select((Dedup.hash60(col("user_id").cast("string")) % 2).as("arm"),
          col("user_id"), col("event_type"))
        .groupBy("arm", "user_id")
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
        .groupBy("arm")
        .agg(count(lit(1)).as("n_users"), sum("conv").as("n_converted"))
        .withColumn("conv_ppm",
          expr("CAST(n_converted * 1000000 DIV n_users AS BIGINT)"))
        .orderBy("arm")),

    // Corpus — overlapping 64/48 token-window chunking.
    "doc_chunks" -> ((s, dir) =>
      Corpus.docChunks(Tables.documents(s, dir)).orderBy("doc_id", "chunk_no")),

    // Corpus — per-doc top-5 salient terms (linear-IDF TF·IDF).
    "tf_idf" -> ((s, dir) =>
      Corpus.tfIdf(Tables.documents(s, dir)).orderBy("doc_id", "rank")),

    // Corpus — per-language profile with discrete percentiles.
    "corpus_profile" -> ((s, dir) =>
      Corpus.corpusProfile(Tables.documents(s, dir)).orderBy("lang")),

    // Corpus — composite Gopher-style quality-filter verdict with
    // per-rule reasons.
    "quality_filter" -> ((s, dir) =>
      castLongs(Corpus.qualityFilter(Tables.documents(s, dir)), "n_tokens")
        .orderBy("doc_id")),

    // Corpus — deterministic shard-local training-sequence packing.
    "pack_sequences" -> ((s, dir) =>
      Corpus.packSequences(Tables.documents(s, dir)).orderBy("doc_id")),

    // Corpus — per-doc OOV rate vs the corpus top-32 vocabulary.
    "vocab_coverage" -> ((s, dir) =>
      Corpus.vocabCoverage(Tables.documents(s, dir)).orderBy("doc_id")),

    // S-ext — sharded-JSONL round trip: the LLM-corpus interchange path
    // (exportJsonl's gzip shards → pinned-schema readJsonl) must be an
    // identity on the document table. Deterministic per-run dir — the
    // csv_roundtrip rule (see [[graft.Scratch]]).
    "jsonl_roundtrip" -> ((s, dir) => {
      val tmp = Scratch.dir("jsonl")
      val docs = Tables.documents(s, dir)
      Corpus.exportJsonl(docs, tmp)
      Corpus.readJsonl(s, tmp, docs.schema)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // S-ext — ORC round trip: the second Spark-native columnar codec
    // (warehouse interchange), schema carried by the format itself.
    "orc_roundtrip" -> ((s, dir) => {
      val tmp = Scratch.dir("orc")
      Tables.documents(s, dir).write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // Corpus — cross-document shingle novelty (first-seen fraction).
    "shingle_novelty" -> ((s, dir) =>
      Corpus.shingleNoveltyFromHashes(k8ShingleStore(s, dir)).orderBy("doc_id")),

    // Corpus — end-to-end keep/drop manifest (quality ∧ exact-dup ∧
    // near-dup-group ∧ decontamination), corpus = doc_id % 20 != 0.
    "corpus_manifest" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Corpus.corpusManifest(
        docs.where(pmod(col("doc_id"), lit(20)) =!= 0),
        docs.where(pmod(col("doc_id"), lit(20)) === 0),
        signatureStore = Some(minhashStore(s, dir)),
        kShingleStore = Some(k8ShingleStore(s, dir)),
        keeperLabels = Some(manifestLabelsStore(s, dir)))
        .orderBy("doc_id")
    }),

    // Privacy — k-anonymity audit of the customer quasi-identifiers
    // (nation × market segment, k = 10): equivalence classes smaller
    // than k are re-identification risks. One tuple-keyed aggregate +
    // a 1-row summary (see Privacy.kAnonymity).
    "k_anonymity" -> ((s, dir) =>
      Privacy.kAnonymity(Tables.customer(s, dir),
          Seq("c_nationkey", "c_mktsegment"), k = 10L)
        .orderBy("n_classes")),

    // X2 — per-source vocabulary richness: hapax share in exact ppm
    // (see TextOps.hapaxBySource).
    "hapax_ratio" -> ((s, dir) =>
      TextOps.hapaxBySource(Tables.documents(s, dir)).orderBy("source")),

    // X2 — first BPE training iteration: top-20 adjacent character
    // pairs weighted by word frequency, counted over the distinct-word
    // table (Zipf: ≪ token stream) — see Corpus.bpeMerges.
    "bpe_merges" -> ((s, dir) =>
      Corpus.bpeMerges(Tables.documents(s, dir), 20)),

    // X2 — per-language quality calibration: percent_rank of the
    // composite quality score WITHIN each language (the relative cut a
    // mixed-language corpus needs — an absolute threshold over-kills
    // whichever language scores systematically lower). The (score,
    // doc_id) ordering keeps ranks unique → deterministic percentiles;
    // the window distributes on the lang key.
    "quality_calibration" -> ((s, dir) => {
      val stats = TextOps.textStats(Tables.documents(s, dir))
        .select(col("doc_id"), col("quality_score"))
      val w = Window.partitionBy("lang")
        .orderBy(col("quality_score"), col("doc_id"))
      Tables.documents(s, dir).select(col("doc_id"), col("lang"))
        .join(stats, "doc_id")
        .withColumn("pct_rank", TextOps.trunc6(percent_rank().over(w)))
        .orderBy("doc_id")
    }),

    // Privacy — per-class PII counts over the planted corpus.
    "pii_stats" -> ((s, dir) =>
      castLongs(Privacy.piiStats(plantPii(Tables.documents(s, dir))),
        "n_email", "n_phone", "n_ssn", "n_ipv4", "n_pii").orderBy("doc_id")),

    // Privacy — sentinel-token redaction, all classes in one projection.
    "pii_redact" -> ((s, dir) =>
      castLongs(Privacy.redactPii(plantPii(Tables.documents(s, dir))),
        "n_redacted").orderBy("doc_id")),
  )

  def oracles: Map[String, String] = Map(
    "text_stats" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id,
         |  len(toks) AS n_tokens,
         |  len(list_distinct(toks)) AS n_distinct_tokens,
         |  length(text) AS n_chars,
         |  floor(list_sum(list_transform(toks, t -> length(t)))::DOUBLE / len(toks) * 10000) / 10000
         |    AS avg_token_len,
         |  floor((length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))::DOUBLE
         |    / greatest(length(text), 1) * 10000) / 10000 AS punct_ratio,
         |  floor(len(list_filter(toks, t -> t IN $stopEn))::DOUBLE / len(toks) * 10000) / 10000
         |    AS stopword_ratio
         |FROM t)
         |SELECT *, floor((0.4 * least(1.0, n_tokens / 50.0)
         |    + 0.3 * (1.0 - punct_ratio)
         |    + 0.3 * least(1.0, stopword_ratio * 5)) * 10000) / 10000 AS quality_score
         |FROM s ORDER BY doc_id""".stripMargin,

    "lang_id" -> {
      val scores = TextOps.langProfiles.map { case (code, words) =>
        s"len(list_filter(toks, t -> t IN ${inList(words)})) AS s_$code"
      }.mkString(",\n  ")
      s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
         |sc AS (SELECT doc_id, lang,
         |  $scores
         |FROM t)
         |SELECT doc_id, lang,
         |  CASE WHEN s_en + s_es + s_de + s_fr = 0 THEN 'und'
         |       WHEN s_en >= greatest(s_es, s_de, s_fr) THEN 'en'
         |       WHEN s_es >= greatest(s_de, s_fr) THEN 'es'
         |       WHEN s_de >= s_fr THEN 'de'
         |       ELSE 'fr' END AS predicted_lang,
         |  lang = CASE WHEN s_en + s_es + s_de + s_fr = 0 THEN 'und'
         |       WHEN s_en >= greatest(s_es, s_de, s_fr) THEN 'en'
         |       WHEN s_es >= greatest(s_de, s_fr) THEN 'es'
         |       WHEN s_de >= s_fr THEN 'de'
         |       ELSE 'fr' END AS agree
         |FROM sc ORDER BY doc_id""".stripMargin
    },

    "token_counts" ->
      s"""SELECT doc_id,
         |  len(regexp_extract_all(text, '\\S+')) AS ws_tokens,
         |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_pieces,
         |  length(text) AS n_chars
         |FROM documents ORDER BY doc_id""".stripMargin,

    "doc_fingerprints" ->
      s"""SELECT doc_id,
         |  md5($normSql) AS content_md5,
         |  md5(array_to_string(list_sort(list_distinct($toksSql)), ' ')) AS fingerprint_md5
         |FROM documents ORDER BY doc_id""".stripMargin,

    "word_freq" ->
      s"""SELECT token, count(*) AS n
         |FROM (SELECT unnest($toksSql) AS token FROM documents)
         |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,

    "doc_length_histogram" ->
      s"""SELECT n_chars // 250 AS bucket, (n_chars // 250) * 250 AS bucket_lo,
         |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM documents GROUP BY 1, 2 ORDER BY bucket""".stripMargin,

    // Round trips are identities on the document table.
    "jsonl_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id",

    "orc_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id",

    "decontaminate" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |p AS (SELECT doc_id, toks FROM t WHERE len(toks) >= ${Corpus.DecontamShingle}),
         |shg AS (SELECT doc_id,
         |          ${hash60Sql(s"array_to_string(toks[i:i+${Corpus.DecontamShingle - 1}], ' ')")} AS h
         |        FROM p, unnest(range(1, len(toks) - ${Corpus.DecontamShingle - 2})) AS u(i)),
         |bench AS (SELECT DISTINCT h FROM shg WHERE doc_id % 20 = 0),
         |corp AS (SELECT DISTINCT doc_id, h FROM shg WHERE doc_id % 20 != 0)
         |SELECT doc_id, count(*) AS n_shared_shingles
         |FROM corp JOIN bench USING (h)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "repetition_score" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |bi AS (SELECT doc_id, unnest([array_to_string(toks[i:i+1], ' ')
         |         for i in range(1, greatest(len(toks), 1))]) AS s
         |       FROM t WHERE len(toks) > 1),
         |c AS (SELECT doc_id, s, count(*) AS c FROM bi GROUP BY 1, 2)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
         |  count(*) AS n_distinct_bigrams,
         |  floor((sum(c) - count(*))::DOUBLE / sum(c) * 10000) / 10000 AS dup_bigram_frac,
         |  floor(max(c)::DOUBLE / sum(c) * 10000) / 10000 AS top_bigram_frac
         |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "bigram_lm_score" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |bi AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
         |       FROM t, unnest(range(1, len(toks))) AS u(i)
         |       WHERE len(toks) > 1),
         |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
         |c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
         |m AS (SELECT doc_id, w1, w2, count(*) AS m FROM bi GROUP BY 1, 2, 3),
         |s AS (SELECT m.doc_id, m.m,
         |        floor(c2.c2::DOUBLE / c1.c1 * 1000000) / 1000000 AS cond6
         |      FROM m JOIN c2 USING (w1, w2) JOIN c1 USING (w1))
         |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
         |  floor(sum(cond6::DECIMAL(20,10) * m)::DOUBLE / sum(m) * 1000000) / 1000000
         |    AS avg_cond,
         |  min(cond6) AS min_cond
         |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "collocations" ->
      s"""WITH tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |uni AS (SELECT unnest(toks) AS w FROM tok),
         |u AS (SELECT w, count(*) AS u FROM uni GROUP BY 1),
         |nt AS (SELECT count(*) AS nt FROM uni),
         |bi AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
         |       FROM tok, unnest(range(1, len(toks))) AS x(i)
         |       WHERE len(toks) > 1),
         |c2 AS (SELECT w1, w2, count(*) AS n_pair FROM bi GROUP BY 1, 2
         |       HAVING count(*) >= 5),
         |nb AS (SELECT count(*) AS nb FROM bi),
         |s AS (SELECT w1, w2, n_pair,
         |        floor(n_pair::DOUBLE * nt / ua.u * nt / ub.u / nb * 1000000) / 1000000
         |          AS lift
         |      FROM c2
         |      JOIN u ua ON ua.w = c2.w1
         |      JOIN u ub ON ub.w = c2.w2, nt, nb),
         |r AS (SELECT *, row_number() OVER (ORDER BY lift DESC, w1, w2) AS rank
         |      FROM s)
         |SELECT w1, w2, CAST(n_pair AS BIGINT) AS n_pair, lift, rank
         |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin,

    "corpus_mix" ->
      s"""WITH wt(source, wt) AS (VALUES
         |    ('src0', 0.4), ('src1', 0.3), ('src2', 0.2), ('src3', 0.1)),
         |base AS (SELECT doc_id, source,
         |    CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents),
         |tot AS (SELECT source, wt, CAST(sum(n_tokens) AS BIGINT) AS tok
         |        FROM base JOIN wt USING (source) GROUP BY 1, 2),
         |k AS (SELECT min(tok::DOUBLE / wt) AS kfac FROM tot),
         |rates AS (SELECT source, least(1.0, wt * kfac / tok::DOUBLE) AS rate
         |          FROM tot, k)
         |SELECT doc_id, source, n_tokens,
         |  ${hash60Sql("source || ':' || doc_id::VARCHAR")} % 1000000 AS bucket,
         |  ${hash60Sql("source || ':' || doc_id::VARCHAR")} % 1000000
         |    < floor(rate * 1000000) AS keep
         |FROM base JOIN rates USING (source)
         |ORDER BY doc_id""".stripMargin,

    "weighted_sample" ->
      s"""WITH ${qualityCtes("documents")},
         |q AS (SELECT doc_id, floor((0.4 * least(1.0, n_tokens / 50.0)
         |    + 0.3 * (1.0 - punct_ratio)
         |    + 0.3 * least(1.0, stopword_ratio * 5)) * 10000) / 10000
         |    AS quality_score
         |  FROM qs)
         |SELECT d.doc_id, d.source, d.lang,
         |  CAST(round(quality_score * 1000000) AS BIGINT) AS w_ppm
         |FROM documents d JOIN q USING (doc_id)
         |WHERE ${hash60Sql("doc_id::VARCHAR")} % 1000000
         |  < CAST(round(quality_score * 1000000) AS BIGINT)
         |ORDER BY doc_id""".stripMargin,

    "ab_split_report" ->
      s"""WITH u AS (SELECT ${hash60Sql("user_id::VARCHAR")} % 2 AS arm, user_id,
         |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
         |  FROM events GROUP BY 1, 2),
         |a AS (SELECT arm, count(*) AS n_users,
         |    CAST(sum(conv) AS BIGINT) AS n_converted
         |  FROM u GROUP BY 1)
         |SELECT arm, n_users, n_converted,
         |  CAST(n_converted * 1000000 // n_users AS BIGINT) AS conv_ppm
         |FROM a ORDER BY arm""".stripMargin,

    "stratified_sample" -> {
      val bucket = s"${hash60Sql("source || ':' || doc_id::VARCHAR")} % 100"
      s"""SELECT doc_id, source, lang, $bucket AS bucket
         |FROM documents
         |WHERE $bucket < CASE WHEN source = 'src0' THEN 50
         |                     WHEN source = 'src1' THEN 0
         |                     ELSE 20 END
         |ORDER BY doc_id""".stripMargin
    },

    "dataset_split" ->
      s"""SELECT doc_id, lang,
         |  ${hash60Sql("doc_id::VARCHAR")} % 100 AS bucket,
         |  CASE WHEN ${hash60Sql("doc_id::VARCHAR")} % 100 < 80 THEN 'train'
         |       WHEN ${hash60Sql("doc_id::VARCHAR")} % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,

    "doc_chunks" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |c AS (SELECT doc_id, toks,
         |        CASE WHEN len(toks) <= ${Corpus.ChunkSize} THEN 1
         |             ELSE (len(toks) - ${Corpus.ChunkSize} + ${Corpus.ChunkStride} - 1)
         |                    // ${Corpus.ChunkStride} + 1 END AS n_chunks
         |      FROM t)
         |SELECT doc_id, u.chunk_no,
         |  len(list_slice(toks, u.chunk_no * ${Corpus.ChunkStride} + 1,
         |    u.chunk_no * ${Corpus.ChunkStride} + ${Corpus.ChunkSize})) AS n_chunk_tokens,
         |  md5(array_to_string(list_slice(toks, u.chunk_no * ${Corpus.ChunkStride} + 1,
         |    u.chunk_no * ${Corpus.ChunkStride} + ${Corpus.ChunkSize}), ' ')) AS chunk_md5
         |FROM c, unnest(range(0, n_chunks)) AS u(chunk_no)
         |ORDER BY doc_id, chunk_no""".stripMargin,

    "tf_idf" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |s AS (SELECT doc_id, term, tf, df,
         |        floor((tf * n_docs)::DOUBLE / df * 1000000) / 1000000 AS score
         |      FROM tf JOIN df USING (term), n),
         |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |        ORDER BY score DESC, term) AS rank FROM s)
         |SELECT doc_id, term, tf, df, score, rank FROM r
         |WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin,

    "corpus_profile" ->
      s"""WITH b AS (SELECT doc_id, lang,
         |    len(regexp_extract_all(text, '\\S+')) AS ws_tokens,
         |    length(text) AS n_chars
         |  FROM documents),
         |r AS (SELECT *,
         |    row_number() OVER (PARTITION BY lang ORDER BY ws_tokens, doc_id) AS rk,
         |    count(*) OVER (PARTITION BY lang) AS n
         |  FROM b)
         |SELECT lang, max(n) AS n_docs,
         |  max(CASE WHEN rk = ceil(n * 0.5) THEN ws_tokens END) AS med_tokens,
         |  max(CASE WHEN rk = ceil(n * 0.9) THEN ws_tokens END) AS p90_tokens,
         |  floor(sum(n_chars)::DOUBLE / count(*) * 10000) / 10000 AS avg_chars,
         |  max(n_chars) AS max_chars
         |FROM r GROUP BY lang ORDER BY lang""".stripMargin,

    "quality_filter" ->
      s"""WITH ${qualityCtes("documents")}
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, avg_token_len,
         |  punct_ratio, dup_bigram_frac, top_bigram_frac, reasons,
         |  reasons = '' AS keep
         |FROM qf ORDER BY doc_id""".stripMargin,

    // End-to-end manifest: quality rules + exact-dup survivorship +
    // near-dup group representative + benchmark contamination, over the
    // doc_id % 20 != 0 training corpus (the % 20 = 0 subset is the
    // benchmark side, matching the decontaminate convention).
    "corpus_manifest" -> {
      val k = Corpus.DecontamShingle
      s"""WITH RECURSIVE corpus AS (SELECT * FROM documents WHERE doc_id % 20 != 0),
         |${qualityCtes("corpus")},
         |kept AS (SELECT c.* FROM corpus c
         |         JOIN qf ON qf.doc_id = c.doc_id AND qf.reasons = ''),
         |${minhashCtes("kept")},
         |$dupGroupCtes,
         |ex AS (SELECT doc_id, row_number() OVER (
         |         PARTITION BY md5($normSql) ORDER BY doc_id) AS rn FROM kept),
         |dt AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |dp AS (SELECT doc_id, toks FROM dt WHERE len(toks) >= $k),
         |dshg AS (SELECT doc_id,
         |          ${hash60Sql(s"array_to_string(toks[i:i+${k - 1}], ' ')")} AS h
         |        FROM dp, unnest(range(1, len(toks) - ${k - 2})) AS u(i)),
         |dbench AS (SELECT DISTINCT h FROM dshg WHERE doc_id % 20 = 0),
         |dct AS (SELECT DISTINCT s.doc_id FROM dshg s JOIN dbench USING (h)
         |        WHERE s.doc_id % 20 != 0),
         |m AS (SELECT c.doc_id,
         |  concat_ws(',',
         |    CASE WHEN qf.reasons != '' THEN qf.reasons END,
         |    CASE WHEN ex.rn != 1 THEN 'exact_dup' END,
         |    CASE WHEN lbl.group_id IS NOT NULL AND lbl.group_id != c.doc_id
         |         THEN 'near_dup' END,
         |    CASE WHEN dct.doc_id IS NOT NULL THEN 'contaminated' END) AS reasons
         |FROM corpus c
         |JOIN qf ON qf.doc_id = c.doc_id
         |LEFT JOIN ex ON ex.doc_id = c.doc_id
         |LEFT JOIN lbl ON lbl.doc_id = c.doc_id
         |LEFT JOIN dct ON dct.doc_id = c.doc_id)
         |SELECT doc_id, reasons, reasons = '' AS keep
         |FROM m ORDER BY doc_id""".stripMargin
    },

    "pack_sequences" ->
      s"""WITH b AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |    ${hash60Sql("doc_id::VARCHAR")} % ${Corpus.PackShards} AS shard
         |  FROM documents),
         |w AS (SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
         |    AS BIGINT) AS cum FROM b)
         |SELECT shard, doc_id, n_tokens, cum - n_tokens AS start_offset,
         |  (cum - n_tokens) // ${Corpus.SeqLen} AS seq_first,
         |  (cum - 1) // ${Corpus.SeqLen} AS seq_last
         |FROM w ORDER BY doc_id""".stripMargin,

    "vocab_coverage" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS token FROM documents),
         |v AS (SELECT token FROM tok GROUP BY token
         |      ORDER BY count(*) DESC, token LIMIT ${Corpus.VocabSize})
         |SELECT doc_id, count(*) AS n_tokens,
         |  CAST(count(v.token) AS BIGINT) AS n_in_vocab,
         |  floor((count(*) - count(v.token))::DOUBLE / count(*) * 10000) / 10000
         |    AS oov_frac
         |FROM tok LEFT JOIN v ON tok.token = v.token
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "shingle_novelty" -> {
      val k = Corpus.DecontamShingle
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |p AS (SELECT doc_id, toks FROM t WHERE len(toks) >= $k),
         |shg AS (SELECT DISTINCT doc_id,
         |          ${hash60Sql(s"array_to_string(toks[i:i+${k - 1}], ' ')")} AS h
         |        FROM p, unnest(range(1, len(toks) - ${k - 2})) AS u(i)),
         |f AS (SELECT h, min(doc_id) AS first_doc FROM shg GROUP BY h)
         |SELECT doc_id, count(*) AS n_shingles,
         |  CAST(count(*) FILTER (first_doc = doc_id) AS BIGINT) AS n_novel,
         |  floor((count(*) FILTER (first_doc = doc_id))::DOUBLE / count(*) * 10000) / 10000
         |    AS novelty_frac
         |FROM shg JOIN f USING (h)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "k_anonymity" ->
      s"""WITH c AS (SELECT c_nationkey, c_mktsegment, count(*) AS class_size
         |  FROM customer GROUP BY 1, 2)
         |SELECT count(*) AS n_classes,
         |  CAST(sum(CASE WHEN class_size < 10 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_violating_classes,
         |  CAST(sum(CASE WHEN class_size < 10 THEN class_size ELSE 0 END)
         |    AS BIGINT) AS n_rows_at_risk,
         |  CAST(min(class_size) AS BIGINT) AS min_class_size
         |FROM c ORDER BY n_classes""".stripMargin,

    "hapax_ratio" ->
      s"""WITH tok AS (SELECT source, unnest($toksSql) AS token FROM documents),
         |tc AS (SELECT source, token, count(*) AS n FROM tok GROUP BY 1, 2),
         |agg AS (SELECT source, count(*) AS n_distinct_tokens,
         |    CAST(count(*) FILTER (n = 1) AS BIGINT) AS n_hapax
         |  FROM tc GROUP BY 1)
         |SELECT source, n_distinct_tokens, n_hapax,
         |  CAST(n_hapax * 1000000 // n_distinct_tokens AS BIGINT) AS hapax_ppm
         |FROM agg ORDER BY source""".stripMargin,

    "bpe_merges" ->
      s"""WITH w AS (SELECT unnest($toksSql) AS w FROM documents),
         |wc AS (SELECT w, count(*) AS wc FROM w GROUP BY 1),
         |p AS (SELECT wc, unnest([substring(w, i, 2) for i in range(1, length(w))])
         |        AS pair
         |      FROM wc WHERE length(w) >= 2)
         |SELECT pair, CAST(sum(wc) AS BIGINT) AS n
         |FROM p GROUP BY 1 ORDER BY n DESC, pair LIMIT 20""".stripMargin,

    "quality_calibration" ->
      s"""WITH ${qualityCtes("documents")},
         |q AS (SELECT doc_id, floor((0.4 * least(1.0, n_tokens / 50.0)
         |    + 0.3 * (1.0 - punct_ratio)
         |    + 0.3 * least(1.0, stopword_ratio * 5)) * 10000) / 10000
         |    AS quality_score
         |  FROM qs),
         |j AS (SELECT d.doc_id, d.lang, q.quality_score
         |      FROM documents d JOIN q USING (doc_id))
         |SELECT doc_id, lang, quality_score,
         |  floor(percent_rank() OVER (PARTITION BY lang
         |    ORDER BY quality_score, doc_id) * 1000000) / 1000000 AS pct_rank
         |FROM j ORDER BY doc_id""".stripMargin,

    "pii_stats" ->
      s"""WITH p AS (SELECT doc_id, $plantPiiSql AS text FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(text, '${piiRe("email")}')) AS n_email,
         |  len(regexp_extract_all(text, '${piiRe("phone")}')) AS n_phone,
         |  len(regexp_extract_all(text, '${piiRe("ssn")}')) AS n_ssn,
         |  len(regexp_extract_all(text, '${piiRe("ipv4")}')) AS n_ipv4,
         |  len(regexp_extract_all(text, '${piiRe("email")}'))
         |    + len(regexp_extract_all(text, '${piiRe("phone")}'))
         |    + len(regexp_extract_all(text, '${piiRe("ssn")}'))
         |    + len(regexp_extract_all(text, '${piiRe("ipv4")}')) AS n_pii
         |FROM p ORDER BY doc_id""".stripMargin,

    "pii_redact" ->
      s"""WITH p AS (SELECT doc_id, $plantPiiSql AS text FROM documents)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
         |    '${piiRe("email")}', '<EMAIL>', 'g'),
         |    '${piiRe("phone")}', '<PHONE>', 'g'),
         |    '${piiRe("ssn")}', '<SSN>', 'g'),
         |    '${piiRe("ipv4")}', '<IP>', 'g') AS redacted,
         |  len(regexp_extract_all(text, '${piiRe("email")}'))
         |    + len(regexp_extract_all(text, '${piiRe("phone")}'))
         |    + len(regexp_extract_all(text, '${piiRe("ssn")}'))
         |    + len(regexp_extract_all(text, '${piiRe("ipv4")}')) AS n_redacted
         |FROM p ORDER BY doc_id""".stripMargin,
  )
}
