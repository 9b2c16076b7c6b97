package graft.ext

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Property tests for the corpus-filter/packing family over generated
  * word-salad corpora (raw scalacheck — scalatestplus bridge not
  * available offline). Small vocabularies force shingle collisions and
  * duplicate bigrams; varying document counts exercise shard boundaries.
  */
class CorpusPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val word = Gen.oneOf((1 to 12).map(i => s"w$i"))
  private val doc = Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, word))
  private def corpus(docs: List[List[String]]) =
    docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" "), "en") }
      .toDF("doc_id", "text", "lang")

  private val corpusGen = Gen.chooseNum(3, 25).flatMap(n => Gen.listOfN(n, doc))

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("packSequences partitions every token exactly once per shard") {
    check(Prop.forAll(corpusGen) { docs =>
      val out = Corpus.packSequences(corpus(docs), seqLen = 16, shards = 3)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      out.length == docs.length &&
        // Per shard: offsets are the prefix sums of token counts in
        // doc_id order — segments tile the shard stream with no gaps.
        out.groupBy(_._1).values.forall { rows =>
          val sorted = rows.sortBy(_._2)
          sorted.scanLeft(0L)(_ + _._3).zip(sorted).forall {
            case (expectedStart, (_, _, n, start, sf, sl)) =>
              start == expectedStart &&
                sf == start / 16 && sl == (start + n - 1) / 16 && sf <= sl
          }
        }
    })
  }

  test("qualityFilter: keep ⟺ no reasons; every doc is judged") {
    check(Prop.forAll(corpusGen) { docs =>
      val out = Corpus.qualityFilter(corpus(docs)).collect()
        .map(r => (r.getLong(0), r.getAs[String]("reasons"), r.getAs[Boolean]("keep")))
      out.length == docs.length &&
        out.forall { case (_, reasons, keep) => keep == reasons.isEmpty } &&
        // The generated vocabulary has no stopwords, so nothing passes
        // the no_stopword rule — the verdict logic must have fired.
        out.forall(_._2.split(",").contains("no_stopword"))
    })
  }

  test("shingleNovelty fractions are consistent and bounded") {
    check(Prop.forAll(corpusGen) { docs =>
      val out = Corpus.shingleNovelty(corpus(docs), k = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      // Only docs with ≥ 3 tokens appear; counts and fractions agree.
      out.forall { case (_, n, novel, frac) =>
        n >= 1 && novel >= 0 && novel <= n &&
          frac >= 0.0 && frac <= 1.0 &&
          math.abs(frac - math.floor(novel.toDouble / n * 10000) / 10000) < 1e-12
      } && {
        // The smallest doc_id with shingles owns all of its shingles.
        out.sortBy(_._1).headOption.forall { case (_, n, novel, _) => novel == n }
      }
    })
  }

  test("vocabCoverage: totals match token counts, coverage bounded by vocab") {
    check(Prop.forAll(corpusGen) { docs =>
      val out = Corpus.vocabCoverage(corpus(docs), vocabSize = 5).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      out.length == docs.length &&
        out.forall { case (id, n, inV, oov) =>
          n == docs(id.toInt).length && inV <= n && oov >= 0.0 && oov <= 1.0
        }
    })
  }
}
