package graft.functions

import scala.util.Random

import graft.SparkSpec
import graft.operators.TextDedup
import org.apache.spark.sql.functions._

/** Property-style laws for the text building blocks, evaluated in ONE
  * Spark pass over a seeded generated corpus (per-sample jobs would be
  * 100× slower than batching the whole generated set).
  */
class TextFunctionLawsSpec extends SparkSpec {
  import spark.implicits._

  // Seeded corpus: words of varying case/length, runs of spaces, some
  // docs shorter than the shingle width, some empty.
  private val corpus: Seq[(Long, String)] = {
    val rnd = new Random(20260812L)
    (0L until 200L).map { i =>
      val nWords = rnd.nextInt(12)
      val words = Seq.fill(nWords) {
        val len = 1 + rnd.nextInt(8)
        Seq.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString +
          (if (rnd.nextBoolean()) "X" else "")
      }
      (i, words.mkString(" " * (1 + rnd.nextInt(2))))
    }
  }

  private def refTokens(text: String): Seq[String] =
    text.toLowerCase.split(" ").toSeq.filter(_.nonEmpty)

  test("tokens law: lowercase, non-empty, equal to the reference split") {
    val got = corpus.toDF("doc_id", "text")
      .select($"doc_id", tokens($"text").as("t"))
      .as[(Long, Seq[String])].collect().toMap
    corpus.foreach { case (id, text) =>
      assert(got(id) == refTokens(text), s"doc $id")
      assert(got(id).forall(w => w.nonEmpty && w == w.toLowerCase))
    }
  }

  test("shingles law: count = max(0, tokens - n + 1); each shingle joins n tokens") {
    for (n <- Seq(2, 3, 5)) {
      val got = corpus.toDF("doc_id", "text")
        .select($"doc_id", shingles($"text", n).as("s"))
        .as[(Long, Seq[String])].collect().toMap
      corpus.foreach { case (id, text) =>
        val t = refTokens(text)
        val expected = if (t.size < n) Seq.empty
          else t.sliding(n).map(_.mkString(" ")).toSeq
        assert(got(id) == expected, s"doc $id n=$n")
      }
    }
  }

  test("rollingHash law: equals the Rabin-Karp fold reference") {
    val got = graft.operators.TextAnalysis.rollingHash(corpus.toDF("doc_id", "text"))
      .as[(Long, Long)].collect().toMap
    corpus.foreach { case (id, text) =>
      val ref = text.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
      assert(got(id) == ref, s"doc $id")
    }
  }

  test("fingerprint law: invariant under word order and duplication") {
    val shuffled = corpus.map { case (id, text) =>
      val words = text.split(" ").toSeq
      val rnd = new Random(id)
      (id, (rnd.shuffle(words) ++ words.take(1)).mkString(" "))
    }
    val a = graft.operators.TextAnalysis.fingerprint(corpus.toDF("doc_id", "text"))
      .as[(Long, String)].collect().toMap
    val b = graft.operators.TextAnalysis.fingerprint(shuffled.toDF("doc_id", "text"))
      .as[(Long, String)].collect().toMap
    corpus.filter(_._2.trim.nonEmpty).foreach { case (id, _) =>
      assert(a(id) == b(id), s"doc $id fingerprint must ignore order/dup")
    }
  }

  test("minhash law: signatures in [0, 2^48); identical shingle sets => identical signatures") {
    val docs = corpus.filter { case (_, t) => refTokens(t).size >= 3 }
    val twin = docs.map { case (id, t) => (id + 100000L, t) }
    val sigs = TextDedup.minhashSignatures(
      TextDedup.shingleSet((docs ++ twin).toDF("doc_id", "text")))
    val rows = sigs.collect()
    val bound = 1L << 48
    rows.foreach { r =>
      (1 until r.length).foreach { i =>
        val v = r.getLong(i)
        assert(v >= 0L && v < bound, s"sig out of 48-bit range: $v")
      }
    }
    val byId = rows.map(r => r.getLong(0) -> (1 until r.length).map(r.getLong)).toMap
    docs.foreach { case (id, _) =>
      assert(byId(id) == byId(id + 100000L), s"doc $id: identical text, identical sigs")
    }
  }

  test("simhash law: fingerprints in [0, 2^32); equal for equal shingle sets") {
    val docs = corpus.filter { case (_, t) => refTokens(t).size >= 3 }.take(50)
    val fps = TextDedup.simhashFingerprints(
      TextDedup.shingleSet(docs.toDF("doc_id", "text")))
      .as[(Long, Long)].collect().toMap
    fps.values.foreach(v => assert(v >= 0L && v < (1L << 32), s"fp out of range: $v"))
  }
}
