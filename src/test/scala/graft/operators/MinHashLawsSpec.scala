package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated algebraic laws for the MinHash construction.
  *
  * Samples come from ScalaCheck generators under a FIXED seed and are
  * evaluated in batched Spark passes (one job per law, not per sample —
  * per-sample jobs would be 100× slower). The generator draws from a
  * small vocabulary so shingle overlap — the interesting regime for
  * MinHash — is dense.
  *
  * Laws:
  *   1. reference law — signatures equal an independent Scala
  *      reimplementation of the Carter-Wegman scheme (md5 → two 48-bit
  *      halves, sig_j = min over shingles of (h1 + j·h2) mod 2^48);
  *   2. union law — sig(A ∪ B) = elementwise min(sig(A), sig(B));
  *   3. duplication law — duplicate shingle rows never change a sig;
  *   4. range law — every sig lies in [0, 2^48);
  *   5. estimator law — signature agreement approximates true Jaccard
  *      (64 hashes ⇒ se ≈ 0.06; the fixed seed makes this deterministic).
  */
class MinHashLawsSpec extends SparkSpec {
  import spark.implicits._

  private val TwoPow48 = 281474976710656L

  // --- ScalaCheck corpus (fixed seed => reproducible) ------------------
  private val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
  private val docGen: Gen[String] =
    // mostly shingle-bearing docs (>= 3 words), some degenerate ones so
    // the no-signature branch of every law stays exercised
    Gen.frequency(9 -> Gen.chooseNum(3, 14), 1 -> Gen.chooseNum(0, 2))
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
  private val corpus: Seq[(Long, String)] = {
    val params = Gen.Parameters.default
    (0L until 120L).map { i =>
      (i, docGen.pureApply(params, Seed(20260812L + i)))
    }
  }
  private lazy val docs: DataFrame = corpus.toDF("doc_id", "text")

  /** Independent Scala reference: the exact md5/Carter-Wegman arithmetic
    * the Spark SQL expressions implement, reimplemented from scratch. */
  private def refSignature(text: String, numHashes: Int): Option[Seq[Long]] = {
    val toks = text.toLowerCase.split(" ").toSeq.filter(_.nonEmpty)
    val shingles = if (toks.size < 3) Set.empty[String]
      else toks.sliding(3).map(_.mkString(" ")).toSet
    if (shingles.isEmpty) None
    else Some {
      val hs = shingles.toSeq.map { s =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        (java.lang.Long.parseLong(hex.substring(0, 12), 16),
         java.lang.Long.parseLong(hex.substring(12, 24), 16))
      }
      (0 until numHashes).map { j =>
        hs.map { case (h1, h2) => (h1 + j * h2) % TwoPow48 }.min
      }
    }
  }

  private def collectSigs(sig: DataFrame): Map[Long, Seq[Long]] = {
    val cols = sig.columns.filter(_.startsWith("sig"))
    sig.collect().map(r => r.getLong(0) -> cols.indices.map(i => r.getLong(i + 1)).toSeq).toMap
  }

  test("reference law: Spark signatures equal the independent Scala reimplementation") {
    val got = collectSigs(TextDedup.minhashSignatures(TextDedup.shingleSet(docs), 16))
    var checked = 0
    corpus.foreach { case (id, text) =>
      refSignature(text, 16) match {
        case Some(want) => assert(got(id) == want, s"doc $id"); checked += 1
        case None => assert(!got.contains(id), s"doc $id has no shingles, no signature row")
      }
    }
    assert(checked > 50, s"law needs substance: only $checked docs had shingles")
  }

  test("union law: sig(A ∪ B) = elementwise min(sig(A), sig(B))") {
    // build union docs in shingle space: doc (i, i+60) pairs
    val sh = TextDedup.shingleSet(docs)
    val a = sh.filter(col("doc_id") < 60)
    val b = sh.filter(col("doc_id") >= 60)
      .withColumn("doc_id", col("doc_id") - 60)
    val union = a.unionByName(b).distinct()
    val sigU = collectSigs(TextDedup.minhashSignatures(union, 16))
    val sigAll = collectSigs(TextDedup.minhashSignatures(sh, 16))
    var checked = 0
    (0L until 60L).foreach { i =>
      (sigAll.get(i), sigAll.get(i + 60)) match {
        case (Some(sa), Some(sb)) =>
          val want = sa.zip(sb).map { case (x, y) => math.min(x, y) }
          assert(sigU(i) == want, s"pair ($i, ${i + 60})")
          checked += 1
        case (Some(sa), None) => assert(sigU(i) == sa)
        case (None, Some(sb)) => assert(sigU(i) == sb)
        case (None, None) => assert(!sigU.contains(i))
      }
    }
    assert(checked > 20)
  }

  test("duplication law: repeated shingle rows never change signatures; range law holds") {
    val sh = TextDedup.shingleSet(docs)
    val dup = sh.unionByName(sh).unionByName(sh) // 3 copies of every row
    val s1 = collectSigs(TextDedup.minhashSignatures(sh, 16))
    val s3 = collectSigs(TextDedup.minhashSignatures(dup, 16))
    assert(s1 == s3, "MIN is idempotent under duplication")
    assert(s1.values.flatten.forall(v => v >= 0L && v < TwoPow48),
      "every signature in [0, 2^48)")
  }

  test("estimator law: signature agreement tracks true Jaccard (64 hashes, seeded)") {
    val sh = TextDedup.shingleSet(docs)
    val sigs = collectSigs(TextDedup.minhashSignatures(sh, 64))
    val sets: Map[Long, Set[String]] = corpus.map { case (id, text) =>
      val toks = text.toLowerCase.split(" ").toSeq.filter(_.nonEmpty)
      id -> (if (toks.size < 3) Set.empty[String] else toks.sliding(3).map(_.mkString(" ")).toSet)
    }.toMap
    val ids = sets.filter(_._2.nonEmpty).keys.toSeq.sorted
    var checked = 0
    for (i <- ids; j <- ids if i < j && checked < 300) {
      val inter = sets(i).intersect(sets(j)).size.toDouble
      val truth = inter / sets(i).union(sets(j)).size
      val est = sigs(i).zip(sigs(j)).count { case (x, y) => x == y } / 64.0
      // 64 hashes: se = sqrt(J(1-J)/64) <= 0.0625; 4 se of slack
      assert(math.abs(est - truth) <= 0.25, s"pair ($i,$j): est=$est truth=$truth")
      checked += 1
    }
    assert(checked >= 100)
  }
}
