package graft.functions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

import scala.util.Random

/** The fuzz gate [[JaroWinklerAlgo]]'s docstring points at.
  *
  * Two independent checks pin the semantics:
  *   - a 3000-pair fuzz against [[JaroWinklerSpec.reference]], a
  *     from-the-paper reimplementation written without looking at the
  *     production code (per-character match lists instead of boolean
  *     masks, separate jaro/winkler functions) — bit-exact equality,
  *     not epsilon;
  *   - the classic published vectors (Winkler's MARTHA/MARHTA family)
  *     plus the pinned edge cases (empty → 0.0, 1-char window clamp,
  *     boost threshold strictly > 0.7).
  *
  * DuckDB bit-exactness is pinned separately and continuously by the
  * fz03 oracle gate (driver-run at sf0.01); this spec is the in-repo
  * half that runs in `sbt test`.
  */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinklerAlgo.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("published Winkler vectors") {
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("JELLYFISH", "SMELLYFISH") == 0.8962962962962964)
  }

  test("pinned edge cases") {
    assert(jw("", "") == 0.0)       // both empty is 0.0, NOT 1.0
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("a", "a") == 1.0)     // window clamp: md=0 still matches i==j
    assert(jw("a", "b") == 0.0)
    assert(jw("identical", "identical") == 1.0)
    // transposition counting: 6 matches, the matched buffers
    // (abcdef vs badcfe) disagree at all 6 positions → t = 3; no
    // common prefix → no Winkler boost despite jaro > 0.7.
    assert(jw("abcdef", "badcfe") == (1.0 + 1.0 + 0.5) / 3.0)
  }

  test("pinned non-ASCII semantics: UTF-16 code units, NOT bytes") {
    // The r15 verdict asked for the docstring's UTF-16 claim as a
    // tested fact. 'é' is ONE code unit here; a byte-based engine
    // (DuckDB operates on UTF-8 bytes) sees TWO bytes — same
    // algorithm, different string length, different score:
    //   units: l=4/4, m=3 (c,a,f), t=0 → j=(3/4+3/4+1)/3=5/6,
    //          prefix 3 → jw = 5/6 + 0.1·3·(1/6) = 0.8833…
    //   bytes: l=5/4 → j=(3/5+3/4+1)/3 → jw = 0.8483… (documented
    //          divergence — why fz03/fz04 pin ASCII as the key domain)
    // expected written in the algo's exact double op order (0.1*3 is
    // NOT 0.3 in IEEE)
    val j = (3.0 / 4 + 3.0 / 4 + 3.0 / 3) / 3.0
    assert(jw("café", "cafe") == j + 0.1 * 3 * (1.0 - j))
    assert(jw("café", "café") == 1.0) // identical non-ASCII is exact
    // astral plane: one emoji = TWO code units (surrogate pair).
    // "a🎉" has unit length 3 vs "ab" 2: md=0, only 'a' matches →
    // j = (1/3 + 1/2 + 1)/3, below the 0.7 boost threshold.
    assert(jw("a🎉", "ab") == (1.0 / 3.0 + 0.5 + 1.0) / 3.0)
    // the Catalyst expression agrees with the algo on non-ASCII (the
    // fuzz alphabet is ASCII; this pins the UTF8String→String path)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val got = Seq(("café", "cafe")).toDF("a", "b")
      .select(graft.functions.jaro_winkler(col("a"), col("b")))
      .as[Double].head()
    assert(got == jw("café", "cafe"))
  }

  test("3000-pair fuzz is bit-exact against an independent reference") {
    val rnd = new Random(42)
    val alphabet = "abcdefgh" // small alphabet → dense matches/transpositions
    def randStr(): String = {
      val n = rnd.nextInt(13) // 0..12, includes empties
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    (1 to 3000).foreach { i =>
      val (a, b) = (randStr(), randStr())
      val got = jw(a, b)
      val want = JaroWinklerSpec.reference(a, b)
      assert(got == want, s"pair $i: jw($a, $b) = $got, reference = $want")
    }
  }

  test("SQL surface: registered, codegen'd, null-intolerant") {
    val rows = spark.sql(
      """SELECT jaro_winkler('MARTHA', 'MARHTA') AS a,
        |       jaro_winkler(CAST(NULL AS STRING), 'x') AS b,
        |       jaro_winkler('x', CAST(NULL AS STRING)) AS c""".stripMargin)
      .collect().head
    assert(rows.getDouble(0) == 0.9611111111111111)
    assert(rows.isNullAt(1) && rows.isNullAt(2))
    // non-string args rejected at analysis time
    val err = intercept[Exception](spark.sql("SELECT jaro_winkler(1, 2)").collect())
    assert(err.getMessage.contains("jaro_winkler"))
  }

  test("codegen path agrees with interpreted eval on the hot loop") {
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    val rnd = new Random(7)
    val pairs = (1 to 500).map { _ =>
      def s() = (0 until rnd.nextInt(10)).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
      (s(), s())
    }
    // A bare local DataFrame would be folded by ConvertToLocalRelation
    // (interpreted eval at optimize time, no codegen stage at all), so
    // round-trip through parquet to get a real scan + WholeStageCodegen
    // span — the same shape the fz03 verify runs at scale.
    val dir = tmpDir("jw-codegen")
    pairs.toDF("a", "b").write.mode("overwrite").parquet(dir)
    val scanned = spark.read.parquet(dir)
      .select(col("a"), col("b"), expr("jaro_winkler(a, b)").as("jw"))
    val viaCodegen = scanned.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(viaCodegen((a, b)) == jw(a, b), s"($a, $b)")
    }
    // and it IS inside codegen: in the simple plan string a
    // WholeStageCodegen stage renders as the `*(n)` prefix — the
    // jaro_winkler Project must carry one (a codegen-unsupported
    // expression would strand it as a bare `Project`).
    val plan = scanned.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[.*jaro_winkler.*"), plan)
  }
}

object JaroWinklerSpec {

  /** Independent Jaro–Winkler, straight from the published definition.
    * Deliberately structured differently from [[JaroWinklerAlgo]]:
    * collects matched characters into buffers and compares the two
    * buffers for transpositions, instead of walking boolean masks.
    */
  def reference(s1: String, s2: String): Double = {
    if (s1.isEmpty || s2.isEmpty) return 0.0
    val window = math.max(math.max(s1.length, s2.length) / 2 - 1, 0)
    val used2 = Array.fill(s2.length)(false)
    val m1 = new StringBuilder
    for (i <- s1.indices) {
      val from = math.max(0, i - window)
      val to = math.min(s2.length - 1, i + window)
      var j = from
      var found = false
      while (j <= to && !found) {
        if (!used2(j) && s1(i) == s2(j)) { used2(j) = true; m1 += s1(i); found = true }
        j += 1
      }
    }
    val m2 = new StringBuilder
    for (j <- s2.indices) if (used2(j)) m2 += s2(j)
    val m = m1.length
    if (m == 0) return 0.0
    val transpositions = m1.toString.zip(m2.toString).count { case (x, y) => x != y } / 2
    val jaro = (m.toDouble / s1.length + m.toDouble / s2.length +
      (m - transpositions).toDouble / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      val prefix = s1.zip(s2).take(4).takeWhile { case (x, y) => x == y }.length
      jaro + 0.1 * prefix * (1.0 - jaro)
    }
  }
}
