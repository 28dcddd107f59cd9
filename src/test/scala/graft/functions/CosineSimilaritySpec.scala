package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def cosRows(rows: Seq[(Seq[Double], Seq[Double])]): Seq[Option[Double]] =
    rows.toDF("a", "b")
      .select(cosine_similarity(col("a"), col("b")).as("c"))
      .as[Option[Double]].collect().toSeq

  test("orthogonal, parallel and antiparallel vectors") {
    val got = cosRows(Seq(
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(1.0, 2.0), Seq(2.0, 4.0)),
      (Seq(1.0, 0.0), Seq(-1.0, 0.0))))
    assert(math.abs(got(0).get - 0.0) < 1e-12)
    assert(math.abs(got(1).get - 1.0) < 1e-12)
    assert(math.abs(got(2).get + 1.0) < 1e-12)
  }

  test("zero-norm vector yields null") {
    assert(cosRows(Seq((Seq(0.0, 0.0), Seq(1.0, 1.0)))) == Seq(None))
  }

  test("float arrays match double arrays") {
    val f = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(3.0f, 2.0f, 1.0f))).toDF("a", "b")
      .select(cosine_similarity(col("a"), col("b"))).as[Double].head()
    val d = cosRows(Seq((Seq(1.0, 2.0, 3.0), Seq(3.0, 2.0, 1.0)))).head.get
    assert(math.abs(f - d) < 1e-12)
  }

  test("null input propagates null") {
    val got = spark.sql(
      "SELECT cosine_similarity(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d, 2.0d))")
      .collect().head
    assert(got.isNullAt(0))
  }

  test("matches manual dot/norm formula on testdata embeddings") {
    val rows = tables.embeddings.limit(2)
      .select($"embedding".cast("array<double>")).as[Seq[Double]].collect()
    val (a, b) = (rows(0), rows(1))
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val expected = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    val got = Seq((a, b)).toDF("a", "b")
      .select(cosine_similarity(col("a"), col("b"))).as[Double].head()
    assert(math.abs(got - expected) < 1e-12)
  }
}
