package graft.ingest.examples

import graft.ingest.{Envelope, Transformer}

/** The canonical three-field record every reference example/bench uses
  * (/root/reference/examples/basic/main.go:17-21,
  * /root/reference/encoder/encoder_parquet_test.go:215-231).
  */
case class Item(id: Long, name: String, value: Double)

/** JSON → Item transformer (reference examples/basic/main.go:51-61
  * analog): parse errors throw → failure-routed to the DLQ. A
  * hand-rolled parser keeps the example dependency-free; production
  * pipelines should prefer the declarative `from_json` column path.
  */
class JsonItemTransformer extends Transformer[Item] {
  private val Re =
    """\{\s*"id":\s*(-?\d+),\s*"name":\s*"([^"]*)",\s*"value":\s*(-?[\d.eE+]+)\s*\}""".r
  override def transform(e: Envelope): Seq[Item] = e.payload match {
    case Re(id, name, v) => Seq(Item(id.toLong, name, v.toDouble))
    case _ => throw new IllegalArgumentException(s"unparseable payload: ${e.payload.take(40)}")
  }
}
