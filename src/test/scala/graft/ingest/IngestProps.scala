package graft.ingest

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based laws for the pure ingest components (SURVEY.md §5:
  * ScalaCheck for threshold/format laws).
  */
object RetryProps extends Properties("SimpleRetry") {

  property("delay is monotonically nondecreasing and capped") =
    forAll(Gen.choose(1L, 500L), Gen.choose(500L, 5000L), Gen.choose(0, 40)) {
      (base, max, i) =>
        val r = SimpleRetry(attempts = 3, baseDelayMs = base, maxDelayMs = max)
        val d = r.delayMs(i)
        d <= max && d >= math.min(base, max) &&
          (i == 0 || r.delayMs(i - 1) <= d)
    }

  property("op succeeding within attempts always returns its value") =
    forAll(Gen.choose(1, 5), Gen.choose(0, 4)) { (attempts, failures) =>
      val r = SimpleRetry(attempts = attempts, sleep = _ => ())
      var left = failures
      def op(): Int = { if (left > 0) { left -= 1; sys.error("x") }; 42 }
      if (failures < attempts) Prop(r(op()) == 42)
      else Prop(scala.util.Try(r(op())).isFailure)
    }
}

object CodecProps extends Properties("ParquetCodec") {
  private val codecGen = for {
    name <- Gen.oneOf("none", "snappy", "gzip", "zstd")
    cased <- Gen.listOfN(name.length, Gen.oneOf(true, false))
  } yield name.zip(cased).map { case (c, up) => if (up) c.toUpper else c }.mkString

  property("parse is case-insensitive over the supported set") =
    forAll(codecGen) { s =>
      val out = ParquetCodec.parse(s)
      (s.toLowerCase != "none" && out == s.toLowerCase) ||
        (s.toLowerCase == "none" && out == "uncompressed")
    }

  property("unsupported codecs always throw") =
    forAll(Gen.alphaStr.suchThat(s => !ParquetCodec.Supported.contains(s.toLowerCase))) { s =>
      scala.util.Try(ParquetCodec.parse(s)).isFailure
    }
}

object QueueProps extends Properties("QueueRegistry") {
  import graft.sources.QueueRegistry

  property("enqueue/slice/ack bookkeeping") =
    forAll(Gen.choose(1, 50), Gen.choose(0, 49)) { (n, k) =>
      val q = new QueueRegistry.Queue(capacity = 128)
      (0 until n).foreach(i => q.enqueue(s"p$i"))
      val all = q.slice(-1L, q.latestSeq)
      val ackTo = math.min(k, n - 1).toLong
      q.ack(ackTo)
      val remaining = q.slice(-1L, q.latestSeq)
      all.size == n &&
        remaining.size == n - ackTo - 1 &&
        remaining.forall(_.seq > ackTo) &&
        q.pending == n - ackTo - 1
    }
}
