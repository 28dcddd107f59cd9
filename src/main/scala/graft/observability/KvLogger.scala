package graft.observability

/** Minimal 4-level structured key-value logger, the engine's analog of
  * the reference logger contract (/root/reference/observability/
  * logger.go:11-41): events are snake_case dotted names, arguments are
  * alternating key-value pairs, the default is a no-op, and adapters to
  * a real backend are one small class.
  *
  * Values are truncated at `truncateAt` characters so a sampled payload
  * can be logged without flooding (the 4096-byte cap the ingest pipeline
  * already applied inline).
  */
trait KvLogger extends Serializable {
  def debug(event: String, kv: (String, Any)*): Unit
  def info(event: String, kv: (String, Any)*): Unit
  def warn(event: String, kv: (String, Any)*): Unit
  def error(event: String, kv: (String, Any)*): Unit
}

object KvLogger {

  /** Discards everything — the default, so library code can log
    * unconditionally with zero cost to users who don't opt in. */
  object Nop extends KvLogger {
    override def debug(event: String, kv: (String, Any)*): Unit = ()
    override def info(event: String, kv: (String, Any)*): Unit = ()
    override def warn(event: String, kv: (String, Any)*): Unit = ()
    override def error(event: String, kv: (String, Any)*): Unit = ()
  }

  sealed abstract class Level(val rank: Int, val label: String)
  case object Debug extends Level(0, "DEBUG")
  case object Info extends Level(1, "INFO")
  case object Warn extends Level(2, "WARN")
  case object Error extends Level(3, "ERROR")

  /** Formats `LEVEL event k=v k=v` lines into `out`. `out` defaults to
    * stdout; tests inject a capturing sink.
    */
  final class Line(out: String => Unit = println(_),
                   minLevel: Level = Info,
                   truncateAt: Int = 4096) extends KvLogger {

    private def fmt(level: Level, event: String, kv: Seq[(String, Any)]): Unit =
      if (level.rank >= minLevel.rank) {
        val pairs = kv.map { case (k, v) =>
          val s = String.valueOf(v)
          s"$k=${if (s.length > truncateAt) s.take(truncateAt) + "..." else s}"
        }
        out((s"${level.label} $event" +: pairs).mkString(" "))
      }

    override def debug(event: String, kv: (String, Any)*): Unit = fmt(Debug, event, kv)
    override def info(event: String, kv: (String, Any)*): Unit = fmt(Info, event, kv)
    override def warn(event: String, kv: (String, Any)*): Unit = fmt(Warn, event, kv)
    override def error(event: String, kv: (String, Any)*): Unit = fmt(Error, event, kv)
  }
}
