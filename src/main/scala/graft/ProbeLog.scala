package graft

import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets
import java.nio.file.{Paths, StandardOpenOption}

/** Machine-readable scale-probe verdicts: every probe main appends its
  * JSON line to `PROBES.json` in the working directory (the repo root
  * under `sbt runMain`), replacing any earlier line with the same
  * `"metric"` — so the committed file always holds exactly one current
  * row per probe and a regression shows as a diff the next judge can
  * read, instead of living only in BASELINE.md prose.
  */
object ProbeLog {

  private val File = "PROBES.json"

  /** The `"metric"` field of a probe line, parsed (not substring
    * containment, which a value embedding another metric's name would
    * fool). */
  def metricOf(line: String): Option[String] =
    """"metric"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(line).map(_.group(1))

  /** Replace-or-append `line` (a one-line JSON object containing
    * `"metric":"<metric>"`) in PROBES.json. Probe mains run as separate
    * `sbt runMain` JVMs, so the read-filter-truncate-write cycle holds
    * an OS-level [[FileChannel]] lock — JVM-local `synchronized` alone
    * would let two concurrent probes silently drop each other's rows. */
  def record(metric: String, line: String): Unit = synchronized {
    val ch = FileChannel.open(Paths.get(File), StandardOpenOption.CREATE,
      StandardOpenOption.READ, StandardOpenOption.WRITE)
    try {
      val lock = ch.lock()
      try {
        val buf = ByteBuffer.allocate(ch.size().toInt)
        ch.read(buf, 0L)
        val existing = new String(buf.array(), 0, buf.position(),
            StandardCharsets.UTF_8)
          .split("\n").toSeq.filter(_.trim.nonEmpty)
        val kept = existing.filterNot(l => metricOf(l).contains(metric))
        val out = (kept :+ line).mkString("", "\n", "\n")
          .getBytes(StandardCharsets.UTF_8)
        ch.truncate(0L)
        ch.write(ByteBuffer.wrap(out), 0L)
      } finally lock.release()
    } finally ch.close()
  }

  /** Per-query JSON fragment for a (name, seconds, rows) result set. */
  def js(rs: Seq[(String, Double, Long)]): String =
    rs.map { case (n, t, r) =>
      f"""\"$n\":{\"sec\":$t%.3f,\"rows\":$r}"""
    }.mkString("{", ",", "}")

  /** Per-query time ratios scaled/base (the "flat at 10x?" verdict as
    * a number): {"q":{"time_ratio":..,"rows_ratio":..},...}. */
  def ratios(base: Seq[(String, Double, Long)],
      scaled: Seq[(String, Double, Long)]): String = {
    val b = base.map(r => r._1 -> r).toMap
    scaled.flatMap { case (n, t, rows) =>
      b.get(n).map { case (_, bt, brows) =>
        val tr = if (bt > 0) t / bt else -1.0
        val rr = if (brows > 0) rows.toDouble / brows else -1.0
        f""""$n":{"time_ratio":$tr%.2f,"rows_ratio":$rr%.2f}"""
      }
    }.mkString("{", ",", "}")
  }
}
