package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

/** Machine-readable scale-probe verdicts: every probe main appends its
  * JSON line to `PROBES.json` in the working directory (the repo root
  * under `sbt runMain`), replacing any earlier line with the same
  * `"metric"` — so the committed file always holds exactly one current
  * row per probe and a regression shows as a diff the next judge can
  * read, instead of living only in BASELINE.md prose.
  */
object ProbeLog {

  private val File = "PROBES.json"

  /** Replace-or-append `line` (a one-line JSON object containing
    * `"metric":"<metric>"`) in PROBES.json. */
  def record(metric: String, line: String): Unit = synchronized {
    val path = Paths.get(File)
    val existing =
      if (Files.exists(path))
        Files.readAllLines(path, StandardCharsets.UTF_8).asScala.toSeq
      else Seq.empty
    val kept = existing.filterNot(_.contains(s""""metric":"$metric""""))
    Files.write(path, (kept :+ line).mkString("", "\n", "\n")
      .getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
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
