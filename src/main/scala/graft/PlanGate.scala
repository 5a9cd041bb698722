package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape regression gate over the ENTIRE query registry — the
  * generalization of PlanSpec's hand-picked assertions. PlanSpec pins
  * ~a dozen load-bearing shapes (broadcast on the as-of join, no
  * SinglePartition under RangeRank, no cross join in m05, ...); every
  * OTHER query's plan is unguarded, so a refactor that silently turns
  * a broadcast join into a sort-merge join — or re-introduces a
  * single-partition exchange — on an unpinned query would only show up
  * as a bench-total drift two rounds later.
  *
  * This main runs every registered query at sf0.001, counts the
  * plan-shape features of the AQE-FINAL physical plan (join
  * strategies, exchanges, SinglePartition occurrences, codegen'd
  * operators), and writes one sorted JSON line per query to committed
  * `PLANS.json`. Like the PROBES.json gate: the fresh file is ALWAYS
  * written (the diff is the review artifact), and the exit code
  * carries the verdict — nonzero when any query present in the
  * committed file changed its fingerprint. Intentional plan changes
  * are adjudicated by committing the new file; new queries gate from
  * their next run.
  *
  * Counts are relative: a SinglePartition from a legitimate global
  * aggregate is recorded, not policed — the gate fires on CHANGE
  * (0 -> 1 on a query that never had one), which is exactly the
  * regression PlanSpec can't see on unpinned queries. Feature counts
  * are taken at sf0.001, where AQE's size-based choices (broadcast
  * thresholds) are at their most generous — so an smj appearing HERE
  * means the plan lost broadcastability outright, not that a
  * threshold moved.
  *
  * Run: `sbt "runMain graft.PlanGate"` (~3 min; streaming/sink queries
  * execute their pipelines to reach a final plan — their fingerprint
  * covers the batch assembly of their result, the streaming micro-batch
  * plans stay covered by StreamingSpec).
  */
object PlanGate {

  /** Counted plan-shape features: name -> regex over the formatted
    * AQE-final plan (details sections included, so Exchange arguments
    * like SinglePartition are visible). `cg` counts codegen'd operators
    * — formatted mode renders them as `+- * Op (n)` / `:- * Op (n)`. */
  val Features: Seq[(String, String)] = Seq(
    "smj" -> "SortMergeJoin",
    "bhj" -> "BroadcastHashJoin",
    "shj" -> "ShuffledHashJoin",
    "bnlj" -> "BroadcastNestedLoop",
    "cart" -> "CartesianProduct",
    "exch" -> "Exchange",
    "single" -> "SinglePartition",
    "cg" -> "[+:]- \\* ")

  /** Feature counts over the AQE-final section only: the "Initial
    * Plan" section that follows renders the pre-adaptive plan, whose
    * operator set legitimately differs (SMJ->BHJ conversion, coalesced
    * exchanges). */
  def fingerprint(formatted: String): Seq[(String, Int)] = {
    val fin = formatted.split("== Initial Plan ==")(0)
    Features.map { case (k, re) => k -> re.r.findAllIn(fin).size }
  }

  def line(q: String, fp: Seq[(String, Int)]): String =
    fp.map { case (k, v) => s""""$k":$v""" }
      .mkString(s"""{"q":"$q",""", ",", "}")

  /** Parse a PLANS.json text into query -> feature counts. */
  def parse(text: String): Map[String, Map[String, Int]] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods.parseOpt
    text.split("\n").toSeq.filter(_.trim.nonEmpty).flatMap { l =>
      parseOpt(l).collect { case JObject(fs) =>
        val m = fs.toMap
        m.get("q").collect { case JString(q) =>
          q -> m.collect { case (k, JInt(v)) if k != "q" => k -> v.toInt }
        }
      }.flatten
    }.toMap
  }

  /** Gating differences: any feature-count change (or an error
    * sentinel appearing) on a query present in BOTH files. Added and
    * removed queries are the verify gate's jurisdiction, not a plan
    * regression — they are not findings here. */
  def diff(oldText: String, newText: String): Seq[String] = {
    val o = parse(oldText)
    parse(newText).toSeq.sortBy(_._1).flatMap { case (q, fp) =>
      o.get(q).toSeq.flatMap { ofp =>
        (ofp.keySet ++ fp.keySet).toSeq.sorted.flatMap { k =>
          val (ov, nv) = (ofp.getOrElse(k, 0), fp.getOrElse(k, 0))
          if (ov != nv) Some(s"$q: $k $ov -> $nv") else None
        }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)

    val rows = SparkEntry.queries.keys.toSeq.sorted.map { n =>
      val fp = try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.collect() // AQE-final plan
        fingerprint(
          df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[plangate] $n ERROR ${e.getClass.getSimpleName}")
        Seq("err" -> 1)
      }
      line(n, fp)
    }

    val file = sys.props.getOrElse("graft.plans.file", "PLANS.json")
    val path = Paths.get(file)
    val old =
      if (Files.exists(path))
        new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
      else ""
    val fresh = rows.mkString("", "\n", "\n")
    Files.write(path, fresh.getBytes(StandardCharsets.UTF_8))

    val findings = diff(old, fresh)
    spark.stop()
    if (findings.nonEmpty) {
      findings.foreach(f =>
        System.err.println(s"[plangate] PLAN CHANGE vs committed PLANS.json: $f"))
      sys.exit(1)
    }
  }
}
