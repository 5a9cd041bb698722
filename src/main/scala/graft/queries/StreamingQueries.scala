package graft.queries

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.functions._
import graft.sinks.KeyedUpsert
import graft.sources.{Tables, Topic}
import graft.streaming.StreamingMedallion

/** Streaming operators surfaced through the batch correctness gate: the
  * bounded (Trigger.AvailableNow) streaming medallion must converge to
  * exactly the state the batch pipeline computes, so the day-rollup
  * oracle from PipelineQueries verifies the whole streaming topology —
  * topic source, watermark dedup, stream–static joins, update-mode
  * aggregation and the keyed-upsert MERGE sink.
  */
object StreamingQueries {

  private def freshDir(name: String): Path = {
    val p = Paths.get(s"/tmp/graft-stream/$name")
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
    }
    Files.createDirectories(p)
    p
  }

  val all: Map[String, Q] = Map(

    // ST1/ST2/ST3/K4 end-to-end: streamed day rollup == batch day rollup.
    "st01_stream_day_rollup" -> Q(PipelineQueries.rollupSql("day")) { (s, d) =>
      val root = freshDir(s"st01-${d.replaceAll("[^0-9a-zA-Z.]", "_")}")
      val topic = s"$root/topic"
      val out = s"$root/rollup"
      val ckpt = s"$root/ckpt"
      Topic.publishEvents(Tables.events(s, d), topic, nFiles = 2)
      // retention wide enough that the shuffled replay has no late drops:
      // the bounded run must converge to the batch-exact state
      StreamingMedallion.runDayRollup(s, topic, out, ckpt,
        maxFilesPerTrigger = 1, numBuckets = 8, dedupRetention = "3650 days")
      KeyedUpsert.read(s, out)
        .select("id", "bucket_ts", "remote_id", "metric_id", "provider_id",
          "category_id", "sum_value", "avg_value", "min_value", "max_value", "n")
        .orderBy("id", "bucket_ts")
    }
  )
}
