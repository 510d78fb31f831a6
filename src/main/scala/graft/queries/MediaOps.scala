package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.TextFns
import graft.multimodal.Multimodal

/** Multimodal-plumbing queries. `q_media_meta` has no SQL oracle (the
  * stub codec runs in mapPartitions) — the driver records a rows-only
  * check; the ScalaTest spec pins its semantics.
  */
object MediaOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // column-expression feature extraction (portable hash → unit floats)
    "q_media_features" -> ((s, d) => {
      import s.implicits._
      val feats = (0 until 4).map(i =>
        round(TextFns.hash32(concat($"text", lit(s"#$i"))) / 4294967296.0, 6).as(s"f$i"))
      t(s, d, "documents")
        .select(($"doc_id" +: feats): _*)
        .orderBy($"doc_id")
    }),
    // binary payload → decoded metadata via the partition-parallel stub codec
    "q_media_meta" -> ((s, d) => {
      Multimodal.extractMeta(Multimodal.mediaFromDocuments(s, d))
        .toDF().orderBy(col("media_id"))
    }),
    // video frame sampling (rows-only like q_media_meta: the stub codec
    // derives deterministic frame digests; plumbing — one row per
    // sampled frame, partition-parallel — is the real thing)
    "q_frame_sample" -> ((s, d) => {
      Multimodal.sampleFrames(Multimodal.mediaFromDocuments(s, d))
        .toDF().orderBy(col("media_id"), col("frame_index"))
    })
  )

  private def featSql(i: Int): String =
    s"round(CAST(concat('0x', substr(md5(text || '#$i'), 1, 8)) AS BIGINT) / 4294967296.0, 6) AS f$i"

  val oracles: Map[String, String] = Map(
    "q_media_features" ->
      s"""SELECT doc_id, ${(0 until 4).map(featSql).mkString(", ")}
         |FROM documents ORDER BY doc_id""".stripMargin
  )
}
