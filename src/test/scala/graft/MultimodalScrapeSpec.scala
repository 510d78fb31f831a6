package graft

import graft.multimodal.Multimodal
import graft.sources.ScrapeSource

class MultimodalScrapeSpec extends SparkSpec {
  import spark.implicits._

  test("media pipeline: meta, features, frame samples — deterministic and partition-parallel") {
    val media = Multimodal.mediaFromDocuments(spark, sf()).repartition(4).cache()
    val n = media.count()
    assert(n == 500)

    val meta = Multimodal.extractMeta(media).cache()
    assert(meta.count() == n)
    val img = meta.filter(_.kind == "image").head()
    assert(img.format == "png-stub" && img.width >= 64 && img.height >= 64)
    val aud = meta.filter(_.kind == "audio").head()
    assert(aud.duration_ms >= 1000L && aud.width == 0)
    // determinism: same payload → same digest across two computations
    val d1 = meta.orderBy($"media_id").select($"digest").as[String].head()
    val d2 = Multimodal.extractMeta(media).orderBy($"media_id").select($"digest").as[String].head()
    assert(d1 == d2)

    val feats = Multimodal.extractFeatures(media, dim = 16)
    val f = feats.head()
    assert(f.embedding.length == 16 && f.embedding.forall(v => v >= 0f && v <= 1f))

    val frames = Multimodal.sampleFrames(media, every = 30, max = 4)
    val perVideo = frames.groupByKey(_.media_id).count().collect()
    assert(perVideo.nonEmpty && perVideo.forall(_._2 == 4))
    assert(frames.head().frame_digest.length == 16)

    // resize normalizes images to the target; non-images pass through
    val resized = Multimodal.resizeImages(media, w = 224, h = 224).cache()
    assert(resized.count() == n)
    val rImg = resized.filter(_.kind == "image").head()
    assert(rImg.width == 224 && rImg.height == 224
      && rImg.payload.length == 224 * 224 / 64)
    val rAud = resized.filter(_.kind == "audio").head()
    assert(rAud.width == 0 && rAud.payload.nonEmpty)
    resized.unpersist()
  }

  test("scrape source: scalar/array/null selector semantics and default title") {
    val html =
      """<html><head><title>Demo Page</title></head>
        |<body><h1 id="main">Heading</h1>
        |<p class="item">first</p><p class="item">second <b>bold</b></p>
        |</body></html>""".stripMargin
    val fetcher = new ScrapeSource.PageFetcher {
      def fetch(url: String): String = html
    }
    val df = ScrapeSource.scrape(spark, fetcher, Seq(
      ScrapeSource.ScrapeRequest("http://x/1", Map(
        "head" -> "#main", "items" -> ".item", "missing" -> "#nope")))).cache()

    val byKey = df.collect().map(r => r.getAs[String]("selector_key") -> r).toMap
    assert(byKey("head").getAs[String]("value") == "Heading")       // 1 match → scalar
    assert(byKey("items").getAs[String]("value") == null)           // many → array only
    assert(byKey("items").getAs[scala.collection.Seq[String]]("values") .toSeq == Seq("first", "second bold"))
    assert(byKey("missing").getAs[Int]("n_matches") == 0)           // 0 → null/null
    assert(byKey("missing").getAs[String]("value") == null && byKey("missing").getAs[scala.collection.Seq[String]]("values") == null)

    // default selectors: {title, url}
    val dflt = ScrapeSource.scrape(spark, fetcher, Seq(ScrapeSource.ScrapeRequest("http://x/2", Map())))
    val m = dflt.collect().map(r => r.getAs[String]("selector_key") -> r.getAs[String]("value")).toMap
    assert(m == Map("title" -> "Demo Page", "url" -> "http://x/2"))
  }
}
