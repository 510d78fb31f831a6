package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Web-scrape source (SURVEY.md §2.1 S5 — reference
  * `scraper/scraper.js:7-37`): fetch a page, extract `innerText` per
  * CSS selector; scalar if exactly 1 match, array if many, null if 0;
  * default extraction is {title, url}.
  *
  * The fetcher is pluggable: [[HttpPageFetcher]] is the
  * `java.net.http` default for static pages (the reference drives
  * headless Chrome, which a browser-backed fetcher could supply
  * behind the same seam); tests plug a stub. Extraction itself is a
  * small self-contained
  * matcher for the selector shapes the reference uses (tag, #id,
  * .class), driver-side: scrape targets are a handful of URLs, the
  * resulting DataFrame is what scales.
  */
object ScrapeSource {

  trait PageFetcher extends Serializable {
    def fetch(url: String): String
  }

  /** Default production fetcher: plain `java.net.http` GET with
    * redirects and a bounded timeout. No JS execution — a headless
    * browser (the reference drives Playwright Chromium,
    * `scraper/scraper.js:7-14`) would plug in behind the same seam for
    * script-rendered pages; for static HTML this is at parity.
    */
  final class HttpPageFetcher(timeoutSeconds: Long = 20) extends PageFetcher {
    @transient private lazy val client = java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds))
      .build()
    def fetch(url: String): String = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
        .header("User-Agent", "graft-scraper/1.0")
        .GET.build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() >= 400)
        throw new java.io.IOException(s"GET $url → HTTP ${resp.statusCode()}")
      resp.body()
    }
  }

  case class ScrapeRequest(url: String, selectors: Map[String, String])

  /** Minimal selector → innerText extraction over raw HTML. */
  private[sources] def select(html: String, selector: String): Seq[String] = {
    val tagBlock = (tag: String, attrFilter: Option[(String, String)]) => {
      val re = s"(?is)<$tag\\b([^>]*)>(.*?)</$tag>".r
      re.findAllMatchIn(html).flatMap { m =>
        val attrs = m.group(1)
        val inner = m.group(2)
        val keep = attrFilter.forall { case (attr, value) =>
          s"""(?i)$attr\\s*=\\s*["']([^"']*)["']""".r.findFirstMatchIn(attrs)
            .exists(_.group(1).split("\\s+").contains(value))
        }
        if (keep) Some(stripTags(inner)) else None
      }.toSeq
    }
    selector.trim match {
      case s if s.startsWith("#") =>
        val id = s.drop(1)
        val re = s"""(?is)<(\\w+)\\b[^>]*\\bid\\s*=\\s*["']$id["'][^>]*>(.*?)</\\1>""".r
        re.findAllMatchIn(html).map(m => stripTags(m.group(2))).toSeq
      case s if s.startsWith(".") => tagBlock("\\w+", Some("class" -> s.drop(1)))
      case tag => tagBlock(java.util.regex.Pattern.quote(tag), None)
    }
  }

  private def stripTags(s: String): String =
    s.replaceAll("(?s)<[^>]*>", " ").replaceAll("\\s+", " ").trim

  private val outputSchema = StructType(Seq(
    StructField("url", StringType),
    StructField("selector_key", StringType),
    StructField("n_matches", IntegerType),
    StructField("value", StringType),            // scalar (1 match) else null
    StructField("values", ArrayType(StringType)) // all matches (null if 0)
  ))

  /** Scrape a batch of requests into a DataFrame. Default selectors
    * (reference behavior): title → <title>, url → the page url.
    */
  def scrape(spark: SparkSession, fetcher: PageFetcher,
             requests: Seq[ScrapeRequest]): DataFrame = {
    val rows = requests.flatMap { req =>
      val html = fetcher.fetch(req.url)
      val selectors =
        if (req.selectors.nonEmpty) req.selectors
        else Map("title" -> "title")
      val selected = selectors.toSeq.map { case (key, sel) =>
        val matches = select(html, sel)
        Row(req.url, key, matches.length,
          if (matches.length == 1) matches.head else null,
          if (matches.isEmpty) null else matches)
      }
      if (req.selectors.nonEmpty) selected
      else selected :+ Row(req.url, "url", 1, req.url, Seq(req.url))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList), outputSchema)
  }
}
