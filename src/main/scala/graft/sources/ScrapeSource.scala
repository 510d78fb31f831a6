package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Web-scrape source (SURVEY.md §2.1 S5 — reference
  * `scraper/scraper.js:7-37`): fetch a page, optionally activate a
  * `clickSelector` first (reference `scraper.js:13-15`), then extract
  * `innerText` per CSS selector; scalar if exactly 1 match, array if
  * many, null if 0; default extraction is {title, url}.
  *
  * The fetcher is pluggable: [[HttpPageFetcher]] is the
  * `java.net.http` default for static pages (the reference drives
  * headless Chrome, which a browser-backed fetcher could supply
  * behind the same seam — including the click); tests plug a stub.
  * Extraction is a self-contained element-tree matcher covering the
  * selector shapes the reference's Playwright locators take in
  * practice: tag, `#id`, `.class`, compound (`div.item#x`),
  * attribute (`a[href]`, `input[type=text]`), and descendant chains
  * (`#main ul li`). Driver-side: scrape targets are a handful of
  * URLs, the resulting DataFrame is what scales.
  */
object ScrapeSource {

  trait PageFetcher extends Serializable {
    def fetch(url: String): String

    /** Fetch after activating `clickSelector`. Browser-backed
      * fetchers click then extract (reference `scraper.js:13-15`);
      * the static HTTP fetcher has no JS, so the default ignores the
      * click — same degradation as the reference on a dead selector,
      * which swallows the click failure and extracts anyway.
      */
    def fetch(url: String, clickSelector: Option[String]): String = fetch(url)
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

  case class ScrapeRequest(url: String, selectors: Map[String, String],
                           clickSelector: Option[String] = None)

  // ---- minimal HTML element tree ----------------------------------------

  private[graft] final case class Elem(tag: String, attrs: Map[String, String],
                                         children: Vector[Either[Elem, String]]) {
    def innerText: String = {
      val sb = new StringBuilder
      def walk(e: Elem): Unit = e.children.foreach {
        case Left(c)  => walk(c)
        case Right(t) => sb.append(t).append(' ')
      }
      walk(this)
      sb.toString.replaceAll("\\s+", " ").trim
    }
  }

  private val VoidTags = Set("area", "base", "br", "col", "embed", "hr", "img",
    "input", "link", "meta", "source", "track", "wbr")

  private val TagRe =
    """(?s)<(/?)([a-zA-Z][\w-]*)((?:"[^"]*"|'[^']*'|[^>"'])*)>""".r
  private val AttrRe =
    """([\w-]+)(?:\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s"'>]+)))?""".r

  /** Parse raw HTML into an element tree. Tolerant: comments, doctype,
    * script/style bodies are stripped; stray close tags are ignored;
    * unclosed elements close at their ancestor's close.
    */
  private[graft] def parseHtml(html: String): Elem = {
    val cleaned = html
      .replaceAll("(?s)<!--.*?-->", "")
      .replaceAll("(?is)<script\\b[^>]*>.*?</script>", "")
      .replaceAll("(?is)<style\\b[^>]*>.*?</style>", "")
      .replaceAll("(?is)<!DOCTYPE[^>]*>", "")
    // stack of open elements: (tag, attrs, children-so-far)
    val stack = scala.collection.mutable.Stack[
      (String, Map[String, String], scala.collection.mutable.ArrayBuffer[Either[Elem, String]])]()
    stack.push(("", Map.empty, scala.collection.mutable.ArrayBuffer.empty))
    def addText(t: String): Unit = if (t.trim.nonEmpty) stack.top._3 += Right(t)
    def closeTop(): Unit = {
      val (tag, attrs, kids) = stack.pop()
      stack.top._3 += Left(Elem(tag, attrs, kids.toVector))
    }
    var last = 0
    for (m <- TagRe.findAllMatchIn(cleaned)) {
      addText(cleaned.substring(last, m.start))
      last = m.end
      val closing = m.group(1) == "/"
      val tag = m.group(2).toLowerCase
      val rawAttrs = m.group(3)
      if (closing) {
        if (stack.exists(_._1 == tag)) {      // ignore stray close tags
          while (stack.top._1 != tag) closeTop()
          if (stack.size > 1) closeTop()
        }
      } else {
        val attrs = AttrRe.findAllMatchIn(rawAttrs).map { a =>
          val v = Option(a.group(2)).orElse(Option(a.group(3))).orElse(Option(a.group(4)))
          a.group(1).toLowerCase -> v.getOrElse("")
        }.toMap
        val selfClosing = rawAttrs.trim.endsWith("/") || VoidTags(tag)
        if (selfClosing) stack.top._3 += Left(Elem(tag, attrs, Vector.empty))
        else stack.push((tag, attrs, scala.collection.mutable.ArrayBuffer.empty))
      }
    }
    addText(cleaned.substring(last))
    while (stack.size > 1) closeTop()
    val (_, _, kids) = stack.pop()
    Elem("", Map.empty, kids.toVector)
  }

  // ---- selector engine ---------------------------------------------------

  /** One compound selector: tag + #id + .classes + [attr(=value)] parts. */
  private final case class SimpleSel(tag: Option[String], id: Option[String],
                                     classes: Seq[String],
                                     attrs: Seq[(String, Option[String])])

  private val SimplePartRe =
    """([\w-]+|\*)|#([\w-]+)|\.([\w-]+)|\[([\w-]+)(?:\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\]\s"']+)))?\]""".r

  private def parseSimple(s: String): SimpleSel = {
    var tag: Option[String] = None
    var id: Option[String] = None
    val classes = Seq.newBuilder[String]
    val attrs = Seq.newBuilder[(String, Option[String])]
    for (m <- SimplePartRe.findAllMatchIn(s)) {
      if (m.group(1) != null) tag = Some(m.group(1).toLowerCase)
      else if (m.group(2) != null) id = Some(m.group(2))
      else if (m.group(3) != null) classes += m.group(3)
      else if (m.group(4) != null) {
        val v = Option(m.group(5)).orElse(Option(m.group(6))).orElse(Option(m.group(7)))
        attrs += (m.group(4).toLowerCase -> v)
      }
    }
    SimpleSel(tag, id, classes.result(), attrs.result())
  }

  /** Descendant chain: whitespace-separated compound selectors. */
  private def parseSelector(sel: String): List[SimpleSel] =
    sel.trim.split("\\s+").toList.filter(_.nonEmpty).map(parseSimple)

  private def matchesSimple(e: Elem, s: SimpleSel): Boolean =
    s.tag.forall(t => t == "*" || e.tag == t) &&
      s.id.forall(i => e.attrs.get("id").contains(i)) &&
      s.classes.forall(c => e.attrs.get("class").exists(_.split("\\s+").contains(c))) &&
      s.attrs.forall { case (a, v) => e.attrs.get(a).exists(av => v.forall(_ == av)) }

  /** Nearest-first ancestors must match `sels` in order (descendant
    * combinator — greedy scan is exact for descendant-only chains).
    */
  @annotation.tailrec
  private def ancestorsMatch(anc: List[Elem], sels: List[SimpleSel]): Boolean = sels match {
    case Nil => true
    case s :: rest => anc match {
      case Nil => false
      case a :: arest =>
        if (matchesSimple(a, s)) ancestorsMatch(arest, rest)
        else ancestorsMatch(arest, sels)
    }
  }

  /** Selector → innerText extraction over raw HTML, document order. */
  private[graft] def select(html: String, selector: String): Seq[String] = {
    val chain = parseSelector(selector)
    if (chain.isEmpty) return Seq.empty
    val target = chain.last
    val outer = chain.init.reverse // nearest ancestor first
    val out = Seq.newBuilder[String]
    def walk(e: Elem, anc: List[Elem]): Unit = {
      if (e.tag.nonEmpty && matchesSimple(e, target) && ancestorsMatch(anc, outer))
        out += e.innerText
      e.children.foreach { case Left(c) => walk(c, e :: anc); case _ => }
    }
    walk(parseHtml(html), Nil)
    out.result()
  }

  private val outputSchema = StructType(Seq(
    StructField("url", StringType),
    StructField("selector_key", StringType),
    StructField("n_matches", IntegerType),
    StructField("value", StringType),            // scalar (1 match) else null
    StructField("values", ArrayType(StringType)) // all matches (null if 0)
  ))

  /** Scrape a batch of requests into a DataFrame. Default selectors
    * (reference behavior): title → <title>, url → the page url. The
    * per-request `clickSelector` is handed to the fetcher before
    * extraction (reference `scraper.js:13-15`).
    */
  def scrape(spark: SparkSession, fetcher: PageFetcher,
             requests: Seq[ScrapeRequest]): DataFrame = {
    val rows = requests.flatMap { req =>
      val html = fetcher.fetch(req.url, req.clickSelector)
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
