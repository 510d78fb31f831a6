package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** REST API source (SURVEY.md §2.1 S7 — reference
  * `python_code/projectplan.md:79-86,139-141` plans a REST linked
  * service with `next`-link pagination copied into staging): walk a
  * paginated JSON API driver-side, then hand the accumulated items to
  * `spark.read.json` so schema inference and all downstream work are
  * distributed.
  *
  * Page shape (the reference's §5.2 pattern): a JSON object with an
  * items array and an optional next-link field —
  * `{"items":[...], "next":"/page2"}` — both field names
  * configurable; a missing/null next ends the walk. Relative next
  * links resolve against the current page URL.
  *
  * Scale: the HTTP walk is inherently sequential driver-side (each
  * next-link depends on the previous response — same shape as the
  * reference's ADF Copy activity); `maxPages` bounds it. The landed
  * DataFrame is what scales.
  */
object RestSource {

  trait JsonFetcher extends Serializable {
    def fetch(url: String): String
  }

  /** `java.net.http` GET with redirects, bounded timeout, JSON accept. */
  final class HttpJsonFetcher(timeoutSeconds: Long = 20) extends JsonFetcher {
    @transient private lazy val client = java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds))
      .build()
    def fetch(url: String): String = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
        .header("Accept", "application/json")
        .header("User-Agent", "graft-rest/1.0")
        .GET.build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() >= 400)
        throw new java.io.IOException(s"GET $url → HTTP ${resp.statusCode()}")
      resp.body()
    }
  }

  /** Read every page starting at `startUrl`, following `nextField`
    * links until null/absent/`maxPages`, and return the concatenated
    * `itemsField` arrays as an inferred-schema DataFrame. A page whose
    * items field is a single object contributes one row; a top-level
    * array page (no wrapper object) contributes all its elements and
    * ends the walk (no next link to follow).
    */
  def readPaginated(spark: SparkSession, fetcher: JsonFetcher, startUrl: String,
                    itemsField: String = "items", nextField: String = "next",
                    maxPages: Int = 1000): DataFrame = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val items = scala.collection.mutable.ArrayBuffer.empty[String]
    var url: String = startUrl
    var pages = 0
    while (url != null && pages < maxPages) {
      val root = mapper.readTree(fetcher.fetch(url))
      val arr =
        if (root.isArray) root
        else root.path(itemsField)
      if (arr.isArray) {
        val it = arr.elements()
        while (it.hasNext) items += mapper.writeValueAsString(it.next())
      } else if (arr.isObject) {
        items += mapper.writeValueAsString(arr)
      }
      val next = if (root.isArray) null else root.path(nextField)
      url =
        // blank next = end-of-pagination (a common API convention);
        // resolving "" would re-fetch the same page until maxPages
        if (next == null || next.isNull || next.isMissingNode || next.asText().isBlank) null
        else java.net.URI.create(url).resolve(next.asText()).toString
      pages += 1
    }
    import spark.implicits._
    if (items.isEmpty) spark.emptyDataFrame
    else spark.read.json(spark.createDataset(items.toSeq))
  }
}
