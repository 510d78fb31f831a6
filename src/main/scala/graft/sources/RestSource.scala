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

  // default-path spill dirs swept at JVM exit (one hook, lazy install)
  private val tempSpills = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val sweepHook: Unit = Runtime.getRuntime.addShutdownHook(new Thread(() =>
    tempSpills.forEach(p =>
      try graft.util.Fs.deleteRecursively(p) catch { case _: Exception => () }),
    "graft-rest-spill-sweep"))
  private def sweepAtExit(p: java.nio.file.Path): Unit = { sweepHook; tempSpills.add(p): Unit }

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
    *
    * Driver memory is bounded: every `spillEveryPages` pages the
    * accumulated items are flushed to a JSONL part file (atomic
    * hidden-write-then-rename, the [[BlobLanding]] publish shape), and
    * the final frame is read back from the spill files — a deep walk
    * holds at most one flush window of items in driver memory, not the
    * whole copy. A walk that ends inside the first window never touches
    * disk. Spills go to a fresh temp directory, or — when `spillDir` is
    * given — a fresh UNIQUE subdirectory of it, so the raw paged copy
    * is kept as an auditable artifact and concurrent or repeated walks
    * into the same landing root can neither clobber each other's parts
    * nor leak a previous walk's leftovers into this frame (the frame
    * lazily re-reads its spill files, so they must outlive it).
    */
  def readPaginated(spark: SparkSession, fetcher: JsonFetcher, startUrl: String,
                    itemsField: String = "items", nextField: String = "next",
                    maxPages: Int = 1000, spillEveryPages: Int = 100,
                    spillDir: Option[String] = None): DataFrame = {
    require(spillEveryPages > 0, "spillEveryPages must be positive")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val items = scala.collection.mutable.ArrayBuffer.empty[String]
    var spillPath: java.nio.file.Path = null
    var parts = 0
    def flush(): Unit = if (items.nonEmpty) {
      if (spillPath == null) {
        spillPath = spillDir.map { d =>
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
          // unique per walk: reading the shared root would merge stale
          // parts of previous walks into this frame, and same-named
          // parts would silently rename-replace published artifacts
          java.nio.file.Files.createTempDirectory(
            java.nio.file.Paths.get(d), "walk-")
        }.getOrElse {
          // default temp spills must outlive the lazily-read frame, so
          // they cannot be deleted here — sweep them at JVM exit so a
          // long-lived driver doing many deep walks doesn't fill /tmp.
          // Callers keeping frames past JVM exit pass spillDir and own
          // the artifact's lifecycle.
          val t = java.nio.file.Files.createTempDirectory("graft_rest_spill")
          sweepAtExit(t)
          t
        }
      }
      val name = f"part-$parts%05d.jsonl"
      val tmp = spillPath.resolve(s".$name.tmp")
      java.nio.file.Files.write(tmp, items.mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, spillPath.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      parts += 1
      items.clear()
    }
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
      if (pages % spillEveryPages == 0) flush()
    }
    import spark.implicits._
    if (parts == 0) {
      // whole walk fit in one window: no disk round-trip
      if (items.isEmpty) spark.emptyDataFrame
      else spark.read.json(spark.createDataset(items.toSeq))
    } else {
      flush()
      spark.read.json(spillPath.toString)
    }
  }
}
