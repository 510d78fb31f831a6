package graft

import java.nio.file.Files

import graft.sources.{BlobLanding, IncrementalIngestion, JdbcSource, RestSource, SoapSource}

/** Planned-source parity (SURVEY §2.1 S7, K5): REST pagination, SOAP
  * row landing, JDBC watermark-incremental copy (against embedded
  * Derby), and the atomically-published blob landing sink.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("REST source walks next-links and lands all pages as one frame") {
    val pages = Map(
      "/api/items" -> """{"items":[{"id":1,"v":"a"},{"id":2,"v":"b"}],"next":"/api/items?page=2"}""",
      "/api/items?page=2" -> """{"items":[{"id":3,"v":"c"}],"next":null}""")
    var calls = List.empty[String]
    val fetcher = new RestSource.JsonFetcher {
      def fetch(url: String): String = {
        val key = url.stripPrefix("http://api.test")
        calls = calls :+ key
        pages(key)
      }
    }
    val df = RestSource.readPaginated(spark, fetcher, "http://api.test/api/items")
    assert(calls == List("/api/items", "/api/items?page=2")) // relative next resolved
    assert(df.orderBy($"id").select($"id", $"v").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))

    // top-level-array page: all elements, no pagination
    val arrFetcher = new RestSource.JsonFetcher {
      def fetch(url: String): String = """[{"id":9},{"id":10}]"""
    }
    assert(RestSource.readPaginated(spark, arrFetcher, "http://api.test/arr")
      .select($"id").as[Long].collect().toSet == Set(9L, 10L))

    // maxPages bounds a pathological self-linking API
    val loopFetcher = new RestSource.JsonFetcher {
      def fetch(url: String): String = """{"items":[{"id":1}],"next":"/loop"}"""
    }
    assert(RestSource.readPaginated(spark, loopFetcher, "http://api.test/loop",
      maxPages = 5).count() == 5)

    // a blank next link ends the walk (it is NOT the current page again)
    val blankNext = new RestSource.JsonFetcher {
      def fetch(url: String): String = """{"items":[{"id":1}],"next":""}"""
    }
    assert(RestSource.readPaginated(spark, blankNext, "http://api.test/b").count() == 1)
  }

  test("REST pagination spills to landing parts without changing the frame") {
    // a 9-page walk; driver memory must hold at most flush-N pages
    val fetcher = new RestSource.JsonFetcher {
      def fetch(url: String): String = {
        val p = url.split("/w/")(1).toInt
        val next = if (p < 9) s""","next":"/w/${p + 1}"""" else ""
        s"""{"items":[{"id":$p,"v":"p$p-a"},{"id":${p + 100},"v":"p$p-b"}]$next}"""
      }
    }
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
      df.select($"id", $"v").as[(Long, String)].collect().toSet
    val inMemory = rows(RestSource.readPaginated(spark, fetcher, "http://api.test/w/1"))
    assert(inMemory.size == 18)
    // flush every 2 pages: same frame, via spill files
    val spilled = RestSource.readPaginated(spark, fetcher, "http://api.test/w/1",
      spillEveryPages = 2)
    assert(rows(spilled) == inMemory)
    assert(spilled.schema == RestSource.readPaginated(
      spark, fetcher, "http://api.test/w/1").schema)
    // an explicit spillDir keeps each walk's paged copy as complete
    // JSONL parts (9 pages / flush-2 = 5 parts) in its OWN unique
    // subdirectory — a second walk into the same landing root must not
    // clobber the first walk's artifact nor absorb its leftovers
    val dir = Files.createTempDirectory("graft_rest_land")
    def walkDirs(): List[java.nio.file.Path] = {
      val ls = Files.list(dir).iterator()
      scala.jdk.CollectionConverters.IteratorHasAsScala(ls).asScala.toList
        .sortBy(_.getFileName.toString)
    }
    def partsOf(w: java.nio.file.Path): List[String] = {
      val ls = Files.list(w).iterator()
      scala.jdk.CollectionConverters.IteratorHasAsScala(ls).asScala
        .map(_.getFileName.toString).toList.sorted
    }
    val viaDir = RestSource.readPaginated(spark, fetcher, "http://api.test/w/1",
      spillEveryPages = 2, spillDir = Some(dir.toString))
    assert(rows(viaDir) == inMemory)
    assert(walkDirs().size == 1)
    assert(partsOf(walkDirs().head) == (0 until 5).map(i => f"part-$i%05d.jsonl").toList)
    // a second, shorter walk (flush-4 → 3 parts): both artifacts intact,
    // second frame carries only its own rows
    val viaDir2 = RestSource.readPaginated(spark, fetcher, "http://api.test/w/1",
      spillEveryPages = 4, spillDir = Some(dir.toString))
    assert(rows(viaDir2) == inMemory)
    assert(walkDirs().size == 2)
    assert(walkDirs().map(partsOf).map(_.size).sorted == List(3, 5))
    assert(rows(viaDir) == inMemory) // first artifact unharmed
  }

  test("REST source over a live local HTTP endpoint") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def page(path: String, body: String): Unit =
      server.createContext(path, (x: com.sun.net.httpserver.HttpExchange) => {
        val b = body.getBytes("UTF-8")
        x.getResponseHeaders.add("Content-Type", "application/json")
        x.sendResponseHeaders(200, b.length)
        x.getResponseBody.write(b); x.close()
      })
    page("/p1", """{"items":[{"k":"x"}],"next":"/p2"}""")
    page("/p2", """{"items":[{"k":"y"}]}""")
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val df = RestSource.readPaginated(spark, new RestSource.HttpJsonFetcher(), s"$base/p1")
      assert(df.select($"k").as[String].collect().toSet == Set("x", "y"))
    } finally server.stop(0)
  }

  test("SOAP source lands repeating row elements as a string-typed frame") {
    val response =
      """<?xml version="1.0"?>
        |<soap:Envelope xmlns:soap="http://schemas.xmlsoap.org/soap/envelope/">
        |<soap:Body><m:GetOrdersResponse xmlns:m="urn:orders">
        |<m:Order><m:OrderId>ORD-1</m:OrderId><m:Amount>10.50</m:Amount></m:Order>
        |<m:Order><m:OrderId>ORD-2</m:OrderId><m:Amount>99.00</m:Amount>
        |  <m:Note>rush</m:Note></m:Order>
        |</m:GetOrdersResponse></soap:Body></soap:Envelope>""".stripMargin
    var seen: Option[(String, String, String)] = None
    val transport = new SoapSource.SoapTransport {
      def call(url: String, action: String, envelope: String): String = {
        seen = Some((url, action, envelope)); response
      }
    }
    val df = SoapSource.readRows(spark, transport, "http://svc.test/soap",
      "urn:orders/GetOrders", "<m:GetOrders xmlns:m=\"urn:orders\"/>", rowTag = "Order")
    val (u, a, env) = seen.get
    assert(u == "http://svc.test/soap" && a == "urn:orders/GetOrders")
    assert(env.contains("<soap:Body><m:GetOrders") && env.contains("soap:Envelope"))
    assert(df.columns.toSeq == Seq("OrderId", "Amount", "Note")) // union schema
    val rows = df.orderBy($"OrderId").as[(String, String, String)].collect().toSeq
    assert(rows == Seq(("ORD-1", "10.50", null), ("ORD-2", "99.00", "rush")))
    // a doctype in the response is rejected, not expanded
    val evil = new SoapSource.SoapTransport {
      def call(url: String, action: String, envelope: String): String =
        "<!DOCTYPE x [<!ENTITY e SYSTEM 'file:///etc/passwd'>]><r>&e;</r>"
    }
    intercept[Exception] {
      SoapSource.readRows(spark, evil, "http://svc.test/soap", "a", "<b/>", "r")
    }
  }

  test("JDBC watermark-incremental copy against embedded Derby") {
    val dbDir = Files.createTempDirectory("graft_derby").resolve("db")
    val url = s"jdbc:derby:$dbDir;create=true"
    val stateDir = Files.createTempDirectory("graft_wm").toString
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE orders (order_id INT, customer VARCHAR(10), amount DOUBLE)")
      st.execute("INSERT INTO orders VALUES (1,'C1',10.0),(2,'C2',20.0),(3,'C1',30.0)")

      // full copy, range-partitioned
      val full = JdbcSource.read(spark, url, "orders",
        partitionOn = Some(("order_id", 1L, 3L)), numPartitions = 2)
      assert(full.count() == 3 && full.rdd.getNumPartitions == 2)

      // first incremental window: everything; commit advances the mark
      val inc1 = JdbcSource.readIncremental(spark, url, "orders", "order_id", stateDir)
      assert(inc1.df.count() == 3 && inc1.newMark.contains("3"))
      inc1.commit()

      // nothing new → empty window, mark sticks at 3
      val inc2 = JdbcSource.readIncremental(spark, url, "orders", "order_id", stateDir)
      assert(inc2.df.count() == 0 && inc2.newMark.contains("3"))

      // new rows → only the delta; uncommitted read replays (at-least-once)
      st.execute("INSERT INTO orders VALUES (4,'C3',40.0),(5,'C1',50.0)")
      val inc3 = JdbcSource.readIncremental(spark, url, "orders", "order_id", stateDir)
      assert(inc3.df.select($"ORDER_ID").as[Int].collect().toSet == Set(4, 5))
      val replay = JdbcSource.readIncremental(spark, url, "orders", "order_id", stateDir)
      assert(replay.df.count() == 2) // inc3 never committed
      replay.commit()
      assert(JdbcSource.readIncremental(spark, url, "orders", "order_id", stateDir)
        .df.count() == 0)
    } finally conn.close()
  }

  test("scheduled incremental ingestion commits the watermark only after success") {
    val dbDir = Files.createTempDirectory("graft_derby_sched").resolve("db")
    val url = s"jdbc:derby:$dbDir;create=true"
    val stateDir = Files.createTempDirectory("graft_wm_sched").toString
    val landing = Files.createTempDirectory("graft_land_sched").toString
    val work = Files.createTempDirectory("graft_schedrun").toString
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE orders_inc (OrderId INT, CustomerId VARCHAR(10), " +
        "Amount VARCHAR(10), OrderDate VARCHAR(10))")
      st.execute("INSERT INTO orders_inc VALUES (1,'C1','10.00','2024-01-01')," +
        "(2,'C2','20.00','2024-01-02')")
      val cat = new graft.catalog.RunCatalog(spark, s"$work/catalog")
      val runner = new graft.runner.PipelineRunner(spark, cat, work)
      def fireOnce(): IncrementalIngestion.FireOutcome =
        IncrementalIngestion.fire(spark, runner, url, "orders_inc", "OrderId",
          stateDir, landing)

      // drive through the scheduler with an injected clock: daily 09:00
      var clock = java.time.LocalDateTime.of(2024, 5, 1, 8, 0)
      val outcomes = scala.collection.mutable.ArrayBuffer.empty[IncrementalIngestion.FireOutcome]
      val sr = new graft.scheduler.ScheduleRunner(s"$work/schedules",
        _ => outcomes += fireOnce(), () => clock)
      sr.create(name = "inc-copy", scheduleType = "daily", runAtTime = "09:00",
        sourcePath = url)
      assert(sr.tick().isEmpty) // 08:00 — not due yet
      clock = clock.plusHours(2)
      assert(sr.tick().size == 1) // fire 1: the full table (no watermark yet)
      assert(outcomes(0).status == "Success" && outcomes(0).rowsLanded == 2)
      assert(outcomes(0).watermarkCommitted)
      assert(graft.merge.MergeWriter.readTarget(spark, runner.targetDir).get.count() == 2)

      // fire 2 next day: copies ONLY the rows past the committed mark
      st.execute("INSERT INTO orders_inc VALUES (3,'C3','30.00','2024-01-03')," +
        "(4,'C1','40.00','2024-01-04')")
      clock = clock.plusDays(1)
      assert(sr.tick().size == 1)
      assert(outcomes(1).status == "Success" && outcomes(1).rowsLanded == 2)
      val landed2 = spark.read.option("header", "true").csv(outcomes(1).landedPath.get)
      assert(landed2.select($"OrderId".cast("int")).as[Int].collect().toSet == Set(3, 4))
      assert(graft.merge.MergeWriter.readTarget(spark, runner.targetDir).get.count() == 4)

      // a failed run leaves the watermark unmoved (replay semantics):
      // a runner whose work dir is a regular FILE fails at Data Pull
      st.execute("INSERT INTO orders_inc VALUES (5,'C9','50.00','2024-01-05')")
      val badWork = Files.createTempFile("graft_badwork", "")
      val failed = IncrementalIngestion.fire(spark, runner.withWorkDir(badWork.toString),
        url, "orders_inc", "OrderId", stateDir, landing)
      assert(failed.status == "Failed" && !failed.watermarkCommitted)
      // replay with the healthy runner: the same window (row 5) lands now
      val replay = fireOnce()
      assert(replay.status == "Success" && replay.rowsLanded == 1 && replay.watermarkCommitted)
      assert(graft.merge.MergeWriter.readTarget(spark, runner.targetDir).get.count() == 5)
      // drained window: no landing, no pipeline run
      val drained = fireOnce()
      assert(drained.status == "Empty" && drained.runId.isEmpty && drained.landedPath.isEmpty)
    } finally conn.close()
  }

  test("incremental fire executes the source window exactly once") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val schema = StructType(Seq("OrderId", "CustomerId", "Amount", "OrderDate")
      .map(StructField(_, StringType)))
    val landing = Files.createTempDirectory("graft_onefire_land").toString
    val work = Files.createTempDirectory("graft_onefire_work").toString
    val stateFile = Files.createTempDirectory("graft_onefire_wm").resolve("t.wm").toString
    val runner = new graft.runner.PipelineRunner(spark,
      new graft.catalog.RunCatalog(spark, s"$work/catalog"), work)
    // a window whose every execution is observable: the accumulator
    // bumps once per partition computation (1 partition → 1 per run)
    val acc = spark.sparkContext.longAccumulator("graft_window_reads")
    def window(rows: Seq[Row]): org.apache.spark.sql.DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1).mapPartitions { it => acc.add(1); it },
        schema)

    val rows = Seq(Row("1", "C1", "10.00", "2024-01-01"), Row("2", "C2", "20.00", "2024-01-02"))
    val out = IncrementalIngestion.fireWindow(runner,
      JdbcSource.Incremental(window(rows), Some("2"), stateFile), "t", landing)
    assert(out.status == "Success" && out.rowsLanded == 2 && out.watermarkCommitted)
    assert(acc.value == 1L, s"window executed ${acc.value} times — must be exactly once")
    assert(Files.readString(java.nio.file.Paths.get(stateFile)) == "2")

    // an empty window is ALSO one execution, publishes nothing visible
    acc.reset()
    val empty = IncrementalIngestion.fireWindow(runner,
      JdbcSource.Incremental(window(Seq.empty), Some("2"), stateFile), "t", landing)
    assert(empty.status == "Empty" && empty.landedPath.isEmpty && !empty.watermarkCommitted)
    assert(acc.value == 1L)
    val visible = {
      val ls = Files.list(java.nio.file.Paths.get(landing))
      try scala.jdk.CollectionConverters.IteratorHasAsScala(ls.iterator()).asScala
        .map(_.getFileName.toString).filterNot(_.startsWith(".")).toList
      finally ls.close()
    }
    assert(visible.size == 1 && visible.head.endsWith(".csv")) // only the first fire's file

    // crash-orphaned staging debris (a stale file in .inc_stage, e.g. a
    // JVM that died between landing and the publish rename) is swept at
    // the next fire; a FRESH staging file — a concurrent fire's — is not
    val stage = java.nio.file.Paths.get(landing, ".inc_stage")
    Files.createDirectories(stage)
    val stale = stage.resolve("t_inc_deadbeef.csv")
    val fresh = stage.resolve("t_inc_concurrent.csv")
    Files.writeString(stale, "OrderId\n1\n")
    Files.writeString(fresh, "OrderId\n2\n")
    Files.setLastModifiedTime(stale, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 2 * 3600 * 1000L))
    IncrementalIngestion.fireWindow(runner,
      JdbcSource.Incremental(window(Seq.empty), Some("2"), stateFile), "t", landing)
    assert(!Files.exists(stale), "stale staging debris survived the sweep")
    assert(Files.exists(fresh), "a fresh (concurrent) staging file was swept")
  }

  test("blob landing publishes atomically and feeds the pipeline") {
    val landing = Files.createTempDirectory("graft_landing").toString
    val df = Seq(("ORD-1", "C1", "25.00", "2024-01-05"),
      ("ORD-2", "C2", "250.00", "2024-01-06"))
      .toDF("OrderId", "CustomerId", "Amount", "OrderDate")
    val path = BlobLanding.land(df, landing, "orders_batch1", "csv")
    assert(path.endsWith("orders_batch1.csv"))
    // no visible temp debris next to the published file; the atomic name
    // claim stays behind as a hidden dot-file (invisible to readers)
    val names = Files.list(java.nio.file.Paths.get(landing)).iterator()
    val all = scala.jdk.CollectionConverters.IteratorHasAsScala(names).asScala.map(_.getFileName.toString).toList
    assert(all.filterNot(_.startsWith(".")) == List("orders_batch1.csv"))
    assert(all.contains(".orders_batch1.csv.claim"))
    // landing files are immutable once published
    intercept[java.nio.file.FileAlreadyExistsException] {
      BlobLanding.land(df, landing, "orders_batch1", "csv")
    }
    // concurrent same-name landers: exactly one wins the atomic claim
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val races = Await.result(Future.sequence(Seq.fill(2)(Future(
      scala.util.Try(BlobLanding.land(df, landing, "orders_race", "csv"))))), 60.seconds)
    assert(races.count(_.isSuccess) == 1)
    assert(races.count(_.failed.toOption.exists(
      _.isInstanceOf[java.nio.file.FileAlreadyExistsException])) == 1)
    // a failed land releases its claim so a retry can publish
    val badDf = Seq((1, Seq("a", "b"))).toDF("k", "arr") // arrays are not CSV-writable
    intercept[Exception] { BlobLanding.land(badDf, landing, "orders_retry", "csv") }
    assert(BlobLanding.land(df, landing, "orders_retry", "csv").endsWith("orders_retry.csv"))
    // crash debris: a claim with no published target blocks while young
    // (could be an in-flight lander) but is taken over once stale
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(landing, ".orders_crashed.csv.claim"))
    intercept[java.nio.file.FileAlreadyExistsException] {
      BlobLanding.land(df, landing, "orders_crashed", "csv") // default floor: young
    }
    assert(BlobLanding.land(df, landing, "orders_crashed", "csv", staleClaimMs = 0L)
      .endsWith("orders_crashed.csv"))
    // a published name stays burned regardless of the floor
    intercept[java.nio.file.FileAlreadyExistsException] {
      BlobLanding.land(df, landing, "orders_crashed", "csv", staleClaimMs = 0L)
    }
    // the landed file runs through the 4-step pipeline end-to-end
    val work = Files.createTempDirectory("graft_landrun").toString
    val cat = new graft.catalog.RunCatalog(spark, s"$work/catalog")
    val runner = new graft.runner.PipelineRunner(spark, cat, work)
    val res = runner.run(path)
    assert(res.status == "Success")
    assert(res.rowsPerStep.values.forall(_ == 2L))
    // json landing round-trips too
    val jp = BlobLanding.land(df, landing, "orders_batch2", "json")
    assert(spark.read.json(jp).count() == 2)
  }
}
