package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** SOAP API source (SURVEY.md §2.1 S7 — reference
  * `python_code/projectplan.md:80,117-119` plans SOAP via an HTTP POST
  * with an envelope built by expression, response parsed and mapped to
  * staging): POST a SOAP 1.1 envelope, parse the response XML with the
  * JDK DOM, and land the repeating row element as a string-typed
  * DataFrame (the staging-table shape — downstream casts are the
  * extract step's job, same as every other landing source here).
  *
  * Scale: one SOAP call is one driver-side request (the reference
  * invokes it per pipeline run); the landed frame is what scales.
  */
object SoapSource {

  trait SoapTransport extends Serializable {
    def call(url: String, soapAction: String, envelope: String): String
  }

  /** `java.net.http` POST, `text/xml` + SOAPAction header (SOAP 1.1). */
  final class HttpSoapTransport(timeoutSeconds: Long = 20) extends SoapTransport {
    @transient private lazy val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds))
      .build()
    def call(url: String, soapAction: String, envelope: String): String = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
        .header("Content-Type", "text/xml; charset=utf-8")
        .header("SOAPAction", "\"" + soapAction + "\"")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(envelope))
        .build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() >= 400)
        throw new java.io.IOException(s"POST $url → HTTP ${resp.statusCode()}")
      resp.body()
    }
  }

  /** Wrap `bodyXml` in a SOAP 1.1 envelope. */
  def envelope(bodyXml: String): String =
    """<?xml version="1.0" encoding="utf-8"?>""" +
      """<soap:Envelope xmlns:soap="http://schemas.xmlsoap.org/soap/envelope/">""" +
      s"<soap:Body>$bodyXml</soap:Body></soap:Envelope>"

  /** Call the endpoint and land every `rowTag` element in the response
    * as one row: each child element becomes a string column (named by
    * its local name, namespace-stripped); the schema is the union of
    * child names across rows, missing children read null. Repeated
    * child names keep the first occurrence.
    */
  def readRows(spark: SparkSession, transport: SoapTransport, url: String,
               soapAction: String, bodyXml: String, rowTag: String): DataFrame = {
    val xml = transport.call(url, soapAction, envelope(bodyXml))
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    // the response is landed data, never trusted: no external entities
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = dbf.newDocumentBuilder()
      .parse(new org.xml.sax.InputSource(new java.io.StringReader(xml)))

    def local(n: org.w3c.dom.Node): String =
      Option(n.getLocalName).getOrElse(n.getNodeName.split(":").last)

    val rows = scala.collection.mutable.ArrayBuffer.empty[Map[String, String]]
    def walk(n: org.w3c.dom.Node): Unit = {
      if (n.getNodeType == org.w3c.dom.Node.ELEMENT_NODE && local(n) == rowTag) {
        var m = Map.empty[String, String]
        var c = n.getFirstChild
        while (c != null) {
          if (c.getNodeType == org.w3c.dom.Node.ELEMENT_NODE && !m.contains(local(c)))
            m += (local(c) -> c.getTextContent.trim)
          c = c.getNextSibling
        }
        rows += m
      } else {
        var c = n.getFirstChild
        while (c != null) { walk(c); c = c.getNextSibling }
      }
    }
    walk(doc.getDocumentElement)

    val cols = rows.flatMap(_.keys).distinct.toSeq
    val schema = StructType(cols.map(c => StructField(c, StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.toList.map(m => Row.fromSeq(cols.map(m.get(_).orNull)))),
      schema)
  }
}
