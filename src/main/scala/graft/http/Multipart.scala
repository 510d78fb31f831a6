package graft.http

import java.nio.charset.StandardCharsets

/** Minimal multipart/form-data parser for the upload endpoint — the
  * reference accepts browser-form multipart (node `server.js` multer /
  * java `ApiServlet.java` ServletFileUpload); this covers the same
  * wire shape without a dependency: delimiter scan, per-part header
  * block, first part carrying a `filename`.
  */
object Multipart {

  /** Boundary token from a `multipart/form-data; boundary=...` header. */
  def boundary(contentType: String): Option[String] =
    contentType.split(";").map(_.trim).collectFirst {
      case s if s.toLowerCase.startsWith("boundary=") =>
        s.substring("boundary=".length).stripPrefix("\"").stripSuffix("\"")
    }.filter(_.nonEmpty)

  /** First file part (filename, content bytes) of a multipart body;
    * None when the body is not well-formed or has no file part.
    */
  def firstFilePart(contentType: String, body: Array[Byte]): Option[(String, Array[Byte])] =
    boundary(contentType).flatMap { b =>
      val delim = ("--" + b).getBytes(StandardCharsets.ISO_8859_1)
      val marks = findAll(body, delim)
      if (marks.length < 2) None
      else marks.zip(marks.tail).iterator.flatMap { case (p1, p2) =>
        filePart(body, p1 + delim.length, p2)
      }.nextOption()
    }

  /** Parse one part spanning [from, to): skip the leading CRLF, split
    * the header block at the blank line, drop the CRLF preceding the
    * next delimiter.
    */
  private def filePart(body: Array[Byte], from: Int, to: Int): Option[(String, Array[Byte])] = {
    var start = from
    // after the delimiter comes either CRLF (a real part) or "--" (the
    // closing delimiter — no part follows)
    if (start + 1 < to && body(start) == '-' && body(start + 1) == '-') return None
    if (start + 1 < to && body(start) == '\r' && body(start + 1) == '\n') start += 2
    val headerEnd = indexOf(body, "\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1), start, to)
    if (headerEnd < 0) return None
    val headers = new String(body, start, headerEnd - start, StandardCharsets.ISO_8859_1)
    val name = "filename=\"([^\"]*)\"".r.findFirstMatchIn(headers).map(_.group(1))
    name.filter(_.nonEmpty).map { fn =>
      val contentStart = headerEnd + 4
      val contentEnd = math.max(contentStart, to - 2) // strip CRLF before next delimiter
      fn -> java.util.Arrays.copyOfRange(body, contentStart, contentEnd)
    }
  }

  private def findAll(hay: Array[Byte], needle: Array[Byte]): Array[Int] = {
    val out = Array.newBuilder[Int]
    var i = indexOf(hay, needle, 0, hay.length)
    while (i >= 0) {
      out += i
      i = indexOf(hay, needle, i + needle.length, hay.length)
    }
    out.result()
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int, to: Int): Int = {
    var i = math.max(from, 0)
    val last = to - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}
