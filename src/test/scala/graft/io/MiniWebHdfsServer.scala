package graft.io

import java.io.InputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => JPath, StandardCopyOption}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Minimal in-process WebHDFS REST server backed by a local directory —
  * test infrastructure that lets the REAL `webhdfs://` Hadoop FileSystem
  * client (org.apache.hadoop.hdfs.web.WebHdfsFileSystem, on the Spark
  * classpath) round-trip against this JVM with zero egress. This is the
  * remote-object-store protocol the reference actually runs
  * (copy_to_hdfs.py streams over WebHDFS), exercised end-to-end: two-step
  * CREATE redirects, OPEN with offset/length positioned reads (parquet
  * footer seeks), MKDIRS/RENAME/DELETE (the FileOutputCommitter dance),
  * GETFILESTATUS/LISTSTATUS JSON — none of which the pure-local `mock3://`
  * scheme could reach.
  *
  * Implements exactly the operations a Spark parquet write/read + FileUtil
  * copy needs; unknown ops return 400 so a client drift is loud.
  */
final class MiniWebHdfsServer(root: JPath) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/webhdfs/v1", handle _)
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))

  def start(): Unit = server.start()
  def stop(): Unit = server.stop(0)
  def port: Int = server.getAddress.getPort
  /** Base URI for Hadoop paths, e.g. s"$fsUri/lake/x.parquet". */
  def fsUri: String = s"webhdfs://127.0.0.1:$port"

  // ------------------------------------------------------------- plumbing

  private def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&").iterator
      .filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) kv -> ""
        else java.net.URLDecoder.decode(kv.take(i), "UTF-8") ->
          java.net.URLDecoder.decode(kv.drop(i + 1), "UTF-8")
      }.toMap

  private def localOf(ex: HttpExchange): JPath = {
    val rel = ex.getRequestURI.getPath.stripPrefix("/webhdfs/v1")
      .dropWhile(_ == '/')
    val p = root.resolve(rel).normalize()
    require(p.startsWith(root), s"path escape: $rel")
    p
  }

  private def send(ex: HttpExchange, code: Int, body: String,
      headers: (String, String)* ): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    if (body.nonEmpty)
      ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def notFound(ex: HttpExchange, p: JPath): Unit =
    send(ex, 404,
      s"""{"RemoteException":{"exception":"FileNotFoundException",
         |"javaClassName":"java.io.FileNotFoundException",
         |"message":"File does not exist: $p"}}""".stripMargin.replace("\n", ""))

  private def statusJson(p: JPath, suffix: String): String = {
    val dir = Files.isDirectory(p)
    val len = if (dir) 0L else Files.size(p)
    val mtime = Files.getLastModifiedTime(p).toMillis
    s"""{"accessTime":$mtime,"blockSize":134217728,"childrenNum":0,
       |"fileId":0,"group":"supergroup","length":$len,
       |"modificationTime":$mtime,"owner":"graft","pathSuffix":"$suffix",
       |"permission":"755","replication":1,"storagePolicy":0,
       |"type":"${if (dir) "DIRECTORY" else "FILE"}"}""".stripMargin
      .replace("\n", "")
  }

  private def drainTo(in: InputStream, p: JPath): Unit = {
    Files.createDirectories(p.getParent)
    val out = Files.newOutputStream(p)
    try {
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) out.write(buf, 0, n)
        n = in.read(buf)
      }
    } finally out.close()
  }

  // ------------------------------------------------------------- protocol

  private def handle(ex: HttpExchange): Unit =
    try {
      val q = params(ex)
      val op = q.getOrElse("op", "").toUpperCase
      val p = localOf(ex)
      val redirected = q.contains("mini_redirected")
      def selfRedirect(): Unit =
        send(ex, 307, "", "Location" ->
          s"http://127.0.0.1:$port${ex.getRequestURI.toString}&mini_redirected=1")
      (ex.getRequestMethod, op) match {
        case ("GET", "GETFILESTATUS") =>
          if (!Files.exists(p)) notFound(ex, p)
          else send(ex, 200, s"""{"FileStatus":${statusJson(p, "")}}""")
        case ("GET", "LISTSTATUS") =>
          if (!Files.exists(p)) notFound(ex, p)
          else {
            val entries =
              if (!Files.isDirectory(p)) Seq(statusJson(p, ""))
              else {
                val s = Files.list(p)
                try s.iterator().asScala.toSeq
                  .sortBy(_.getFileName.toString)
                  .map(c => statusJson(c, c.getFileName.toString))
                finally s.close()
              }
            send(ex, 200,
              s"""{"FileStatuses":{"FileStatus":[${entries.mkString(",")}]}}""")
          }
        case ("GET", "LISTSTATUS_BATCH") =>
          if (!Files.exists(p)) notFound(ex, p)
          else {
            val after = q.getOrElse("startAfter", "")
            val entries =
              if (!Files.isDirectory(p)) Seq(statusJson(p, ""))
              else {
                val s = Files.list(p)
                try s.iterator().asScala.toSeq
                  .map(_.getFileName.toString).sorted
                  .filter(_ > after)
                  .map(n => statusJson(p.resolve(n), n))
                finally s.close()
              }
            send(ex, 200,
              s"""{"DirectoryListing":{"partialListing":{"FileStatuses":
                 |{"FileStatus":[${entries.mkString(",")}]}},
                 |"remainingEntries":0}}""".stripMargin.replace("\n", ""))
          }
        case ("GET", "GETHOMEDIRECTORY") =>
          send(ex, 200, """{"Path":"/user/graft"}""")
        case ("GET", "GETFILEBLOCKLOCATIONS") =>
          if (!Files.exists(p)) notFound(ex, p)
          else {
            val len = if (Files.isDirectory(p)) 0L else Files.size(p)
            send(ex, 200,
              s"""{"BlockLocations":{"BlockLocation":[{"cachedHosts":[],
                 |"corrupt":false,"hosts":["127.0.0.1"],"length":$len,
                 |"names":["127.0.0.1:9866"],"offset":0,
                 |"storageIds":["mini-1"],"storageTypes":["DISK"],
                 |"topologyPaths":["/default-rack/127.0.0.1:9866"]}]}}"""
                .stripMargin.replace("\n", ""))
          }
        case ("GET", "OPEN") =>
          if (!redirected) selfRedirect()
          else if (!Files.exists(p)) notFound(ex, p)
          else {
            val all = Files.readAllBytes(p)
            val off = q.get("offset").map(_.toLong).getOrElse(0L)
              .min(all.length.toLong).toInt
            val len = q.get("length").map(_.toLong)
              .getOrElse(all.length.toLong - off)
              .min(all.length.toLong - off).toInt
            ex.getResponseHeaders.set("Content-Type", "application/octet-stream")
            ex.sendResponseHeaders(200, if (len == 0) -1 else len)
            if (len > 0) ex.getResponseBody.write(all, off, len)
            ex.close()
          }
        case ("PUT", "CREATE") =>
          if (!redirected) selfRedirect()
          else {
            drainTo(ex.getRequestBody, p)
            send(ex, 201, "", "Location" -> s"$fsUri${ex.getRequestURI.getPath}")
          }
        case ("POST", "APPEND") =>
          if (!redirected) selfRedirect()
          else {
            Files.createDirectories(p.getParent)
            val out = Files.newOutputStream(p,
              java.nio.file.StandardOpenOption.CREATE,
              java.nio.file.StandardOpenOption.APPEND)
            try out.write(ex.getRequestBody.readAllBytes()) finally out.close()
            send(ex, 200, "")
          }
        case ("PUT", "MKDIRS") =>
          Files.createDirectories(p)
          send(ex, 200, """{"boolean":true}""")
        case ("PUT", "RENAME") =>
          val destRel = q("destination").dropWhile(_ == '/')
          val dest = root.resolve(destRel).normalize()
          val ok = Files.exists(p) && {
            Files.createDirectories(dest.getParent)
            Files.move(p, dest, StandardCopyOption.REPLACE_EXISTING)
            true
          }
          send(ex, 200, s"""{"boolean":$ok}""")
        case ("DELETE", "DELETE") =>
          val ok =
            if (!Files.exists(p)) false
            else {
              if (Files.isDirectory(p)) {
                val s = Files.walk(p)
                try s.sorted(java.util.Comparator.reverseOrder())
                  .forEach(f => Files.delete(f))
                finally s.close()
              } else Files.delete(p)
              true
            }
          send(ex, 200, s"""{"boolean":$ok}""")
        case ("PUT", "SETPERMISSION") | ("PUT", "SETTIMES") |
            ("PUT", "SETREPLICATION") | ("PUT", "SETOWNER") =>
          send(ex, 200, "")
        case (m, o) =>
          send(ex, 400,
            s"""{"RemoteException":{"exception":"UnsupportedOperationException",
               |"javaClassName":"java.lang.UnsupportedOperationException",
               |"message":"mini-webhdfs: unsupported $m $o"}}"""
              .stripMargin.replace("\n", ""))
      }
    } catch {
      case e: Throwable =>
        try send(ex, 500,
          s"""{"RemoteException":{"exception":"IOException",
             |"javaClassName":"java.io.IOException",
             |"message":"${e.toString.replace("\"", "'")}"}}"""
            .stripMargin.replace("\n", ""))
        catch { case _: Throwable => () }
    }

  private implicit class JIter[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}
