package graft.streaming

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

/** Embedded loopback servers speaking the PUBLIC wire protocols (RESP2;
  * the ES REST/bulk JSON API) — shared by ConnectorSpec (store contract
  * over real sockets) and StreamingSpec (streaming pipelines ending in a
  * live store).
  */
object TestServers {

  /** Minimal RESP2 server: GET/SET/DEL/SAVE + MULTI/EXEC queueing,
    * binary-safe, one thread per connection, data in a shared TrieMap
    * (keys latin-1-decoded so arbitrary bytes round-trip).
    */
  final class RespTestServer extends AutoCloseable {
    private val data = scala.collection.concurrent.TrieMap.empty[String, Array[Byte]]
    private val server = new java.net.ServerSocket(0)
    val port: Int = server.getLocalPort
    @volatile private var running = true
    var saves = 0

    private def readLine(in: java.io.InputStream): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c != '\r' && c >= 0) { sb.append(c.toChar); c = in.read() }
      in.read() // \n
      sb.toString()
    }

    private def readCommand(in: java.io.InputStream): Option[Seq[Array[Byte]]] = {
      val first = in.read()
      if (first < 0) return None
      assert(first == '*', s"expected array, got '${first.toChar}'")
      val n = readLine(in).toInt
      Some((0 until n).map { _ =>
        assert(in.read() == '$')
        val len = readLine(in).toInt
        val buf = new Array[Byte](len)
        var off = 0
        while (off < len) {
          val r = in.read(buf, off, len - off); assert(r >= 0); off += r
        }
        in.read(); in.read() // \r\n
        buf
      })
    }

    private def run(cmd: Seq[Array[Byte]]): Array[Byte] = {
      val name = new String(cmd.head, UTF_8).toUpperCase
      def key = new String(cmd(1), ISO_8859_1)
      name match {
        case "SET" => data.put(key, cmd(2)); "+OK\r\n".getBytes(UTF_8)
        case "GET" => data.get(key) match {
          case Some(v) =>
            s"$$${v.length}\r\n".getBytes(UTF_8) ++ v ++ "\r\n".getBytes(UTF_8)
          case None => "$-1\r\n".getBytes(UTF_8)
        }
        case "DEL" =>
          val n = if (data.remove(key).isDefined) 1 else 0
          s":$n\r\n".getBytes(UTF_8)
        case "SAVE" => saves += 1; "+OK\r\n".getBytes(UTF_8)
        case other => s"-ERR unknown command '$other'\r\n".getBytes(UTF_8)
      }
    }

    private val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          new Thread(() => {
            val in = new java.io.BufferedInputStream(sock.getInputStream)
            val out = new java.io.BufferedOutputStream(sock.getOutputStream)
            var queued: Option[Vector[Seq[Array[Byte]]]] = None
            var open = true
            while (open) readCommand(in) match {
              case None => open = false
              case Some(cmd) =>
                val name = new String(cmd.head, UTF_8).toUpperCase
                (name, queued) match {
                  case ("MULTI", _) =>
                    queued = Some(Vector.empty)
                    out.write("+OK\r\n".getBytes(UTF_8))
                  case ("EXEC", Some(q)) =>
                    val replies = q.map(run)
                    out.write(s"*${replies.length}\r\n".getBytes(UTF_8))
                    replies.foreach(out.write)
                    queued = None
                  case (_, Some(q)) =>
                    queued = Some(q :+ cmd)
                    out.write("+QUEUED\r\n".getBytes(UTF_8))
                  case (_, None) => out.write(run(cmd))
                }
                out.flush()
            }
            sock.close()
          }).start()
        } catch { case _: Exception => () }
      }
    })
    acceptor.setDaemon(true)
    acceptor.start()

    def contents: Map[String, Array[Byte]] = data.toMap
    override def close(): Unit = { running = false; server.close() }
  }


  /** Minimal ES REST fixture: _doc get/put/delete, _mget, _bulk (ids in
    * `poison` fail per-item with reason "boom"), _flush.
    */
  final class EsTestServer(poison: Set[String] = Set.empty)
      extends AutoCloseable {
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    private val docs = scala.collection.concurrent.TrieMap.empty[(String, String), Array[Byte]]
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val port: Int = server.getAddress.getPort
    var flushes = 0

    server.createContext("/", { (ex: com.sun.net.httpserver.HttpExchange) =>
      val path = ex.getRequestURI.getPath
      val method = ex.getRequestMethod
      val body = ex.getRequestBody.readAllBytes()
      def respond(code: Int, payload: Array[Byte]): Unit = {
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(code, payload.length.toLong)
        ex.getResponseBody.write(payload)
        ex.close()
      }
      def json(code: Int, s: String): Unit = respond(code, s.getBytes(UTF_8))
      val segs = path.split("/").filter(_.nonEmpty)
      (method, segs.toList) match {
        case ("PUT", index :: "_doc" :: id :: Nil) =>
          docs.put((index, java.net.URLDecoder.decode(id, UTF_8)), body)
          json(201, s"""{"result":"created"}""")
        case ("GET", index :: "_doc" :: id :: Nil) =>
          docs.get((index, java.net.URLDecoder.decode(id, UTF_8))) match {
            case Some(src) => respond(200,
              s"""{"found":true,"_source":${new String(src, UTF_8)}}""".getBytes(UTF_8))
            case None => json(404, s"""{"found":false}""")
          }
        case ("DELETE", index :: "_doc" :: id :: Nil) =>
          if (docs.remove((index, java.net.URLDecoder.decode(id, UTF_8))).isDefined)
            json(200, s"""{"result":"deleted"}""")
          else json(404, s"""{"result":"not_found"}""")
        case ("POST", "_mget" :: Nil) => // cross-index docs form
          val docsReq = mapper.readTree(body).path("docs")
          val items = (0 until docsReq.size()).map(docsReq.get).map { d =>
            val index = d.path("_index").asText()
            val id = d.path("_id").asText()
            docs.get((index, id)) match {
              case Some(src) =>
                s"""{"_id":"$id","found":true,"_source":${new String(src, UTF_8)}}"""
              case None => s"""{"_id":"$id","found":false}"""
            }
          }
          json(200, s"""{"docs":[${items.mkString(",")}]}""")
        case ("POST", index :: "_mget" :: Nil) =>
          val ids = mapper.readTree(body).path("ids")
          val items = (0 until ids.size()).map(ids.get(_).asText()).map { id =>
            docs.get((index, id)) match {
              case Some(src) =>
                s"""{"_id":${mapper.writeValueAsString(mapper.getNodeFactory.textNode(id))},"found":true,"_source":${new String(src, UTF_8)}}"""
              case None => s"""{"_id":"$id","found":false}"""
            }
          }
          json(200, s"""{"docs":[${items.mkString(",")}]}""")
        case ("POST", "_bulk" :: Nil) =>
          val lines = new String(body, UTF_8).split("\n").filter(_.nonEmpty)
          val items = lines.grouped(2).map { case Array(action, src) =>
            val a = mapper.readTree(action).path("index")
            val id = a.path("_id").asText()
            val index = a.path("_index").asText()
            if (poison(id))
              s"""{"index":{"_id":"$id","status":400,"error":{"reason":"boom"}}}"""
            else {
              docs.put((index, id), src.getBytes(UTF_8))
              s"""{"index":{"_id":"$id","status":201}}"""
            }
          }.toSeq
          val anyError = items.exists(_.contains("\"error\""))
          json(200, s"""{"errors":$anyError,"items":[${items.mkString(",")}]}""")
        case ("POST", rest) if rest.lastOption.contains("_flush") ||
            path.startsWith("/_flush") =>
          flushes += 1; json(200, s"""{"_shards":{"failed":0}}""")
        case _ => json(400, s"""{"error":"unhandled $method $path"}""")
      }
    })
    server.start()
    override def close(): Unit = server.stop(0)
  }

}
