package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, IOException}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

import graft.metrics.{MetricsProvider, NoopMetricsProvider}

/** One RESP2 connection — shareable between a [[RedisStore]] and the
  * tenant sub-stores of a [[MultiRedisStore]] (the reference shares one
  * `redis.Conn` the same way). All calls must hold the connection's
  * monitor (the store methods do).
  */
final class RespConnection(host: String, port: Int) extends AutoCloseable {
  private val socket = new Socket()
  socket.connect(new InetSocketAddress(host, port), 5000)
  socket.setTcpNoDelay(true)
  private val in = new BufferedInputStream(socket.getInputStream)
  private val out = new BufferedOutputStream(socket.getOutputStream)

  private[streaming] def send(args: Array[Byte]*): Unit = {
    out.write(s"*${args.length}\r\n".getBytes(US_ASCII))
    args.foreach { a =>
      out.write(s"$$${a.length}\r\n".getBytes(US_ASCII))
      out.write(a)
      out.write('\r'); out.write('\n')
    }
  }

  private def readLine(): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != '\r') {
      if (c < 0) throw new IOException("redis: connection closed mid-reply")
      sb.append(c.toChar)
      c = in.read()
    }
    if (in.read() != '\n') throw new IOException("redis: malformed reply line")
    sb.toString()
  }

  /** One reply: bulk/simple/integer as bytes (null for missing), arrays
    * as Array[AnyRef] with elements recursing.
    */
  private[streaming] def readReply(): AnyRef = {
    val line = readLine()
    line.charAt(0) match {
      case '+' => line.substring(1).getBytes(US_ASCII)
      case ':' => line.substring(1).getBytes(US_ASCII)
      case '-' => throw new IOException(s"redis: ${line.substring(1)}")
      case '$' =>
        val n = line.substring(1).toInt
        if (n < 0) null
        else {
          val buf = new Array[Byte](n)
          var off = 0
          while (off < n) {
            val r = in.read(buf, off, n - off)
            if (r < 0) throw new IOException("redis: connection closed mid-bulk")
            off += r
          }
          if (in.read() != '\r' || in.read() != '\n')
            throw new IOException("redis: malformed bulk terminator")
          buf
        }
      case '*' =>
        val n = line.substring(1).toInt
        if (n < 0) null
        else Array.fill[AnyRef](n)(readReply())
      case c => throw new IOException(s"redis: unknown reply type '$c'")
    }
  }

  private[streaming] def flushOut(): Unit = out.flush()

  private[streaming] def command(args: Array[Byte]*): AnyRef = {
    send(args: _*)
    out.flush()
    readReply()
  }

  override def close(): Unit =
    try socket.close() catch { case _: IOException => () }
}

/** Redis-backed [[Store]] — the reference's Redis connector
  * (`redis.go:29-155`) re-implemented on a hand-rolled RESP2 client
  * over a JDK socket (the wire protocol is public and trivially small;
  * no client library exists in this build's dependency budget, and none
  * is needed). Semantics preserved exactly:
  *
  *  - every key is stored as `{keyPrefix}/{key}` (`redis.go:46-48`);
  *  - `get` → GET, missing key → None (`redis.go:54-69`);
  *  - `getAll` → MULTI + GET… + EXEC, missing keys skipped
  *    (`redis.go:71-106`);
  *  - `put` → SET; `putAll` → MULTI + SET… + EXEC (`redis.go:108-137`);
  *  - `delete` → DEL (absent key is a no-op — DEL returns 0);
  *  - `flush` → SAVE (`redis.go:148-155`);
  *  - per-call counters/summaries on the same metric names as the
  *    reference, through the engine's [[graft.metrics.MetricsProvider]].
  *
  * Values are raw byte arrays (RESP bulk strings are binary-safe), like
  * the reference's `[]byte`. One socket per store instance; calls are
  * synchronized (the reference's `redis.Conn` is likewise not
  * concurrent). Error replies (`-ERR …`) raise IOException with the
  * server's message. Executor-side use follows the usual connector
  * rule: one instance per partition (`mapPartitions`), never a shared
  * serialized client.
  */
final class RedisStore private[streaming] (
    private[streaming] val conn: RespConnection, keyPrefix: String,
    metrics: MetricsProvider, processorName: String, ownsConn: Boolean)
    extends Store[Array[Byte]] with AutoCloseable {

  def this(host: String, port: Int, keyPrefix: String,
           metrics: MetricsProvider = NoopMetricsProvider,
           processorName: String = "graft") =
    this(new RespConnection(host, port), keyPrefix, metrics, processorName,
      ownsConn = true)

  private val labels = Seq(processorName, keyPrefix)
  private val labelNames = Seq("topicProcessor", "keyPrefix")
  private val getCounter =
    metrics.newCounter("Redis_Get", "Number of Get() calls", labelNames: _*)
  private val getAllSummary =
    metrics.newSummary("Redis_GetAll", "Summary of GetAll() calls", labelNames: _*)
  private val putCounter =
    metrics.newCounter("Redis_Put", "Number of Put() calls", labelNames: _*)
  private val putAllSummary =
    metrics.newSummary("Redis_PutAll", "Summary of PutAll() calls", labelNames: _*)
  private val deleteCounter =
    metrics.newCounter("Redis_Delete", "Number of Delete() calls", labelNames: _*)
  private val flushCounter =
    metrics.newCounter("Redis_Flush", "Number of Flush() calls", labelNames: _*)

  // Keys carry user data (corpus words in the word-count example) —
  // UTF-8, matching the reference's raw Go string bytes (`redis.go`).
  // RESP bulk strings are binary-safe; US_ASCII stays for protocol
  // framing literals only (an ASCII encode would fold 'café'→'caf?',
  // colliding distinct keys).
  private def prefixed(key: String): Array[Byte] =
    s"$keyPrefix/$key".getBytes(UTF_8)

  private def command(args: Array[Byte]*): AnyRef = conn.command(args: _*)

  private def b(s: String): Array[Byte] = s.getBytes(US_ASCII)

  // --- Store contract ---------------------------------------------------

  override def get(key: String): Option[Array[Byte]] = conn.synchronized {
    getCounter.inc(labels: _*)
    Option(command(b("GET"), prefixed(key)).asInstanceOf[Array[Byte]])
  }

  override def getAll(keys: Seq[String]): Map[String, Array[Byte]] = conn.synchronized {
    getAllSummary.observe(keys.size.toDouble, labels: _*)
    if (keys.isEmpty) Map.empty
    else {
      conn.send(b("MULTI"))
      keys.foreach(k => conn.send(b("GET"), prefixed(k)))
      conn.send(b("EXEC"))
      conn.flushOut()
      conn.readReply() // +OK for MULTI
      keys.foreach(_ => conn.readReply()) // +QUEUED per GET
      val results = conn.readReply().asInstanceOf[Array[AnyRef]]
      keys.zip(results).collect {
        case (k, v) if v != null => k -> v.asInstanceOf[Array[Byte]]
      }.toMap
    }
  }

  override def put(key: String, value: Array[Byte]): Unit = conn.synchronized {
    putCounter.inc(labels: _*)
    command(b("SET"), prefixed(key), value)
    ()
  }

  override def putAll(kvs: Map[String, Array[Byte]]): Unit = conn.synchronized {
    putAllSummary.observe(kvs.size.toDouble, labels: _*)
    if (kvs.nonEmpty) {
      conn.send(b("MULTI"))
      kvs.foreach { case (k, v) => conn.send(b("SET"), prefixed(k), v) }
      conn.send(b("EXEC"))
      conn.flushOut()
      conn.readReply()
      kvs.foreach(_ => conn.readReply())
      conn.readReply()
      ()
    }
  }

  override def delete(key: String): Unit = conn.synchronized {
    deleteCounter.inc(labels: _*)
    command(b("DEL"), prefixed(key))
    ()
  }

  override def flush(): Unit = conn.synchronized {
    flushCounter.inc(labels: _*)
    command(b("SAVE"))
    ()
  }

  override def close(): Unit = conn.synchronized {
    if (ownsConn) conn.close()
  }
}

/** Multitenant Redis store — the reference's `multi_redis.go:29-131`:
  * keys take the form `{tenant}/{keyPrefix}/{key}`, tenant sub-stores
  * share THIS instance's single connection and are memoized, and
  * [[fetch]]/[[push]] run ONE cross-tenant MULTI each (counters on the
  * reference metric names MultiRedis_Fetch / MultiRedis_Push).
  * `allTenants` lists tenants seen by [[tenant]] calls, sorted — the
  * reference's instance-local semantics, not a server scan.
  */
final class MultiRedisStore(host: String, port: Int, keyPrefix: String,
                            metrics: MetricsProvider = NoopMetricsProvider,
                            processorName: String = "graft")
    extends MultiStore[Array[Byte]] with AutoCloseable {

  private val conn = new RespConnection(host, port)
  private val stores = scala.collection.concurrent.TrieMap.empty[String, RedisStore]
  private val labels = Seq(processorName, keyPrefix)
  private val labelNames = Seq("topicProcessor", "keyPrefix")
  private val fetchCounter =
    metrics.newCounter("MultiRedis_Fetch", "Counter of Fetch() calls", labelNames: _*)
  private val pushCounter =
    metrics.newCounter("MultiRedis_Push", "Counter of Push() calls", labelNames: _*)

  private def b(s: String): Array[Byte] = s.getBytes(US_ASCII)
  // UTF-8 for the same reason as RedisStore.prefixed: tenant/key are data.
  private def fullKey(t: String, k: String): Array[Byte] =
    s"$t/$keyPrefix/$k".getBytes(UTF_8)

  override def tenant(t: String): Store[Array[Byte]] =
    stores.getOrElseUpdate(t,
      new RedisStore(conn, s"$t/$keyPrefix", metrics, processorName,
        ownsConn = false))

  override def allTenants: Seq[String] = stores.keys.toSeq.sorted

  override def fetch(keys: Seq[(String, String)]): Map[(String, String), Array[Byte]] =
    conn.synchronized {
      fetchCounter.inc(labels: _*)
      if (keys.isEmpty) Map.empty
      else {
        conn.send(b("MULTI"))
        keys.foreach { case (t, k) => conn.send(b("GET"), fullKey(t, k)) }
        conn.send(b("EXEC"))
        conn.flushOut()
        conn.readReply()
        keys.foreach(_ => conn.readReply())
        val results = conn.readReply().asInstanceOf[Array[AnyRef]]
        keys.zip(results).collect {
          case (tk, v) if v != null => tk -> v.asInstanceOf[Array[Byte]]
        }.toMap
      }
    }

  override def push(entries: Map[(String, String), Array[Byte]]): Unit =
    conn.synchronized {
      pushCounter.inc(labels: _*)
      if (entries.nonEmpty) {
        conn.send(b("MULTI"))
        entries.foreach { case ((t, k), v) => conn.send(b("SET"), fullKey(t, k), v) }
        conn.send(b("EXEC"))
        conn.flushOut()
        conn.readReply()
        entries.foreach(_ => conn.readReply())
        conn.readReply()
        ()
      }
    }

  override def close(): Unit = conn.synchronized { conn.close() }
}
