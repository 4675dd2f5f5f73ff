package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** Connector suite: the Redis and Elasticsearch stores driven over REAL
  * sockets/HTTP against embedded in-test servers speaking the public
  * wire protocols (RESP2; the ES REST/bulk JSON API) — closing the
  * "untested, no network in CI" gap without a network: the server is a
  * loopback fixture, the client code is the production connector.
  * Contract cases mirror `map_test.go:25-114` like StoreSpec.
  */
class ConnectorSpec extends AnyFunSuite {

  // --- embedded RESP2 server -------------------------------------------

  private def withRedis(f: TestServers.RespTestServer => Unit): Unit = {
    val srv = new TestServers.RespTestServer
    try f(srv) finally srv.close()
  }

  test("RedisStore: reference store contract over a real RESP socket") {
    withRedis { srv =>
      val s = new RedisStore("127.0.0.1", srv.port, "wordcount")
      try {
        assert(s.get("nope").isEmpty)
        s.put("k", "v1".getBytes(UTF_8))
        assert(s.get("k").map(new String(_, UTF_8)).contains("v1"))
        s.put("k", "v2".getBytes(UTF_8))
        assert(s.get("k").map(new String(_, UTF_8)).contains("v2"))
        s.putAll(Map("a" -> "1".getBytes(UTF_8), "b" -> "2".getBytes(UTF_8)))
        s.putAll(Map.empty)
        val all = s.getAll(Seq("a", "x", "b")).map { case (k, v) => k -> new String(v, UTF_8) }
        assert(all == Map("a" -> "1", "b" -> "2"))
        assert(s.getAll(Nil).isEmpty)
        s.delete("a"); s.delete("ghost")
        assert(s.get("a").isEmpty)
        s.flush()
        assert(srv.saves == 1, "flush must issue SAVE")
      } finally s.close()
    }
  }

  test("RedisStore: keys are prefix-namespaced like the reference (redis.go:46-48)") {
    withRedis { srv =>
      val s1 = new RedisStore("127.0.0.1", srv.port, "p1")
      val s2 = new RedisStore("127.0.0.1", srv.port, "p2")
      try {
        s1.put("k", "one".getBytes(UTF_8))
        s2.put("k", "two".getBytes(UTF_8))
        assert(s1.get("k").map(new String(_, UTF_8)).contains("one"))
        assert(s2.get("k").map(new String(_, UTF_8)).contains("two"))
        assert(srv.contents.keySet == Set("p1/k", "p2/k"))
      } finally { s1.close(); s2.close() }
    }
  }

  test("RedisStore: values are binary-safe (all 256 byte values round-trip)") {
    withRedis { srv =>
      val s = new RedisStore("127.0.0.1", srv.port, "bin")
      try {
        val payload = Array.tabulate[Byte](256)(_.toByte)
        s.put("blob", payload)
        assert(s.get("blob").exists(_.sameElements(payload)))
      } finally s.close()
    }
  }

  test("RedisStore: call counters land on the reference metric names") {
    withRedis { srv =>
      val metrics = new graft.metrics.InProcessMetricsProvider("t")
      val s = new RedisStore("127.0.0.1", srv.port, "m", metrics, "proc")
      try {
        s.put("k", "v".getBytes(UTF_8)); s.get("k"); s.getAll(Seq("k"))
        assert(metrics.counterValue("Redis_Put", "proc", "m").contains(1.0))
        assert(metrics.counterValue("Redis_Get", "proc", "m").contains(1.0))
        assert(metrics.summaryStats("Redis_GetAll", "proc", "m").exists(_._1 == 1L))
      } finally s.close()
    }
  }

  // --- embedded Elasticsearch REST server -------------------------------

  private def withEs(poison: Set[String] = Set.empty)(f: TestServers.EsTestServer => Unit): Unit = {
    val srv = new TestServers.EsTestServer(poison)
    try f(srv) finally srv.close()
  }

  test("ElasticsearchStore: reference store contract over real HTTP") {
    withEs() { srv =>
      val s = new ElasticsearchStore(s"http://127.0.0.1:${srv.port}", "heroes")
      assert(s.get("nope").isEmpty) // 404 → None, never an error
      s.put("k", """{"v":1}""".getBytes(UTF_8))
      assert(s.get("k").map(new String(_, UTF_8)).contains("""{"v":1}"""))
      s.put("k", """{"v":2}""".getBytes(UTF_8))
      assert(s.get("k").map(new String(_, UTF_8)).contains("""{"v":2}"""))
      s.putAll(Map("a" -> """{"n":1}""".getBytes(UTF_8),
        "b" -> """{"n":2}""".getBytes(UTF_8)))
      s.putAll(Map.empty)
      val all = s.getAll(Seq("a", "x", "b")).map { case (k, v) => k -> new String(v, UTF_8) }
      assert(all == Map("a" -> """{"n":1}""", "b" -> """{"n":2}"""))
      assert(s.getAll(Nil).isEmpty)
      s.delete("a"); s.delete("ghost") // absent delete is a no-op
      assert(s.get("a").isEmpty)
      s.flush()
      assert(srv.flushes == 1)
    }
  }

  test("MultiRedisStore: {tenant}/{prefix}/{key} namespacing, one-MULTI fetch/push, sorted tenants") {
    withRedis { srv =>
      val m = new MultiRedisStore("127.0.0.1", srv.port, "wc")
      try {
        m.tenant("marvel").put("hero", "spiderman".getBytes(UTF_8))
        m.tenant("dc").put("hero", "batman".getBytes(UTF_8))
        assert(m.allTenants == Seq("dc", "marvel"))
        assert(srv.contents.keySet == Set("marvel/wc/hero", "dc/wc/hero"),
          s"key form mismatch: ${srv.contents.keySet}")
        m.push(Map(("marvel", "h1") -> "x".getBytes(UTF_8),
          ("dc", "h2") -> "y".getBytes(UTF_8)))
        val got = m.fetch(Seq(("marvel", "h1"), ("dc", "h2"), ("dc", "missing")))
          .map { case (tk, v) => tk -> new String(v, UTF_8) }
        assert(got == Map(("marvel", "h1") -> "x", ("dc", "h2") -> "y"))
        assert(m.fetch(Nil).isEmpty)
        // tenant sub-stores read what push wrote (shared connection)
        assert(m.tenant("dc").get("h2").map(new String(_, UTF_8)).contains("y"))
      } finally m.close()
    }
  }

  test("MultiElasticsearchStore: index-per-tenant, cross-index mget/bulk fetch and push") {
    withEs() { srv =>
      val m = new MultiElasticsearchStore(s"http://127.0.0.1:${srv.port}")
      m.tenant("marvel").put("hero", """{"n":"spiderman"}""".getBytes(UTF_8))
      m.tenant("dc").put("hero", """{"n":"batman"}""".getBytes(UTF_8))
      assert(m.allTenants == Seq("dc", "marvel"))
      assert(m.tenant("marvel").get("hero")
        .map(new String(_, UTF_8)).contains("""{"n":"spiderman"}"""))
      m.push(Map(("marvel", "h1") -> """{"v":1}""".getBytes(UTF_8),
        ("dc", "h2") -> """{"v":2}""".getBytes(UTF_8)))
      val got = m.fetch(Seq(("marvel", "h1"), ("dc", "h2"), ("dc", "missing")))
        .map { case (tk, v) => tk -> new String(v, UTF_8) }
      assert(got == Map(("marvel", "h1") -> """{"v":1}""",
        ("dc", "h2") -> """{"v":2}"""))
      assert(m.fetch(Nil).isEmpty)
    }
  }

  test("ElasticsearchStore: bulk failures summarize with the reference's bounded reasons") {
    val poison = (1 to 7).map(i => s"bad$i").toSet
    withEs(poison) { srv =>
      val s = new ElasticsearchStore(s"http://127.0.0.1:${srv.port}", "heroes")
      val kvs = (1 to 7).map(i => s"bad$i" -> s"""{"i":$i}""".getBytes(UTF_8)).toMap ++
        Map("good" -> """{"ok":true}""".getBytes(UTF_8))
      val err = intercept[java.io.IOException](s.putAll(kvs))
      val msg = err.getMessage
      assert(msg.startsWith("PutAll failed for some requests:"), msg)
      assert(msg.contains("error = boom"), msg)
      assert(msg.linesIterator.count(_.startsWith("id = ")) == SinkOps.maxBulkErrorReasons, msg)
      assert(msg.contains("(omitted 2 more errors)"), msg)
      // non-poison items in the batch still landed (per-item semantics)
      assert(s.get("good").isDefined)
    }
  }
}
