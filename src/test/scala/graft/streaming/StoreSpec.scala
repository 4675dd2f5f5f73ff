package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Store-contract suite — the reference's edge cases from
  * `map_test.go:25-114` / `multi_map_test.go:14-63`, applied to the
  * engine's implementations (shared like the reference's testMultiStore).
  */
class StoreSpec extends AnyFunSuite {

  def contract(mk: () => Store[String]): Unit = {
    test(s"${mk().getClass.getSimpleName}: missing key → None") {
      assert(mk().get("nope").isEmpty)
    }
    test(s"${mk().getClass.getSimpleName}: put/get/overwrite") {
      val s = mk()
      s.put("k", "v1"); assert(s.get("k").contains("v1"))
      s.put("k", "v2"); assert(s.get("k").contains("v2"))
    }
    test(s"${mk().getClass.getSimpleName}: getAll skips missing, empty is fine") {
      val s = mk()
      s.put("a", "1"); s.put("b", "2")
      assert(s.getAll(Seq("a", "x", "b")) == Map("a" -> "1", "b" -> "2"))
      assert(s.getAll(Nil) == Map.empty)
    }
    test(s"${mk().getClass.getSimpleName}: putAll bulk + empty") {
      val s = mk()
      s.putAll(Map("a" -> "1", "b" -> "2")); s.putAll(Map.empty)
      assert(s.get("b").contains("2"))
    }
    test(s"${mk().getClass.getSimpleName}: delete present and absent") {
      val s = mk()
      s.put("a", "1"); s.delete("a"); s.delete("ghost")
      assert(s.get("a").isEmpty)
    }
  }

  contract(() => new MapStore[String])

  test("MultiMapStore: tenants are lazily created, sorted, isolated") {
    val m = new MultiMapStore[String]
    m.tenant("marvel").put("hero", "spiderman")
    m.tenant("dc").put("hero", "batman")
    assert(m.allTenants == Seq("dc", "marvel"))
    assert(m.tenant("marvel").get("hero").contains("spiderman"))
    assert(m.tenant("dc").get("hero").contains("batman"))
  }

  test("MultiMapStore: cross-tenant fetch/push in bulk") {
    val m = new MultiMapStore[String]
    m.push(Map(("marvel", "h1") -> "x", ("dc", "h2") -> "y"))
    val got = m.fetch(Seq(("marvel", "h1"), ("dc", "h2"), ("dc", "missing")))
    assert(got == Map(("marvel", "h1") -> "x", ("dc", "h2") -> "y"))
  }
}
