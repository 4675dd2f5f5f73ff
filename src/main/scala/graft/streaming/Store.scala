package graft.streaming

import scala.collection.concurrent.TrieMap

/** The reference's key-value store contract (`store.go:18-31`), typed.
  *
  * Semantics preserved exactly (see `map.go:1-65` and its tests):
  * missing key → None; getAll skips missing keys; put overwrites; delete
  * of an absent key is a no-op; empty getAll/putAll are fine; flush is a
  * durability hook (no-op here).
  *
  * Role in the engine: kasper applications hold *all* operator state in
  * these stores. In the Spark engine, per-key streaming state lives in
  * `GroupState` (see [[StatefulOps]]) and this facade is the local state
  * object *inside* a state group — plus a standalone building block for
  * enrichment tables and tests.
  */
trait Store[V] {
  def get(key: String): Option[V]
  def getAll(keys: Seq[String]): Map[String, V]
  def put(key: String, value: V): Unit
  def putAll(kvs: Map[String, V]): Unit
  def delete(key: String): Unit
  def flush(): Unit
}

/** In-memory implementation (`map.go`). Thread-safe (executor tasks may
  * share an instance when used as a broadcast-side cache).
  */
final class MapStore[V] extends Store[V] {
  private val m = TrieMap.empty[String, V]
  override def get(key: String): Option[V] = m.get(key)
  override def getAll(keys: Seq[String]): Map[String, V] =
    keys.flatMap(k => m.get(k).map(k -> _)).toMap
  override def put(key: String, value: V): Unit = m.put(key, value)
  override def putAll(kvs: Map[String, V]): Unit = kvs.foreach { case (k, v) => m.put(k, v) }
  override def delete(key: String): Unit = m.remove(key)
  override def flush(): Unit = ()
  def size: Int = m.size
  def toMap: Map[String, V] = m.toMap
}

/** Multitenant store (`store.go:35-44`): per-tenant sub-stores with
  * sorted tenant listing and cross-tenant bulk fetch/push
  * (`multi_map.go:1-76`). Tenant is a plain dimension — the engine maps
  * it to a grouping column, never a key-prefix string
  * (vs `multi_redis.go:44-46`).
  */
trait MultiStore[V] {
  def tenant(t: String): Store[V]
  def allTenants: Seq[String]
  def fetch(keys: Seq[(String, String)]): Map[(String, String), V]
  def push(entries: Map[(String, String), V]): Unit
}

final class MultiMapStore[V] extends MultiStore[V] {
  private val tenants = TrieMap.empty[String, MapStore[V]]
  override def tenant(t: String): Store[V] =
    tenants.getOrElseUpdate(t, new MapStore[V])
  override def allTenants: Seq[String] = tenants.keys.toSeq.sorted
  override def fetch(keys: Seq[(String, String)]): Map[(String, String), V] =
    keys.flatMap { case (t, k) => tenant(t).get(k).map((t, k) -> _) }.toMap
  override def push(entries: Map[(String, String), V]): Unit =
    entries.foreach { case ((t, k), v) => tenant(t).put(k, v) }
}
