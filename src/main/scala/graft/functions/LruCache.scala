package graft.functions

/** Size-capped, access-ordered (true LRU) string-keyed cache for codegen
  * expression helpers. Used through [[LruCache.threadLocal]]: one instance
  * per executor thread, so lookups take NO lock (a shared synchronized map
  * would serialize the per-row hot path at 32 threads), while eviction is
  * genuine LRU — a layer with more than `maxEntries` distinct keys degrades
  * to re-computing the coldest entries instead of thrashing the whole cache
  * every batch (the old clear()-on-full policy). Worst-case memory is
  * threads × maxEntries, bounded by construction.
  */
private[graft] final class LruCache[V](maxEntries: Int) {
  private val m = new java.util.LinkedHashMap[String, V](256, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, V]): Boolean =
      size() > maxEntries
  }
  def get(k: String, f: String => V): V = {
    val hit = m.get(k)
    if (hit != null) hit
    else {
      val v = f(k)
      m.put(k, v)
      v
    }
  }
  def size: Int = m.size()
  def contains(k: String): Boolean = m.containsKey(k)
}

private[graft] object LruCache {
  def threadLocal[V](maxEntries: Int): ThreadLocal[LruCache[V]] = {
    val tl = new ThreadLocal[LruCache[V]] {
      override def initialValue(): LruCache[V] = new LruCache[V](maxEntries)
    }
    tl
  }
}
