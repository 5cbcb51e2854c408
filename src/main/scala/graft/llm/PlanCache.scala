package graft.llm

import org.apache.spark.sql.DataFrame

/** Bounded access-order LRU for plan-keyed, Spark-CACHED frames —
  * the bloomCache discipline applied to the dedup/similarity memo
  * tables (r10): a long-running server evaluating per-batch operators
  * (incremental dedup/near-dup sees a NEW canonicalized plan every
  * batch) must not accumulate executor storage without bound, so
  * eviction unpersists the frame (non-blocking: an in-flight consumer
  * recomputes, it never fails).
  *
  * Values must be built LAZILY (`.cache()` marks, it does not run a
  * job), so `computeIfAbsent` under the map mutex holds it only for
  * plan construction — never for a Spark action (the r9
  * selectivity-cache liveness rule). Caches whose compute DOES run an
  * action (ANN centroid/PQ codebook builds) stay on ConcurrentHashMap
  * with per-bin locking and small driver-side values instead.
  */
private[llm] object PlanCache {
  def bounded[K](max: Int): java.util.Map[K, DataFrame] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[K, DataFrame](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[K, DataFrame]): Boolean =
          if (size() > max) { e.getValue.unpersist(false); true }
          else false
      })
}
