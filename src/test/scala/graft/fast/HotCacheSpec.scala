package graft.fast

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Executor-side hot-replica cache hygiene: a CLOSED state's cached
  * snapshots must not live for the executor JVM's lifetime. The driver's
  * invalidate() only runs in the driver JVM; on a real cluster the idle
  * TTL is what reclaims dead states' replicas — without a generation bump
  * and without waiting for cache-cap pressure. */
class HotCacheSpec extends AnyFunSuite with SparkTestBase {

  private def ref(id: String, gen: Long = 0L): DeltaEngine.ChainHot = {
    val base = spark.sparkContext.broadcast(new DeltaEngine.HotMap())
    DeltaEngine.ChainHot(id, gen, base, IndexedSeq.empty)
  }

  test("idle TTL evicts a dead state's entries on another state's resolve") {
    val prev = sys.props.get("spark.graft.hotcache.ttlMs")
    sys.props("spark.graft.hotcache.ttlMs") = "200"
    try {
      val dead = ref("ttl-dead-state")
      DeltaEngine.HotCache.resolve(dead)
      assert(DeltaEngine.HotCache.entryCount("ttl-dead-state") == 1)
      Thread.sleep(500) // let the dead state's entry age well past the TTL
      // an UNRELATED state's resolve sweeps it — no generation bump, no
      // invalidate() call, no cache-cap pressure
      DeltaEngine.HotCache.resolve(ref("ttl-live-state"))
      assert(DeltaEngine.HotCache.entryCount("ttl-dead-state") == 0)
      assert(DeltaEngine.HotCache.entryCount("ttl-live-state") == 1)
    } finally {
      prev match {
        case Some(v) => sys.props("spark.graft.hotcache.ttlMs") = v
        case None => sys.props.remove("spark.graft.hotcache.ttlMs")
      }
      DeltaEngine.HotCache.invalidate("ttl-live-state")
      DeltaEngine.HotCache.invalidate("ttl-dead-state")
    }
  }

  test("a hot entry's TTL is refreshed by access") {
    val prev = sys.props.get("spark.graft.hotcache.ttlMs")
    // generous TTL-to-gap ratio (800 vs 250 ms) so a GC/scheduler stall on
    // a loaded box cannot age a touched entry past the TTL between touches;
    // total elapsed (1250 ms) still exceeds the TTL, which is what proves
    // access refreshes it
    sys.props("spark.graft.hotcache.ttlMs") = "800"
    try {
      val live = ref("ttl-refresh-state")
      DeltaEngine.HotCache.resolve(live)
      for (_ <- 0 until 5) {
        Thread.sleep(250)
        DeltaEngine.HotCache.resolve(live)
      }
      // trigger a sweep from another state: the touched entry survives
      DeltaEngine.HotCache.resolve(ref("ttl-other-state"))
      assert(DeltaEngine.HotCache.entryCount("ttl-refresh-state") == 1)
    } finally {
      prev match {
        case Some(v) => sys.props("spark.graft.hotcache.ttlMs") = v
        case None => sys.props.remove("spark.graft.hotcache.ttlMs")
      }
      DeltaEngine.HotCache.invalidate("ttl-refresh-state")
      DeltaEngine.HotCache.invalidate("ttl-other-state")
    }
  }
}
