package graft.tools

/** Box memory-bandwidth ceiling probe (plain JVM threads, no Spark): each
  * thread repeatedly copies a 64MB long array (one read + one write stream
  * per copy). If aggregate GB/s flattens out between 8 and 32 threads, a
  * pipeline that streams large packed arrays — this engine's chunked
  * exchanges and gallop intersections — cannot scale past that point on
  * this box no matter how it is partitioned; real multi-machine executors
  * each bring their own memory channels. Evidence for BASELINE.md's
  * round-4 "8→32 step, measured three ways" analysis. */
object BandwidthProbe {
  def main(args: Array[String]): Unit = {
    val mb = 64
    val len = mb * 1024 * 1024 / 8
    val windowMs = 4000L
    for (threads <- Seq(1, 2, 4, 8, 16, 32)) {
      val totalCopies = new java.util.concurrent.atomic.AtomicLong()
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val ready = new java.util.concurrent.CountDownLatch(threads)
      val go = new java.util.concurrent.CountDownLatch(1)
      val ts = (0 until threads).map { t =>
        val th = new Thread(() => {
          val src = new Array[Long](len)
          val dst = new Array[Long](len)
          java.util.Arrays.fill(src, t.toLong) // touch pages before timing
          java.util.Arrays.fill(dst, t.toLong)
          ready.countDown()
          go.await()
          var n = 0L
          while (!stop.get()) {
            System.arraycopy(src, 0, dst, 0, len)
            n += 1
          }
          totalCopies.addAndGet(n); ()
        })
        th.setDaemon(true); th.start(); th
      }
      ready.await()
      val t0 = System.nanoTime()
      go.countDown()
      Thread.sleep(windowMs)
      stop.set(true)
      ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      val gb = totalCopies.get().toDouble * mb * 2 / 1024.0 / sec // read+write
      println(f"[bw] threads=$threads%2d aggregate ≈ $gb%.1f GB/s")
    }
  }
}
