package graft.streaming

/** Driver-side microbenchmark attributing the streaming fold-stage
  * cost (diagnostic main, not part of the library surface).
  *
  * Finding (round 15, sf0.1-shaped input): [[EventPipeline.foldEvents]]
  * itself runs at ~1 µs/event warm (~15-30 ms for a 20k-event batch,
  * single-threaded) — the fold-stage's ~235 µs/event of task CPU in
  * StreamBench is therefore FRAMEWORK cost (shuffle fetch, object
  * ser/de at the groupByKey boundary, state-store acquire/commit,
  * task machinery), not the rule evaluation. Interpreted-expression
  * and wholeStage-off runs measured the same, ruling out per-batch
  * codegen recompilation as the steady-state cost. Keep optimizing
  * the operator COUNT (one stateful op since round 15), not the fold
  * body.
  */
object FoldBench {
  def main(args: Array[String]): Unit = {
    val cfg = graft.config.DefaultConfig.config
    val nUsers = 1500
    val nEvents = 20000
    val rnd = new scala.util.Random(42)
    val types = Array("purchase", "error", "click", "message")
    val events = (0 until nEvents).map { i =>
      EventPipeline.TypedEventRow(i.toLong,
        new java.sql.Timestamp(1700000000000L + i * 1000L),
        (rnd.nextInt(nUsers)).toLong,
        types(rnd.nextInt(types.length)), rnd.nextDouble() * 100,
        Map("k" -> "1"))
    }
    val byUser = events.groupBy(_.user_id)
    (1 to 5).foreach { rep =>
      val t0 = System.nanoTime()
      var flips = 0
      byUser.foreach { case (u, evs) =>
        val (_, ch) = EventPipeline.foldEvents(cfg, u,
          EventPipeline.emptyState, evs.iterator, trackSeen = false)
        flips += ch.size
      }
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"rep=$rep fold of $nEvents events / $nUsers users: $ms%.1f ms, flips=$flips")
    }
  }
}
