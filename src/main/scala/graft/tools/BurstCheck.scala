package graft.tools
/** Pure-JVM CPU burst-throttle detector: repeated fixed work, no Spark. */
object BurstCheck {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.map(_.toInt).getOrElse(8)
    val iters = args.lift(1).map(_.toInt).getOrElse(12)
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { _ =>
        new Thread(() => {
          var h = 0L
          var j = 0L
          while (j < 800000000L) { h = h * 6364136223846793005L + j; j += 1 }
          if (h == 42) println("")
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      println(f"[burst] iter=$i wall=${(System.nanoTime()-t0)/1e9}%.2f s")
    }
  }
}
