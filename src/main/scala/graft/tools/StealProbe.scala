package graft.tools

/** Standalone runner for [[graft.Bench.cpuProbe]] — calibrate the quiet
  * band or watch for a quiet window before launching a bench run:
  * `runMain graft.tools.StealProbe [repeats] [threads]`. Prints one
  * reading per line plus the min (the host's current floor). */
object StealProbe {
  def main(args: Array[String]): Unit = {
    val repeats = args.lift(0).map(_.toInt).getOrElse(5)
    val threads = args.lift(1).map(_.toInt).getOrElse(8)
    val rs = (1 to repeats).map { i =>
      val s = graft.Bench.cpuProbe(threads)
      println(f"[steal-probe] t=$threads run$i $s%.3f s" +
        f" (${s / graft.Bench.ProbeQuietSecs}%.2fx quiet)")
      s
    }
    println(f"[steal-probe] min=${rs.min}%.3f s quiet-ref=" +
      f"${graft.Bench.ProbeQuietSecs}%.2f s")
  }
}
