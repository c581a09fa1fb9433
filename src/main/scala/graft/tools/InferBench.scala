package graft.tools

import graft.cdc.EventGen
import graft.schema.Infer

/** r08: single-threaded microbench of the streaming analyzer — isolates
  * per-doc inference cost from Spark. Usage: runMain graft.tools.InferBench [nDocs] */
object InferBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val p = EventGen.Params(nEvents = n, nRepos = 2000, pathsPerRepo = 500)
    val docs = (0 until n).map(i => EventGen.eventAt(i, p).doc).toArray
    System.err.println(s"[ib] $n docs, avg len ${docs.map(_.length).sum / n}")
    (1 to 3).foreach { rep =>
      val t0 = System.nanoTime()
      val tree = Infer.analyzeDocumentsStream("repos", docs.iterator)
      val el = (System.nanoTime() - t0) / 1e9
      System.err.println(
        f"[ib] rep$rep analyzeDocumentsStream: $el%6.3f s (${el / n * 1e6}%.2f us/doc) ${tree.attributes.size}")
    }
    // comparison: raw Jackson token walk, no tree
    val jf = new com.fasterxml.jackson.core.JsonFactory()
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      var acc = 0L
      docs.foreach { d =>
        val p2 = jf.createParser(d)
        while (p2.nextToken() != null) acc += 1
        p2.close()
      }
      val el = (System.nanoTime() - t0) / 1e9
      System.err.println(
        f"[ib] rep$rep raw jackson walk: $el%6.3f s (${el / n * 1e6}%.2f us/doc) $acc")
    }
  }
}
