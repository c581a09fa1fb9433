package graft.cdc

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** One change event — the WAL/binlog envelope of BASELINE.json / FIXTURES.md §4:
  * a monotone `lsn`, an op, an event time, and the JSON document payload
  * keyed by (repo, path, commit). */
final case class ChangeEvent(lsn: Long, op: String, ts: Timestamp, doc: String)

/** Deterministic synthetic change-event tail over the source-code-repo
  * table shape `(repo, path, commit, lang, content)`.
  *
  * Design goals (FIXTURES.md §4):
  *  - pure function of the event index (seeded) — replayable anywhere,
  *    generated distributed via `spark.range` (no driver loops)
  *  - Zipf-skewed repo distribution (hot repos exercise salting)
  *  - updates bump `rev` and mutate `content`; ~deletePct deletes
  *  - exact duplicate deliveries injected (same lsn, same payload) to
  *    exercise per-key/lsn dedup and idempotency
  *  - events past `evolveAfter` carry a new nested `stats` object and a
  *    `topics` array — mid-stream schema evolution
  */
object EventGen {
  val Langs: Vector[String] = Vector("scala", "java", "py", "rs", "go", "ts")

  private def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  final case class Params(
      nEvents: Long,
      nRepos: Int = 100,
      pathsPerRepo: Int = 50,
      seed: Long = 42L,
      zipfExponent: Double = 2.5, // higher → hotter head repos
      deletePct: Int = 4,         // % of events that are deletes
      dupPct: Int = 8,            // % of events that duplicate the previous
      evolveAfterFraction: Double = 0.6,
  )

  /** The event for index `i` — pure and total. Index `i` may re-emit the
    * payload of `i-1` verbatim (a duplicate delivery). */
  def eventAt(i: Long, p: Params): ChangeEvent = {
    val isDup = p.dupPct > 0 && i > 0 && math.floorMod(mix(p.seed ^ i), 100) < p.dupPct
    val j = if (isDup) i - 1 else i
    val h1 = mix(p.seed ^ (j * 31 + 1))
    val h2 = mix(p.seed ^ (j * 31 + 2))
    val h3 = mix(p.seed ^ (j * 31 + 3))
    // Zipf-ish skew: u^k concentrates mass near repo 0
    val u = (math.floorMod(h1, 1000000L).toDouble + 0.5) / 1000000.0
    val repoIdx = math.min(p.nRepos - 1, (math.pow(u, p.zipfExponent) * p.nRepos).toInt)
    val pathIdx = math.floorMod(h2, p.pathsPerRepo.toLong).toInt
    val repo = f"repo-$repoIdx%04d"
    val lang = Langs((repoIdx + pathIdx) % Langs.size)
    val path = s"src/f$pathIdx.$lang"
    val commit = s"c${pathIdx % 3}"
    val id = s"$repo|$path|$commit"
    val isDelete = math.floorMod(h3, 100L) < p.deletePct
    val op =
      if (isDelete) "delete"
      else if (math.floorMod(h3, 100L) < 50) "insert"
      else "update"
    val rev = s"$j.${java.lang.Long.toHexString(h2 ^ h3)}"
    val contentSeed = java.lang.Long.toHexString(mix(h1 ^ h2))
    val content = s"// $repo $path $commit v$j\n" +
      (s"val x$contentSeed = ${math.floorMod(h3, 1000L)}; " * 8).trim
    val evolved = j >= (p.nEvents * p.evolveAfterFraction).toLong
    val sb = new StringBuilder(512)
    sb.append("{\"id\":\"").append(id)
      .append("\",\"rev\":\"").append(rev)
      .append("\",\"repo\":\"").append(repo)
      .append("\",\"path\":\"").append(path)
      .append("\",\"commit\":\"").append(commit)
      .append("\",\"lang\":\"").append(lang)
      .append("\",\"content\":").append(graft.schema.Json.quote(content))
    if (evolved) {
      sb.append(",\"stats\":{\"lines\":").append(math.floorMod(h1, 5000L))
        .append(",\"bytes\":").append(math.floorMod(h2, 100000L)).append("}")
      sb.append(",\"topics\":[")
      val nTopics = (math.floorMod(h3, 3L) + 1).toInt
      sb.append((0 until nTopics).map(k =>
        s"""{"id":"t${math.floorMod(mix(h1 + k), 20L)}","score":${math.floorMod(h2 + k, 100L)}}""")
        .mkString(","))
      sb.append("]")
    }
    sb.append("}")
    ChangeEvent(j, op, new Timestamp(1700000000000L + j * 1000L), sb.toString)
  }

  /** Distributed generation: `spark.range` → pure map. */
  def events(spark: SparkSession, p: Params,
      partitions: Int = 0): Dataset[ChangeEvent] = {
    import spark.implicits._
    val base =
      if (partitions > 0) spark.range(0, p.nEvents, 1, partitions)
      else spark.range(0, p.nEvents)
    base.map(i => eventAt(i, p))
  }

  /** Driver-side expected final state for small-scale oracles: id →
    * (lsn, op, doc-json) of the winning (max-lsn) event per key. Keys whose
    * winner is a delete are absent. */
  def expectedFinalState(p: Params): Map[String, ChangeEvent] = {
    val winners = scala.collection.mutable.HashMap.empty[String, ChangeEvent]
    var i = 0L
    while (i < p.nEvents) {
      val e = eventAt(i, p)
      val id = {
        val s = e.doc.indexOf("\"id\":\"") + 6
        e.doc.substring(s, e.doc.indexOf('"', s))
      }
      val cur = winners.get(id)
      if (cur.forall(_.lsn <= e.lsn)) winners.put(id, e)
      i += 1
    }
    winners.filter(_._2.op != "delete").toMap
  }
}
