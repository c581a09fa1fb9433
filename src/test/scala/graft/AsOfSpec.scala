package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.AsOf

/** AS-OF temporal join: inclusive-tie semantics, newest-prior selection,
  * left-join null for no-prior, tolerance staleness bound, and the
  * one-shuffle plan shape (union-and-sweep, not a range join). */
class AsOfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val left = Seq(
    ("u1", 10L, "p10"), ("u1", 20L, "p20"), ("u1", 5L, "p5"),
    ("u2", 7L, "q7"), ("u3", 9L, "r9"))
    .toDF("k", "t", "lv")
  private val right = Seq(
    ("u1", 10L, "c10"), ("u1", 15L, "c15"), ("u1", 3L, "c3"),
    ("u2", 8L, "d8"))
    .toDF("k", "t", "rv")

  private def run(tol: Option[Long] = None): Map[(String, Long), (Any, Any)] =
    AsOf.join(left, right, Seq("k"), "t", tol).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.get(r.fieldIndex("t_asof")), r.get(r.fieldIndex("rv"))))
      .toMap

  test("newest prior right row per left row; ties inclusive; no-prior → null") {
    assert(run() == Map(
      ("u1", 10L) -> (10L, "c10"),  // tie: same-time right IS visible
      ("u1", 20L) -> (15L, "c15"),  // newest prior, not first prior
      ("u1", 5L) -> (3L, "c3"),
      ("u2", 7L) -> (null, null),   // right exists but only later
      ("u3", 9L) -> (null, null)))  // key absent on the right
  }

  test("tolerance: matches staler than the bound null out, rows stay") {
    val got = run(tol = Some(4L))
    assert(got(("u1", 20L)) == (null, null)) // 20-15=5 > 4 → too stale
    assert(got(("u1", 10L)) == (10L, "c10")) // 0 ≤ 4 → kept
    assert(got(("u1", 5L)) == (3L, "c3"))    // 2 ≤ 4 → kept
    assert(got.size == 5)                    // left join: no row dropped
  }

  test("left payload columns survive; ambiguous payload rejected") {
    val row = AsOf.join(left, right, Seq("k"), "t")
      .filter(col("k") === "u1" && col("t") === 20L).collect().head
    assert(row.getString(row.fieldIndex("lv")) == "p20")
    intercept[IllegalArgumentException] {
      AsOf.join(left, left.withColumnRenamed("t", "t2")
        .withColumn("t", col("t2")), Seq("k"), "t")
    }
  }

  test("plan shape: ONE shuffle (union-and-sweep), no join operator") {
    val p = AsOf.join(left, right, Seq("k"), "t").queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    val exchanges = p.linesIterator.count(_.matches("\\(\\d+\\) Exchange.*"))
    assert(exchanges == 1, s"expected exactly one exchange, got $exchanges:\n$p")
    assert(!p.toLowerCase.contains("join"),
      s"as-of must not plan a join operator:\n$p")
    // both carried columns collapse into ONE Window operator (one sort)
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Window.*")) == 1, p)
  }

  test("revisions carry ATOMICALLY: a null in the newest right row stays " +
      "null (no per-column resurrection of the previous revision)") {
    // right k=u1: rev t=1 (price=10, disc=5), rev t=2 (price=12, disc=NULL)
    val r = Seq(("u1", 1L, Some(10), Some(5)), ("u1", 2L, Some(12), None))
      .toDF("k", "t", "price", "disc")
    val l = Seq(("u1", 3L, "e")).toDF("k", "t", "lv")
    val row = AsOf.join(l, r, Seq("k"), "t").collect().head
    assert(row.getLong(row.fieldIndex("t_asof")) == 2L)
    assert(row.getInt(row.fieldIndex("price")) == 12)
    // a per-column last(ignoreNulls) sweep would leak disc=5 from t=1
    assert(row.isNullAt(row.fieldIndex("disc")),
      s"t=1's disc resurrected into the t=2 revision: $row")
  }

  test("null keys never match (SQL join semantics): null-key left rows " +
      "pass through unenriched, null-key right rows enrich nothing") {
    val l = Seq((Option.empty[String], 5L, "ln"), (Some("u1"), 5L, "l1"))
      .toDF("k", "t", "lv")
    val r = Seq((Option.empty[String], 3L, "rn"), (Some("u1"), 3L, "r1"))
      .toDF("k", "t", "rv")
    val got = AsOf.join(l, r, Seq("k"), "t").collect()
      .map(x => x.getString(x.fieldIndex("lv")) ->
        x.get(x.fieldIndex("rv"))).toMap
    assert(got == Map("ln" -> null, "l1" -> "r1"))
  }
}
