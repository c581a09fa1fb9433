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
}
