package graft

import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.dsl.plans._
import org.apache.spark.sql.catalyst.expressions.{Alias, IntegerLiteral, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types.StringType

import graft.rules.LimitRules._

/** Unit tests for the three limit rules applied to raw, un-normalized plans —
  * mirrors the reference's rule unit tests (`dolomite/src/rules/limit.rs:
  * 167-322`), which build a hand-made plan, apply one rule, and compare
  * against the expected shape. The 2-column Utf8 table t1 mirrors the
  * reference fixture (`rules/limit.rs:187-207`, FIXTURES.md §1).
  */
class RulesSpec extends GraftSuite {

  private def t1: LocalRelation =
    LocalRelation($"c1".string, $"c2".string)

  private def limitOf(p: LogicalPlan): Seq[Int] = p.collect {
    case GlobalLimit(IntegerLiteral(n), _) => n
  }

  test("RemoveLimit: Limit(10, Limit(5, t1)) -> Limit(5, t1)") {
    val plan = Limit(Literal(10), Limit(Literal(5), t1))
    val out = RemoveLimit(plan)
    assert(limitOf(out) == Seq(5))
    // exactly one GlobalLimit/LocalLimit pair remains
    assert(out.collect { case g: GlobalLimit => g }.size == 1)
    assert(out.collect { case l: LocalLimit => l }.size == 1)
  }

  test("RemoveLimit keeps the smaller of the two (5 inside 3)") {
    val plan = Limit(Literal(3), Limit(Literal(5), t1))
    assert(limitOf(RemoveLimit(plan)) == Seq(3))
  }

  test("PushLimitOverProjection: Limit(5, Project(t1)) -> Project(Limit(5, t1))") {
    val proj = Project(Seq($"c1".attr), t1)
    val out = PushLimitOverProjection(Limit(Literal(5), proj))
    out match {
      case Project(_, GlobalLimit(IntegerLiteral(5), LocalLimit(_, _: LocalRelation))) =>
      case other => fail(s"unexpected shape:\n${other.treeString}")
    }
  }

  test("PushLimitToTableScan: tightens local limit down to the global one") {
    val plan = GlobalLimit(Literal(5), LocalLimit(Literal(10), t1))
    val out = PushLimitToTableScan(plan)
    out match {
      case GlobalLimit(IntegerLiteral(5), LocalLimit(IntegerLiteral(5), _)) =>
      case other => fail(s"unexpected shape:\n${other.treeString}")
    }
  }

  test("PushLimitToTableScan: never shrinks a global limit above the local") {
    // GlobalLimit(10, LocalLimit(5, leaf)) may return up to 10 rows across
    // partitions — fusing to 5 would drop rows.
    val plan = GlobalLimit(Literal(10), LocalLimit(Literal(5), t1))
    assert(PushLimitToTableScan(plan) == plan)
  }

  test("kernel functions are registered in the SQL surface (injectFunction)") {
    // identical results through SQL and the Column API, incl. literal-int
    // parameters resolved at registration
    val viaSql = spark.sql(
      """SELECT simhash64(split('query scan table', ' ')) AS sh,
        |  jaccard_sim(array('a','b','c'), array('b','c','d')) AS j,
        |  word_shingles(split('a b c d', ' '), 2) AS ws,
        |  size(winnow_fingerprints('abcdefghijklmnopqrstuvwxyz', 16, 8))
        |    AS nfp,
        |  lsh_buckets(array(1000L, -2000L, 3000L), 1, 8)[0] AS bkt
        |""".stripMargin).collect()(0)
    import org.apache.spark.sql.functions.{array, lit, split}
    import graft.functions.functions._
    val viaApi = spark.range(1).select(
      simhash64(split(lit("query scan table"), " ")).as("sh"),
      jaccard_sim(array(lit("a"), lit("b"), lit("c")),
        array(lit("b"), lit("c"), lit("d"))).as("j"),
      lsh_buckets(array(lit(1000L), lit(-2000L), lit(3000L)), 1, 8).as("bkt"))
      .collect()(0)
    assert(viaSql.getLong(0) == viaApi.getLong(0))
    assert(viaSql.getDouble(1) == viaApi.getDouble(1))
    assert(viaSql.getSeq[String](2) == Seq("a b", "b c", "c d"))
    assert(viaSql.getInt(3) > 0)
    assert(viaSql.getLong(4) == viaApi.getSeq[Long](2).head)
  }

  test("injected functions carry correct catalog metadata") {
    val desc = spark.sql("DESCRIBE FUNCTION EXTENDED simhash64")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("Function: simhash64"), desc)
    assert(desc.contains("graft.functions.SimHash64"), desc)
    assert(desc.contains("SimHash"), desc) // usage text present
  }

  test("non-literal int argument to a kernel SQL function fails loudly") {
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles(split('a b', ' '), id + 1) " +
        "FROM range(1)").collect()
    }
    assert(e.getMessage.contains("literal INT") ||
      e.getCause != null && e.getCause.getMessage.contains("literal INT"),
      s"unexpected error: ${e.getMessage}")
  }

  test("rules are no-ops on non-matching plans") {
    val plain = Project(Seq($"c1".attr), t1)
    assert(RemoveLimit(plain) == plain)
    assert(PushLimitOverProjection(plain) == plain)
    assert(PushLimitToTableScan(plain) == plain)
  }
}
