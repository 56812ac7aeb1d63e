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

  test("rules are no-ops on non-matching plans") {
    val plain = Project(Seq($"c1".attr), t1)
    assert(RemoveLimit(plain) == plain)
    assert(PushLimitOverProjection(plain) == plain)
    assert(PushLimitToTableScan(plain) == plain)
  }
}
