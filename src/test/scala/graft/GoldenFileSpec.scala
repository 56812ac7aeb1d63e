package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Golden-file SQL corpus — the direct analog of the reference's YAML
  * harness (`datafusion-dolomite-integration/resources/limit.yaml` run by
  * `tests/utils/mod.rs:20-84`): each case is SQL plus expected plan
  * properties, loaded from `src/test/resources/golden_plans.json` and
  * executed against a session with GraftExtensions installed.
  */
class GoldenFileSpec extends GraftSuite {

  private case class Case(name: String, sql: String,
      mustContain: Seq[String], mustNotContain: Seq[String])

  private lazy val cases: Seq[Case] = {
    val url = getClass.getResource("/golden_plans.json")
    val tree = new ObjectMapper().readTree(url)
    tree.elements().asScala.map { n =>
      Case(
        n.get("name").asText(),
        n.get("sql").asText(),
        n.get("mustContain").elements().asScala.map(_.asText()).toSeq,
        n.get("mustNotContain").elements().asScala.map(_.asText()).toSeq)
    }.toSeq
  }

  private def executedString(sql: String): String = {
    Seq("lineitem", "orders", "customer").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }
    val df = spark.sql(sql)
    df.collect()
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }).toString
  }

  test("golden corpus loads") {
    assert(cases.size == 10)
  }

  for (i <- 0 until 10) {
    test(s"golden case #$i") {
      val c = cases(i)
      val plan = executedString(c.sql)
      c.mustContain.foreach(frag =>
        assert(plan.contains(frag),
          s"[${c.name}] missing '$frag':\n$plan"))
      c.mustNotContain.foreach(frag =>
        assert(!plan.contains(frag),
          s"[${c.name}] must not contain '$frag':\n$plan"))
    }
  }
}
