package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational
import graft.streaming.WatchStream

/** The typed streaming surface (the TypedAnalyzeSpec pattern on the
  * watch-stream side): `WatchStream.typedBotFlags` must be row-for-row
  * hash-equal to the relational catalog row q_running_undercut — which
  * StreamOracleSpec pins equal to the drained q_watch_stream — and must
  * pay exactly the ONE shuffle the groupByKey needs (a typed twin that
  * added an exchange would be a different plan, not a typed view of the
  * same one).
  */
class TypedBotFlagSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("typed twin hash-equals the q_running_undercut rows") {
    val typed = WatchStream.typedBotFlags(spark, SparkT.Sf0001)
    val got = typed.collect()
      .map(o => (o.event_id, o.user_id, o.undercut, o.sliding_hits, o.is_bot))
      .toSet
    val expected = Relational.runningUndercut(spark, SparkT.Sf0001).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Long]("undercut"), r.getAs[Long]("sliding_hits"),
        r.getAs[Boolean]("is_bot")))
      .toSet
    assert(got.nonEmpty)
    assert(got === expected)
  }

  test("the typed twin pays exactly one shuffle (the groupByKey)") {
    val plan = WatchStream.typedBotFlags(spark, SparkT.Sf0001)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected the single groupByKey exchange:\n$plan")
  }
}
