package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.PlanBridge
import org.scalatest.funsuite.AnyFunSuite

/** The deployment entry point (`spark.sql.extensions=graft.
  * GraftExtensions`) must wire the whole library — scalar kernels,
  * aggregates, AND the whole-operator planner strategy — with no
  * programmatic register calls. The conf-string form only applies when
  * the SparkContext starts (spark-submit sets it before launch); inside
  * the test JVM the context pre-exists, so the SAME class goes through
  * `Builder.withExtensions`, which is the identical injection path one
  * step past the reflective load. Sessions share the JVM context
  * (stopping one would stop the context), so only session state is
  * exercised.
  */
class ExtensionsSpec extends AnyFunSuite {

  private def withExtSession[T](f: SparkSession => T): T = {
    TestSpark.spark // make sure the shared context exists first
    val ss = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // AQE's AdaptiveSparkPlanExec wrapper hides the inner plan from
      // executedPlan.collect; the strategy test asserts on plan nodes
      .config("spark.sql.adaptive.enabled", "false")
      .create()
    try f(ss)
    finally SparkSession.setActiveSession(TestSpark.spark)
  }

  test("injected functions: filter language + kernels usable from SQL") {
    withExtSession { ss =>
      val n = ss.sql(
        """SELECT count(*) FROM VALUES ('{"k": 7}'), ('{"k": 99}'), ('{"k": "7"}') t(j)
          |WHERE evt_filter(j, 'k<=50')""".stripMargin).head().getLong(0)
      // the string "7" must NOT match an int filter (strict typing)
      assert(n == 1)
      val sig = ss.sql("SELECT simhash32(array('a','b'))").head().getString(0)
      assert(sig.length == 32 && sig.forall(c => c == '0' || c == '1'))
    }
  }

  test("injected aggregate: misra_gries from SQL") {
    withExtSession { ss =>
      val rows = ss.sql(
        "SELECT misra_gries(s, 2) FROM VALUES ('a'),('a'),('b') t(s)")
        .head().getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows == Map("a" -> 2L, "b" -> 1L))
    }
  }

  test("injected planner strategy: AsOfJoin plans without explicit register") {
    withExtSession { ss =>
      import ss.implicits._
      val l = Seq((1L, 10L, 5L), (2L, 10L, 2L)).toDF("id", "k", "t")
      val r0 = Seq((10L, 3L, "x")).toDF("rk", "rt", "rv")
      // fresh exprIds like AsOfJoin.backward does, but WITHOUT calling
      // backward (which would register the strategy itself): the
      // injected extension must be what plans the node
      val r = r0.select(r0.columns.map(c => col(c).as(c)): _*)
      def attr(df: org.apache.spark.sql.DataFrame, n: String) =
        df.queryExecution.analyzed.output.find(_.name == n).get
      val node = graft.plans.AsOfJoin(
        l.queryExecution.analyzed, r.queryExecution.analyzed,
        Seq(attr(l, "k")), Seq(attr(r, "rk")), attr(l, "t"), attr(r, "rt"))
      assert(ss.experimental.extraStrategies.isEmpty)
      val df = PlanBridge.ofRows(ss, node)
      // tiny right side: the injected strategy picks the broadcast
      // exec; either exec proves the extension planned the node
      assert(df.queryExecution.executedPlan.collect {
        case e: graft.plans.AsOfJoinExec => e: Any
        case e: graft.plans.BroadcastAsOfJoinExec => e: Any
      }.nonEmpty)
      val rows = df.orderBy("id").collect().map(_.toSeq).toSeq
      assert(rows == Seq(
        Seq(1L, 10L, 5L, 10L, 3L, "x"),
        Seq(2L, 10L, 2L, null, null, null)))
    }
  }
}
