package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach

import graft.operators.Cdc
import graft.plans.TopOneWindowToMaxBy

/** The latest-state optimizer rule: row_number()=1 windows become sort-free
  * max_by/min_by aggregates, results unchanged. */
class OptimizerRuleSpec extends SparkTestBase with BeforeAndAfterEach {
  import spark.implicits._

  override def beforeEach(): Unit =
    spark.experimental.extraOptimizations = Seq(TopOneWindowToMaxBy)
  override def afterEach(): Unit =
    spark.experimental.extraOptimizations = Nil

  private val df = Seq(
    (1, "a", 100L, "x"), (2, "a", 200L, "y"), (3, "a", 200L, "z"),
    (4, "b", 50L, "p"), (5, "b", 40L, "q")
  ).toDF("ev", "key", "ts", "payload")

  test("desc row_number=1 rewrites to max_by and drops the Window/Sort") {
    val q = Cdc.latestState(df, col("key"), col("ts"), col("ev"))
      .select("key", "ev", "payload")
    val plan = q.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window "), s"Window survived:\n$plan")
    assert(!plan.contains("WindowGroupLimit"), s"group limit survived:\n$plan")
    assert(plan.contains("max_by"), s"no max_by:\n$plan")
    val out = q.as[(String, Int, String)].collect().toSet
    assert(out == Set(("a", 3, "z"), ("b", 4, "p"))) // ties broken by ev desc
  }

  test("asc ordering rewrites to min_by; physical plan has no sort for the pick") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("ts").asc, col("ev").asc)
    val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("key", "ev")
    assert(q.queryExecution.optimizedPlan.toString.contains("min_by"))
    assert(q.as[(String, Int)].collect().toSet == Set(("a", 1), ("b", 5)))
  }

  test("mixed direction / rank>1 / rank used downstream are left untouched") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("ts").desc, col("ev").asc)
    val mixed = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(mixed.queryExecution.optimizedPlan.toString.contains("Window"))

    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("ts").desc, col("ev").desc)
    val topk = df.withColumn("rn", row_number().over(w2)).filter(col("rn") <= 3)
    assert(topk.queryExecution.optimizedPlan.toString.contains("Window"))
  }

  test("all-null order key partitions still return a real row (not all-null payload)") {
    // max_by/min_by skip null keys; the rule wraps keys in a non-null struct
    // so a partition whose order key is null on every row behaves like the
    // original row_number()=1 window (returns one of its actual rows)
    val nullable = Seq(
      (1, "a", Some(100L), "x"), (2, "a", Some(200L), "y"),
      (3, "n", None: Option[Long], "p"), (4, "n", None: Option[Long], "q")
    ).toDF("ev", "key", "ts", "payload")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("ts").desc_nulls_last, col("ev").desc_nulls_last)
    val q = nullable.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("key", "payload")
    assert(q.queryExecution.optimizedPlan.toString.contains("max_by"))
    val out = q.as[(String, String)].collect().toMap
    assert(out("a") == "y")
    assert(Set("p", "q").contains(out("n")), s"all-null partition lost: $out")
  }

  test("rewritten plan matches the window plan on the events table") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val rewritten = Cdc.latestState(events, col("user_id"), col("event_id"), col("event_id"))
      .select("user_id", "event_type").as[(Long, String)].collect().toSet
    spark.experimental.extraOptimizations = Nil
    val original = Cdc.latestState(events, col("user_id"), col("event_id"), col("event_id"))
      .select("user_id", "event_type").as[(Long, String)].collect().toSet
    assert(rewritten == original && rewritten.nonEmpty)
  }

  test("extensions class wires into a fresh SparkSessionExtensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
  }
}
