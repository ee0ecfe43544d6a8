package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.streaming.TimeMachineSink

/** Bucketed time-machine storage (shuffle-free latest reads) + multiprobe
  * LSH recall. */
class BucketedSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed sink: latest-state aggregation plans without an Exchange") {
    val stamped = Seq(
      ("u1", 7L, 1000L, 0, 1L, 900L, "t", "INSERT", "k1", Map.empty[String, String], Map("a" -> "1")),
      ("u2", 8L, 2000L, 0, 2L, 1900L, "t", "UPDATE", "k1", Map("a" -> "1"), Map("a" -> "2")),
      ("u3", 9L, 3000L, 0, 3L, 2900L, "t", "INSERT", "k2", Map.empty[String, String], Map("a" -> "9"))
    ).toDF("txnUuid", "xxid", "commitTsMs", "chunk", "eventId", "tsMs", "table", "kind", "rowKey", "before", "after")
    spark.sql("DROP TABLE IF EXISTS tm_bucketed")
    // a previous JVM's orphaned location blocks managed-table creation
    val loc = java.nio.file.Paths.get("spark-warehouse/tm_bucketed")
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    TimeMachineSink.writeBucketed(stamped, "tm_bucketed", buckets = 4)

    val latest = TimeMachineSink.latestRowsBucketed(spark, "tm_bucketed")
    val plan = latest.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"shuffle in bucketed read:\n$plan")
    val rows = latest.select(col("row_key"), element_at(col("cols"), "a"))
      .as[(String, String)].collect().toMap
    assert(rows == Map("k1" -> "2", "k2" -> "9"))
  }

  test("multiprobe LSH recall is a superset of single-bucket, at planes+1 probe cost") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 200L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 3)
    def pairs(mp: Boolean) = Similarity.lshCosineCandidates(
      vecs, col("vec_id"), col("embedding"),
      queries, col("vec_id"), col("embedding"), planes = 8, multiprobe = mp)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val single = pairs(false)
    val multi = pairs(true)
    assert(single.subsetOf(multi))
    assert(multi.size > single.size) // probes genuinely widen recall here
  }
}
