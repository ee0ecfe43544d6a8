package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Dev utility (round-11 VERDICT #4): pin the banded mm near-dups' scale
  * posture with numbers instead of assertions. For a given sf dir it
  * reproduces the two gated hash inputs (image aHash, audio energy-delta
  * fingerprint), then reports per lane:
  *   - n_hashes, distinct band keys, candidate MEETINGS Σ C(f,2) over the
  *     (comboIdx, bandValue) keys (the exact volume the banded self-join
  *     must score — the quantity that grows Σf² under replica-heavy keys),
  *     the worst key's f, and TRUE pairs (operator output rows);
  *   - wall seconds for the operator, unsalted vs block-salted
  *     (saltHotDf/saltBlocks — the non-lossy within-key spread lever), and
  *     a pair-count equality check between the two (the lever's exactness
  *     contract, verified on the real corpus each run).
  * The candidate:true-pair ratio is the "output-bound residual" evidence:
  * if meetings/true stays flat from sf0.1 to ×10, the super-linear wall
  * growth is the pair set itself, not wasted candidate work.
  * Usage: `sbt "runMain graft.tools.NearDupAudit <sfDir> [saltHotDf] [saltBlocks]"`.
  */
object NearDupAudit {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: NearDupAudit <sfDir> [saltHotDf] [saltBlocks]")
    val sfDir = args(0)
    val saltHotDf = if (args.length > 1) args(1).toInt else 512
    val saltBlocks = if (args.length > 2) args(2).toInt else 16
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // === image lane: the mm_phash_neardup input ===
    val withPng = docs.filter(length(col("text")) >= 64)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        (id, Multimodal.ImageCodec.buildPng(8, 8,
          java.util.Arrays.copyOf(text.getBytes("US-ASCII"), 64)))
      }.toDF("doc_id", "payload")
    val phash = Multimodal.perceptualHash(withPng, "payload")
      .select(col("doc_id"), col("ahash")).persist()
    phash.count()

    // === audio lane: the mm_audio_neardup input ===
    val withWav = docs.filter(length(col("text")) >= 4)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        (id, Multimodal.buildWav(1, 8000, 16, text.getBytes("US-ASCII")))
      }.toDF("doc_id", "payload")
    val afp = Multimodal.audioFingerprint(withWav, "doc_id", "payload",
        samplesPerFrame = 4, bits = 63)
      .filter(col("n_frames") >= 32)
      .select(col("doc_id"), lpad(bin(col("fingerprint")), 64, "0").as("ah"))
      .persist()
    afp.count()

    def audit(lane: String, hashed: DataFrame, hashCol: String): Unit = {
      // key volume audit: the 8-take-2 combination keys the operator joins
      // on (bands=8 -> bandLen=8, comboBands=2), Σ C(f,2) = meetings
      val combos = (0 until 8).combinations(2).map(_.toSeq).toSeq
      val keyArr = array(combos.zipWithIndex.map { case (c, ci) =>
        struct(lit(ci).as("b"),
          concat(c.map(i =>
            expr(s"substring($hashCol, ${i * 8 + 1}, 8)")): _*).as("bv"))
      }: _*)
      val stats = hashed.select(explode(keyArr).as("k"))
        .groupBy(col("k.b"), col("k.bv")).agg(count(lit(1)).as("f"))
        .agg(count(lit(1)).as("n_keys"),
          sum(expr("f * (f - 1) / 2")).cast("long").as("meetings"),
          max(col("f")).as("max_f"))
        .head()
      val n = hashed.count()

      def time(df: => DataFrame): (Double, Long) = {
        val t0 = System.nanoTime()
        val c = df.count()
        ((System.nanoTime() - t0) / 1e9, c)
      }
      val (secPlain, truePlain) = time(Multimodal.phashNearDup(
        hashed, col("doc_id"), col(hashCol), maxHamming = 6, bands = 8,
        comboBands = 2))
      val (secSalt, trueSalt) = time(Multimodal.phashNearDup(
        hashed, col("doc_id"), col(hashCol), maxHamming = 6, bands = 8,
        comboBands = 2, saltHotDf = saltHotDf, saltBlocks = saltBlocks))
      println(s"""{"lane":"$lane","sf":"$sfDir","n":$n,""" +
        s""""n_keys":${stats.getAs[Long]("n_keys")},""" +
        s""""meetings":${stats.getAs[Long]("meetings")},""" +
        s""""max_key_f":${stats.getAs[Long]("max_f")},""" +
        s""""true_pairs":$truePlain,""" +
        s""""cand_true_ratio":${if (truePlain == 0) -1
          else stats.getAs[Long]("meetings") / truePlain},""" +
        s""""sec_unsalted":${f"$secPlain%.2f"},""" +
        s""""sec_salted":${f"$secSalt%.2f"},""" +
        s""""salt_pairs_equal":${truePlain == trueSalt},""" +
        s""""salt_hot_df":$saltHotDf,"salt_blocks":$saltBlocks}""")
    }

    audit("phash", phash, "ahash")
    audit("audio", afp, "ah")
    spark.stop()
  }
}
