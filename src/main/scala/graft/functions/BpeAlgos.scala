package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer (Sennrich, Haddow & Birch, "Neural Machine
  * Translation of Rare Words with Subword Units", ACL '16): TRAIN learns an
  * ordered merge list from a word-frequency vocabulary; ENCODE applies the
  * merges greedily (lowest-rank adjacent pair first — the GPT-2-style
  * deterministic apply).
  *
  * Scale contract: training consumes the VOCAB table (distinct word →
  * count), which is vocabulary-sized — the same bounded-collect class as
  * the IVF centroid and PQ codebook tables — so the corpus never leaves
  * the executors; the learned merges broadcast into [[BpeEncodeExpr]] as a
  * plan literal and encoding is a scan-local projection. */
object BpeAlgos {

  /** One training round's pair statistics + merge, iterated `numMerges`
    * times over the weighted symbol vocabulary. Ties break (count desc,
    * pair lexicographic) so training is deterministic. */
  def train(vocab: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] =
      vocab.filter(_._1.nonEmpty).sortBy(_._1)
        .map { case (w, c) => (w.map(_.toString).toArray, c) }.toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < numMerges) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) round = numMerges
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => (mergePair(syms, best), c) }
        round += 1
      }
    }
    merges.toSeq
  }

  private def mergePair(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += (pair._1 + pair._2)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Greedy encode of one word: repeatedly merge the LOWEST-RANK adjacent
    * pair present in the table (leftmost on rank ties) until none applies. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    if (word.isEmpty) return Array.empty
    var syms = word.map(_.toString).toArray
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))) match {
          case Some(r) if r < bestRank => bestRank = r; bestIdx = i
          case _ =>
        }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        val merged = syms(bestIdx) + syms(bestIdx + 1)
        syms = (syms.take(bestIdx) :+ merged) ++ syms.drop(bestIdx + 2)
      }
    }
    syms
  }
}

/** `bpe_encode(text)` → array<string>: whitespace-pretokenize (after the
  * engine's standard lower/collapse normalization, applied by the CALLER)
  * and greedily BPE-encode each word with the merge list baked into the
  * plan. CodegenFallback by design: the greedy merge loop is branchy JVM
  * code either way, and the expression runs once per row with no encoder
  * boundary — the cost that matters (no Python, no UDF registry) is
  * avoided. */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val ranks: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  override def prettyName: String = "bpe_encode"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got " + child.dataType.simpleString)

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = mutable.ArrayBuffer.empty[UTF8String]
    text.split(' ').foreach { w =>
      BpeAlgos.encodeWord(w, ranks).foreach(t => out += UTF8String.fromString(t))
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

object BpeEncodeExpr {
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.toCol(BpeEncodeExpr(GraftBridge.toExpr(text), merges))
  }
}
