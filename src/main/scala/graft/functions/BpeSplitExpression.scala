package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.BpeMerges

/** Codegen'd byte-pair-encoding segmentation (`bpe_split(word)`) — the
  * tokenizer kernel of an LLM data pipeline as a native Expression: one
  * word in, its subword array out, running inside whole-stage codegen
  * with no encoder round-trip.
  *
  * Contract (deterministic, engine-replayable): start from the word's
  * characters; repeatedly merge the LEFTMOST occurrence of the
  * LOWEST-RANK adjacent pair in [[BpeMerges]]; stop when no adjacent
  * pair is in the table. One merge per step makes the recurrence
  * directly replayable as a recursive CTE (the q-entry oracle) — the
  * batch "merge all occurrences of the best pair" formulation would
  * force the replay to emulate the sweep's overlap rule too.
  *
  * ASCII-oriented: indexing is per Java char, which equals code points
  * on the ASCII vocabularies the oracled surface filters to (the q136
  * lesson applies to any cross-engine string indexing).
  */
case class BpeSplitExpression(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  import org.apache.spark.sql.types._

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_split expects string, got ${other.simpleString}")
    }

  override protected def nullSafeEval(s: Any): Any =
    BpeSplitExpression.split(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.BpeSplitExpression.split(" +
        s"$s.toString());")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object BpeSplitExpression {

  /** The merge loop. O(len²) worst case over a bounded word length —
    * scan-stage per-row work, trivially parallel.
    */
  def split(word: String): ArrayData = {
    val syms = scala.collection.mutable.ArrayBuffer.empty[String]
    word.foreach(c => syms += c.toString)
    val none = Int.MaxValue
    var done = syms.length <= 1
    while (!done) {
      var best = none
      var at = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = BpeMerges.rank.getOrElse(syms(i) + "|" + syms(i + 1), none)
        if (r < best) { best = r; at = i } // strict < keeps the leftmost
        i += 1
      }
      if (at < 0) done = true
      else {
        syms(at) = syms(at) + syms(at + 1)
        syms.remove(at + 1)
        if (syms.length <= 1) done = true
      }
    }
    new GenericArrayData(
      syms.map(s => UTF8String.fromString(s): Any).toArray)
  }
}
