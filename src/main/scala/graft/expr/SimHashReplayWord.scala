package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the REPLAYABLE SimHash per-token 64-bit
  * vote word — `Dedup.simhashReplayable`'s draw — as one codegen'd JVM
  * loop instead of a 64-subexpression Catalyst tree.
  *
  * Arithmetic is BIT-IDENTICAL to the expression form it replaces (and
  * to the DuckDB replay CTEs, which are the contract):
  *
  *   kr     = fold over code points: h ← (h·257 + cp) mod p,  p = 1e9+7
  *            (the [[graft.ext.TextStats.rollingHash]] fold; DuckDB
  *            mirrors with ascii(substring(t, c, 1)) — code points)
  *   bit j  = ((kr · A_j) mod p) > p/2,  A_j = (2654435761·(j+1)) mod p
  *   word   = Σ bit_j · 2^j
  *
  * kr < p and A_j < p keep kr·A_j < 2^63 — the same ANSI-safety bound
  * the expression form documented. Empty token → kr = 0 (the
  * split("","") → ascii("") = 0 convention, [[WinnowedMins]] note).
  *
  * Why native (round 14): q_simhash_docs' promotion ran this draw over
  * the full corpus and the Catalyst tree cost ~15 µs/token — 64 ×
  * [multiply, pmod, compare, shiftleft, or] plus a split-to-char-array
  * rolling-hash fold per token. One fused loop is ~100× cheaper and
  * keeps the projection inside whole-stage codegen. */
case class SimHashReplayWord(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_replay_word needs a string input, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    SimHashReplayWord.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.SimHashReplayWord.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashReplayWord {
  private val P = 1000000007L

  /** A_j table, j = 0..63: (2654435761·(j+1)) mod p — the exact per-bit
    * multipliers of the expression form. */
  private val A: Array[Long] =
    Array.tabulate(64)(j => 2654435761L * (j + 1) % P)

  /** The fused draw. Public static so generated code can call it. The kr
    * stage is [[KarpRabinHash.compute]] — the single source of the fold
    * since its own r14 fusion. */
  def compute(tok: UTF8String): Long = {
    val kr = KarpRabinHash.compute(tok)
    var word = 0L
    var j = 0
    while (j < 64) {
      if (kr * A(j) % P > P / 2) word |= 1L << j
      j += 1
    }
    word
  }

  /** Column API. */
  def simhashReplayWord(tok: Column): Column =
    Bridge.column(SimHashReplayWord(Bridge.expression(tok)))
}
