package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: sliding k-token-gram 64-bit FNV-1a hashes
  * of an `array<string>` column — the decontamination gram kernel
  * (`TextStats.tokenGramHashRows`) as a codegen'd expression instead of a
  * Scala UDF, so the corpus gram stream stays inside whole-stage codegen
  * (no serializer boundary, no per-row `Seq[String]` materialization).
  *
  * Semantics: for n tokens and n ≥ k, emits n−k+1 hashes; fewer than k
  * tokens emit an EMPTY array (short docs produce no grams — the
  * contamination operators' documented exclusion). Each gram hash folds
  * the UTF-8 bytes of its k tokens with a 0x1f separator byte folded
  * after each token, so token-boundary shifts ("ab","c" vs "a","bc")
  * hash differently. A null token element contributes zero bytes (plus
  * the separator) rather than nulling the row — tokenizers in this
  * engine never produce null elements, but an expression must not crash
  * if one appears. Gram identity only needs SELF-consistency between the
  * corpus and benchmark sides (both run this expression); the driver
  * oracle replays membership with raw string grams.
  */
case class TokenGramHashes(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val typeOk = child.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (!typeOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_gram_hashes needs an array<string> input, got ${child.dataType}")
    else if (k < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_gram_hashes needs k >= 1, got $k")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    // pre-fetch token bytes once — each token participates in up to k grams
    val toks = new Array[Array[Byte]](n)
    var t = 0
    while (t < n) {
      toks(t) =
        if (arr.isNullAt(t)) Array.empty[Byte]
        else arr.getUTF8String(t).getBytes
      t += 1
    }
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = TokenGramHashes.FnvOffset
      var j = 0
      while (j < k) {
        val b = toks(i + j)
        var c = 0
        while (c < b.length) { h ^= (b(c) & 0xff).toLong; h *= TokenGramHashes.FnvPrime; c += 1 }
        h ^= 0x1fL
        h *= TokenGramHashes.FnvPrime
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val toks = ctx.freshName("toks")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cc = ctx.freshName("cc")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      s"""
         |int $n = $c.numElements();
         |int $m = $n - $k + 1;
         |if ($m <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  byte[][] $toks = new byte[$n][];
         |  for (int $t = 0; $t < $n; $t++) {
         |    $toks[$t] = $c.isNullAt($t)
         |      ? new byte[0] : $c.getUTF8String($t).getBytes();
         |  }
         |  long[] $out = new long[$m];
         |  for (int $i = 0; $i < $m; $i++) {
         |    long $h = ${TokenGramHashes.FnvOffset}L;
         |    for (int $j = 0; $j < $k; $j++) {
         |      byte[] $b = $toks[$i + $j];
         |      for (int $cc = 0; $cc < $b.length; $cc++) {
         |        $h ^= (long) ($b[$cc] & 0xff);
         |        $h *= ${TokenGramHashes.FnvPrime}L;
         |      }
         |      $h ^= 0x1fL;
         |      $h *= ${TokenGramHashes.FnvPrime}L;
         |    }
         |    $out[$i] = $h;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenGramHashes {
  private[expr] val FnvOffset = 0xcbf29ce484222325L
  private[expr] val FnvPrime = 0x100000001b3L

  /** Column API: sliding k-token-gram FNV-1a hashes of an `array<string>`
    * column. */
  def tokenGramHashes(tokens: Column, k: Int): Column =
    Bridge.column(TokenGramHashes(Bridge.expression(tokens), k))
}
