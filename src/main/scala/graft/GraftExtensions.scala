package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.expr.{CosineSimilarity, DotProduct, TokenGramHashes}

/** SparkSessionExtensions hook: registers the engine's native functions
  * for SQL use. Attach with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`; then
  * `SELECT cosine_sim(a, b)` works in plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "cosine_sim(a, b) takes two array<double> arguments")
        CosineSimilarity(args.head, args(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "dot_product(a, b) takes two array<double> arguments")
        DotProduct(args.head, args(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("token_gram_hashes"),
      new ExpressionInfo(classOf[TokenGramHashes].getName, "token_gram_hashes"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2,
          "token_gram_hashes(tokens, k) takes an array<string> and a literal int")
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"token_gram_hashes k must be a literal int, got $other")
        }
        TokenGramHashes(args.head, k)
      }))
  }
}
