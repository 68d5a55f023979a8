package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point — the standard deployment hook
  * for the engine's Catalyst extensions, so a cluster can enable them
  * with configuration alone (no code changes):
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * Injects the TopKPerKey planner strategy (the bounded-heap per-key
  * top-k physical operator — [[graft.plans.TopK.perKey]] also
  * self-registers via `experimental.extraStrategies` for programmatic
  * use; double registration is harmless, the planner just sees the
  * same candidate twice) and registers the native expressions as SQL
  * functions, making `spark.sql("SELECT cosine_similarity(a, b)")`
  * and `minhash_array(...)` first-class in pure-SQL pipelines — the
  * same codegen'd expressions the DataFrame API uses, so SQL callers
  * get identical semantics and performance.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litNum(e: Expression, what: String): Long = e match {
    case Literal(v: Number, _) => v.longValue()
    case other =>
      throw new IllegalArgumentException(
        s"$what must be a literal number, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)

    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[graft.functions.CosineSimilarity].getName,
        "cosine_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"cosine_similarity(a, b) takes 2 arguments, got ${args.length}")
        graft.functions.CosineSimilarity(args(0), args(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("count_min"),
      new ExpressionInfo(classOf[graft.functions.CountMinAgg].getName,
        "count_min"),
      (args: Seq[Expression]) => {
        require(args.length == 5,
          "count_min(hashes, depth, width, seed, prime) takes 5 arguments, " +
            s"got ${args.length}")
        graft.functions.CountMinAgg(args(0),
          litNum(args(1), "depth").toInt,
          litNum(args(2), "width").toInt,
          litNum(args(3), "seed"),
          litNum(args(4), "prime")).toAggregateExpression()
      }))

    ext.injectFunction((
      FunctionIdentifier("minhash_array"),
      new ExpressionInfo(classOf[graft.functions.MinHashArray].getName,
        "minhash_array"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "minhash_array(hashes, numHashes, seed, prime) takes 4 arguments, " +
            s"got ${args.length}")
        graft.functions.MinHashArray(args(0),
          litNum(args(1), "numHashes").toInt,
          litNum(args(2), "seed"),
          litNum(args(3), "prime"))
      }))
  }
}
