package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point. Installable two ways:
  *
  *  1. plugin path — `SparkSession.builder().withExtensions(new
  *     GraftExtensions)` or `spark.sql.extensions=graft.plans.GraftExtensions`
  *     (cluster deployments);
  *  2. runtime path — [[GraftFunctions.register]] on an already-built
  *     session (used by the query catalog, which receives the session
  *     from the harness and cannot assume the plugin was configured).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.definitions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    // whole-operator stack (§2.10(c)): logical TopKPerKey + combine rule
    // + two-phase physical planning
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectOptimizerRule(_ => CombineTopK)
    // rewrite rules over built-in expressions
    ext.injectOptimizerRule(_ => BoundLevenshtein)
  }
}

object GraftFunctions {
  type Builder = Seq[Expression] => Expression

  /** All engine-native functions. */
  val definitions: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))),
    (FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (children: Seq[Expression]) => JaroWinkler(children(0), children(1))),
    (FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      (children: Seq[Expression]) => UnicodeNormalize.fromChildren(children)),
    // Spark ships BloomFilterMightContain (with doGenCode) for its
    // runtime-filter rule but does not register it as a SQL-callable
    // function; surfacing it by name lets the engine's Bloom semi-join
    // probe run as a native codegen'd predicate instead of a closure udf
    (FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))))

  /** Idempotent runtime registration into an existing session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    definitions.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident))
        registry.registerFunction(ident, info, builder)
    }
  }
}
