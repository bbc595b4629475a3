package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSim, DotProduct, HammingDist, JaccardSorted, SqDist}

/** SparkSessionExtensions installer — the (c)-tier integration surface
  * from the build brief: makes the library's native Catalyst expressions
  * first-class SQL functions, so a session started with
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * (or `withExtensions(new GraftExtensions)`) can call them from SQL:
  *
  * {{{
  *   SELECT cosine_sim(a.embedding, b.embedding) FROM ...
  *   SELECT jaccard_sorted(x.shs, y.shs) FROM ...
  * }}}
  *
  * Registration goes through `injectFunction`, so the functions resolve
  * in every downstream view/subquery and participate in whole-stage
  * codegen exactly like built-ins — no UDF registry, no boxing.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_sim takes exactly 2 arguments")
        CosineSim(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_product takes exactly 2 arguments")
        DotProduct(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("jaccard_sorted"),
      new ExpressionInfo(classOf[JaccardSorted].getName, "jaccard_sorted"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "jaccard_sorted takes exactly 2 arguments")
        JaccardSorted(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("hamming_dist"),
      new ExpressionInfo(classOf[HammingDist].getName, "hamming_dist"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "hamming_dist takes exactly 2 arguments")
        HammingDist(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("sq_dist"),
      new ExpressionInfo(classOf[SqDist].getName, "sq_dist"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "sq_dist takes exactly 2 arguments")
        SqDist(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("haversine_km"),
      new ExpressionInfo(graft.functions.Geo.getClass.getName, "haversine_km"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          "haversine_km takes (lat1, lon1, lat2, lon2) degrees")
        graft.functions.Geo.haversineKmExpr(children(0), children(1),
          children(2), children(3))
      }))
    // whole-operator extension: plans graft.plans.AsOfJoinNode (the
    // native as-of join) — sessions built without the extensions get the
    // same strategy installed at call time via bridge.addStrategy
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // SQL UPDATE / MERGE INTO over graft-manifest tables → the
    // format's copy-on-write primitives (round 10, r9-VERDICT task 2)
    ext.injectPlannerStrategy(_ => graft.plans.ManifestDmlStrategy)
    // SQL maintenance statements (round 11, r10-VERDICT task 5):
    // OPTIMIZE [ZORDER BY] / VACUUM / DESCRIBE HISTORY on manifest
    // tables; everything else delegates to the stock parser verbatim
    ext.injectParser((_, delegate) =>
      new graft.plans.GraftSqlParser(delegate))
    // optimizer-rule extension: exact self-similarity constant fold
    ext.injectOptimizerRule(_ => graft.plans.SelfSimilarityFold)
  }
}
