package graft

import java.nio.file.Files

import graft.operators.ManifestTable
import graft.plans.ManifestDmlStrategy
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.util.QueryExecutionListener

/** Round-12 wave 169 — r11-VERDICT task 6: the general SQL MERGE's
  * row algebra decomposes into a BROADCASTABLE left-outer + anti-join
  * union when no NOT MATCHED BY SOURCE clause exists (a full-outer
  * join can never broadcast in Spark — round 11 paid a sort-merge
  * join even for tiny sources). Claims proven here:
  *
  *  - a small-source MERGE executes a BroadcastHashJoin and no
  *    full-outer join anywhere in its staging plans
  *  - an NMBS MERGE keeps the full-outer (definitionally full-table)
  *  - row results are identical to the full-outer algebra across
  *    UPDATE/DELETE/INSERT clause mixes, NULL source keys included
  */
class Wave169Spec extends SparkSpec {

  private def withPlans[A](body: => A): (A, Seq[String]) = {
    val plans = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val l = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution,
          d: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(f: String, qe: QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      val a = body
      // listener delivery is async; poll briefly for the write plan
      val deadline = System.currentTimeMillis() + 10000
      while (System.currentTimeMillis() < deadline &&
        !scala.jdk.CollectionConverters.IterableHasAsScala(plans)
          .asScala.exists(_.contains("Join"))) Thread.sleep(100)
      (a, scala.jdk.CollectionConverters.IterableHasAsScala(plans)
        .asScala.toSeq)
    } finally spark.listenerManager.unregister(l)
  }

  private def freshCatalog(tag: String): (String, java.nio.file.Path) = {
    val cat = s"w169$tag"
    val wh = Files.createTempDirectory(s"graft_w169_$tag")
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    bridge.addStrategy(spark, ManifestDmlStrategy)
    (cat, wh)
  }

  test("a small-source no-NMBS MERGE broadcasts; rows exact " +
    "(update + delete + insert + NULL source keys)") {
    val (cat, wh) = freshCatalog("bc")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsColumns' = 'k')")
    spark.range(0, 2000).selectExpr("id AS k", "id AS v")
      .repartitionByRange(4, col("k"))
      .createOrReplaceTempView("w169_t_src")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM w169_t_src")
    // source: 10 updates, 5 deletes, 5 inserts, 1 NULL key (insert)
    spark.sql(
      """SELECT id AS k, id * 100 AS sv FROM range(0, 10)
        |UNION ALL SELECT id, 0 FROM range(100, 105)
        |UNION ALL SELECT id + 10000, id FROM range(0, 5)
        |UNION ALL SELECT CAST(NULL AS BIGINT), 777""".stripMargin)
      .createOrReplaceTempView("w169_src")
    val (_, plans) = withPlans {
      spark.sql(
        s"""MERGE INTO $cat.t t USING w169_src s ON t.k = s.k
           |WHEN MATCHED AND s.sv = 0 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET v = s.sv
           |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.sv)"""
          .stripMargin)
    }
    val joined = plans.filter(_.contains("Join"))
    assert(joined.exists(_.contains("BroadcastHashJoin")),
      s"small source must broadcast; join plans:\n${joined.mkString("\n---\n")}")
    assert(!joined.exists(_.contains("FullOuter")),
      "no-NMBS merge must not plan a full-outer join")
    // row exactness
    val got = spark.sql(s"SELECT k, v FROM $cat.t ORDER BY k NULLS LAST")
      .collect()
    // deletes: keys 100..104 AND key 0 (its sv = 0*100 = 0, and the
    // DELETE clause wins first) = 6; inserts: 5 shifted + 1 NULL key
    assert(got.length == 2000 - 6 + 5 + 1, s"rows ${got.length}")
    assert(!got.exists(r => !r.isNullAt(0) && r.getLong(0) == 0L),
      "k=0 matches the sv=0 DELETE clause first")
    assert(got.filter(r => !r.isNullAt(0) && r.getLong(0) < 10)
      .forall(r => r.getLong(1) == r.getLong(0) * 100),
      "updates must land")
    assert(!got.exists(r => !r.isNullAt(0) && r.getLong(0) >= 100 &&
      r.getLong(0) < 105), "deletes must land")
    assert(got.count(r => !r.isNullAt(0) && r.getLong(0) >= 10000) == 5,
      "inserts must land")
    assert(got.count(_.isNullAt(0)) == 1 &&
      got.find(_.isNullAt(0)).get.getLong(1) == 777,
      "a NULL source key inserts (matches nothing)")
  }

  test("an NMBS MERGE keeps the full-outer join") {
    val (cat, _) = freshCatalog("fo")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsColumns' = 'k')")
    spark.range(0, 400).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("w169_fo_t")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM w169_fo_t")
    spark.range(0, 100).selectExpr("id AS k", "id * 2 AS sv")
      .createOrReplaceTempView("w169_fo_src")
    val (_, plans) = withPlans {
      spark.sql(
        s"""MERGE INTO $cat.t t USING w169_fo_src s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET v = s.sv
           |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    }
    assert(plans.exists(_.contains("FullOuter")),
      s"NMBS must keep the full outer:\n${plans.filter(_.contains("Join"))
        .mkString("\n---\n")}")
    val got = spark.sql(s"SELECT k, v FROM $cat.t ORDER BY k").collect()
    assert(got.length == 100 &&
      got.forall(r => r.getLong(1) == r.getLong(0) * 2),
      "sync-to-source state must land")
  }
}
