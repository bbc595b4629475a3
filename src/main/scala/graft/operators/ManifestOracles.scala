package graft.operators

/** DuckDB oracle SQL for every [[ManifestOps]] declared query
  * (round-10 split companion of ManifestQueries.scala — the SQL
  * restatements are bulky and review independently of the Spark-side
  * lifecycles). Keys mirror `ManifestOps.queries` exactly; the
  * oracles read the ORIGINAL parquet tables, so equality through a
  * manifest lifecycle IS the assertion.
  */
private[operators] object ManifestOracles {

  val map: Map[String, String] = Map(
    "source_manifest_v2api" ->
      // pinned v1 is the source table verbatim; the band re-filters
      // exactly (file skip asserted by Wave142Spec)
      """WITH b AS (SELECT max(o_orderkey) // 6 AS lo,
        |    max(o_orderkey) // 3 AS hi FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_orderkey >= lo AND o_orderkey <= hi
        |ORDER BY o_orderkey""".stripMargin,

    "sink_manifest_v2sql" ->
      // both INSERT halves together are the whole table; the band
      // re-filters exactly
      """WITH b AS (SELECT max(o_orderkey) // 8 AS lo,
        |    max(o_orderkey) // 4 AS hi FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_orderkey >= lo AND o_orderkey <= hi
        |ORDER BY o_orderkey""".stripMargin,

    "source_manifest_hidden_partition" ->
      // the bucket-derived file skip is a superset admit; the exact
      // filter re-applies, so the result is the plain equality
      """WITH b AS (SELECT min(o_custkey) AS ck FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_custkey = ck
        |ORDER BY o_orderkey""".stripMargin,

    "sink_manifest_hidden_sql" ->
      // both INSERT halves together are the whole table; the bucket
      // skip is a superset admit, the equality re-filters exactly
      """WITH b AS (SELECT min(o_custkey) AS ck FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_custkey = ck
        |ORDER BY o_orderkey""".stripMargin,

    "source_manifest_hidden_days" ->
      // the derived day band is a superset admit; the exact filter
      // re-applies, so the result is the plain one-day predicate
      """WITH b AS (SELECT ((min(epoch_us(ts)) // 86400000000) + 3)
        |    * 86400000000 AS lo FROM events)
        |SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
        |  value
        |FROM events CROSS JOIN b
        |WHERE epoch_us(ts) >= lo
        |  AND epoch_us(ts) <= lo + 86400000000 - 1
        |ORDER BY event_id""".stripMargin,

    "source_manifest_mor_positional" ->
      // originals all survive; duplicates survive only outside %3
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 3 <> 0
        |ORDER BY o_orderkey""".stripMargin,

    "source_manifest_mor_positional_native" ->
      // source_manifest_mor_positional's oracle verbatim: the native
      // per-file row counting must subtract the exact listed rows
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 3 <> 0
        |ORDER BY o_orderkey""".stripMargin,

    "manifest_sql_merge" ->
      // manifest_upsert's oracle verbatim — the SQL MERGE must land
      // the exact state the programmatic upsert lands
      """WITH b AS (SELECT max(o_orderkey) AS m,
        |    max(o_orderkey) // 4 AS q FROM orders),
        |merged AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 17 = 0 AND o_orderkey < q
        |         THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN o_orderkey % 17 = 0 AND o_orderkey < q
        |         THEN o_totalprice + 5.0 ELSE o_totalprice END
        |      AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders CROSS JOIN b
        |  UNION ALL
        |  SELECT o_orderkey + m, o_custkey, 'N', o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders CROSS JOIN b
        |  WHERE o_orderkey % 23 = 0 AND o_orderkey > 0)
        |SELECT * FROM merged ORDER BY o_orderkey""".stripMargin,

    "source_manifest_bloom" ->
      // the same 5 deterministic probe keys, restated: the
      // agg(min,max) ladder lo + floor(i*(hi-lo)/5) (round 13 — the
      // old shape ranked every distinct custkey); bloom admission is
      // a superset, the equality re-filters exactly
      """WITH b AS (
        |  SELECT min(o_custkey) AS lo, max(o_custkey) AS hi FROM orders),
        |probes AS (
        |  SELECT DISTINCT lo + (i * (hi - lo)) // 5 AS ck
        |  FROM b, (SELECT unnest([0,1,2,3,4]) AS i))
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders JOIN probes ON o_custkey = ck
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "source_manifest_bloom_sql" ->
      // identical algebra to source_manifest_bloom: the registered
      // source's bloom-refined admission is a superset admit, the
      // pushed equality re-filters exactly
      """WITH b AS (
        |  SELECT min(o_custkey) AS lo, max(o_custkey) AS hi FROM orders),
        |probes AS (
        |  SELECT DISTINCT lo + (i * (hi - lo)) // 5 AS ck
        |  FROM b, (SELECT unnest([0,1,2,3,4]) AS i))
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders JOIN probes ON o_custkey = ck
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "sink_manifest_evolve_insert" ->
      // pre-evolution rows null-fill the added column; post-evolution
      // rows carry it
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  CASE WHEN o_orderkey % 2 = 1 THEN o_orderkey % 10
        |       ELSE NULL END AS o_bucket
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "manifest_multi_table_txn" ->
      // table A = whole orders (even base + odd txn half); table B =
      // the top-half audit copy — both landed by ONE commitTxn
      """WITH b AS (SELECT max(o_orderkey) // 2 AS h FROM orders),
        |u AS (
        |  SELECT 'orders' AS src, o_orderkey, o_custkey,
        |    o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders
        |  UNION ALL
        |  SELECT 'audit' AS src, o_orderkey, o_custkey,
        |    o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders CROSS JOIN b WHERE o_orderkey > h)
        |SELECT * FROM u ORDER BY src, o_orderkey""".stripMargin,

    "manifest_txn_cow" ->
      // table A = orders with the bottom-quarter band re-priced +2.0
      // (the CoW half); table B = the band's pre-image audit copy —
      // both landed by ONE commitTxnCow
      """WITH b AS (SELECT max(o_orderkey) // 4 AS q FROM orders),
        |u AS (
        |  SELECT 'orders' AS src, o_orderkey, o_custkey,
        |    o_orderstatus,
        |    CASE WHEN o_orderkey < q THEN o_totalprice + 2.0
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders CROSS JOIN b
        |  UNION ALL
        |  SELECT 'audit' AS src, o_orderkey, o_custkey,
        |    o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders CROSS JOIN b WHERE o_orderkey < q)
        |SELECT * FROM u ORDER BY src, o_orderkey""".stripMargin,

    "source_manifest_pruned_binary" ->
      // the digest restated: DuckDB's md5 is lowercase hex (upper for
      // the output compare), unhex → BLOB compares bytewise — the
      // same order Spark's BinaryType and the recorded bounds use
      """SELECT doc_id, n_chars, upper(md5(text)) AS blob_hex
        |FROM documents
        |WHERE unhex(md5(text)) < '\x28'::BLOB
        |ORDER BY doc_id""".stripMargin,

    "sink_manifest_ctas" ->
      // the RTAS contents replaced the CTAS half entirely
      """SELECT o_orderkey, o_custkey, o_totalprice + 1.0 AS o_total
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "manifest_sql_alter" ->
      // evens predate the evolution (flag null-fills), odds carry it;
      // the rename is metadata-only so both halves read as o_price
      """SELECT o_orderkey, o_custkey, o_totalprice AS o_price,
        |  CASE WHEN o_orderkey % 2 = 1 THEN o_orderkey % 10
        |       ELSE NULL END AS o_flag
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "manifest_evolve_partition" ->
      // both layout generations hold the same logical rows; the
      // equality re-filters the pruned superset exactly
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders
        |WHERE o_custkey = (SELECT min(o_custkey) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "manifest_sql_widen" ->
      // evens predate the widening (written as INT, upcast at read);
      // odds carry post-widening values beyond the INT range
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 2 = 0
        |       THEN CAST(o_orderkey % 100000 AS BIGINT)
        |       ELSE o_orderkey + 3000000000 END AS o_qty
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "manifest_sql_constraint" ->
      // one accepted batch + one refused batch = the source, exactly
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "manifest_sql_tag" ->
      // the tag pins the PRE-delete snapshot — the full source table
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "sink_manifest_sorted" ->
      // the sort-clustered write is a relayout of the same physics
      """WITH b AS (SELECT max(o_orderkey) // 2 AS lo,
        |    max(o_orderkey) // 2 + max(o_orderkey) // 8 AS hi
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_orderkey >= lo AND o_orderkey <= hi
        |ORDER BY o_orderkey""".stripMargin,

    "manifest_optimize_layout" ->
      // fragment + pack is a relayout of the same physics
      """WITH b AS (SELECT max(o_orderkey) // 8 AS lo,
        |    max(o_orderkey) // 4 AS hi FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_orderkey >= lo AND o_orderkey <= hi
        |ORDER BY o_orderkey""".stripMargin,

    "manifest_meta_history" ->
      // the replaceWhere lifecycle's deterministic commit log
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 'checkpoint', ''),
        |  (CAST(2 AS BIGINT), 'delta', ''),
        |  (CAST(3 AS BIGINT), 'delta', 'replacewhere=v2'))
        |  AS t(version, kind, operation)
        |ORDER BY version""".stripMargin,

    "manifest_meta_partitions" ->
      // the layout's recorded value set must equal the data's
      // distinct days — metadata vs raw-data cross-check
      """SELECT DISTINCT CAST(epoch_us(ts) // 86400000000 AS BIGINT)
        |  AS value
        |FROM events ORDER BY value""".stripMargin,

    "manifest_dynamic_overwrite" ->
      // days 3-5 (relative to the fixture's first day) were replaced
      // by their doubled-value copies; every other day is verbatim
      """WITH e AS (SELECT event_id,
        |    (epoch_us(ts) // 86400000000) * 86400000000 AS day_us,
        |    value FROM events),
        |  b AS (SELECT min(day_us) AS d0 FROM e)
        |SELECT event_id, day_us, value FROM e CROSS JOIN b
        |WHERE day_us < d0 + 3 * 86400000000
        |   OR day_us >= d0 + 6 * 86400000000
        |UNION ALL
        |SELECT event_id, day_us, value * 2 AS value
        |FROM e CROSS JOIN b
        |WHERE day_us >= d0 + 3 * 86400000000
        |  AND day_us < d0 + 6 * 86400000000
        |ORDER BY event_id""".stripMargin,

    "sink_manifest_dist" ->
      // the clustered write is a relayout of the same physics
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "manifest_replace_where" ->
      // outside the band: source rows verbatim; inside: re-priced,
      // %3 keys dropped — the region was REPLACED, not updated
      """WITH b AS (SELECT max(o_orderkey) // 4 AS lo,
        |    max(o_orderkey) // 2 AS hi FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_orderkey < lo OR o_orderkey >= hi
        |UNION ALL
        |SELECT o_orderkey, o_custkey, 'R' AS o_orderstatus,
        |  o_totalprice + 1000.0 AS o_totalprice, o_orderdate,
        |  o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_orderkey >= lo AND o_orderkey < hi
        |  AND o_orderkey % 3 <> 0
        |ORDER BY o_orderkey""".stripMargin,

    "join_manifest_spj_days" ->
      // the day-aligned fact⋈dim restated as plain derivations: fact =
      // every event with its UTC-day-floored epoch-µs key, dim = the
      // per-day count
      """WITH f AS (SELECT event_id,
        |    (epoch_us(ts) // 86400000000) * 86400000000 AS day_us,
        |    value FROM events),
        |  d AS (SELECT day_us, count(*) AS day_n FROM f GROUP BY day_us)
        |SELECT f.day_us, count(*) AS n,
        |  CAST(round(sum(CAST(f.value AS DECIMAL(18,6))), 4)
        |    AS DOUBLE) AS sumv,
        |  max(d.day_n) AS day_n
        |FROM f JOIN d ON f.day_us = d.day_us
        |GROUP BY f.day_us
        |ORDER BY f.day_us""".stripMargin,

    "join_manifest_spj" ->
      // the co-located join restated as a plain join+aggregate
      """SELECT c_mktsegment,
        |  count(*) AS n,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 4)
        |    AS DOUBLE) AS rev
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "manifest_sql_compact_mor" ->
      // the compaction materializes the subtracted view exactly
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 13 <> 0
        |ORDER BY o_orderkey""".stripMargin,

    "manifest_sql_restore" ->
      // the restore undoes the DELETE completely — the read-back IS
      // the source table
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "manifest_sql_call" ->
      // snapshot replication copies the source's latest logical view
      // verbatim — the replica read-back IS the source table
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "manifest_sql_maintenance" ->
      // optimize/zorder/vacuum move rows between files, never change
      // them — the read-back IS the source table
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "source_manifest_runtime_filter" ->
      // the runtime prune is a superset admit; the join re-applies
      // exactly, so the result is the plain star join
      """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, c.c_acctbal
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_acctbal >= 9000.0
        |ORDER BY o.o_orderkey""".stripMargin,

    "source_manifest_pruned_double" ->
      // the double-band stats prune is a superset admit; the exact
      // filter re-applies, so the result is the plain band filter
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders
        |WHERE o_totalprice >= 50000.0 AND o_totalprice <= 80000.0
        |ORDER BY o_orderkey, o_totalprice""".stripMargin,

    "source_manifest_pruned_decimal" ->
      // the decimal band restated; the cast to DECIMAL(12,2) rounds
      // identically in both engines (binary doubles never land on
      // exact .xx5 ties)
      """SELECT o_orderkey, o_custkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE)
        |    AS o_price
        |FROM orders
        |WHERE CAST(o_totalprice AS DECIMAL(12,2)) >= 50000.00
        |  AND CAST(o_totalprice AS DECIMAL(12,2)) <= 80000.00
        |ORDER BY o_orderkey""".stripMargin,

    "source_manifest_pruned_ts" ->
      // the µs-timestamp band restated zone-free on epoch micros
      """WITH b AS (SELECT ((min(epoch_us(ts)) // 86400000000) + 3)
        |    * 86400000000 AS lo FROM events)
        |SELECT event_id, user_id, event_type, value,
        |  epoch_us(ts) AS ts_us
        |FROM events CROSS JOIN b
        |WHERE epoch_us(ts) >= lo
        |  AND epoch_us(ts) <= lo + 86400000000 - 1
        |ORDER BY event_id""".stripMargin,

    "manifest_sql_merge_mixed" ->
      // the mixed-clause row algebra restated: matched %13 bottom-half
      // keys take the conditional-update image (source price = orig+10,
      // updated = source+1, status 'M') when the source image exceeds
      // the threshold, are DELETED otherwise; shifted %29 keys insert
      // only when even (the conditional INSERT); everything else is
      // untouched. Double adds restated with the same operation order.
      """WITH b AS (SELECT max(o_orderkey) AS m,
        |    max(o_orderkey) // 2 AS h FROM orders),
        |merged AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 13 = 0 AND o_orderkey < h
        |              AND (o_totalprice + 10.0) > 50000.0
        |         THEN 'M' ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN o_orderkey % 13 = 0 AND o_orderkey < h
        |              AND (o_totalprice + 10.0) > 50000.0
        |         THEN (o_totalprice + 10.0) + 1.0
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders CROSS JOIN b
        |  WHERE NOT (o_orderkey % 13 = 0 AND o_orderkey < h
        |             AND NOT ((o_totalprice + 10.0) > 50000.0))
        |  UNION ALL
        |  SELECT o_orderkey + m, o_custkey, o_orderstatus,
        |    o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders CROSS JOIN b
        |  WHERE o_orderkey % 29 = 0 AND o_orderkey > 0
        |    AND (o_orderkey + m) % 2 = 0)
        |SELECT * FROM merged ORDER BY o_orderkey""".stripMargin,

    "manifest_sql_merge_nmbs" ->
      // sync-to-source: the post-MERGE table IS the bottom-quarter
      // band with the source price image
      """WITH b AS (SELECT max(o_orderkey) // 4 AS q FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus,
        |  o_totalprice + 2.0 AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_orderkey < q
        |ORDER BY o_orderkey""".stripMargin,

    "manifest_sql_update_delete" ->
      // the UPDATE's CASE image minus the DELETE's band — restated
      // from the source table
      """WITH b AS (SELECT max(o_orderkey) // 4 AS q,
        |    3 * (max(o_orderkey) // 4) AS h FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 5 = 0 AND o_orderkey < q
        |       THEN o_totalprice + 1.0 ELSE o_totalprice END
        |    AS o_totalprice,
        |  o_orderdate,
        |  CASE WHEN o_orderkey % 5 = 0 AND o_orderkey < q
        |       THEN 'X-SQL' ELSE o_orderpriority END AS o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE NOT (o_orderkey >= h AND o_orderstatus = 'F')
        |ORDER BY o_orderkey""".stripMargin,

    "source_manifest" ->
      // oracle reads the ORIGINAL parquet — equality across the
      // append + compaction lifecycle IS the assertion
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "source_manifest_timetravel" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 2 = 0
        |ORDER BY o_orderkey""".stripMargin,

    "source_manifest_merge" ->
      // the merged state restated from the source table: same integer
      // band bounds (max//4, max//2), same one IEEE price add, same
      // band-scoped delete predicate
      """WITH b AS (SELECT max(o_orderkey) // 4 AS lo,
        |    max(o_orderkey) // 2 AS hi FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey >= lo AND o_orderkey < hi
        |       THEN o_totalprice + 1.0 ELSE o_totalprice END
        |    AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE NOT (o_orderkey >= lo AND o_orderkey < hi
        |           AND o_orderkey % 19 = 0)
        |ORDER BY o_orderkey""".stripMargin,

    "source_manifest_incremental" ->
      // v2's appended files carry exactly the odd-key batch
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 2 = 1
        |ORDER BY o_orderkey""".stripMargin,

    "source_manifest_pruned" ->
      // the prune band lies below the merge band → rows unchanged; the
      // file-skip claim itself is Wave91Spec's plan-level assertion
      """WITH b AS (SELECT max(o_orderkey) // 10 AS lo,
        |    max(o_orderkey) // 5 AS hi FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_orderkey >= lo AND o_orderkey <= hi
        |ORDER BY o_orderkey""".stripMargin,

    "source_manifest_pruned2" ->
      // both bands restated from the source table; the file-skip claim
      // is Wave108Spec's plan-level assertion
      """WITH b AS (SELECT max(o_orderkey) // 10 AS lo,
        |    max(o_orderkey) // 5 AS hi,
        |    (SELECT max(o_custkey) // 2 FROM orders) AS hic
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_orderkey >= lo AND o_orderkey <= hi
        |  AND o_custkey >= 0 AND o_custkey <= hic
        |ORDER BY o_orderkey""".stripMargin,

    "source_manifest_pruned_str" ->
      // the string band restated on the source table (both engines
      // compare pure-ASCII brands in binary order); the file-skip
      // claim itself is Wave132Spec's plan-level assertion
      """SELECT p_partkey, p_name, p_brand, p_type, p_size,
        |  p_retailprice
        |FROM part
        |WHERE p_brand >= 'Brand#12' AND p_brand <= 'Brand#19'
        |ORDER BY p_partkey""".stripMargin,

    "source_manifest_v1api_str" ->
      // the equality restated on the source table; the file-skip claim
      // is Wave135Spec's plan-level assertion
      """SELECT p_partkey, p_name, p_brand, p_type, p_size,
        |  p_retailprice
        |FROM part WHERE p_brand = 'Brand#21'
        |ORDER BY p_partkey""".stripMargin,

    "manifest_upsert" ->
      // the merged state restated from the source table: matched keys
      // (%17, bottom quarter) carry the replaced image, everything
      // else survives, and the %23 insert images land above max
      """WITH b AS (SELECT max(o_orderkey) AS m,
        |    max(o_orderkey) // 4 AS q FROM orders),
        |merged AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 17 = 0 AND o_orderkey < q
        |         THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN o_orderkey % 17 = 0 AND o_orderkey < q
        |         THEN o_totalprice + 5.0 ELSE o_totalprice END
        |      AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders CROSS JOIN b
        |  UNION ALL
        |  SELECT o_orderkey + m, o_custkey, 'N', o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders CROSS JOIN b
        |  WHERE o_orderkey % 23 = 0 AND o_orderkey > 0)
        |SELECT * FROM merged ORDER BY o_orderkey""".stripMargin,

    "source_manifest_v1api" ->
      // pinned v1 is the source table verbatim; the band re-filters
      // exactly and the file-skip claim is Wave126Spec's assertion
      """WITH b AS (SELECT max(o_orderkey) // 20 AS lo,
        |    max(o_orderkey) // 10 AS hi FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_orderkey >= lo AND o_orderkey <= hi
        |ORDER BY o_orderkey""".stripMargin,

    "sink_manifest_v1api" ->
      // both write halves together are the whole table; the band
      // re-filters exactly
      """WITH b AS (SELECT max(o_orderkey) // 10 AS lo,
        |    max(o_orderkey) // 5 AS hi FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_orderkey >= lo AND o_orderkey <= hi
        |ORDER BY o_orderkey""".stripMargin,

    "source_manifest_zorder" ->
      // both bands restated from the source table; the admitted-file
      // claim is Wave121Spec's plan-level assertion
      """WITH b AS (SELECT max(o_orderkey) // 8 AS lo,
        |    max(o_orderkey) // 4 AS hi,
        |    (SELECT max(o_custkey) // 4 FROM orders) AS hic
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_orderkey >= lo AND o_orderkey <= hi
        |  AND o_custkey >= 0 AND o_custkey <= hic
        |ORDER BY o_orderkey""".stripMargin,

    "source_manifest_schema_evolution" ->
      // even keys predate the ADD COLUMN → null o_orderpriority
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END
        |    AS o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "source_manifest_colmap" ->
      // the three batches restated: pre-rename evens (null priority,
      // price = o_totalprice), odds, and the post-rename shifted %5
      // append (price +1000.0, the same IEEE add on both engines)
      """WITH b AS (SELECT max(o_orderkey) AS m FROM orders)
        |SELECT o_orderkey, o_totalprice AS o_price,
        |  CAST(NULL AS VARCHAR) AS o_orderpriority
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT o_orderkey, o_totalprice AS o_price, o_orderpriority
        |FROM orders WHERE o_orderkey % 2 = 1
        |UNION ALL
        |SELECT o_orderkey + m AS o_orderkey,
        |  o_totalprice + 1000.0 AS o_price, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_orderkey % 5 = 0 AND o_orderkey > 0
        |ORDER BY o_orderkey""".stripMargin,

    "source_manifest_colmap_native" ->
      // source_manifest_colmap's oracle verbatim: the native scan's
      // schema aliasing must land the exact evolved view
      """WITH b AS (SELECT max(o_orderkey) AS m FROM orders)
        |SELECT o_orderkey, o_totalprice AS o_price,
        |  CAST(NULL AS VARCHAR) AS o_orderpriority
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT o_orderkey, o_totalprice AS o_price, o_orderpriority
        |FROM orders WHERE o_orderkey % 2 = 1
        |UNION ALL
        |SELECT o_orderkey + m AS o_orderkey,
        |  o_totalprice + 1000.0 AS o_price, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_orderkey % 5 = 0 AND o_orderkey > 0
        |ORDER BY o_orderkey""".stripMargin,

    "ivm_manifest_delta" ->
      // the refreshed view == the full aggregate over the source (v2's
      // content is the whole table); sums staged in exact decimal
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 4)
        |    AS DOUBLE) AS rev
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "stream_manifest_source" ->
      // the streamed Complete-mode aggregate over the 4-commit chain
      // == the batch aggregate over the whole table (v4's content)
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 4)
        |    AS DOUBLE) AS rev
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "source_manifest_mor" ->
      // the DV subtraction restated from the source table
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 13 <> 0
        |ORDER BY o_orderkey""".stripMargin,

    "source_manifest_mor_native" ->
      // source_manifest_mor's oracle verbatim: the native reader
      // wrapper must land the exact anti-join state
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 13 <> 0
        |ORDER BY o_orderkey""".stripMargin,

    "ivm_manifest_cow_delta" ->
      // the refreshed view == the aggregate over the MERGED state,
      // restated from the source table (same band/delete/price rules
      // as source_manifest_merge)
      """WITH b AS (SELECT max(o_orderkey) // 4 AS lo,
        |    max(o_orderkey) // 2 AS hi FROM orders),
        |m AS (SELECT o_orderpriority,
        |    CASE WHEN o_orderkey >= lo AND o_orderkey < hi
        |         THEN o_totalprice + 1.0 ELSE o_totalprice END AS p
        |  FROM orders CROSS JOIN b
        |  WHERE NOT (o_orderkey >= lo AND o_orderkey < hi
        |             AND o_orderkey % 19 = 0))
        |SELECT o_orderpriority, count(*) AS n,
        |  CAST(round(sum(CAST(p AS DECIMAL(18,6))), 4) AS DOUBLE) AS rev
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    "source_manifest_mor_scoped" ->
      // survivors = everything outside %13, plus the re-inserted
      // %13∧%3 copies (identical source rows in a new file)
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 13 <> 0
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 13 = 0 AND o_orderkey % 3 = 0
        |ORDER BY o_orderkey""".stripMargin,

    "ivm_manifest_cdf" ->
      // the CDF-refreshed view == the full aggregate over the source
      // (v3's content is the whole table); sums staged in exact
      // decimal — same restatement as ivm_manifest_delta, reached
      // through the general log-driven path
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 4)
        |    AS DOUBLE) AS rev
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdf_manifest" ->
      // the merge's change set restated from the source table: every
      // band row emits its pre-image as a delete; surviving band rows
      // (%19 ≠ 0) also emit the post-image (+1.0 price) as an insert
      """WITH b AS (SELECT max(o_orderkey) // 4 AS lo,
        |    max(o_orderkey) // 2 AS hi FROM orders),
        |i AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |    o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders CROSS JOIN b
        |  WHERE o_orderkey >= lo AND o_orderkey < hi)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority, 'delete' AS _change_type
        |FROM i
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus,
        |  o_totalprice + 1.0, o_orderdate, o_orderpriority, 'insert'
        |FROM i WHERE o_orderkey % 19 <> 0
        |ORDER BY o_orderkey, _change_type""".stripMargin,

    "cdf_manifest_mor" ->
      // pure deletes: the DV commit killed the %13 keys
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority, 'delete' AS _change_type
        |FROM orders WHERE o_orderkey % 13 = 0
        |ORDER BY o_orderkey""".stripMargin,

    "manifest_replicate" ->
      // the mirror equals the source's merged state — identical
      // restatement to source_manifest_merge's oracle
      """WITH b AS (SELECT max(o_orderkey) // 4 AS lo,
        |    max(o_orderkey) // 2 AS hi FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey >= lo AND o_orderkey < hi
        |       THEN o_totalprice + 1.0 ELSE o_totalprice END
        |    AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE NOT (o_orderkey >= lo AND o_orderkey < hi
        |           AND o_orderkey % 19 = 0)
        |ORDER BY o_orderkey""".stripMargin,

    "stream_manifest_sink" ->
      // all three replay files land (no watermark on the append sink);
      // equality proves no batch lost, none double-committed
      """SELECT event_id, user_id, event_type, value,
        |  epoch_us(ts) AS ts_us
        |FROM events ORDER BY event_id""".stripMargin,

    "stream_manifest_sink_registered" ->
      // same contract through the registered sink path
      """SELECT event_id, user_id, event_type, value,
        |  epoch_us(ts) AS ts_us
        |FROM events ORDER BY event_id""".stripMargin
  )
}
