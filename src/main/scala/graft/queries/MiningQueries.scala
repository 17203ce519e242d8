package graft.queries

import org.apache.spark.sql.functions._
import Q._

/** Round-7 mining plane: association rules, change-point detection,
  * seasonal decomposition — the classical pattern-mining / monitoring
  * passes a warehouse team runs on the stage tables the ingest framework
  * materializes. Every gate keeps the battery's exact-arithmetic
  * discipline (decimal-exact internals, single final IEEE double ops) so
  * the DuckDB oracle replays results bit-for-bit.
  */
object MiningQueries {

  val defs: Map[String, Entry] = Map(

    // D144 — frequent-pair association rules (operators.AssocRules):
    // Apriori item prune (support ≥ 25, broadcast) + deterministic
    // per-basket cap (8) bound the pair self-join BEFORE it happens; pair
    // support ≥ 2 on the uniform catalog. Confidence/lift are single IEEE
    // divisions over exact int64 counts.
    "q_assoc_rules" -> (((spark, dir) => {
      graft.operators.AssocRules.frequentPairs(
        load(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey",
        minItemSupport = 25L, minPairSupport = 2L, maxPerBasket = 8)
        .orderBy("item_a", "item_b")
    }, Some("""
      WITH b AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
                 FROM lineitem),
      n AS (SELECT count(DISTINCT basket) AS n_baskets FROM b),
      s AS (SELECT item, count(*) AS supp FROM b GROUP BY 1),
      f AS (SELECT * FROM s WHERE supp >= 25),
      pb AS (SELECT basket, item, supp,
               row_number() OVER (PARTITION BY basket ORDER BY item) AS rn
             FROM b JOIN f USING (item)),
      pr AS (SELECT basket, item, supp FROM pb WHERE rn <= 8),
      pairs AS (SELECT a.item AS item_a, b2.item AS item_b,
                  a.supp AS supp_a, b2.supp AS supp_b,
                  CAST(count(*) AS BIGINT) AS supp_ab
                FROM pr a JOIN pr b2
                  ON a.basket = b2.basket AND a.item < b2.item
                GROUP BY 1, 2, 3, 4)
      SELECT item_a, item_b, supp_a, supp_b, supp_ab,
             CAST(supp_ab AS DOUBLE) / CAST(supp_a AS DOUBLE)
               AS confidence,
             CAST(supp_ab * n_baskets AS DOUBLE) /
               CAST(supp_a * supp_b AS DOUBLE) AS lift
      FROM pairs CROSS JOIN n
      WHERE supp_ab >= 2
      ORDER BY item_a, item_b"""))),

    // D145 — one-sided CUSUM change-point detection
    // (operators.ChangePoint): the max(0, S+x−μ−k) recursion via its
    // prefix-sum closed form — two windows on ONE per-user partitioning.
    // Slack k=25 (≈σ/2), alarm h=150 (≈3σ); everything n-scaled so the
    // baseline mean never divides.
    "evt_cusum" -> (((spark, dir) => {
      graft.operators.ChangePoint.cusum(
        load(spark, dir, "events"),
        key = "user_id", ord = Seq("ts", "event_id"), value = col("value"),
        slack = BigDecimal("25.00"), h = BigDecimal("150.00"))
        .orderBy("user_id")
    }, Some("""
      WITH e AS (SELECT user_id, epoch_ns(ts) AS t, event_id,
                   CAST("value" AS DECIMAL(18,2)) AS x FROM events),
      k AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n, sum(x) AS s
            FROM e GROUP BY 1),
      d AS (SELECT e.user_id, t, event_id, n,
              n * x - s - n * CAST(25.00 AS DECIMAL(18,2)) AS nd
            FROM e JOIN k USING (user_id)),
      p AS (SELECT user_id, t, event_id, n, sum(nd) OVER w AS p
            FROM d WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      st AS (SELECT user_id, t, n,
               -- no least(): DuckDB's least() over DECIMALs (any width)
               -- silently returns DOUBLE; CASE keeps DECIMAL(38,2) exact
               p - CASE WHEN min(p) OVER w < 0
                        THEN min(p) OVER w
                        ELSE CAST(0 AS DECIMAL(38,2)) END AS stat
             FROM p WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT user_id,
             CAST(sum(CASE WHEN stat > n * CAST(150.00 AS DECIMAL(18,2))
               THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
             CAST(max(stat) AS DOUBLE) / CAST(n AS DOUBLE) AS peak_stat,
             min(CASE WHEN stat > n * CAST(150.00 AS DECIMAL(18,2))
               THEN t END) AS first_alarm
      FROM st GROUP BY user_id, n
      ORDER BY user_id"""))),

    // D146 — classical weekly seasonal decomposition (operators.Seasonal)
    // over the daily value series: centered 7-day moving-average trend,
    // per-day-of-week seasonal means, additive remainder — carried
    // scaled-exact (×7, ×7·n_phase) so only the final per-row divisions
    // are floating point.
    "evt_seasonal" -> (((spark, dir) => {
      val daily = load(spark, dir, "events")
        .groupBy(expr("ts div 86400000000000").as("d"))
        .agg(sum(d18(col("value"))).as("x"))
      graft.operators.Seasonal.decompose(daily, period = 7)
        .orderBy("d")
    }, Some("""
      WITH daily AS (SELECT epoch_ns(ts) // 86400000000000 AS d,
                       sum(CAST("value" AS DECIMAL(18,2))) AS x
                     FROM events GROUP BY 1),
      t AS (SELECT d, d % 7 AS phase, x,
              CAST(count(*) OVER w AS BIGINT) AS win_n,
              sum(x) OVER w AS tsum
            FROM daily WINDOW w AS (ORDER BY d
              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      dt AS (SELECT *, CASE WHEN win_n = 7 THEN 7 * x - tsum END AS det
             FROM t),
      se AS (SELECT phase, sum(det) AS ps, CAST(count(det) AS BIGINT) AS pn
             FROM dt WHERE det IS NOT NULL GROUP BY 1)
      SELECT dt.d, dt.phase, CAST(x AS DOUBLE) AS total,
             CAST(CASE WHEN win_n = 7 THEN tsum END AS DOUBLE) / 7.0
               AS trend,
             CAST(ps AS DOUBLE) / CAST(7 * pn AS DOUBLE) AS seasonal,
             CASE WHEN det IS NOT NULL THEN
               CAST(det AS DOUBLE) / 7.0 -
                 CAST(ps AS DOUBLE) / CAST(7 * pn AS DOUBLE) END
               AS remainder
      FROM dt LEFT JOIN se USING (phase)
      ORDER BY d"""))),

    // D147 — probabilistic record linkage (operators.RecordLinkage,
    // Fellegi–Sunter): brand-blocked candidate pairs (per-block cap 128,
    // smallest ids), per-field agreement, data-driven chance-agreement
    // u's (Σ c(c−1)/N(N−1) from ONE exploded count pass), and the
    // likelihood-ratio PRODUCT weight — no logs, so the doubles replay
    // bit-for-bit. m = 0.9 prior; emit weight ≥ 5 (≈ two agreements).
    "q_record_linkage" -> (((spark, dir) => {
      graft.operators.RecordLinkage.linkageWeights(
        load(spark, dir, "part"), "p_partkey", "p_brand",
        Seq("name" -> split(col("p_name"), " ").getItem(0),
          "type" -> col("p_type"), "size" -> col("p_size")),
        m = 0.9, maxBlock = 128, minWeight = 5.0)
        .orderBy("id_a", "id_b")
    }, Some("""
      WITH r0 AS (SELECT p_partkey AS id, p_brand AS blk,
                    split_part(p_name, ' ', 1) AS f_name,
                    p_type AS f_type, p_size AS f_size FROM part),
      r AS (SELECT id, blk, f_name, f_type, f_size FROM
              (SELECT r0.*, row_number() OVER (PARTITION BY blk
                 ORDER BY id) AS rn FROM r0)
            WHERE rn <= 128),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM r),
      u AS (SELECT
        (SELECT CAST(sum(c*(c-1)) AS DOUBLE) FROM
           (SELECT count(*) AS c FROM r GROUP BY f_name)) /
          (SELECT CAST(n*(n-1) AS DOUBLE) FROM n) AS u_name,
        (SELECT CAST(sum(c*(c-1)) AS DOUBLE) FROM
           (SELECT count(*) AS c FROM r GROUP BY f_type)) /
          (SELECT CAST(n*(n-1) AS DOUBLE) FROM n) AS u_type,
        (SELECT CAST(sum(c*(c-1)) AS DOUBLE) FROM
           (SELECT count(*) AS c FROM r GROUP BY f_size)) /
          (SELECT CAST(n*(n-1) AS DOUBLE) FROM n) AS u_size),
      p AS (SELECT a.id AS id_a, b.id AS id_b,
              a.f_name = b.f_name AS ag_name,
              a.f_type = b.f_type AS ag_type,
              a.f_size = b.f_size AS ag_size
            FROM r a JOIN r b ON a.blk = b.blk AND a.id < b.id),
      w AS (SELECT id_a, id_b, ag_name, ag_type, ag_size,
              ((1.0 * (CASE WHEN ag_name THEN 0.9 / u_name
                 ELSE (CAST(1.0 AS DOUBLE) - 0.9) / (1.0 - u_name) END))
                 * (CASE WHEN ag_type THEN 0.9 / u_type
                 ELSE (CAST(1.0 AS DOUBLE) - 0.9) / (1.0 - u_type) END))
                 * (CASE WHEN ag_size THEN 0.9 / u_size
                 ELSE (CAST(1.0 AS DOUBLE) - 0.9) / (1.0 - u_size) END) AS weight
            FROM p CROSS JOIN u)
      SELECT * FROM w WHERE weight >= 5.0
      ORDER BY id_a, id_b"""))),

    // D148 — malformed-record quarantine ingest (sources.JsonQuarantine):
    // a JSON-lines feed with a deterministic corruption (event_id % 7 = 3
    // rows lose their closing brace) parses ONCE in PERMISSIVE mode; good
    // rows surface typed, corrupt rows land in a quarantine frame with
    // the raw line preserved for repair — no failed batch, no silent
    // drops. The gate proves the split is exact (counts, good-side sum)
    // and that quarantined raws really are the broken lines.
    "q_json_quarantine" -> (((spark, dir) => {
      import org.apache.spark.sql.types._
      val tmp = Q.scratchDir("jsonq_gate")
      val feedPath = tmp.resolve("feed").toString
      try {
        val cols = Seq("event_id", "user_id", "event_type", "value", "ts")
        load(spark, dir, "events")
          .select(col("event_id"),
            to_json(struct(cols.map(col): _*)).as("j"))
          .select(when(col("event_id") % 7 === 3,
              expr("substring(j, 1, length(j) - 1)"))
            .otherwise(col("j")).as("value"))
          .write.text(feedPath)
        val schema = StructType(Seq(
          StructField("event_id", LongType), StructField("user_id", LongType),
          StructField("event_type", StringType),
          StructField("value", DoubleType), StructField("ts", LongType)))
        val (good, bad) = graft.sources.JsonQuarantine
          .read(spark, feedPath, schema)
        require(bad.filter(col("raw").endsWith("}")).count() == 0,
          "a well-formed line reached quarantine")
        val g = good.agg(count(lit(1)).as("n_good"),
          dsum(col("value")).as("total_good"),
          count_distinct(col("event_type")).as("n_types"))
        val b = bad.agg(count(lit(1)).as("n_bad"))
        g.crossJoin(b).select("n_good", "n_bad", "total_good", "n_types")
          .localCheckpoint() // materialize before the feed dir dies
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some("""
      SELECT CAST(sum(CASE WHEN event_id % 7 <> 3 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_good,
             CAST(sum(CASE WHEN event_id % 7 = 3 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_bad,
             CAST(sum(CASE WHEN event_id % 7 <> 3
               THEN CAST("value" AS DECIMAL(18,2)) END) AS DOUBLE)
               AS total_good,
             CAST(count(DISTINCT CASE WHEN event_id % 7 <> 3
               THEN event_type END) AS BIGINT) AS n_types
      FROM events"""))),

    // D149 — streaming heavy hitters (Streams.heavyHittersStream): a
    // per-group count-min sketch as flatMapGroupsWithState state — FIXED
    // d·w·8 bytes per group at any item cardinality, where per-item
    // counting state grows forever. Two epochs (evens, then odds appended
    // and the query RESTARTED from its checkpoint) prove the sketch
    // survives the state store; absorb-then-emit makes every estimate a
    // pure function of (prior state ∪ batch), so the oracle replays the
    // final estimates from per-epoch exact counts over the same portable
    // md5 buckets as the batch CMS.
    "evt_stream_heavy" -> (((spark, dir) => withStreamPartitions(spark) {
      import org.apache.spark.sql.streaming.Trigger
      val tmp = Q.scratchDir("hh_gate")
      val (raw, outp, chk) = (tmp.resolve("raw").toString,
        tmp.resolve("out").toString, tmp.resolve("chk").toString)
      try {
        val feed = load(spark, dir, "events")
          .select(col("event_id"), col("user_id"))
        Q.FixtureCache.link(spark, s"$dir|shh_e1", raw)(
          feed.filter(col("event_id") % 2 === 0).coalesce(1))
        val schema = spark.read.parquet(raw).schema
        def run(): Unit = {
          val in = spark.readStream.schema(schema).parquet(raw)
          val q = graft.streaming.Streams
            .heavyHittersStream(in, "user_id", d = 4, w = 32, nBuckets = 8)
            .toDF().writeStream.format("parquet").option("path", outp)
            .option("checkpointLocation", chk)
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        // the epoch split is correctness protocol (sketch-state reload);
        // CMS counts are additive, so one delivery's final estimates
        // equal the two-epoch cumulative ones (max(est) per item)
        if (!Q.benchLean) run() // epoch 0: even event ids
        Q.FixtureCache.link(spark, s"$dir|shh_e2", raw)(
          feed.filter(col("event_id") % 2 === 1).coalesce(1))
        run() // epoch 1: odds against checkpointed sketch state
        // materialize BEFORE the finally deletes the sink files (the
        // returned frame must not reference tmp); bounded: ≤ |items| rows
        val rows = spark.read.parquet(outp)
          .groupBy(col("item")).agg(max(col("est")).as("est"))
          .filter(col("est") >= 80)
          .orderBy("item")
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        import spark.implicits._
        rows.toDF("item", "est").orderBy("item")
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some {
      val ests = (0 until 4).map { r =>
        s"""est$r AS (SELECT i.item, CAST(sum(c.c) AS BIGINT) AS s
           FROM it i
           JOIN it j ON j.grp = i.grp AND j.b$r = i.b$r
           JOIN cnt c ON c.item = j.item AND c.ep <= i.lep
           GROUP BY 1)"""
      }.mkString(",\n      ")
      s"""
      WITH e AS (SELECT CAST(user_id AS VARCHAR) AS item,
                   event_id % 2 AS ep FROM events),
      cnt AS (SELECT item, ep, CAST(count(*) AS BIGINT) AS c
              FROM e GROUP BY 1, 2),
      it AS (SELECT item, max(ep) AS lep,
               CAST('0x' || substring(md5(item), 1, 15) AS BIGINT) % 8
                 AS grp,
               CAST('0x' || substring(md5(item), 1, 8) AS BIGINT) % 32
                 AS b0,
               CAST('0x' || substring(md5(item), 9, 8) AS BIGINT) % 32
                 AS b1,
               CAST('0x' || substring(md5(item), 17, 8) AS BIGINT) % 32
                 AS b2,
               CAST('0x' || substring(md5(item), 25, 8) AS BIGINT) % 32
                 AS b3
             FROM e GROUP BY 1),
      $ests
      SELECT i.item, least(e0.s, e1.s, e2.s, e3.s) AS est
      FROM it i JOIN est0 e0 USING (item) JOIN est1 e1 USING (item)
        JOIN est2 e2 USING (item) JOIN est3 e3 USING (item)
      WHERE least(e0.s, e1.s, e2.s, e3.s) >= 80
      ORDER BY item"""
    })),

    // D228 — streaming windowed quantile sketch
    // (Streams.tdigestWindowStream): the t-digest (D45) as per-window
    // flatMapGroupsWithState state — the streaming dashboard twin of
    // evt_window_distinct, closing the batch↔stream pattern for the
    // quantile family. Two epochs through a checkpoint RESTART prove
    // the digest survives the state store; per the D45 contract the
    // estimates are merge-order-dependent within the error bound, so
    // the oracle is a TOLERANCE band against the exact per-day batch
    // percentile (the q_tdigest pattern — band-identical under any
    // epoch layout, which is what makes the benchLean skip sound).
    "evt_stream_tdigest" -> (((spark, dir) => withStreamPartitions(spark) {
      import org.apache.spark.sql.streaming.Trigger
      import org.apache.spark.sql.expressions.Window
      val tmp = Q.scratchDir("std_gate")
      val (raw, outp, chk) = (tmp.resolve("raw").toString,
        tmp.resolve("out").toString, tmp.resolve("chk").toString)
      try {
        val feed = load(spark, dir, "events")
          .select(col("event_id"), expr("ts div 86400000000000").as("d"),
            col("value"))
        Q.FixtureCache.link(spark, s"$dir|std_e1", raw)(
          feed.filter(col("event_id") % 2 === 0).coalesce(1))
        val schema = spark.read.parquet(raw).schema
        def run(): Unit = {
          val in = spark.readStream.schema(schema).parquet(raw)
          val q = graft.streaming.Streams
            .tdigestWindowStream(in, "d", "value", compression = 300,
              qs = Seq(0.25, 0.5, 0.75))
            .toDF().writeStream.format("parquet").option("path", outp)
            .option("checkpointLocation", chk)
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        if (!Q.benchLean) run() // epoch 0: even event ids
        Q.FixtureCache.link(spark, s"$dir|std_e2", raw)(
          feed.filter(col("event_id") % 2 === 1).coalesce(1))
        run() // epoch 1: odds fold into checkpointed digest state
        // latest emission per window (max ver = the current estimate)
        val latest = spark.read.parquet(outp)
          .withColumn("rn", row_number().over(
            Window.partitionBy("w").orderBy(col("ver").desc)))
          .filter(col("rn") === 1)
          .select(col("w").as("d"), col("est"))
        val exact = feed.groupBy("d")
          .agg(percentile(col("value"),
            array(lit(0.25), lit(0.5), lit(0.75))).as("ps"))
        val out = latest.join(exact, "d")
          .select(col("d") +: (1 to 3).flatMap(i =>
            Seq(round(element_at(col("ps"), i), 4).as(s"p$i"),
              (abs(element_at(col("est"), i) - element_at(col("ps"), i))
                <= element_at(col("ps"), i) * 0.05).as(s"p${i}_ok"))): _*)
          .orderBy("d").localCheckpoint()
        require(out.count() == exact.count(),
          "every window must carry a digest emission")
        require(out.filter(!col("p1_ok") || !col("p2_ok") ||
          !col("p3_ok")).isEmpty,
          "a restart-spanning digest left the 5% band of the exact " +
            "batch percentile")
        out
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some("""
      SELECT epoch_ns(ts) // 86400000000000 AS d,
             round(quantile_cont("value", 0.25), 4) AS p1, TRUE AS p1_ok,
             round(quantile_cont("value", 0.50), 4) AS p2, TRUE AS p2_ok,
             round(quantile_cont("value", 0.75), 4) AS p3, TRUE AS p3_ok
      FROM events GROUP BY 1 ORDER BY d"""))),

    // D242 — streaming PSI drift monitor (Streams.psiDriftStream): the
    // Population Stability Index per event-time window against the
    // FIRST day's value profile — the standard production drift score,
    // streamed with one 10-long counts array per window. Add-half
    // smoothing on both sides makes the statistic exactly
    // SQL-replayable (per-bin contributions in mirrored double
    // arithmetic, rounded to 6, summed exactly), so unlike the
    // t-digest twin this gate HASH-matches, not band-matches. Two
    // epochs through a checkpoint restart; the reference day's own
    // window must score exactly 0 (its profile IS the reference).
    "evt_stream_psi" -> (((spark, dir) => withStreamPartitions(spark) {
      import org.apache.spark.sql.streaming.Trigger
      import org.apache.spark.sql.expressions.Window
      val tmp = Q.scratchDir("psi_gate")
      val (raw, outp, chk) = (tmp.resolve("raw").toString,
        tmp.resolve("out").toString, tmp.resolve("chk").toString)
      try {
        val thresholds = Seq(5.0, 15.0, 30.0, 60.0, 100.0, 150.0,
          220.0, 300.0, 400.0)
        val feed = load(spark, dir, "events")
          .select(col("event_id"), expr("ts div 86400000000000").as("d"),
            col("value"))
        val d0 = feed.agg(min("d")).head().getLong(0)
        // the D241 bin grammar IS the reference binning (strict-greater,
        // ties low) — one definition, two consumers
        val refMap = graft.llm.Curriculum.binByThresholds(
            feed.filter(col("d") === d0), col("value"), thresholds)
          .groupBy("bin").agg(count(lit(1)).as("n")).collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        val ref = (1 to thresholds.size + 1)
          .map(b => refMap.getOrElse(b, 0L))
        Q.FixtureCache.link(spark, s"$dir|psi_e1", raw)(
          feed.filter(col("event_id") % 2 === 0).coalesce(1))
        val schema = spark.read.parquet(raw).schema
        def run(): Unit = {
          val in = spark.readStream.schema(schema).parquet(raw)
          val q = graft.streaming.Streams
            .psiDriftStream(in, "d", "value", thresholds, ref)
            .toDF().writeStream.format("parquet").option("path", outp)
            .option("checkpointLocation", chk)
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        Q.Phase.setupDone() // reference profile + fixture files
        if (!Q.benchLean) run() // epoch 0: even event ids
        Q.FixtureCache.link(spark, s"$dir|psi_e2", raw)(
          feed.filter(col("event_id") % 2 === 1).coalesce(1))
        run() // epoch 1: odds fold into checkpointed counts
        Q.Phase.opDone() // reference-day + coverage proofs below
        val latest = spark.read.parquet(outp)
          .withColumn("rn", row_number().over(
            Window.partitionBy("w").orderBy(col("ver").desc)))
          .filter(col("rn") === 1)
          .select(col("w").as("d"), col("ver").as("n_values"),
            col("psi6"))
          .localCheckpoint()
        require(latest.count() == feed.select("d").distinct().count(),
          "every window must carry a PSI emission")
        val refDay = latest.filter(col("d") === d0)
          .head().getDouble(2)
        require(refDay == 0.0,
          s"the reference day's own PSI must be exactly 0 (got $refDay)")
        latest.orderBy("d")
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some {
      val binSql = "1" + Seq(5, 15, 30, 60, 100, 150, 220, 300, 400)
        .map(t => s""" + CASE WHEN "value" > $t THEN 1 ELSE 0 END""")
        .mkString
      s"""
      WITH ev AS (SELECT epoch_ns(ts) // 86400000000000 AS d,
                         $binSql AS bin
                  FROM events
                  WHERE ts IS NOT NULL AND "value" IS NOT NULL),
      dzero AS (SELECT min(d) AS d0 FROM ev),
      bins AS (SELECT unnest(range(1, 11)) AS bin),
      ref AS (SELECT b.bin, CAST(count(e.bin) AS BIGINT) AS rc
              FROM bins b LEFT JOIN
                (SELECT bin FROM ev, dzero WHERE d = d0) e USING (bin)
              GROUP BY 1),
      tref AS (SELECT CAST(sum(rc) AS BIGINT) AS tb FROM ref),
      wc AS (SELECT d, bin, CAST(count(*) AS BIGINT) AS oa
             FROM ev GROUP BY 1, 2),
      tw AS (SELECT d, CAST(sum(oa) AS BIGINT) AS ta FROM wc GROUP BY 1),
      grid AS (SELECT t.d, t.ta, r.bin, r.rc, coalesce(w.oa, 0) AS oa
               FROM tw t CROSS JOIN ref r
               LEFT JOIN wc w ON w.d = t.d AND w.bin = r.bin),
      contrib AS (SELECT d, ta,
        CAST(round(
          ((CAST(oa AS DOUBLE) + 0.5) / (CAST(ta AS DOUBLE) + 0.5 * 10)
           - (CAST(rc AS DOUBLE) + 0.5) /
             (CAST(tref.tb AS DOUBLE) + 0.5 * 10)) *
          ln(((CAST(oa AS DOUBLE) + 0.5) /
              (CAST(ta AS DOUBLE) + 0.5 * 10)) /
             ((CAST(rc AS DOUBLE) + 0.5) /
              (CAST(tref.tb AS DOUBLE) + 0.5 * 10))), 6)
          AS DECIMAL(28,6)) AS c6
        FROM grid, tref)
      SELECT d, ta AS n_values, CAST(SUM(c6) AS DOUBLE) AS psi6
      FROM contrib GROUP BY d, ta ORDER BY d"""
    })),

    // D150 — (ε,δ)-DP released counts over an UNKNOWN domain
    // (llm.Privacy.dpCountsStable — the stability histogram): daily
    // per-event-type counts + two-sided geometric noise (the discrete
    // ε-DP mechanism for counting queries), sampled by inverse-CDF
    // lookup against driver-precomputed breakpoints embedded in BOTH
    // engines, and released ONLY above the stability threshold τ — a
    // data-derived group's presence in the output no longer certifies
    // its presence in the data (the unknown-domain histogram leak).
    // ε = 0.5, δ = 1e-6, seed 42, epoch 'r1' (the epoch is part of the
    // noise derivation, so re-releases under a new epoch redraw noise).
    // The gate proves the mechanism actually perturbed at least one
    // group AND that τ matches the closed form.
    "llm_dp_release" -> (((spark, dir) => {
      val daily = load(spark, dir, "events")
        .select(col("event_type"), expr("ts div 86400000000000").as("d"))
      val rel = graft.llm.Privacy.dpCountsStable(daily,
        Seq("event_type", "d"), eps = 0.5, delta = 1e-6, seed = 42L,
        epoch = "r1")
      val truth = daily.groupBy("event_type", "d")
        .agg(count(lit(1)).as("n"))
      val perturbed = rel.join(truth, Seq("event_type", "d"))
        .filter(col("released") =!= col("n")).count()
      require(perturbed > 0, "no group was perturbed — mechanism inert")
      rel.orderBy("event_type", "d")
    }, Some {
      val bps = graft.llm.Privacy.geometricBreakpoints(0.5)
      val tau = graft.llm.Privacy.stabilityThreshold(0.5, 1e-6)
      val cases = bps.dropRight(1).map { case (k, c) =>
        s"WHEN u < $c THEN CAST($k AS BIGINT)" }.mkString("\n        ")
      s"""
      WITH g AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS d,
                   CAST(count(*) AS BIGINT) AS n
                 FROM events GROUP BY 1, 2),
      h AS (SELECT *, CAST(CAST('0x' || substring(md5(
               event_type || '|' || CAST(d AS VARCHAR) || '|42|r1'),
               1, 15) AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS u
            FROM g),
      rel AS (SELECT event_type, d,
                n + (CASE $cases
                  ELSE CAST(${bps.last._1} AS BIGINT) END) AS released,
                CAST(0.5 AS DOUBLE) AS eps,
                CAST(0.000001 AS DOUBLE) AS delta
              FROM h)
      SELECT * FROM rel WHERE released >= $tau
      ORDER BY event_type, d"""
    })),

    // D150b — ε-DP released counts over a PUBLIC domain
    // (llm.Privacy.dpCounts): the event-type enum × a fixed calendar
    // window is caller-supplied public knowledge, every domain cell is
    // released (absent cells as noise-around-zero), and the output's key
    // set is a constant of the release — the pure-ε companion of
    // llm_dp_release, proving absent groups really do emit noisy zeros
    // (the gate REQUIREs at least one empty cell in the release).
    "llm_dp_domain" -> (((spark, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val days = (19720L to 19755L)
      val domain = spark.createDataFrame(
        for { t <- types; d <- days } yield (t, d)
      ).toDF("event_type", "d")
      val daily = load(spark, dir, "events")
        .select(col("event_type"), expr("ts div 86400000000000").as("d"))
      val rel = graft.llm.Privacy.dpCounts(daily,
        Seq("event_type", "d"), domain, eps = 0.5, seed = 42L,
        epoch = "r1")
      require(rel.count() == types.size.toLong * days.size,
        "every public-domain cell must be released")
      val present = daily.dropDuplicates("event_type", "d").count()
      require(present < types.size.toLong * days.size,
        "fixture must include absent domain cells")
      rel.orderBy("event_type", "d")
    }, Some {
      val bps = graft.llm.Privacy.geometricBreakpoints(0.5)
      val cases = bps.dropRight(1).map { case (k, c) =>
        s"WHEN u < $c THEN CAST($k AS BIGINT)" }.mkString("\n        ")
      s"""
      WITH dom AS (SELECT t.event_type, d.d
                   FROM (SELECT unnest(['click','error','purchase',
                           'signup','view']) AS event_type) t
                   CROSS JOIN (SELECT unnest(range(19720, 19756)) AS d) d),
      g AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS d,
              CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
      j AS (SELECT dom.event_type, dom.d, coalesce(g.n, 0) AS n
            FROM dom LEFT JOIN g USING (event_type, d)),
      h AS (SELECT *, CAST(CAST('0x' || substring(md5(
               event_type || '|' || CAST(d AS VARCHAR) || '|42|r1'),
               1, 15) AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS u
            FROM j)
      SELECT event_type, d,
             n + (CASE $cases
               ELSE CAST(${bps.last._1} AS BIGINT) END) AS released,
             CAST(0.5 AS DOUBLE) AS eps
      FROM h ORDER BY event_type, d"""
    })),

    // D151 — dynamic partition overwrite (StageWriter.overwritePartitions,
    // Delta replaceWhere on the parquet fallback): a restatement batch
    // replaces ONLY its own partitions — the gate rewrites the 'view'
    // partition with doubled values and REQUIREs every other partition's
    // file inventory (names + sizes) byte-stable, then oracle-matches the
    // final table. Write cost O(touched partition), never O(table).
    "q_partition_overwrite" -> (((spark, dir) => {
      val tmp = Q.scratchDir("dynov_gate")
      try {
        val p = tmp.resolve("ev").toString
        val ev = load(spark, dir, "events")
          .select(col("event_id"), col("event_type"), col("value"))
        graft.sink.StageWriter.overwrite(ev, p,
          partitionBy = Seq("event_type"))
        def inventory(): Map[String, Seq[(String, Long)]] = {
          val root = java.nio.file.Paths.get(p)
          val parts = java.nio.file.Files.list(root)
          try parts.toArray.map(_.asInstanceOf[java.nio.file.Path])
            .filter(d => java.nio.file.Files.isDirectory(d) &&
              d.getFileName.toString.startsWith("event_type="))
            .map { d =>
              d.getFileName.toString ->
                graft.sink.StageWriter.listDataFiles(d).map(f =>
                  (f.getFileName.toString, java.nio.file.Files.size(f)))
            }.toMap
          finally parts.close()
        }
        val before = inventory()
        graft.sink.StageWriter.overwritePartitions(
          ev.filter(col("event_type") === "view")
            .withColumn("value", col("value") * 2),
          p, Seq("event_type"))
        val after = inventory()
        val untouched = before.keySet - "event_type=view"
        require(untouched.forall(k => before(k) == after(k)),
          "an untouched partition's files changed under dynamic overwrite")
        require(before("event_type=view") != after("event_type=view"),
          "the targeted partition was not rewritten")
        spark.read.parquet(p)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
          .orderBy("event_type")
          .localCheckpoint() // materialize before the scratch dir dies
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some("""
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CAST(CASE WHEN event_type = 'view'
               THEN "value" * 2 ELSE "value" END AS DECIMAL(18,2)))
               AS DOUBLE) AS total
      FROM events GROUP BY 1 ORDER BY 1"""))),

    // D152 — streaming N-step funnel (Streams.funnelStream): per-user
    // state is just the N anchor timestamps; the ascending fold computes
    // the greedy window-min chain EXACTLY (a later event can never lower
    // an earlier anchor). Feed is split by event time (first half of the
    // month, then the rest, query restarted from its checkpoint) —
    // the ordered daily-landing contract the operator documents. Oracle
    // is the batch window chain over the full table.
    "evt_stream_funnel" -> (((spark, dir) => withStreamPartitions(spark) {
      import org.apache.spark.sql.streaming.Trigger
      val day = 86400000000000L
      val tmp = Q.scratchDir("sfunnel_gate")
      val (raw, outp, chk) = (tmp.resolve("raw").toString,
        tmp.resolve("out").toString, tmp.resolve("chk").toString)
      try {
        val feed = load(spark, dir, "events")
          .select(col("user_id"), col("ts"), col("event_type"))
        val mid = lit(19738L) // 2024-01-16 in epoch days
        Q.FixtureCache.link(spark, s"$dir|sfunnel_e1", raw)(
          feed.filter(expr("ts div 86400000000000") < mid).coalesce(1))
        val schema = spark.read.parquet(raw).schema
        def run(): Unit = {
          val in = spark.readStream.schema(schema).parquet(raw)
          val q = graft.streaming.Streams
            .funnelStream(in, "view", Seq(("click", day), ("purchase", day)))
            .toDF().writeStream.format("parquet").option("path", outp)
            .option("checkpointLocation", chk)
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        // the epoch split is correctness protocol (anchor-state resume);
        // batches sort internally by event time, so one delivery IS the
        // batch chain and max(ver) per user recovers the same state
        if (!Q.benchLean) run() // epoch 1: first half of the month
        Q.FixtureCache.link(spark, s"$dir|sfunnel_e2", raw)(
          feed.filter(expr("ts div 86400000000000") >= mid).coalesce(1))
        run() // epoch 2: second half, anchors resume from the checkpoint
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy(col("ver").desc)
        val rows = spark.read.parquet(outp)
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("user_id"),
            element_at(col("anchors"), 1).as("r1"),
            element_at(col("anchors"), 2).as("r2"),
            element_at(col("anchors"), 3).as("r3"))
          .filter(col("r1") =!= Long.MaxValue)
          .select(col("user_id"), col("r1").as("t1"),
            when(col("r2") =!= Long.MaxValue, col("r2")).as("t2"),
            when(col("r3") =!= Long.MaxValue, col("r3")).as("t3"))
          .orderBy("user_id")
          .collect().map(r => (r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
        import spark.implicits._
        rows.toDF("user_id", "t1", "t2", "t3").orderBy("user_id")
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some("""
      WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS t FROM events),
      s1 AS (
        SELECT *, min(CASE WHEN event_type = 'view' THEN t END)
                    OVER (PARTITION BY user_id) AS t1 FROM e),
      s2 AS (
        SELECT *, min(CASE WHEN event_type = 'click' AND t >= t1
                        AND t < t1 + 86400000000000 THEN t END)
                    OVER (PARTITION BY user_id) AS t2 FROM s1),
      s3 AS (
        SELECT *, min(CASE WHEN event_type = 'purchase' AND t >= t2
                        AND t < t2 + 86400000000000 THEN t END)
                    OVER (PARTITION BY user_id) AS t3 FROM s2)
      SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
      FROM s3 WHERE t1 IS NOT NULL GROUP BY 1
      ORDER BY user_id"""))),

    // D153 — keyed pseudonymization (llm.Privacy.pseudonymize): user ids
    // become keyed SHA-256 tokens; two independently tokenized datasets
    // (the event log and a per-user profile built from orders… here a
    // user activity summary) still JOIN on the pseudonym. The gate
    // tokenizes events and a separately-derived user table, joins on the
    // token, and proves the join is lossless vs joining on the raw id.
    "llm_pseudonymize" -> (((spark, dir) => {
      val ev = graft.llm.Privacy.pseudonymize(
        load(spark, dir, "events")
          .select(col("user_id"), col("value")),
        Seq("user_id"), key = "k7")
      val users = graft.llm.Privacy.pseudonymize(
        load(spark, dir, "events")
          .groupBy("user_id").agg(count(lit(1)).as("n_events")),
        Seq("user_id"), key = "k7")
      ev.join(users, Seq("user_id"))
        .groupBy(col("user_id").as("token"), col("n_events"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy("token")
    }, Some("""
      WITH ev AS (SELECT sha256('k7|' || CAST(user_id AS VARCHAR))
                    AS token, "value" FROM events),
      u AS (SELECT sha256('k7|' || CAST(user_id AS VARCHAR)) AS token,
              CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY user_id)
      SELECT ev.token, u.n_events, CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM ev JOIN u USING (token)
      GROUP BY 1, 2 ORDER BY 1"""))),

    // D154 — cost-based stats-driven join planning: ANALYZE TABLE column
    // statistics let the CBO see through a selective dim filter (filtered
    // size ≈ 4% of raw) and pick a broadcast join where the size-only
    // estimator (filter keeps its child's size) must shuffle both sides.
    // The gate pins BOTH static plans — sort-merge WITHOUT column stats,
    // broadcast WITH them — under a threshold set to a third of the raw
    // dim bytes, then oracle-matches the join result. The Spark-native
    // "collect stats, let Catalyst decide" path a 100 TB warehouse runs
    // instead of hand-hinting every join.
    "q_cbo_broadcast" -> (((spark, dir) => {
      import org.apache.spark.sql.execution.joins.{
        BroadcastHashJoinExec, SortMergeJoinExec}
      import org.apache.spark.sql.execution.SparkPlan
      val id = Q.nextSinkId()
      val (dimT, factT) = (s"cbo_dim_$id", s"cbo_fact_$id")
      val confs = Seq(
        "spark.sql.cbo.enabled" -> "true",
        "spark.sql.statistics.histogram.enabled" -> "false")
      val prev = confs.map { case (k, _) =>
        k -> spark.conf.getOption(k) }
      val thrKey = "spark.sql.autoBroadcastJoinThreshold"
      val prevThr = spark.conf.get(thrKey)
      try {
        load(spark, dir, "part").write.saveAsTable(dimT)
        load(spark, dir, "lineitem")
          .select("l_partkey", "l_extendedprice", "l_discount")
          .write.saveAsTable(factT)
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        // table-LEVEL stats first (real sizeInBytes — an unanalyzed
        // catalog table reports defaultSizeInBytes, i.e. "huge"); column
        // stats only in the second phase, so the flip below isolates
        // exactly the column-stats contribution
        spark.sql(s"ANALYZE TABLE $dimT COMPUTE STATISTICS")
        spark.sql(s"ANALYZE TABLE $factT COMPUTE STATISTICS")
        val rawBytes = spark.table(dimT).queryExecution.optimizedPlan
          .stats.sizeInBytes
        // threshold sits BETWEEN the two estimates the planner will see:
        // without column stats the dim side is column-pruned to the join
        // key (width-ratio ≈ 18% of raw — pruning alone earns that) but
        // the filter can't shrink it; WITH column stats the 4%-selective
        // p_size filter multiplies in (≈ 0.7% of raw). raw/20 = 5%
        // separates them at every SF (both ratios are SF-independent)
        spark.conf.set(thrKey, (rawBytes / 20).toString)
        def q() = spark.table(factT)
          .join(spark.table(dimT).filter(col("p_size") < 3),
            col("l_partkey") === col("p_partkey"))
          .agg(count(lit(1)).as("n"),
            sum((d18(col("l_extendedprice")) *
              (lit(1) - col("l_discount").cast("decimal(3,2)")))
              .cast("decimal(18,4)")).cast("double").as("rev"))
        def joins(p: SparkPlan) = p.collect {
          case _: BroadcastHashJoinExec => "broadcast"
          case _: SortMergeJoinExec => "sortmerge"
        }
        val without = joins(q().queryExecution.sparkPlan)
        val dimEst = spark.table(dimT).filter(col("p_size") < 3)
          .queryExecution.optimizedPlan.stats.sizeInBytes
        require(without == Seq("sortmerge"),
          s"size-only estimator should shuffle, planned: $without " +
            s"(raw=$rawBytes thr=${spark.conf.get(thrKey)} dimEst=$dimEst " +
            s"cbo=${spark.conf.get("spark.sql.cbo.enabled")})")
        spark.sql(s"ANALYZE TABLE $dimT COMPUTE STATISTICS FOR ALL COLUMNS")
        spark.catalog.refreshTable(dimT)
        val withStats = joins(q().queryExecution.sparkPlan)
        require(withStats == Seq("broadcast"),
          s"column stats should unlock broadcast, planned: $withStats")
        q().withColumn("strategy", lit("broadcast_with_stats"))
          .localCheckpoint() // materialize before the tables drop
      } finally {
        prev.foreach { case (k, v) =>
          v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
        spark.conf.set(thrKey, prevThr)
        spark.sql(s"DROP TABLE IF EXISTS $dimT")
        spark.sql(s"DROP TABLE IF EXISTS $factT")
      }
    }, Some("""
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
               (1 - CAST(l_discount AS DECIMAL(3,2)))
               AS DECIMAL(18,4))) AS DOUBLE) AS rev,
             'broadcast_with_stats' AS strategy
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_size < 3"""))),

    // D238 — metadata-priced join planning (AdaptiveJoin
    // .chooseFromSidecars): the D110 decision served from the
    // D227/D231 sidecar planes with ZERO Spark jobs — counts give the
    // side sizes, the KMV NDV planes feed the System R uniform
    // cardinality estimate |L|·|R|/max(ndv). On the lineitem⋈part key-
    // FK join the estimate is near-EXACT by construction (max ndv =
    // |part|, so est ≈ |lineitem| — require()d within KMV error), the
    // executed plan must actually broadcast, and tightening the
    // thresholds flips the same metadata into shuffle/capped verdicts.
    // A smuggled file stands the metadata path down (None) and the
    // measured chooser takes over with the same verdict. Oracle: the
    // unfiltered join aggregate.
    "q_cbo_sidecar" -> (((spark, dir) => {
      val tmp = Q.scratchDir("cbo_sc")
      try {
        val dimP = tmp.resolve("dim").toString
        val factP = tmp.resolve("fact").toString
        load(spark, dir, "part").select("p_partkey", "p_size")
          .coalesce(2).write.parquet(dimP)
        load(spark, dir, "lineitem")
          .select("l_partkey", "l_extendedprice", "l_discount")
          .repartition(8).write.parquet(factP)
        graft.sink.Sidecars.declare(spark, dimP, Seq(
          graft.sink.Sidecars.Counts,
          graft.sink.Sidecars.Ndv("p_partkey", k = 256)))
        graft.sink.Sidecars.declare(spark, factP, Seq(
          graft.sink.Sidecars.Counts,
          graft.sink.Sidecars.Ndv("l_partkey", k = 256)))
        Q.Phase.setupDone() // tables + declared planes = fixture
        val p = Q.requireZeroJobs(spark, "cbo_sc") {
          graft.operators.AdaptiveJoin.chooseFromSidecars(
            factP, "l_partkey", dimP, "p_partkey").get
        }
        Q.Phase.opDone() // decision-quality + stand-down proofs below
        require(p.strategy == "broadcast",
          s"the dim side must broadcast under the default budget ($p)")
        // decision-quality sweep at correctness SF only (Q.benchLean
        // contract): the exact-count comparison and budget arms are
        // proof of the chooser, not the chooser
        if (!Q.benchLean) {
          val exact = spark.read.parquet(factP).count()
          require(math.abs(p.estJoinRows - exact) <= exact / 5,
            s"the uniform estimate must be near-exact on a key-FK join " +
              s"(est ${p.estJoinRows} vs exact $exact)")
          // the same metadata, tighter budgets: shuffle, then capped
          require(graft.operators.AdaptiveJoin.chooseFromSidecars(
            factP, "l_partkey", dimP, "p_partkey",
            broadcastRows = 10).get.strategy == "shuffle")
          require(graft.operators.AdaptiveJoin.chooseFromSidecars(
            factP, "l_partkey", dimP, "p_partkey", broadcastRows = 10,
            maxEstRows = exact / 2).get.strategy == "capped")
        }
        // execute the decision: the physical plan must BROADCAST
        val (joined, _) = graft.operators.AdaptiveJoin.joinFromSidecars(
          spark, factP, "l_partkey", dimP, "p_partkey").get
        val agg = joined.agg(count(lit(1)).as("n"),
          sum((d18(col("l_extendedprice")) *
            (lit(1) - col("l_discount").cast("decimal(3,2)")))
            .cast("decimal(18,4)")).cast("double").as("rev"))
          .withColumn("strategy", lit(p.strategy))
          .localCheckpoint()
        val bhj = joined.queryExecution.executedPlan.toString
          .contains("BroadcastHashJoin")
        require(bhj, "the executed plan must broadcast the dim side")
        // stand-down arm: a foreign file in the dim table → metadata
        // path None, the measured chooser reaches the same verdict.
        // Proof arm — correctness SF only (Q.benchLean contract).
        if (!Q.benchLean) {
          val f = graft.sink.StageWriter.listDataFiles(
            java.nio.file.Paths.get(dimP)).head
          java.nio.file.Files.copy(f,
            f.getParent.resolve("zz_smuggled.parquet"))
          require(graft.operators.AdaptiveJoin.chooseFromSidecars(
            factP, "l_partkey", dimP, "p_partkey").isEmpty,
            "a stale plane must stand the metadata path down")
          require(graft.operators.AdaptiveJoin.choose(
            spark.read.parquet(factP), spark.read.parquet(dimP)
              .withColumnRenamed("p_partkey", "l_partkey"),
            "l_partkey").strategy == "broadcast",
            "the measured fallback must reach the same verdict")
        }
        agg
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some("""
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
               (1 - CAST(l_discount AS DECIMAL(3,2)))
               AS DECIMAL(18,4))) AS DOUBLE) AS rev,
             'broadcast' AS strategy
      FROM lineitem JOIN part ON l_partkey = p_partkey"""))),

    // D155 — derived-partition pruning (plans.DerivedPartitionPrune +
    // StageWriter.writeDerivedPartitioned): the table is day-partitioned
    // by `d = ts div 86400e9` with the derivation recorded in a sidecar;
    // the reader filters on RAW ts (never knowing the layout) and the
    // optimizer rule injects the implied day-partition conjunct, turning
    // a 30-day scan into a 3-day one at directory-listing time — Delta's
    // generated-column pruning on plain parquet. The gate REQUIREs the
    // file skip actually happened and hash-matches the full-scan oracle.
    "q_derived_prune" -> (((spark, dir) => {
      val day = 86400000000000L
      val tmp = Q.scratchDir("dprune_gate")
      try {
        val p = tmp.resolve("ev").toString
        graft.sink.StageWriter.writeDerivedPartitioned(
          load(spark, dir, "events")
            .select(col("event_id"), col("ts"), col("value")),
          p, srcCol = "ts", partCol = "d", divisor = day)
        graft.plans.DerivedPartitionPrune.ensureInstalled(spark)
        // Jan 3–5 (days 19725..19727) out of the 30-day month
        val q = spark.read.parquet(p)
          .filter(col("ts") >= lit(19725L * day) &&
            col("ts") < lit(19728L * day))
        val touched = q.select(input_file_name()).distinct().count()
        val total = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
          .toArray.count(_.toString.endsWith(".parquet")).toLong
        require(touched > 0 && touched * 5 <= total,
          s"derived pruning read $touched of $total files — rule inert")
        q.agg(count(lit(1)).as("n"),
            count_distinct(col("event_id")).as("ids"),
            dsum(col("value")).as("total"))
          .localCheckpoint() // materialize before the table dir dies
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some("""
      SELECT count(*) AS n, count(DISTINCT event_id) AS ids,
             CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events
      WHERE epoch_ns(ts) >= 19725 * 86400000000000
        AND epoch_ns(ts) < 19728 * 86400000000000"""))),

    // D156 — incremental CDC egress (VersionedTable.replicateTo): a plain
    // parquet replica follows the versioned table by applying only the
    // keys that changed since its last sync (bootstrap, then a
    // delete+update batch), through the file-targeted CDC merge — the
    // change-data-feed consumer shape. The gate REQUIREs the second sync
    // applied a DELTA (< half the table) and oracle-matches the final
    // replica against a from-scratch replay.
    "c5_cdc_egress" -> (((spark, dir) => {
      val tmp = Q.scratchDir("egress_gate")
      try {
        val t = tmp.resolve("src").toString
        val rep = tmp.resolve("replica").toString
        val docs = load(spark, dir, "documents")
        graft.sink.VersionedTable.commit(docs, t)
        Q.Phase.setupDone() // op = the replication lifecycle (bootstrap
        // sync, v2 commit + delta sync, already-current no-op)
        val s1 = graft.sink.VersionedTable
          .replicateTo(spark, t, rep, Seq("doc_id"))
        val total = docs.count()
        require(s1.applied == total, s"bootstrap applied ${s1.applied}")
        // v2: ~1/7 of keys deleted, ~1/5 of survivors updated
        graft.sink.VersionedTable.commit(
          docs.filter(col("doc_id") % 7 =!= 3)
            .withColumn("n_chars", when(col("doc_id") % 5 === 0,
              col("n_chars") + 100).otherwise(col("n_chars"))), t)
        val s2 = graft.sink.VersionedTable
          .replicateTo(spark, t, rep, Seq("doc_id"))
        require(s2.applied > 0 && s2.applied * 2 < total,
          s"second sync applied ${s2.applied} of $total — not a delta")
        val s3 = graft.sink.VersionedTable
          .replicateTo(spark, t, rep, Seq("doc_id"))
        require(s3.applied == 0, "an already-current replica re-applied")
        spark.read.parquet(rep)
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"),
            count_distinct(col("lang")).as("langs"))
          .localCheckpoint() // materialize before the scratch dir dies
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some("""
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN doc_id % 5 = 0 THEN n_chars + 100
               ELSE n_chars END) AS BIGINT) AS total_chars,
             CAST(count(DISTINCT lang) AS BIGINT) AS langs
      FROM documents WHERE doc_id % 7 <> 3"""))),

    // D157 — TIMESTAMP AS OF time travel (VersionedTable.readAsOf):
    // commits record an injected monotone timestamp; AS OF resolves the
    // newest version visible at a point in time — Delta's second time-
    // travel axis on top of the existing version-based one (c5_time_
    // travel). The gate commits three states at ts 1000/2000/3000, reads
    // AS OF 2500 (→ the middle state) and AS OF 1000 (inclusive
    // boundary → the first), and oracle-replays both.
    "c5_asof_ts" -> (((spark, dir) => {
      val tmp = Q.scratchDir("asof_gate")
      try {
        val t = tmp.resolve("docs").toString
        val docs = load(spark, dir, "documents")
        graft.sink.VersionedTable.commit(
          docs.filter(col("lang") === "en"), t, commitTs = 1000L)
        graft.sink.VersionedTable.commit(
          docs.filter(col("n_chars") >= 200), t, commitTs = 2000L)
        graft.sink.VersionedTable.commit(docs, t, commitTs = 3000L)
        require(graft.sink.VersionedTable.versionAsOf(t, 999L).isEmpty,
          "a pre-history timestamp resolved to a version")
        val mid = graft.sink.VersionedTable.readAsOf(spark, t, 2500L)
          .groupBy("lang").agg(count(lit(1)).as("n_mid"),
            sum(col("n_chars")).as("chars_mid"))
        val first = graft.sink.VersionedTable.readAsOf(spark, t, 1000L)
          .groupBy("lang").agg(count(lit(1)).as("n_first"))
        mid.join(first, Seq("lang"), "left")
          .orderBy("lang")
          .localCheckpoint() // materialize before the scratch dir dies
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some("""
      WITH mid AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_mid,
                     CAST(sum(n_chars) AS BIGINT) AS chars_mid
                   FROM documents WHERE n_chars >= 200 GROUP BY lang),
      f AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_first
            FROM documents WHERE lang = 'en' GROUP BY lang)
      SELECT mid.lang, n_mid, chars_mid, n_first
      FROM mid LEFT JOIN f USING (lang)
      ORDER BY lang"""))),

    // D158 — atomic multi-table publish (sink.Txn): a corpus table and
    // its derived per-lang summary flip together under ONE transaction
    // pointer; a writer that dies between member commits (simulated by a
    // direct member commit with no txn flip) leaves readers on the last
    // COMPLETE pair. The gate proves the read pair is consistent by
    // recounting the corpus against the published summary — the oracle
    // computes both sides from scratch, so any skew fails the hash.
    "c5_multi_txn" -> (((spark, dir) => {
      val tmp = Q.scratchDir("txn_gate")
      try {
        val root = tmp.resolve("wh").toString
        val docs = load(spark, dir, "documents")
        def stats(d: org.apache.spark.sql.DataFrame) =
          d.groupBy("lang").agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("chars"))
        val en = docs.filter(col("lang") === "en")
        graft.sink.Txn.commit(root,
          Seq("docs" -> en, "stats" -> stats(en)))
        graft.sink.Txn.commit(root,
          Seq("docs" -> docs, "stats" -> stats(docs)))
        // half-published writer: member data lands, txn pointer never
        // flips — must stay invisible to txn readers
        graft.sink.VersionedTable.commit(docs.limit(10), s"$root/docs")
        val d = graft.sink.Txn.read(spark, root, "docs")
        require(d.count() == docs.count(),
          "txn reader saw a half-published member commit")
        val st = graft.sink.Txn.read(spark, root, "stats")
        st.join(d.groupBy("lang").agg(count(lit(1)).as("n_live")),
            Seq("lang"))
          .orderBy("lang")
          .localCheckpoint() // materialize before the scratch dir dies
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some("""
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS chars,
             CAST(count(*) AS BIGINT) AS n_live
      FROM documents GROUP BY lang ORDER BY lang"""))),

    // D221 — snapshot-consistent GROUP clone (Txn.cloneGroup): every
    // member of a transaction shallow-clones PINNED at that txn's
    // versions and publishes under ONE destination pointer — the
    // dev/test database clone, torn-read-free by construction. The
    // gate clones txn 1 and the head, proves BOTH destination txns
    // internally consistent (summary ≡ recount of its fact twin),
    // proves the clone does not follow later source commits, and
    // oracles the head clone's joined pair.
    "c5_txn_clone" -> (((spark, dir) => {
      val tmp = Q.scratchDir("txnclone_gate")
      try {
        val root = tmp.resolve("wh").toString
        val dev = tmp.resolve("dev").toString
        val docs = load(spark, dir, "documents")
        def stats(d: org.apache.spark.sql.DataFrame) =
          d.groupBy("lang").agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("chars"))
        val en = docs.filter(col("lang") === "en")
        graft.sink.Txn.commit(root,
          Seq("docs" -> en, "stats" -> stats(en)))     // src txn 1
        graft.sink.Txn.commit(root,
          Seq("docs" -> docs, "stats" -> stats(docs))) // src txn 2
        Q.Phase.setupDone() // op = the group clones + their proofs
        graft.sink.Txn.cloneGroup(root, dev, asOfTxn = Some(1)) // dst 1
        graft.sink.Txn.cloneGroup(root, dev)                    // dst 2
        def consistent(txn: Int): Unit = {
          val d = graft.sink.Txn.read(spark, dev, "docs", Some(txn))
          val st = graft.sink.Txn.read(spark, dev, "stats", Some(txn))
          require(Q.multisetEqual(st, d.groupBy("lang")
            .agg(count(lit(1)).as("n_docs"),
              sum(col("n_chars")).as("chars"))),
            s"destination txn $txn serves a TORN fact/summary pair")
        }
        consistent(1); consistent(2)
        // the clone must not follow the source past its pin
        graft.sink.Txn.commit(root, Seq("docs" -> docs.limit(50),
          "stats" -> stats(docs.limit(50))))           // src txn 3
        val d = graft.sink.Txn.read(spark, dev, "docs")
        require(d.count() == docs.count(),
          "the group clone followed a post-clone source commit")
        graft.sink.Txn.read(spark, dev, "stats")
          .join(d.groupBy("lang").agg(count(lit(1)).as("n_live")),
            Seq("lang"))
          .orderBy("lang")
          .localCheckpoint() // materialize before the scratch dir dies
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some("""
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS chars,
             CAST(count(*) AS BIGINT) AS n_live
      FROM documents GROUP BY lang ORDER BY lang"""))),

    // D159 — write-audit-publish (VersionedTable.commitAudited, the
    // Iceberg WAP pattern): data stages as the next version, the audit
    // runs against the STAGED files, and the pointer flips only on a
    // clean audit — a contract-violating batch (nulled keys here) aborts
    // with staged data and claim cleaned up, so bad rows never reach a
    // reader even for an instant. The gate publishes clean, proves the
    // dirty batch was vetoed with the head unchanged, then publishes a
    // corrected batch (claim demonstrably released).
    "c5_wap" -> (((spark, dir) => {
      val tmp = Q.scratchDir("wap_gate")
      try {
        val t = tmp.resolve("docs").toString
        val docs = load(spark, dir, "documents")
        def audit(staged: org.apache.spark.sql.DataFrame): Unit = {
          require(staged.filter(col("doc_id").isNull).count() == 0,
            "audit: null keys in staged publish")
          require(staged.count() > 0, "audit: empty publish")
        }
        graft.sink.VersionedTable.commitAudited(docs, t, audit)
        val dirty = docs.withColumn("doc_id",
          when(col("doc_id") % 10 === 0, lit(null))
            .otherwise(col("doc_id")))
        require(scala.util.Try(
          graft.sink.VersionedTable.commitAudited(dirty, t, audit))
          .isFailure, "the audit let a null-key batch publish")
        require(graft.sink.VersionedTable.latestVersion(t).contains(1),
          "a vetoed publish moved the head")
        graft.sink.VersionedTable.commitAudited(
          docs.filter(col("doc_id") % 10 =!= 0), t, audit)
        graft.sink.VersionedTable.read(spark, t)
          .groupBy("lang").agg(count(lit(1)).as("n"),
            sum(col("n_chars")).as("chars"))
          .orderBy("lang")
          .localCheckpoint() // materialize before the scratch dir dies
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some("""
      SELECT lang, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_chars) AS BIGINT) AS chars
      FROM documents WHERE doc_id % 10 <> 0
      GROUP BY lang ORDER BY lang"""))),

    // D160 — DQ-gated streaming publish (Streams.rawToStageGated): two
    // raw files arrive as separate micro-batches; the poisoned one
    // (nulled user ids) is vetoed by the audit and lands WHOLE in
    // quarantine with the reason, the clean one merges into stage, and
    // the stream never crash-loops. Batch audits are independent, so
    // file delivery order can't change what lands where — which is what
    // makes the final state oracle-able.
    "evt_stream_gated" -> (((spark, dir) => withStreamPartitions(spark) {
      import org.apache.spark.sql.streaming.Trigger
      val tmp = Q.scratchDir("gated_gate")
      val (raw, stage, quar, chk) = (tmp.resolve("raw").toString,
        tmp.resolve("stage").toString, tmp.resolve("quar").toString,
        tmp.resolve("chk").toString)
      try {
        val feed = load(spark, dir, "events")
          .select(col("event_id"), col("user_id"), col("value"))
        Q.FixtureCache.link(spark, s"$dir|sgated_e1", raw)(
          feed.filter(col("event_id") % 2 === 0).coalesce(1))
        Q.FixtureCache.link(spark, s"$dir|sgated_e2", raw)(
          feed.filter(col("event_id") % 2 === 1)
            .withColumn("user_id",
              when(col("event_id") % 5 === 0, lit(null))
                .otherwise(col("user_id"))) // the poison
            .coalesce(1))
        val q = graft.streaming.Streams.rawToStageGated(spark, raw, stage,
          quar, chk, keys = Seq("event_id"),
          audit = b => require(
            b.filter(col("user_id").isNull).count() == 0,
            "null user ids in batch"),
          transform = identity)
        // AvailableNow semantics by hand: process both files, then stop
        q.processAllAvailable(); q.stop()
        val s = spark.read.parquet(stage).agg(
          count(lit(1)).as("n_stage"), dsum(col("value")).as("stage_total"))
        val qu = spark.read.parquet(quar).agg(
          count(lit(1)).as("n_quarantined"),
          count_distinct(col("quarantine_reason")).as("n_reasons"))
        s.crossJoin(qu)
          .select("n_stage", "stage_total", "n_quarantined", "n_reasons")
          .localCheckpoint() // materialize before the scratch dir dies
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some("""
      SELECT CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_stage,
             CAST(sum(CASE WHEN event_id % 2 = 0
               THEN CAST("value" AS DECIMAL(18,2)) END) AS DOUBLE)
               AS stage_total,
             CAST(sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_quarantined,
             CAST(1 AS BIGINT) AS n_reasons
      FROM events"""))),

    // D161 — partition-scheme evolution (sink.PartitionEvolution):
    // generation 0 lands day-partitioned, the scheme then EVOLVES and
    // generation 1 lands week-partitioned — no history rewrite. A single
    // raw-ts range read crossing the boundary prunes each generation
    // under ITS OWN scheme (the D155 rule fires per union branch after
    // predicate pushdown), which the gate REQUIREs via file counts
    // before oracle-matching the result.
    "q_partition_evolution" -> (((spark, dir) => {
      val day = 86400000000000L
      val tmp = Q.scratchDir("pevo_gate")
      try {
        val root = tmp.resolve("ev").toString
        val feed = load(spark, dir, "events")
          .select(col("event_id"), col("ts"), col("value"))
        val split = lit(19738L * day)
        graft.sink.PartitionEvolution.addGeneration(
          feed.filter(col("ts") < split), root, "ts", "d", day)
        graft.sink.PartitionEvolution.addGeneration(
          feed.filter(col("ts") >= split), root, "ts", "d", 7L * day)
        graft.plans.DerivedPartitionPrune.ensureInstalled(spark)
        val q = graft.sink.PartitionEvolution.read(spark, root, "d")
          .filter(col("ts") >= lit(19734L * day) &&
            col("ts") < lit(19741L * day))
        val touched = q.select(input_file_name()).distinct().count()
        val total = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
          .toArray.count(_.toString.endsWith(".parquet")).toLong
        require(touched > 0 && touched * 2 <= total,
          s"cross-scheme pruning read $touched of $total files")
        q.agg(count(lit(1)).as("n"),
            count_distinct(col("event_id")).as("ids"),
            dsum(col("value")).as("total"))
          .localCheckpoint() // materialize before the scratch dir dies
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some("""
      SELECT count(*) AS n, count(DISTINCT event_id) AS ids,
             CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events
      WHERE epoch_ns(ts) >= 19734 * 86400000000000
        AND epoch_ns(ts) < 19741 * 86400000000000"""))),

    // D162 — deletion vectors (sink.DeletionVectors): two DELETEs record
    // (file, row-position) pairs in a sidecar and the gate REQUIREs the
    // data files stayed byte-identical — the GDPR-erasure shape where a
    // delete costs a sidecar append, not a table rewrite. DV-aware reads
    // subtract via one broadcast anti-join on _metadata.row_index; the
    // physical fold (compaction) must agree with the vectorized view.
    "q_deletion_vectors" -> (((spark, dir) => {
      val tmp = Q.scratchDir("dv_gate")
      try {
        val p = tmp.resolve("ev").toString
        load(spark, dir, "events")
          .select(col("event_id"), col("user_id"), col("value"))
          .repartition(8).write.parquet(p)
        def inv() = graft.sink.StageWriter
          .listDataFiles(java.nio.file.Paths.get(p))
          .map(f => (f.getFileName.toString, java.nio.file.Files.size(f)))
        val before = inv()
        graft.sink.DeletionVectors.delete(spark, p,
          col("event_id") % 9 === 0)
        graft.sink.DeletionVectors.delete(spark, p, col("value") >= 400)
        require(inv() == before, "a delete rewrote data files")
        val live = graft.sink.DeletionVectors.read(spark, p)
        val row = live.agg(count(lit(1)).as("n"),
          count_distinct(col("user_id")).as("users"),
          dsum(col("value")).as("total")).head()
        // the physical fold must agree with the vectorized view
        val folded = graft.sink.DeletionVectors.apply(spark, p)
        require(folded == row.getLong(0),
          s"fold kept $folded rows, vectorized view had ${row.getLong(0)}")
        import spark.implicits._
        Seq((row.getLong(0), row.getLong(1), row.getDouble(2)))
          .toDF("n", "users", "total")
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some("""
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT user_id) AS BIGINT) AS users,
             CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events
      WHERE NOT (event_id % 9 = 0 OR "value" >= 400)""")))
  )
}
