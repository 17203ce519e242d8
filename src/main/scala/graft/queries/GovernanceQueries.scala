package graft.queries

import org.apache.spark.sql.functions._
import Q._

/** Data-governance + evaluation-hygiene operators (SURVEY §2D, D132+):
  * k-anonymity release suppression, leakage-safe corpus splitting,
  * nearest-centroid label evaluation, interval-coverage analytics (batch
  * + streaming), triplet mining, incremental SCD2, sorted-neighborhood
  * dedup, quantile normalization, the auto-pruning optimizer-rule gate,
  * and the governed-release composition. The plane a dataset passes
  * through BETWEEN curation and training: can it be released, how is it
  * split, does the embedding space recover the labels, what did the
  * activity actually cover.
  */
object GovernanceQueries {

  val defs: Map[String, Entry] = Map(

    // D191 — access-tag governance (sources.AccessTags), the Lake
    // Formation LF-Tag analog (crawler_stage.py:266-953 creates tags,
    // attaches at registration, grants tag-scoped reads): (table,
    // column) → tag registry + a tag-enforced read surface. The SAME
    // table is read through two reader profiles — the analyst sees
    // keyed-pseudonym ids (D153 tokens) and redacted text (D25), the
    // steward sees raw ids but no text at all — and an untagged column
    // (`lang`) is require()d CLOSED for both: allow-list by commission,
    // never omission. Both views oracled in one frame.
    "c10_tags" -> (((spark, dir) => {
      import graft.sources.AccessTags
      val tmp = Q.scratchDir("tags_gate")
      try {
        val path = tmp.resolve("docs").toString
        load(spark, dir, "documents").write.parquet(path)
        AccessTags.tagTable(path, Map(
          "doc_id" -> "id", "text" -> "freetext",
          "source" -> "meta", "n_chars" -> "meta"))
        // `lang` stays untagged ON PURPOSE: the default-closed proof
        val analyst = AccessTags.Profile("analyst", Map(
          "id" -> AccessTags.Tokenize, "freetext" -> AccessTags.Redact,
          "meta" -> AccessTags.Open), key = "tagkey")
        val steward = AccessTags.Profile("steward", Map(
          "id" -> AccessTags.Open, "meta" -> AccessTags.Open))
        val av = AccessTags.taggedView(spark, path, analyst)
        val sv = AccessTags.taggedView(spark, path, steward)
        require(av.columns.toSet ==
          Set("doc_id", "text", "source", "n_chars") &&
          sv.columns.toSet == Set("doc_id", "source", "n_chars"),
          "profiles must earn exactly their tagged columns")
        require(!av.columns.contains("lang") && !sv.columns.contains("lang"),
          "an untagged column must default CLOSED for every profile")
        // the analyst never sees a raw id: every value is a 64-hex token
        require(av.filter(!col("doc_id").rlike("^[0-9a-f]{64}$")).isEmpty,
          "analyst ids must be keyed pseudonyms")
        av.select(lit("analyst").as("profile"), col("doc_id"),
            col("source"), col("n_chars"), md5(col("text")).as("text_md5"))
          .unionByName(sv.select(lit("steward").as("profile"),
            col("doc_id").cast("string").as("doc_id"), col("source"),
            col("n_chars"), lit(null).cast("string").as("text_md5")))
          .orderBy("profile", "doc_id")
          .localCheckpoint() // materialize before the scratch dir dies
      } finally {
        graft.sources.AccessTags.untagTable(
          tmp.resolve("docs").toString)
        graft.sink.StageWriter.deleteRecursively(tmp)
      }
    }, Some(s"""
      WITH a AS (SELECT 'analyst' AS profile,
                   sha256('tagkey|' || CAST(doc_id AS VARCHAR)) AS doc_id,
                   source, n_chars,
                   md5(regexp_replace(regexp_replace(text,
                     '${graft.llm.TextAnalysis.EmailPattern}', '<EMAIL>',
                     'g'),
                     '${graft.llm.TextAnalysis.LongNumberPattern}',
                     '<NUM>', 'g')) AS text_md5
                 FROM documents),
      s AS (SELECT 'steward' AS profile, CAST(doc_id AS VARCHAR) AS doc_id,
              source, n_chars, CAST(NULL AS VARCHAR) AS text_md5
            FROM documents)
      SELECT * FROM (SELECT * FROM a UNION ALL SELECT * FROM s)
      ORDER BY profile, doc_id"""))),

    // D198 — durable governance catalog (round 10): tags + row policies
    // persist as per-table sidecars (`__tags__`/`__rowpolicies__`, the
    // `__checks__` dialect) — the LF-Tag durability property
    // (crawler_stage.py:266-953: tags live in Lake Formation, surviving
    // every process). The gate registers governance, CLEARS the
    // in-memory registry (simulating a restart / a second writer
    // process), and the governed read serves the SAME shaped + row-
    // filtered view from the sidecars alone; untag deletes the sidecars
    // and the read fails CLOSED again.
    "c10_tags_durable" -> (((spark, dir) => {
      import graft.sources.AccessTags
      val tmp = Q.scratchDir("tagsdur_gate")
      try {
        val path = tmp.resolve("docs").toString
        load(spark, dir, "documents").write.parquet(path)
        AccessTags.tagTable(path, Map(
          "doc_id" -> "id", "text" -> "freetext", "n_chars" -> "meta"))
        AccessTags.tagRows(path, Map("analyst" -> "lang = 'en'"))
        require(java.nio.file.Files.isRegularFile(
          java.nio.file.Paths.get(path + ".__tags__")) &&
          java.nio.file.Files.isRegularFile(
            java.nio.file.Paths.get(path + ".__rowpolicies__")),
          "declarations must write through to durable sidecars")
        // the restart: every process-local registration is GONE
        AccessTags.resetMemory()
        val analyst = AccessTags.Profile("analyst", Map(
          "id" -> AccessTags.Tokenize, "freetext" -> AccessTags.Redact,
          "meta" -> AccessTags.Open), key = "durkey")
        val av = AccessTags.taggedView(spark, path, analyst)
        require(av.columns.toSet == Set("doc_id", "text", "n_chars"),
          "rehydrated tags must shape exactly the declared columns")
        val out = av.select(col("doc_id"), md5(col("text")).as("text_md5"),
            col("n_chars"))
          .orderBy("doc_id")
          .localCheckpoint() // materialize before the scratch dir dies
        // untag deletes the sidecars: a fresh governed read fails closed
        AccessTags.untagTable(path)
        AccessTags.resetMemory()
        val refused = try { AccessTags.taggedView(spark, path, analyst)
          false } catch { case _: IllegalArgumentException => true }
        require(refused, "untagged table must refuse governed reads " +
          "after restart too")
        out
      } finally {
        graft.sources.AccessTags.untagTable(tmp.resolve("docs").toString)
        graft.sink.StageWriter.deleteRecursively(tmp)
      }
    }, Some(s"""
      SELECT sha256('durkey|' || CAST(doc_id AS VARCHAR)) AS doc_id,
             md5(regexp_replace(regexp_replace(text,
               '${graft.llm.TextAnalysis.EmailPattern}', '<EMAIL>', 'g'),
               '${graft.llm.TextAnalysis.LongNumberPattern}',
               '<NUM>', 'g')) AS text_md5,
             n_chars
      FROM documents WHERE lang = 'en'
      ORDER BY doc_id"""))),

    // D199 — governed reads over VERSIONED tables (round 10): tags key
    // by the table ROOT — the reference grants act on catalog TABLES
    // independent of storage layout (crawler_stage.py:233-264) — so one
    // tagTable() call governs every committed version: the governed
    // read routes through VersionedTable.read, honors AS OF time
    // travel, and tags survive commits without re-attachment. Head and
    // asOf(v1) both served through the SAME tag plane and oracled.
    "c10_tags_versioned" -> (((spark, dir) => {
      import graft.sources.AccessTags
      val tmp = Q.scratchDir("tagsver_gate")
      try {
        val table = tmp.resolve("docs_v").toString
        val docs = load(spark, dir, "documents")
          .select("doc_id", "text", "lang", "n_chars")
        graft.sink.VersionedTable.commit(docs, table)
        // tag ONCE, at the root, between commits — both versions governed
        AccessTags.tagTable(table, Map(
          "doc_id" -> "id", "n_chars" -> "meta"))
        graft.sink.VersionedTable.commit(
          docs.filter(col("doc_id") % 5 =!= 0), table)
        AccessTags.resetMemory() // durability composes with versioning
        val analyst = AccessTags.Profile("analyst", Map(
          "id" -> AccessTags.Tokenize, "meta" -> AccessTags.Open),
          key = "vkey")
        val head = AccessTags.taggedView(spark, table, analyst)
        val v1 = AccessTags.taggedView(spark, table, analyst,
          asOf = Some(1))
        require(head.columns.toSet == Set("doc_id", "n_chars") &&
          v1.columns.toSet == Set("doc_id", "n_chars"),
          "every version reads through the same tag plane")
        // a plain parquet path must refuse time travel
        val plain = tmp.resolve("plain").toString
        docs.limit(5).write.parquet(plain)
        AccessTags.tagTable(plain, Map("doc_id" -> "id"))
        val refused = try { AccessTags.taggedView(spark, plain, analyst,
          asOf = Some(1)); false }
          catch { case _: IllegalArgumentException => true }
        require(refused, "asOf on a non-versioned table must refuse")
        v1.select(lit(1).as("v"), col("doc_id"), col("n_chars"))
          .unionByName(head.select(lit(2).as("v"), col("doc_id"),
            col("n_chars")))
          .orderBy("v", "doc_id")
          .localCheckpoint() // materialize before the scratch dir dies
      } finally {
        graft.sources.AccessTags.untagTable(tmp.resolve("docs_v").toString)
        graft.sources.AccessTags.untagTable(tmp.resolve("plain").toString)
        graft.sink.StageWriter.deleteRecursively(tmp)
      }
    }, Some("""
      WITH t AS (SELECT sha256('vkey|' || CAST(doc_id AS VARCHAR))
                   AS tok, n_chars, doc_id AS k FROM documents)
      SELECT 1 AS v, tok AS doc_id, n_chars FROM t
      UNION ALL
      SELECT 2 AS v, tok AS doc_id, n_chars FROM t WHERE k % 5 <> 0
      ORDER BY v, doc_id"""))),

    // D200 — automatic tag inheritance through the pipeline (round 10):
    // the reference attaches LF-Tags to EVERY crawled stage table
    // (crawler_stage.py:385-414) — here the raw→stage transform
    // (TablePipeline.transform) propagates a tagged raw source's plane
    // to the stage table with NO manual call, via value lineage of the
    // transformed frame (D196's inheritance applied at write cadence);
    // the governed read of the stage table is oracled end-to-end, and
    // the inherited plane is durable (registry cleared pre-read).
    "e2e_pipeline_tags" -> (((spark, dir) => {
      import graft.config.{ColumnMetadata, LoadType, TableConfig}
      import graft.sources.AccessTags
      val tmp = Q.scratchDir("pipetags_gate")
      try {
        val rawPath = tmp.resolve("raw").toString
        val stagePath = tmp.resolve("stage").toString
        // raw zone: stringified source (the reference raw discipline)
        load(spark, dir, "orders")
          .select(col("o_orderkey").cast("string").as("numdoc"),
            col("o_custkey").cast("string").as("cliente"),
            col("o_totalprice").cast("string").as("monto"))
          .write.parquet(rawPath)
        AccessTags.tagTable(rawPath, Map(
          "numdoc" -> "id", "cliente" -> "id", "monto" -> "meta"))
        val cfg = TableConfig("*", LoadType.Full, "auto", "", 0, 0,
          "", "", "", "", "", "G1", "dbo", "orders", "m", "m_orders",
          "a", "1")
        val meta = Seq(
          ColumnMetadata("id_orden", 1, false, true, false, false,
            "string", "t", "fn_transform_ClearString(numdoc)"),
          ColumnMetadata("id_cliente", 2, false, false, false, false,
            "string", "t", "fn_transform_ClearString(cliente)"),
          ColumnMetadata("importe", 3, false, false, false, false,
            "numeric(18,2)", "t", "fn_transform_Numeric(monto)"))
        graft.run.TablePipeline.transform(spark, rawPath, stagePath,
          cfg, meta)
        require(AccessTags.tagsOf(stagePath) == Map(
          "id_orden" -> Set("id"), "id_cliente" -> Set("id"),
          "importe" -> Set("meta")),
          "stage must inherit exactly the raw plane through lineage, " +
            s"got ${AccessTags.tagsOf(stagePath)}")
        AccessTags.resetMemory() // inherited plane survives restart
        val analyst = AccessTags.Profile("analyst", Map(
          "id" -> AccessTags.Tokenize, "meta" -> AccessTags.Open),
          key = "pipkey")
        AccessTags.taggedView(spark, stagePath, analyst)
          .select(col("id_orden"), col("id_cliente"),
            col("importe").cast("double").as("importe"))
          .orderBy("id_orden")
          .localCheckpoint() // materialize before the scratch dir dies
      } finally {
        graft.sources.AccessTags.untagTable(tmp.resolve("raw").toString)
        graft.sources.AccessTags.untagTable(tmp.resolve("stage").toString)
        graft.sink.StageWriter.deleteRecursively(tmp)
      }
    }, Some("""
      SELECT sha256('pipkey|' || CAST(o_orderkey AS VARCHAR)) AS id_orden,
             sha256('pipkey|' || CAST(o_custkey AS VARCHAR)) AS id_cliente,
             CAST(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(18,2))
               AS DOUBLE) AS importe
      FROM orders ORDER BY id_orden"""))),

    // D193+D200 — row-policy propagation through the pipeline (round
    // 11): a policied raw source's row policies follow the raw→stage
    // transform automatically when their predicates rewrite through
    // PURE 1:1 renames (Lineage.renamesOf — values unchanged, meaning
    // intact); a policy touching an expression-derived column stands
    // down and the transform REFUSES until the operator declares an
    // explicit stage policy for that profile (fail-closed: a stage twin
    // must never silently lose a raw row restriction). Both arms run:
    // the refusal is require()d to land BEFORE any write, then the
    // explicit cover is declared and the governed stage reads are
    // oracled end-to-end for the propagated profile AND the covered
    // one, with the plane surviving a registry reset (durability).
    "e2e_pipeline_policies" -> (((spark, dir) => {
      import graft.config.{ColumnMetadata, LoadType, TableConfig}
      import graft.sources.AccessTags
      val tmp = Q.scratchDir("pipepol_gate")
      try {
        val rawPath = tmp.resolve("raw").toString
        val stagePath = tmp.resolve("stage").toString
        load(spark, dir, "orders")
          .select(col("o_orderkey").cast("string").as("numdoc"),
            col("o_orderstatus").as("estado"),
            col("o_totalprice").cast("string").as("monto"))
          .write.parquet(rawPath)
        AccessTags.tagTable(rawPath, Map(
          "numdoc" -> "id", "estado" -> "meta", "monto" -> "meta"))
        // analyst's predicate references estado — a pure rename below,
        // so it PROPAGATES; auditor's references monto, which the
        // transform re-types through fn_transform_Numeric — stands down
        AccessTags.tagRows(rawPath, Map(
          "analyst" -> "estado = 'O'",
          "auditor" -> "monto <> ''"))
        Q.Phase.setupDone() // op = the policy-propagating pipeline
        // runs, refusal arms included (refusing BEFORE the write is
        // the operator semantics under test, not a proof afterthought)
        val cfg = TableConfig("*", LoadType.Full, "auto", "", 0, 0,
          "", "", "", "", "", "G1", "dbo", "orders", "m", "m_orders2",
          "a", "1")
        val meta = Seq(
          ColumnMetadata("id_doc", 1, false, false, false, false,
            "string", "t", "numdoc"), // pure rename
          ColumnMetadata("estado_doc", 2, false, false, false, false,
            "string", "t", "estado"), // pure rename
          ColumnMetadata("importe", 3, false, false, false, false,
            "numeric(18,2)", "t", "fn_transform_Numeric(monto)"))
        val refused = try {
          graft.run.TablePipeline.transform(spark, rawPath, stagePath,
            cfg, meta); false
        } catch { case _: IllegalArgumentException => true }
        require(refused, "a stood-down policy without explicit stage " +
          "cover must refuse the transform")
        require(!java.nio.file.Files.exists(
          java.nio.file.Paths.get(stagePath)),
          "the refused transform must write NOTHING (fail-closed " +
            "before the write)")
        // the operator covers the auditor explicitly against the STAGE
        // schema; the analyst policy still propagates automatically —
        // onto the AUTO plane (provenance separate from declarations)
        AccessTags.tagRows(stagePath, Map("auditor" -> "importe >= 1000"))
        graft.run.TablePipeline.transform(spark, rawPath, stagePath,
          cfg, meta)
        val explicitGot = AccessTags.rowPoliciesOf(stagePath)
        val autoGot = AccessTags.autoRowPoliciesOf(stagePath)
        require(explicitGot.keySet == Set("auditor") &&
          autoGot.keySet == Set("analyst") &&
          autoGot("analyst").contains("estado_doc"),
          s"policy planes wrong: explicit=$explicitGot auto=$autoGot")
        // PROVENANCE arm: the analyst's raw policy changes to one that
        // STANDS DOWN — the re-run must refuse; last run's AUTO
        // derivation must not masquerade as explicit cover
        AccessTags.tagRows(rawPath, Map(
          "analyst" -> "monto <> ''", "auditor" -> "monto <> ''"))
        val refused2 = try {
          graft.run.TablePipeline.transform(spark, rawPath, stagePath,
            cfg, meta); false
        } catch { case _: IllegalArgumentException => true }
        require(refused2, "a stale auto-propagated predicate must not " +
          "count as explicit cover on a re-run")
        // restore and re-run to the final governed state — with the
        // analyst predicate QUALIFIED by the raw table's basename
        // (r12 arm): `raw.estado` must resolve through the rename map
        // exactly like the bare form and rewrite to the BARE stage
        // column (LF data-cell filters in the reference are declared
        // against a named table, so qualified predicates are the
        // config-audit-realistic shape)
        AccessTags.tagRows(rawPath, Map(
          "analyst" -> "raw.estado = 'O'", "auditor" -> "monto <> ''"))
        graft.run.TablePipeline.transform(spark, rawPath, stagePath,
          cfg, meta)
        val autoQual = AccessTags.autoRowPoliciesOf(stagePath)
        require(autoQual.keySet == Set("analyst") &&
          autoQual("analyst").contains("estado_doc") &&
          !autoQual("analyst").toLowerCase.contains("raw."),
          "a qualified raw predicate must propagate with the " +
            s"qualifier rewritten away, got $autoQual")
        AccessTags.resetMemory() // plane durable across restart
        val analyst = AccessTags.Profile("analyst", Map(
          "id" -> AccessTags.Tokenize, "meta" -> AccessTags.Open),
          key = "polkey")
        val auditor = AccessTags.Profile("auditor", Map(
          "meta" -> AccessTags.Open))
        val va = AccessTags.taggedView(spark, stagePath, analyst)
          .select(lit("analyst").as("who"), col("id_doc"),
            col("estado_doc"),
            col("importe").cast("double").as("importe"))
        val vb = AccessTags.taggedView(spark, stagePath, auditor)
          .select(lit("auditor").as("who"),
            lit(null).cast("string").as("id_doc"), col("estado_doc"),
            col("importe").cast("double").as("importe"))
        va.unionByName(vb)
          .orderBy("who", "id_doc", "estado_doc", "importe")
          .localCheckpoint() // materialize before the scratch dir dies
      } finally {
        graft.sources.AccessTags.untagTable(tmp.resolve("raw").toString)
        graft.sources.AccessTags.untagTable(tmp.resolve("stage").toString)
        graft.sink.StageWriter.deleteRecursively(tmp)
      }
    }, Some("""
      WITH t AS (SELECT CAST(o_orderkey AS VARCHAR) AS numdoc,
                        o_orderstatus AS estado,
                        CAST(CAST(CAST(o_totalprice AS VARCHAR)
                          AS DECIMAL(18,2)) AS DOUBLE) AS importe
                 FROM orders)
      SELECT * FROM (
        SELECT 'analyst' AS who, sha256('polkey|' || numdoc) AS id_doc,
               estado AS estado_doc, importe
        FROM t WHERE estado = 'O'
        UNION ALL
        SELECT 'auditor' AS who, NULL AS id_doc, estado AS estado_doc,
               importe
        FROM t WHERE importe >= 1000)
      ORDER BY who, id_doc NULLS FIRST, estado_doc, importe"""))),

    // D192 — schema-catalog export (sources.SchemaExport), the
    // generate_dbml twin (utils/generate_dbml/output.dbml:1-20): the
    // warehouse DBML doc from parquet-footer schemas + DECLARED RELY
    // edges (exact refs, where the reference guesses by column naming).
    // The gate RENDERS the document, then parses it back into (table,
    // column, type, flags) rows; the oracle rebuilds the same rows from
    // DuckDB's DESCRIBE + the same declared edges (declarations are
    // config — pinned into the SQL like every driver-side constant).
    "q_schema_export" -> (((spark, dir) => {
      import spark.implicits._
      // declarations write through to durable `__fks__` sidecars
      // (round 10) — declare on warehouse copies, never the read-only
      // source dir (governance attaches where the catalog can write)
      val tmp = Q.scratchDir("dbml_gate")
      val nation = tmp.resolve("nation").toString
      val region = tmp.resolve("region").toString
      val customer = tmp.resolve("customer").toString
      load(spark, dir, "nation").write.parquet(nation)
      load(spark, dir, "region").write.parquet(region)
      load(spark, dir, "customer").write.parquet(customer)
      graft.plans.Constraints.declareFk(nation, Seq("n_regionkey"),
        region, Seq("r_regionkey"))
      graft.plans.Constraints.declareFk(customer, Seq("c_nationkey"),
        nation, Seq("n_nationkey"))
      // restart simulation: the export below must rebuild its edge view
      // from the sidecars alone (D192 composing with the durable plane)
      graft.plans.Constraints.resetMemory()
      try {
        val text = graft.sources.SchemaExport.dbml(spark,
          Seq("customer" -> customer, "nation" -> nation,
            "region" -> region),
          extraPks = Map("customer" -> Seq("c_custkey")))
        require(text.contains("ref: > region.r_regionkey") &&
          text.contains("ref: > nation.n_nationkey"),
          "declared edges must render as refs")
        val rows = scala.collection.mutable.Buffer
          .empty[(String, String, String, String)]
        var cur = ""
        text.linesIterator.foreach { l =>
          if (l.startsWith("Table "))
            cur = l.stripPrefix("Table ").stripSuffix(" {")
          else if (l.startsWith("  ")) {
            val body = l.trim
            val (decl, flags) = body.indexOf(" [") match {
              case -1 => (body, "")
              case i => (body.substring(0, i),
                body.substring(i + 2, body.length - 1))
            }
            val parts = decl.split(" ", 2)
            rows += ((cur, parts(0), parts(1), flags))
          }
        }
        rows.toSeq.toDF("tbl", "col", "typ", "flags")
          .orderBy("tbl", "col")
          .localCheckpoint() // materialize before the scratch dir dies
      } finally {
        graft.plans.Constraints.drop(nation, region)
        graft.plans.Constraints.drop(customer, nation)
        graft.sink.StageWriter.deleteRecursively(tmp)
      }
    }, Some("""
      WITH cols AS (
        SELECT 'customer' AS tbl, column_name AS col, column_type AS dt
        FROM (DESCRIBE SELECT * FROM customer)
        UNION ALL
        SELECT 'nation', column_name, column_type
        FROM (DESCRIBE SELECT * FROM nation)
        UNION ALL
        SELECT 'region', column_name, column_type
        FROM (DESCRIBE SELECT * FROM region))
      SELECT tbl, col,
             CASE lower(dt) WHEN 'varchar' THEN 'varchar'
                  WHEN 'integer' THEN 'int' WHEN 'bigint' THEN 'bigint'
                  WHEN 'double' THEN 'float' WHEN 'boolean' THEN 'boolean'
                  WHEN 'date' THEN 'date' ELSE lower(dt) END AS typ,
             CASE WHEN tbl = 'customer' AND col = 'c_custkey' THEN 'pk'
                  WHEN tbl = 'nation' AND col = 'n_nationkey' THEN 'pk'
                  WHEN tbl = 'region' AND col = 'r_regionkey' THEN 'pk'
                  WHEN tbl = 'nation' AND col = 'n_regionkey'
                    THEN 'ref: > region.r_regionkey'
                  WHEN tbl = 'customer' AND col = 'c_nationkey'
                    THEN 'ref: > nation.n_nationkey'
                  ELSE '' END AS flags
      FROM cols ORDER BY tbl, col"""))),

    // D209 — GOVERNED schema export (SchemaExport × AccessTags): the
    // DBML document now renders each column's access tags as a note —
    // the handed-out catalog doc SAYS what is governed, like LF-Tags in
    // the reference's console. Tags come from the durable registry
    // (memory cleared pre-render); multi-tag columns render sorted.
    "q_schema_export_governed" -> (((spark, dir) => {
      import spark.implicits._
      val tmp = Q.scratchDir("dbmlgov_gate")
      val docs = tmp.resolve("documents").toString
      try {
        load(spark, dir, "documents").write.parquet(docs)
        graft.sources.AccessTags.tagColumns(docs, Map(
          "doc_id" -> Set("id"),
          "text" -> Set("quality", "freetext"), // multi-tag: sorted note
          "source" -> Set("meta")))
        graft.sources.AccessTags.resetMemory() // durable plane only
        val text = graft.sources.SchemaExport.dbml(spark,
          Seq("documents" -> docs),
          extraPks = Map("documents" -> Seq("doc_id")))
        require(text.contains("note: 'tags: freetext,quality'"),
          "multi-tag columns must render a sorted tag note")
        val rows = scala.collection.mutable.Buffer
          .empty[(String, String, String, String)]
        var cur = ""
        text.linesIterator.foreach { l =>
          if (l.startsWith("Table "))
            cur = l.stripPrefix("Table ").stripSuffix(" {")
          else if (l.startsWith("  ")) {
            val body = l.trim
            val (decl, flags) = body.indexOf(" [") match {
              case -1 => (body, "")
              case i => (body.substring(0, i),
                body.substring(i + 2, body.length - 1))
            }
            val parts = decl.split(" ", 2)
            rows += ((cur, parts(0), parts(1), flags))
          }
        }
        rows.toSeq.toDF("tbl", "col", "typ", "flags")
          .orderBy("tbl", "col")
          .localCheckpoint() // materialize before the scratch dir dies
      } finally {
        graft.sources.AccessTags.untagTable(docs)
        graft.sink.StageWriter.deleteRecursively(tmp)
      }
    }, Some("""
      SELECT 'documents' AS tbl, column_name AS col,
             CASE lower(column_type) WHEN 'varchar' THEN 'varchar'
                  WHEN 'integer' THEN 'int' WHEN 'bigint' THEN 'bigint'
                  WHEN 'double' THEN 'float' ELSE lower(column_type)
             END AS typ,
             CASE column_name
               WHEN 'doc_id' THEN 'pk, note: ''tags: id'''
               WHEN 'text' THEN 'note: ''tags: freetext,quality'''
               WHEN 'source' THEN 'note: ''tags: meta'''
               ELSE '' END AS flags
      FROM (DESCRIBE SELECT * FROM documents)
      ORDER BY tbl, col"""))),

    // D193 — ROW-level policies (AccessTags.tagRows), the Lake Formation
    // data-cells-filter analog completing D191's column plane: per
    // profile, a SQL predicate over the RAW table restricts visible
    // rows BEFORE column shaping — so a policy may gate on a column the
    // profile afterwards loses (here: the analyst is filtered on `lang`
    // yet never sees it). Policies restrict; a profile without one sees
    // every row the column plane allows. Both profiles oracled.
    "c10_rls" -> (((spark, dir) => {
      import graft.sources.AccessTags
      val tmp = Q.scratchDir("rls_gate")
      try {
        val path = tmp.resolve("docs").toString
        load(spark, dir, "documents").write.parquet(path)
        AccessTags.tagTable(path, Map(
          "doc_id" -> "id", "source" -> "meta", "n_chars" -> "meta"))
        AccessTags.tagRows(path, Map("analyst" -> "lang = 'en'"))
        val analyst = AccessTags.Profile("analyst", Map(
          "id" -> AccessTags.Tokenize, "meta" -> AccessTags.Open),
          key = "rlskey")
        val steward = AccessTags.Profile("steward", Map(
          "id" -> AccessTags.Open, "meta" -> AccessTags.Open))
        val av = AccessTags.taggedView(spark, path, analyst)
        val sv = AccessTags.taggedView(spark, path, steward)
        require(!av.columns.contains("lang"),
          "the policy column itself stays closed (untagged)")
        require(av.count() < sv.count(),
          "the row policy must restrict the analyst's rows")
        av.select(lit("analyst").as("profile"), col("doc_id"),
            col("source"), col("n_chars"))
          .unionByName(sv.select(lit("steward").as("profile"),
            col("doc_id").cast("string").as("doc_id"), col("source"),
            col("n_chars")))
          .orderBy("profile", "doc_id")
          .localCheckpoint() // materialize before the scratch dir dies
      } finally {
        graft.sources.AccessTags.untagTable(tmp.resolve("docs").toString)
        graft.sink.StageWriter.deleteRecursively(tmp)
      }
    }, Some("""
      WITH a AS (SELECT 'analyst' AS profile,
                   sha256('rlskey|' || CAST(doc_id AS VARCHAR)) AS doc_id,
                   source, n_chars
                 FROM documents WHERE lang = 'en'),
      s AS (SELECT 'steward' AS profile, CAST(doc_id AS VARCHAR) AS doc_id,
              source, n_chars
            FROM documents)
      SELECT * FROM (SELECT * FROM a UNION ALL SELECT * FROM s)
      ORDER BY profile, doc_id"""))),

    // D196 — tag PROPAGATION through column lineage (AccessTags.
    // propagateTags over plans.Lineage): the laundering hole of every
    // static registry — `SELECT user_id AS uid FROM governed` yields an
    // untagged copy. Derived columns inherit the UNION of their source
    // columns' tags; a column MIXING a PII source with an open one
    // reads under the most restrictive action (the concat-an-id-into-a-
    // string trick comes out tokenized); literals inherit nothing and
    // stay default-closed. Both the registry contents and the governed
    // read are require()d; the view is oracled.
    "c10_tag_propagation" -> (((spark, dir) => {
      import graft.sources.AccessTags
      val tmp = Q.scratchDir("tagprop_gate")
      try {
        val base = tmp.resolve("docs").toString
        val derived = tmp.resolve("derived").toString
        load(spark, dir, "documents").write.parquet(base)
        AccessTags.tagTable(base, Map(
          "doc_id" -> "id", "text" -> "freetext",
          "source" -> "meta", "n_chars" -> "meta"))
        val d = spark.read.parquet(base)
          .filter(col("lang") === "en") // control flow: taints nothing
          .select(col("doc_id").as("uid"),
            concat(col("doc_id"), lit(":"), col("source")).as("user_ref"),
            (col("n_chars") * 2).as("nc2"),
            lit("x").as("freebie"))
        d.write.parquet(derived)
        val inherited = AccessTags.propagateTags(d, derived)
        require(inherited == Map(
          "uid" -> Set("id"),
          "user_ref" -> Set("id", "meta"),
          "nc2" -> Set("meta")),
          s"lineage-inherited tags wrong: $inherited")
        val analyst = AccessTags.Profile("analyst", Map(
          "id" -> AccessTags.Tokenize, "meta" -> AccessTags.Open),
          key = "pkey")
        val v = AccessTags.taggedView(spark, derived, analyst)
        require(v.columns.toSet == Set("uid", "user_ref", "nc2"),
          "the un-derived literal must stay closed (no inherited tag)")
        require(v.filter(!col("user_ref").rlike("^[0-9a-f]{64}$")).isEmpty,
          "a column MIXING an id source must come out tokenized")
        v.orderBy("uid")
          .localCheckpoint() // materialize before the scratch dir dies
      } finally {
        graft.sources.AccessTags.untagTable(tmp.resolve("docs").toString)
        graft.sources.AccessTags.untagTable(
          tmp.resolve("derived").toString)
        graft.sink.StageWriter.deleteRecursively(tmp)
      }
    }, Some("""
      WITH d AS (SELECT doc_id AS uid,
                   concat(CAST(doc_id AS VARCHAR), ':', source)
                     AS user_ref,
                   n_chars * 2 AS nc2
                 FROM documents WHERE lang = 'en')
      SELECT sha256('pkey|' || CAST(uid AS VARCHAR)) AS uid,
             sha256('pkey|' || user_ref) AS user_ref, nc2
      FROM d ORDER BY uid"""))),

    // D194 — distinct-l-diversity release gating (Privacy.
    // lDiversityReport/suppressLowDiversity, Machanavajjhala et al.
    // 2007): k-anonymity alone leaks when a big QI group is HOMOGENEOUS
    // in the sensitive attribute — the gate constructs exactly that
    // ('error' events share one sensitive value), require()s that such
    // groups pass k yet fail l, and oracles the full audit report. One
    // map-side-combinable count + count-distinct per QI group.
    "llm_l_diversity" -> (((spark, dir) => {
      val t = load(spark, dir, "events")
        .select(col("event_type"),
          pmod(col("user_id"), lit(97)).as("region"),
          when(col("event_type") === "error", lit("x"))
            .otherwise(pmod(col("event_id"), lit(4)).cast("string"))
            .as("sens"))
      val report = graft.llm.Privacy.lDiversityReport(t,
        Seq("event_type", "region"), "sens", k = 10L, l = 2L)
      val homogeneous = report.filter(
        col("n") >= 10 && col("released") === 0L)
      require(homogeneous.count() > 0,
        "k-passing homogeneous groups must exist AND be suppressed")
      val kept = graft.llm.Privacy.suppressLowDiversity(t,
        Seq("event_type", "region"), "sens", k = 10L, l = 2L).count()
      val reportSum = report.filter(col("released") === 1L)
        .agg(sum(col("n"))).head().getLong(0)
      require(kept == reportSum,
        s"released rows ($kept) must equal the report's sum ($reportSum)")
      report.orderBy("event_type", "region")
    }, Some("""
      WITH t AS (SELECT event_type, user_id % 97 AS region,
                   CASE WHEN event_type = 'error' THEN 'x'
                        ELSE CAST(event_id % 4 AS VARCHAR) END AS sens
                 FROM events)
      SELECT event_type, region, CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT sens) AS BIGINT) AS n_sensitive,
             CAST(CASE WHEN count(*) >= 10
                        AND count(DISTINCT sens) >= 2
                       THEN 1 ELSE 0 END AS BIGINT) AS released
      FROM t GROUP BY 1, 2 ORDER BY 1, 2"""))),

    // D195 — column-level lineage extraction (plans.Lineage): one
    // bottom-up walk of the ANALYZED plan maps every output column to
    // the (source table, source column) leaves it derives from — VALUE
    // lineage (join/filter columns influence rows, not bytes, and are
    // excluded per the OpenLineage contract). Pure plan metadata, zero
    // jobs. The expected mapping is pinned into the oracle the way
    // every driver-side-constant gate pins its constants — and the
    // require()s assert the semantic facts independently.
    "q_lineage" -> (((spark, dir) => {
      import spark.implicits._
      val q = load(spark, dir, "lineitem")
        .join(load(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum(d18(col("l_extendedprice")) *
            (lit(1).cast("decimal(18,2)") - d18(col("l_discount"))))
          .as("revenue"), count(lit(1)).as("n"))
      val edges = graft.plans.Lineage.of(q)
      require(edges.filter(_.outCol == "revenue").map(e =>
        (e.srcTable, e.srcCol)).toSet ==
        Set(("lineitem", "l_extendedprice"), ("lineitem", "l_discount")),
        s"revenue must trace to price+discount, got $edges")
      require(edges.filter(_.outCol == "o_orderpriority").map(e =>
        (e.srcTable, e.srcCol)).toSet ==
        Set(("orders", "o_orderpriority")),
        "grouping key must trace to its source")
      require(!edges.exists(e => e.srcCol == "l_orderkey" ||
        e.srcCol == "o_orderkey"),
        "join keys are control flow, not value lineage")
      require(!edges.exists(_.outCol == "n"),
        "count(1) derives from no source column")
      edges.map(e => (e.outCol, e.srcTable, e.srcCol))
        .toDF("out_col", "src_table", "src_col")
        .orderBy("out_col", "src_table", "src_col")
    }, Some("""
      SELECT * FROM (VALUES
        ('o_orderpriority', 'orders', 'o_orderpriority'),
        ('revenue', 'lineitem', 'l_discount'),
        ('revenue', 'lineitem', 'l_extendedprice'))
        AS t(out_col, src_table, src_col)
      ORDER BY out_col, src_table, src_col"""))),

    // D138 — STREAMING interval coalescing (Streams.coverageStream), the
    // watermark-fenced twin of D135: intervals arrive out of order across
    // micro-batches (odd users' intervals land before even users', one
    // file per trigger), per-key state holds only the OPEN merged islands,
    // and an island is emitted exactly when the watermark passes its end —
    // no admissible future interval can still merge into it, so emission
    // is final without buffering raw intervals. An EventTimeTimeout
    // re-visits keys whose rows stopped; a far-future sentinel closes the
    // stream. The oracle is the BATCH gaps-and-islands replay — identical
    // text to evt_coverage's, which order-independence guarantees.
    "evt_stream_coverage" -> (((spark, dir) => withStreamPartitions(spark) {
      import org.apache.spark.sql.streaming.Trigger
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tmp = Q.scratchDir("cov_gate")
      try {
        val src = tmp.resolve("src").toString
        val ev = load(spark, dir, "events")
        val iv = ev.select(col("user_id"), col("ts").as("s"),
          (col("ts") + floor(col("value") * 60) * 1000000000L).as("e"))
          .withColumn("event_time",
            timestamp_micros((col("s") / 1000).cast("long")))
        Q.FixtureCache.link(spark, s"$dir|cov_odd", src)(
          iv.filter(col("user_id") % 2 === 1).coalesce(1))
        Q.FixtureCache.link(spark, s"$dir|cov_even", src)(
          iv.filter(col("user_id") % 2 === 0).coalesce(1))
        // sentinel: pushes the final watermark past every real island end
        // (+200 d − 180 d lateness = +20 d) without closing its own island
        Q.FixtureCache.link(spark, s"$dir|cov_sentinel", src) {
          val mx = ev.agg(max(col("ts"))).head().getLong(0)
          val sNs = mx + 200L * 86400 * 1000000000L
          spark.range(1).select(lit(-999L).as("user_id"), lit(sNs).as("s"),
              lit(sNs).as("e"),
              timestamp_micros(lit(sNs / 1000)).as("event_time"))
            .coalesce(1)
        }
        val schema = spark.read.parquet(src).schema
        // one-file-per-batch forces INCREMENTAL watermark advancement —
        // a correctness-protocol constraint (Q.benchLean contract); in
        // one batch the final no-data micro-batch flushes the same
        // islands at the same watermark
        val in = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger",
            if (Q.benchLean) "1000" else "1")
          .parquet(src)
        val islands = graft.streaming.Streams.coverageStream(
          in.as[graft.streaming.Streams.Interval](
            org.apache.spark.sql.Encoders.product),
          lateness = "180 days")
        val sink = s"evt_stream_cov_${Q.nextSinkId()}"
        val q = islands.toDF().writeStream.format("memory").queryName(sink)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        spark.table(sink)
          .filter(col("user_id") =!= -999L)
          .groupBy(col("user_id"))
          .agg(sum(col("n_merged")).as("n_intervals"),
            count(lit(1)).as("n_islands"),
            sum(col("i_end") - col("i_start")).as("covered"),
            max(col("i_end") - col("i_start")).as("longest"))
          .orderBy("user_id")
          .localCheckpoint() // materialize before the scratch dir dies
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some("""
      WITH iv AS (
        SELECT user_id, epoch_ns(ts) AS s,
               epoch_ns(ts) + CAST(floor("value" * 60) AS BIGINT)
                 * 1000000000 AS e
        FROM events),
      marked AS (
        SELECT user_id, s, e,
               max(e) OVER (PARTITION BY user_id ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        FROM iv),
      opened AS (
        SELECT user_id, s, e,
               CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS o
        FROM marked),
      islands AS (
        SELECT user_id, s, e,
               sum(o) OVER (PARTITION BY user_id ORDER BY s, e
                 ROWS UNBOUNDED PRECEDING) AS island
        FROM opened),
      merged AS (
        SELECT user_id, island, min(s) AS i_start, max(e) AS i_end,
               count(*) AS n_merged
        FROM islands GROUP BY user_id, island)
      SELECT user_id, CAST(sum(n_merged) AS BIGINT) AS n_intervals,
             count(*) AS n_islands,
             CAST(sum(i_end - i_start) AS BIGINT) AS covered,
             max(i_end - i_start) AS longest
      FROM merged GROUP BY user_id ORDER BY user_id"""))),

    // D237 — STREAMING session windows (Streams.sessionStream), the
    // watermark-fenced twin of evt_sessionize: events arrive out of
    // order across micro-batches (odd users before even, one file per
    // trigger), per-key state holds only the OPEN sessions (an event
    // merges everything within the 1 h gap — possibly bridging two
    // sessions — so the result is a function of the event-time
    // multiset, arrival-order-independent), and a session is emitted
    // exactly when the watermark passes end + gap. Totals ride exact
    // DECIMAL(18,2) cents through state so the batch twin's decimal
    // fold replays bit-for-bit. Oracle: the batch gaps-and-islands
    // sessionizer reshaped to (start, end, n, total).
    "evt_stream_sessions" -> (((spark, dir) =>
        withStreamPartitions(spark) {
      import org.apache.spark.sql.streaming.Trigger
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tmp = Q.scratchDir("sess_gate")
      try {
        val src = tmp.resolve("src").toString
        val ev = load(spark, dir, "events")
        val se = ev.select(col("user_id"), col("ts"),
            (col("value").cast("decimal(18,2)") * 100).cast("long")
              .as("cents"))
          .withColumn("event_time",
            timestamp_micros((col("ts") / 1000).cast("long")))
        Q.FixtureCache.link(spark, s"$dir|sess_odd", src)(
          se.filter(col("user_id") % 2 === 1).coalesce(1))
        Q.FixtureCache.link(spark, s"$dir|sess_even", src)(
          se.filter(col("user_id") % 2 === 0).coalesce(1))
        // sentinel: pushes the final watermark past every real
        // session's end + gap (+200 d − 180 d lateness = +20 d)
        Q.FixtureCache.link(spark, s"$dir|sess_sentinel", src) {
          val mx = ev.agg(max(col("ts"))).head().getLong(0)
          val sNs = mx + 200L * 86400 * 1000000000L
          spark.range(1).select(lit(-999L).as("user_id"),
              lit(sNs).as("ts"), lit(0L).as("cents"),
              timestamp_micros(lit(sNs / 1000)).as("event_time"))
            .coalesce(1)
        }
        val schema = spark.read.parquet(src).schema
        // one-file-per-batch forces incremental watermark advancement;
        // in one batch the final no-data micro-batch flushes the same
        // sessions at the same watermark (Q.benchLean contract)
        val in = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger",
            if (Q.benchLean) "1000" else "1")
          .parquet(src)
        val sessions = graft.streaming.Streams.sessionStream(
          in.as[graft.streaming.Streams.SessEvent](
            org.apache.spark.sql.Encoders.product),
          gapNs = 3600L * 1000000000L, lateness = "180 days")
        val sink = s"evt_stream_sess_${Q.nextSinkId()}"
        val q = sessions.toDF().writeStream.format("memory")
          .queryName(sink)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        spark.table(sink)
          .filter(col("user_id") =!= -999L)
          .select(col("user_id"), expr("start_ns div 1000").as("start_us"),
            expr("end_ns div 1000").as("end_us"), col("n_events"),
            (col("cents") / lit(100.0)).as("total"))
          .orderBy("user_id", "start_us")
          .localCheckpoint() // materialize before the scratch dir dies
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some("""
      WITH marked AS (
        SELECT user_id, epoch_ns(ts) AS tsn, "value",
               CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts)) OVER
                      (PARTITION BY user_id ORDER BY epoch_ns(ts))
                    > 3600 * CAST(1000000000 AS BIGINT)
                    THEN 1 ELSE 0 END AS new_s
        FROM events),
      sess AS (
        SELECT user_id, tsn, "value",
               CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tsn
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM marked)
      SELECT user_id, min(tsn) // 1000 AS start_us,
             max(tsn) // 1000 AS end_us, count(*) AS n_events,
             CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM sess GROUP BY user_id, session_id
      ORDER BY user_id, start_us"""))),

    // Battery hardening (not a SURVEY row): VALUE-based (RANGE) window
    // frames — every other window gate is row-framed; a trailing-hour
    // frame is defined by the ORDER value, includes ties symmetrically
    // in both engines, and exercises Spark's rangeBetween codepath.
    "evt_range_frame" -> (((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hour = 3600L * 1000000000L
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        .rangeBetween(-hour, 0)
      load(spark, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
          count(lit(1)).over(w).as("n_1h"),
          sum(d18(col("value"))).over(w).cast("double").as("sum_1h"))
        .orderBy("event_id")
    }, Some("""
      SELECT event_id, user_id, epoch_ns(ts) AS ts,
             count(*) OVER w AS n_1h,
             CAST(sum(CAST("value" AS DECIMAL(18,2))) OVER w AS DOUBLE)
               AS sum_1h
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)
        RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW)
      ORDER BY event_id"""))),

    // D143 — the governed-release pipeline COMPOSITION: anonymize
    // (D132) → leakage-safe split (D133) → per-split release manifest
    // (doc counts, token totals, per-split distinct sources) — the
    // end-to-end path a dataset takes from curated corpus to published
    // train/val/test artifact. One pass: the k-anonymity semi-join and
    // the split assignment are both per-row against broadcast tables, so
    // the compose adds nothing over its parts.
    "llm_release_pipeline" -> (((spark, dir) => {
      // coarser QI than the D132 gate: the release predicate must keep a
      // publishable corpus at gate scale (500 docs — a (lang, source,
      // length) QI suppresses nearly everything at k=20)
      val docs = load(spark, dir, "documents")
      val anon = graft.llm.Privacy.kAnonymize(docs,
        Seq("lang", "source"), 5)
      graft.llm.Splits.byGroupHash(anon.withColumn("grp", md5(col("text"))),
          col("grp"), Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(graft.llm.TextAnalysis.tokenCount(col("text")).cast("long"))
            .as("n_tokens"),
          count_distinct(col("source")).as("n_sources"))
        .orderBy("split")
    }, Some("""
      WITH safe AS (
        SELECT lang, source
        FROM documents GROUP BY 1, 2 HAVING count(*) >= 5),
      anon AS (
        SELECT d.* FROM documents d
        JOIN safe ON d.lang = safe.lang AND d.source = safe.source),
      s AS (
        SELECT *, CASE WHEN CAST('0x' || substring(md5(md5(text)), 1, 15)
                         AS BIGINT) % 100 < 80 THEN 'train'
                       WHEN CAST('0x' || substring(md5(md5(text)), 1, 15)
                         AS BIGINT) % 100 < 90 THEN 'val'
                       ELSE 'test' END AS split
        FROM anon)
      SELECT split, count(*) AS n_docs,
             CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(string_split_regex(trim(text), '\s+')) END)
               AS BIGINT) AS n_tokens,
             count(DISTINCT source) AS n_sources
      FROM s GROUP BY split ORDER BY split"""))),

    // D142 — AUTOMATIC stats-sidecar file pruning (plans.StatsFilePrune,
    // a Rule[LogicalPlan] on the session optimizer): a plain
    // spark.read.parquet(...).filter(key range) over a sidecar-carrying
    // table skips non-intersecting files WITHOUT the reader opting in —
    // Delta's transparent log-stats skipping on the parquet fallback,
    // where D107's prunedRead required an explicit call. The gate writes
    // orders range-partitioned + optimized (sidecar), queries through
    // the rule, REQUIREs that files were actually skipped, and
    // hash-matches the aggregate against the full-table oracle — a
    // mis-prune loses rows and fails the hash.
    "q_auto_prune" -> (((spark, dir) => {
      val tmp = Q.scratchDir("autoprune")
      try {
        val path = tmp.resolve("orders").toString
        load(spark, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .repartitionByRange(8, col("o_orderkey"))
          .write.parquet(path)
        graft.sink.StageWriter.optimize(spark, path,
          targetFileBytes = 64 * 1024, statsColumn = Some("o_orderkey"))
        // idempotent permanent install — scoped save/restore raced with
        // concurrent users of the session-global list (see companion)
        graft.plans.StatsFilePrune.ensureInstalled(spark)
        val q = spark.read.parquet(path)
          .filter(col("o_orderkey") >= 2000 && col("o_orderkey") < 5000)
        val scanned = q.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation =>
            lr.relation.asInstanceOf[org.apache.spark.sql.execution
              .datasources.HadoopFsRelation].location.inputFiles.length
        }.head
        val total = graft.sink.StageWriter.listDataFiles(
          java.nio.file.Paths.get(path)).size
        require(total >= 4 && scanned < total,
          s"auto-prune did not skip: read $scanned of $total files")
        q.agg(count(lit(1)).as("n"),
            count_distinct(col("o_custkey")).as("n_cust"),
            dsum(col("o_totalprice")).as("total"))
          .localCheckpoint() // materialize before the scratch dir dies
      } finally graft.sink.StageWriter.deleteRecursively(tmp)
    }, Some("""
      SELECT count(*) AS n, count(DISTINCT o_custkey) AS n_cust,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total
      FROM orders WHERE o_orderkey >= 2000 AND o_orderkey < 5000"""))),

    // D141 — cross-source quantile normalization (Bolstad et al. 2003):
    // each doc's WITHIN-source length percentile maps onto the GLOBAL
    // distribution's value at that percentile (B=64 breakpoints), so one
    // global threshold curates mixed crawls fairly. No global window:
    // source-partitioned percent_rank, a value-HISTOGRAM cdf (window
    // over distinct values — bounded domain), breakpoints via a B-row
    // grid, rows mapped by equi-join on floor(p·B).
    "llm_quantile_norm" -> (((spark, dir) => {
      graft.operators.QuantileNorm.normalize(
          load(spark, dir, "documents")
            .select("doc_id", "source", "n_chars"),
          "source", "n_chars", "doc_id", b = 64)
        .select("doc_id", "source", "n_chars", "norm")
        .orderBy("doc_id")
    }, Some("""
      WITH p AS (SELECT doc_id, source, n_chars,
                   percent_rank() OVER (PARTITION BY source
                     ORDER BY n_chars, doc_id) AS pr
                 FROM documents),
      tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
      cdf AS (SELECT n_chars AS v, count(*) AS c FROM documents
              GROUP BY 1),
      cum AS (SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                     / (SELECT n FROM tot) AS frac
              FROM cdf),
      bps AS (SELECT j, min(v) AS bp
              FROM (SELECT unnest(range(0, 65)) AS j) g
              LEFT JOIN cum ON frac >= CAST(j AS DOUBLE) / 64
              GROUP BY j)
      SELECT p.doc_id, p.source, p.n_chars, bps.bp AS norm
      FROM p JOIN bps
        ON bps.j = least(CAST(floor(p.pr * 64) AS INT), 64)
      ORDER BY doc_id"""))),

    // D140 — sorted-neighborhood dedup (Hernández & Stolfo 1995), the
    // complement of q_fuzzy's equality blocking: records sort by the
    // dirty key itself, so near-duplicates with a dirty BLOCKING key
    // still land adjacent. Distributed form: order-consistent prefix
    // buckets + per-bucket rank windows + a metadata-sized bucket-chain
    // window; candidates = rank distance <= w intra-bucket plus
    // tail×head across adjacent buckets; levenshtein verifies. The
    // oracle replays bucketing, ranking, the chain, both candidate arms
    // and the verification.
    "q_sorted_neighborhood" -> (((spark, dir) => {
      graft.operators.SortedNeighborhood.pairs(
          load(spark, dir, "part").select(col("p_partkey"), col("p_name")),
          "p_partkey", col("p_name"), substring(col("p_name"), 1, 3),
          w = 3, maxDist = 4)
        .orderBy("id1", "id2")
    }, Some("""
      WITH base AS (SELECT p_partkey AS id, p_name AS k,
                           substring(p_name, 1, 3) AS b FROM part),
      ranked AS (SELECT *, row_number() OVER (PARTITION BY b
                   ORDER BY k, id) AS r FROM base),
      chain AS (SELECT b, count(*) AS n,
                  row_number() OVER (ORDER BY b) AS bi
                FROM ranked GROUP BY b),
      rws AS (SELECT ranked.id, ranked.k, ranked.b, ranked.r,
                     chain.n, chain.bi
              FROM ranked JOIN chain USING (b)),
      cand AS (
        SELECT a.id AS id1, b2.id AS id2, a.k AS k1, b2.k AS k2
        FROM rws a JOIN rws b2
          ON a.b = b2.b AND b2.r > a.r AND b2.r - a.r <= 3
        UNION ALL
        SELECT a.id, b2.id, a.k, b2.k
        FROM rws a JOIN rws b2
          ON b2.bi = a.bi + 1 AND a.r > a.n - 3 AND b2.r <= 3)
      SELECT id1, id2, levenshtein(k1, k2) AS dist
      FROM cand WHERE levenshtein(k1, k2) <= 4
      ORDER BY id1, id2"""))),

    // D139 — incremental SCD2 maintenance (Scd2.applyChanges): a change
    // batch merges into an EXISTING versioned dimension — untouched keys
    // pass through the anti-join unchanged, touched keys rebuild from
    // their own rows + the batch. The batch is a hash-interleaved THIRD
    // of the change set (not a time suffix), so late arrivals must
    // splice INTO history, not just append: any valid_from/valid_to
    // mis-splice diverges from the full-rebuild oracle and fails the
    // hash. Delta-proportional: rewrite work is O(touched versions +
    // batch), never a full-dimension window.
    "evt_scd2_incr" -> (((spark, dir) => {
      val changes = load(spark, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("v"))
        .withColumn("tier", when(col("v") >= 75, "gold")
          .when(col("v") >= 40, "silver").otherwise("bronze"))
        .select("user_id", "ts", "tier")
      val late = Q.portableHash60(col("user_id"), col("ts")) % 3 === 0
      val dim0 = graft.operators.Scd2.build(changes.filter(!late),
        Seq("user_id"), "ts", Seq("tier"))
      val dim = graft.operators.Scd2.applyChanges(dim0,
        changes.filter(late), Seq("user_id"), "ts", Seq("tier"))
      dim.groupBy("tier")
        .agg(count(lit(1)).as("n_versions"),
          sum(when(col("valid_to").isNull, 1L).otherwise(0L)).as("n_open"),
          count_distinct(col("user_id")).as("n_users"),
          min(col("valid_from")).as("first_from"),
          max(col("valid_from")).as("last_from"))
        .orderBy("tier")
    }, Some("""
      WITH ch AS (
        SELECT user_id, epoch_ns(ts) AS t,
               CASE WHEN max("value") >= 75 THEN 'gold'
                    WHEN max("value") >= 40 THEN 'silver'
                    ELSE 'bronze' END AS tier
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      iv AS (SELECT user_id, t AS vf,
               lead(t) OVER (PARTITION BY user_id ORDER BY t) AS vt, tier
             FROM ch)
      SELECT tier, count(*) AS n_versions,
             CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_open,
             count(DISTINCT user_id) AS n_users,
             min(vf) AS first_from, max(vf) AS last_from
      FROM iv GROUP BY tier ORDER BY tier"""))),

    // D132 — k-anonymity suppression (Sweeney's model): a (lang, source,
    // length-bucket) quasi-identifier combination is released only when
    // >= k rows share it. The gate runs BOTH halves — the governance
    // report (every QI combo, size, verdict) and the actual anonymized
    // dataset (Privacy.kAnonymize's broadcast semi-join) — and pins that
    // released combos carry exactly their full row count while suppressed
    // ones contribute zero. Scale: one bounded-cardinality QI aggregation
    // + one broadcast semi-join; the data never shuffles.
    "llm_k_anonymity" -> (((spark, dir) => {
      val k = 20L
      val qi = Seq("lang", "source", "len_bucket")
      val docs = load(spark, dir, "documents")
        .withColumn("len_bucket", expr("n_chars div 64"))
      val rep = graft.llm.Privacy.kAnonymityReport(docs, qi, k)
      val anonN = graft.llm.Privacy.kAnonymize(docs, qi, k)
        .groupBy(qi.map(col): _*).agg(count(lit(1)).as("n_anon"))
      rep.join(anonN, qi, "left")
        .select(col("lang"), col("source"), col("len_bucket"), col("n"),
          col("released"), coalesce(col("n_anon"), lit(0L)).as("n_released"))
        .orderBy("lang", "source", "len_bucket")
    }, Some("""
      WITH g AS (
        SELECT lang, source, n_chars // 64 AS len_bucket, count(*) AS n
        FROM documents GROUP BY 1, 2, 3)
      SELECT lang, source, len_bucket, n,
             CASE WHEN n >= 20 THEN 1 ELSE 0 END AS released,
             CASE WHEN n >= 20 THEN n ELSE 0 END AS n_released
      FROM g ORDER BY lang, source, len_bucket"""))),

    // D133 — leakage-safe train/val/test split: split assignment hashes
    // the duplicate-GROUP identity (here the exact-dup group, md5(text);
    // any cluster label from D30/D119 slots in unchanged), so identical
    // documents can never straddle the train/eval boundary — the split
    // that makes an eval set measure generalization instead of
    // memorization. The gate pins per-split doc/group counts AND the
    // leaked-group count (groups spanning >1 split) as a result column:
    // any violation of the by-construction guarantee fails the hash.
    // Scale: assignment is a pure projection (zero shuffles); the audit
    // aggregations are gate-side evidence, not the operator.
    "llm_split_leakfree" -> (((spark, dir) => {
      val s = graft.llm.Splits.byGroupHash(
        load(spark, dir, "documents").withColumn("grp", md5(col("text"))),
        col("grp"), Seq("train" -> 80, "val" -> 10, "test" -> 10))
      val leak = s.groupBy("grp")
        .agg(count_distinct(col("split")).as("ns"))
        .agg(sum(when(col("ns") > 1, 1L).otherwise(0L))
          .as("leaked_groups"))
      s.groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          count_distinct(col("grp")).as("n_groups"))
        .crossJoin(broadcast(leak))
        .orderBy("split")
    }, Some("""
      WITH s AS (
        SELECT doc_id, md5(text) AS grp,
               CASE WHEN CAST('0x' || substring(md5(md5(text)), 1, 15)
                           AS BIGINT) % 100 < 80 THEN 'train'
                    WHEN CAST('0x' || substring(md5(md5(text)), 1, 15)
                           AS BIGINT) % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents),
      l AS (
        SELECT count(*) AS leaked_groups FROM (
          SELECT grp FROM s GROUP BY grp
          HAVING count(DISTINCT split) > 1))
      SELECT split, count(*) AS n_docs, count(DISTINCT grp) AS n_groups,
             (SELECT leaked_groups FROM l) AS leaked_groups
      FROM s GROUP BY split ORDER BY split"""))),

    // D134 — nearest-centroid (Rocchio) classification: one DECIMAL-exact
    // centroid per label, every vector assigned by rounded cosine, output
    // = the confusion matrix. The standard first probe of "does this
    // embedding space recover this label" before anything heavier is
    // trained; the SQL oracle REPLAYS the training (centroid means) and
    // the assignment, so a drifting centroid or tiebreak fails the hash.
    "sim_centroid_classify" -> (((spark, dir) => {
      graft.llm.Similarity.nearestCentroidClassify(
        load(spark, dir, "embeddings"), "vec_id", "embedding", "label")
        .orderBy("label", "pred")
    }, Some {
      val dot = dotSql("e.v", "c.cv")
      val qq = dotSql("e.v", "e.v")
      val cc = dotSql("c.cv", "c.cv")
      s"""
      WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v, label
                 FROM embeddings),
      cents AS (
        SELECT label AS clabel, list(m ORDER BY i) AS cv FROM (
          SELECT label, i,
                 round(CAST(sum(CAST(v[CAST(i AS INT)] AS DECIMAL(18,8)))
                   AS DOUBLE) / count(*), 6) AS m
          FROM e CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t
          GROUP BY label, i) GROUP BY label),
      assigned AS (
        SELECT id, label, clabel FROM (
          SELECT e.id, e.label, c.clabel,
                 row_number() OVER (PARTITION BY e.id ORDER BY
                   round($dot / (sqrt($qq) * sqrt($cc)), 4) DESC,
                   c.clabel) AS rn
          FROM e CROSS JOIN cents c) WHERE rn = 1)
      SELECT label, clabel AS pred, count(*) AS n
      FROM assigned GROUP BY label, clabel ORDER BY label, pred"""
    })),

    // D136 — triplet mining for contrastive training (FaceNet online
    // selection): per anchor, the hard positive (least-similar same-label
    // vector), the hard negative (most-similar different-label vector),
    // and whether the triplet violates the margin (contributes gradient).
    // One corpus scan, one broadcast of the anchor batch, both extremes
    // from a single map-side-combinable min(struct) aggregation — no
    // window over the score table. The oracle replays selection AND
    // tiebreaks, so a drifted extreme or margin flag fails the hash.
    "sim_triplets" -> (((spark, dir) => {
      val emb = load(spark, dir, "embeddings")
      graft.llm.Similarity.mineTriplets(emb.filter(col("vec_id") < 16),
        emb, "vec_id", "embedding", "label", margin = 0.2)
        .orderBy("anchor_id")
    }, Some {
      val dot = dotSql("e.v", "a.qv")
      val nn = dotSql("e.v", "e.v")
      val qq = dotSql("a.qv", "a.qv")
      s"""
      WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v, label
                 FROM embeddings),
      a AS (SELECT vec_id AS anchor_id, embedding::DOUBLE[] AS qv,
                   label AS alabel
            FROM embeddings WHERE vec_id < 16),
      s AS (
        SELECT a.anchor_id, a.alabel, e.id, e.label,
               round($dot / (sqrt($nn) * sqrt($qq)), 4) AS cos4
        FROM e CROSS JOIN a WHERE e.id <> a.anchor_id),
      pos AS (
        SELECT anchor_id, id AS pos_id, cos4 AS pos_cos4 FROM (
          SELECT anchor_id, id, cos4, row_number() OVER (
            PARTITION BY anchor_id ORDER BY cos4 ASC, id ASC) AS rn
          FROM s WHERE label = alabel) WHERE rn = 1),
      neg AS (
        SELECT anchor_id, id AS neg_id, cos4 AS neg_cos4 FROM (
          SELECT anchor_id, id, cos4, row_number() OVER (
            PARTITION BY anchor_id ORDER BY cos4 DESC, id ASC) AS rn
          FROM s WHERE label <> alabel) WHERE rn = 1)
      SELECT b.anchor_id, pos_id, pos_cos4, neg_id, neg_cos4,
             CASE WHEN pos_cos4 - neg_cos4 < 0.2 THEN 1 ELSE 0 END AS active
      FROM (SELECT DISTINCT anchor_id FROM s) b
      LEFT JOIN pos USING (anchor_id) LEFT JOIN neg USING (anchor_id)
      ORDER BY anchor_id"""
    })),

    // D135 — interval coalescing (gaps-and-islands MERGE): events carry
    // [ts, ts + floor(value·60) s] activity intervals; overlapping ones
    // per user merge into maximal islands, then per-user coverage =
    // interval count, island count, covered nanos, longest island. The
    // answer naive sum(end-start) gets WRONG whenever intervals overlap.
    // One user-keyed exchange end-to-end (two windows + the aggregations
    // share the partitioning) — no self-join, no O(n²) overlap pairing.
    "evt_coverage" -> (((spark, dir) => {
      val iv = load(spark, dir, "events")
        .select(col("user_id"), col("ts").as("s"),
          (col("ts") + floor(col("value") * 60) * 1000000000L).as("e"))
      graft.operators.Intervals.coverage(iv, "user_id", "s", "e")
        .orderBy("user_id")
    }, Some("""
      WITH iv AS (
        SELECT user_id, epoch_ns(ts) AS s,
               epoch_ns(ts) + CAST(floor("value" * 60) AS BIGINT)
                 * 1000000000 AS e
        FROM events),
      marked AS (
        SELECT user_id, s, e,
               max(e) OVER (PARTITION BY user_id ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        FROM iv),
      opened AS (
        SELECT user_id, s, e,
               CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS o
        FROM marked),
      islands AS (
        SELECT user_id, s, e,
               sum(o) OVER (PARTITION BY user_id ORDER BY s, e
                 ROWS UNBOUNDED PRECEDING) AS island
        FROM opened),
      merged AS (
        SELECT user_id, island, min(s) AS i_start, max(e) AS i_end,
               count(*) AS n_merged
        FROM islands GROUP BY user_id, island)
      SELECT user_id, CAST(sum(n_merged) AS BIGINT) AS n_intervals,
             count(*) AS n_islands,
             CAST(sum(i_end - i_start) AS BIGINT) AS covered,
             max(i_end - i_start) AS longest
      FROM merged GROUP BY user_id ORDER BY user_id"""))),

    // D239 — binned point-in-interval join (operators.IntervalJoin):
    // the range-join shape Spark plans as BNL/cartesian-with-filter
    // becomes ONE shuffled equi-join on (user_id, bin) — intervals
    // explode to the 1 h bins they cover, points map to their one bin,
    // the exact BETWEEN filter closes; each pair meets exactly once
    // (in the point's bin), so no dedup pass. The gate require()s the
    // plan carries NO BNL/cartesian before oracling the per-user match
    // aggregate against DuckDB's native BETWEEN join. Errors probe
    // click-activity windows: every 'error' event joined to the
    // [ts, ts + value·60 s] windows of the same user's 'click' events.
    "evt_binned_range_join" -> (((spark, dir) => {
      val ev = load(spark, dir, "events")
      val points = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("t"),
          col("event_id").as("err_id"))
      val iv = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("s"),
          (col("ts") + floor(col("value") * 60) * 1000000000L).as("e"))
      val joined = graft.operators.IntervalJoin.pointInInterval(
        points, iv, keys = Seq("user_id"), ptCol = "t",
        sCol = "s", eCol = "e", binWidth = 3600L * 1000000000L)
      val plan = joined.queryExecution.executedPlan.toString
      require(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        "the binned join must plan as an equi-join, never a BNL")
      joined.groupBy("user_id")
        .agg(count(lit(1)).as("n_matches"),
          countDistinct(col("err_id")).as("n_errors_in_window"),
          expr("min(t - s)").as("min_after_open"))
        .orderBy("user_id")
    }, Some("""
      WITH pts AS (
        SELECT user_id, epoch_ns(ts) AS t, event_id AS err_id
        FROM events WHERE event_type = 'error'),
      iv AS (
        SELECT user_id, epoch_ns(ts) AS s,
               epoch_ns(ts) + CAST(floor("value" * 60) AS BIGINT)
                 * 1000000000 AS e
        FROM events WHERE event_type = 'click')
      SELECT p.user_id, count(*) AS n_matches,
             CAST(count(DISTINCT p.err_id) AS BIGINT)
               AS n_errors_in_window,
             min(p.t - i.s) AS min_after_open
      FROM pts p JOIN iv i
        ON p.user_id = i.user_id AND p.t BETWEEN i.s AND i.e
      GROUP BY p.user_id ORDER BY p.user_id""")))
  )
}
