package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink — the reference reads its report tables from a
  * remote Postgres (`weekly-report.py:31-51`) and its loaders write
  * there (`load-hhs.py`, `load-quality.py`); this is that surface as
  * engine code rather than configuration-by-convention.
  *
  * Scale posture:
  * - Reads PARTITIONED on a numeric column: `numPartitions` concurrent
  *   range-sliced queries (`WHERE col >= l AND col < u`), so a 10^9-row
  *   table arrives as parallel streams instead of one connection's
  *   cursor. Catalyst pushes filters into the remote query
  *   (`PushedFilters` on the JDBC scan node — JdbcSpec asserts it).
  * - Writes batched (`batchsize`), with `numPartitions` capping the
  *   connection fan-in so a 1000-executor write cannot open 1000
  *   simultaneous connections against one database.
  * - No credentials anywhere in code: the url/properties come from the
  *   caller (the reference's credentials.py pattern, inverted — config
  *   flows IN). */
object Jdbc {

  /** Single-stream read — small dimension tables only. */
  def read(spark: SparkSession, url: String, table: String,
      props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Range-partitioned parallel read — the fact-table form. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionCol: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int,
      props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lowerBound, upperBound,
      numPartitions, props)

  /** Batched write with bounded connection fan-in. `coalesce` is a
    * plan-level cap (a no-op when the frame already has fewer
    * partitions), so no `.rdd` materialization is needed to read the
    * partition count — touching `.rdd` forces physical planning and a
    * deserialization lineage of the whole frame just to ask a number. */
  def write(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.ErrorIfExists,
      batchSize: Int = 1000, maxConnections: Int = 8,
      props: java.util.Properties = new java.util.Properties): Unit =
    df.coalesce(maxConnections).write.mode(mode)
      .option("batchsize", batchSize.toLong)
      .jdbc(url, table, props)

  /** Insert-if-absent upsert — the write discipline the reference's
    * loaders get from `INSERT … ON CONFLICT DO NOTHING`
    * (`helper_load_hhs.py:92-99`, `load-quality.py:132-155`), expressed
    * portably (Derby has no ON CONFLICT): the batch is key-deduped
    * Spark-side, staged to a scratch table with the parallel batched
    * writer above, then folded into the target with ONE set-based
    * `INSERT … SELECT … WHERE NOT EXISTS` statement. That statement is
    * atomic (single-statement transaction), the heavy lifting — the
    * anti-join — runs inside the database exactly as the reference's
    * conflict check does, and Spark's side stays embarrassingly
    * parallel: only the staging write touches executors.
    *
    * Scale posture: the staged batch is one micro-batch (bounded), not
    * the corpus; the database-side anti-join is indexed on the target's
    * key in any real deployment. Nothing round-trips rows through the
    * driver. Returns the number of rows actually inserted. */
  def writeIfAbsent(df: DataFrame, url: String, table: String,
      keys: Seq[String], batchSize: Int = 1000, maxConnections: Int = 8,
      props: java.util.Properties = new java.util.Properties): Long = {
    require(keys.nonEmpty, "writeIfAbsent needs at least one key column")
    // In-batch duplicates would all pass a NOT EXISTS against the target;
    // dedup deterministically first (keep-first by the remaining columns).
    val rest = df.columns.filterNot(keys.contains).toSeq
    val deduped =
      if (rest.isEmpty) df.distinct()
      else graft.etl.Etl.dedupFirst(df, keys,
        rest.map(c => org.apache.spark.sql.functions.col(c).asc_nulls_last))
    // Unique per-call staging name: a fixed `<table>_stage` is shared
    // mutable state — two concurrent loads into the same target would
    // overwrite each other's staged batch mid-flight. The token makes
    // each call's scratch space private; the `finally` guarantees no
    // orphan staging table survives an insert failure.
    val staging = s"${table}_stage_${java.util.UUID.randomUUID.toString.replace("-", "").take(16)}"
    write(deduped, url, staging, SaveMode.Overwrite, batchSize, maxConnections, props)

    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val stmt = conn.createStatement()
      def q(c: String) = "\"" + c + "\""
      // Create the target on first load by cloning the staging schema —
      // unquoted identifiers so the dialect applies its own case rules.
      // A concurrent creator losing the CREATE race rechecks and
      // proceeds.
      if (tableName(conn, table).isEmpty) {
        try stmt.executeUpdate(s"CREATE TABLE $table AS SELECT * FROM $staging WITH NO DATA")
        catch {
          case _: java.sql.SQLException if tableName(conn, table).nonEmpty => ()
        }
      }
      // The unique key index is ensured INDEPENDENTLY of table creation:
      // the semantics rest on it (without it two loaders racing the same
      // key can both pass NOT EXISTS and both insert — the reference's
      // ON CONFLICT is backed by a unique index for exactly this
      // reason), and a crash between CREATE TABLE and CREATE INDEX must
      // not leave the table unguarded forever. A genuine index-creation
      // failure (e.g. duplicates already present) propagates.
      if (!keyIndexExists(conn, table, keys)) {
        try stmt.executeUpdate(
          s"CREATE UNIQUE INDEX ${table}_key_ux ON $table (${keys.map(q).mkString(", ")})")
        catch {
          case _: java.sql.SQLException if keyIndexExists(conn, table, keys) => ()
        }
      }
      try {
        // Spark's JDBC writer quotes column identifiers (case-sensitive);
        // unquoted names would be case-folded by the dialect and miss.
        val cols = df.columns.map(q).mkString(", ")
        val keyEq = keys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
        val insertSql =
          s"""INSERT INTO $table ($cols)
             |SELECT $cols FROM $staging s
             |WHERE NOT EXISTS (SELECT 1 FROM $table t WHERE $keyEq)""".stripMargin
        // Two loaders can both pass NOT EXISTS on the same new key; the
        // loser's SET-BASED insert then aborts wholesale on the unique
        // index (SQLState class 23, integrity violation). Retrying
        // re-runs NOT EXISTS against the winner's now-committed rows and
        // inserts the disjoint remainder — recovering the reference's
        // row-level ON CONFLICT DO NOTHING contract at statement level.
        def attempt(left: Int): Long =
          try stmt.executeUpdate(insertSql).toLong
          catch {
            case e: java.sql.SQLException
                if left > 0 && Option(e.getSQLState).exists(_.startsWith("23")) =>
              attempt(left - 1)
          }
        attempt(3)
      } finally {
        try stmt.executeUpdate(s"DROP TABLE $staging")
        catch { case _: java.sql.SQLException => () } // already gone / never created
      }
    } finally conn.close()
  }

  /** The name under which the dialect stores `table`, or None if it does
    * not exist. Spark's JDBC writer emits an UNQUOTED table name, so the
    * database folds it: Derby/Oracle/DB2 fold up, Postgres/MySQL fold
    * down, some store as-is — probe the dialect's declared folding
    * first, then the remaining case variants. `getTables` treats its
    * arguments as LIKE patterns ('_' matches ANY character, so
    * `orders_conc` would match `ordersXconc`), hence the metacharacter
    * escaping; the search is also scoped to the connection's current
    * schema so a same-named table elsewhere cannot shadow the unqualified
    * DML below. */
  private def tableName(conn: java.sql.Connection, table: String): Option[String] = {
    val meta = conn.getMetaData
    // Dialects that declare NO escape string (Derby returns "") cannot
    // have their metacharacters escaped — use the raw name there (a
    // wildcard false positive is recoverable; a false negative re-runs
    // CREATE TABLE and fails the load).
    val esc = Option(meta.getSearchStringEscape).getOrElse("")
    def escape(s: String): String =
      if (esc.isEmpty) s
      else s.replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
    val schema =
      try Option(conn.getSchema).map(escape).orNull
      catch { case _: Throwable => null } // driver without getSchema: all schemas
    val folded =
      if (meta.storesUpperCaseIdentifiers) table.toUpperCase
      else if (meta.storesLowerCaseIdentifiers) table.toLowerCase
      else table
    (folded +: Seq(table, table.toUpperCase, table.toLowerCase)).distinct.find { t =>
      val rs = meta.getTables(null, schema, escape(t), null)
      try rs.next() finally rs.close()
    }
  }

  /** Is there a unique index on the target whose column set is exactly
    * `keys`? Resolved via the stored table name (getIndexInfo takes an
    * exact name, not a pattern). */
  private def keyIndexExists(conn: java.sql.Connection, table: String,
      keys: Seq[String]): Boolean =
    tableName(conn, table).exists { stored =>
      val rs = conn.getMetaData.getIndexInfo(null, null, stored, true, false)
      val byIndex = scala.collection.mutable.Map.empty[String, Set[String]]
      try {
        while (rs.next()) {
          val idx = rs.getString("INDEX_NAME")
          val c = rs.getString("COLUMN_NAME")
          if (idx != null && c != null)
            byIndex(idx) = byIndex.getOrElse(idx, Set.empty) + c
        }
      } finally rs.close()
      byIndex.values.exists(_ == keys.toSet)
    }
}
