package graft.sources

import java.sql.{Connection, DriverManager, SQLException}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.operators.{Cleaning, Upsert}

/** External-store upsert sink — the reference's actual deployment sink
  * (src/storage.py:41-53,126-131): `INSERT … ON CONFLICT (pk) DO UPDATE`
  * into Postgres, DDL derived from the YAML `storage.*.columns` map,
  * update set column-pruned (every insert column except the PK), and
  * `last_seen` EXCLUDED from the insert so the DB-side default fills it
  * (storage.py:46-48).
  *
  * Spark re-expression: per-partition batched JDBC from the executors —
  * the standard distributed upsert shape. Each partition opens one
  * connection and streams its rows through a prepared statement in
  * batches, so throughput scales with partition count and no row ever
  * passes through the driver. At the 100 TB design point the caller
  * bounds connection fan-in with `df.repartition(n)` / `coalesce(n)` to
  * what the target store admits; the per-partition cost is one
  * connection + rows/batchSize round trips.
  *
  * Dialects: [[Postgres]] emits the reference's ON CONFLICT form verbatim
  * as one prepared statement. [[AnsiMerge]] uses the staged-merge shape —
  * each partition bulk-inserts into a private staging table, then issues
  * ONE `MERGE INTO target USING staging`, then drops the staging table.
  * That is both what Derby requires (its MERGE source must be a base
  * table) and the scalable warehouse pattern: per-row upsert statements
  * serialize on the store's write path, a bulk-staged MERGE amortizes to
  * one set-oriented operation per partition. The embedded-Derby round
  * trip in SourcesSpec drives this dialect.
  */
object JdbcUpsert {

  /** One storage table, as declared by the reference YAML
    * (configs/colombia.yml storage.raw / storage.final): ordered
    * `name -> declared SQL type` pairs, the PK, and the columns omitted
    * from insert/update so DB defaults apply (the reference hardcodes
    * last_seen, storage.py:46-48). */
  final case class TableSpec(
      table: String,
      columns: Seq[(String, String)],
      primaryKey: String,
      lookupKey: String,
      insertExclude: Set[String] = Set("last_seen")) {
    def insertColumns: Seq[String] =
      columns.map(_._1).filterNot(insertExclude)
    def declaredType(name: String): String =
      columns.collectFirst { case (n, t) if n == name => t }
        .getOrElse(sys.error(s"no declared type for column '$name'"))
  }

  sealed trait Dialect {
    def upsertSql(spec: TableSpec): String
    def createTableSql(spec: TableSpec): String
    /** Rewrite a reference (Postgres-flavored) declared type for this
      * dialect's DDL. */
    def ddlType(declared: String): String
  }

  /** The reference's own dialect (storage.py:41-53) — emitted for parity;
    * not exercised by tests (no Postgres in the build environment). */
  case object Postgres extends Dialect {
    def upsertSql(spec: TableSpec): String = {
      val cols = spec.insertColumns
      val updates = cols.filterNot(_ == spec.primaryKey)
        .map(c => s"$c = EXCLUDED.$c").mkString(", ")
      s"INSERT INTO ${spec.table} (${cols.mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
        s"ON CONFLICT (${spec.primaryKey}) DO UPDATE SET $updates"
    }
    def createTableSql(spec: TableSpec): String =
      s"CREATE TABLE IF NOT EXISTS ${spec.table} (\n  " +
        spec.columns.map { case (n, t) => s"$n ${ddlType(t)}" }.mkString(",\n  ") +
        s",\n  PRIMARY KEY (${spec.primaryKey})\n)"
    def ddlType(declared: String): String = declared
  }

  /** Standard-SQL staged-MERGE dialect (Derby, and any MERGE-capable
    * store). Postgres TEXT/JSONB map to bounded VARCHARs, NOW() to
    * CURRENT_TIMESTAMP. `upsertSql` here is the per-partition MERGE from
    * a staging table named by [[stagingSql]]. */
  case object AnsiMerge extends Dialect {
    def stagingTable(spec: TableSpec, partitionId: Int): String =
      s"${spec.table}_stg_$partitionId"

    /** Staging DDL: insert columns only, no constraints/defaults. */
    def stagingSql(spec: TableSpec, staging: String): String =
      s"CREATE TABLE $staging (\n  " +
        spec.insertColumns
          .map(c => s"$c ${bareType(spec.declaredType(c))}").mkString(",\n  ") +
        "\n)"

    def insertStagingSql(spec: TableSpec, staging: String): String =
      s"INSERT INTO $staging (${spec.insertColumns.mkString(", ")}) " +
        s"VALUES (${spec.insertColumns.map(_ => "?").mkString(", ")})"

    def upsertSql(spec: TableSpec): String = mergeSql(spec, s"${spec.table}_stg")

    def mergeSql(spec: TableSpec, staging: String): String = {
      val cols = spec.insertColumns
      val updates = cols.filterNot(_ == spec.primaryKey)
        .map(c => s"$c = s.$c").mkString(", ")
      // Derby NPEs when the INSERT branch omits a DEFAULT-bearing column
      // (unlike Postgres ON CONFLICT, where omission applies the default),
      // so excluded columns with a declared DEFAULT are supplied with
      // their default expression explicitly — identical semantics. The
      // UPDATE branch still never touches them (storage.py:46-48).
      val defaulted = spec.columns.collect {
        case (n, t) if spec.insertExclude(n) && defaultExpr(t).isDefined =>
          n -> defaultExpr(t).get
      }
      val insCols = cols ++ defaulted.map(_._1)
      val insVals = cols.map(c => s"s.$c") ++ defaulted.map(_._2)
      s"MERGE INTO ${spec.table} t USING $staging s " +
        s"ON t.${spec.primaryKey} = s.${spec.primaryKey} " +
        s"WHEN MATCHED THEN UPDATE SET $updates " +
        s"WHEN NOT MATCHED THEN INSERT (${insCols.mkString(", ")}) " +
        s"VALUES (${insVals.mkString(", ")})"
    }

    /** The DEFAULT expression of a declared type, post dialect rewrite
      * ("TIMESTAMP NOT NULL DEFAULT NOW()" → "CURRENT_TIMESTAMP"). */
    private def defaultExpr(declared: String): Option[String] = {
      val m = "(?i)\\bDEFAULT\\s+(.+)$".r.findFirstMatchIn(ddlType(declared))
      m.map(_.group(1).trim)
    }
    def createTableSql(spec: TableSpec): String =
      s"CREATE TABLE ${spec.table} (\n  " +
        spec.columns.map { case (n, t) => s"$n ${ddlType(t)}" }.mkString(",\n  ") +
        s",\n  PRIMARY KEY (${spec.primaryKey})\n)"
    def ddlType(declared: String): String =
      declared
        .replaceAll("(?i)\\bJSONB\\b", "VARCHAR(32672)")
        .replaceAll("(?i)\\bTEXT\\b", "VARCHAR(4000)")
        .replaceAll("(?i)NOW\\(\\)", "CURRENT_TIMESTAMP")
    /** Declared type minus constraints, for staging columns. */
    private[sources] def bareType(declared: String): String =
      ddlType(declared).split("(?i)\\s+(NOT|DEFAULT|PRIMARY)")(0).trim
  }

  /** CREATE the table if absent. Postgres has IF NOT EXISTS; for the MERGE
    * dialect (Derby lacks IF NOT EXISTS) an 'already exists' error
    * (X0Y32) is swallowed — same idempotent contract as
    * storage.py ensure_*_table. */
  def ensureTable(conn: Connection, spec: TableSpec, dialect: Dialect): Unit = {
    val st = conn.createStatement()
    try st.executeUpdate(dialect.createTableSql(spec))
    catch {
      case e: SQLException if dialect != Postgres && e.getSQLState == "X0Y32" => ()
    } finally st.close()
  }

  /** Pre-upsert batch prep, mirroring storage.py upsert_raw steps 1–3:
    * legacy-key rename, blank-lookup-key drop, in-batch PK dedup
    * keep-first (arrival order = the caller's sort columns). */
  def prepare(df: DataFrame, spec: TableSpec,
              renames: Map[String, String] = Map.empty,
              arrivalOrder: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    val renamed = renames.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }
    val keyed = Cleaning.requireNonBlank(renamed, spec.lookupKey)
    val order = if (arrivalOrder.nonEmpty) arrivalOrder
                else Seq(col(spec.primaryKey).asc_nulls_first)
    Upsert.keepFirst(keyed, Seq(spec.primaryKey), order)
  }

  /** Distributed upsert: every partition batches its rows through the
    * dialect's upsert statement. Store-side semantics per storage.py
    * store_final: blank strings → NULL, array columns → their JSON text
    * (the reference's JSONB `documentos`). */
  def write(df: DataFrame, url: String, spec: TableSpec,
            dialect: Dialect = Postgres, batchSize: Int = 500): Unit = {
    val insertCols = spec.insertColumns
    val schema = df.schema
    val fieldIdx = insertCols.map { c =>
      require(schema.fieldNames.contains(c),
        s"frame is missing storage column '$c'")
      schema.fieldIndex(c)
    }
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          dialect match {
            case Postgres =>
              // the reference's one-statement ON CONFLICT form, batched.
              // Defensive in-partition PK dedup first: Postgres aborts a
              // statement that touches the same conflict row twice
              // ("ON CONFLICT DO UPDATE command cannot affect row a second
              // time"), and pgjdbc's reWriteBatchedInserts collapses a
              // batch into exactly such multi-VALUES statements — so a
              // caller that skipped prepare()'s keep-first dedup would
              // only fail in deployment. Keep-first within the partition
              // preserves prepare()'s semantics; memory is one key per
              // distinct PK in the partition.
              val pkIdx = schema.fieldIndex(spec.primaryKey)
              runBatched(conn, Postgres.upsertSql(spec),
                dedupByKey(rows, pkIdx), schema, fieldIdx, batchSize)
            case AnsiMerge =>
              // staged merge: bulk-insert this partition's rows into a
              // private staging table, one set-oriented MERGE, drop
              val pid = org.apache.spark.TaskContext.getPartitionId()
              val staging = AnsiMerge.stagingTable(spec, pid)
              val st = conn.createStatement()
              try {
                try st.executeUpdate(s"DROP TABLE $staging")
                catch { case e: SQLException if e.getSQLState == "42Y55" => () }
                st.executeUpdate(AnsiMerge.stagingSql(spec, staging))
                runBatched(conn, AnsiMerge.insertStagingSql(spec, staging),
                  rows, schema, fieldIdx, batchSize)
                st.executeUpdate(AnsiMerge.mergeSql(spec, staging))
                st.executeUpdate(s"DROP TABLE $staging")
              } finally st.close()
          }
          conn.commit()
        } finally conn.close()
      }
    }
  }

  /** Keep-first on a key field over a row iterator (streaming — no
    * buffering beyond the seen-key set). Nulls are all "the same key"
    * here, matching the DB's single-NULL-conflict-target behavior. */
  private[graft] def dedupByKey(rows: Iterator[Row], keyIdx: Int): Iterator[Row] = {
    val seen = scala.collection.mutable.HashSet[Any]()
    rows.filter(r => seen.add(if (r.isNullAt(keyIdx)) null else r.get(keyIdx)))
  }

  private def runBatched(conn: Connection, sql: String, rows: Iterator[Row],
                         schema: StructType, fieldIdx: Seq[Int],
                         batchSize: Int): Unit = {
    val ps = conn.prepareStatement(sql)
    try {
      var pending = 0
      rows.foreach { row =>
        fieldIdx.zipWithIndex.foreach { case (fi, pi) =>
          bind(ps, pi + 1, row, fi, schema.fields(fi).dataType)
        }
        ps.addBatch()
        pending += 1
        if (pending >= batchSize) { ps.executeBatch(); pending = 0 }
      }
      if (pending > 0) ps.executeBatch()
    } finally ps.close()
  }

  private def bind(ps: java.sql.PreparedStatement, pos: Int, row: Row,
                   fi: Int, dt: DataType): Unit =
    if (row.isNullAt(fi)) ps.setNull(pos, java.sql.Types.NULL)
    else dt match {
      case StringType =>
        // storage.py:149-152 — blank-after-strip stores NULL
        val v = row.getString(fi)
        if (v.trim.isEmpty) ps.setNull(pos, java.sql.Types.VARCHAR)
        else ps.setString(pos, v)
      case _: ArrayType =>
        // storage.py:146-147 — collections persist as JSON text (JSONB)
        ps.setString(pos, toJsonArray(row.getSeq[Any](fi)))
      case IntegerType   => ps.setInt(pos, row.getInt(fi))
      case LongType      => ps.setLong(pos, row.getLong(fi))
      case DoubleType    => ps.setDouble(pos, row.getDouble(fi))
      case FloatType     => ps.setFloat(pos, row.getFloat(fi))
      case BooleanType   => ps.setBoolean(pos, row.getBoolean(fi))
      case DateType      => ps.setDate(pos, row.getDate(fi))
      case TimestampType => ps.setTimestamp(pos, row.getTimestamp(fi))
      case other => sys.error(s"unsupported storage column type: $other")
    }

  private def toJsonArray(vs: Seq[Any]): String =
    vs.map {
      case null      => "null"
      case s: String => jsonString(s)
      case n         => n.toString
    }.mkString("[", ",", "]")

  /** RFC 8259 string escaping — EVERY control char below 0x20 must be
    * escaped (Postgres rejects raw control bytes in jsonb input, so one
    * scraped title with a \r would fail the whole partition's batch). */
  private def jsonString(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb += '"'
    s.foreach {
      case '"'           => sb ++= "\\\""
      case '\\'          => sb ++= "\\\\"
      case '\n'          => sb ++= "\\n"
      case '\r'          => sb ++= "\\r"
      case '\t'          => sb ++= "\\t"
      case '\b'          => sb ++= "\\b"
      case '\f'          => sb ++= "\\f"
      case c if c < 0x20 => sb ++= f"\\u${c.toInt}%04x"
      case c             => sb += c
    }
    sb += '"'
    sb.result()
  }
}
