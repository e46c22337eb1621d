package graft.core

import org.apache.spark.sql.types._

/** Postgres type string <-> Catalyst DataType mapping.
  *
  * The reference treats Postgres types as opaque strings rendered by
  * `pg_catalog.format_type` and replays them verbatim into DDL
  * (reference: lib/pgcp/postgres.rb:137-167, 263-278). A Spark engine
  * must interpret them to build a `StructType`; this is the one place
  * the new engine interprets what pgcp passed through opaquely.
  * Modeled on Spark's own JDBC PostgresDialect behavior.
  */
object TypeMap {

  private val VarChar = """(?:character varying|varchar)\s*\((\d+)\)""".r
  private val Char = """(?:character|char|bpchar)\s*\((\d+)\)""".r
  private val Numeric = """(?:numeric|decimal)\s*\((\d+)\s*,\s*(\d+)\)""".r
  private val NumericP = """(?:numeric|decimal)\s*\((\d+)\)""".r
  private val ArraySuffix = """(.+)\[\]""".r
  // format_type renders fractional-second precision INSIDE the name:
  // "timestamp(3) with time zone", "time(6) without time zone". Strip
  // it before matching — Catalyst timestamps are micros regardless —
  // or the whole timestamp/time family would fall through to the
  // StringType default and silently corrupt copied schemas.
  private val TimePrecision = """^(timestamp|timestamptz|time|timetz)\s*\(\d+\)""".r

  /** Postgres `format_type` output -> Catalyst DataType. */
  def toCatalyst(pgType: String): DataType = TimePrecision.replaceFirstIn(
      pgType.trim.toLowerCase, "$1") match {
    case "smallint" | "int2"                        => ShortType
    case "integer" | "int" | "int4" | "serial"      => IntegerType
    case "bigint" | "int8" | "bigserial"            => LongType
    case "real" | "float4"                          => FloatType
    case "double precision" | "float8"              => DoubleType
    case Numeric(p, s)                              => DecimalType(p.toInt, s.toInt)
    case NumericP(p)                                => DecimalType(p.toInt, 0)
    case "numeric" | "decimal"                      => DecimalType(38, 18)
    case "boolean" | "bool"                         => BooleanType
    case VarChar(_) | Char(_)                       => StringType
    case "text" | "name" | "citext" | "uuid"        => StringType
    case "json" | "jsonb" | "xml"                   => StringType
    case "bytea"                                    => BinaryType
    case "date"                                     => DateType
    case "timestamp without time zone" | "timestamp" => TimestampNTZType
    case "timestamp with time zone" | "timestamptz" => TimestampType
    case "time without time zone" | "time"
       | "time with time zone" | "timetz"           => StringType
    case "interval"                                 => StringType
    case ArraySuffix(elem)                          => ArrayType(toCatalyst(elem))
    case t if t.startsWith("_")                     => ArrayType(toCatalyst(t.stripPrefix("_")))
    case _                                          => StringType // opaque passthrough, like the reference
  }

  /** Catalyst DataType -> Postgres DDL type (for JDBC-sink DDL replay,
    * the analogue of reference get_create_table_statement,
    * lib/pgcp/postgres.rb:263-278). */
  def toPg(dt: DataType): String = dt match {
    case ShortType           => "smallint"
    case IntegerType         => "integer"
    case LongType            => "bigint"
    case FloatType           => "real"
    case DoubleType          => "double precision"
    case d: DecimalType      => s"numeric(${d.precision},${d.scale})"
    case BooleanType         => "boolean"
    case StringType          => "text"
    case BinaryType          => "bytea"
    case DateType            => "date"
    case TimestampNTZType    => "timestamp without time zone"
    case TimestampType       => "timestamp with time zone"
    case ArrayType(e, _)     => s"${toPg(e)}[]"
    case ByteType            => "smallint"
    case _                   => "text"
  }

  /** Round-trippable subset check (scalacheck property target). */
  def roundTrips(dt: DataType): Boolean = toCatalyst(toPg(dt)) == dt

  /** Column triple as the reference models it: {name, type, null}
    * (lib/pgcp/postgres.rb:137-167). */
  final case class ColumnDef(name: String, pgType: String, nullable: Boolean)

  def toStructType(cols: Seq[ColumnDef]): StructType =
    StructType(cols.map(c => StructField(c.name, toCatalyst(c.pgType), c.nullable)))

  def fromStructType(st: StructType): Seq[ColumnDef] =
    st.fields.toSeq.map(f => ColumnDef(f.name, toPg(f.dataType), f.nullable))

  /** CREATE TABLE DDL synthesis — reference parity with
    * get_create_table_statement (postgres.rb:263-278), including its
    * NULL/NOT NULL rendering; fixes the dest-name fallback bug noted in
    * SURVEY §2a #6. */
  def createTableDdl(qualified: String, cols: Seq[ColumnDef]): String = {
    val lines = cols.map { c =>
      val n = if (c.nullable) "NULL" else "NOT NULL"
      // SQL identifier escaping: embedded double quotes double
      val ident = c.name.replace("\"", "\"\"")
      s"""  "$ident" ${c.pgType} $n"""
    }
    s"CREATE TABLE IF NOT EXISTS $qualified (\n${lines.mkString(",\n")}\n)"
  }
}
