package graft.core

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

class TypeMapSpec extends AnyFunSuite {

  test("pg -> catalyst: scalar types") {
    assert(TypeMap.toCatalyst("integer") == IntegerType)
    assert(TypeMap.toCatalyst("bigint") == LongType)
    assert(TypeMap.toCatalyst("smallint") == ShortType)
    assert(TypeMap.toCatalyst("double precision") == DoubleType)
    assert(TypeMap.toCatalyst("real") == FloatType)
    assert(TypeMap.toCatalyst("numeric(12,2)") == DecimalType(12, 2))
    assert(TypeMap.toCatalyst("character varying(255)") == StringType)
    assert(TypeMap.toCatalyst("text") == StringType)
    assert(TypeMap.toCatalyst("boolean") == BooleanType)
    assert(TypeMap.toCatalyst("bytea") == BinaryType)
    assert(TypeMap.toCatalyst("date") == DateType)
    assert(TypeMap.toCatalyst("timestamp without time zone") == TimestampNTZType)
    assert(TypeMap.toCatalyst("timestamp with time zone") == TimestampType)
  }

  test("pg -> catalyst: precision-qualified timestamp/time family") {
    // format_type renders fractional-second precision INSIDE the name;
    // these used to fall through to StringType (silent schema
    // corruption on a live-PG copy).
    assert(TypeMap.toCatalyst("timestamp(3) with time zone") == TimestampType)
    assert(TypeMap.toCatalyst("timestamp(6) without time zone") == TimestampNTZType)
    assert(TypeMap.toCatalyst("timestamp(0)") == TimestampNTZType)
    assert(TypeMap.toCatalyst("timestamptz(3)") == TimestampType)
    assert(TypeMap.toCatalyst("time(6) without time zone") == StringType)
    assert(TypeMap.toCatalyst("time with time zone") == StringType)
  }

  test("pg -> catalyst: array forms (both suffix and leading-underscore)") {
    assert(TypeMap.toCatalyst("integer[]") == ArrayType(IntegerType))
    assert(TypeMap.toCatalyst("_int4") == ArrayType(IntegerType))
    assert(TypeMap.toCatalyst("text[]") == ArrayType(StringType))
  }

  test("unknown types fall back to string (opaque passthrough)") {
    assert(TypeMap.toCatalyst("tsvector") == StringType)
    assert(TypeMap.toCatalyst("point") == StringType)
  }

  private val roundTrippable: Gen[DataType] = {
    val scalars = Gen.oneOf[DataType](
      ShortType, IntegerType, LongType, FloatType, DoubleType,
      BooleanType, StringType, BinaryType, DateType,
      TimestampNTZType, TimestampType)
    val decimals = for {
      p <- Gen.choose(1, 38); s <- Gen.choose(0, p)
    } yield DecimalType(p, s): DataType
    val base = Gen.frequency(4 -> scalars, 1 -> decimals)
    Gen.frequency(3 -> base, 1 -> base.map(ArrayType(_): DataType))
  }

  test("catalyst -> pg -> catalyst round-trips (property, 500 samples)") {
    // raw scalacheck sampling: the scalatest<->scalacheck bridge is not
    // among the resolvable deps (offline coursier cache).
    (1 to 500).foreach { _ =>
      roundTrippable.sample.foreach(dt => assert(TypeMap.roundTrips(dt), s"for $dt"))
    }
  }

  test("create-table DDL renders name, type, nullability") {
    val ddl = TypeMap.createTableDdl("public.t", Seq(
      TypeMap.ColumnDef("id", "bigint", nullable = false),
      TypeMap.ColumnDef("name", "text", nullable = true)))
    assert(ddl.contains("\"id\" bigint NOT NULL"))
    assert(ddl.contains("\"name\" text NULL"))
    assert(ddl.startsWith("CREATE TABLE IF NOT EXISTS public.t"))
  }
}
