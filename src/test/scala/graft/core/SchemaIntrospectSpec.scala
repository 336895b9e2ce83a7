package graft.core

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** CheckDynamicSize classification (reference:
  * tools/dynamic-vector-macro/src/lib.rs:133-157) over Catalyst StructTypes.
  */
class SchemaIntrospectSpec extends AnyFunSuite {

  test("primitives/timestamps/decimals are fixed-width") {
    Seq(BooleanType, ByteType, ShortType, IntegerType, LongType, FloatType,
      DoubleType, DateType, TimestampType, DecimalType(18, 2))
      .foreach(dt => assert(SchemaIntrospect.isFixedWidth(dt), dt))
  }

  test("string/binary/array/map are dynamic") {
    Seq(StringType, BinaryType, ArrayType(LongType), MapType(StringType, BinaryType))
      .foreach(dt => assert(!SchemaIntrospect.isFixedWidth(dt), dt))
  }

  test("nested struct is fixed iff all leaves fixed") {
    val fixed = StructType(Seq(
      StructField("a", LongType),
      StructField("b", StructType(Seq(StructField("c", IntegerType))))))
    assert(SchemaIntrospect.isFixedWidth(fixed))
    val dyn = StructType(Seq(
      StructField("a", LongType),
      StructField("b", StructType(Seq(StructField("c", StringType))))))
    assert(!SchemaIntrospect.isFixedWidth(dyn))
  }

  test("field partition mirrors the derive macro's split (lib.rs:159-194)") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("flags", ArrayType(IntegerType)),
      StructField("ok", BooleanType)))
    assert(SchemaIntrospect.staticFields(schema) == Seq("id", "ok"))
    assert(SchemaIntrospect.dynamicFields(schema) == Seq("name", "flags"))
    assert(SchemaIntrospect.isDynamicStructure(schema))
    val allFixed = StructType(Seq(StructField("id", LongType)))
    assert(!SchemaIntrospect.isDynamicStructure(allFixed))
  }
}
