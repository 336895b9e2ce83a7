package graft.core

import org.apache.spark.sql.types._

/** Fixed-width vs variable-width schema classification — the Spark analog of
  * the reference's `#[derive(CheckDynamicSize)]` proc macro
  * (reference: tools/dynamic-vector-macro/src/lib.rs:8-199), which splits a
  * struct's fields into fixed-size (ints/bool, :133-142) and dynamic-size
  * (str/String/Vec/slices, :144-150) to choose the static vs dynamic
  * physical layout (SURVEY.md §1.4).
  *
  * Here the classification runs over a Catalyst `StructType` (obtainable
  * from any `Encoder[T].schema`), so it works for both compile-time case
  * classes and runtime DataFrames.
  */
object SchemaIntrospect {

  /** True iff a value of this type has a fixed serialized width. */
  def isFixedWidth(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
        FloatType | DoubleType | DateType | TimestampType |
        TimestampNTZType | _: DayTimeIntervalType | _: YearMonthIntervalType =>
      true
    case _: DecimalType => true // fixed-precision fixed storage
    case s: StructType  => s.fields.forall(f => isFixedWidth(f.dataType))
    case _              => false // String, Binary, Array, Map, ...
  }

  /** Names of variable-width fields — reference `get_dynamic_fields()`
    * (tools/dynamic-vector-macro/src/lib.rs:159-171).
    */
  def dynamicFields(schema: StructType): Seq[String] =
    schema.fields.collect { case f if !isFixedWidth(f.dataType) => f.name }.toSeq

  /** Names of fixed-width fields. */
  def staticFields(schema: StructType): Seq[String] =
    schema.fields.collect { case f if isFixedWidth(f.dataType) => f.name }.toSeq

  /** Reference `is_dynamic_structure()`: any variable-width field present
    * (tools/dynamic-vector-macro/src/lib.rs:153-157).
    */
  def isDynamicStructure(schema: StructType): Boolean =
    dynamicFields(schema).nonEmpty
}
