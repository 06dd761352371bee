package graft

import org.apache.spark.sql.types._

/** Published-type contract (VERDICT r14 item 2): the driver's row-hash
  * canonicalization is only PROVEN green for BIGINT/INT, DOUBLE,
  * VARCHAR, DATE, TIMESTAMP(_NTZ) and arrays of those — r14 shipped
  * five queries whose published column type changed to DECIMAL(38,0)
  * and all five failed `hash_match` with rows+schema green (both local
  * checkers passed, because the local harness cannot see the driver's
  * hash). Decimal/HUGEINT arithmetic stays legal INTERNALLY; this spec
  * walks every registered query's published schema and fails the build
  * if any column (or array element / struct field) falls outside the
  * proven surface, so a future arithmetic hardening cannot silently
  * change the published contract again.
  */
class PublishedTypeSpec extends SparkTestBase {

  // BOOLEAN is included because s11_semantic_dedup publishes `kept` as
  // a real boolean and has been hash-green since registration.
  private val allowedScalars: Set[DataType] = Set(
    LongType, IntegerType, DoubleType, StringType, BooleanType,
    DateType, TimestampType, TimestampNTZType)

  private def violation(dt: DataType): Option[String] = dt match {
    case s if allowedScalars.contains(s) => None
    case ArrayType(el, _) => violation(el).map(v => s"array<$v>")
    case StructType(fields) =>
      // struct publication is proven only via q02-style collected
      // sparkline structs whose every leaf is itself proven
      fields.flatMap(f => violation(f.dataType).map(v => s"${f.name}:$v"))
        .headOption.map(v => s"struct<$v>")
    case other => Some(other.sql)
  }

  test("every registered query publishes only driver-proven column " +
      "types (no DECIMAL/FLOAT/BINARY/MAP on the published surface)") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema = fn(spark, sf0001).schema
        schema.fields.toSeq.flatMap { f =>
          violation(f.dataType).map(v => s"$name.${f.name}: $v")
        }
    }
    graft.Caches.unpersistAll()
    assert(bad.isEmpty,
      s"published columns outside the proven type surface:\n  " +
        bad.mkString("\n  "))
  }
}
