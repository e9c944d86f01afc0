package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.types._
import graft.model.ChTypes

/** ChTypes: the ClickHouse columnTypeExpr → Spark DataType translator
  * (Simple / Param / Complex / Nested / Enum alternatives,
  * ClickHouseParser.py:14339-14477). Direct mappings + a ScalaCheck
  * round-trip through the canonical inverse. */
class ChTypesSpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  test("simple types map to canonical Spark types") {
    assert(ChTypes.toSpark("Int8") == ByteType)
    assert(ChTypes.toSpark("Int16") == ShortType)
    assert(ChTypes.toSpark("Int32") == IntegerType)
    assert(ChTypes.toSpark("Int64") == LongType)
    // unsigned: one Spark step wider (Spark has no unsigned integers)
    assert(ChTypes.toSpark("UInt8") == ShortType)
    assert(ChTypes.toSpark("UInt16") == IntegerType)
    assert(ChTypes.toSpark("UInt32") == LongType)
    assert(ChTypes.toSpark("UInt64") == DecimalType(20, 0))
    assert(ChTypes.toSpark("Float32") == FloatType)
    assert(ChTypes.toSpark("Float64") == DoubleType)
    assert(ChTypes.toSpark("Bool") == BooleanType)
    assert(ChTypes.toSpark("String") == StringType)
    assert(ChTypes.toSpark("Date") == DateType)
    assert(ChTypes.toSpark("Date32") == DateType)
    assert(ChTypes.toSpark("DateTime") == TimestampType)
    assert(ChTypes.toSpark("UUID") == StringType)
  }

  test("parameterized types: FixedString / Decimal tiers / DateTime64") {
    assert(ChTypes.toSpark("FixedString(16)") == StringType)
    assert(ChTypes.toSpark("Decimal(18, 4)") == DecimalType(18, 4))
    assert(ChTypes.toSpark("Decimal32(2)") == DecimalType(9, 2))
    assert(ChTypes.toSpark("Decimal64(6)") == DecimalType(18, 6))
    assert(ChTypes.toSpark("Decimal128(10)") == DecimalType(38, 10))
    assert(ChTypes.toSpark("DateTime64(3)") == TimestampType)
    assert(ChTypes.toSpark("DateTime64(9, 'UTC')") == TimestampType)
    assert(ChTypes.toSpark("DateTime('Europe/Berlin')") == TimestampType)
  }

  test("Enum8/Enum16 carry symbolic string values (quoted commas survive)") {
    assert(ChTypes.toSpark("Enum8('a' = 1, 'b' = 2)") == StringType)
    assert(ChTypes.toSpark("Enum16('x' = -1, 'y' = 0)") == StringType)
    // enum names containing commas and parens must not break the split
    assert(ChTypes.toSpark("Enum8('a,b' = 1, '(c)' = 2)") == StringType)
  }

  test("Nullable is field nullability, LowCardinality erases") {
    assert(ChTypes.toSparkField("Nullable(String)") ==
      ChTypes.ChField(StringType, nullable = true))
    assert(ChTypes.toSparkField("String") ==
      ChTypes.ChField(StringType, nullable = false))
    assert(ChTypes.toSpark("LowCardinality(String)") == StringType)
    assert(ChTypes.toSparkField("LowCardinality(Nullable(String))") ==
      ChTypes.ChField(StringType, nullable = true))
  }

  test("composite types: Array / Map / Tuple (positional and named)") {
    assert(ChTypes.toSpark("Array(Int64)") ==
      ArrayType(LongType, containsNull = false))
    assert(ChTypes.toSpark("Array(Nullable(String))") ==
      ArrayType(StringType, containsNull = true))
    assert(ChTypes.toSpark("Map(String, UInt32)") ==
      MapType(StringType, LongType, valueContainsNull = false))
    assert(ChTypes.toSpark("Tuple(Int32, String)") ==
      StructType(Seq(StructField("_1", IntegerType, nullable = false),
        StructField("_2", StringType, nullable = false))))
    assert(ChTypes.toSpark("Tuple(a Int32, b Nullable(Float64))") ==
      StructType(Seq(StructField("a", IntegerType, nullable = false),
        StructField("b", DoubleType, nullable = true))))
  }

  test("Nested maps to Array(Struct) — the row-oriented twin of CH's parallel arrays") {
    val t = ChTypes.toSpark("Nested(id UInt64, tags Array(String))")
    assert(t == ArrayType(StructType(Seq(
      StructField("id", DecimalType(20, 0), nullable = false),
      StructField("tags", ArrayType(StringType, containsNull = false),
        nullable = false))), containsNull = false))
  }

  test("schema form parses a column list") {
    val st = ChTypes.toSparkSchema("a UInt32, b Nullable(String), c Array(Float64)")
    assert(st == StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", StringType, nullable = true),
      StructField("c", ArrayType(DoubleType, containsNull = false),
        nullable = false))))
  }

  test("unknown type raises a clear error") {
    val e = intercept[IllegalArgumentException](ChTypes.toSpark("Ring"))
    assert(e.getMessage.contains("Ring"))
  }

  test("relaxed() makes every nested field nullable (castable target)") {
    val t = ChTypes.relaxed(ChTypes.toSpark("Nested(a UInt32, b Float64)"))
    assert(t == ArrayType(StructType(Seq(
      StructField("a", LongType, nullable = true),
      StructField("b", DoubleType, nullable = true))), containsNull = true))
  }

  // -- round-trip property ------------------------------------------------

  private val leafGen: Gen[DataType] = Gen.oneOf(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    BooleanType, StringType, DateType, TimestampType,
    DecimalType(9, 2), DecimalType(18, 6), DecimalType(38, 10),
    DecimalType(20, 0))

  private def typeGen(depth: Int): Gen[DataType] =
    if (depth == 0) leafGen
    else Gen.frequency(
      4 -> leafGen,
      1 -> typeGen(depth - 1).map(t => ArrayType(t, containsNull = false)),
      1 -> (for {
        k <- leafGen; v <- typeGen(depth - 1)
      } yield MapType(k, v, valueContainsNull = false)),
      1 -> (for {
        n <- Gen.choose(1, 3)
        ts <- Gen.listOfN(n, typeGen(depth - 1))
      } yield StructType(ts.zipWithIndex.map { case (t, i) =>
        StructField(s"f$i", t, nullable = false) })))

  test("round-trip: toSpark(toCh(dt)) == dt for generated Spark types") {
    forAll(typeGen(2)) { dt =>
      assert(ChTypes.toSpark(ChTypes.toCh(dt)) == dt)
    }
  }
}
