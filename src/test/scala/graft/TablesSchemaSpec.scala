package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Early-warning pin on every table's LOGICAL schema as the loaders see
  * it — the generalization of the events.ts lesson (the generator changed
  * a physical encoding under the repo once; TablesEncodingSpec pins that
  * loader's normalization, this spec catches a drift in ANY column of any
  * table at the next regeneration, with the failing column named instead
  * of 172 queries going red).
  *
  * Pinned are the post-loader types queries rely on: key/measure types per
  * table, events.ts normalized to TimestampType whatever the physical
  * encoding, embeddings as array<float> (queries cast to double
  * explicitly). Physical widenings the loaders absorb (e.g. int32 vs
  * int64 keys in the dims) are deliberately NOT pinned — only what
  * consumers depend on.
  */
class TablesSchemaSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def typeOf(df: DataFrame, c: String): DataType = df.schema(c).dataType
  // IntegralType is private[sql]; enumerate the widths queries accept
  private def integral(dt: DataType): Boolean =
    Set[DataType](ByteType, ShortType, IntegerType, LongType).contains(dt)

  test("every table loads with the column types the queries rely on") {
    val e = Tables.events(spark, dir)
    assert(typeOf(e, "ts") == TimestampType) // normalized, any physical encoding
    assert(typeOf(e, "event_id") == LongType && typeOf(e, "user_id") == LongType)
    assert(typeOf(e, "value") == DoubleType && typeOf(e, "props") == StringType)

    val d = Tables.documents(spark, dir)
    assert(typeOf(d, "doc_id") == LongType && typeOf(d, "text") == StringType)
    assert(typeOf(d, "lang") == StringType && typeOf(d, "source") == StringType)
    assert(integral(typeOf(d, "n_chars"))) // summed as long either way

    val em = Tables.embeddings(spark, dir)
    assert(typeOf(em, "vec_id") == LongType)
    assert(typeOf(em, "embedding").isInstanceOf[ArrayType]) // queries cast elements
    assert(integral(typeOf(em, "label")))

    val li = Tables.lineitem(spark, dir)
    assert(typeOf(li, "l_orderkey") == LongType)
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .foreach(c => assert(typeOf(li, c) == DoubleType, c))
    assert(typeOf(li, "l_shipdate") == TimestampType)

    val o = Tables.orders(spark, dir)
    assert(typeOf(o, "o_orderkey") == LongType && typeOf(o, "o_totalprice") == DoubleType)
    assert(typeOf(o, "o_orderdate") == TimestampType)

    // dims: keys integral (queries join, never assume width), names strings
    assert(integral(typeOf(Tables.region(spark, dir), "r_regionkey")))
    assert(integral(typeOf(Tables.nation(spark, dir), "n_nationkey")))
    assert(typeOf(Tables.customer(spark, dir), "c_acctbal") == DoubleType)
    assert(typeOf(Tables.supplier(spark, dir), "s_acctbal") == DoubleType)
    assert(typeOf(Tables.part(spark, dir), "p_retailprice") == DoubleType)
    // every table non-empty at the smallest SF
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      assert(Tables.load(spark, dir, t).limit(1).count() == 1L, s"$t empty")
    }
  }
}
