package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Canary against driver testdata regenerations: every table must load
  * through [[Tables]] with exactly the expected column names (in order)
  * and canonical types, at every scale factor. Round 6 ended red
  * because `events.ts` changed encoding between regenerations and
  * nothing failed until 11 downstream oracle gates did; this spec makes
  * the NEXT schema drift fail here first, with a message naming the
  * table and column.
  */
class TablesSchemaSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("tables-schema-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val long: DataType => Boolean = _ == LongType
  private val int: DataType => Boolean = _ == IntegerType
  private val dbl: DataType => Boolean = _ == DoubleType
  private val str: DataType => Boolean = _ == StringType
  // date-like columns have shipped as naive timestamp[us]; either Spark
  // reading (NTZ-inferred or session-tz) compares equal under UTC
  private val naiveTs: DataType => Boolean =
    t => t == TimestampType || t == TimestampNTZType
  // events.ts goes through Tables.adaptEventTs → always TimestampType
  private val canonTs: DataType => Boolean = _ == TimestampType
  private val floats: DataType => Boolean = {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private val expected: Seq[(String, Seq[(String, DataType => Boolean)])] = Seq(
    "region" -> Seq("r_regionkey" -> int, "r_name" -> str),
    "nation" -> Seq("n_nationkey" -> int, "n_name" -> str,
      "n_regionkey" -> int),
    "customer" -> Seq("c_custkey" -> long, "c_name" -> str,
      "c_nationkey" -> int, "c_acctbal" -> dbl, "c_mktsegment" -> str),
    "supplier" -> Seq("s_suppkey" -> long, "s_name" -> str,
      "s_nationkey" -> int, "s_acctbal" -> dbl),
    "part" -> Seq("p_partkey" -> long, "p_name" -> str, "p_brand" -> str,
      "p_type" -> str, "p_size" -> int, "p_retailprice" -> dbl),
    "orders" -> Seq("o_orderkey" -> long, "o_custkey" -> long,
      "o_orderstatus" -> str, "o_totalprice" -> dbl,
      "o_orderdate" -> naiveTs, "o_orderpriority" -> str),
    "lineitem" -> Seq("l_orderkey" -> long, "l_partkey" -> long,
      "l_suppkey" -> long, "l_linenumber" -> int, "l_quantity" -> dbl,
      "l_extendedprice" -> dbl, "l_discount" -> dbl, "l_tax" -> dbl,
      "l_returnflag" -> str, "l_linestatus" -> str,
      "l_shipdate" -> naiveTs),
    "events" -> Seq("event_id" -> long, "ts" -> canonTs, "user_id" -> long,
      "event_type" -> str, "value" -> dbl, "props" -> str),
    "documents" -> Seq("doc_id" -> long, "text" -> str, "lang" -> str,
      "source" -> str, "n_chars" -> long),
    "embeddings" -> Seq("vec_id" -> long, "embedding" -> floats,
      "label" -> int))

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"))
    test(s"all tables load with canonical schemas at $sf") {
      val dir = s"/root/testdata/$sf"
      expected.foreach { case (table, cols) =>
        val df = table match {
          case "events" => Tables.events(spark, dir)
          case t        => Tables.load(spark, dir, t)
        }
        assert(df.schema.fields.map(_.name).toSeq == cols.map(_._1),
          s"$sf/$table column names drifted: got " +
            df.schema.fields.map(_.name).mkString(", "))
        df.schema.fields.zip(cols).foreach { case (f, (name, ok)) =>
          assert(ok(f.dataType),
            s"$sf/$table.$name has unexpected type ${f.dataType} — the " +
              "driver regenerated testdata with a new encoding; teach " +
              "Tables to adapt (see Tables.adaptEventTs for the pattern)")
        }
      }
    }
}
