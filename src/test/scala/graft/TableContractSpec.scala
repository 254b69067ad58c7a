package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

/** Schema contract for every driver-provided table: the exact column
  * set the engine depends on, with the type LATITUDE it genuinely
  * tolerates. The driver regenerates /root/testdata between rounds
  * and has already drifted once (events.ts int64-ns → TIMESTAMP
  * micros, round 4 — nine queries failed at analysis before any spec
  * named the cause). This suite makes the next drift fail HERE, once,
  * with the table, column, and offending type in the message.
  *
  * Latitude rules (why alternates are accepted):
  *  - integer keys: int or long — joins/groupBys are width-agnostic,
  *    and outputs cast to BIGINT at the query edge by convention;
  *  - temporals: date, timestamp, timestamp_ntz — consumed via
  *    year()/date_trunc()/comparisons, all of which accept any of
  *    them; events.ts additionally accepts raw ns longs
  *    (Engine.epochNs normalizes — see EventSchemaContractSpec);
  *  - embeddings: float or double elements — kernels read doubles;
  *  - measures (prices, value): double ONLY. A silent switch to
  *    decimal would change aggregate result types and rounding
  *    against the DuckDB oracles — that adaptation must be
  *    deliberate, so it fails loudly here instead.
  */
class TableContractSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private val intLike: Set[DataType] = Set(IntegerType, LongType)
  private val temporal: Set[DataType] = Set(DateType, TimestampType, TimestampNTZType)
  private val str: Set[DataType] = Set(StringType)
  private val dbl: Set[DataType] = Set(DoubleType)
  private val vec: Set[DataType] = Set(ArrayType(FloatType), ArrayType(DoubleType),
    ArrayType(FloatType, containsNull = false), ArrayType(DoubleType, containsNull = false))

  private val contract: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map("r_regionkey" -> intLike, "r_name" -> str),
    "nation" -> Map("n_nationkey" -> intLike, "n_name" -> str, "n_regionkey" -> intLike),
    "customer" -> Map("c_custkey" -> intLike, "c_name" -> str,
      "c_nationkey" -> intLike, "c_acctbal" -> dbl, "c_mktsegment" -> str),
    "supplier" -> Map("s_suppkey" -> intLike, "s_name" -> str,
      "s_nationkey" -> intLike, "s_acctbal" -> dbl),
    "part" -> Map("p_partkey" -> intLike, "p_name" -> str, "p_brand" -> str,
      "p_type" -> str, "p_size" -> intLike, "p_retailprice" -> dbl),
    "orders" -> Map("o_orderkey" -> intLike, "o_custkey" -> intLike,
      "o_orderstatus" -> str, "o_totalprice" -> dbl,
      "o_orderdate" -> temporal, "o_orderpriority" -> str),
    "lineitem" -> Map("l_orderkey" -> intLike, "l_partkey" -> intLike,
      "l_suppkey" -> intLike, "l_linenumber" -> intLike, "l_quantity" -> dbl,
      "l_extendedprice" -> dbl, "l_discount" -> dbl, "l_tax" -> dbl,
      "l_returnflag" -> str, "l_linestatus" -> str, "l_shipdate" -> temporal),
    "events" -> Map("event_id" -> intLike, "ts" -> (temporal + LongType),
      "user_id" -> intLike, "event_type" -> str, "value" -> dbl, "props" -> str),
    "documents" -> Map("doc_id" -> intLike, "text" -> str, "lang" -> str,
      "source" -> str, "n_chars" -> intLike),
    "embeddings" -> Map("vec_id" -> intLike, "embedding" -> vec, "label" -> intLike))

  Engine.tableNames.foreach { t =>
    test(s"$t matches its schema contract") {
      val want = contract(t)
      val got = Engine.table(spark, sfDir, t).schema
      val gotNames = got.fieldNames.toSet
      assert(gotNames == want.keySet,
        s"$t columns drifted: missing=${want.keySet -- gotNames} extra=${gotNames -- want.keySet}")
      got.fields.foreach { f =>
        assert(want(f.name).contains(f.dataType),
          s"$t.${f.name}: type ${f.dataType.sql} outside accepted " +
            s"${want(f.name).map(_.sql).mkString("{", ", ", "}")} — adapt deliberately")
      }
    }
  }

  test("contract covers every engine table") {
    assert(contract.keySet == Engine.tableNames.toSet)
  }
}
