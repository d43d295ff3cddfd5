package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) dimension join: each fact row picks up the
  * dimension attribute of the LATEST version at or before the fact's
  * time — the correctness primitive of feature stores and slowly-changing
  * dimensions (training a model on attributes from the future is silent
  * leakage).
  *
  * Scale shape: the naive forms are a correlated max-subquery per fact or
  * an unbounded time-range join (quadratic in versions per key). This is
  * the union-tag form instead: dim versions and facts are unioned into one
  * stream, hash-shuffled ONCE on the key, sorted within partitions by
  * (time, kind, attr), and the attribute is carried forward with
  * `last(attr, ignoreNulls)` over the preceding rows. One shuffle + one
  * per-partition sort, state bounded by rows-per-key — the same shape
  * Spark plans for any window, and it streams: no versions-per-key blowup.
  *
  * Determinism: at equal time, dim versions sort BEFORE facts (a version
  * effective exactly at the fact's time counts), and equal-time versions
  * tie-break on the attribute value (max wins), so the result is a pure
  * function of the data in any engine.
  */
object AsOfJoin {

  /** @param facts    fact rows; must contain `key`, `factTime`, `factId`
    * @param dims     version rows; must contain `key`, `dimTime`, `attr`
    * @param outName  name of the carried-forward attribute column
    * @return one row per fact: factId, key, factTime, outName (null when
    *         no version exists at or before the fact's time)
    */
  def pointInTime(facts: DataFrame, dims: DataFrame, key: String,
      factId: String, factTime: String, dimTime: String, attr: String,
      outName: String): DataFrame = {
    val attrType = dims.schema(attr).dataType
    val fidType = facts.schema(factId).dataType
    // The carried value is a STRUCT wrapping the attribute, not the
    // attribute itself: last(ignoreNulls) must distinguish "this row is
    // a fact" (null struct, skipped) from "the latest version's
    // attribute happens to be NULL" (non-null struct, carried) — carrying
    // the raw attribute would silently resurrect an OLDER version's
    // value over a newer null.
    //
    // Null-key DIM versions are dropped up front: a SQL equi-join never
    // matches on NULL, but a window partition would happily group the
    // null keys together and leak a null-key version's attribute onto
    // null-key facts. (Null-key facts still flow through and surface a
    // null attribute, exactly as the correlated-subquery form does.)
    val d = dims.filter(col(key).isNotNull)
      .select(col(key), col(dimTime).as("_t"),
        lit(false).as("_isf"), lit(null).cast(fidType).as("_fid"),
        struct(col(attr).as("v")).as("_ver"))
    val f = facts.select(col(key), col(factTime).as("_t"),
      lit(true).as("_isf"), col(factId).as("_fid"),
      lit(null).cast(s"struct<v:${attrType.sql}>").as("_ver"))
    val w = Window.partitionBy(key)
      .orderBy(col("_t"), col("_isf").cast("int"),
        col("_ver.v").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.unionByName(f)
      .withColumn("_asof", last(col("_ver"), ignoreNulls = true).over(w))
      .filter(col("_isf"))
      .select(col("_fid").as(factId), col(key), col("_t").as(factTime),
        col("_asof.v").as(outName))
  }
}
