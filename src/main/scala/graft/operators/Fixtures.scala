package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Unit-test fixture relations (C5,
  * dbt-adapters/macros/unit_test_sql/get_fixture_sql.sql:1-44): literal rows
  * cast to a target schema, with missing columns defaulted to typed NULLs —
  * the engine-level equivalent of dbt's fixture -> inline relation rendering.
  */
object Fixtures {

  /** Build a typed relation from partial row maps: columns absent from a row
    * become NULL of the declared type (get_fixture_sql's NULL-defaulting).
    */
  def relation(spark: SparkSession, schema: StructType,
      rows: Seq[Map[String, Any]]): DataFrame = {
    // a typo'd fixture column must FAIL, not silently become a NULL in some
    // other column's place (dbt raises a parsing error for fixture columns
    // not present in the model)
    val known = schema.fieldNames.toSet
    rows.zipWithIndex.foreach { case (m, i) =>
      val bad = m.keys.filterNot(known)
      require(bad.isEmpty,
        s"fixture row $i has columns not in the schema: ${bad.mkString(",")}")
    }
    val data = rows.map { m =>
      Row.fromSeq(schema.fields.map(f => m.getOrElse(f.name, null)).toSeq)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, math.max(1, rows.size / 1000)),
      schema)
  }
}
