package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType
import graft.schema.Schemas

/** Warehouse DDL (SURVEY.md §2.2 K4/K5): get-or-create database and
  * tables from the declared schemas — the Spark-catalog analogue of
  * create_dataset_if_not_exist / create_table_if_not_exist
  * (dags/bigquery.py:9-50), minus the settle-sleep (catalog ops are
  * synchronous here).
  */
object Warehouse {

  val tableSchemas: Map[String, StructType] = Map(
    "competitors" -> Schemas.competitors,
    "products" -> Schemas.products,
    "features" -> Schemas.features,
    "product_prices" -> Schemas.productPrices,
    "packs" -> Schemas.packs,
    "logs" -> Schemas.logs)

  /** CREATE DATABASE/TABLE IF NOT EXISTS for the whole star schema.
    * Idempotent; returns names of tables that exist afterwards. */
  def ensureSchema(spark: SparkSession, database: String = "graft"): Seq[String] = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $database")
    tableSchemas.toSeq.sortBy(_._1).map { case (name, schema) =>
      val ddlCols = schema.toDDL
      spark.sql(s"CREATE TABLE IF NOT EXISTS $database.$name ($ddlCols) USING parquet")
      s"$database.$name"
    }
  }
}
