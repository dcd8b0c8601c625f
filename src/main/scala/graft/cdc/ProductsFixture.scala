package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's `products_catalog` fixture (FIXTURES.md §A.1-A.3):
  * schema from mysql/sql-scripts/03-create-table.sql.txt:1-16, seed rows
  * from 04-table-seeding.sql.txt:1-4, probe rows from the reference
  * README.md:271-296 manual walkthrough.
  */
object ProductsFixture {
  val schema: StructType = StructType(Seq(
    StructField("ProductID", IntegerType, nullable = false),
    StructField("ProductName", StringType, nullable = false),
    StructField("ProductBrand", StringType, nullable = false),
    StructField("Target_Gender", StringType, nullable = true),
    StructField("Price", DoubleType, nullable = false),
    StructField("Currency", StringType, nullable = false),
    StructField("Description", StringType, nullable = true),
    StructField("Launch_date", DateType, nullable = false),
    StructField("Loaded_at", DateType, nullable = false)))

  private def df(spark: SparkSession, rows: Seq[(Int, String, String, String, Double, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("ProductID", "ProductName", "ProductBrand", "Target_Gender",
        "Price", "Currency", "Description", "Launch_date")
      .withColumn("Launch_date", to_date(col("Launch_date")))
      .withColumn("Loaded_at", to_date(lit("2023-08-01")))
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** 04-table-seeding.sql.txt rows. */
  def seed(spark: SparkSession): DataFrame = df(spark, Seq(
    (9012, "Casual Shirts", "Ralph Lauren", "Male", 106.0, "Euro",
      "Crafted from our sh", "2023-07-17"),
    (9013, "Tees", "Gucci", "Female", 77.0, "Euro", "", "2023-07-15")))

  /** README.md:271-284 insert probe (product 9014). */
  def insertProbe(spark: SparkSession): DataFrame = df(spark, Seq(
    (9014, "fancy pants", "Hugo Boss", "Female", 56.0, "Euro",
      "Created with love", "2023-08-01")))

  /** README.md:289-296 update probe (9014 price 56 → 100). */
  def updateProbe(spark: SparkSession): DataFrame = df(spark, Seq(
    (9014, "fancy pants", "Hugo Boss", "Female", 100.0, "Euro",
      "Created with love", "2023-08-01")))
}
