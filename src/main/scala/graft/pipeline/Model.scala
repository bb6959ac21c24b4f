package graft.pipeline

import org.apache.spark.sql.types._

/** Explicit schemas + typed rows for the candy-store pipeline
  * (SURVEY.md §1.1; reference infers everything — we declare, for
  * determinism at scale).
  *
  * Money is decimal end-to-end (prices are decimal(3,2) in the source
  * DDL, candy_store.sql:58-59); `cost_to_make` is cast to double at
  * the summary boundary exactly like the reference
  * (src/data_processor.py:413-415).
  */
object Model {

  /** transactions_YYYYMMDD.json element (src/data_processor.py:224-241). */
  val transactionSchema: StructType = StructType(Seq(
    StructField("transaction_id", LongType),
    StructField("customer_id", LongType),
    StructField("timestamp", StringType),
    StructField("items", ArrayType(StructType(Seq(
      StructField("product_id", LongType),
      StructField("product_name", StringType),
      StructField("qty", LongType)))))))

  /** products.csv / MySQL products DDL (candy_store.sql:52-62). */
  val productSchema: StructType = StructType(Seq(
    StructField("product_id", LongType),
    StructField("product_name", StringType),
    StructField("product_category", StringType),
    StructField("product_subcategory", StringType),
    StructField("product_shape", StringType),
    StructField("sales_price", DecimalType(3, 2)),
    StructField("cost_to_make", DecimalType(3, 2)),
    StructField("stock", LongType)))

  /** customers.csv / MySQL customers DDL (candy_store.sql:25-33). */
  val customerSchema: StructType = StructType(Seq(
    StructField("customer_id", LongType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("email", StringType),
    StructField("address", StringType),
    StructField("phone", StringType)))

  /** Demand line entering the allocator: normalized item enriched with
    * the product's unit price and opening stock (J1). The ISO-8601
    * timestamp string sorts chronologically, so it stays a string all
    * the way to the CSV — byte-parity with the golden outputs.
    *
    * (day, seq, pos) is the allocation sequence key, compared
    * lexicographically within each product. The reference *intends*
    * timestamp order (`orderBy("timestamp")`,
    * src/data_processor.py:280) but Catalyst's EliminateSorts removes
    * that sort under the subsequent join, so its effective — and
    * golden-output-defining — order is the per-day Mongo insertion
    * order, i.e. JSON file order. We reproduce that faithfully:
    * day = yyyymmdd from the file name, seq = row position in the
    * file, pos = item position within the transaction. */
  final case class DemandLine(
      order_id: Long,
      customer_id: Long,
      order_datetime: String,
      product_id: Long,
      qty: Long,
      unit_price: BigDecimal,
      opening_stock: Long,
      day: Int,
      seq: Long,
      pos: Int)

  /** Allocator output (A1): quantity is the filled amount (0 =
    * cancelled — insufficient stock; stock untouched). */
  final case class AllocatedLine(
      order_id: Long,
      customer_id: Long,
      order_datetime: String,
      product_id: Long,
      quantity: Long,
      unit_price: BigDecimal,
      line_total: BigDecimal)
}
