package graft.pipeline

import java.nio.file.{Files, Paths}
import graft.SparkSpec

/** Edge-case semantics the golden dataset doesn't fully exercise
  * (SURVEY §7.4.1), driven through the real file-based ingest path:
  * empty items arrays vanish, all-null-qty transactions vanish,
  * unknown products are silently dropped (inner join), partial-null
  * transactions keep only their valid lines, and insufficient stock
  * cancels with a zero line kept.
  */
class CandyEdgeCasesSpec extends SparkSpec {

  private lazy val dataDir: String = {
    val d = Files.createTempDirectory("candy_edge").toString
    Files.writeString(Paths.get(s"$d/customers.csv"),
      "customer_id,first_name,last_name,email,address,phone\n1,A,B,a@b,addr,555\n")
    Files.writeString(Paths.get(s"$d/products.csv"),
      """product_id,product_name,product_category,product_subcategory,product_shape,sales_price,cost_to_make,stock
        |1,Choc,Cat,Sub,Shape,2.00,1.00,10
        |2,Mint,Cat,Sub,Shape,3.00,1.50,1
        |""".stripMargin)
    Files.writeString(Paths.get(s"$d/transactions_20240301.json"),
      """[
        |{"transaction_id": 1, "customer_id": 1, "timestamp": "2024-03-01T08:00:00.000001",
        | "items": []},
        |{"transaction_id": 2, "customer_id": 1, "timestamp": "2024-03-01T08:01:00.000001",
        | "items": [{"product_id": 1, "product_name": "Choc", "qty": null}]},
        |{"transaction_id": 3, "customer_id": 1, "timestamp": "2024-03-01T08:02:00.000001",
        | "items": [{"product_id": 99, "product_name": "Ghost", "qty": 5}]},
        |{"transaction_id": 4, "customer_id": 1, "timestamp": "2024-03-01T08:03:00.000001",
        | "items": [{"product_id": 1, "product_name": "Choc", "qty": 4},
        |           {"product_id": 2, "product_name": "Mint", "qty": null}]},
        |{"transaction_id": 5, "customer_id": 1, "timestamp": "2024-03-01T08:04:00.000001",
        | "items": [{"product_id": 2, "product_name": "Mint", "qty": 3}]}
        |]""".stripMargin)
    d
  }

  private lazy val result = CandyPipeline.run(spark, dataDir)

  test("empty-items, all-null and unknown-product transactions produce no orders") {
    val orderIds = result.orders.collect().map(_.getLong(0)).toSet
    assert(orderIds == Set(4L, 5L),
      "only transactions with at least one valid known-product line survive")
  }

  test("partial-null transaction keeps only its valid line") {
    val lines = result.orderLineItems.filter("order_id = 4").collect()
    assert(lines.length == 1 && lines.head.getLong(1) == 1L
      && lines.head.getLong(2) == 4L)
  }

  test("insufficient stock cancels with a zero line and stock intact") {
    val l5 = result.orderLineItems.filter("order_id = 5").collect()
    assert(l5.length == 1 && l5.head.getLong(2) == 0L, "qty 3 > stock 1 → cancelled")
    val stock = result.productsUpdated.collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(stock == Map(1L -> 6L, 2L -> 1L),
      "product 1 depleted by the filled 4; product 2 untouched by the cancel")
  }

  test("daily summary counts only surviving orders") {
    val s = result.dailySummary.collect()
    assert(s.length == 1 && s.head.getLong(1) == 2L)
  }
}
