package graft

import org.apache.spark.sql.functions._
import graft.model.{TableDef, TableDefs}
import graft.operators.{Backfill, Migrations}
import graft.streaming.{SyncConfig, WebhookPipeline}

/** Revalidation (P8/P4), list expansion (A7), checkout line-item fill
  * (A6), dependent fan-out scan (S5), migration bootstrap (S12) —
  * mirroring revalidate.test.ts, invoices.test.ts,
  * checkoutSessions.test.ts. */
class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  /** API stand-in whose invoice always carries customer cus_api — so we
    * can tell whether the webhook body or the API was trusted. */
  private val apiFetcher = new Backfill.EntityFetcher {
    def list(t: TableDef, a: Option[Long], b: Option[Long]): Iterator[String] =
      Iterator.empty
    def retrieve(t: TableDef, id: String): Option[String] =
      if (t.table == "invoices")
        Some(s"""{"id":"$id","object":"invoice","status":"open","customer":"cus_api","total":7}""")
      else None
    override def listForParent(t: TableDef, pc: String, pid: String): Seq[String] =
      if (t.table == "checkout_session_line_items")
        Seq(s"""{"id":"li_1","object":"item","amount_total":5,"price":{"id":"price_9"},"quantity":2}""",
            s"""{"id":"li_2","object":"item","amount_total":6,"price":"price_flat","quantity":1}""")
      else if (t.table == "payment_methods")
        Seq(s"""{"id":"pm_$pid","object":"payment_method","customer":"$pid","type":"card"}""")
      else Seq.empty
    override def expandList(t: TableDef, id: String, field: String): Option[String] =
      Some("""{"object":"list","data":[{"id":"il_1"},{"id":"il_2"},{"id":"il_3"}],"has_more":false}""")
  }

  private def invoiceEvent(id: String, status: String, customer: String,
                           created: Long = 100, lines: String = "") = {
    val linesPart = if (lines.nonEmpty) s""","lines":$lines""" else ""
    s"""{"id":"evt_$id$created","type":"invoice.updated","created":$created,
       |"data":{"object":{"id":"$id","object":"invoice","status":"$status","customer":"$customer"$linesPart}}}"""
      .stripMargin.replaceAll("\n", "")
  }

  test("revalidation: non-final invoice is re-fetched (API customer, now() ts); voided invoice trusts the webhook (revalidate.test.ts:36-62)") {
    val dir = tmpDir("graft_reval")
    val pipeline = new WebhookPipeline(dir, Some(apiFetcher),
      SyncConfig(revalidateTables = Set("invoices")))
    pipeline.processBatch(Seq(
      invoiceEvent("in_open", "open", "cus_webhook"),
      invoiceEvent("in_void", "void", "cus_webhook")).toDF("value"))
    val rows = spark.read.parquet(s"$dir/invoices")
      .select("id", "customer", "last_synced_at").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getTimestamp(2))).toMap
    // non-final → API wins, sync ts = now() (not event.created=100)
    assert(rows("in_open")._1 == "cus_api")
    assert(rows("in_open")._2.getTime / 1000 > 1000000000L)
    // terminal 'void' → retrieve NOT used, webhook body + event.created
    assert(rows("in_void")._1 == "cus_webhook")
    assert(rows("in_void")._2.getTime / 1000 == 100L)
  }

  test("list expansion: has_more=true lines replaced with the full list; has_more=false kept (A7, invoices.test.ts:33-73)") {
    val dir = tmpDir("graft_expand")
    val pipeline = new WebhookPipeline(dir, Some(apiFetcher),
      SyncConfig(autoExpandLists = true))
    val partial = """{"object":"list","data":[{"id":"il_1"}],"has_more":true}"""
    val complete = """{"object":"list","data":[{"id":"il_x"}],"has_more":false}"""
    pipeline.processBatch(Seq(
      invoiceEvent("in_partial", "open", "c", 100, partial),
      invoiceEvent("in_complete", "open", "c", 100, complete)).toDF("value"))
    val rows = spark.read.parquet(s"$dir/invoices")
      .select("id", "lines").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("in_partial").contains("il_3"))        // replaced by full fetch
    assert(rows("in_partial").contains("\"has_more\":false"))
    assert(rows("in_complete").contains("il_x"))       // untouched
  }

  test("checkout sessions fill line items with price-id rewrite (A6, checkoutSessions.test.ts)") {
    val dir = tmpDir("graft_cs")
    val pipeline = new WebhookPipeline(dir, Some(apiFetcher))
    val ev =
      """{"id":"evt_cs1","type":"checkout.session.completed","created":100,
        |"data":{"object":{"id":"cs_1","object":"checkout.session","status":"complete"}}}"""
        .stripMargin.replaceAll("\n", "")
    pipeline.processBatch(Seq(ev).toDF("value"))
    val items = spark.read.parquet(s"$dir/checkout_session_line_items")
      .orderBy("id").collect()
    assert(items.length == 2)
    assert(items(0).getAs[String]("price") == "price_9")      // object → id
    assert(items(1).getAs[String]("price") == "price_flat")   // plain id kept
    assert(items.forall(_.getAs[String]("checkout_session") == "cs_1"))
    assert(items(0).getAs[Long]("amount_total") == 5L)
  }

  test("checkout line items version into SCD2 history when configured") {
    import graft.streaming.SyncConfig
    val dir = tmpDir("graft_cs_hist")
    val pipeline = new WebhookPipeline(dir, Some(apiFetcher),
      config = SyncConfig(historyTables = Set("checkout_session_line_items")))
    val ev =
      """{"id":"evt_csh","type":"checkout.session.completed","created":100,
        |"data":{"object":{"id":"cs_h","object":"checkout.session","status":"complete"}}}"""
        .stripMargin.replaceAll("\n", "")
    pipeline.processBatch(Seq(ev).toDF("value"))
    val hist = graft.operators.MergeSink.readHistory(
      spark, dir, "checkout_session_line_items")
    assert(hist.count() == 2)
    assert(hist.filter(col("is_current")).count() == 2)
    assert(hist.select("version").distinct().collect().map(_.getLong(0)).toSeq == Seq(1L))
    // redelivery: same event, same fetched items → no new SERVED versions
    // (the refetch carries a new sync ts, so the store keeps it as a
    // flagged no-change row — evidence for late re-tiling, not a version)
    pipeline.processBatch(Seq(ev).toDF("value"))
    assert(graft.operators.MergeSink.readHistory(
      spark, dir, "checkout_session_line_items").count() == 2)
  }

  test("dependent fan-out scan: payment methods per live customer only (S5+P6)") {
    val dir = tmpDir("graft_pm")
    // seed customers: one live, one deleted
    val pipeline = new WebhookPipeline(dir)
    pipeline.processBatch(Seq(
      """{"id":"e1","type":"customer.created","created":1,"data":{"object":{"id":"cus_live","object":"customer"}}}""",
      """{"id":"e2","type":"customer.created","created":1,"data":{"object":{"id":"cus_gone","object":"customer"}}}""",
      """{"id":"e3","type":"customer.deleted","created":2,"data":{"object":{"id":"cus_gone","object":"customer","deleted":true}}}"""
    ).toDF("value"))
    val n = Backfill.syncDependent(spark, dir, TableDefs.paymentMethods,
      "customers", "customer", apiFetcher, width = 10)
    assert(n == 1L)
    val pms = spark.read.parquet(s"$dir/payment_methods").collect()
    assert(pms.length == 1)
    assert(pms.head.getAs[String]("customer") == "cus_live")
  }

  test("migration bootstrap: ordered, idempotent, schema-first (S12)") {
    val sql = Migrations.bootstrapSql("stripe")
    assert(sql.head.startsWith("CREATE SCHEMA IF NOT EXISTS"))
    assert(sql(1).contains(""""migrations""""))
    assert(sql.size == 2 + TableDefs.all.size)
    assert(sql.forall(s => s.contains("IF NOT EXISTS")))
  }
}
