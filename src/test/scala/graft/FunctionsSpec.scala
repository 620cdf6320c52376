package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, HmacSha256}
import graft.model.TableDefs

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("hmac_sha256 expression matches javax.crypto (interpreted + codegen + SQL)") {
    val expected = HmacSha256.hex("1620000000.{\"x\":1}".getBytes, "whsec_test".getBytes)
    val viaColumn = Seq(("1620000000.{\"x\":1}", "whsec_test")).toDF("body", "secret")
      .select(HmacSha256.hmac_sha256(col("body"), col("secret")).as("sig"))
      .head().getString(0)
    assert(viaColumn == expected)
    GraftFunctions.registerAll(spark)
    val viaSql = spark.sql(
      """SELECT hmac_sha256('1620000000.{"x":1}', 'whsec_test') AS sig""")
      .head().getString(0)
    assert(viaSql == expected)
    assert(expected.matches("[0-9a-f]{64}"))
  }

  test("signatureValid accepts a correctly signed body and rejects a tampered one (S2)") {
    val body = """{"id":"evt_1","type":"charge.succeeded"}"""
    val sig = HmacSha256.hex(s"1620000000.$body".getBytes, "whsec_k".getBytes)
    val df = Seq((body, 1620000000L, sig), (body + " ", 1620000000L, sig))
      .toDF("body", "t", "v1")
    val out = df.withColumn("ok",
      HmacSha256.signatureValid(col("body"), col("t"), col("v1"), "whsec_k"))
      .select("ok").as[Boolean].collect()
    assert(out.toSeq == Seq(true, false))
  }

  test("signatureValidWithin rejects replays outside the 300s window (S2)") {
    val body = """{"id":"evt_1","type":"charge.succeeded"}"""
    val t = 1620000000L
    val sig = HmacSha256.hex(s"$t.$body".getBytes, "whsec_k".getBytes)
    // same valid signature at now = t, t+300 (edge, accepted), t+301
    // (stale replay), and t-301 (future skew) — stripe-node's
    // DEFAULT_TOLERANCE semantics
    val df = Seq((body, t, sig, t), (body, t, sig, t + 300L),
        (body, t, sig, t + 301L), (body, t, sig, t - 301L))
      .toDF("body", "t", "v1", "now")
    val out = df.withColumn("ok", HmacSha256.signatureValidWithin(
        col("body"), col("t"), col("v1"), "whsec_k", col("now")))
      .select("ok").as[Boolean].collect()
    assert(out.toSeq == Seq(true, true, false, false))
  }

  test("TableDef.project: unknown fields dropped, missing null, objects kept as raw JSON (P1/P2)") {
    val payload =
      """{"id":"ch_1","object":"charge","amount":42,"paid":true,
        |"metadata":{"a":[1,2]},"unknown_field":"zzz"}""".stripMargin.replaceAll("\n", "")
    val out = TableDefs.charges.projectFrom(
      Seq(payload).toDF("payload"), "payload", current_timestamp())
    val row = out.head()
    assert(row.getAs[String]("id") == "ch_1")
    assert(row.getAs[Long]("amount") == 42L)
    assert(row.getAs[Boolean]("paid"))
    assert(row.getAs[String]("metadata") == """{"a":[1,2]}""")
    assert(row.getAs[String]("status") == null) // missing → NULL
    assert(!out.columns.contains("unknown_field")) // unknown → dropped
    assert(out.columns.toSeq.take(TableDefs.charges.columns.size)
      == TableDefs.charges.columns) // registry order
  }

  test("stripe id prefix dispatch (S6): longest prefix wins") {
    assert(TableDefs.forStripeId("cus_123").map(_.table).contains("customers"))
    assert(TableDefs.forStripeId("sub_sched_1").map(_.table).contains("subscription_schedules"))
    assert(TableDefs.forStripeId("sub_1").map(_.table).contains("subscriptions"))
    assert(TableDefs.forStripeId("issfr_9").map(_.table).contains("early_fraud_warnings"))
    assert(TableDefs.forStripeId("zz_1").isEmpty)
  }

  test("golden: guardedUpsertSql(charges) reproduces the reference statement text") {
    // The reference's upsert-with-timestamp-protection for charges
    // (postgres.ts:181-204 applied to schemas/charge.ts), transcribed
    // token-for-token with the TWO documented batch-form deviations:
    //   1. one multi-row `VALUES %s` placeholder instead of per-row
    //      yesql `:param` tuples (executors bind many rows per statement);
    //   2. the guard/update reference the inserted row via SQL-standard
    //      `EXCLUDED."last_synced_at"` instead of the `:last_synced_at`
    //      bind parameter (identical value — it IS the inserted column).
    // The property list below is copied literally from the reference's
    // schemas/charge.ts:4-42 — if TableDefs.charges ever drifts from the
    // reference schema, this golden breaks.
    val props = Seq(
      "id", "object", "paid", "order", "amount", "review", "source",
      "status", "created", "dispute", "invoice", "outcome", "refunds",
      "captured", "currency", "customer", "livemode", "metadata",
      "refunded", "shipping", "application", "description", "destination",
      "failure_code", "on_behalf_of", "fraud_details", "receipt_email",
      "payment_intent", "receipt_number", "transfer_group",
      "amount_refunded", "application_fee", "failure_message",
      "source_transfer", "balance_transaction", "statement_descriptor",
      "payment_method_details")
    val expected =
      s"""INSERT INTO "stripe"."charges" (${(props :+ "last_synced_at").map(c => s""""$c"""").mkString(", ")})
         |VALUES %s
         |ON CONFLICT ("id") DO UPDATE SET ${(props.filterNot(_ == "id") :+ "last_synced_at").map(c => s""""$c" = EXCLUDED."$c"""").mkString(", ")}
         |WHERE "charges"."last_synced_at" IS NULL
         |   OR "charges"."last_synced_at" < EXCLUDED."last_synced_at"""".stripMargin
    assert(graft.operators.MergeSink.guardedUpsertSql(TableDefs.charges) == expected)
  }

  test("guarded upsert SQL carries the timestamp-protection predicate (S9, postgres.ts:189-204)") {
    val sql = graft.operators.MergeSink.guardedUpsertSql(TableDefs.charges)
    assert(sql.contains("""ON CONFLICT ("id") DO UPDATE"""))
    assert(sql.contains(""""last_synced_at" IS NULL"""))
    assert(sql.contains("""< EXCLUDED."last_synced_at""""))
    val ddl = graft.operators.MergeSink.createTableSql(TableDefs.charges)
    assert(ddl.contains("CREATE TABLE IF NOT EXISTS"))
    assert(ddl.contains(""""amount" bigint"""))
    assert(ddl.contains(""""paid" boolean"""))
  }
}
