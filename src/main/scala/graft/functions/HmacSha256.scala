package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** hmac_sha256(body, secret) → lowercase hex — the webhook signature
  * primitive (S2): the reference verifies
  * `v1 = HMAC_SHA256(secret, "{t}.{body}")` on every delivery
  * (stripeSync.ts:97-105; signing shown in webhooks.test.ts:133-135).
  *
  * Implemented as a Catalyst Expression (not a Scala UDF) so it
  * participates in whole-stage codegen via nullSafeCodegen and has
  * built-in NULL-in/NULL-out semantics.
  */
case class HmacSha256(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "hmac_sha256"

  override protected def nullSafeEval(body: Any, secret: Any): Any =
    UTF8String.fromString(HmacSha256.hex(
      body.asInstanceOf[UTF8String].getBytes,
      secret.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, s) =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.HmacSha256.hex($b.getBytes(), $s.getBytes()))")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object HmacSha256 {
  def hex(body: Array[Byte], secret: Array[Byte]): String = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(secret, "HmacSHA256"))
    val out = mac.doFinal(body)
    val sb = new StringBuilder(out.length * 2)
    out.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Column API: hmac_sha256($"body", lit(secret)). */
  def hmac_sha256(body: Column, secret: Column): Column =
    GraftFunctions.toColumn(HmacSha256(
      GraftFunctions.toExpression(body), GraftFunctions.toExpression(secret)))

  /** Verify a `stripe-signature` header (`t=...,v1=...`) against a raw
    * body column: recompute HMAC(secret, "{t}.{body}") and compare —
    * invalid rows go to the caller's rejected side output (the reference
    * replies HTTP 400, routes/webhooks.ts:13-17). */
  def signatureValid(body: Column, ts: Column, v1: Column, secret: String): Column = {
    import org.apache.spark.sql.functions._
    hmac_sha256(concat(ts.cast("string"), lit("."), body), lit(secret)) === v1
  }

  /** [[signatureValid]] plus the REPLAY-WINDOW check the reference's
    * verifier actually performs: `stripe.webhooks.constructEventAsync`
    * (stripeSync.ts:98) delegates to stripe-node, whose
    * `DEFAULT_TOLERANCE` rejects signatures whose header timestamp is
    * more than 300 s from now — a captured valid delivery cannot be
    * replayed outside the window even with a correct HMAC. `nowTs` is a
    * column (epoch seconds) so batch replays/tests can pin "now"
    * deterministically; both past AND future skew reject, as in
    * stripe-node. */
  def signatureValidWithin(body: Column, ts: Column, v1: Column,
                           secret: String, nowTs: Column,
                           toleranceSec: Long = 300L): Column = {
    import org.apache.spark.sql.functions._
    signatureValid(body, ts, v1, secret) &&
      abs(nowTs.cast("long") - ts.cast("long")) <= toleranceSec
  }
}
