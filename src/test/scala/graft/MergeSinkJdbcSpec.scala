package graft

import java.sql.{DriverManager, Timestamp}
import graft.model.TableDef
import graft.operators.MergeSink

/** Live-database proof of the guarded merge: MergeSink.guardedMergeSql
  * executed against an in-memory Derby (the one JDBC engine in
  * /opt/spark/jars) must reproduce the reference's
  * upsertManyWithTimestampProtection semantics (postgres.ts:181-204,
  * webhooks.test.ts:202-284): insert when absent, update only when the
  * incoming sync timestamp is strictly newer, no-op on stale AND on
  * same-timestamp replays — plus the full foreachBatch-shaped
  * DataFrame → staging-table → MERGE sink path (upsertJdbc). */
class MergeSinkJdbcSpec extends SparkSpec {

  private val tdef = TableDef("widgets", "widget", Seq("wid_"),
    columns = Seq("id", "amount"))

  test("guarded MERGE against live Derby: newer wins, stale and same-ts no-op") {
    val conn = DriverManager.getConnection("jdbc:derby:memory:graftmerge;create=true")
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE "widgets" ("id" VARCHAR(64) NOT NULL PRIMARY KEY,
          |  "amount" BIGINT, "last_synced_at" TIMESTAMP)""".stripMargin)
      st.executeUpdate(
        """CREATE TABLE "stage" ("id" VARCHAR(64) NOT NULL,
          |  "amount" BIGINT, "last_synced_at" TIMESTAMP)""".stripMargin)
      val mergeSql = MergeSink.guardedMergeSql(tdef, "\"stage\"")

      def applyBatch(amount: Long, tsSec: Long): Unit = {
        st.executeUpdate("""DELETE FROM "stage"""")
        val ins = conn.prepareStatement("""INSERT INTO "stage" VALUES (?, ?, ?)""")
        ins.setString(1, "wid_1"); ins.setLong(2, amount)
        ins.setTimestamp(3, new Timestamp(tsSec * 1000))
        ins.executeUpdate(); ins.close()
        st.executeUpdate(mergeSql)
      }
      def state(): (Long, Long) = {
        val rs = st.executeQuery(
          """SELECT "amount", "last_synced_at" FROM "widgets" WHERE "id" = 'wid_1'""")
        assert(rs.next()); val r = (rs.getLong(1), rs.getTimestamp(2).getTime / 1000)
        assert(!rs.next(), "duplicate key rows"); r
      }

      applyBatch(amount = 5, tsSec = 200)   // insert
      assert(state() == ((5L, 200L)))
      applyBatch(amount = 99, tsSec = 100)  // stale → no-op
      assert(state() == ((5L, 200L)))
      applyBatch(amount = 99, tsSec = 200)  // same ts → no-op (strict <)
      assert(state() == ((5L, 200L)))
      applyBatch(amount = 7, tsSec = 300)   // newer → wins
      assert(state() == ((7L, 300L)))
    } finally {
      conn.close()
      // in-memory Derby drop (throws a "successful shutdown" SQLException)
      try DriverManager.getConnection("jdbc:derby:memory:graftmerge;drop=true")
      catch { case _: java.sql.SQLException => () }
    }
  }

  test("upsertJdbc: DataFrame batches flow through stage + MERGE with LWW intact") {
    import spark.implicits._
    val url = "jdbc:derby:memory:graftsink;create=true"
    def batchDF(rows: (String, Long, Long)*) =
      rows.toSeq.toDF("id", "amount", "ts")
        .select($"id", $"amount",
          org.apache.spark.sql.functions.timestamp_seconds($"ts").as("last_synced_at"))
    try {
      // batch 1: two versions of wid_1 in ONE batch (intra-batch LWW
      // must collapse to ts=200 before the merge sees them) + wid_2
      MergeSink.upsertJdbc(
        batchDF(("wid_1", 5L, 200L), ("wid_1", 3L, 150L), ("wid_2", 9L, 100L)),
        url, tdef)
      // batch 2: stale wid_1 (no-op) + newer wid_2 (wins)
      MergeSink.upsertJdbc(
        batchDF(("wid_1", 99L, 120L), ("wid_2", 11L, 400L)), url, tdef)
      val conn = DriverManager.getConnection(url)
      try {
        val rs = conn.createStatement().executeQuery(
          """SELECT "id", "amount", "last_synced_at" FROM "widgets" ORDER BY "id"""")
        assert(rs.next() && rs.getString(1) == "wid_1" && rs.getLong(2) == 5L
          && rs.getTimestamp(3).getTime / 1000 == 200L)
        assert(rs.next() && rs.getString(1) == "wid_2" && rs.getLong(2) == 11L
          && rs.getTimestamp(3).getTime / 1000 == 400L)
        assert(!rs.next())
      } finally conn.close()
    } finally {
      try DriverManager.getConnection("jdbc:derby:memory:graftsink;drop=true")
      catch { case _: java.sql.SQLException => () }
    }
  }
}
