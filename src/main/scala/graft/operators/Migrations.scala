package graft.operators

import graft.model.TableDefs

/** S12 migration runner analog (runMigrations, migrate.ts:15-66): an
  * ordered, idempotent DDL bootstrap with a ledger table — `CREATE
  * SCHEMA IF NOT EXISTS` first (migrate.ts:55), then one CREATE TABLE IF
  * NOT EXISTS per TableDef (28 tables post-migration, §1.2), tracked in
  * a `migrations` bookkeeping table (migrate.ts:26-29). Statements are
  * generated for a JDBC mirror; in lakehouse mode the parquet table dirs
  * are created lazily by the first merge, so only the ledger semantics
  * matter (idempotency via IF NOT EXISTS). */
object Migrations {

  def ledgerSql(schema: String = "stripe"): String =
    s"""CREATE TABLE IF NOT EXISTS "$schema"."migrations" (
       |  "id" integer PRIMARY KEY,
       |  "name" text NOT NULL,
       |  "hash" text NOT NULL,
       |  "executed_at" timestamptz DEFAULT now()
       |)""".stripMargin

  /** The full ordered bootstrap: schema, ledger, all tables. */
  def bootstrapSql(schema: String = "stripe"): Seq[String] =
    Seq(s"""CREATE SCHEMA IF NOT EXISTS "$schema"""", ledgerSql(schema)) ++
      TableDefs.all.map(t => MergeSink.createTableSql(t, schema))
}
