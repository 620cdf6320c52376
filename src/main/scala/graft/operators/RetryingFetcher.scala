package graft.operators

import graft.model.TableDef

/** Retry/backoff decorator for any [[Backfill.EntityFetcher]] — the
  * resilience the reference gets from its API client's automatic
  * retries (exponential backoff on rate limits / transient 5xx):
  * every fetch call is retried up to `maxAttempts` with delay
  * base·2^(attempt−1).
  *
  * `list` streams pages lazily, so a failure can also happen MID-
  * iteration; the wrapper then re-lists from the start and skips the
  * rows already emitted (cursor orderings are stable in the reference
  * API). A skipped-row mismatch under an unstable source degrades to
  * duplicated rows downstream, which the idempotent LWW/guarded merge
  * absorbs — retries compose with the sink's replay safety rather than
  * needing their own exactly-once bookkeeping.
  *
  * `sleeper` is injectable so specs assert the backoff schedule instead
  * of sleeping through it. Serializable like the seam it wraps (the
  * dependent-scan path calls fetchers from executor partitions). */
class RetryingFetcher(inner: Backfill.EntityFetcher,
                      maxAttempts: Int = 3,
                      baseDelayMs: Long = 200L,
                      sleeper: Long => Unit = Thread.sleep)
    extends Backfill.EntityFetcher {

  private def backoff(attempt: Int): Unit =
    sleeper(baseDelayMs << (attempt - 1))

  private def retry[T](f: => T): T = {
    var attempt = 1
    while (true) {
      try return f
      catch {
        case _: Exception if attempt < maxAttempts =>
          backoff(attempt); attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  override def list(tdef: TableDef, createdGte: Option[Long],
                    createdLt: Option[Long]): Iterator[String] =
    new Iterator[String] {
      private var emitted = 0L
      private var it = retry(inner.list(tdef, createdGte, createdLt))
      private def recovering[T](f: => T): T = {
        var attempt = 1
        while (true) {
          try return f
          catch {
            case _: Exception if attempt < maxAttempts =>
              backoff(attempt); attempt += 1
              // restart the cursor and skip what we already emitted —
              // counted with a Long loop (Iterator.drop takes Int, and a
              // truncated count past 2^31 rows would replay from row 0)
              it = retry {
                val fresh = inner.list(tdef, createdGte, createdLt)
                var skipped = 0L
                while (skipped < emitted && fresh.hasNext) {
                  fresh.next(); skipped += 1
                }
                fresh
              }
          }
        }
        throw new IllegalStateException("unreachable")
      }
      def hasNext: Boolean = recovering(it.hasNext)
      def next(): String = { val v = recovering(it.next()); emitted += 1; v }
    }

  override def retrieve(tdef: TableDef, id: String): Option[String] =
    retry(inner.retrieve(tdef, id))

  override def listForParent(tdef: TableDef, parentCol: String,
                             parentId: String): Seq[String] =
    retry(inner.listForParent(tdef, parentCol, parentId))

  override def expandList(tdef: TableDef, entityId: String,
                          listField: String): Option[String] =
    retry(inner.expandList(tdef, entityId, listField))
}
